"""Roofline table for the flagship kernels (VERDICT r2 item 4).

Re-measures FLOPs/env-step via XLA cost analysis on CPU, prints the
bytes/FLOPs-vs-v5e-peak table for given measured throughputs, and checks
the stored constants in utils/roofline.py for drift.

Usage:
  python scripts/roofline.py [--hover 1.756e9] [--race1 188e6] [--race2 99e6]
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--hover", type=float, default=1.756e9,
                    help="measured hover_rollout env-steps/s (BENCH)")
    ap.add_argument("--race1", type=float, default=188e6)
    ap.add_argument("--race2", type=float, default=99e6)
    ap.add_argument("--envs", type=int, default=4096)
    args = ap.parse_args()

    import os

    os.environ.setdefault("XLA_FLAGS", "")
    import jax

    jax.config.update("jax_platforms", "cpu")

    from gym_pybullet_adrp_tpu.utils import roofline as rf

    measured = rf.measure_flops_per_env_step()
    print("FLOPs/env-step (XLA cost model over the kernel math):")
    drift = False
    for k, v in measured.items():
        stored = rf.FLOPS_PER_ENV_STEP[k]
        d = abs(v - stored) / stored
        flag = "  <-- DRIFT, update FLOPS_PER_ENV_STEP" if d > 0.02 else ""
        drift = drift or d > 0.02
        print(f"  {k:6s} {v:10.0f}  (stored {stored:.0f}, {100*d:.1f}%){flag}")

    rows = [
        ("hover_rollout", args.hover, measured["hover"],
         rf.hover_rollout_bytes_per_step(args.envs)),
        ("race1_fused", args.race1, measured["race1"],
         rf.race_fused_bytes_per_step(args.envs, 1)),
        ("race2_fused", args.race2, measured["race2"],
         rf.race_fused_bytes_per_step(args.envs, 2)),
    ]
    print(f"\nRoofline @ {args.envs} envs (v5e: HBM 819 GB/s, "
          f"VPU ~3.9e12 f32 op/s non-FMA):")
    print(f"{'kernel':14s} {'steps/s':>10s} {'flops/st':>9s} "
          f"{'bytes/st':>9s} {'GFLOP/s':>9s} {'GB/s':>7s} "
          f"{'VPU%':>6s} {'HBM%':>6s}")
    for name, sps, fl, by in rows:
        pct = rf.roofline_pct(sps, fl, by)
        print(
            f"{name:14s} {sps:10.3g} {fl:9.0f} {by:9.1f} "
            f"{sps*fl/1e9:9.0f} {sps*by/1e9:7.1f} "
            f"{pct['vpu_pct']:6.1f} {pct['hbm_pct']:6.1f}"
        )
    return 1 if drift else 0


if __name__ == "__main__":
    sys.exit(main())
