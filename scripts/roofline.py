"""Roofline table for the flagship kernels (VERDICT r2 item 4; slot
currency per VERDICT r3 item 4).

Re-measures the per-env-step kernel cost on CPU in BOTH currencies —
VPU issue slots (the jaxpr census behind the bench line's ``vpu_pct``,
utils/roofline.py) and XLA-cost-model FLOPs (kept for cross-checks) —
prints the roofline table for given measured throughputs, and checks the
stored constants in utils/roofline.py for drift.

Usage:
  python scripts/roofline.py [--hover 1.63e9] [--race1 170e6] [--race2 97e6]
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--hover", type=float, default=1.63e9,
                    help="measured hover_rollout env-steps/s (BENCH)")
    ap.add_argument("--race1", type=float, default=170e6)
    ap.add_argument("--race2", type=float, default=97e6)
    ap.add_argument("--envs", type=int, default=4096)
    args = ap.parse_args()

    import os

    os.environ.setdefault("XLA_FLAGS", "")
    import jax

    jax.config.update("jax_platforms", "cpu")

    from gym_pybullet_adrp_tpu.utils import roofline as rf

    slots = rf.measure_slots_per_env_step(verbose=True)
    cal = rf.measure_slots_per_env_step(calibrated=True)
    flops = rf.measure_flops_per_env_step()
    drift = False
    print("\nper-env-step kernel cost (stored constants in parentheses):")
    for k in slots:
        ss = rf.VPU_SLOTS_PER_ENV_STEP[k]
        sc = rf.VPU_SLOTS_CAL_PER_ENV_STEP[k]
        sf = rf.FLOPS_PER_ENV_STEP[k]
        ds = abs(slots[k] - ss) / ss if ss else 1.0
        dc = abs(cal[k] - sc) / sc if sc else 1.0
        df = abs(flops[k] - sf) / sf
        flag = "  <-- DRIFT, update utils/roofline.py" if (
            ds > 0.02 or dc > 0.02 or df > 0.02
        ) else ""
        drift = drift or ds > 0.02 or dc > 0.02 or df > 0.02
        print(f"  {k:6s} slots {slots[k]:8.0f} ({ss:.0f})  "
              f"cal {cal[k]:8.0f} ({sc:.0f})  "
              f"cm-flops {flops[k]:8.0f} ({sf:.0f}){flag}")

    rows = [
        ("hover_rollout", args.hover, slots["hover"],
         rf.hover_rollout_bytes_per_step(args.envs)),
        ("race1_fused", args.race1, slots["race1"],
         rf.race_fused_bytes_per_step(args.envs, 1)),
        ("race2_fused", args.race2, slots["race2"],
         rf.race_fused_bytes_per_step(args.envs, 2)),
    ]
    print(f"\nRoofline @ {args.envs} envs (v5e: HBM 819 GB/s, VPU issue "
          f"rate {rf.SLOT_RATE:.2g}/s):")
    print(f"{'kernel':14s} {'steps/s':>10s} {'slots/st':>9s} "
          f"{'bytes/st':>9s} {'Gslot/s':>9s} {'GB/s':>7s} "
          f"{'VPU%':>6s} {'HBM%':>6s}")
    cal_by_name = {"hover_rollout": cal["hover"],
                   "race1_fused": cal["race1"],
                   "race2_fused": cal["race2"]}
    for name, sps, sl, by in rows:
        pct = rf.roofline_pct(sps, sl, by, cal_by_name[name])
        print(
            f"{name:14s} {sps:10.3g} {sl:9.0f} {by:9.1f} "
            f"{sps*sl/1e9:9.0f} {sps*by/1e9:7.1f} "
            f"{pct['vpu_pct']:6.1f} {pct['hbm_pct']:6.1f} "
            f"cal {pct['vpu_cal_pct']:6.1f}"
        )
    return 1 if drift else 0


if __name__ == "__main__":
    sys.exit(main())
