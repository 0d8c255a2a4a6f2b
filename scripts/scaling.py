"""Multi-host scaling: measured localhost cluster + DCN byte model
(VERDICT r2 item 5).

Real multi-chip hardware isn't reachable from this container, so the
north star's ">=80% scaling efficiency at 4 hosts" is argued two ways:

1. **Measurement** — sharded PPO (parallel/distributed.make_distributed_ppo,
   the exact program a TPU pod runs) executed on REAL 1/2/4-process
   localhost jax.distributed clusters (CPU backend, gloo collectives).
   The TOTAL virtual device count and global batch are held FIXED
   (1 proc x 4 dev, 2 x 2, 4 x 1) so the machine does identical compute
   in every configuration — this container has very few physical cores,
   so a weak-scaling layout would only measure core oversubscription.
   Step-time inflation vs the 1-process baseline then isolates the
   process-boundary cost: gloo/grpc collectives + cross-process
   synchronization, an overestimate of dedicated-host overhead.

2. **DCN byte model** — gradient bytes/step vs compute time at production
   batch sizes: each optimizer update all-reduces the ActorCritic gradient
   (~n_params * 4 B) across hosts over DCN; a ring all-reduce moves
   2*(p-1)/p * bytes per host per sync.

Usage: python scripts/scaling.py [--envs_per_dev 64] [--iters 10]
"""

import argparse
import json
import os
import socket
import subprocess
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    p = s.getsockname()[1]
    s.close()
    return p


def run_cluster(nproc, n_dev, envs_per_dev, n_steps, iters, mode="ppo",
                grad_accum=1):
    out = Path(tempfile.mkdtemp()) / "out.json"
    port = free_port()
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, "scripts/_scaling_worker.py", str(pid),
             str(nproc), str(port), str(out), str(n_dev),
             str(envs_per_dev), str(n_steps), str(iters), mode,
             str(grad_accum)],
            cwd=REPO, env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for pid in range(nproc)
    ]
    logs = [p.communicate(timeout=900)[0] for p in procs]
    for p, lg in zip(procs, logs):
        if p.returncode != 0:
            raise RuntimeError(f"worker failed:\n{lg[-2000:]}")
    return json.loads(out.read_text())


def dcn_model(n_params, syncs_per_iter, compute_ms, n_hosts=4,
              dcn_gbps=25.0, latency_us=30.0, overlap_ms=0.0):
    """DCN cost of one PPO iteration's gradient syncs vs its compute
    time -> scaling efficiency. ``overlap_ms`` is communication hidden
    under concurrent compute (bucketed all-reduce launched as rear-layer
    gradients finish while front layers still differentiate); 0 =
    fully-serialized lower bound."""
    bytes_per_sync = 2 * (n_hosts - 1) / n_hosts * n_params * 4
    t_comm_ms = syncs_per_iter * (
        bytes_per_sync / (dcn_gbps * 1e9) * 1e3 + latency_us / 1e3
    )
    t_exposed = max(t_comm_ms - overlap_ms, 0.0)
    eff = compute_ms / (compute_ms + t_exposed)
    return bytes_per_sync, t_comm_ms, eff


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--envs_per_dev", type=int, default=64)
    ap.add_argument("--total_dev", type=int, default=4,
                    help="total virtual CPU devices (held fixed across "
                         "process counts)")
    ap.add_argument("--n_steps", type=int, default=16)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--out", default="results/scaling.json")
    args = ap.parse_args()

    rows = []
    for nproc in (1, 2, 4):
        n_dev = args.total_dev // nproc
        r = run_cluster(nproc, n_dev, args.envs_per_dev,
                        args.n_steps, args.iters)
        rows.append(r)
        print(f"{nproc} proc x {n_dev} dev: "
              f"{r['sec_per_iter']*1e3:8.1f} ms/iter "
              f"(global batch {r['global_batch']})", flush=True)

    t1 = rows[0]["sec_per_iter"]
    print("\nFixed total compute (constant device count + global batch; "
          "localhost processes, gloo):")
    for r in rows:
        eff = t1 / r["sec_per_iter"]
        r["process_boundary_efficiency"] = eff
        print(f"  {r['nproc']} proc: {eff*100:5.1f}% "
              f"({r['sec_per_iter']*1e3:.1f} ms vs {t1*1e3:.1f} ms)")

    # gradient accumulation (rl/ppo.py grad_accum): one pmean per
    # minibatch GROUP instead of per minibatch — the sync-count lever.
    # Rerun the 4-process cluster with every epoch's minibatches
    # accumulated into one update (here 2 -> 1 sync/epoch).
    accum_rows = []
    for nproc in (1, 4):
        r = run_cluster(nproc, max(args.total_dev // nproc, 1),
                        args.envs_per_dev, args.n_steps, args.iters,
                        grad_accum=2)
        accum_rows.append(r)
        print(f"  grad_accum=2, {nproc} proc: "
              f"{r['sec_per_iter']*1e3:.1f} ms/iter "
              f"({r['grad_syncs_per_iter']} syncs/iter)", flush=True)

    # gradient-sized all-reduce microbenchmark: the per-sync cost over a
    # REAL process boundary with no competing compute (the core-starved
    # container makes the PPO rows above contention-dominated; this is
    # the clean measured quantity)
    sync_rows = []
    for nproc in (2, 4):
        r = run_cluster(nproc, max(args.total_dev // nproc, 1),
                        args.envs_per_dev, args.n_steps, args.iters,
                        mode="allreduce")
        sync_rows.append(r)
        print(f"  all-reduce {r['bytes']/1024:.0f} KiB, {nproc} proc: "
              f"{r['sec_per_sync']*1e6:.0f} us/sync")

    n_params = rows[0]["n_params"]
    syncs = rows[0]["grad_syncs_per_iter"]
    # production shape: race PPO at 4096 envs measures ~12-13 ms/iteration
    # on the chip; 80 gradient syncs at SB3's 10 epochs x 8 minibatches,
    # 10 with grad_accum=8 (one sync per epoch's accumulated update).
    # Robustness axes (VERDICT r3 item 5): a 2x-degraded DCN row
    # (12.5 GB/s, 60 us/collective) and an overlap-aware row (bucketed
    # all-reduce hidden under the epoch's remaining backward compute —
    # conservatively half the update-phase time, ~2.5 ms).
    model = {}
    for name, compute_ms, syncs_prod in (
        ("race_ppo_4096envs_sb3_80sync", 11.9, 80),
        ("race_ppo_4096envs_accum8_10sync", 11.9, 10),
        ("hover_ppo_4096envs_accum8_10sync", 8.0, 10),
    ):
        b, t_comm, eff = dcn_model(n_params, syncs_prod, compute_ms)
        _, t2, eff_deg = dcn_model(n_params, syncs_prod, compute_ms,
                                   dcn_gbps=12.5, latency_us=60.0)
        _, _, eff_ov = dcn_model(n_params, syncs_prod, compute_ms,
                                 dcn_gbps=12.5, latency_us=60.0,
                                 overlap_ms=2.5)
        model[name] = {
            "bytes_per_sync_per_host": b,
            "dcn_ms_per_iter_serialized": t_comm,
            "efficiency_4_hosts_dcn_model": eff,
            "efficiency_4_hosts_dcn_2x_degraded": eff_deg,
            "efficiency_4_hosts_degraded_with_overlap": eff_ov,
        }
        print(f"\n{name}: {b/1024:.0f} KiB/sync/host, {syncs_prod} syncs")
        print(f"  DCN model (25 GB/s, 30 us/collective, serialized): "
              f"{t_comm:.2f} ms vs {compute_ms} ms compute -> "
              f"{eff*100:.1f}% @ 4 hosts")
        print(f"  2x-degraded DCN (12.5 GB/s, 60 us): {t2:.2f} ms -> "
              f"{eff_deg*100:.1f}%; with 2.5 ms overlap: "
              f"{eff_ov*100:.1f}%")
    print(
        "\nNOTE: the localhost per-sync measurement above exercises "
        "gloo-over-loopback on a core-starved container — a software "
        "stack ~2 orders slower than TPU DCN/ICI collectives; it proves "
        "the multi-process program + collective layout (incl. the "
        "accumulated one-sync-per-epoch variant), while the byte model "
        "carries the hardware projection."
    )

    out = {"measured_ppo": rows, "measured_ppo_grad_accum": accum_rows,
           "measured_allreduce": sync_rows,
           "dcn_model": model,
           "n_params": n_params, "syncs_per_iter_measured": syncs}
    Path(args.out).write_text(json.dumps(out, indent=1))
    print(f"\nwrote {args.out}")


if __name__ == "__main__":
    main()
