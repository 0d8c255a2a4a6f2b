"""On-chip VPU op-cost calibration (VERDICT r4 item 8 / r5 item 1).

Measures the real per-element issue cost of div/sqrt/transcendentals
relative to a fused mul-add chain, INSIDE one Pallas kernel — the chain
length amortizes the ~40-55 ms tunnel RTT that made per-op eager
calibration unreliable (VALIDATION §5d).

Method: a kernel runs ``iters`` outer rounds (x16 inlined op rounds
each) of N_IND independent dependent chains ``y_j = op(y_j [, c])`` over
(ROWS, 128) f32 blocks (independent chains keep the issue pipe full, so
this measures THROUGHPUT cost, not latency). Two chain lengths K1 < K2
difference out launch/loop overhead:

    cost_per_iter = (t(K2) - t(K1)) / (K2 - K1)
    weight(op)    = cost_per_iter(op) / cost_per_iter(fma)

TPU has no hardware sin/cos/log/... — Mosaic/XLA expand them into
range-reduction + polynomial sequences, so weights >> 1 are expected and
the roofline census's all-1.0 floor (utils/roofline.py
TRANSCENDENTAL_SLOTS) understates the numerator for transcendental-heavy
kernels. Run on the real chip:

    python scripts/vpu_calibrate.py [--iters 256] [--rows 32]

Prints a table + the TRANSCENDENTAL_SLOTS-format dict. Measured weights
are recorded in utils/roofline.py's commentary (the stored slot counts
keep the 1.0 floor as a deliberate lower bound — see the discussion
there); the calibrated census is used for the hover-kernel ceiling
analysis in VALIDATION §5d.
"""

import argparse
import sys
import time
from functools import partial
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N_IND = 8  # independent chains: enough ILP to saturate the issue pipe

OPS = {
    # op name -> (fn(y, c), needs renormalization to stay finite)
    "fma": lambda y, c: y * 0.9999 + c,
    "mul": lambda y, c: y * 0.9999,
    "add": lambda y, c: y + c,
    "max": lambda y, c: jnp.maximum(y, c),
    "div": lambda y, c: c / y,
    "sqrt": lambda y, c: jnp.sqrt(y) + c,
    "rsqrt": lambda y, c: jax.lax.rsqrt(y) + c,
    "sin": lambda y, c: jnp.sin(y) + c,
    "cos": lambda y, c: jnp.cos(y) + c,
    "exp": lambda y, c: jnp.exp(y * 0.1),
    "log": lambda y, c: jnp.log(y) + c,
    "tanh": lambda y, c: jnp.tanh(y) + c,
    "logistic": lambda y, c: jax.nn.sigmoid(y) + c,
}


def _kernel(x_ref, o_ref, *, op, iters):
    fn = OPS[op]
    ys = [x_ref[:] * (1.0 + 0.1 * j) + 0.5 for j in range(N_IND)]
    c = 0.7

    def body(_, ys):
        # 16 rounds inlined: amortizes the (non-unrollable) loop control
        for _ in range(16):
            ys = [fn(y, c) for y in ys]
        return ys

    ys = jax.lax.fori_loop(0, iters, body, ys)
    acc = ys[0]
    for y in ys[1:]:
        acc = acc + y
    o_ref[:] = acc


def chain_time(op, iters, rows, repeats=8):
    x = jnp.full((rows, 128), 0.62, jnp.float32)
    f = jax.jit(partial(
        pl.pallas_call(
            partial(_kernel, op=op, iters=iters),
            out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
    ))
    np.asarray(f(x))
    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        outs = [f(x) for _ in range(repeats)]
        # fetch the last VALUE: block_until_ready is not a reliable
        # barrier for every program shape on the tunneled chip
        # (VALIDATION §5d) — a value fetch is
        np.asarray(outs[-1])
        times.append((time.perf_counter() - t0) / repeats)
    return min(times)


def calibrate(iters=8192, rows=32, verbose=True):
    k1, k2 = iters, 2 * iters
    elems = 16 * N_IND * rows * 128   # x16: inlined rounds per outer iter
    out = {}
    base = None
    for op in OPS:
        t1, t2 = chain_time(op, k1, rows), chain_time(op, k2, rows)
        per_iter = (t2 - t1) / (k2 - k1)
        rate = elems / per_iter            # op-elements/s
        out[op] = rate
        if op == "fma":
            base = rate
        if verbose:
            w = base / rate if base else float("nan")
            print(f"{op:9s} {rate / 1e12:7.3f}T elems/s   "
                  f"weight vs fma: {w:6.2f}", flush=True)
    weights = {op: round(out["fma"] / r, 2) for op, r in out.items()}
    if verbose:
        print("\nTRANSCENDENTAL_SLOTS (measured) = {")
        for op in ("div", "sqrt", "rsqrt", "exp", "log", "tanh", "sin",
                   "cos", "logistic"):
            print(f'    "{op}": {weights[op]},')
        print("}")
    return weights, out


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=8192,
                    help="outer loop rounds; x16 inlined op rounds each "
                         "(big enough that the K2-K1 work delta dwarfs "
                         "the tunnel RTT jitter)")
    ap.add_argument("--rows", type=int, default=32)
    args = ap.parse_args()
    assert jax.devices()[0].platform == "tpu", "run on the real chip"
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    calibrate(args.iters, args.rows)
