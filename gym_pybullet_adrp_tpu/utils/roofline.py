"""Roofline accounting for the flagship kernels (VERDICT r2 item 4).

The headline throughputs (hover_rollout, race_step_fused) are raw
env-steps/s; this module turns them into %-of-roofline against the
TPU v5e peaks so "actually fast" vs "roofline-saturated" is checkable:

* **HBM bytes/step** — exact, from the kernel operand/result block shapes
  (every block is VMEM-resident inside the launch; HBM traffic is the
  launch boundary only).
* **VPU issue slots/step** — counted by walking the kernel's jaxpr
  (``vpu_slot_census``; the same math traces as plain XLA under
  interpret-mode Pallas). This is the ``vpu_pct`` numerator; see the
  slot-accounting block below for why the percentage is a true
  utilization (<= 100 by construction). Regenerate with
  ``python scripts/roofline.py`` (CPU, ~1 min) — a test pins the stored
  constants against a fresh census so kernel edits can't silently stale
  them. The XLA-cost-model FLOPs are also stored, for cross-checks only.

v5e peaks (public numbers, jax-ml.github.io/scaling-book): HBM 819 GB/s,
MXU 197 TFLOP/s bf16 (unused — these kernels are element-wise), VPU
8x128 lanes x 4 ALUs @ ~0.94 GHz ~= 3.9e12 issues/s.
"""

V5E = {
    "hbm_bytes_per_s": 819e9,
    "vpu_f32_ops_per_s": 3.9e12,   # non-FMA counting; FMA peak ~7.7e12
    "mxu_bf16_flops_per_s": 1.97e14,
    "vmem_bytes": 128 * 2**20,
}

LANE = 128
F32 = 4

# ---------------------------------------------------------------------------
# VPU issue-slot accounting (VERDICT r3 item 4): a *consistent* ceiling
# basis so vpu_pct is a true utilization (<= 100 by construction).
#
# Numerator: issue slots per env-step, counted by walking the kernel's
# jaxpr (``vpu_slot_census``): one slot per element for single-issue ALU
# ops (add/mul/compare/select/...), a mul feeding a single-consumer
# add/sub collapses to ONE slot (the VPU's FMA — pairing them is what the
# x2 "FMA peak" means), layout ops (reshape/broadcast/concat/slice) count
# ZERO (they cost time but no ALU issue — honest utilizations must not
# credit them), and div/sqrt/transcendentals are floored at 1.0 slot each
# (TRANSCENDENTAL_SLOTS below — a deliberate lower bound). A SECOND tier,
# ``vpu_cal_pct``, re-censuses with the on-chip-MEASURED per-op costs
# (CALIBRATED_SLOTS, scripts/vpu_calibrate.py) for the best point
# estimate of true utilization (±15% calibration band).
#
# Ceiling: the v5e issue rate (8x128 lanes x 4 ALUs @ ~0.94 GHz =
# 3.9e12 issues/s; an FMA is ONE issue, which is what the "x2 FMA peak"
# doubling means). Numerator and ceiling are in the SAME currency, so
# vpu_pct <= 100 by construction: the census never credits more issues
# than the hardware actually retires (transcendentals take >= 1 issue,
# layout ops take 0 credit, FMA pairs take 1), so displayed <= true
# utilization <= 100. The old XLA-cost-model flops (which expand
# transcendentals into multi-flop sequences against a raw-op ceiling —
# the 237%-"utilization" bug, VERDICT r3 item 4) are kept only as
# FLOPS_PER_ENV_STEP for cost-model cross-checks and never printed as a
# percentage.

# slots per element for div/sqrt/transcendentals. All 1.0 = the minimum
# one issue each — a deliberate LOWER bound: under-weighting them can
# only UNDERSTATE vpu_pct, never push it past 100, which is what keeps
# the printed ``vpu_pct`` a guaranteed utilization lower bound. The TRUE
# per-op costs were measured on-chip in round 5 (CALIBRATED_SLOTS below)
# and are dramatically higher for sin/cos — which is exactly why the
# round-4 hover kernel read "42%" here while actually running at the
# issue ceiling (VALIDATION §5d, the round-5 hover analysis).
TRANSCENDENTAL_SLOTS = {
    "div": 1.0,
    "sqrt": 1.0,
    "rsqrt": 1.0,
    "exp": 1.0,
    "log": 1.0,
    "tanh": 1.0,
    "sin": 1.0,
    "cos": 1.0,
    "logistic": 1.0,
}

# Round-5 on-chip calibration (scripts/vpu_calibrate.py: per-op dependent
# chains x8 independent streams inside one Pallas kernel, K2-K1
# difference timing with a value-fetch barrier — chain length amortizes
# the tunnel RTT that defeated round-4's per-op attempt). Two findings:
#   1. Single-issue ALU ops measure 4.0-4.4e12 elems/s (validating the
#      3.9e12 nominal), but a dependent mul+add chain runs at 2.06e12/s:
#      Mosaic does NOT issue a multiply-add as one FMA — so the census's
#      FMA pairing discount is itself a lower-bound choice.
#   2. Transcendentals lower to long polynomial/Newton sequences:
#      sin/cos ~98 single-issue slots per element, div ~9, sqrt ~8.
# Weights below are in single-issue slots (measured mul rate / op rate);
# session-to-session calibration band ~±15%.
CALIBRATED_SLOTS = {
    "div": 9.3,
    "sqrt": 8.5,
    "rsqrt": 6.4,
    "exp": 2.7,
    "log": 2.9,
    "tanh": 2.6,
    "sin": 97.7,
    "cos": 97.7,
    "logistic": 10.8,
}

# v5e VPU issue rate (issues/s); FMA = one issue
SLOT_RATE = 3.9e12
# measured single-issue issue rate (mul chains, scripts/vpu_calibrate.py)
# — the ceiling for the CALIBRATED census (which counts mul+add as 2)
SLOT_RATE_CAL = 4.0e12

# XLA-cost-model FLOPs per env-step (see module docstring; regenerated by
# scripts/roofline.py on 2026-08-21 — getting_started track, G=4, O=4):
#   hover:  rollout-kernel step math (pallas_step.rollout_step_math: 8
#           physics substeps, small-angle integrator + reward/episode
#           logic), per env-step
#   race1/race2: race_step_fused (20 firmware ticks: physics + Mellinger +
#           commander + power distribution, then gates/collisions/obs/
#           shaping/autoreset), per env-step (race2 = 2-drone COMPETE:
#           window flops double, the per-env tail is shared)
# CAVEAT: the XLA cost model expands divisions/rsqrt/transcendentals into
# multi-flop sequences, so VPU% computed from these can exceed 100% of the
# non-FMA peak — read >=100% as "compute-saturated", not as a literal
# hardware violation.
FLOPS_PER_ENV_STEP = {
    "hover": 16384.0,
    "race1": 22767.0,
    "race2": 25668.0,
}

# VPU issue slots per env-step (see the slot-accounting block above),
# regenerated by ``python scripts/roofline.py`` (CPU) — stored 2026-08-21
# (round 5: hover now censuses the rollout kernel's own math twin,
# ops/pallas_step.rollout_step_math — small-angle integrator, no obs
# tail). These are the vpu_pct numerators: floor-weighted slot counts of
# the SAME traced kernel math, with FMA pairing and zero-credit layout
# ops (the guaranteed lower bound).
VPU_SLOTS_PER_ENV_STEP = {
    "hover": 886.0,
    "race1": 12702.7,
    "race2": 25416.7,
}

# Calibrated census (CALIBRATED_SLOTS weights, mul+add pairs = 2 slots):
# the vpu_cal_pct numerators against SLOT_RATE_CAL. Regenerated by
# ``python scripts/roofline.py`` alongside the floor table.
VPU_SLOTS_CAL_PER_ENV_STEP = {
    "hover": 1271.0,
    "race1": 19475.7,
    "race2": 38954.4,
}


def hover_rollout_bytes_per_step(n_envs: int, n_steps: int = 64) -> float:
    """HBM bytes per env-step of ops/pallas_step.hover_rollout.

    Per launch: seed (SMEM) + packed (13, T, 128) in; packed + acc (T, 128)
    out — amortized over n_steps in-kernel control steps.
    """
    t = n_envs // LANE
    per_launch = (13 + 13 + 1) * t * LANE * F32 + 4
    return per_launch / (n_steps * n_envs)


def race_fused_bytes_per_step(n_envs: int, n_drones: int = 1,
                              n_gates: int = 4, n_obstacles: int = 4,
                              compete: bool = None,
                              telemetry: bool = False) -> float:
    """HBM bytes per env-step of ops/pallas_race_step.race_step_fused.

    One launch = one env step for the whole batch. Block rows (x (T,128)
    f32): in S 58 + A 4 + R 14 + RST 10 (+noise seed); per-env rows GG 3G,
    OO 2O, RSTG 3G, RSTO 2O, EP 1; out S 58 + R 14 + GG 3G + OO 2O + EP 1
    + OBS C + REW 1 + DONE (env) 1 (+ INFO 5 with telemetry).
    """
    if compete is None:
        compete = n_drones > 1
    N, G, O = n_drones, n_gates, n_obstacles
    tb = n_envs // LANE
    t = N * tb
    C = 12 + 5 * G + 4 * O + 1 + (6 * (N - 1) if compete and N > 1 else 0)
    rows_T_in = 58 + 4 + 14 + 10
    rows_T_out = 58 + 14 + C + 1 + (5 if telemetry else 0)
    rows_env_in = 3 * G + 2 * O + 1 + 3 * G + 2 * O
    rows_env_out = 3 * G + 2 * O + 1 + 1
    per_launch = (
        (rows_T_in + rows_T_out) * t * LANE * F32
        + (rows_env_in + rows_env_out) * tb * LANE * F32
    )
    return per_launch / n_envs


def race_rollout_bytes_per_step(n_envs: int, n_drones: int = 1,
                                n_gates: int = 4, n_obstacles: int = 4,
                                k_steps: int = 32, compete: bool = None,
                                static_draws: bool = True) -> float:
    """HBM bytes per env-step of ops/pallas_race_step.race_rollout
    (bench mode: no obs/telemetry/policy outputs).

    Per K-step launch: the state blocks (S 58 + R 14 + GG 3G + OO 2O +
    EP 1, per the T/env row split) transfer ONCE in and ONCE out; the
    action rows (4) stream in and REW (1) + DONE (env 1) stream out per
    step; the reset rows (RST 10 + RSTG 3G + RSTO 2O) transfer once for
    deterministic configs (``static_draws``) or per step otherwise.
    """
    if compete is None:
        compete = n_drones > 1
    N, G, O, K = n_drones, n_gates, n_obstacles, k_steps
    tb = n_envs // LANE
    t = N * tb
    state_bytes = (58 + 14) * t * LANE * F32 + (
        (3 * G + 2 * O + 1) * tb * LANE * F32
    )
    rst_bytes = 10 * t * LANE * F32 + (
        (3 * G + 2 * O) * tb * LANE * F32
    )
    per_step = (4 + 1) * t * LANE * F32 + tb * LANE * F32
    per_launch = 2 * state_bytes + per_step * K + rst_bytes * (
        1 if static_draws else K
    )
    return per_launch / (K * n_envs)


def roofline_pct(env_steps_per_s: float, slots_per_step: float,
                 bytes_per_step: float, cal_slots_per_step: float = None
                 ) -> dict:
    """%-of-roofline for a measured throughput: ``vpu_pct`` is achieved
    floor-census issue slots/s over the nominal slot rate (a guaranteed
    utilization LOWER BOUND, <= 100 by construction — see the
    slot-accounting block above); ``hbm_pct`` is achieved bytes/s over
    the v5e HBM peak. With ``cal_slots_per_step``, adds ``vpu_cal_pct``:
    the calibrated-census estimate against the measured single-issue
    rate — the best point estimate of true utilization, with the
    calibration's ~±15% band (values slightly above 100 read as
    "at the issue ceiling within calibration error")."""
    out = {
        "vpu_pct": round(
            100.0 * env_steps_per_s * slots_per_step / SLOT_RATE, 1
        ),
        "hbm_pct": round(
            100.0 * env_steps_per_s * bytes_per_step
            / V5E["hbm_bytes_per_s"], 1
        ),
    }
    if cal_slots_per_step is not None:
        out["vpu_cal_pct"] = round(
            100.0 * env_steps_per_s * cal_slots_per_step / SLOT_RATE_CAL, 1
        )
    return out


# ---------------------------------------------------------------------------
# jaxpr issue-slot census

# layout/data-movement primitives: no ALU issue (they still take time;
# NOT crediting them is what keeps vpu_pct an honest utilization)
_ZERO_SLOT = frozenset({
    "broadcast_in_dim", "reshape", "transpose", "concatenate", "slice",
    "dynamic_slice", "dynamic_update_slice", "squeeze", "copy", "rev",
    "pad", "gather", "stop_gradient", "iota", "bitcast_convert_type",
    "convert_element_type", "device_put", "split", "expand_dims",
    # pallas VMEM ref load/store: memory, not ALU issue
    "get", "swap", "masked_load", "masked_store",
    # PRNG key plumbing (the threefry work itself is counted)
    "random_wrap", "random_unwrap", "random_clone",
})
# single-issue ALU ops (one slot per element)
_ONE_SLOT = frozenset({
    "add", "sub", "mul", "max", "min", "and", "or", "xor", "not", "neg",
    "abs", "sign", "floor", "ceil", "round", "select_n", "eq", "ne",
    "lt", "le", "gt", "ge", "is_finite", "shift_left",
    "shift_right_logical", "shift_right_arithmetic", "rem",
    "nextafter", "integer_pow", "square",
})
_FIXED_SLOTS = {
    "clamp": 2.0,          # min + max
    "threefry2x32": 24.0,  # ~5 rounds x (add, xor, rotate) per 2 words
    "random_split": 24.0,  # threefry under the typed-key API
    "random_fold_in": 24.0,
    "random_bits": 24.0,
    "random_seed": 1.0,
    "erf": 8.0,
    # div + cephes-style core polynomial: certainly >= 6 real issues
    "atan2": 6.0,
}
_REDUCE = frozenset({
    "reduce_sum", "reduce_max", "reduce_min", "reduce_and", "reduce_or",
    "reduce_prod", "argmax", "argmin", "cumsum", "cumlogsumexp",
})


def vpu_slot_census(fn, *args, verbose=False, calibrated=False):
    """Count VPU issue slots of ``fn(*args)`` by walking its jaxpr.

    Returns ``{"slots": float, "mxu_flops": float, "by_prim": dict}``.
    Recurses into pjit/scan/cond/pallas_call (scan multiplies by trip
    count; pallas_call by its grid). Default (floor) mode is the
    guaranteed lower bound: a mul whose single consumer is an add/sub
    counts as one slot with that add (FMA pairing) and transcendentals
    are floored at 1 slot. ``calibrated=True`` uses the on-chip-measured
    CALIBRATED_SLOTS weights and counts mul+add pairs as TWO slots
    (Mosaic issues them separately — measured); compare against
    SLOT_RATE_CAL. Unknown primitives count one slot per element and are
    reported in ``by_prim`` prefixed with ``?``.
    """
    import jax

    trans = CALIBRATED_SLOTS if calibrated else TRANSCENDENTAL_SLOTS
    closed = jax.make_jaxpr(fn)(*args)
    totals = {"slots": 0.0, "mxu_flops": 0.0}
    by_prim = {}

    def elems(eqn):
        n = 0
        for v in eqn.outvars:
            aval = getattr(v, "aval", None)
            if aval is not None and hasattr(aval, "size"):
                n = max(n, aval.size)
        return float(n)

    def add(prim, slots):
        totals["slots"] += slots
        by_prim[prim] = by_prim.get(prim, 0.0) + slots

    def visit(jaxpr, mult):
        # FMA pairing: a mul whose ONLY consumer is an add/sub issues as
        # one FMA with it — mark those muls and count them zero below
        producers, consumers = {}, {}
        for eqn in jaxpr.eqns:
            for v in eqn.invars:
                if type(v).__name__ == "Var":
                    consumers[v] = consumers.get(v, 0) + 1
            for v in eqn.outvars:
                producers[v] = eqn
        for v in jaxpr.outvars:
            if type(v).__name__ == "Var":
                consumers[v] = consumers.get(v, 0) + 1
        fused_muls = set()
        for eqn in jaxpr.eqns:
            if eqn.primitive.name not in ("add", "sub"):
                continue
            for v in eqn.invars:
                if type(v).__name__ != "Var":
                    continue
                p = producers.get(v)
                if (p is not None and p.primitive.name == "mul"
                        and consumers.get(v, 0) == 1
                        and elems(p) == elems(eqn)
                        and id(p) not in fused_muls):
                    fused_muls.add(id(p))
                    break

        for eqn in jaxpr.eqns:
            name = eqn.primitive.name
            n = elems(eqn)
            if name in ("pjit", "jit", "closed_call", "core_call"):
                visit(eqn.params["jaxpr"].jaxpr, mult)
            elif name in ("remat", "checkpoint", "custom_jvp_call",
                          "custom_vjp_call", "custom_vjp_call_jaxpr"):
                inner = eqn.params.get("jaxpr") or eqn.params.get(
                    "call_jaxpr"
                )
                visit(getattr(inner, "jaxpr", inner), mult)
            elif name == "scan":
                visit(eqn.params["jaxpr"].jaxpr,
                      mult * eqn.params["length"])
            elif name == "while":
                # not used on the benched paths; count one trip
                visit(eqn.params["body_jaxpr"].jaxpr, mult)
            elif name == "cond":
                inner = eqn.params["branches"]
                visit(inner[0].jaxpr, mult)
            elif name == "pallas_call":
                g = eqn.params.get("grid_mapping")
                grid = 1.0
                if g is not None:
                    for d in getattr(g, "grid", ()) or ():
                        grid *= float(d)
                visit(eqn.params["jaxpr"], mult * grid)
            elif name == "dot_general":
                ((lc, rc), _) = eqn.params["dimension_numbers"]
                lhs = eqn.invars[0].aval
                k = 1.0
                for d in lc:
                    k *= lhs.shape[d]
                totals["mxu_flops"] += mult * 2.0 * k * n
            elif name in _ZERO_SLOT:
                pass
            elif name == "mul" and id(eqn) in fused_muls:
                add("fma_mul", mult * n if calibrated else 0.0)
            elif name in _ONE_SLOT:
                add(name, mult * n)
            elif name in _FIXED_SLOTS:
                add(name, mult * n * _FIXED_SLOTS[name])
            elif name in trans:
                add(name, mult * n * trans[name])
            elif name in _REDUCE:
                inn = max(
                    (float(v.aval.size) for v in eqn.invars
                     if hasattr(getattr(v, "aval", None), "size")),
                    default=n,
                )
                add(name, mult * inn)
            elif name == "pow":
                add(name, mult * n * (trans["log"] + trans["exp"]))
            else:
                if verbose:
                    print(f"[census] unknown primitive: {name}")
                add("?" + name, mult * n)

    visit(closed.jaxpr, 1.0)
    totals["by_prim"] = by_prim
    return totals


def _bench_kernel_cases():
    """The three benched kernels as (name, fn, args) at B=128 envs —
    shared setup for the cost-model-flops and issue-slot censuses."""
    from functools import partial

    import jax
    import jax.numpy as jnp
    import numpy as np

    from gym_pybullet_adrp_tpu.envs import fast_hover
    from gym_pybullet_adrp_tpu.envs import race as race_mod
    from gym_pybullet_adrp_tpu.envs import race_rl_rowfast
    from gym_pybullet_adrp_tpu.models.drone import drone_params
    from gym_pybullet_adrp_tpu.utils.config import load_config
    from gym_pybullet_adrp_tpu.utils.enums import (
        DroneModel, Physics, RaceMode,
    )

    from gym_pybullet_adrp_tpu.ops import pallas_step

    B = 128
    params = drone_params(DroneModel.CF2X)
    # hover censuses the ROLLOUT kernel's per-step math (its bitwise
    # plain-jnp twin, ops/pallas_step.rollout_step_math — round 5: the
    # old census case, fast_hover.make_step, includes an atan2/asin
    # observation tail the headline kernel never executes and used the
    # exact integrator the headline no longer uses)
    T = B // LANE
    step = partial(pallas_step.rollout_step_math, params)
    st = fast_hover.reset_packed(np.array([0.0, 0.0, 0.1125]), B)
    act = jnp.zeros((4, T, LANE))
    yield "hover", step, (
        st.packed, act, jnp.zeros((T, LANE), jnp.int32),
        jnp.zeros((T, LANE)),
    )

    cfg = load_config("getting_started")
    for n, key in ((1, "race1"), (2, "race2")):
        spec = race_mod.RaceSpec.from_config(
            cfg, n, RaceMode.COMPETE if n > 1 else RaceMode.COMPARE,
            Physics.PYB,
        )
        track = race_mod.track_from_config(cfg, n)
        reset, rstep = race_rl_rowfast.make_row_env(
            spec, track, B, interpret=True
        )
        s0 = reset(jax.random.PRNGKey(0))
        a = jnp.zeros((B, 4)) if n == 1 else jnp.zeros((B, n, 4))
        yield key, rstep, (s0, a, jax.random.PRNGKey(1))


def measure_flops_per_env_step():
    """Re-measure FLOPS_PER_ENV_STEP via XLA cost analysis (CPU only —
    call through scripts/roofline.py; interpret-mode Pallas traces the
    kernel math as plain XLA ops)."""
    import jax

    assert jax.devices()[0].platform == "cpu", \
        "run on CPU (interpret-mode trace)"

    def flops_of(fn, *args):
        # the kernels are f32-native; force f32 tracing even under the
        # test suite's jax_enable_x64 (jit caches key on this config, so
        # toggling it around the trace is safe)
        old = jax.config.jax_enable_x64
        jax.config.update("jax_enable_x64", False)
        try:
            ca = jax.jit(fn).lower(*args).compile().cost_analysis()
        finally:
            jax.config.update("jax_enable_x64", old)
        ca = ca[0] if isinstance(ca, list) else ca
        return float(ca["flops"])

    return {
        name: flops_of(fn, *args) / 128
        for name, fn, args in _bench_kernel_cases()
    }


def measure_slots_per_env_step(verbose=False, calibrated=False):
    """Re-measure VPU_SLOTS_PER_ENV_STEP (floor census) or
    VPU_SLOTS_CAL_PER_ENV_STEP (``calibrated=True``) via the jaxpr
    issue-slot census (platform-independent tracing; run through
    scripts/roofline.py)."""
    import jax

    out = {}
    for name, fn, args in _bench_kernel_cases():
        old = jax.config.jax_enable_x64
        jax.config.update("jax_enable_x64", False)
        try:
            c = vpu_slot_census(fn, *args, verbose=verbose,
                                calibrated=calibrated)
        finally:
            jax.config.update("jax_enable_x64", old)
        out[name] = c["slots"] / 128
        if verbose:
            top = sorted(
                c["by_prim"].items(), key=lambda kv: -kv[1]
            )[:12]
            print(f"[census] {name}: slots/env-step {out[name]:.0f}  "
                  + "  ".join(f"{k}={v / 128:.0f}" for k, v in top))
    return out
