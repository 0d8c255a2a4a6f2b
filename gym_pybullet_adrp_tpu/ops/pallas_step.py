"""Pallas TPU kernel: fused quadrotor control-step (8 physics substeps).

The XLA path executes one control step of the hover env as a chain of many
small VPU kernels with the ~1 MB batched state bouncing through HBM between
fusions (~55 us/substep at 4096 envs, measured). This kernel keeps the whole
state batch resident in VMEM and runs all substeps in one launch — one HBM
read and one write per control step.

Scope: the throughput-critical configuration — single drone per env, CF2X,
``Physics.PYB`` (thrust + torque + gravity + analytic ground contact, no
gnd-effect/drag/downwash augmentations), float32, batch a multiple of 128.
Everything else falls back to the reference-faithful XLA path
(ops/dynamics.py); equivalence of the two is asserted in
tests/test_pallas.py.

Layout: channel-major. State (13, B/128, 128): rows = [pos xyz, quat xyzw,
vel xyz, omega xyz]; each channel is a dense (sublane, lane) tile stack, so
every elementwise op runs at full VPU width.
"""

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
N_CHANNELS = 13


def _kernel(state_ref, rpm_ref, out_ref, *, n_substeps, dt, kf, km, arm_s,
            mass, jinv, gravity, ground_z):
    st = state_ref[:]    # (13, T, 128)
    rpm = rpm_ref[:]     # (4, T, 128)

    # motor model — rpm constant across the substep window, so forces and
    # body torques are loop invariants (reference BaseAviary._physics)
    f = rpm * rpm * kf
    thrust = f[0] + f[1] + f[2] + f[3]
    tx = (f[0] + f[1] - f[2] - f[3]) * arm_s
    ty = (-f[0] + f[1] + f[2] - f[3]) * arm_s
    t_ = rpm * rpm * km
    tz = t_[0] - t_[1] + t_[2] - t_[3]
    dwx = dt * jinv[0] * tx
    dwy = dt * jinv[1] * ty
    dwz = dt * jinv[2] * tz
    inv_m_dt = dt / mass
    g_dt = dt * gravity / mass  # gravity param is the weight force G*m

    def body(_, st):
        px, py, pz = st[0], st[1], st[2]
        qx, qy, qz, qw = st[3], st[4], st[5], st[6]
        vx, vy, vz = st[7], st[8], st[9]
        wx, wy, wz = st[10], st[11], st[12]

        # world-frame thrust = R(q) @ [0, 0, thrust] (third column of R)
        fx = 2.0 * (qx * qz + qy * qw) * thrust
        fy = 2.0 * (qy * qz - qx * qw) * thrust
        fz = (1.0 - 2.0 * (qx * qx + qy * qy)) * thrust

        # semi-implicit Euler
        vx = vx + fx * inv_m_dt
        vy = vy + fy * inv_m_dt
        vz = vz + fz * inv_m_dt - g_dt
        wx = wx + dwx
        wy = wy + dwy
        wz = wz + dwz
        px = px + dt * vx
        py = py + dt * vy
        pz = pz + dt * vz

        # world angular velocity = R(q) @ omega_body
        r00 = 1.0 - 2.0 * (qy * qy + qz * qz)
        r01 = 2.0 * (qx * qy - qz * qw)
        r02 = 2.0 * (qx * qz + qy * qw)
        r10 = 2.0 * (qx * qy + qz * qw)
        r11 = 1.0 - 2.0 * (qx * qx + qz * qz)
        r12 = 2.0 * (qy * qz - qx * qw)
        r20 = 2.0 * (qx * qz - qy * qw)
        r21 = 2.0 * (qy * qz + qx * qw)
        r22 = 1.0 - 2.0 * (qx * qx + qy * qy)
        ox = r00 * wx + r01 * wy + r02 * wz
        oy = r10 * wx + r11 * wy + r12 * wz
        oz = r20 * wx + r21 * wy + r22 * wz

        # quaternion integration, world frame left-multiply:
        # q' = (axis*sin(theta), cos(theta)) ⊗ q
        n2 = ox * ox + oy * oy + oz * oz
        n = jnp.sqrt(n2)
        safe = jnp.maximum(n, 1e-12)
        theta = n * (dt * 0.5)
        s_over_n = jnp.sin(theta) / safe
        c = jnp.cos(theta)
        ux, uy, uz = ox * s_over_n, oy * s_over_n, oz * s_over_n
        nqx = c * qx + qw * ux + (uy * qz - uz * qy)
        nqy = c * qy + qw * uy + (uz * qx - ux * qz)
        nqz = c * qz + qw * uz + (ux * qy - uy * qx)
        nqw = c * qw - (ux * qx + uy * qy + uz * qz)
        keep = n <= 1e-8
        qx = jnp.where(keep, qx, nqx)
        qy = jnp.where(keep, qy, nqy)
        qz = jnp.where(keep, qz, nqz)
        qw = jnp.where(keep, qw, nqw)

        # analytic ground contact (matches dynamics.pyb_substep)
        below = pz < ground_z
        pz = jnp.where(below, ground_z, pz)
        vx = jnp.where(below, 0.0, vx)
        vy = jnp.where(below, 0.0, vy)
        vz = jnp.where(below, jnp.maximum(vz, 0.0), vz)
        wx = jnp.where(below, 0.0, wx)
        wy = jnp.where(below, 0.0, wy)
        wz = jnp.where(below, 0.0, wz)

        return jnp.stack(
            [px, py, pz, qx, qy, qz, qw, vx, vy, vz, wx, wy, wz], axis=0
        )

    out_ref[:] = jax.lax.fori_loop(
        0, n_substeps, body, st, unroll=n_substeps
    )


def pack_state(pos, quat, vel, omega):
    """(B, 3/4) arrays -> (13, B/128, 128) channel-major block."""
    B = pos.shape[0]
    st = jnp.concatenate([pos, quat, vel, omega], axis=-1)  # (B, 13)
    return st.T.reshape(N_CHANNELS, B // LANE, LANE)


def unpack_state(st):
    """(13, B/128, 128) -> (pos, quat, vel, omega)."""
    B = st.shape[1] * LANE
    flat = st.reshape(N_CHANNELS, B).T
    return flat[:, 0:3], flat[:, 3:7], flat[:, 7:10], flat[:, 10:13]


def supports(params, model, physics, B, dtype) -> bool:
    from gym_pybullet_adrp_tpu.utils.enums import DroneModel, Physics

    return (
        physics == Physics.PYB
        and model == DroneModel.CF2X
        and B % LANE == 0
        and dtype == jnp.float32
    )


def ctrl_step_packed(params, packed_state, rpm_packed, n_substeps: int,
                     dt: float, interpret: bool = False):
    """Fused control step on packed state.

    packed_state: (13, T, 128); rpm_packed: (4, T, 128). Returns the updated
    packed state. `params` leaves must be scalars (single drone model).
    """
    kf = float(np.asarray(params.kf))
    km = float(np.asarray(params.km))
    arm_s = float(np.asarray(params.arm)) / float(np.sqrt(2.0))
    mass = float(np.asarray(params.mass))
    jinv = tuple(float(x) for x in 1.0 / np.asarray(params.J))
    gravity = 9.8 * mass  # weight force (avoid tracing the jnp property)
    ground_z = float(
        np.asarray(params.collision_h) / 2.0
        - np.asarray(params.collision_z_offset)
    )
    kernel = partial(
        _kernel,
        n_substeps=n_substeps, dt=float(dt), kf=kf, km=km, arm_s=arm_s,
        mass=mass, jinv=jinv, gravity=gravity, ground_z=ground_z,
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(packed_state.shape, packed_state.dtype),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(packed_state, rpm_packed)


def ctrl_step(params, pos, quat, vel, omega, rpm, n_substeps: int, dt: float,
              interpret: bool = False):
    """Standard-layout wrapper: (B, ·) state arrays + (B, 4) rpm in/out."""
    B = pos.shape[0]
    packed = pack_state(pos, quat, vel, omega)
    rpm_packed = rpm.T.reshape(4, B // LANE, LANE)
    out = ctrl_step_packed(
        params, packed, rpm_packed, n_substeps, dt, interpret=interpret
    )
    return unpack_state(out)


# ---------------------------------------------------------------------------
# full-rollout kernel: n_steps x (sample action -> n_substeps physics ->
# reward/termination/autoreset) in ONE launch, state + RNG VMEM-resident


def _rollout_kernel(seed_ref, state_ref, out_ref, acc_ref, *, n_steps,
                    n_substeps, dt, kf, km, arm_s, mass, jinv, gravity,
                    ground_z, hover_rpm, act_scale, target, max_ep_steps,
                    init_z, smallangle=True):
    """Rollout kernel body. State is carried as a TUPLE of 13 (T, 128)
    channels through the step/substep loops (one stack at the end of the
    launch — the race kernels' carry-restructure treatment).

    ``smallangle=True`` (the headline configuration) integrates the
    quaternion with the small-angle axis-angle polynomials (see
    ``hover_rollout``); False keeps the exact sin/cos/div/sqrt integrator
    (bitwise-identical to the round-4 kernel — pinned on hardware,
    VALIDATION §5d)."""
    from jax.experimental.pallas import tpu as pltpu

    pltpu.prng_seed(seed_ref[0])
    st0 = state_ref[:]
    shape = st0.shape[1:]           # (T, 128)
    g_acc = dt * gravity / mass
    inv_m_dt = dt / mass
    tx_, ty_, tz_ = target
    half_dt = dt * 0.5

    def substep(ch, f, thrust, tx, ty, tz):
        px, py, pz, qx, qy, qz, qw, vx, vy, vz, wx, wy, wz = ch
        fx = 2.0 * (qx * qz + qy * qw) * thrust
        fy = 2.0 * (qy * qz - qx * qw) * thrust
        fz = (1.0 - 2.0 * (qx * qx + qy * qy)) * thrust
        vx = vx + fx * inv_m_dt
        vy = vy + fy * inv_m_dt
        vz = vz + fz * inv_m_dt - g_acc
        wx = wx + dt * jinv[0] * tx
        wy = wy + dt * jinv[1] * ty
        wz = wz + dt * jinv[2] * tz
        px = px + dt * vx
        py = py + dt * vy
        pz = pz + dt * vz
        r00 = 1.0 - 2.0 * (qy * qy + qz * qz)
        r01 = 2.0 * (qx * qy - qz * qw)
        r02 = 2.0 * (qx * qz + qy * qw)
        r10 = 2.0 * (qx * qy + qz * qw)
        r11 = 1.0 - 2.0 * (qx * qx + qz * qz)
        r12 = 2.0 * (qy * qz - qx * qw)
        r20 = 2.0 * (qx * qz - qy * qw)
        r21 = 2.0 * (qy * qz + qx * qw)
        r22 = 1.0 - 2.0 * (qx * qx + qy * qy)
        ox = r00 * wx + r01 * wy + r02 * wz
        oy = r10 * wx + r11 * wy + r12 * wz
        oz = r20 * wx + r21 * wy + r22 * wz
        if smallangle:
            # t2 = theta^2; sin(theta)/|omega| and cos(theta) as Horner
            # polynomials in t2 — the sqrt AND the division cancel, and
            # t2 = 0 yields the identity rotation exactly (no n≈0 guard)
            t2 = (ox * ox + oy * oy + oz * oz) * (half_dt * half_dt)
            s_n = half_dt * (
                1.0 + t2 * (-1.0 / 6.0 + t2 * (1.0 / 120.0))
            )
            c = 1.0 + t2 * (
                -0.5 + t2 * (1.0 / 24.0 + t2 * (-1.0 / 720.0))
            )
            ux, uy, uz = ox * s_n, oy * s_n, oz * s_n
            qx, qy, qz, qw = (
                c * qx + qw * ux + (uy * qz - uz * qy),
                c * qy + qw * uy + (uz * qx - ux * qz),
                c * qz + qw * uz + (ux * qy - uy * qx),
                c * qw - (ux * qx + uy * qy + uz * qz),
            )
        else:
            n = jnp.sqrt(ox * ox + oy * oy + oz * oz)
            safe = jnp.maximum(n, 1e-12)
            theta = n * (dt * 0.5)
            s_n = jnp.sin(theta) / safe
            c = jnp.cos(theta)
            ux, uy, uz = ox * s_n, oy * s_n, oz * s_n
            nqx = c * qx + qw * ux + (uy * qz - uz * qy)
            nqy = c * qy + qw * uy + (uz * qx - ux * qz)
            nqz = c * qz + qw * uz + (ux * qy - uy * qx)
            nqw = c * qw - (ux * qx + uy * qy + uz * qz)
            keep = n <= 1e-8
            qx = jnp.where(keep, qx, nqx)
            qy = jnp.where(keep, qy, nqy)
            qz = jnp.where(keep, qz, nqz)
            qw = jnp.where(keep, qw, nqw)
        below = pz < ground_z
        pz = jnp.where(below, ground_z, pz)
        vx = jnp.where(below, 0.0, vx)
        vy = jnp.where(below, 0.0, vy)
        vz = jnp.where(below, jnp.maximum(vz, 0.0), vz)
        wx = jnp.where(below, 0.0, wx)
        wy = jnp.where(below, 0.0, wy)
        wz = jnp.where(below, 0.0, wz)
        return (px, py, pz, qx, qy, qz, qw, vx, vy, vz, wx, wy, wz)

    def rand_uniform():
        """random floats in [-act_scale, act_scale) from raw PRNG bits."""
        bits = pltpu.prng_random_bits((4,) + shape)
        u = pltpu.bitcast(
            (pltpu.bitcast(bits, jnp.uint32) >> 9) | jnp.uint32(0x3F800000),
            jnp.float32,
        )  # [1, 2)
        return (u - 1.5) * (2.0 * act_scale)

    def step_body(_, carry):
        ch, steps, acc = carry
        a = rand_uniform()
        rpm = hover_rpm * (1.0 + 0.05 * a)
        f = rpm * rpm * kf
        thrust = f[0] + f[1] + f[2] + f[3]
        tx = (f[0] + f[1] - f[2] - f[3]) * arm_s
        ty = (-f[0] + f[1] + f[2] - f[3]) * arm_s
        t_ = rpm * rpm * km
        tz = t_[0] - t_[1] + t_[2] - t_[3]
        # full unroll: Mosaic schedules across substeps (measured +26% on
        # the race window from the same treatment)
        ch = jax.lax.fori_loop(
            0, n_substeps,
            lambda _, s: substep(s, f, thrust, tx, ty, tz), ch,
            unroll=n_substeps,
        )
        # HoverAviary reward / termination / truncation / autoreset
        px, py, pz = ch[0], ch[1], ch[2]
        qx, qy, qz, qw = ch[3], ch[4], ch[5], ch[6]
        e2 = (px - tx_) ** 2 + (py - ty_) ** 2 + (pz - tz_) ** 2
        reward = jnp.maximum(0.0, 2.0 - e2 * e2)
        # tilt checks without atan2/asin (unsupported in Pallas TPU):
        # |roll| > a  <=>  cos(roll) < 0 or |sin_part| > tan(a) * cos_part;
        # |pitch| > a <=>  |sin(pitch)| > sin(a)
        sinr = 2.0 * (qw * qx + qy * qz)
        cosr = 1.0 - 2.0 * (qx * qx + qy * qy)
        tan04 = 0.4227932  # tan(0.4)
        sin04 = 0.3894183  # sin(0.4)
        roll_out = (cosr <= 0.0) | (jnp.abs(sinr) > tan04 * cosr)
        sinp = 2.0 * (qw * qy - qz * qx)
        pitch_out = jnp.abs(sinp) > sin04
        steps = steps + 1
        # |e| < 1e-4 as e2 < 1e-8 in smallangle mode (sqrt is monotone;
        # saves the only remaining sqrt); exact mode keeps the round-4
        # formula for bitwise stability
        near = (e2 < 1e-8) if smallangle else (jnp.sqrt(e2) < 1e-4)
        done = (
            near
            | (jnp.abs(px) > 1.5) | (jnp.abs(py) > 1.5) | (pz > 2.0)
            | roll_out | pitch_out
            | (steps > max_ep_steps)
        )
        # per-channel autoreset (z = init_z, qw = 1, rest 0) — no iota
        # template, no whole-stack where
        rst = lambda x: jnp.where(done, 0.0, x)
        ch = (
            rst(ch[0]), rst(ch[1]), jnp.where(done, init_z, ch[2]),
            rst(ch[3]), rst(ch[4]), rst(ch[5]),
            jnp.where(done, 1.0, ch[6]),
            rst(ch[7]), rst(ch[8]), rst(ch[9]),
            rst(ch[10]), rst(ch[11]), rst(ch[12]),
        )
        steps = jnp.where(done, 0, steps)
        return ch, steps, acc + reward

    ch0 = tuple(st0[i] for i in range(N_CHANNELS))
    ch, steps, acc = jax.lax.fori_loop(
        0, n_steps, step_body,
        (ch0, jnp.zeros(shape, dtype=jnp.int32), jnp.zeros(shape)),
    )
    out_ref[:] = jnp.stack(ch, axis=0)
    acc_ref[:] = acc


def hover_rollout(params, packed_state, seed, n_steps: int,
                  n_substeps: int = 8, dt: float = 1.0 / 240.0,
                  act_scale: float = 0.05, target=(0.0, 0.0, 1.0),
                  max_ep_steps: int = 240, init_z: float = 0.1125,
                  smallangle: bool = True, interpret: bool = False):
    """Whole-rollout fused kernel: random RPM actions + physics + Hover
    reward/episode logic for n_steps control steps in one launch.

    Returns (final packed state, per-env accumulated reward (T, 128)).

    ``smallangle`` (default, the round-5 headline configuration) replaces
    the exact axis-angle quaternion update (reference
    BaseAviary._integrateQ:883-896: sqrt + sin + cos + div per substep)
    with Horner polynomials in theta^2 = |omega|^2 (dt/2)^2 — the sqrt
    and division cancel algebraically. On this chip sin/cos each cost
    ~100 single-issue VPU slots (measured, scripts/vpu_calibrate.py), so
    the exact integrator spends ~2/3 of the whole kernel's issue budget
    on that one line; the polynomials cut it to a handful of FMAs
    (measured +66%: 1.71 -> 2.85B env-steps/s @ 4096 envs). Truncation
    error theta^5/120 (sin) / theta^8/40320 (cos) is below f32 rounding
    of the exact values for theta < 0.1 = |omega| < 48 rad/s — far above
    any state the hover env reaches before its tilt/bounds truncation —
    so the integrator is exact-to-rounding over the reachable state
    space (measured over a 64-step 4096-env rollout: max |state delta|
    6e-7; pinned in tests/test_pallas.py). ``smallangle=False`` keeps
    the round-4 kernel bitwise (VALIDATION §5d).
    """
    kf = float(np.asarray(params.kf))
    km = float(np.asarray(params.km))
    arm_s = float(np.asarray(params.arm)) / float(np.sqrt(2.0))
    mass = float(np.asarray(params.mass))
    jinv = tuple(float(x) for x in 1.0 / np.asarray(params.J))
    gravity = 9.8 * mass
    ground_z = float(
        np.asarray(params.collision_h) / 2.0
        - np.asarray(params.collision_z_offset)
    )
    hover_rpm = float(np.sqrt(gravity / (4.0 * kf)))
    kernel = partial(
        _rollout_kernel,
        n_steps=n_steps, n_substeps=n_substeps, dt=float(dt), kf=kf, km=km,
        arm_s=arm_s, mass=mass, jinv=jinv, gravity=gravity,
        ground_z=ground_z, hover_rpm=hover_rpm, act_scale=act_scale,
        target=tuple(float(v) for v in target), max_ep_steps=max_ep_steps,
        init_z=init_z, smallangle=smallangle,
    )
    T = packed_state.shape[1]
    return pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct(packed_state.shape, packed_state.dtype),
            jax.ShapeDtypeStruct((T, LANE), packed_state.dtype),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(jnp.asarray([seed], dtype=jnp.int32), packed_state)


def rollout_step_math(params, packed, action, steps, acc,
                      n_substeps: int = 8, dt: float = 1.0 / 240.0,
                      target=(0.0, 0.0, 1.0), max_ep_steps: int = 240,
                      init_z: float = 0.1125, smallangle: bool = True):
    """ONE step of ``_rollout_kernel``'s math as a plain-jnp function —
    the roofline-census twin of the headline kernel (utils/roofline.py
    censuses this, not fast_hover.make_step, because the rollout kernel
    has no atan2/asin observation tail and uses the small-angle
    integrator). The in-kernel hardware-PRNG draw is replaced by an
    ``action`` argument (the draw's post-processing is ~5 weight-1 ops
    on 4 rows — <2% of the census — and the generator itself is a
    dedicated unit, not VPU issue slots). Mirrors the kernel body 1:1;
    also used by the interpret-free accuracy pin in tests/test_pallas.py.

    Args: packed (13, T, 128); action (4, T, 128) in [-1, 1];
    steps (T, 128) int32; acc (T, 128) f32.
    Returns (packed, steps, acc, reward).
    """
    kf = float(np.asarray(params.kf))
    km = float(np.asarray(params.km))
    arm_s = float(np.asarray(params.arm)) / float(np.sqrt(2.0))
    mass = float(np.asarray(params.mass))
    jinv = tuple(float(x) for x in 1.0 / np.asarray(params.J))
    gravity = 9.8 * mass
    ground_z = float(
        np.asarray(params.collision_h) / 2.0
        - np.asarray(params.collision_z_offset)
    )
    hover_rpm = float(np.sqrt(gravity / (4.0 * kf)))
    g_acc = dt * gravity / mass
    inv_m_dt = dt / mass
    tx_, ty_, tz_ = target
    half_dt = dt * 0.5

    def substep(ch, f, thrust, tx, ty, tz):
        px, py, pz, qx, qy, qz, qw, vx, vy, vz, wx, wy, wz = ch
        fx = 2.0 * (qx * qz + qy * qw) * thrust
        fy = 2.0 * (qy * qz - qx * qw) * thrust
        fz = (1.0 - 2.0 * (qx * qx + qy * qy)) * thrust
        vx = vx + fx * inv_m_dt
        vy = vy + fy * inv_m_dt
        vz = vz + fz * inv_m_dt - g_acc
        wx = wx + dt * jinv[0] * tx
        wy = wy + dt * jinv[1] * ty
        wz = wz + dt * jinv[2] * tz
        px = px + dt * vx
        py = py + dt * vy
        pz = pz + dt * vz
        r00 = 1.0 - 2.0 * (qy * qy + qz * qz)
        r01 = 2.0 * (qx * qy - qz * qw)
        r02 = 2.0 * (qx * qz + qy * qw)
        r10 = 2.0 * (qx * qy + qz * qw)
        r11 = 1.0 - 2.0 * (qx * qx + qz * qz)
        r12 = 2.0 * (qy * qz - qx * qw)
        r20 = 2.0 * (qx * qz - qy * qw)
        r21 = 2.0 * (qy * qz + qx * qw)
        r22 = 1.0 - 2.0 * (qx * qx + qy * qy)
        ox = r00 * wx + r01 * wy + r02 * wz
        oy = r10 * wx + r11 * wy + r12 * wz
        oz = r20 * wx + r21 * wy + r22 * wz
        if smallangle:
            t2 = (ox * ox + oy * oy + oz * oz) * (half_dt * half_dt)
            s_n = half_dt * (
                1.0 + t2 * (-1.0 / 6.0 + t2 * (1.0 / 120.0))
            )
            c = 1.0 + t2 * (
                -0.5 + t2 * (1.0 / 24.0 + t2 * (-1.0 / 720.0))
            )
            ux, uy, uz = ox * s_n, oy * s_n, oz * s_n
            qx, qy, qz, qw = (
                c * qx + qw * ux + (uy * qz - uz * qy),
                c * qy + qw * uy + (uz * qx - ux * qz),
                c * qz + qw * uz + (ux * qy - uy * qx),
                c * qw - (ux * qx + uy * qy + uz * qz),
            )
        else:
            n = jnp.sqrt(ox * ox + oy * oy + oz * oz)
            safe = jnp.maximum(n, 1e-12)
            theta = n * (dt * 0.5)
            s_n = jnp.sin(theta) / safe
            c = jnp.cos(theta)
            ux, uy, uz = ox * s_n, oy * s_n, oz * s_n
            nqx = c * qx + qw * ux + (uy * qz - uz * qy)
            nqy = c * qy + qw * uy + (uz * qx - ux * qz)
            nqz = c * qz + qw * uz + (ux * qy - uy * qx)
            nqw = c * qw - (ux * qx + uy * qy + uz * qz)
            keep = n <= 1e-8
            qx = jnp.where(keep, qx, nqx)
            qy = jnp.where(keep, qy, nqy)
            qz = jnp.where(keep, qz, nqz)
            qw = jnp.where(keep, qw, nqw)
        below = pz < ground_z
        pz = jnp.where(below, ground_z, pz)
        vx = jnp.where(below, 0.0, vx)
        vy = jnp.where(below, 0.0, vy)
        vz = jnp.where(below, jnp.maximum(vz, 0.0), vz)
        wx = jnp.where(below, 0.0, wx)
        wy = jnp.where(below, 0.0, wy)
        wz = jnp.where(below, 0.0, wz)
        return (px, py, pz, qx, qy, qz, qw, vx, vy, vz, wx, wy, wz)

    rpm = hover_rpm * (1.0 + 0.05 * action)
    f = rpm * rpm * kf
    thrust = f[0] + f[1] + f[2] + f[3]
    tx = (f[0] + f[1] - f[2] - f[3]) * arm_s
    ty = (-f[0] + f[1] + f[2] - f[3]) * arm_s
    t_ = rpm * rpm * km
    tz = t_[0] - t_[1] + t_[2] - t_[3]
    ch = tuple(packed[i] for i in range(N_CHANNELS))
    for _ in range(n_substeps):
        ch = substep(ch, f, thrust, tx, ty, tz)
    px, py, pz = ch[0], ch[1], ch[2]
    qx, qy, qz, qw = ch[3], ch[4], ch[5], ch[6]
    e2 = (px - tx_) ** 2 + (py - ty_) ** 2 + (pz - tz_) ** 2
    reward = jnp.maximum(0.0, 2.0 - e2 * e2)
    sinr = 2.0 * (qw * qx + qy * qz)
    cosr = 1.0 - 2.0 * (qx * qx + qy * qy)
    tan04 = 0.4227932
    sin04 = 0.3894183
    roll_out = (cosr <= 0.0) | (jnp.abs(sinr) > tan04 * cosr)
    sinp = 2.0 * (qw * qy - qz * qx)
    pitch_out = jnp.abs(sinp) > sin04
    steps = steps + 1
    near = (e2 < 1e-8) if smallangle else (jnp.sqrt(e2) < 1e-4)
    done = (
        near
        | (jnp.abs(px) > 1.5) | (jnp.abs(py) > 1.5) | (pz > 2.0)
        | roll_out | pitch_out
        | (steps > max_ep_steps)
    )
    rst = lambda x: jnp.where(done, 0.0, x)
    ch = (
        rst(ch[0]), rst(ch[1]), jnp.where(done, init_z, ch[2]),
        rst(ch[3]), rst(ch[4]), rst(ch[5]),
        jnp.where(done, 1.0, ch[6]),
        rst(ch[7]), rst(ch[8]), rst(ch[9]),
        rst(ch[10]), rst(ch[11]), rst(ch[12]),
    )
    steps = jnp.where(done, 0, steps)
    return jnp.stack(ch, axis=0), steps, acc + reward, reward
