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
                    init_z):
    from jax.experimental.pallas import tpu as pltpu

    pltpu.prng_seed(seed_ref[0])
    st0 = state_ref[:]
    shape = st0.shape[1:]           # (T, 128)
    g_acc = dt * gravity / mass
    inv_m_dt = dt / mass
    tx_, ty_, tz_ = target

    def substep(st, f, thrust, tx, ty, tz):
        px, py, pz = st[0], st[1], st[2]
        qx, qy, qz, qw = st[3], st[4], st[5], st[6]
        vx, vy, vz = st[7], st[8], st[9]
        wx, wy, wz = st[10], st[11], st[12]
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
        return jnp.stack(
            [px, py, pz, qx, qy, qz, qw, vx, vy, vz, wx, wy, wz], axis=0
        )

    def rand_uniform():
        """random floats in [-act_scale, act_scale) from raw PRNG bits."""
        bits = pltpu.prng_random_bits((4,) + shape)
        u = pltpu.bitcast(
            (pltpu.bitcast(bits, jnp.uint32) >> 9) | jnp.uint32(0x3F800000),
            jnp.float32,
        )  # [1, 2)
        return (u - 1.5) * (2.0 * act_scale)

    def step_body(_, carry):
        st, steps, acc = carry
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
        st = jax.lax.fori_loop(
            0, n_substeps,
            lambda _, s: substep(s, f, thrust, tx, ty, tz), st,
            unroll=n_substeps,
        )
        # HoverAviary reward / termination / truncation / autoreset
        px, py, pz = st[0], st[1], st[2]
        qx, qy, qz, qw = st[3], st[4], st[5], st[6]
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
        done = (
            (jnp.sqrt(e2) < 1e-4)
            | (jnp.abs(px) > 1.5) | (jnp.abs(py) > 1.5) | (pz > 2.0)
            | roll_out | pitch_out
            | (steps > max_ep_steps)
        )
        # reset template without scatter (unsupported in Mosaic):
        # channel 2 (z) = init_z, channel 6 (qw) = 1, rest 0
        chan = jax.lax.broadcasted_iota(jnp.int32, st.shape, 0)
        reset = jnp.where(
            chan == 2, init_z, jnp.where(chan == 6, 1.0, 0.0)
        ).astype(st.dtype)
        st = jnp.where(done[None], reset, st)
        steps = jnp.where(done, 0, steps)
        return st, steps, acc + reward

    st, steps, acc = jax.lax.fori_loop(
        0, n_steps, step_body,
        (st0, jnp.zeros(shape, dtype=jnp.int32), jnp.zeros(shape)),
    )
    out_ref[:] = st
    acc_ref[:] = acc


def hover_rollout(params, packed_state, seed, n_steps: int,
                  n_substeps: int = 8, dt: float = 1.0 / 240.0,
                  act_scale: float = 0.05, target=(0.0, 0.0, 1.0),
                  max_ep_steps: int = 240, init_z: float = 0.1125,
                  interpret: bool = False):
    """Whole-rollout fused kernel: random RPM actions + physics + Hover
    reward/episode logic for n_steps control steps in one launch.

    Returns (final packed state, per-env accumulated reward (T, 128)).
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
        init_z=init_z,
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
