"""v3: tuple carry + small-angle quaternion update (Taylor in theta^2).

The on-chip calibration (scripts/vpu_calibrate.py) measures sin/cos at
~100 single-issue slots per element, div ~9, sqrt ~8 — the exact
integrator's per-substep (sqrt, sin, cos, div) block is ~220 slots of the
~330-slot substep. But theta = |omega| * dt/2 with dt = 1/240 is tiny for
every reachable hover state (|omega| < ~50 rad/s => theta < 0.1), so

    sin(theta)/|omega| = (dt/2) * P_s(t2),  P_s = 1 - t2/6 + t2^2/120
    cos(theta)         = P_c(t2),           P_c = 1 - t2/2 + t2^2/24 - t2^3/720
    with t2 = theta^2 = |omega|^2 * (dt/2)^2

— the sqrt AND the division cancel algebraically, and the n ~= 0 guard
becomes unnecessary (t2 = 0 gives the identity rotation exactly).
Truncation error (theta^5/120 resp. theta^8/40320) stays below f32
rounding of the exact values for theta < 0.1 (1e-7 relative), i.e. the
integrator is exact-to-rounding over the reachable state space.

Run ON TPU: python results/hover_vpu/ab_v3.py
"""

import sys
import time
from functools import partial

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from gym_pybullet_adrp_tpu.envs import fast_hover
from gym_pybullet_adrp_tpu.models.drone import drone_params
from gym_pybullet_adrp_tpu.ops import pallas_step
from gym_pybullet_adrp_tpu.utils.enums import DroneModel

LANE = 128


def _rollout_kernel_v3(seed_ref, state_ref, out_ref, acc_ref, *, n_steps,
                       n_substeps, dt, kf, km, arm_s, mass, jinv, gravity,
                       ground_z, hover_rpm, act_scale, target, max_ep_steps,
                       init_z):
    pltpu.prng_seed(seed_ref[0])
    st0 = state_ref[:]
    shape = st0.shape[1:]
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
        # small-angle axis-angle update: t2 = theta^2; sin(theta)/n and
        # cos(theta) as Horner polynomials in t2 (sqrt + div cancel)
        t2 = (ox * ox + oy * oy + oz * oz) * (half_dt * half_dt)
        s_n = half_dt * (1.0 + t2 * (-1.0 / 6.0 + t2 * (1.0 / 120.0)))
        c = 1.0 + t2 * (-0.5 + t2 * (1.0 / 24.0 + t2 * (-1.0 / 720.0)))
        ux, uy, uz = ox * s_n, oy * s_n, oz * s_n
        nqx = c * qx + qw * ux + (uy * qz - uz * qy)
        nqy = c * qy + qw * uy + (uz * qx - ux * qz)
        nqz = c * qz + qw * uz + (ux * qy - uy * qx)
        nqw = c * qw - (ux * qx + uy * qy + uz * qz)
        qx, qy, qz, qw = nqx, nqy, nqz, nqw
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
        bits = pltpu.prng_random_bits((4,) + shape)
        u = pltpu.bitcast(
            (pltpu.bitcast(bits, jnp.uint32) >> 9) | jnp.uint32(0x3F800000),
            jnp.float32,
        )
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
        ch = jax.lax.fori_loop(
            0, n_substeps,
            lambda _, s: substep(s, f, thrust, tx, ty, tz), ch,
            unroll=n_substeps,
        )
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
        done = (
            (e2 < 1e-8)
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
        return ch, steps, acc + reward

    ch0 = tuple(st0[i] for i in range(13))
    ch, steps, acc = jax.lax.fori_loop(
        0, n_steps, step_body,
        (ch0, jnp.zeros(shape, dtype=jnp.int32), jnp.zeros(shape)),
    )
    out_ref[:] = jnp.stack(ch, axis=0)
    acc_ref[:] = acc


def hover_rollout_v3(params, packed_state, seed, n_steps, **kw):
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
        _rollout_kernel_v3,
        n_steps=n_steps, n_substeps=8, dt=1.0 / 240.0, kf=kf, km=km,
        arm_s=arm_s, mass=mass, jinv=jinv, gravity=gravity,
        ground_z=ground_z, hover_rpm=hover_rpm, act_scale=0.05,
        target=(0.0, 0.0, 1.0), max_ep_steps=240, init_z=0.1125,
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
    )(jnp.asarray([seed], dtype=jnp.int32), packed_state)


def make_fn(roll, envs, steps, chunk=64):
    n_chunks = max(steps // chunk, 1)
    params = drone_params(DroneModel.CF2X)
    state0 = fast_hover.reset_packed(np.array([0.0, 0.0, 0.1125]), envs)

    @jax.jit
    def fn(seed, packed0):
        def body(carry, i):
            p, total = carry
            p, acc = roll(params, p, seed + i, n_steps=chunk)
            return (p, total + jnp.sum(acc)), None

        (p, total), _ = jax.lax.scan(
            body, (packed0, jnp.zeros(())), jnp.arange(n_chunks)
        )
        return total

    return partial(fn, packed0=state0.packed), n_chunks * chunk


def measure(fn, env_steps, repeats=16):
    jax.block_until_ready(fn(0))
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        outs = [fn(0) for _ in range(repeats)]
        jax.block_until_ready(outs)
        times.append((time.perf_counter() - t0) / repeats)
    return env_steps / min(times)


if __name__ == "__main__":
    assert jax.devices()[0].platform == "tpu"
    params = drone_params(DroneModel.CF2X)
    st = fast_hover.reset_packed(np.array([0.0, 0.0, 0.1125]), 4096).packed

    # accuracy vs the exact kernel over a 64-step rollout, same PRNG seed
    p1, a1 = jax.jit(
        lambda p: pallas_step.hover_rollout(params, p, 7, n_steps=64)
    )(st)
    p3, a3 = jax.jit(
        lambda p: hover_rollout_v3(params, p, 7, n_steps=64)
    )(st)
    print(f"64-step |state delta| max {float(jnp.abs(p3 - p1).max()):.3g}  "
          f"|acc delta| max {float(jnp.abs(a3 - a1).max()):.3g}  "
          f"acc sum exact {float(a1.sum()):.6g} v3 {float(a3.sum()):.6g}")

    for name, roll in [("v1(exact)", pallas_step.hover_rollout),
                       ("v3(taylor)", hover_rollout_v3)]:
        for envs in (4096, 8192):
            fn, steps = make_fn(roll, envs, 3840)
            r = measure(fn, envs * steps)
            print(f"{name:11s} {envs}env  {r / 1e9:6.3f}B env-steps/s",
                  flush=True)
