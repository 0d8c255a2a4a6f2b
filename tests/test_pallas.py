"""Pallas fused ctrl-step kernel vs the XLA reference path (interpret mode
on CPU; the TPU compiled path is exercised by bench.py --impl pallas)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from functools import partial

from gym_pybullet_adrp_tpu.models.drone import drone_params
from gym_pybullet_adrp_tpu.ops import dynamics, pallas_step, quat as quat_ops
from gym_pybullet_adrp_tpu.utils.enums import DroneModel, Physics


def test_pack_unpack_roundtrip():
    rng = np.random.default_rng(0)
    B = 256
    pos = jnp.asarray(rng.normal(size=(B, 3)), dtype=jnp.float32)
    quat = jnp.asarray(rng.normal(size=(B, 4)), dtype=jnp.float32)
    vel = jnp.asarray(rng.normal(size=(B, 3)), dtype=jnp.float32)
    om = jnp.asarray(rng.normal(size=(B, 3)), dtype=jnp.float32)
    p2, q2, v2, o2 = pallas_step.unpack_state(
        pallas_step.pack_state(pos, quat, vel, om)
    )
    np.testing.assert_array_equal(np.asarray(p2), np.asarray(pos))
    np.testing.assert_array_equal(np.asarray(q2), np.asarray(quat))
    np.testing.assert_array_equal(np.asarray(v2), np.asarray(vel))
    np.testing.assert_array_equal(np.asarray(o2), np.asarray(om))


def test_kernel_matches_xla_path():
    params = drone_params(DroneModel.CF2X, dtype=jnp.float32)
    rng = np.random.default_rng(1)
    B = 256
    pos = jnp.asarray(
        rng.uniform(-1, 1, size=(B, 3)) + [0, 0, 1.5], dtype=jnp.float32
    )
    rpy = jnp.asarray(rng.uniform(-0.3, 0.3, size=(B, 3)), dtype=jnp.float32)
    quat = quat_ops.from_euler_xyz(rpy)
    vel = jnp.asarray(rng.uniform(-1, 1, size=(B, 3)), dtype=jnp.float32)
    om = jnp.asarray(rng.uniform(-2, 2, size=(B, 3)), dtype=jnp.float32)
    rpm = jnp.asarray(
        rng.uniform(0.9, 1.1, size=(B, 4)) * float(params.hover_rpm),
        dtype=jnp.float32,
    )
    dt = 1.0 / 240.0
    n_sub = 8

    # XLA reference path (per-env vmap of the faithful implementation)
    state = dynamics.PhysState(
        pos=pos[:, None], quat=quat[:, None], vel=vel[:, None],
        omega=om[:, None],
    )

    def one(s, r):
        out, _ = dynamics.ctrl_step(
            params, s, r[None], r[None], dt, n_sub,
            DroneModel.CF2X, Physics.PYB,
        )
        return out

    ref = jax.vmap(one)(
        jax.tree_util.tree_map(lambda x: x, state), rpm
    )

    # pallas kernel, interpreter mode (no TPU needed)
    p2, q2, v2, o2 = pallas_step.ctrl_step(
        params, pos, quat, vel, om, rpm, n_sub, dt, interpret=True
    )

    np.testing.assert_allclose(
        np.asarray(p2), np.asarray(ref.pos[:, 0]), atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(q2), np.asarray(ref.quat[:, 0]), atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(v2), np.asarray(ref.vel[:, 0]), atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(o2), np.asarray(ref.omega[:, 0]), atol=2e-4
    )


def test_kernel_ground_contact():
    params = drone_params(DroneModel.CF2X, dtype=jnp.float32)
    B = 128
    pos = jnp.tile(jnp.asarray([[0.0, 0.0, 0.02]], jnp.float32), (B, 1))
    quat = jnp.tile(jnp.asarray([[0, 0, 0, 1.0]], jnp.float32), (B, 1))
    vel = jnp.tile(jnp.asarray([[0.0, 0.0, -1.0]], jnp.float32), (B, 1))
    om = jnp.zeros((B, 3), jnp.float32)
    rpm = jnp.zeros((B, 4), jnp.float32)
    p2, q2, v2, o2 = pallas_step.ctrl_step(
        params, pos, quat, vel, om, rpm, 8, 1 / 240, interpret=True
    )
    ground_z = float(params.collision_h) / 2
    np.testing.assert_allclose(np.asarray(p2)[:, 2], ground_z, atol=1e-6)
    assert np.all(np.asarray(v2)[:, 2] >= 0.0)


def test_smallangle_integrator_accuracy():
    """The headline rollout kernel's small-angle quaternion update
    (round 5: sin/cos/div/sqrt replaced by Horner polynomials in theta^2
    — ops/pallas_step.rollout_step_math, the kernel's bitwise math twin,
    verified 0.0 delta against the Mosaic kernel on hardware).

    (a) Polynomial vs f64 exact over the full reachable theta range:
        below f32 rounding of the exact values.
    (b) Closed-loop: 64 steps x 8 substeps with random actions, Taylor vs
        the exact integrator — trajectories agree to f32 closed-loop
        accumulation tolerance.
    """
    # (a) direct bound: theta = |omega| dt/2, dt = 1/240; hover states
    # stay far below |omega| = 48 rad/s (theta = 0.1)
    theta = np.linspace(0.0, 0.1, 10001)
    t2 = theta * theta
    ps = 1.0 + t2 * (-1.0 / 6.0 + t2 * (1.0 / 120.0))       # sin(t)/t
    pc = 1.0 + t2 * (-0.5 + t2 * (1.0 / 24.0 + t2 * (-1.0 / 720.0)))
    sin_exact = np.sinc(theta / np.pi)                       # sin(t)/t, f64
    cos_exact = np.cos(theta)
    f32eps = 1.2e-7
    assert np.abs(ps - sin_exact).max() < f32eps
    assert np.abs(pc - cos_exact).max() < f32eps

    # (b) closed loop on the math twin (plain jnp -> runs on CPU)
    params = drone_params(DroneModel.CF2X, dtype=jnp.float32)
    T = 1
    packed = np.zeros((13, T, 128), np.float32)
    packed[2] = 0.1125
    packed[6] = 1.0
    st_a = st_b = jnp.asarray(packed)
    steps_a = steps_b = jnp.zeros((T, 128), jnp.int32)
    acc_a = acc_b = jnp.zeros((T, 128), jnp.float32)
    rng = np.random.default_rng(3)
    step = jax.jit(partial(pallas_step.rollout_step_math, params),
                   static_argnames=("smallangle",))
    for _ in range(64):
        act = jnp.asarray(
            rng.uniform(-1, 1, size=(4, T, 128)), dtype=jnp.float32
        )
        st_a, steps_a, acc_a, _ = step(st_a, act, steps_a, acc_a,
                                       smallangle=True)
        st_b, steps_b, acc_b, _ = step(st_b, act, steps_b, acc_b,
                                       smallangle=False)
    np.testing.assert_allclose(
        np.asarray(st_a), np.asarray(st_b), atol=2e-5,
    )
    np.testing.assert_allclose(
        np.asarray(acc_a), np.asarray(acc_b), atol=1e-3,
    )
    np.testing.assert_array_equal(np.asarray(steps_a), np.asarray(steps_b))
