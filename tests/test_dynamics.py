"""Golden-trajectory tests for the physics engine.

PyBullet is unavailable in this environment, so the oracle for the DYN path
is an independent float64 NumPy transcription of the reference's published
update equations (``BaseAviary._dynamics``, reference envs/BaseAviary.py:
822-896). The PYB-path force models are validated against their closed
forms (BaseAviary.py:683-818) and physical invariants.
"""

import numpy as np
import jax
import jax.numpy as jnp

from gym_pybullet_adrp_tpu.models.drone import drone_params
from gym_pybullet_adrp_tpu.ops import dynamics, quat as quat_ops
from gym_pybullet_adrp_tpu.utils.enums import DroneModel, Physics

RNG = np.random.default_rng(42)


def numpy_dyn_oracle(pos, quat, vel, rpy_rates, rpm, dt, p, n_steps):
    """Float64 oracle of the reference DYN update (BaseAviary.py:822-896)."""
    from scipy.spatial.transform import Rotation as R

    m, L, kf, km = p["m"], p["L"], p["kf"], p["km"]
    J = np.diag(p["J"])
    J_inv = np.linalg.inv(J)
    gravity = 9.8 * m
    for _ in range(n_steps):
        rotation = R.from_quat(quat).as_matrix()
        forces = rpm**2 * kf
        thrust = np.array([0.0, 0.0, np.sum(forces)])
        thrust_world = rotation @ thrust
        force_world = thrust_world - np.array([0.0, 0.0, gravity])
        z_torques = rpm**2 * km
        z_torque = -z_torques[0] + z_torques[1] - z_torques[2] + z_torques[3]
        x_torque = (forces[0] + forces[1] - forces[2] - forces[3]) * (L / np.sqrt(2))
        y_torque = (-forces[0] + forces[1] + forces[2] - forces[3]) * (L / np.sqrt(2))
        torques = np.array([x_torque, y_torque, z_torque])
        torques = torques - np.cross(rpy_rates, J @ rpy_rates)
        rpy_rates_deriv = J_inv @ torques
        acc = force_world / m
        vel = vel + dt * acc
        rpy_rates = rpy_rates + dt * rpy_rates_deriv
        pos = pos + dt * vel
        # quaternion update (reference _integrateQ)
        omega_norm = np.linalg.norm(rpy_rates)
        if not np.isclose(omega_norm, 0):
            pq, qq, rq = rpy_rates
            lam = (
                np.array(
                    [
                        [0, rq, -qq, pq],
                        [-rq, 0, pq, qq],
                        [qq, -pq, 0, rq],
                        [-pq, -qq, -rq, 0],
                    ]
                )
                * 0.5
            )
            theta = omega_norm * dt / 2
            quat = (
                np.eye(4) * np.cos(theta) + 2 / omega_norm * lam * np.sin(theta)
            ) @ quat
    return pos, quat, vel, rpy_rates


def test_dyn_matches_reference_equations():
    params = drone_params(DroneModel.CF2X, dtype=jnp.float64)
    p = dict(m=0.03454, L=0.0397, kf=3.16e-10, km=7.94e-12,
             J=(1.4e-5, 1.4e-5, 2.17e-5))
    dt = 1.0 / 240.0
    hover_rpm = float(params.hover_rpm)
    # slightly asymmetric rpm to excite rotation
    rpm = np.array([1.02, 0.99, 1.01, 0.98]) * hover_rpm

    pos0 = np.array([0.1, -0.2, 0.5])
    rpy0 = np.array([0.05, -0.03, 0.4])
    from scipy.spatial.transform import Rotation as R

    quat0 = R.from_euler("xyz", rpy0).as_quat()
    vel0 = np.array([0.1, 0.0, -0.05])
    rates0 = np.array([0.3, -0.2, 0.1])

    n_steps = 480  # 2 seconds
    ref = numpy_dyn_oracle(
        pos0.copy(), quat0.copy(), vel0.copy(), rates0.copy(), rpm, dt, p,
        n_steps,
    )

    state = dynamics.PhysState(
        pos=jnp.asarray(pos0)[None],
        quat=jnp.asarray(quat0)[None],
        vel=jnp.asarray(vel0)[None],
        omega=jnp.asarray(rates0)[None],
    )
    rpm_j = jnp.asarray(rpm)[None]

    @jax.jit
    def run(state):
        def body(s, _):
            s = dynamics.substep(
                params, s, rpm_j, rpm_j, dt, DroneModel.CF2X, Physics.DYN
            )
            return s, None

        s, _ = jax.lax.scan(body, state, None, length=n_steps)
        return s

    out = run(state)
    # tolerance bounded by XLA CPU f64 trig accuracy (~1e-8/step) accumulated
    # over 480 substeps; the update algebra itself is exact (see test_quat)
    np.testing.assert_allclose(np.asarray(out.pos[0]), ref[0], atol=5e-6)
    q_ours = np.asarray(out.quat[0])
    q_ref = ref[1] / np.linalg.norm(ref[1])
    q_ours = q_ours / np.linalg.norm(q_ours)
    sign = np.sign(np.dot(q_ours, q_ref))
    np.testing.assert_allclose(q_ours, sign * q_ref, atol=5e-6)
    np.testing.assert_allclose(np.asarray(out.vel[0]), ref[2], atol=5e-6)
    np.testing.assert_allclose(np.asarray(out.omega[0]), ref[3], atol=5e-6)


def test_pyb_hover_equilibrium():
    """At hover rpm and level attitude, PYB physics keeps the drone still."""
    params = drone_params(DroneModel.CF2X, dtype=jnp.float64)
    state = dynamics.initial_state(
        np.array([[0.0, 0.0, 1.0]]), np.zeros((1, 3)), dtype=jnp.float64
    )
    rpm = jnp.full((1, 4), params.hover_rpm, dtype=jnp.float64)
    dt = 1.0 / 240.0
    s = state
    for _ in range(240):
        s = dynamics.substep(params, s, rpm, rpm, dt, DroneModel.CF2X, Physics.PYB)
    np.testing.assert_allclose(np.asarray(s.pos[0]), [0, 0, 1], atol=1e-7)
    np.testing.assert_allclose(np.asarray(s.vel[0]), 0, atol=1e-7)


def test_pyb_vs_dyn_agree_freefall():
    """With zero rpm both pipelines are pure gravity — must agree closely."""
    params = drone_params(DroneModel.CF2X, dtype=jnp.float64)
    state = dynamics.initial_state(
        np.array([[0.0, 0.0, 10.0]]), np.zeros((1, 3)), dtype=jnp.float64
    )
    rpm = jnp.zeros((1, 4), dtype=jnp.float64)
    dt = 1.0 / 240.0
    s1 = s2 = state
    for _ in range(120):
        s1 = dynamics.substep(params, s1, rpm, rpm, dt, DroneModel.CF2X, Physics.PYB)
        s2 = dynamics.substep(params, s2, rpm, rpm, dt, DroneModel.CF2X, Physics.DYN)
    np.testing.assert_allclose(np.asarray(s1.pos), np.asarray(s2.pos), atol=1e-9)


def test_ground_effect_positive_near_ground():
    params = drone_params(DroneModel.CF2X, dtype=jnp.float64)
    near = dynamics.initial_state(
        np.array([[0.0, 0.0, 0.05]]), np.zeros((1, 3)), dtype=jnp.float64
    )
    far = dynamics.initial_state(
        np.array([[0.0, 0.0, 2.0]]), np.zeros((1, 3)), dtype=jnp.float64
    )
    rpm = jnp.full((1, 4), params.hover_rpm, dtype=jnp.float64)
    fz_near, _ = dynamics.ground_effect(params, near, rpm, DroneModel.CF2X)
    fz_far, _ = dynamics.ground_effect(params, far, rpm, DroneModel.CF2X)
    assert float(fz_near[0]) > float(fz_far[0]) > 0

    # closed form check at h=0.05 (reference _groundEffect:745-748)
    h = np.clip(0.05, float(params.gnd_eff_h_clip), np.inf)
    expected = (
        4.0
        * float(params.hover_rpm) ** 2
        * float(params.kf)
        * float(params.gnd_eff_coeff)
        * (float(params.prop_radius) / (4 * h)) ** 2
    )
    np.testing.assert_allclose(float(fz_near[0]), expected, rtol=1e-9)

    # gated out when flipped (reference :749)
    flipped = dynamics.initial_state(
        np.array([[0.0, 0.0, 0.05]]), np.array([[np.pi, 0.0, 0.0]]),
        dtype=jnp.float64,
    )
    fz_flip, _ = dynamics.ground_effect(params, flipped, rpm, DroneModel.CF2X)
    assert float(fz_flip[0]) == 0.0


def test_drag_closed_form():
    params = drone_params(DroneModel.CF2X, dtype=jnp.float64)
    state = dynamics.PhysState(
        pos=jnp.zeros((1, 3)),
        quat=quat_ops.from_euler_xyz(jnp.asarray([[0.3, -0.2, 0.9]])),
        vel=jnp.asarray([[1.0, -2.0, 0.5]]),
        omega=jnp.zeros((1, 3)),
    )
    rpm = jnp.full((1, 4), 20000.0, dtype=jnp.float64)
    drag = np.asarray(dynamics.drag_force_world(params, state, rpm))
    # reference net world force: -coeff ⊙ v * Σ(2π rpm/60) (rotations cancel)
    omega_sum = np.sum(2 * np.pi * np.full(4, 20000.0) / 60)
    expected = -np.array([9.1785e-7, 9.1785e-7, 10.311e-7]) * omega_sum * np.array(
        [1.0, -2.0, 0.5]
    )
    np.testing.assert_allclose(drag[0], expected, rtol=1e-9)


def test_downwash_only_from_above():
    params = drone_params(DroneModel.CF2X, dtype=jnp.float64)
    state = dynamics.initial_state(
        np.array([[0.0, 0.0, 0.5], [0.1, 0.0, 1.0]]), np.zeros((2, 3)),
        dtype=jnp.float64,
    )
    dw = np.asarray(dynamics.downwash_force_body_z(params, state))
    assert dw[0] < 0  # lower drone pushed down
    assert dw[1] == 0  # upper drone unaffected

    # closed form (reference _downwash:805-811)
    dz, dxy = 0.5, 0.1
    alpha = 2267.18 * (2.31348e-2 / (4 * dz)) ** 2
    beta = 0.16 * dz + (-0.11)
    expected = -alpha * np.exp(-0.5 * (dxy / beta) ** 2)
    np.testing.assert_allclose(dw[0], expected, rtol=1e-9)
