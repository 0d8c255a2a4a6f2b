"""Coverage for all Physics modes and drone models.

The reference composes force augmentations per mode
(BaseAviary.step:347-376); these tests pin the composition semantics and
the per-model mixer geometry.
"""

import numpy as np
import jax
import jax.numpy as jnp

from gym_pybullet_adrp_tpu.models.drone import drone_params
from gym_pybullet_adrp_tpu.ops import dynamics
from gym_pybullet_adrp_tpu.utils.enums import DroneModel, Physics


def _hover_state(n=1, z=1.0, dtype=jnp.float64):
    return dynamics.initial_state(
        np.tile([0.0, 0.0, z], (n, 1)), np.zeros((n, 3)), dtype=dtype
    )


PARAMS = drone_params(DroneModel.CF2X, dtype=jnp.float64)
DT = 1.0 / 240.0


def _run(state, rpm, physics, n=60, model=DroneModel.CF2X, params=PARAMS):
    prev = rpm
    for _ in range(n):
        state = dynamics.substep(params, state, rpm, prev, DT, model, physics)
    return state


def test_gnd_effect_mode_lifts_more_near_ground():
    rpm = jnp.full((1, 4), PARAMS.hover_rpm, dtype=jnp.float64)
    low = _run(_hover_state(z=0.05), rpm, Physics.PYB_GND)
    plain = _run(_hover_state(z=0.05), rpm, Physics.PYB)
    assert float(low.pos[0, 2]) > float(plain.pos[0, 2])


def test_drag_mode_decelerates():
    st = _hover_state()
    st = st._replace(vel=jnp.asarray([[1.0, 0.0, 0.0]], dtype=jnp.float64))
    rpm = jnp.full((1, 4), PARAMS.hover_rpm, dtype=jnp.float64)
    dragged = _run(st, rpm, Physics.PYB_DRAG)
    free = _run(st, rpm, Physics.PYB)
    assert float(dragged.vel[0, 0]) < float(free.vel[0, 0])


def test_downwash_mode_pushes_lower_drone():
    st = dynamics.initial_state(
        np.array([[0.0, 0.0, 0.5], [0.0, 0.0, 1.0]]), np.zeros((2, 3)),
        dtype=jnp.float64,
    )
    rpm = jnp.full((2, 4), PARAMS.hover_rpm, dtype=jnp.float64)
    dw = _run(st, rpm, Physics.PYB_DW)
    free = _run(st, rpm, Physics.PYB)
    assert float(dw.pos[0, 2]) < float(free.pos[0, 2])  # lower drone sinks
    np.testing.assert_allclose(
        float(dw.pos[1, 2]), float(free.pos[1, 2]), atol=1e-9
    )  # upper unaffected


def test_composite_mode_equals_sum_of_effects():
    """PYB_GND_DRAG_DW = base + all three augmentations (one substep,
    additive forces)."""
    st = dynamics.initial_state(
        np.array([[0.0, 0.0, 0.06], [0.0, 0.0, 1.0]]), np.zeros((2, 3)),
        dtype=jnp.float64,
    )
    st = st._replace(vel=jnp.asarray([[0.5, 0, 0], [0, 0, 0]], dtype=jnp.float64))
    rpm = jnp.full((2, 4), PARAMS.hover_rpm, dtype=jnp.float64)
    full = dynamics.substep(
        PARAMS, st, rpm, rpm, DT, DroneModel.CF2X, Physics.PYB_GND_DRAG_DW
    )
    base = dynamics.substep(
        PARAMS, st, rpm, rpm, DT, DroneModel.CF2X, Physics.PYB
    )
    gnd_fz, _ = dynamics.ground_effect(PARAMS, st, rpm, DroneModel.CF2X)
    drag = dynamics.drag_force_world(PARAMS, st, rpm)
    dw_z = dynamics.downwash_force_body_z(PARAMS, st)
    # velocity delta beyond the base mode = dt/m * (R.(0,0,gnd+dw) + drag)
    from gym_pybullet_adrp_tpu.ops import quat as quat_ops

    zeros = jnp.zeros_like(gnd_fz)
    extra_world = quat_ops.rotate(
        st.quat, jnp.stack([zeros, zeros, gnd_fz + dw_z], axis=-1)
    ) + drag
    expected_dv = DT * extra_world / np.asarray(PARAMS.mass)
    np.testing.assert_allclose(
        np.asarray(full.vel - base.vel), np.asarray(expected_dv), atol=1e-12
    )


def test_cf2p_hover_equilibrium():
    params = drone_params(DroneModel.CF2P, dtype=jnp.float64)
    st = _hover_state()
    rpm = jnp.full((1, 4), params.hover_rpm, dtype=jnp.float64)
    out = _run(st, rpm, Physics.PYB, model=DroneModel.CF2P, params=params)
    np.testing.assert_allclose(np.asarray(out.pos[0]), [0, 0, 1], atol=1e-7)
    # differential front/back thrust pitches the plus-frame
    rpm2 = rpm.at[0, 0].mul(1.02)
    out2 = _run(st, rpm2, Physics.PYB, model=DroneModel.CF2P, params=params)
    assert abs(float(out2.phys.rpy[0, 1])) > 1e-4 if hasattr(out2, "phys") \
        else abs(float(out2.rpy[0, 1])) > 1e-4


def test_race_model_dyn_z_torque_sign():
    """RACE negates per-motor z torques in DYN (BaseAviary.py:850-851)."""
    params = drone_params(DroneModel.RACE, dtype=jnp.float64)
    rpm = jnp.asarray([[1.1, 0.9, 1.1, 0.9]], dtype=jnp.float64) * params.hover_rpm
    _, tq_race = dynamics.thrust_torques(params, rpm, DroneModel.RACE, pyb_sign=False)
    params_x = drone_params(DroneModel.CF2X, dtype=jnp.float64)
    rpm_x = jnp.asarray([[1.1, 0.9, 1.1, 0.9]], dtype=jnp.float64) * params_x.hover_rpm
    _, tq_x = dynamics.thrust_torques(params_x, rpm_x, DroneModel.CF2X, pyb_sign=False)
    # same motor asymmetry -> opposite yaw torque directions
    assert float(tq_race[0, 2]) * float(tq_x[0, 2]) < 0


def test_dyn_mode_has_gyroscopic_term():
    """DYN subtracts omega x J omega (BaseAviary.py:860); PYB does not."""
    st = _hover_state()
    st = st._replace(omega=jnp.asarray([[3.0, 0.0, 5.0]], dtype=jnp.float64))
    rpm = jnp.full((1, 4), PARAMS.hover_rpm, dtype=jnp.float64)
    dyn = dynamics.substep(PARAMS, st, rpm, rpm, DT, DroneModel.CF2X, Physics.DYN)
    pyb = dynamics.substep(PARAMS, st, rpm, rpm, DT, DroneModel.CF2X, Physics.PYB)
    # gyroscopic coupling changes omega_y in DYN only
    assert abs(float(dyn.omega[0, 1]) - float(pyb.omega[0, 1])) > 1e-6
