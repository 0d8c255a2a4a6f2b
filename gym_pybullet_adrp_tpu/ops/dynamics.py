"""Quadrotor rigid-body dynamics: the TPU-native physics engine.

Replaces the reference's two physics paths with pure, jit/vmap-friendly
functions over a batched state pytree:

* ``Physics.DYN``  — explicit dynamics, numerically equivalent to
  ``BaseAviary._dynamics`` (reference envs/BaseAviary.py:822-896).
* ``Physics.PYB*`` — semi-implicit Euler rigid body emulating PyBullet's
  integrator with the reference's force pipeline:
  ``_physics`` (BaseAviary.py:683-718), ``_groundEffect`` (:722-757),
  ``_drag`` (:761-788), ``_downwash`` (:792-818). PyBullet's LCP contact
  solver is replaced by an analytic ground contact (documented deviation; the
  reference's own correctness anchors terminate/eliminate on contact events,
  not on post-contact trajectories).

Shapes: all state arrays carry a leading drone axis N (and arbitrary batch
axes before it via vmap). A full control step scans PYB_STEPS_PER_CTRL
substeps with ``lax.scan`` so the whole thing stays one fused XLA computation.
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp

from gym_pybullet_adrp_tpu.ops import quat as quat_ops
from gym_pybullet_adrp_tpu.utils.enums import DroneModel, Physics
from gym_pybullet_adrp_tpu.utils.constants import G
from gym_pybullet_adrp_tpu.models.drone import DroneParams


class PhysState(NamedTuple):
    """Kinematic state of N drones (pytree).

    ``omega`` holds body-frame angular rates — the reference's ``rpy_rates``
    for the DYN path (BaseAviary.py:842) and body angular velocity for the
    PYB path. World-frame angular velocity for observations is
    ``R @ omega`` (reference stores exactly that, BaseAviary.py:877).
    """

    pos: jnp.ndarray    # (N, 3) world
    quat: jnp.ndarray   # (N, 4) xyzw
    vel: jnp.ndarray    # (N, 3) world
    omega: jnp.ndarray  # (N, 3) body

    @property
    def rpy(self):
        return quat_ops.to_euler_xyz(self.quat)

    @property
    def ang_vel_world(self):
        return quat_ops.rotate(self.quat, self.omega)


def initial_state(init_xyzs, init_rpys, dtype=jnp.float32) -> PhysState:
    """State at rest at the given poses (reference _housekeeping + loadURDF)."""
    init_xyzs = jnp.asarray(init_xyzs, dtype=dtype)
    init_rpys = jnp.asarray(init_rpys, dtype=dtype)
    return PhysState(
        pos=init_xyzs,
        quat=quat_ops.from_euler_xyz(init_rpys),
        vel=jnp.zeros_like(init_xyzs),
        omega=jnp.zeros_like(init_xyzs),
    )


# ---------------------------------------------------------------------------
# force / torque models


def thrust_torques(params: DroneParams, rpm, model: DroneModel, pyb_sign: bool):
    """Per-drone net body-frame thrust (scalar along +z) and torques.

    rpm: (..., 4). Returns (thrust_z, torque_body (...,3)).

    Arm geometry per reference BaseAviary.py:844-859; z-torque sign differs
    between the PYB pipeline (``_physics``:700-703, IROS prop order:
    +t0-t1+t2-t3) and the DYN pipeline (:849-852: -t0+t1-t2+t3, with RACE
    negating the per-motor torques first). ``pyb_sign`` selects the former.
    """
    forces = rpm**2 * params.kf[..., None]
    torques = rpm**2 * params.km[..., None]
    f0, f1, f2, f3 = forces[..., 0], forces[..., 1], forces[..., 2], forces[..., 3]
    t0, t1, t2, t3 = torques[..., 0], torques[..., 1], torques[..., 2], torques[..., 3]

    if pyb_sign:
        # NOTE(documented deviation): the reference's _physics applies the
        # IROS-order sign to every model (:700-703). Here CF2P gets the sign
        # matching its own (original-layout) urdf so its controller algebra
        # is consistent; CF2X/RACE keep the IROS sign.
        if model == DroneModel.CF2P:
            z_torque = -t0 + t1 - t2 + t3
        else:
            z_torque = t0 - t1 + t2 - t3
    else:
        if model == DroneModel.RACE:
            t0, t1, t2, t3 = -t0, -t1, -t2, -t3
        z_torque = -t0 + t1 - t2 + t3

    L = params.arm
    if model == DroneModel.CF2P:
        x_torque = (f1 - f3) * L
        y_torque = (-f0 + f2) * L
    else:  # CF2X / RACE: X formation
        s = L / jnp.sqrt(jnp.asarray(2.0, dtype=rpm.dtype))
        x_torque = (f0 + f1 - f2 - f3) * s
        y_torque = (-f0 + f1 + f2 - f3) * s

    thrust_z = f0 + f1 + f2 + f3
    return thrust_z, jnp.stack([x_torque, y_torque, z_torque], axis=-1)


def ground_effect(params: DroneParams, state: PhysState, rpm, model: DroneModel):
    """Per-prop ground-effect lift (reference _groundEffect:722-757).

    Returns (body-frame z force, body torque (...,3)). The reference reads
    each propeller link's world height; here prop world positions are
    computed analytically from the arm geometry. The effect is gated on
    |roll|,|pitch| < pi/2 exactly as in the reference (:749).
    """
    dtype = rpm.dtype
    L = params.arm
    if model == DroneModel.CF2P:
        offs = jnp.stack([
            jnp.stack([L, jnp.zeros_like(L), jnp.zeros_like(L)], -1),
            jnp.stack([jnp.zeros_like(L), L, jnp.zeros_like(L)], -1),
            jnp.stack([-L, jnp.zeros_like(L), jnp.zeros_like(L)], -1),
            jnp.stack([jnp.zeros_like(L), -L, jnp.zeros_like(L)], -1),
        ], axis=-2)
    else:
        s = L / jnp.sqrt(jnp.asarray(2.0, dtype=dtype))
        zs = jnp.zeros_like(s)
        offs = jnp.stack([
            jnp.stack([s, s, zs], -1),
            jnp.stack([-s, s, zs], -1),
            jnp.stack([-s, -s, zs], -1),
            jnp.stack([s, -s, zs], -1),
        ], axis=-2)  # (..., 4, 3)

    prop_world = state.pos[..., None, :] + quat_ops.rotate(
        state.quat[..., None, :], offs
    )
    prop_h = jnp.clip(prop_world[..., 2], params.gnd_eff_h_clip[..., None], None)
    gnd = (
        rpm**2
        * params.kf[..., None]
        * params.gnd_eff_coeff[..., None]
        * (params.prop_radius[..., None] / (4.0 * prop_h)) ** 2
    )
    rpy = state.rpy
    gate = (jnp.abs(rpy[..., 0]) < jnp.pi / 2) & (jnp.abs(rpy[..., 1]) < jnp.pi / 2)
    gnd = gnd * gate[..., None].astype(dtype)

    g0, g1, g2, g3 = gnd[..., 0], gnd[..., 1], gnd[..., 2], gnd[..., 3]
    if model == DroneModel.CF2P:
        x_t = (g1 - g3) * L
        y_t = (-g0 + g2) * L
    else:
        s = L / jnp.sqrt(jnp.asarray(2.0, dtype=dtype))
        x_t = (g0 + g1 - g2 - g3) * s
        y_t = (-g0 + g1 + g2 - g3) * s
    fz = g0 + g1 + g2 + g3
    return fz, jnp.stack([x_t, y_t, jnp.zeros_like(x_t)], axis=-1)


def drag_force_world(params: DroneParams, state: PhysState, prev_rpm):
    """World-frame drag force (reference _drag:761-788).

    The reference computes drag in the body frame and hands it back to
    PyBullet as a LINK_FRAME force, which rotates it straight back to world —
    so the rotations cancel and the net world force is simply
    ``-coeff ⊙ v_world * sum(2π·rpm/60)``.
    """
    omega_sum = jnp.sum(2.0 * jnp.pi * prev_rpm / 60.0, axis=-1, keepdims=True)
    return -params.drag_coeff * omega_sum * state.vel


def downwash_force_body_z(params: DroneParams, state: PhysState):
    """Pairwise downwash body-z force per drone (reference _downwash:792-818).

    Vectorized over the full N×N pair matrix; drone i receives a downward
    body-z force from every drone j strictly above it within 10 m lateral.
    """
    pos = state.pos
    # [receiver r, source s]: dz[r, s] = z_s - z_r (reference: delta_z = z_i - z_nth)
    dz = pos[..., None, :, 2] - pos[..., :, None, 2]
    dxy = jnp.linalg.norm(
        pos[..., None, :, :2] - pos[..., :, None, :2], axis=-1
    )
    mask = (dz > 0) & (dxy < 10.0)
    safe_dz = jnp.where(mask, dz, 1.0)
    alpha = params.dw_coeff_1[..., None, None] * (
        params.prop_radius[..., None, None] / (4.0 * safe_dz)
    ) ** 2
    beta = params.dw_coeff_2[..., None, None] * safe_dz + params.dw_coeff_3[..., None, None]
    # reference divides by beta unguarded; beta=0 only at dz = -dw3/dw2 ≈ 0.6875 m
    safe_beta = jnp.where(jnp.abs(beta) > 1e-9, beta, 1e-9)
    force = -alpha * jnp.exp(-0.5 * (dxy / safe_beta) ** 2)
    force = jnp.where(mask, force, 0.0)
    return jnp.sum(force, axis=-1)  # (..., N) body-z force per receiver


# ---------------------------------------------------------------------------
# substeps


def dyn_substep(params: DroneParams, state: PhysState, rpm, dt,
                model: DroneModel) -> PhysState:
    """Explicit-dynamics substep — reference ``_dynamics`` (BaseAviary.py:822-896).

    Update order preserved exactly: vel and omega first (explicit Euler on
    accelerations), then pos with the *updated* vel, then quaternion with the
    *updated* body rates via the axis-angle update of ``_integrateQ``.
    """
    thrust_z, torques = thrust_torques(params, rpm, model, pyb_sign=False)
    zeros = jnp.zeros_like(thrust_z)
    thrust_world = quat_ops.rotate(
        state.quat, jnp.stack([zeros, zeros, thrust_z], axis=-1)
    )
    force_world = thrust_world - jnp.stack(
        [zeros, zeros, jnp.broadcast_to(params.gravity, zeros.shape)], axis=-1
    )
    torques = torques - jnp.cross(state.omega, params.J * state.omega)
    omega_dot = params.J_inv * torques
    acc = force_world / params.mass[..., None]

    vel = state.vel + dt * acc
    omega = state.omega + dt * omega_dot
    pos = state.pos + dt * vel
    q = quat_ops.integrate_body(state.quat, omega, dt)
    return PhysState(pos=pos, quat=q, vel=vel, omega=omega)


def pyb_substep(params: DroneParams, state: PhysState, rpm, prev_rpm, dt,
                model: DroneModel, physics: Physics,
                ext_force_world=None) -> PhysState:
    """PyBullet-analogue substep: force pipeline + semi-implicit Euler.

    Force composition per physics mode follows BaseAviary.step:347-376 /
    MultiRaceAviary._apply_physics:510-530. Bullet's default rigid-body
    integration has no gyroscopic term, so: v += dt·F/m; ω_b += dt·J⁻¹τ_b;
    x += dt·v'; q ← exp(½ω_w'dt)⊗q. Ground contact resolved analytically.

    ``ext_force_world``: optional (..., 3) world-frame disturbance force at
    the COM (the race env's wind disturbance, MultiRaceAviary.py:532-544).
    """
    dtype = rpm.dtype
    thrust_z, torque = thrust_torques(params, rpm, model, pyb_sign=True)
    force_body_z = thrust_z

    if physics in (Physics.PYB_GND, Physics.PYB_GND_DRAG_DW):
        g_fz, g_t = ground_effect(params, state, rpm, model)
        force_body_z = force_body_z + g_fz
        torque = torque + g_t

    zeros = jnp.zeros_like(force_body_z)
    force_world = quat_ops.rotate(
        state.quat, jnp.stack([zeros, zeros, force_body_z], axis=-1)
    )

    if physics in (Physics.PYB_DRAG, Physics.PYB_GND_DRAG_DW):
        force_world = force_world + drag_force_world(params, state, prev_rpm)

    if physics in (Physics.PYB_DW, Physics.PYB_GND_DRAG_DW):
        dw_z = downwash_force_body_z(params, state)
        force_world = force_world + quat_ops.rotate(
            state.quat, jnp.stack([zeros, zeros, dw_z], axis=-1)
        )

    gravity = jnp.stack(
        [zeros, zeros, jnp.broadcast_to(-params.gravity, zeros.shape)], axis=-1
    )
    force_world = force_world + gravity
    if ext_force_world is not None:
        force_world = force_world + ext_force_world

    vel = state.vel + dt * force_world / params.mass[..., None]
    omega = state.omega + dt * params.J_inv * torque
    pos = state.pos + dt * vel
    omega_world = quat_ops.rotate(state.quat, omega)
    q = quat_ops.integrate_world(state.quat, omega_world, dt)

    # analytic ground contact: rest height of the collision cylinder
    # (reference drones spawn at collision_h/2 - collision_z_offset + eps,
    #  BaseAviary.py:195-197)
    ground_z = params.collision_h / 2.0 - params.collision_z_offset
    below = pos[..., 2] < ground_z
    pos = pos.at[..., 2].set(jnp.where(below, ground_z, pos[..., 2]))
    vel = jnp.where(
        below[..., None],
        jnp.concatenate(
            [vel[..., :2] * 0.0, jnp.maximum(vel[..., 2:3], 0.0)], axis=-1
        ),
        vel,
    )
    omega = jnp.where(below[..., None], jnp.zeros_like(omega), omega)
    return PhysState(pos=pos, quat=q, vel=vel, omega=omega)


def substep(params: DroneParams, state: PhysState, rpm, prev_rpm, dt,
            model: DroneModel, physics: Physics) -> PhysState:
    """One physics substep at pyb_freq. `model` and `physics` are static."""
    if physics == Physics.DYN:
        return dyn_substep(params, state, rpm, dt, model)
    return pyb_substep(params, state, rpm, prev_rpm, dt, model, physics)


def ctrl_step(params: DroneParams, state: PhysState, rpm, prev_rpm, dt,
              n_substeps: int, model: DroneModel, physics: Physics):
    """Advance one control step = ``n_substeps`` physics substeps with fixed rpm.

    Mirrors BaseAviary.step:347-376: drag on the first substep uses the
    previous control step's rpm (``last_clipped_action``), subsequent
    substeps use the current rpm. Returns (state, last_rpm_applied).
    """
    if n_substeps == 1:
        return substep(params, state, rpm, prev_rpm, dt, model, physics), rpm

    def body(carry, _):
        st, prev = carry
        st = substep(params, st, rpm, prev, dt, model, physics)
        return (st, rpm), None

    (state, _), _ = jax.lax.scan(
        body, (state, prev_rpm), None, length=n_substeps
    )
    return state, rpm
