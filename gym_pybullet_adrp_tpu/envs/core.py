"""Functional aviary core: batched, jittable env mechanics.

This module is the TPU-native replacement for the reference's ``BaseAviary``
runtime (reference envs/BaseAviary.py): PyBullet session management becomes a
pure state pytree; the dual-rate stepping loop (pyb_freq substeps per
ctrl_freq env step, BaseAviary.step:347-376) becomes a ``lax.scan``; the
20-dim per-drone state vector (``_getDroneStateVector``:545-565) is assembled
from the pytree with no FFI round-trips.

Everything here is shaped ``(num_drones, ...)`` per env and designed to be
``vmap``-ed over an env batch axis and ``shard_map``-ed over devices.
"""

from dataclasses import dataclass
from typing import NamedTuple

import numpy as np
import jax.numpy as jnp

from gym_pybullet_adrp_tpu.ops import dynamics
from gym_pybullet_adrp_tpu.models.drone import DroneParams
from gym_pybullet_adrp_tpu.utils.enums import DroneModel, Physics


@dataclass(frozen=True)
class AviaryConfig:
    """Static env configuration — hashable, closed over by jitted steps.

    Mirrors the reference BaseAviary constructor options that shape the
    computation (BaseAviary.__init__:25-128); cosmetic options (gui, record,
    debug) live at the driver layer.
    """

    drone_model: DroneModel = DroneModel.CF2X
    num_drones: int = 1
    physics: Physics = Physics.PYB
    pyb_freq: int = 240
    ctrl_freq: int = 240
    neighbourhood_radius: float = np.inf

    def __post_init__(self):
        if self.pyb_freq % self.ctrl_freq != 0:
            raise ValueError(
                "[ERROR] pyb_freq must be divisible by ctrl_freq "
                "(reference BaseAviary.__init__:79-80)"
            )

    @property
    def steps_per_ctrl(self) -> int:
        return self.pyb_freq // self.ctrl_freq

    @property
    def ctrl_timestep(self) -> float:
        return 1.0 / self.ctrl_freq

    @property
    def pyb_timestep(self) -> float:
        return 1.0 / self.pyb_freq


class CoreState(NamedTuple):
    """Dynamic per-env state (pytree)."""

    phys: dynamics.PhysState
    last_clipped_action: jnp.ndarray  # (N, 4) rpm (reference: BaseAviary.py:376)
    step_counter: jnp.ndarray         # () int32, counts pyb substeps


def default_init_xyzs(cfg: AviaryConfig, params: DroneParams) -> np.ndarray:
    """Reference BaseAviary.__init__:194-197 default grid."""
    n = cfg.num_drones
    arm = float(np.asarray(params.arm))
    col_h = float(np.asarray(params.collision_h))
    col_off = float(np.asarray(params.collision_z_offset))
    return np.vstack(
        [
            np.arange(n) * 4 * arm,
            np.arange(n) * 4 * arm,
            np.ones(n) * (col_h / 2 - col_off + 0.1),
        ]
    ).T


def core_reset(cfg: AviaryConfig, init_xyzs, init_rpys, dtype=jnp.float32) -> CoreState:
    """Fresh state at the initial poses (reference _housekeeping:455-509)."""
    phys = dynamics.initial_state(init_xyzs, init_rpys, dtype=dtype)
    return CoreState(
        phys=phys,
        last_clipped_action=jnp.zeros((cfg.num_drones, 4), dtype=dtype),
        step_counter=jnp.zeros((), dtype=jnp.int32),
    )


def core_step(cfg: AviaryConfig, params: DroneParams, state: CoreState,
              clipped_rpm) -> CoreState:
    """Advance one ctrl step: scan the physics substeps with fixed rpm.

    Mirrors BaseAviary.step:347-387 (incl. last_clipped_action semantics for
    drag and the substep counter increment).
    """
    phys, last_rpm = dynamics.ctrl_step(
        params,
        state.phys,
        clipped_rpm,
        state.last_clipped_action,
        jnp.asarray(cfg.pyb_timestep, dtype=clipped_rpm.dtype),
        cfg.steps_per_ctrl,
        cfg.drone_model,
        cfg.physics,
    )
    return CoreState(
        phys=phys,
        last_clipped_action=last_rpm,
        step_counter=state.step_counter + cfg.steps_per_ctrl,
    )


def state_vector(state: CoreState) -> jnp.ndarray:
    """(N, 20) per-drone state — reference ``_getDroneStateVector``:545-565.

    Layout: pos(3) quat(4, xyzw) rpy(3) vel(3) ang_vel_world(3) last_rpm(4).
    """
    phys = state.phys
    return jnp.concatenate(
        [
            phys.pos,
            phys.quat,
            phys.rpy,
            phys.vel,
            phys.ang_vel_world,
            state.last_clipped_action,
        ],
        axis=-1,
    )


def kin_obs_12(state: CoreState) -> jnp.ndarray:
    """(N, 12) kinematic obs: pos, rpy, vel, ang_vel (reference
    BaseRLAviary._computeObs:307-315 picks indices [0:3,7:10,10:13,13:16])."""
    phys = state.phys
    return jnp.concatenate(
        [phys.pos, phys.rpy, phys.vel, phys.ang_vel_world], axis=-1
    )


def adjacency_matrix(cfg: AviaryConfig, state: CoreState) -> jnp.ndarray:
    """(N, N) neighbour adjacency (reference _getAdjacencyMatrix:662-679)."""
    pos = state.phys.pos
    d = jnp.linalg.norm(pos[:, None, :] - pos[None, :, :], axis=-1)
    adj = (d < cfg.neighbourhood_radius).astype(pos.dtype)
    n = pos.shape[0]
    return jnp.where(jnp.eye(n, dtype=bool), 1.0, adj)


def normalized_action_to_rpm(params: DroneParams, action):
    """[-1,1] -> [0, MAX_RPM] non-linear map (reference
    _normalizedActionToRPM:900-918: -1 -> 0, 0 -> HOVER_RPM, 1 -> MAX_RPM)."""
    hover = params.hover_rpm
    return jnp.where(
        action <= 0,
        (action + 1.0) * hover,
        hover + (params.max_rpm - hover) * action,
    )


def calculate_next_step(current_position, destination, step_size=1.0):
    """Intermediate waypoint toward destination (reference
    _calculateNextStep:1112-1154), branchless."""
    direction = destination - current_position
    distance = jnp.linalg.norm(direction, axis=-1, keepdims=True)
    safe = jnp.maximum(distance, 1e-12)
    stepped = current_position + direction / safe * step_size
    return jnp.where(distance <= step_size, destination, stepped)
