"""Drone parameter registry.

TPU-native replacement for the reference's URDF parsing
(``BaseAviary._parseURDFParameters``, reference envs/BaseAviary.py:989-1021)
and derived-constant computation (BaseAviary.py:116-128). Parameters are
embedded as data (sourced from the reference's asset files —
``cf2x_IROS.urdf``, ``cf2p.urdf``, ``racer.urdf``) so no XML parsing or file
IO happens anywhere near the compute path.

``DroneParams`` is a pytree of arrays. Leaves may carry leading batch axes
(e.g. per-drone randomized mass/inertia in the race environment,
reference MultiRaceAviary.py:407-432), and everything downstream broadcasts.
"""

from typing import NamedTuple

import numpy as np
import jax.numpy as jnp

from gym_pybullet_adrp_tpu.utils.enums import DroneModel
from gym_pybullet_adrp_tpu.utils.constants import G


class DroneParams(NamedTuple):
    """Physical parameters of a quadrotor (pytree; leaves broadcastable)."""

    mass: jnp.ndarray            # kg
    arm: jnp.ndarray             # m, motor arm length L
    thrust2weight: jnp.ndarray
    J: jnp.ndarray               # (..., 3) diagonal inertia [Ixx, Iyy, Izz]
    kf: jnp.ndarray              # thrust coefficient: F = kf * rpm^2
    km: jnp.ndarray              # yaw-torque coefficient: T = km * rpm^2
    collision_h: jnp.ndarray
    collision_r: jnp.ndarray
    collision_z_offset: jnp.ndarray
    max_speed_kmh: jnp.ndarray
    gnd_eff_coeff: jnp.ndarray
    prop_radius: jnp.ndarray
    drag_coeff: jnp.ndarray      # (..., 3) [xy, xy, z]
    dw_coeff_1: jnp.ndarray
    dw_coeff_2: jnp.ndarray
    dw_coeff_3: jnp.ndarray
    # +1 for CF2X-style z-torque sign in the PYB force pipeline, -1 for the
    # IROS prop ordering (reference BaseAviary._physics:700-703 note)
    # and DYN's RACE special case (BaseAviary.py:850-851).

    # ---- derived quantities (reference BaseAviary.py:116-128) -------------
    @property
    def J_inv(self):
        return 1.0 / self.J

    @property
    def gravity(self):
        """Weight force G*m (reference calls this GRAVITY)."""
        return G * self.mass

    @property
    def hover_rpm(self):
        return jnp.sqrt(self.gravity / (4.0 * self.kf))

    @property
    def max_rpm(self):
        return jnp.sqrt((self.thrust2weight * self.gravity) / (4.0 * self.kf))

    @property
    def max_thrust(self):
        return 4.0 * self.kf * self.max_rpm**2

    @property
    def max_z_torque(self):
        return 2.0 * self.km * self.max_rpm**2

    @property
    def gnd_eff_h_clip(self):
        return 0.25 * self.prop_radius * jnp.sqrt(
            (15.0 * self.max_rpm**2 * self.kf * self.gnd_eff_coeff)
            / self.max_thrust
        )

    @property
    def speed_limit(self):
        """VelocityAviary's speed limit (reference VelocityAviary.py:78)."""
        return 0.03 * self.max_speed_kmh * (1000.0 / 3600.0)


# raw values transcribed from the reference URDF <properties> blocks and
# inertial elements (assets/cf2x_IROS.urdf, assets/cf2p.urdf, assets/racer.urdf)
_REGISTRY = {
    DroneModel.CF2X: dict(
        mass=0.03454, arm=0.0397, thrust2weight=2.25,
        J=(1.4e-5, 1.4e-5, 2.17e-5),
        kf=3.16e-10, km=7.94e-12,
        collision_h=0.025, collision_r=0.06, collision_z_offset=0.0,
        max_speed_kmh=30.0, gnd_eff_coeff=11.36859, prop_radius=2.31348e-2,
        drag_coeff=(9.1785e-7, 9.1785e-7, 10.311e-7),
        dw_coeff_1=2267.18, dw_coeff_2=0.16, dw_coeff_3=-0.11,
    ),
    DroneModel.CF2P: dict(
        mass=0.027, arm=0.0397, thrust2weight=2.25,
        J=(2.3951e-5, 2.3951e-5, 3.2347e-5),
        kf=3.16e-10, km=7.94e-12,
        collision_h=0.025, collision_r=0.06, collision_z_offset=0.0,
        max_speed_kmh=30.0, gnd_eff_coeff=11.36859, prop_radius=2.31348e-2,
        drag_coeff=(9.1785e-7, 9.1785e-7, 10.311e-7),
        dw_coeff_1=2267.18, dw_coeff_2=0.16, dw_coeff_3=-0.11,
    ),
    DroneModel.RACE: dict(
        mass=0.830, arm=0.109, thrust2weight=4.17,
        J=(3.113e-3, 3.113e-3, 3.113e-3),
        kf=8.47e-9, km=2.13e-11,
        collision_h=0.025, collision_r=0.06, collision_z_offset=0.0,
        max_speed_kmh=200.0, gnd_eff_coeff=11.36859, prop_radius=12.7e-2,
        drag_coeff=(9.1785e-7, 9.1785e-7, 10.311e-7),
        dw_coeff_1=2267.18, dw_coeff_2=0.16, dw_coeff_3=-0.11,
    ),
}

# mass of the plain (non-IROS) cf2x urdf, used by the race env's inertia
# randomization base (reference MultiRaceAviary._drone_init:409-416 parses
# cf2x.urdf, not cf2x_IROS.urdf)
CF2X_LEGACY = dict(mass=0.027, J=(1.4e-5, 1.4e-5, 2.17e-5))


def drone_params(model: DroneModel = DroneModel.CF2X, dtype=jnp.float32) -> DroneParams:
    """Build a DroneParams pytree for the given model."""
    raw = _REGISTRY[model]
    leaves = {
        k: jnp.asarray(np.asarray(v), dtype=dtype) for k, v in raw.items()
    }
    return DroneParams(**leaves)


def max_xy_torque(model: DroneModel, params: DroneParams):
    """Reference BaseAviary.py:121-126 (model-dependent arm geometry)."""
    if model == DroneModel.CF2P:
        return params.arm * params.kf * params.max_rpm**2
    return 2.0 * params.arm * params.kf * params.max_rpm**2 / np.sqrt(2.0)
