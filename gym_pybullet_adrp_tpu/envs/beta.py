"""CTBR-command env (BetaAviary equivalent).

The reference's ``BetaAviary`` (reference envs/BetaAviary.py) spawns one
Betaflight SITL C process per drone and exchanges FDM/RC/PWM packets over
UDP every control step. Per SURVEY §2.2 the *capability* — a
collective-thrust-body-rates action pathway — is preserved as an in-graph
rate controller (control/ctbr.py); external processes and sockets are gone,
so the env jit/vmaps like everything else.

API parity: ``step(action, i)`` with CTBR actions (thrust [N-normalized],
roll/pitch/yaw rates [rad/s]); arming/trajectory-delay semantics
(reference ARM_TIME/TRAJ_TIME, :126-150) are expressed by callers sending
zero actions, as the examples do.
"""

from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
from gymnasium import spaces

from gym_pybullet_adrp_tpu.control import ctbr
from gym_pybullet_adrp_tpu.envs import core
from gym_pybullet_adrp_tpu.envs.aviary import JaxAviaryBase
from gym_pybullet_adrp_tpu.utils.enums import DroneModel, Physics


class BetaAviary(JaxAviaryBase):
    """Multi-drone env with a CTBR (rate-command) action pathway."""

    def __init__(
        self,
        drone_model: DroneModel = DroneModel.CF2X,
        num_drones: int = 1,
        neighbourhood_radius: float = np.inf,
        initial_xyzs=None,
        initial_rpys=None,
        physics: Physics = Physics.PYB,
        pyb_freq: int = 500,
        ctrl_freq: int = 25,
        gui: bool = False,
        record: bool = False,
        obstacles: bool = False,
        user_debug_gui: bool = True,
        output_folder: str = "results",
        udp_ip: str = None,  # accepted for API parity; no sockets here
        dtype=jnp.float32,
    ):
        super().__init__(
            drone_model=drone_model,
            num_drones=num_drones,
            neighbourhood_radius=neighbourhood_radius,
            initial_xyzs=initial_xyzs,
            initial_rpys=initial_rpys,
            physics=physics,
            pyb_freq=pyb_freq,
            ctrl_freq=ctrl_freq,
            gui=gui,
            record=record,
            obstacles=obstacles,
            user_debug_gui=user_debug_gui,
            output_folder=output_folder,
            dtype=dtype,
        )
        cfg, params = self.cfg, self.params

        @jax.jit
        def _step(state, ctbr_action):
            """One env step: rate loop at every physics substep."""
            dt = jnp.asarray(cfg.pyb_timestep, dtype=ctbr_action.dtype)

            def substep(st, _):
                rpm = ctbr.rate_loop_rpm(
                    params,
                    ctbr_action[:, 0],
                    ctbr_action[:, 1:4],
                    st.phys.omega,
                )
                from gym_pybullet_adrp_tpu.ops import dynamics

                phys = dynamics.substep(
                    params, st.phys, rpm, st.last_clipped_action, dt,
                    cfg.drone_model, cfg.physics,
                )
                st = core.CoreState(
                    phys=phys,
                    last_clipped_action=rpm,
                    step_counter=st.step_counter + 1,
                )
                return st, None

            state, _ = jax.lax.scan(
                substep, state, None, length=cfg.steps_per_ctrl
            )
            return state, core.state_vector(state)

        self._jit_step = _step
        self._state = None
        self.beta_action = np.zeros((num_drones, 4))

    def _actionSpace(self):
        # CTBR: thrust (m/s^2 specific), body rates (rad/s)
        lo = np.tile(
            np.array([0.0, -6 * np.pi, -6 * np.pi, -2 * np.pi], dtype=np.float32),
            (self.NUM_DRONES, 1),
        )
        hi = np.tile(
            np.array([4 * 9.8, 6 * np.pi, 6 * np.pi, 2 * np.pi], dtype=np.float32),
            (self.NUM_DRONES, 1),
        )
        return spaces.Box(low=lo, high=hi, dtype=np.float32)

    def _observationSpace(self):
        lo = np.array(
            [-np.inf, -np.inf, 0.0, -1, -1, -1, -1, -np.pi, -np.pi, -np.pi]
            + [-np.inf] * 6 + [0.0] * 4, dtype=np.float32,
        )
        hi = np.array(
            [np.inf] * 3 + [1, 1, 1, 1, np.pi, np.pi, np.pi]
            + [np.inf] * 6 + [self.MAX_RPM] * 4, dtype=np.float32,
        )
        return spaces.Box(
            low=np.tile(lo, (self.NUM_DRONES, 1)),
            high=np.tile(hi, (self.NUM_DRONES, 1)),
            dtype=np.float32,
        )

    def reset(self, seed: Optional[int] = None, options: Optional[dict] = None):
        self._state = core.core_reset(
            self.cfg, self.INIT_XYZS, self.INIT_RPYS, dtype=self.dtype
        )
        self.step_counter = 0
        self.beta_action = np.zeros((self.NUM_DRONES, 4))
        return np.asarray(core.state_vector(self._state)), {"answer": 42}

    def step(self, action, i: int = 0):
        """action: (N, 4) CTBR [thrust, p, q, r] (reference step:110-171)."""
        action = jnp.asarray(
            np.reshape(action, (self.NUM_DRONES, 4)), dtype=self.dtype
        )
        self._state, obs = self._jit_step(self._state, action)
        self.step_counter = int(self._state.step_counter)
        self.beta_action = np.asarray(action)
        return np.asarray(obs), -1, False, False, {"answer": 42}

    def _stateVector(self):
        return np.asarray(core.state_vector(self._state))
