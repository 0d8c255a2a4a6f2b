"""Object-style controller API over the pure-function controllers.

Users of the reference instantiate stateful controller objects
(``DSLPIDControl``, ``CTBRControl``, ``MellingerControl`` — reference
control/BaseControl.py:55-224) and call ``computeControl[FromState]`` per
tick. These wrappers preserve that surface while delegating all math to the
jitted pure functions; for batched/in-graph use, call the functional modules
directly (control/dslpid.py, control/mellinger.py, control/ctbr.py).
"""

import numpy as np
import jax
import jax.numpy as jnp

from gym_pybullet_adrp_tpu.control import ctbr as ctbr_mod
from gym_pybullet_adrp_tpu.control import dslpid, mellinger as mel
from gym_pybullet_adrp_tpu.models.drone import drone_params
from gym_pybullet_adrp_tpu.utils.enums import DroneModel


class BaseControl:
    """Controller ABC surface (reference BaseControl.py:15-224)."""

    def __init__(self, drone_model: DroneModel, g: float = 9.8):
        self.DRONE_MODEL = drone_model
        self.params = drone_params(drone_model)
        self.GRAVITY = g * float(self.params.mass)
        self.KF = float(self.params.kf)
        self.KM = float(self.params.km)
        self.reset()

    def reset(self):
        self.control_counter = 0

    def computeControlFromState(self, control_timestep, state, target_pos,
                                target_rpy=np.zeros(3), target_vel=np.zeros(3),
                                target_rpy_rates=np.zeros(3)):
        """Compute control from a 20-dim state vector (reference :55-95)."""
        return self.computeControl(
            control_timestep=control_timestep,
            cur_pos=np.asarray(state[0:3]),
            cur_quat=np.asarray(state[3:7]),
            cur_vel=np.asarray(state[10:13]),
            cur_ang_vel=np.asarray(state[13:16]),
            target_pos=np.asarray(target_pos),
            target_rpy=np.asarray(target_rpy),
            target_vel=np.asarray(target_vel),
            target_rpy_rates=np.asarray(target_rpy_rates),
        )

    def computeControl(self, **kwargs):
        raise NotImplementedError

    def setPIDCoefficients(self, p_coeff_pos=None, i_coeff_pos=None,
                           d_coeff_pos=None, p_coeff_att=None,
                           i_coeff_att=None, d_coeff_att=None):
        """Override PID gains (reference :141-183)."""
        attrs = ["P_COEFF_FOR", "I_COEFF_FOR", "D_COEFF_FOR",
                 "P_COEFF_TOR", "I_COEFF_TOR", "D_COEFF_TOR"]
        if not all(hasattr(self, a) for a in attrs):
            raise AttributeError(
                "[ERROR] setPIDCoefficients() on a non-PID controller"
            )
        for attr, val in zip(attrs, [p_coeff_pos, i_coeff_pos, d_coeff_pos,
                                     p_coeff_att, i_coeff_att, d_coeff_att]):
            if val is not None:
                setattr(self, attr, np.asarray(val))

    def _getURDFParameter(self, parameter_name: str):
        """Parameter lookup by reference URDF attribute name (:185-224)."""
        mapping = {
            "m": float(self.params.mass),
            "arm": float(self.params.arm),
            "kf": float(self.params.kf),
            "km": float(self.params.km),
            "thrust2weight": float(self.params.thrust2weight),
            "max_speed_kmh": float(self.params.max_speed_kmh),
            "gnd_eff_coeff": float(self.params.gnd_eff_coeff),
            "prop_radius": float(self.params.prop_radius),
            "drag_coeff_xy": float(np.asarray(self.params.drag_coeff)[0]),
            "drag_coeff_z": float(np.asarray(self.params.drag_coeff)[2]),
            "dw_coeff_1": float(self.params.dw_coeff_1),
            "dw_coeff_2": float(self.params.dw_coeff_2),
            "dw_coeff_3": float(self.params.dw_coeff_3),
            "ixx": float(np.asarray(self.params.J)[0]),
            "iyy": float(np.asarray(self.params.J)[1]),
            "izz": float(np.asarray(self.params.J)[2]),
        }
        return mapping[parameter_name]


class DSLPIDControl(BaseControl):
    """Stateful DSL PID wrapper (reference control/DSLPIDControl.py)."""

    def __init__(self, drone_model: DroneModel, g: float = 9.8):
        super().__init__(drone_model, g)
        self.P_COEFF_FOR = np.array([0.4, 0.4, 1.25])
        self.I_COEFF_FOR = np.array([0.05, 0.05, 0.05])
        self.D_COEFF_FOR = np.array([0.2, 0.2, 0.5])
        self.P_COEFF_TOR = np.array([70000.0, 70000.0, 60000.0])
        self.I_COEFF_TOR = np.array([0.0, 0.0, 500.0])
        self.D_COEFF_TOR = np.array([20000.0, 20000.0, 12000.0])
        self.PWM2RPM_SCALE = dslpid.PWM2RPM_SCALE
        self.PWM2RPM_CONST = dslpid.PWM2RPM_CONST
        self.MIN_PWM = dslpid.MIN_PWM
        self.MAX_PWM = dslpid.MAX_PWM
        self._jit = jax.jit(
            lambda ctl, dt, p, q, v, tp, tr, tv, trr: dslpid.compute_control(
                self.params, ctl, dt, p, q, v, tp, tr, tv, trr,
                model=drone_model,
            )
        )
        self.reset()

    def reset(self):
        super().reset()
        self.ctl_state = dslpid.init_state(())
        self.last_rpy = np.zeros(3)
        self.last_pos_e = np.zeros(3)
        self.integral_pos_e = np.zeros(3)
        self.last_rpy_e = np.zeros(3)
        self.integral_rpy_e = np.zeros(3)

    def computeControl(self, control_timestep, cur_pos, cur_quat, cur_vel,
                       cur_ang_vel, target_pos, target_rpy=np.zeros(3),
                       target_vel=np.zeros(3), target_rpy_rates=np.zeros(3)):
        self.control_counter += 1
        rpm, self.ctl_state, pos_e, yaw_e = self._jit(
            self.ctl_state,
            jnp.float32(control_timestep),
            jnp.asarray(cur_pos, dtype=jnp.float32),
            jnp.asarray(cur_quat, dtype=jnp.float32),
            jnp.asarray(cur_vel, dtype=jnp.float32),
            jnp.asarray(target_pos, dtype=jnp.float32),
            jnp.asarray(target_rpy, dtype=jnp.float32),
            jnp.asarray(target_vel, dtype=jnp.float32),
            jnp.asarray(target_rpy_rates, dtype=jnp.float32),
        )
        self.integral_pos_e = np.asarray(self.ctl_state.integral_pos_e)
        self.integral_rpy_e = np.asarray(self.ctl_state.integral_rpy_e)
        self.last_rpy = np.asarray(self.ctl_state.last_rpy)
        return np.asarray(rpm), np.asarray(pos_e), float(yaw_e)


class CTBRControl(BaseControl):
    """Collective-thrust-body-rates controller (reference control/CTBRControl.py)."""

    def computeControl(self, control_timestep, cur_pos, cur_quat, cur_vel,
                       cur_ang_vel, target_pos, target_rpy=np.zeros(3),
                       target_vel=np.zeros(3), target_rpy_rates=np.zeros(3)):
        thrust, rates = ctbr_mod.position_to_ctbr(
            jnp.asarray(cur_pos, dtype=jnp.float32),
            jnp.asarray(cur_quat, dtype=jnp.float32),
            jnp.asarray(cur_vel, dtype=jnp.float32),
            jnp.asarray(target_pos, dtype=jnp.float32),
            jnp.asarray(target_vel, dtype=jnp.float32),
        )
        r = np.asarray(rates)
        return float(thrust), float(r[0]), float(r[1]), float(r[2])

    def computeControlFromState(self, control_timestep, state, target_pos,
                                target_rpy=np.zeros(3), target_vel=np.zeros(3),
                                target_rpy_rates=np.zeros(3)):
        # NOTE(reference quirk preserved): CTBRControl reads the state quat
        # as wxyz (reference CTBRControl.py:92) — our functional core takes
        # xyzw, so pass through unchanged here.
        return self.computeControl(
            control_timestep=control_timestep,
            cur_pos=np.asarray(state[0:3]),
            cur_quat=np.asarray(state[3:7]),
            cur_vel=np.asarray(state[10:13]),
            cur_ang_vel=np.asarray(state[13:16]),
            target_pos=np.asarray(target_pos),
            target_rpy=np.asarray(target_rpy),
            target_vel=np.asarray(target_vel),
            target_rpy_rates=np.asarray(target_rpy_rates),
        )


class MellingerControl(BaseControl):
    """Stateful Mellinger wrapper mirroring the subprocess controller's
    surface (reference control/MellingerControl.py:64-262) — in-process,
    no pipes, no per-process firmware copies. Commands queue like the
    reference's ``sendXxxCmd`` and execute on ``process_command_queue``
    using the last kinematics seen by ``computeControl``/``reset``.
    """

    def __init__(self, drone_id: int, drone_model: DroneModel, g: float = 9.8):
        from gym_pybullet_adrp_tpu.control import commander as cmdr_mod
        from gym_pybullet_adrp_tpu.utils.enums import Command

        # set before super().__init__, which calls reset()
        self._cmdr_mod = cmdr_mod
        self._Command = Command
        self.drone_id = drone_id
        super().__init__(drone_model, g)

    def reset(self, init_obs=None):
        super().reset()
        self.mell = mel.init_state(())
        self.cmdr = self._cmdr_mod.init_state(())
        self.command_queue = []
        self._last_pos = np.zeros(3)
        self._last_vel = np.zeros(3)
        self._last_yaw = 0.0
        if init_obs is not None:
            drone = np.asarray(init_obs)[self.drone_id, :12]
            self._last_pos = drone[0:3]
            self._last_vel = drone[6:9]
            self._last_yaw = float(drone[5])
            self.mell = self.mell._replace(
                prev_rpy=jnp.asarray(drone[3:6], dtype=jnp.float32),
                prev_vel=jnp.asarray(drone[6:9], dtype=jnp.float32),
            )

    def computeControl(self, control_timestep, cur_pos, cur_rpy, cur_vel,
                       cur_ang_vel, target_pos, target_rpy=np.zeros(3),
                       target_vel=np.zeros(3), target_rpy_rates=np.zeros(3)):
        """One 500 Hz tick; `target_pos` smuggles the thrust disturbance,
        as in the reference (MellingerControl.py:202-203)."""
        self._last_pos = np.asarray(cur_pos, dtype=float)
        self._last_vel = np.asarray(cur_vel, dtype=float)
        self._last_yaw = float(np.asarray(cur_rpy)[2])
        disturbance = jnp.asarray(target_pos, dtype=jnp.float32)
        tick_time = float(self.mell.tick) / 500.0
        self.cmdr = self._cmdr_mod.update_setpoint(self.cmdr, tick_time)
        self.mell, rpm = mel.compute_control(
            self.mell,
            self.cmdr.setpoint,
            jnp.asarray(cur_pos, dtype=jnp.float32),
            jnp.asarray(cur_rpy, dtype=jnp.float32),
            jnp.asarray(cur_vel, dtype=jnp.float32),
            jnp.pad(disturbance, (0, 1)) if disturbance.shape[-1] == 3 else disturbance,
            kf=self.KF,
        )
        return np.asarray(rpm)

    # -- command surface (reference :491-699) --------------------------------
    def sendFullStateCmd(self, pos, vel, acc, yaw, rpy_rate, timestep):
        self.command_queue.append(
            (self._Command.FULLSTATE, (pos, vel, acc, yaw, rpy_rate, timestep))
        )

    def sendTakeoffCmd(self, height, duration):
        self.command_queue.append((self._Command.TAKEOFF, (height, duration)))

    def sendTakeoffYawCmd(self, height, duration, yaw):
        self.command_queue.append(
            (self._Command.TAKEOFFYAW, (height, duration, yaw))
        )

    def sendTakeoffVelCmd(self, height, vel, relative):
        self.command_queue.append(
            (self._Command.TAKEOFFVEL, (height, vel, relative))
        )

    def sendLandCmd(self, height, duration):
        self.command_queue.append((self._Command.LAND, (height, duration)))

    def sendLandYawCmd(self, height, duration, yaw):
        self.command_queue.append(
            (self._Command.LANDYAW, (height, duration, yaw))
        )

    def sendLandVelCmd(self, height, vel, relative):
        self.command_queue.append(
            (self._Command.LANDVEL, (height, vel, relative))
        )

    def sendGotoCmd(self, pos, yaw, duration_s, relative):
        self.command_queue.append(
            (self._Command.GOTO, (pos, yaw, duration_s, relative))
        )

    def sendStopCmd(self):
        self.command_queue.append((self._Command.STOP, ()))

    def notifySetpointStop(self):
        self.command_queue.append((self._Command.NOTIFY, ()))

    def process_command_queue(self, sim_time):
        """Pop and execute the next queued command
        (reference process_command_queue:292-303)."""
        if not self.command_queue:
            return
        cmd, args = self.command_queue.pop(0)
        cid, vec = self._cmdr_mod.pack_command(cmd, args)
        self.cmdr = self._cmdr_mod.process_command(
            self.cmdr,
            jnp.asarray(cid, dtype=jnp.int32),
            jnp.asarray(vec, dtype=jnp.float32),
            jnp.asarray(float(sim_time), dtype=jnp.float32),
            jnp.asarray(self._last_pos, dtype=jnp.float32),
            jnp.asarray(self._last_vel, dtype=jnp.float32),
            jnp.asarray(self._last_yaw, dtype=jnp.float32),
        )
