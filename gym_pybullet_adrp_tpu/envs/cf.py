"""Firmware-in-the-loop single-drone env (CFAviary equivalent).

TPU-native re-design of the reference's ``CFAviary``
(reference envs/CFAviary.py:16-726), which drives the in-process SWIG
Crazyflie firmware: Mellinger controller at 500 Hz, sensor low-pass filters,
the high-level commander (takeoff/land/goto/fullstate/stop/notify) and the
brushed-motor power distribution. Here the whole per-control-step firmware
window (``while tick/freq < t+dt`` — reference step:201-259, 20 ticks at
25 Hz) is one ``lax.scan`` inside a jitted step; commands queue host-side
exactly like the reference's ``sendXxxCmd`` surface.

Differences vs the race controller path (both per reference):
* CFAviary's power distribution converts clipped pwms straight to RPM —
  no [3,2,1,0] thrust reorder and no disturbance injection
  (reference :244 vs MellingerControl.py:246-262).
* Action/sensor delay ring buffers are supported via ``ACTION_DELAY`` /
  ``SENSOR_DELAY`` constants (reference :122-124, both 0 by default).
"""

import time
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
from gymnasium import spaces

from gym_pybullet_adrp_tpu.control import commander as cmdr_mod
from gym_pybullet_adrp_tpu.control import mellinger as mel
from gym_pybullet_adrp_tpu.envs import core
from gym_pybullet_adrp_tpu.envs.aviary import JaxAviaryBase
from gym_pybullet_adrp_tpu.utils.constants import (
    ACTION_DELAY, MAX_PWM, MIN_PWM, PWM2RPM_CONST, PWM2RPM_SCALE,
)
from gym_pybullet_adrp_tpu.utils.enums import Command, DroneModel, Physics


class CFAviary(JaxAviaryBase):
    """Single-drone aviary flying on firmware numerics (reference CFAviary)."""

    CONTROLLER = "mellinger"  # reference :21 ('pid' = 1 kHz firmware PID)

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
        verbose: bool = False,
        dtype=jnp.float32,
    ):
        firmware_freq = 500 if self.CONTROLLER == "mellinger" else 1000
        assert pyb_freq % firmware_freq == 0, (
            f"pyb_freq ({pyb_freq}) must be a multiple of firmware_freq "
            f"({firmware_freq}) for CFAviary."
        )
        if num_drones != 1:
            raise NotImplementedError(
                "Multi-agent support for CF Aviary is not yet implemented."
            )
        assert self.CONTROLLER in ("mellinger", "pid")
        # the base env steps at the firmware rate (reference :92)
        super().__init__(
            drone_model=drone_model,
            num_drones=num_drones,
            neighbourhood_radius=neighbourhood_radius,
            initial_xyzs=initial_xyzs,
            initial_rpys=initial_rpys,
            physics=physics,
            pyb_freq=pyb_freq,
            ctrl_freq=firmware_freq,
            gui=gui,
            record=record,
            obstacles=obstacles,
            user_debug_gui=user_debug_gui,
            output_folder=output_folder,
            dtype=dtype,
        )
        self.firmware_freq = firmware_freq
        self.ctrl_freq = ctrl_freq
        self.ctrl_dt = 1.0 / ctrl_freq
        self.firmware_dt = 1.0 / firmware_freq
        self.PWM2RPM_SCALE = PWM2RPM_SCALE
        self.PWM2RPM_CONST = PWM2RPM_CONST
        self.MIN_PWM = MIN_PWM
        self.MAX_PWM = MAX_PWM
        self.verbose = verbose
        self._ticks_per_step = firmware_freq // ctrl_freq

        cfg, params = self.cfg, self.params
        n_ticks = self._ticks_per_step
        use_pid = self.CONTROLLER == "pid"

        from gym_pybullet_adrp_tpu.control import firmware_pid as fp

        @jax.jit
        def _window(cstate, mstate, pid_state, cmdr, action):
            """Run one ctrl-freq window of firmware ticks
            (reference step:201-259). ``mstate`` carries the sensor/tick
            bookkeeping for both controllers; ``pid_state`` holds the
            controllerPid statics (unused on the Mellinger path).
            """

            def tick(carry, _):
                cst, ms, ps, cs, act_buf = carry
                # physics first, with the (possibly delayed) queued action
                # (reference ACTION_DELAY ring, CFAviary:246-251)
                cst = core.core_step(cfg, params, cst, act_buf[0])
                tick_time = ms.tick.astype(act_buf.dtype) / firmware_freq
                cs = cmdr_mod.update_setpoint(cs, tick_time)
                ms, fw, gyro_deg, acc_gs = mel.update_sensor_and_state(
                    ms, cst.phys.pos, cst.phys.rpy, cst.phys.vel
                )
                if use_pid:
                    # controllerPid path (reference CFAviary:401-408):
                    # 100 Hz position / 500 Hz attitude wrapper gating
                    att_due = tick_time - ms.last_att_pid_call > 0.002
                    pos_due = att_due & (
                        tick_time - ms.last_pos_pid_call > 0.01
                    )
                    ps, control = fp.controller_pid(
                        ps, cs.setpoint, gyro_deg, fw, pos_due, att_due
                    )
                    pwms = mel.compute_pwms(control)
                    ms = ms._replace(
                        tick=ms.tick + 1,
                        last_att_pid_call=jnp.where(
                            att_due, tick_time, ms.last_att_pid_call
                        ),
                        last_pos_pid_call=jnp.where(
                            pos_due, tick_time, ms.last_pos_pid_call
                        ),
                    )
                else:
                    ms, pwms = mel.step_controller(
                        ms, cs.setpoint, fw, gyro_deg, acc_gs
                    )
                # pwm -> rpm (reference :244) with the [3,2,1,0] motor-order
                # compensation for the IROS URDF. NOTE(fixed reference
                # defect): the reference applies this reorder only in the
                # race controller (MellingerControl.py:250) and omits it in
                # CFAviary, whose roll/pitch channels are therefore inverted
                # against cf2x_IROS (CFAviary is untested in the reference
                # CI); without it the drone flips on takeoff.
                rpm = (
                    PWM2RPM_SCALE * jnp.clip(pwms, MIN_PWM, MAX_PWM)
                    + PWM2RPM_CONST
                )[..., ::-1]
                rpm = jnp.where(ms.error_flag[..., None], jnp.zeros_like(rpm), rpm)
                act_buf = jnp.concatenate([act_buf[1:], rpm[None]], axis=0)
                return (cst, ms, ps, cs, act_buf), None

            (cstate, mstate, pid_state, cmdr, action), _ = jax.lax.scan(
                tick, (cstate, mstate, pid_state, cmdr, action), None,
                length=n_ticks,
            )
            return (
                cstate, mstate, pid_state, cmdr, action,
                core.state_vector(cstate),
            )

        self._jit_window = _window
        self._state = None
        self._mell = None
        self._cmdr = None
        self._action = None
        self.command_queue = []
        self._initialize_firmware()

    # -- lifecycle -----------------------------------------------------------
    def _initialize_firmware(self):
        """Reset all firmware state (reference _initalize_cffirmware:112-185)."""
        self.states = []
        self.takeoff_sent = False
        self.tick = 0
        self.command_queue = []
        self._state = core.core_reset(
            self.cfg, self.INIT_XYZS, self.INIT_RPYS, dtype=self.dtype
        )
        self._mell = mel.init_state((1,), dtype=self.dtype)
        self._mell = self._mell._replace(
            prev_rpy=jnp.asarray(self.INIT_RPYS, dtype=self.dtype),
            prev_vel=jnp.zeros((1, 3), dtype=self.dtype),
        )
        from gym_pybullet_adrp_tpu.control import firmware_pid as fp

        self._pid = fp.init_state((1,), dtype=self.dtype)
        self._cmdr = cmdr_mod.init_state((1,), dtype=self.dtype)
        # slot 0 applies next tick; extra slots emulate actuation latency
        self._action = jnp.zeros((ACTION_DELAY + 1, 1, 4), dtype=self.dtype)
        self.step_counter = 0
        self.RESET_TIME = time.time()
        obs = np.asarray(core.state_vector(self._state))
        return obs, {"answer": 42}

    def reset(self, seed: Optional[int] = None, options: Optional[dict] = None):
        return self._initialize_firmware()

    # -- stepping ------------------------------------------------------------
    def step(self, i: int):
        """Advance one ctrl_freq step = firmware window (reference :187-261)."""
        t = i / self.ctrl_freq
        self._process_command_queue(t)
        (
            self._state, self._mell, self._pid, self._cmdr, self._action, obs
        ) = self._jit_window(
            self._state, self._mell, self._pid, self._cmdr, self._action
        )
        self.tick = int(self._mell.tick[0])
        self.step_counter = int(self._state.step_counter)
        if self.takeoff_sent:
            pos = np.asarray(self._state.phys.pos[0])
            self.states.append(
                [self.tick / self.firmware_freq, pos[0], pos[1], pos[2]]
            )
        return np.asarray(obs), -1, False, False, {"answer": 42}

    def _process_command_queue(self, sim_time: float):
        """Pop and execute one queued command (reference :428-433)."""
        if not self.command_queue:
            return
        cmd, args = self.command_queue.pop(0)
        cid, vec = cmdr_mod.pack_command(cmd, args)
        st = self._state
        self._cmdr = cmdr_mod.process_command(
            self._cmdr,
            jnp.asarray([cid], dtype=jnp.int32),
            jnp.asarray(vec, dtype=self.dtype)[None],
            jnp.asarray([sim_time], dtype=self.dtype),
            st.phys.pos,
            st.phys.vel,
            st.phys.rpy[..., 2],
        )

    # -- command senders (reference :435-606) --------------------------------
    def sendFullStateCmd(self, pos, vel, acc, yaw, rpy_rate, timestep):
        self.command_queue.append(
            (Command.FULLSTATE, (pos, vel, acc, yaw, rpy_rate, timestep))
        )

    def sendTakeoffCmd(self, height, duration):
        self.takeoff_sent = True
        self.command_queue.append((Command.TAKEOFF, (height, duration)))

    def sendTakeoffYawCmd(self, height, duration, yaw):
        self.command_queue.append((Command.TAKEOFFYAW, (height, duration, yaw)))

    def sendTakeoffVelCmd(self, height, vel, relative):
        self.command_queue.append((Command.TAKEOFFVEL, (height, vel, relative)))

    def sendLandCmd(self, height, duration):
        self.command_queue.append((Command.LAND, (height, duration)))

    def sendLandYawCmd(self, height, duration, yaw):
        self.command_queue.append((Command.LANDYAW, (height, duration, yaw)))

    def sendLandVelCmd(self, height, vel, relative):
        self.command_queue.append((Command.LANDVEL, (height, vel, relative)))

    def sendGotoCmd(self, pos, yaw, duration_s, relative):
        self.command_queue.append((Command.GOTO, (pos, yaw, duration_s, relative)))

    def sendStopCmd(self):
        self.command_queue.append((Command.STOP, ()))

    def notifySetpointStop(self):
        self.command_queue.append((Command.NOTIFY, ()))

    # -- spaces / obs (reference :659-726) -----------------------------------
    def _actionSpace(self):
        return spaces.Box(
            low=np.zeros((self.NUM_DRONES, 4), dtype=np.float32),
            high=np.full((self.NUM_DRONES, 4), self.MAX_RPM, dtype=np.float32),
            dtype=np.float32,
        )

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

    def _stateVector(self):
        return np.asarray(core.state_vector(self._state))


class CFPIDAviary(CFAviary):
    """CFAviary flying the 1 kHz firmware PID controller
    (reference CFAviary.CONTROLLER = 'pid' variant, :21, :80, :157-159)."""

    CONTROLLER = "pid"
