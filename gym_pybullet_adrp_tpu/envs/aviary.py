"""Gymnasium-API aviary classes over the functional core.

These classes give users of the reference drop-in-familiar envs
(``CtrlAviary``, ``VelocityAviary``, ``HoverAviary``, ``MultiHoverAviary``,
reference envs/CtrlAviary.py, VelocityAviary.py, HoverAviary.py,
MultiHoverAviary.py) while all compute runs as a single jitted XLA program
per step. The class layer only holds the state pytree and converts to/from
NumPy at the API boundary; for large-scale training use the functional layer
(``envs.rl``) directly under ``vmap``/``shard_map`` — see ``parallel/``.
"""

import time
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
import gymnasium as gym
from gymnasium import spaces

from gym_pybullet_adrp_tpu.envs import core, rl
from gym_pybullet_adrp_tpu.envs.core import AviaryConfig
from gym_pybullet_adrp_tpu.control import dslpid
from gym_pybullet_adrp_tpu.models.drone import drone_params
from gym_pybullet_adrp_tpu.utils.enums import (
    ActionType, DroneModel, ObservationType, Physics,
)


class JaxAviaryBase(gym.Env):
    """Shared machinery: params, init poses, jitted step cache, bookkeeping.

    Constructor surface mirrors reference BaseAviary.__init__:25-40; options
    that existed only to drive PyBullet rendering (gui, record, user_debug_gui,
    vision_attributes, output_folder) are accepted for compatibility and used
    by the host-side renderers/loggers only.
    """

    def __init__(
        self,
        drone_model: DroneModel = DroneModel.CF2X,
        num_drones: int = 1,
        neighbourhood_radius: float = np.inf,
        initial_xyzs=None,
        initial_rpys=None,
        physics: Physics = Physics.PYB,
        pyb_freq: int = 240,
        ctrl_freq: int = 240,
        gui: bool = False,
        record: bool = False,
        obstacles: bool = False,
        user_debug_gui: bool = True,
        vision_attributes: bool = False,
        output_folder: str = "results",
        dtype=jnp.float32,
    ):
        self.cfg = AviaryConfig(
            drone_model=drone_model,
            num_drones=num_drones,
            physics=physics,
            pyb_freq=pyb_freq,
            ctrl_freq=ctrl_freq,
            neighbourhood_radius=neighbourhood_radius,
        )
        self.dtype = dtype
        self.params = drone_params(drone_model, dtype=dtype)

        # constants exposed with reference names (BaseAviary.py:74-128)
        self.G = 9.8
        self.NUM_DRONES = num_drones
        self.DRONE_MODEL = drone_model
        self.PHYSICS = physics
        self.CTRL_FREQ = ctrl_freq
        self.PYB_FREQ = pyb_freq
        self.PYB_STEPS_PER_CTRL = self.cfg.steps_per_ctrl
        self.CTRL_TIMESTEP = self.cfg.ctrl_timestep
        self.PYB_TIMESTEP = self.cfg.pyb_timestep
        self.GUI = gui
        self.RECORD = record
        self.OBSTACLES = obstacles
        self.OUTPUT_FOLDER = output_folder
        p = self.params
        self.M = float(p.mass)
        self.L = float(p.arm)
        self.KF = float(p.kf)
        self.KM = float(p.km)
        self.GRAVITY = float(p.gravity)
        self.HOVER_RPM = float(p.hover_rpm)
        self.MAX_RPM = float(p.max_rpm)
        self.MAX_THRUST = float(p.max_thrust)
        self.MAX_SPEED_KMH = float(p.max_speed_kmh)
        self.SPEED_LIMIT = float(p.speed_limit)
        self.COLLISION_H = float(p.collision_h)
        self.COLLISION_R = float(p.collision_r)

        if initial_xyzs is None:
            initial_xyzs = core.default_init_xyzs(self.cfg, self.params)
        if initial_rpys is None:
            initial_rpys = np.zeros((num_drones, 3))
        self.INIT_XYZS = np.asarray(initial_xyzs, dtype=np.float64).reshape(
            num_drones, 3
        )
        self.INIT_RPYS = np.asarray(initial_rpys, dtype=np.float64).reshape(
            num_drones, 3
        )

        self.step_counter = 0
        self.RESET_TIME = time.time()
        self.first_render_call = True
        self.action_space = self._actionSpace()
        self.observation_space = self._observationSpace()

    # -- subclass hooks (reference BaseAviary.py:1025-1108) ------------------
    def _actionSpace(self):
        raise NotImplementedError

    def _observationSpace(self):
        raise NotImplementedError

    def _stateVector(self) -> np.ndarray:
        raise NotImplementedError

    def render(self, mode: str = "human", close: bool = False):
        """Text render (reference BaseAviary.render:391-416)."""
        sv = self._stateVector()
        t_wall = time.time() - self.RESET_TIME
        print(
            f"\n[INFO] render ——— it {self.step_counter:04d} "
            f"——— wall-clock {t_wall:.1f}s, "
            f"sim {self.step_counter * self.PYB_TIMESTEP:.1f}s@{self.PYB_FREQ}Hz "
            f"({(self.step_counter * self.PYB_TIMESTEP) / max(t_wall, 1e-9):.2f}x)"
        )
        for i in range(self.NUM_DRONES):
            s = sv[i]
            print(
                f"[INFO] drone {i} ——— x {s[0]:+06.2f}, y {s[1]:+06.2f}, z {s[2]:+06.2f}"
                f" ——— vel {s[10]:+06.2f}, {s[11]:+06.2f}, {s[12]:+06.2f}"
                f" ——— rpy {np.degrees(s[7]):+06.2f}, {np.degrees(s[8]):+06.2f}, {np.degrees(s[9]):+06.2f}"
                f" ——— ang vel {s[13]:+06.4f}, {s[14]:+06.4f}, {s[15]:+06.4f}"
            )

    def close(self):
        pass

    def _getDroneStateVector(self, nth_drone: int) -> np.ndarray:
        return self._stateVector()[nth_drone]

    # -- vision (reference BaseAviary._getDroneImages:569-621) ---------------
    IMG_RES = np.array([64, 48])

    def _scene(self):
        """Renderable scene for this env: ground + all drones (+ landmark
        pillars when obstacles are enabled, standing in for the reference's
        RGB-mode landmark props, BaseRLAviary._addObstacles:106-126)."""
        from gym_pybullet_adrp_tpu.ops import render as render_mod

        sv = self._stateVector()
        pos = jnp.asarray(sv[:, 0:3], dtype=self.dtype)
        scene = render_mod.empty_scene(dtype=self.dtype)
        scene = scene._replace(
            sph_center=pos,
            sph_radius=jnp.full((self.NUM_DRONES,), self.COLLISION_R, self.dtype),
            sph_color=jnp.tile(
                jnp.asarray([[0.3, 0.3, 0.3]], dtype=self.dtype),
                (self.NUM_DRONES, 1),
            ),
            sph_valid=jnp.ones((self.NUM_DRONES,), dtype=bool),
        )
        if self.OBSTACLES:
            scene = render_mod.add_landmarks(scene, dtype=self.dtype)
        return scene

    def _getDroneImages(self, nth_drone: int, segmentation: bool = True):
        """(rgb (H, W, 4), dep (H, W), seg (H, W)) from the n-th drone's POV
        via the in-graph ray-casting renderer."""
        from gym_pybullet_adrp_tpu.ops import render as render_mod

        sv = self._stateVector()
        pos = jnp.asarray(sv[nth_drone, 0:3], dtype=self.dtype)
        q = jnp.asarray(sv[nth_drone, 3:7], dtype=self.dtype)
        eye, target = render_mod.drone_camera(pos, q, self.L)
        rgba, depth, seg = render_mod.render(
            self._scene(), eye, target,
            width=int(self.IMG_RES[0]), height=int(self.IMG_RES[1]),
        )
        return (
            np.asarray(rgba).astype(np.uint8),
            np.asarray(depth),
            np.asarray(seg),
        )

    def _exportImage(self, img_type, img_input, path, frame_num: int = 0):
        from gym_pybullet_adrp_tpu.utils.rendering import export_image

        return export_image(img_type, img_input, path, frame_num)


class CtrlAviary(JaxAviaryBase):
    """Direct-RPM control playground (reference envs/CtrlAviary.py)."""

    def __init__(self, **kwargs):
        super().__init__(**kwargs)
        cfg, params = self.cfg, self.params

        @jax.jit
        def _step(state, action):
            rpm = jnp.clip(action, 0.0, params.max_rpm)
            new_state = core.core_step(cfg, params, state, rpm)
            return new_state, core.state_vector(new_state)

        self._jit_step = _step
        self._state = None

    def _actionSpace(self):
        # reference CtrlAviary._actionSpace:74-86
        return spaces.Box(
            low=np.zeros((self.NUM_DRONES, 4), dtype=np.float32),
            high=np.full((self.NUM_DRONES, 4), self.MAX_RPM, dtype=np.float32),
            dtype=np.float32,
        )

    def _observationSpace(self):
        # reference CtrlAviary._observationSpace:90-102 (N, 20)
        lo = np.array(
            [-np.inf, -np.inf, 0.0, -1, -1, -1, -1, -np.pi, -np.pi, -np.pi]
            + [-np.inf] * 6 + [0.0] * 4,
            dtype=np.float32,
        )
        hi = np.array(
            [np.inf] * 3 + [1, 1, 1, 1, np.pi, np.pi, np.pi]
            + [np.inf] * 6 + [self.MAX_RPM] * 4,
            dtype=np.float32,
        )
        return spaces.Box(
            low=np.tile(lo, (self.NUM_DRONES, 1)),
            high=np.tile(hi, (self.NUM_DRONES, 1)),
            dtype=np.float32,
        )

    def reset(self, seed: Optional[int] = None, options: Optional[dict] = None):
        super().reset(seed=seed)
        self._state = core.core_reset(
            self.cfg, self.INIT_XYZS, self.INIT_RPYS, dtype=self.dtype
        )
        self.step_counter = 0
        self.RESET_TIME = time.time()
        obs = np.asarray(core.state_vector(self._state))
        return obs, self._computeInfo()

    def step(self, action):
        action = jnp.asarray(
            np.reshape(action, (self.NUM_DRONES, 4)), dtype=self.dtype
        )
        self._state, obs = self._jit_step(self._state, action)
        self.step_counter += self.PYB_STEPS_PER_CTRL
        return np.asarray(obs), -1, False, False, self._computeInfo()

    def _stateVector(self):
        return np.asarray(core.state_vector(self._state))

    def _computeInfo(self):
        return {"answer": 42}  # reference CtrlAviary._computeInfo


class VelocityAviary(JaxAviaryBase):
    """Velocity-command env w/ embedded DSL PID (reference envs/VelocityAviary.py)."""

    def __init__(self, **kwargs):
        super().__init__(**kwargs)
        cfg, params = self.cfg, self.params
        dt = cfg.ctrl_timestep

        @jax.jit
        def _step(state, ctl, action):
            sv = core.state_vector(state)
            pos, q, vel = sv[:, 0:3], sv[:, 3:7], sv[:, 10:13]
            yaw = sv[:, 9]
            norm = jnp.linalg.norm(action[:, :3], axis=-1, keepdims=True)
            v_unit = jnp.where(
                norm > 0, action[:, :3] / jnp.maximum(norm, 1e-12), 0.0
            )
            target_vel = params.speed_limit * jnp.abs(action[:, 3:4]) * v_unit
            target_rpy = jnp.stack(
                [jnp.zeros_like(yaw), jnp.zeros_like(yaw), yaw], axis=-1
            )
            rpm, ctl, _, _ = dslpid.compute_control(
                params, ctl, dt, pos, q, vel, pos,
                target_rpy=target_rpy, target_vel=target_vel,
            )
            new_state = core.core_step(cfg, params, state, rpm)
            return new_state, ctl, core.state_vector(new_state)

        self._jit_step = _step
        self._state = None
        self._ctl = None

    def _actionSpace(self):
        # reference VelocityAviary._actionSpace:82-94
        lo = np.tile(np.array([-1, -1, -1, 0], dtype=np.float32), (self.NUM_DRONES, 1))
        hi = np.ones((self.NUM_DRONES, 4), dtype=np.float32)
        return spaces.Box(low=lo, high=hi, dtype=np.float32)

    _observationSpace = CtrlAviary._observationSpace

    def reset(self, seed: Optional[int] = None, options: Optional[dict] = None):
        super().reset(seed=seed)
        self._state = core.core_reset(
            self.cfg, self.INIT_XYZS, self.INIT_RPYS, dtype=self.dtype
        )
        self._ctl = dslpid.init_state((self.NUM_DRONES,), dtype=self.dtype)
        self.step_counter = 0
        self.RESET_TIME = time.time()
        return np.asarray(core.state_vector(self._state)), {"answer": 42}

    def step(self, action):
        action = jnp.asarray(
            np.reshape(action, (self.NUM_DRONES, 4)), dtype=self.dtype
        )
        self._state, self._ctl, obs = self._jit_step(self._state, self._ctl, action)
        self.step_counter += self.PYB_STEPS_PER_CTRL
        return np.asarray(obs), -1, False, False, {"answer": 42}

    def _stateVector(self):
        return np.asarray(core.state_vector(self._state))


class BaseRLAviary(JaxAviaryBase):
    """Gymnasium shell over the functional RL env (reference envs/BaseRLAviary.py)."""

    TASK = None
    EPISODE_LEN_SEC = 8

    def __init__(
        self,
        drone_model: DroneModel = DroneModel.CF2X,
        num_drones: int = 1,
        neighbourhood_radius: float = np.inf,
        initial_xyzs=None,
        initial_rpys=None,
        physics: Physics = Physics.PYB,
        pyb_freq: int = 240,
        ctrl_freq: int = 30,
        gui: bool = False,
        record: bool = False,
        obs: ObservationType = ObservationType.KIN,
        act: ActionType = ActionType.RPM,
        dtype=jnp.float32,
    ):
        self.OBS_TYPE = obs
        self.ACT_TYPE = act
        self.rl_cfg = RLC = rl.RLConfig(
            aviary=AviaryConfig(
                drone_model=drone_model,
                num_drones=num_drones,
                physics=physics,
                pyb_freq=pyb_freq,
                ctrl_freq=ctrl_freq,
                neighbourhood_radius=neighbourhood_radius,
            ),
            obs_type=obs,
            act_type=act,
            episode_len_sec=self.EPISODE_LEN_SEC,
            task=self.TASK,
        )
        self.ACTION_BUFFER_SIZE = RLC.action_buffer_size
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
            obstacles=True,
            user_debug_gui=False,
            dtype=dtype,
        )
        params = self.params

        @jax.jit
        def _step(state, action):
            return rl.rl_step(RLC, params, state, action)

        self._jit_step = _step
        self._state = None

    def _actionSpace(self):
        size = self.rl_cfg.act_size
        return spaces.Box(
            low=-np.ones((self.NUM_DRONES, size), dtype=np.float32),
            high=np.ones((self.NUM_DRONES, size), dtype=np.float32),
            dtype=np.float32,
        )

    def _observationSpace(self):
        if self.OBS_TYPE == ObservationType.RGB:
            # reference BaseRLAviary._observationSpace:252-255
            return spaces.Box(
                low=0, high=255,
                shape=(self.NUM_DRONES, int(self.IMG_RES[1]),
                       int(self.IMG_RES[0]), 4),
                dtype=np.uint8,
            )
        # reference BaseRLAviary._observationSpace:256-277
        lo = [-np.inf, -np.inf, 0.0] + [-np.inf] * 9
        hi = [np.inf] * 12
        buf = self.rl_cfg.action_buffer_size * self.rl_cfg.act_size
        lo = np.array(lo + [-1.0] * buf, dtype=np.float32)
        hi = np.array(hi + [1.0] * buf, dtype=np.float32)
        return spaces.Box(
            low=np.tile(lo, (self.NUM_DRONES, 1)),
            high=np.tile(hi, (self.NUM_DRONES, 1)),
            dtype=np.float32,
        )

    def _rgbObs(self):
        """(N, H, W, 4) float32 drone-POV images (reference
        _computeObs:293-306), captured at IMG_FRAME_PER_SEC with caching."""
        capture_freq = int(self.PYB_FREQ / 24)
        if self._rgb_cache is None or self.step_counter % max(
            capture_freq - capture_freq % self.PYB_STEPS_PER_CTRL,
            self.PYB_STEPS_PER_CTRL,
        ) == 0:
            self._rgb_cache = np.stack(
                [
                    self._getDroneImages(i, segmentation=False)[0]
                    for i in range(self.NUM_DRONES)
                ]
            ).astype("float32")
        return self._rgb_cache

    def reset(self, seed: Optional[int] = None, options: Optional[dict] = None):
        super().reset(seed=seed)
        self._state = rl.rl_reset(
            self.rl_cfg, self.INIT_XYZS, self.INIT_RPYS, dtype=self.dtype
        )
        self.step_counter = 0
        self.RESET_TIME = time.time()
        self._rgb_cache = None
        if self.OBS_TYPE == ObservationType.RGB:
            return self._rgbObs(), self._computeInfo()
        obs = np.asarray(rl.compute_obs(self.rl_cfg, self._state))
        return obs.astype(np.float32), self._computeInfo()

    def step(self, action):
        action = jnp.asarray(
            np.reshape(action, (self.NUM_DRONES, self.rl_cfg.act_size)),
            dtype=self.dtype,
        )
        self._state, obs, reward, terminated, truncated = self._jit_step(
            self._state, action
        )
        self.step_counter += self.PYB_STEPS_PER_CTRL
        if self.OBS_TYPE == ObservationType.RGB:
            obs_out = self._rgbObs()
        else:
            obs_out = np.asarray(obs).astype(np.float32)
        return (
            obs_out,
            float(reward),
            bool(terminated),
            bool(truncated),
            self._computeInfo(),
        )

    def _stateVector(self):
        return np.asarray(core.state_vector(self._state.core))

    def _computeInfo(self):
        return {"answer": 42}


class HoverAviary(BaseRLAviary):
    """Single-agent hover-at-[0,0,1] task (reference envs/HoverAviary.py)."""

    TASK = "hover"
    EPISODE_LEN_SEC = 8

    def __init__(self, **kwargs):
        kwargs["num_drones"] = 1
        kwargs.setdefault("ctrl_freq", 30)
        super().__init__(**kwargs)
        self.TARGET_POS = np.array([0, 0, 1])


class MultiHoverAviary(BaseRLAviary):
    """Multi-agent hover task (reference envs/MultiHoverAviary.py)."""

    TASK = "multihover"
    EPISODE_LEN_SEC = 8

    def __init__(self, num_drones: int = 2, **kwargs):
        kwargs["num_drones"] = num_drones
        kwargs.setdefault("ctrl_freq", 30)
        super().__init__(**kwargs)
        self.TARGET_POS = self.INIT_XYZS + np.array(
            [[0, 0, 1 / (i + 1)] for i in range(num_drones)]
        )
