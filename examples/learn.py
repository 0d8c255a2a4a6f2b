"""PPO hover training (reference examples/learn.py).

Trains an actor-critic policy on HoverAviary (or MultiHoverAviary with
--multiagent true) with the reference's stop-training reward thresholds
(reference learn.py:78-81: 474.15 single / 949.5 multi for one_d_rpm;
467 / 920 otherwise), then evaluates deterministically and replays with the
flight Logger. The SB3 single-env loop becomes a vmapped many-env PPO: a
whole training iteration (rollout + update) is one jitted device launch.

    python examples/learn.py --multiagent false --local true
"""

import argparse
import os
import sys
import time
from datetime import datetime
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

DEFAULT_GUI = False
DEFAULT_RECORD_VIDEO = False
DEFAULT_OUTPUT_FOLDER = "results"
DEFAULT_COLAB = False
DEFAULT_OBS = "kin"
DEFAULT_ACT = "one_d_rpm"
DEFAULT_AGENTS = 2
DEFAULT_MA = False


def run(
    multiagent=DEFAULT_MA,
    output_folder=DEFAULT_OUTPUT_FOLDER,
    gui=DEFAULT_GUI,
    plot=True,
    colab=DEFAULT_COLAB,
    record_video=DEFAULT_RECORD_VIDEO,
    local=True,
    act=DEFAULT_ACT,
    obs=DEFAULT_OBS,
    n_envs=512,
    max_iters=2000,
):
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    import jax.numpy as jnp
    from flax import serialization

    from gym_pybullet_adrp_tpu.envs import rl as rlenv
    from gym_pybullet_adrp_tpu.envs.core import AviaryConfig
    from gym_pybullet_adrp_tpu.models.drone import drone_params
    from gym_pybullet_adrp_tpu.rl.ppo import (
        PPOConfig, make_ppo, make_ppo_core, rgb_hover_adapter,
    )
    from gym_pybullet_adrp_tpu.utils.enums import ActionType, DroneModel
    from gym_pybullet_adrp_tpu.utils.logger import Logger

    filename = os.path.join(
        output_folder, "save-" + datetime.now().strftime("%m.%d.%Y_%H.%M.%S")
    )
    os.makedirs(filename, exist_ok=True)

    act_type = ActionType(act)
    num_drones = DEFAULT_AGENTS if multiagent else 1
    task = "multihover" if multiagent else "hover"
    rl_cfg = rlenv.RLConfig(
        aviary=AviaryConfig(ctrl_freq=30, num_drones=num_drones),
        act_type=act_type,
        task=task,
    )
    params = drone_params(DroneModel.CF2X)
    init_xyzs = np.array(
        [[x * 4 * 0.0397, x * 4 * 0.0397, 0.1125] for x in range(num_drones)]
    )
    init_rpys = np.zeros((num_drones, 3))

    # target cumulative rewards (reference learn.py:78-81)
    if act_type == ActionType.ONE_D_RPM:
        target_reward = 474.15 if not multiagent else 949.5
    else:
        target_reward = 467.0 if not multiagent else 920.0

    cfg = PPOConfig(n_envs=n_envs, n_steps=64, n_minibatches=8)
    if local:
        # linear LR decay over the full budget stabilizes the late phase
        cfg = PPOConfig(
            n_envs=n_envs, n_steps=64, n_minibatches=8,
            total_updates=cfg.updates_for_iters(max_iters),
        )
    if obs == "rgb":
        # pixels-to-actions: drone-POV frames rendered in-graph
        # (reference learn.py's obs='rgb' mode, but fully on-device —
        # rlenv.compute_rgb_obs + a CnnPolicy-style conv actor-critic)
        from gym_pybullet_adrp_tpu.models.policy import CnnActorCritic

        img_w, img_h = 32, 24
        adapter = rgb_hover_adapter(
            cfg, rl_cfg, params, init_xyzs, init_rpys,
            width=img_w, height=img_h,
        )
        network = CnnActorCritic(
            act_dim=adapter.act_dim, img_h=img_h, img_w=img_w
        )
        init_fn, train_step, _ = make_ppo_core(
            cfg, adapter, network=network
        )
        # evaluation only reads env 0 — use a small adapter batch so each
        # eval step renders 16 frames, not n_envs
        eval_cfg = PPOConfig(n_envs=16, n_steps=cfg.n_steps)
        eval_adapter = rgb_hover_adapter(
            eval_cfg, rl_cfg, params, init_xyzs, init_rpys,
            width=img_w, height=img_h,
        )
        _, _, eval_core = make_ppo_core(
            eval_cfg, eval_adapter, network=network
        )
        eval_fn = lambda p, rng, n: eval_core(p, rng, n)[:1]
    else:
        init_fn, train_step, eval_fn = make_ppo(
            cfg, rl_cfg, params, init_xyzs, init_rpys
        )
    ts = init_fn(jax.random.PRNGKey(0))
    train_jit = jax.jit(train_step)
    eval_jit = jax.jit(lambda p: eval_fn(p, None, 8 * 30 + 2))

    budget_iters = max_iters if local else 2
    print(f"[INFO] training: {budget_iters} iterations x {cfg.batch_size} steps")
    best_return = -np.inf
    best_params = ts.params
    t0 = time.time()
    for it in range(budget_iters):
        ts, metrics = train_step_and_block(train_jit, ts)
        if it % 10 == 0 or it == budget_iters - 1:
            eval_ret = float(eval_jit(ts.params)[0])
            steps_done = (it + 1) * cfg.batch_size
            print(
                f"[{it:4d}] steps {steps_done:9d}  "
                f"mean_ep_return {float(metrics['mean_episode_return']):8.2f}  "
                f"eval_return {eval_ret:8.2f}  "
                f"({steps_done / max(time.time() - t0, 1e-9):,.0f} steps/s)"
            )
            if eval_ret > best_return:
                best_return = eval_ret
                best_params = ts.params
                with open(os.path.join(filename, "best_model.msgpack"), "wb") as f:
                    f.write(serialization.to_bytes(best_params))
            if eval_ret >= target_reward:
                print(f"[INFO] reward threshold {target_reward} reached; stopping")
                break

    with open(os.path.join(filename, "final_model.msgpack"), "wb") as f:
        f.write(serialization.to_bytes(ts.params))
    print(filename)

    # deterministic evaluation (reference learn.py:142-146)
    rets = [float(eval_jit(best_params)[0]) for _ in range(10)]
    print(f"\n\n\nMean reward {np.mean(rets)} +- {np.std(rets)}\n\n")

    # replay with logging (reference learn.py:148-188)
    from gym_pybullet_adrp_tpu.envs import HoverAviary, MultiHoverAviary
    from gym_pybullet_adrp_tpu.models.policy import ActorCritic
    from gym_pybullet_adrp_tpu.utils.enums import ObservationType

    obs_type = ObservationType.RGB if obs == "rgb" else ObservationType.KIN
    if multiagent:
        test_env = MultiHoverAviary(
            num_drones=DEFAULT_AGENTS, act=act_type, obs=obs_type, gui=gui,
            record=record_video,
        )
    else:
        test_env = HoverAviary(
            act=act_type, obs=obs_type, gui=gui, record=record_video
        )
    logger = Logger(
        logging_freq_hz=int(test_env.CTRL_FREQ),
        num_drones=num_drones,
        output_folder=output_folder,
        colab=colab,
    )
    if obs == "rgb":
        # match the training camera resolution; the Gym env emits uint8
        # frames where the in-graph adapter emits [0, 1] floats. IMG_RES is
        # read at capture time, so rebuild the already-constructed obs space
        test_env.IMG_RES = np.array([img_w, img_h])
        test_env.observation_space = test_env._observationSpace()
        network = CnnActorCritic(
            act_dim=num_drones * rl_cfg.act_size, img_h=img_h, img_w=img_w
        )
        # training consumed drone 0's POV only (rgb_hover_adapter)
        to_net = lambda o: np.asarray(o[0], dtype=np.float32)[
            ..., :3].reshape(1, -1) / 255.0
    else:
        network = ActorCritic(act_dim=num_drones * rl_cfg.act_size)
        to_net = lambda o: o.reshape(1, -1)
    apply = jax.jit(network.apply)
    obs_, info = test_env.reset(seed=42, options={})
    start = time.time()
    for i in range((test_env.EPISODE_LEN_SEC + 2) * test_env.CTRL_FREQ):
        mean, _, _ = apply(best_params, jnp.asarray(to_net(obs_)))
        action = np.clip(np.asarray(mean), -1, 1).reshape(
            num_drones, rl_cfg.act_size
        )
        obs_, reward, terminated, truncated, info = test_env.step(action)
        if obs == "kin":
            for d in range(num_drones):
                logger.log(
                    drone=d,
                    timestamp=i / test_env.CTRL_FREQ,
                    state=np.hstack(
                        [obs_[d][0:3], np.zeros(4), obs_[d][3:12],
                         np.resize(action[d], 4)]
                    ),
                    control=np.zeros(12),
                )
        if terminated or truncated:
            obs_, info = test_env.reset(seed=42, options={})
    test_env.close()

    if plot and obs == "kin":
        logger.plot()
    return best_return


def train_step_and_block(train_jit, ts):
    import jax

    ts, metrics = train_jit(ts)
    jax.block_until_ready(metrics["loss"])
    return ts, metrics


if __name__ == "__main__":
    from gym_pybullet_adrp_tpu.utils.utils import str2bool

    parser = argparse.ArgumentParser(
        description="PPO hover training (vmapped envs)"
    )
    parser.add_argument("--multiagent", default=DEFAULT_MA, type=str2bool)
    parser.add_argument("--gui", default=DEFAULT_GUI, type=str2bool)
    parser.add_argument("--record_video", default=DEFAULT_RECORD_VIDEO, type=str2bool)
    parser.add_argument("--output_folder", default=DEFAULT_OUTPUT_FOLDER, type=str)
    parser.add_argument("--colab", default=DEFAULT_COLAB, type=bool)
    parser.add_argument("--local", default=True, type=str2bool)
    parser.add_argument("--plot", default=True, type=str2bool)
    parser.add_argument("--act", default=DEFAULT_ACT, type=str)
    parser.add_argument("--obs", default=DEFAULT_OBS, type=str,
                        choices=["kin", "rgb"],
                        help="'rgb' trains pixels-to-actions: drone-POV "
                             "frames rendered in-graph + conv actor-critic")
    ARGS = parser.parse_args()
    run(**vars(ARGS))
