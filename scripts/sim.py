"""Race evaluation CLI.

Capability parity with reference scripts/sim.py:18-117: load a scenario
config, build the race env, load N controller modules, run episodes, report
per-episode times and rewards. Uses argparse (the reference used `fire`).

    python scripts/sim.py --config configs/getting_started.yaml \
        --controller agents/hardcoded.py --n_runs 3 --n_drones 2
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

from gym_pybullet_adrp_tpu.envs.race import MultiRaceAviary
from gym_pybullet_adrp_tpu.utils.config import load_config
from gym_pybullet_adrp_tpu.utils.enums import RaceMode
from gym_pybullet_adrp_tpu.utils.utils import load_controller, sync


def simulate(
    config: str = "configs/getting_started.yaml",
    controller=("agents/hardcoded.py",),
    n_runs: int = 10,
    n_drones: int = 2,
    gui: bool = False,
    racemode: str = "compare",
):
    """Evaluate drone controllers over multiple episodes (reference
    simulate:18-112). Returns the list of episode times."""
    cfg = load_config(config)
    env = MultiRaceAviary(
        cfg,
        num_drones=n_drones,
        racemode=RaceMode.COMPETE if racemode == "compete" else RaceMode.COMPARE,
    )

    if isinstance(controller, (str, Path)):
        controller = (controller,)
    controllers = list(controller)
    if len(controllers) != n_drones:
        controllers = (controllers * n_drones)[:n_drones]

    stats = {
        "episode_times": [0.0] * n_runs,
        "episode_rewards": [0.0] * n_runs,
    }

    for run in range(n_runs):
        episode_start = time.time()
        sim_time, episode_step = 0.0, 0
        terminated = truncated = False
        obs, info = env.reset()
        agents = []
        for drone_id, c in enumerate(controllers):
            info["delay"] = drone_id
            agents.append(load_controller(c)(drone_id, obs[drone_id], dict(info)))

        while not (terminated or truncated):
            sim_time = episode_step / env.CTRL_FREQ
            actions = [
                a.predict(obs[i], ep_time=sim_time) for i, a in enumerate(agents)
            ]
            if all(isinstance(a, np.ndarray) for a in actions):
                actions = np.array(actions)
            obs, reward, terminated, truncated, _ = env.step(actions)
            stats["episode_rewards"][run] += reward
            if gui:
                sync(sim_time, episode_start, 1 / env.CTRL_FREQ)
            episode_step += 1

        stats["episode_times"][run] = sim_time
        print(
            f"[run {run}] time {sim_time:.2f}s  reward "
            f"{stats['episode_rewards'][run]:.2f}  gates {env.current_gate}  "
            f"finished {env.drones_finished}  eliminated {env.drones_eliminated}"
        )

    env.close()
    return stats["episode_times"]


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--platform", default=None,
                    help="jax platform override (e.g. cpu); interactive "
                         "episode loops avoid per-step TPU-tunnel latency "
                         "on cpu")
    ap.add_argument("--config", default="configs/getting_started.yaml")
    ap.add_argument("--controller", nargs="+", default=["agents/hardcoded.py"])
    ap.add_argument("--n_runs", type=int, default=10)
    ap.add_argument("--n_drones", type=int, default=2)
    ap.add_argument("--gui", action="store_true")
    ap.add_argument("--racemode", choices=["compare", "compete"], default="compare")
    args = ap.parse_args()
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    times = simulate(
        config=args.config, controller=args.controller, n_runs=args.n_runs,
        n_drones=args.n_drones, gui=args.gui, racemode=args.racemode,
    )
    print("episode times:", times)


if __name__ == "__main__":
    main()
