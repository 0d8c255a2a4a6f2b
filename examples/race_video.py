"""Render a race episode to PNG frames / mp4 with the in-graph ray caster.

Runs the scripted racers on the getting_started track and captures a chase
camera each control step (capability parity with the reference's PyBullet
video recording, BaseAviary.py:296-321, minus the GUI).

    python examples/race_video.py --frames 60 --out results
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import jax.numpy as jnp

from gym_pybullet_adrp_tpu.envs.race import MultiRaceAviary
from gym_pybullet_adrp_tpu.ops.render import render, scene_from_race_state
from gym_pybullet_adrp_tpu.utils.rendering import VideoRecorder
from gym_pybullet_adrp_tpu.utils.utils import load_controller


def run(frames: int = 60, out: str = "results", width: int = 320,
        height: int = 240):
    env = MultiRaceAviary("getting_started", num_drones=2)
    obs, info = env.reset()
    agents = []
    for d in range(2):
        i2 = dict(info)
        i2["delay"] = d
        agents.append(
            load_controller(
                str(Path(__file__).resolve().parent.parent / "agents/hardcoded.py")
            )(d, obs[d], i2)
        )

    rec = VideoRecorder(output_folder=out, fps=25)
    terminated = truncated = False
    step = 0
    while not (terminated or truncated) and step < frames:
        t = step / env.CTRL_FREQ
        actions = [a.predict(obs[i], ep_time=t) for i, a in enumerate(agents)]
        obs, _, terminated, truncated, _ = env.step(actions)

        st = env._state
        scene = scene_from_race_state(
            st.gates_actual, st.obstacles_actual, st.phys.pos
        )
        # chase camera behind drone 0
        target = jnp.asarray(np.asarray(st.phys.pos[0]), dtype=jnp.float32)
        eye = target + jnp.asarray([1.5, 1.5, 1.0], dtype=jnp.float32)
        rgba, depth, seg = render(scene, eye, target, width=width, height=height)
        rec.add_frame(np.asarray(rgba).astype(np.uint8))
        step += 1

    mp4 = rec.to_mp4()
    print(f"frames: {rec.frame_num} -> {mp4 or rec.path}")
    return rec


if __name__ == "__main__":
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--frames", type=int, default=60)
    ap.add_argument("--out", default="results")
    ap.add_argument("--width", type=int, default=320)
    ap.add_argument("--height", type=int, default=240)
    a = ap.parse_args()
    run(frames=a.frames, out=a.out, width=a.width, height=a.height)
