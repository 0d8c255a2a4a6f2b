"""Checkpoint / resume for learner + env state.

The reference only checkpointed SB3 model zips (reference examples/learn.py:
85-97); env/sim state was lost on restart. Here the full ``TrainState``
(policy params, optimizer state, the entire batched env-state pytree, RNG,
episode bookkeeping) round-trips through orbax, so training resumes
bit-exactly mid-episode — the checkpoint/resume story SURVEY §5 calls for.
"""

import os
from pathlib import Path
from typing import Optional

import orbax.checkpoint as ocp

from gym_pybullet_adrp_tpu.rl.ppo import TrainState


def save_checkpoint(path, train_state: TrainState, step: int, keep: int = 3):
    """Write checkpoint `step` under `path` (creates directories)."""
    path = Path(path).resolve()
    path.mkdir(parents=True, exist_ok=True)
    with ocp.CheckpointManager(
        path, options=ocp.CheckpointManagerOptions(max_to_keep=keep)
    ) as mngr:
        mngr.save(step, args=ocp.args.StandardSave(train_state))
        mngr.wait_until_finished()
    return path / str(step)


def restore_checkpoint(path, template: TrainState,
                       step: Optional[int] = None) -> tuple:
    """Restore (train_state, step). `template` supplies the pytree structure
    (use `init_fn(rng)` output)."""
    path = Path(path).resolve()
    with ocp.CheckpointManager(path) as mngr:
        if step is None:
            step = mngr.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoints under {path}")
        restored = mngr.restore(
            step, args=ocp.args.StandardRestore(template)
        )
    return restored, step


def save_policy(path, params):
    """Standalone policy export (flax msgpack) for agents/rl_agent.py."""
    from flax import serialization

    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(params))
    return path


def load_policy(path, template_params):
    from flax import serialization

    with open(path, "rb") as f:
        return serialization.from_bytes(template_params, f.read())
