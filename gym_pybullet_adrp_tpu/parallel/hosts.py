"""Multi-host runtime initialization.

The reference is single-host by construction (SURVEY §2.2). Scaling here
follows the standard JAX multi-controller recipe: one Python process per
host, ``jax.distributed.initialize`` to join the cluster, a global mesh over
all devices, and the same ``shard_map`` programs from
``parallel/distributed.py`` — env shards stay host-local, gradient
all-reduce rides ICI within a slice and DCN across slices.

On a single host this module is a no-op pass-through, so driver scripts can
call ``ensure_initialized()`` unconditionally.
"""

import os

import jax
import numpy as np
from jax.sharding import Mesh

from gym_pybullet_adrp_tpu.parallel.distributed import AXIS


def ensure_initialized(coordinator_address=None, num_processes=None,
                       process_id=None):
    """Join the multi-host cluster when cluster env vars / args are present.

    Arguments may come explicitly or from the standard env vars
    (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID, or the
    TPU pod metadata when running on Cloud TPU). Single-process runs return
    immediately.
    """
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    if coordinator_address is None and num_processes is None:
        return False  # single host
    if jax.distributed.is_initialized():
        return True  # idempotent: already joined
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return True


def global_mesh() -> Mesh:
    """Data-parallel mesh over every device in the (possibly multi-host)
    cluster. Per-host shards of P('dp') arrays live on local devices only."""
    return Mesh(np.array(jax.devices()), (AXIS,))


def local_env_slice(n_envs_global: int):
    """(start, count) of this host's slice of a globally sharded env batch."""
    n_proc = jax.process_count()
    per = n_envs_global // n_proc
    return jax.process_index() * per, per
