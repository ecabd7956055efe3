"""Multi-host SPMD setup.

The reference's only execution environment is one process with a rayon
thread pool (camera.rs:107-121). The TPU equivalent spans hosts: call
`init_distributed()` once per process (driven by the launcher's env:
COORDINATOR_ADDRESS / NUM_PROCESSES / PROCESS_ID, or TPU pod metadata),
then build one global mesh over every chip; XLA routes collectives over
ICI within a slice and DCN across hosts.

Rendering multi-host: every process calls `render_sharded` with the
global mesh; each host computes only its addressable shard of the pixel
rays, and `host_local_image` gathers the full frame onto each host for
IO (only rank 0 should write the PNG).
"""
from __future__ import annotations

import jax
import numpy as np

from .mesh import make_mesh


def init_distributed(coordinator: str = None, num_processes: int = None,
                     process_id: int = None) -> bool:
    """Initialize jax.distributed if a multi-process env is configured.

    Returns True when running multi-process. Safe to call when single
    process (no-op, returns False).
    """
    import os

    coordinator = coordinator or os.environ.get("COORDINATOR_ADDRESS")
    if num_processes is None:
        num_processes = int(os.environ.get("NUM_PROCESSES", "0") or 0)
    if process_id is None:
        process_id = int(os.environ.get("PROCESS_ID", "0") or 0)
    if not coordinator and num_processes <= 1:
        # On TPU pods jax.distributed can auto-detect; try only when the
        # environment looks multi-host.
        return False
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes or None,
                               process_id=process_id)
    return True


def global_mesh():
    """1-D mesh over every chip in the job (all hosts)."""
    return make_mesh(jax.devices())


def host_local_image(image) -> np.ndarray:
    """Materialize a (possibly host-sharded) rendered image locally.

    Uses jax.experimental.multihost_utils when the array spans
    processes; plain device-get otherwise.
    """
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        return np.asarray(
            multihost_utils.process_allgather(image, tiled=True))
    return np.asarray(image)
