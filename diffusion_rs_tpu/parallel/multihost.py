"""Multi-host initialization (v5e pods / multi-slice over DCN).

The reference has no distributed story (SURVEY §2.8). On TPU pods, JAX's
runtime handles the collectives; this is the thin bootstrap: call
``init_multihost()`` once per process before any jax use, then build meshes
with ``parallel.make_mesh`` over ``jax.devices()`` (which spans all hosts
after initialization).
"""

from __future__ import annotations

import logging
import os
from typing import Optional

log = logging.getLogger("diffusion_rs_tpu")


def init_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Initialize jax.distributed when running multi-process. Arguments
    default to the standard env vars / TPU metadata autodetection. Returns
    True when distributed mode is active."""
    import jax

    if num_processes is None:
        env = os.environ.get("JAX_NUM_PROCESSES")
        num_processes = int(env) if env else None
    if num_processes in (None, 1) and coordinator_address is None:
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    log.info(
        "multihost: process %d/%d, %d global devices",
        jax.process_index(), jax.process_count(), len(jax.devices()),
    )
    return True
