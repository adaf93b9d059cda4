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


def make_multislice_mesh(dp: int = 0, sp: int = 1, tp: int = 1):
    """Mesh for multi-host / multi-slice runs with the axis order that puts
    the heavy collectives on ICI.

    ``jax.devices()`` orders devices process-major, so making ``dp`` the
    MAJOR (first) mesh axis places data parallelism across hosts/slices
    (DCN — only gradient/none traffic for inference) while ``sp``/``tp``
    (all-gathers, psums, ring permutes every block) stay inside a host's ICI
    domain. dp=0 means "infer": dp = n_devices // (sp * tp).
    """
    import jax
    from jax.sharding import Mesh
    import numpy as np

    devices = jax.devices()
    n = len(devices)
    if dp in (0, None):
        if n % (sp * tp):
            raise ValueError(f"{n} devices not divisible by sp*tp={sp * tp}")
        dp = n // (sp * tp)
    if dp * sp * tp != n:
        raise ValueError(f"dp({dp}) * sp({sp}) * tp({tp}) != n_devices({n})")
    arr = np.asarray(devices).reshape(dp, sp, tp)
    return Mesh(arr, axis_names=("dp", "sp", "tp"))


def local_batch_to_global(local_batch, mesh, spec=None):
    """Assemble a globally-sharded array from each process's LOCAL batch
    shard (per-host data feeding: every host tokenizes/loads only its own
    prompts). ``local_batch`` is a numpy array on every process; the global
    batch dim is process-concatenated along the mesh's "dp" axis."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    spec = spec if spec is not None else P("dp")
    return jax.make_array_from_process_local_data(
        NamedSharding(mesh, spec), local_batch
    )
