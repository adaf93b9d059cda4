"""Parallelism & memory-capacity scaling (SURVEY.md §2.8 TPU equivalents):
mesh construction, GSPMD tensor/data-parallel sharding rules, host-DRAM
offload."""

from .mesh import (  # noqa: F401
    batch_sharding,
    make_mesh,
    replicated,
    sequence_sharding,
)
from .sharding import replicate_params, shard_params  # noqa: F401
from .offload import HostOffload  # noqa: F401
from .multihost import (  # noqa: F401
    init_multihost,
    local_batch_to_global,
    make_multislice_mesh,
)
