"""Pipeline orchestration (SURVEY.md §2.5): Pipeline facade, FluxPipeline,
FlowMatchEuler scheduler, sampling plumbing."""

from .api import (  # noqa: F401
    DiffusionGenerationParams,
    ModelDType,
    ModelSource,
    Offloading,
    Pipeline,
)
from .scheduler import SchedulerConfig, calculate_shift  # noqa: F401
