"""FlowMatchEulerDiscrete scheduler.

Behavioral reference: diffusion_rs_core/src/pipelines/scheduler.rs (sigma
grid + dynamic/static shift) and pipelines/sampling.rs (Euler update). The
whole schedule is precomputed on the host (numpy) — it is O(num_steps)
scalar math — and the denoise loop itself runs as a single ``lax.scan``
(see pipelines/flux_pipeline.py).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional

import numpy as np


@dataclasses.dataclass(frozen=True)
class SchedulerConfig:
    """scheduler_config.json fields (scheduler.rs:4-20)."""

    scheduler_type: str = "FlowMatchEulerDiscreteScheduler"
    base_image_seq_len: int = 256
    base_shift: float = 0.5
    max_image_seq_len: int = 4096
    max_shift: float = 1.15
    shift: float = 1.0
    use_dynamic_shifting: bool = False

    @staticmethod
    def from_json(d: dict) -> "SchedulerConfig":
        return SchedulerConfig(
            scheduler_type=d.get("_class_name", "FlowMatchEulerDiscreteScheduler"),
            base_image_seq_len=d.get("base_image_seq_len", 256),
            base_shift=d.get("base_shift", 0.5),
            max_image_seq_len=d.get("max_image_seq_len", 4096),
            max_shift=d.get("max_shift", 1.15),
            shift=d.get("shift", 1.0),
            use_dynamic_shifting=d.get("use_dynamic_shifting", False),
        )

    def timesteps(self, num_steps: int, mu: Optional[float] = None) -> np.ndarray:
        """Sigma grid 1 -> 0 with time shift (scheduler.rs:28-50).

        Dynamic: sigma' = e^mu / (e^mu + (1/sigma - 1))
        Static:  sigma' = shift*sigma / (1 + (shift-1)*sigma)
        Returns num_steps+1 values (the trailing 0 closes the last window).
        """
        if self.scheduler_type != "FlowMatchEulerDiscreteScheduler":
            raise ValueError(f"unsupported scheduler {self.scheduler_type}")
        sigmas = np.linspace(1.0, 0.0, num_steps + 1)
        if self.use_dynamic_shifting:
            if mu is None:
                raise ValueError("mu is required for dynamic shifting")
            e = math.exp(mu)
            with np.errstate(divide="ignore"):
                shifted = e / (e + (1.0 / sigmas - 1.0))
            shifted[sigmas == 0.0] = 0.0
            sigmas = shifted
        else:
            sigmas = self.shift * sigmas / (1.0 + (self.shift - 1.0) * sigmas)
        return sigmas.astype(np.float32)


def calculate_shift(
    image_seq_len: int,
    base_seq_len: int = 256,
    max_seq_len: int = 4096,
    base_shift: float = 0.5,
    max_shift: float = 1.15,
) -> float:
    """Resolution-dependent mu (flux/sampling.rs:70-80).

    NOTE: the reference *calls* this with ``img.dims()[1]`` — the latent
    CHANNEL count (16), not the image sequence length
    (pipelines/flux/mod.rs:279-285) — which pins mu near base_shift at every
    resolution. We pass the actual packed-patch sequence length, matching the
    function's own signature and the upstream diffusers behavior; set
    ``DIFFUSION_RS_TPU_REFERENCE_MU=1`` on the pipeline to reproduce the
    reference quirk bit-for-bit.
    """
    m = (max_shift - base_shift) / (max_seq_len - base_seq_len)
    b = base_shift - m * base_seq_len
    return image_seq_len * m + b
