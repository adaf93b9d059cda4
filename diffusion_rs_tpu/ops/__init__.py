"""Compute ops: the TPU equivalents of the reference's L0 kernels + L2 nn
layer library (SURVEY.md §2.1-2.3). XLA provides the dense op set; Pallas
kernels cover the two genuinely hot custom ops (flash SDPA, fused
dequant-matmul)."""

from .linear import Linear, linear, linear_grouped, make_linear  # noqa: F401
from .norms import layer_norm, rms_norm, group_norm  # noqa: F401
from .rope import rope_tables, apply_rope  # noqa: F401
from .attention import sdpa, sdpa_xla  # noqa: F401
from .qmatmul_pallas import quantized_matmul  # noqa: F401
from .flash_pallas import flash_attention  # noqa: F401
