"""Tracing/profiling hooks.

The reference instruments hot spots with `tracing` spans (flux-mod1/2,
flux-selfattn-qkv/fwd, flux-mlp, vae-attn/resnet/... — SURVEY.md §5). The
TPU equivalents are jax named scopes (visible in XLA HLO + jax.profiler
traces) and an optional jax.profiler trace context driven by
DIFFUSION_RS_TPU_TRACE_DIR.
"""

from __future__ import annotations

import contextlib
import logging
import os

import jax

logger = logging.getLogger("diffusion_rs_tpu")
_warned: set = set()


def warn_once(key: str, msg: str) -> None:
    """Log a WARNING the first time ``key`` fires (per process).

    Used for silent-performance-fallback telemetry (VERDICT r3 next #9):
    kernel paths that quietly degrade — ring attention replicating the
    sequence, quantized matmul routing to the XLA dequant path, VMEM-plan
    rejections — say so once at trace time instead of never."""
    if key in _warned:
        return
    _warned.add(key)
    logger.warning(msg)


def trace_span(name: str):
    """Named scope inside jit (shows up in profiler timelines and HLO
    metadata), usable as a context manager."""
    return jax.named_scope(name)


@contextlib.contextmanager
def maybe_profile(step_name: str = "generate"):
    """Wrap a host-side region in a jax.profiler trace when
    DIFFUSION_RS_TPU_TRACE_DIR is set."""
    trace_dir = os.environ.get("DIFFUSION_RS_TPU_TRACE_DIR")
    if not trace_dir:
        yield
        return
    with jax.profiler.trace(trace_dir):
        with jax.profiler.TraceAnnotation(step_name):
            yield
