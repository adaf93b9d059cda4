"""Persistent XLA compilation cache for cold-start latency.

The reference runs eager CUDA/Metal kernels and has no compile step; on TPU
every jitted stage (T5/CLIP encode, the denoise scan, VAE decode) is
XLA-compiled per shape, and a cold compile of the full FLUX step costs
20-40 s on v5e. JAX ships a persistent compilation cache keyed on the HLO,
compile options, and device topology — wiring it into the pipeline means a
serving-process restart, a new worker on the same pod, or the next CLI
invocation reuses the previous artifacts instead of recompiling every
stage. (Reference behavioral anchor: none — the reference's "warmup" cost
is CUDA context + cuBLASLt heuristics, paid per process with no persistence
either; this is TPU-native surface.)

Resolution order: explicit argument > ``DIFFUSION_RS_TPU_COMPILE_CACHE``
env var > disabled. The jax config is process-global, so the first enable
wins; a later call with a DIFFERENT directory logs a warning and keeps the
first (silently swapping directories mid-process would split artifacts
across two caches).
"""

from __future__ import annotations

import logging
import os
import threading
from typing import Optional

log = logging.getLogger("diffusion_rs_tpu")

_enabled_dir: Optional[str] = None
# FluxServer submits from arbitrary threads and Pipeline construction
# triggers the enable — the check-then-set on the process-global latch must
# be atomic or two threads could both pass the None check and issue
# conflicting jax.config.update calls (ADVICE r4).
_lock = threading.Lock()


def enable_compile_cache(cache_dir: Optional[str] = None) -> Optional[str]:
    """Enable JAX's persistent compilation cache at ``cache_dir``.

    Returns the absolute directory in effect, or None when disabled (no
    argument and no ``DIFFUSION_RS_TPU_COMPILE_CACHE`` env var). Safe to
    call multiple times; must be called before the first jit compilation
    to benefit it (later compilations still benefit).
    """
    global _enabled_dir
    d = cache_dir or os.environ.get("DIFFUSION_RS_TPU_COMPILE_CACHE")
    if not d:
        return _enabled_dir
    d = os.path.abspath(os.path.expanduser(d))
    with _lock:
        if _enabled_dir is not None:
            if d != _enabled_dir:
                log.warning(
                    "compile cache already enabled at %s; ignoring %s "
                    "(jax_compilation_cache_dir is process-global)",
                    _enabled_dir,
                    d,
                )
            return _enabled_dir
        import jax

        os.makedirs(d, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", d)
        # Cache every entry: the pipeline's stages are few and large, so
        # there is no small-entry churn to filter, and the tiny helper
        # graphs (pack/unpack, scheduler) are exactly what a restarting
        # server re-traces.
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
        _enabled_dir = d
        log.info("persistent XLA compilation cache: %s", d)
        return _enabled_dir
