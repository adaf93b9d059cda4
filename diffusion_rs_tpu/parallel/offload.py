"""Host-DRAM weight offloading.

Reference behavior (pipelines/mod.rs:72-78, pipelines/flux/mod.rs:231-325):
``Offloading::Full`` keeps T5 and FLUX weights in host RAM and swaps each
whole component onto the device only around its use.

TPU equivalent: weights live on the host (CPU backend arrays / numpy) and
are placed onto the TPU with ``jax.device_put`` before a component runs;
the denoise path additionally supports per-scan-block streaming (double
buffered) — see stream_blocks. Round-1 scope: component-level residency,
the same granularity as the reference.
"""

from __future__ import annotations

from typing import Any, Optional

import jax


class HostOffload:
    """Component-granularity offload manager.

    Components register their param trees; ``ensure_resident`` re-places them
    before a forward, and ``release`` drops the device copies (host copies
    are retained by the registry).

    Mesh-aware: params that arrive mesh-sharded (NamedSharding leaves)
    remember their shardings at registration and are restored to the SAME
    mesh placement, so ``Offloading.Full`` composes with tensor parallelism
    instead of silently collapsing the sharding onto device 0.
    """

    def __init__(self, only=None):
        """``only``: restrict offloading to these component names (e.g.
        ("t5", "clip") keeps the transformer resident and swaps only the
        encoders — finer policy than the reference's all-or-nothing Full)."""
        import threading

        self._host: dict = {}
        self._device: dict = {}
        self._target: dict = {}
        self._refs: dict = {}
        self._only = frozenset(only) if only is not None else None
        # Residency is refcounted under a lock so concurrent users (the
        # serving submit threads + scheduler/decode threads) can acquire the
        # same component without one's release evicting the other's copy
        # mid-use. The reference never needed this — its whole forward sits
        # behind one Mutex (pipelines/mod.rs:111,246).
        self._lock = threading.RLock()

    def manages(self, name: str) -> bool:
        return name in self._host

    def register(self, name: str, params: Any):
        from jax.sharding import NamedSharding

        if self._only is not None and name not in self._only:
            return

        leaves = jax.tree.leaves(params)
        if leaves and all(
            isinstance(getattr(a, "sharding", None), NamedSharding)
            for a in leaves
        ):
            self._target[name] = jax.tree.map(lambda a: a.sharding, params)
        # Keep the host copy pinned on the CPU backend.
        cpus = jax.devices("cpu")
        self._host[name] = jax.device_put(params, cpus[0]) if cpus else params

    def resident(self, name: str) -> Any:
        """Acquire a device copy (refcounted; pair with :meth:`release`)."""
        with self._lock:
            if name not in self._device:
                target = self._target.get(name, jax.devices()[0])
                self._device[name] = jax.device_put(self._host[name], target)
            self._refs[name] = self._refs.get(name, 0) + 1
            return self._device[name]

    def release(self, name: str):
        """Drop one reference; the device copy is evicted at refcount zero."""
        with self._lock:
            n = self._refs.get(name, 0) - 1
            if n <= 0:
                self._refs.pop(name, None)
                self._device.pop(name, None)
            else:
                self._refs[name] = n

    def ensure_resident(self, name: Optional[str] = None):
        if name is not None:
            return self.resident(name)
        return None
