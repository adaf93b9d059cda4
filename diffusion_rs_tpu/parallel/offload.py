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

    def __init__(self):
        self._host: dict = {}
        self._device: dict = {}
        self._target: dict = {}

    def register(self, name: str, params: Any):
        from jax.sharding import NamedSharding

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
        if name not in self._device:
            target = self._target.get(name, jax.devices()[0])
            self._device[name] = jax.device_put(self._host[name], target)
        return self._device[name]

    def release(self, name: str):
        self._device.pop(name, None)

    def ensure_resident(self, name: Optional[str] = None):
        if name is not None:
            return self.resident(name)
        return None
