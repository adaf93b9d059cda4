"""Per-block weight streaming for FLUX (offload hard part, SURVEY §7.6).

The reference's ``Offloading::Full`` swaps WHOLE components between host and
device around each use (pipelines/flux/mod.rs:231-325). This module
implements the finer-grained TPU design: transformer weights stay in host
RAM; each block's params are ``jax.device_put`` (async H2D DMA) one block
AHEAD of compute, so the copy of block i+1 overlaps block i's matmuls —
double-buffered streaming. This is what makes the full-precision bf16 model
(24 GB > one chip's HBM) runnable on a single chip.

Block bodies are jitted once per config and reused for every block and every
denoise step.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from .flux import (
    FluxConfig,
    conditioning_vector,
    double_block,
    final_layer,
    single_block,
)
from ..ops import linear


@functools.lru_cache(maxsize=8)
def _jits(cfg: FluxConfig):
    def pre(pre_params, img, txt, t, y, guidance):
        img_h = linear(img, pre_params["img_in"])
        txt_h = linear(txt, pre_params["txt_in"])
        vec = conditioning_vector(pre_params, cfg, t, y, guidance, img.dtype)
        return img_h, txt_h, vec

    def dbl(bp, img_h, txt_h, vec, cos, sin):
        return double_block(bp, img_h, txt_h, vec, cos, sin, cfg)

    def sgl(bp, x, vec, cos, sin):
        return single_block(bp, x, vec, cos, sin, cfg)

    def fin(fp, x, vec, img0, t_curr, t_prev):
        pred = final_layer(fp, x, vec)
        return img0 + pred.astype(jnp.float32) * (t_prev - t_curr)

    return (jax.jit(pre), jax.jit(dbl), jax.jit(sgl), jax.jit(fin))


def _host_slices(stacked, n: int):
    """Split a stacked [L, ...] block tree into per-layer host trees."""
    return [jax.tree.map(lambda a: a[i], stacked) for i in range(n)]


class StreamedFlux:
    """Holds host-resident FLUX params and runs denoise steps with
    double-buffered per-block H2D streaming."""

    @classmethod
    def from_block_trees(cls, pre, final, doubles, singles, cfg: FluxConfig,
                         device=None):
        """Construct from per-block host trees directly (benchmarks reuse one
        random block for all layers to skip 24GB of host RNG)."""
        self = cls.__new__(cls)
        self.cfg = cfg
        self.device = device or jax.devices()[0]
        self.pre = pre
        self.final = final
        self.doubles = list(doubles)
        self.singles = list(singles)
        self.pre_dev = jax.device_put(self.pre, self.device)
        self.final_dev = jax.device_put(self.final, self.device)
        return self

    def __init__(self, params, cfg: FluxConfig, device=None):
        self.cfg = cfg
        self.device = device or jax.devices()[0]
        cpus = jax.devices("cpu")
        host = cpus[0] if cpus else None
        put = (lambda t: jax.device_put(t, host)) if host else (lambda t: t)
        self.pre = put({
            k: params[k]
            for k in ("img_in", "txt_in", "time_in", "vector_in", "guidance_in")
            if k in params
        })
        self.final = put(params["final"])
        self.doubles = [put(p) for p in _host_slices(params["double"], cfg.num_layers)]
        self.singles = [put(p) for p in _host_slices(params["single"], cfg.num_single_layers)]
        # small, always device-resident
        self.pre_dev = jax.device_put(self.pre, self.device)
        self.final_dev = jax.device_put(self.final, self.device)

    def step(self, img, txt, t_curr, t_prev, y, guidance, pe):
        """One Euler denoise step with streamed transformer blocks.

        img: packed latents f32 [B, S_img, C]; returns same (Euler-updated).
        """
        cfg = self.cfg
        pre_jit, dbl_jit, sgl_jit, fin_jit = _jits(cfg)
        cos, sin = pe
        bs = img.shape[0]
        t_vec = jnp.full((bs,), t_curr, jnp.float32)
        dt = txt.dtype
        img_h, txt_h, vec = pre_jit(
            self.pre_dev, img.astype(dt), txt, t_vec, y, guidance
        )

        dev = self.device
        nxt = jax.device_put(self.doubles[0], dev)
        for i in range(cfg.num_layers):
            cur = nxt
            if i + 1 < cfg.num_layers:
                nxt = jax.device_put(self.doubles[i + 1], dev)  # async prefetch
            else:
                nxt = jax.device_put(self.singles[0], dev)
            img_h, txt_h = dbl_jit(cur, img_h, txt_h, vec, cos, sin)
        x = jnp.concatenate([txt_h, img_h], axis=1)
        for i in range(cfg.num_single_layers):
            cur = nxt
            if i + 1 < cfg.num_single_layers:
                nxt = jax.device_put(self.singles[i + 1], dev)
            img_h_bp = cur
            x = sgl_jit(img_h_bp, x, vec, cos, sin)
        txt_len = txt.shape[1]
        return fin_jit(
            self.final_dev, x[:, txt_len:], vec, img,
            jnp.float32(t_curr), jnp.float32(t_prev),
        )

    def denoise(self, img0, txt, y, guidance, pe, sigmas) -> jnp.ndarray:
        """Full Euler loop (host-driven; one streamed pass per step)."""
        img = img0.astype(jnp.float32)
        sig = [float(s) for s in sigmas]
        for t_curr, t_prev in zip(sig[:-1], sig[1:]):
            img = self.step(img, txt, t_curr, t_prev, y, guidance, pe)
        return img
