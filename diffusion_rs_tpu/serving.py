"""Serving mode: request queue + CONTINUOUS BATCHING over the denoise loop.

The reference serializes generations behind a mutex
(diffusion_rs_core/src/pipelines/mod.rs:111,246 — Arc<Mutex<dyn
ModelPipeline>>); there is no server. This module adds the production
serving layer the TPU build is meant for.

Why continuous batching works for flow-matching diffusion: the MMDiT forward
already takes the timestep as a PER-ELEMENT vector ``t [B]``
(models/flux.py flux_forward), and the Euler update is per-element
(``img += pred * dt``). So requests that arrived at different times — and
therefore sit at different denoise steps — can share ONE batched forward:
each batch lane carries its own (latent, txt, y, t, dt). A lane finishes
when its sigma schedule is exhausted; the freed lane is refilled from the
queue on the next tick without waiting for the rest of the batch (the
"continuous" part — classic static batching would hold the whole batch until
its slowest member finishes).

Lanes are grouped by (latent_h2, latent_w2, txt_len) so shapes stay static
for jit; the step function compiles once per (B, shape-group). Empty lanes
are padded with lane 0's data and dt=0 (a no-op update), so the jitted step
never recompiles as occupancy fluctuates.
"""

from __future__ import annotations

import threading
import time
from concurrent.futures import Future
from dataclasses import dataclass, field
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .models.flux import compute_pe, flux_forward
from .pipelines.sampling import get_noise, make_img_ids, make_txt_ids, pack_latents
from .pipelines.scheduler import calculate_shift


@dataclass
class _Lane:
    """One in-flight request."""

    future: Future
    prompt: str
    params: object
    latent: jnp.ndarray            # [S_img, C] packed, f32
    txt: jnp.ndarray               # [T, D]
    y: jnp.ndarray                 # [Dp]
    guidance: float
    sigmas: np.ndarray             # remaining schedule (>= 2 entries)
    step: int = 0

    @property
    def done(self) -> bool:
        return self.step >= len(self.sigmas) - 1


@dataclass
class _Group:
    """Same-shape lanes that batch together."""

    h2: int
    w2: int
    txt_len: int
    pe: tuple
    lanes: List[_Lane] = field(default_factory=list)


class FluxServer:
    """Continuous-batching server over a loaded FluxPipeline.

    >>> server = FluxServer(pipe._inner, max_batch=4)
    >>> fut = server.submit("a cat", params)
    >>> image_array = fut.result()
    >>> server.shutdown()
    """

    def __init__(self, pipeline, max_batch: int = 4, poll_ms: float = 2.0):
        self.pipe = pipeline
        self.max_batch = max_batch
        self.poll_s = poll_ms / 1e3
        self._queue: List[_Lane] = []
        self._lock = threading.Lock()
        self._stop = threading.Event()
        self._step_jit = jax.jit(self._cb_step)
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    # -- request intake --------------------------------------------------------

    def submit(self, prompt: str, params) -> Future:
        """Enqueue one prompt; the Future resolves to a u8 HxWx3 array."""
        fut: Future = Future()
        p = self.pipe
        # encode on the submitting thread (jitted, batch-1 graph reused)
        t5_len = getattr(params, "max_sequence_length", None) or (
            512 if p.flux_cfg.guidance_embeds else 256
        )
        from .io.tokenizer import tokenize_and_pad

        t5_ids = tokenize_and_pad([prompt], p.t5_tokenizer, pad_to=t5_len)
        clip_ids = tokenize_and_pad([prompt], p.clip_tokenizer)[:, :77]
        txt, y = p._encode_jit(
            p._component("t5", p.t5_params),
            p._component("clip", p.clip_params),
            jnp.asarray(t5_ids), jnp.asarray(clip_ids),
        )
        mu = calculate_shift(
            ((params.height + 15) // 16) * ((params.width + 15) // 16),
            p.scheduler.base_image_seq_len, p.scheduler.max_image_seq_len,
            p.scheduler.base_shift, p.scheduler.max_shift,
        )
        sigmas = p.scheduler.timesteps(
            params.num_steps,
            mu=mu if p.scheduler.use_dynamic_shifting else None,
        )
        seed = params.seed if params.seed is not None else time.time_ns() % (1 << 31)
        noise = get_noise(jax.random.PRNGKey(seed), 1, params.height, params.width)
        lane = _Lane(
            future=fut, prompt=prompt, params=params,
            latent=pack_latents(noise.astype(jnp.float32))[0],
            txt=txt[0], y=y[0],
            guidance=float(params.guidance_scale),
            sigmas=np.asarray(sigmas, np.float32),
        )
        with self._lock:
            self._queue.append(lane)
        return lane.future

    def generate(self, prompts: List[str], params) -> List[np.ndarray]:
        futs = [self.submit(pr, params) for pr in prompts]
        return [f.result() for f in futs]

    def shutdown(self):
        self._stop.set()
        self._thread.join(timeout=60)

    # -- batched step ----------------------------------------------------------

    def _cb_step(self, flux_params, latents, txts, ys, ts, dts, gs, pe):
        """One continuous-batched Euler step: per-lane t and dt (dt=0 lanes
        are no-ops — used for padding)."""
        p = self.pipe
        dt_model = p.dtype
        pred = flux_forward(
            flux_params, p.flux_cfg, latents.astype(dt_model),
            txts, ts, ys,
            gs if p.flux_cfg.guidance_embeds else None, pe=pe,
        )
        return latents + pred.astype(jnp.float32) * dts[:, None, None]

    # -- scheduler loop --------------------------------------------------------

    def _groups(self) -> List[_Group]:
        groups = {}
        for lane in self._active:
            h2 = (lane.params.height + 15) // 16
            w2 = (lane.params.width + 15) // 16
            key = (h2, w2, lane.txt.shape[0])
            if key not in groups:
                pe = compute_pe(
                    self.pipe.flux_cfg,
                    make_txt_ids(1, lane.txt.shape[0]),
                    make_img_ids(1, h2, w2),
                )
                groups[key] = _Group(h2, w2, lane.txt.shape[0], pe)
            groups[key].lanes.append(lane)
        return list(groups.values())

    def _run(self):
        self._active: List[_Lane] = []
        p = self.pipe
        while not self._stop.is_set():
            with self._lock:
                while self._queue and len(self._active) < self.max_batch:
                    self._active.append(self._queue.pop(0))
            if not self._active:
                time.sleep(self.poll_s)
                continue
            for group in self._groups():
                lanes = group.lanes[: self.max_batch]
                b = len(lanes)
                latents = jnp.stack([ln.latent for ln in lanes])
                txts = jnp.stack([ln.txt for ln in lanes])
                ys = jnp.stack([ln.y for ln in lanes])
                ts = jnp.asarray([ln.sigmas[ln.step] for ln in lanes], jnp.float32)
                dts = jnp.asarray(
                    [ln.sigmas[ln.step + 1] - ln.sigmas[ln.step] for ln in lanes],
                    jnp.float32,
                )
                gs = jnp.asarray([ln.guidance for ln in lanes], jnp.float32)
                # pad to max_batch so occupancy changes don't recompile
                if b < self.max_batch:
                    padn = self.max_batch - b
                    latents = jnp.concatenate(
                        [latents, jnp.repeat(latents[:1], padn, 0)])
                    txts = jnp.concatenate([txts, jnp.repeat(txts[:1], padn, 0)])
                    ys = jnp.concatenate([ys, jnp.repeat(ys[:1], padn, 0)])
                    ts = jnp.concatenate([ts, jnp.repeat(ts[:1], padn)])
                    dts = jnp.concatenate([dts, jnp.zeros((padn,), jnp.float32)])
                    gs = jnp.concatenate([gs, jnp.repeat(gs[:1], padn)])
                out = self._step_jit(
                    p._component("flux", p.flux_params),
                    latents, txts, ys, ts, dts, gs, group.pe,
                )
                for i, ln in enumerate(lanes):
                    ln.latent = out[i]
                    ln.step += 1
            # retire finished lanes (decode individually — frees the lane
            # for the next queued request immediately)
            still = []
            for ln in self._active:
                if not ln.done:
                    still.append(ln)
                    continue
                try:
                    img = p._decode_jit(
                        p._component("vae", p.vae_params),
                        ln.latent[None],
                        height=ln.params.height, width=ln.params.width,
                    )
                    ln.future.set_result(np.asarray(jax.device_get(img))[0])
                except Exception as e:  # pragma: no cover
                    ln.future.set_exception(e)
            self._active = still
        # drain on shutdown
        for ln in self._active + self._queue:
            if not ln.future.done():
                ln.future.cancel()
