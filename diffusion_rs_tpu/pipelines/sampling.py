"""FLUX latent-space plumbing + the denoise loop.

Behavioral reference: diffusion_rs_core/src/pipelines/flux/sampling.rs
(noise shape, 2x2 patchify, 3-axis position ids, unpack) and
pipelines/sampling.rs (Euler flow-match update).

TPU design: the reference's Python-side ``for window in timesteps.windows(2)``
loop with a progress bar per step becomes ONE ``lax.scan`` over the sigma
windows inside a single jit graph — no host round-trip per step. The latent
carry is kept in f32 (the Euler accumulation is the only stateful numeric in
the loop; the model input is cast to the model dtype per step).

The reference's noise is unseeded ``Tensor::randn`` (sampling.rs:13); we take
an explicit PRNG key instead (SURVEY.md §7.3).
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp


def latent_hw(height: int, width: int) -> Tuple[int, int]:
    """Latent spatial dims: 2*ceil(px/16) (flux/sampling.rs:5-14)."""
    return (height + 15) // 16 * 2, (width + 15) // 16 * 2


def get_noise(key, num_samples: int, height: int, width: int, dtype=jnp.float32):
    h, w = latent_hw(height, width)
    return jax.random.normal(key, (num_samples, 16, h, w), dtype)


def pack_latents(img: jnp.ndarray) -> jnp.ndarray:
    """BCHW -> [B, (h/2)(w/2), C*4] 2x2 patchify (flux/sampling.rs:30-33)."""
    b, c, h, w = img.shape
    x = img.reshape(b, c, h // 2, 2, w // 2, 2)
    x = x.transpose(0, 2, 4, 1, 3, 5)  # b, h/2, w/2, c, ph, pw
    return x.reshape(b, h // 2 * (w // 2), c * 4)


def unpack_latents(x: jnp.ndarray, height: int, width: int) -> jnp.ndarray:
    """[B, hw, C*4] -> BCHW (flux/sampling.rs:61-68)."""
    b, _, cphpw = x.shape
    h = (height + 15) // 16
    w = (width + 15) // 16
    c = cphpw // 4
    x = x.reshape(b, h, w, c, 2, 2)
    x = x.transpose(0, 3, 1, 4, 2, 5)  # b, c, h, ph, w, pw
    return x.reshape(b, c, h * 2, w * 2)


def make_img_ids(bs: int, h2: int, w2: int) -> jnp.ndarray:
    """3-axis ids (0, row, col) per latent patch (flux/sampling.rs:35-46)."""
    rows = jax.lax.broadcasted_iota(jnp.float32, (h2, w2), 0)
    cols = jax.lax.broadcasted_iota(jnp.float32, (h2, w2), 1)
    zeros = jnp.zeros((h2, w2), jnp.float32)
    ids = jnp.stack([zeros, rows, cols], axis=-1).reshape(1, h2 * w2, 3)
    return jnp.broadcast_to(ids, (bs, h2 * w2, 3))


def make_txt_ids(bs: int, txt_len: int) -> jnp.ndarray:
    return jnp.zeros((bs, txt_len, 3), jnp.float32)


def denoise_scan(
    step_fn: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray],
    img: jnp.ndarray,
    sigmas: jnp.ndarray,
    inpaint=None,
    progress=None,
) -> jnp.ndarray:
    """Euler flow-match loop under lax.scan (pipelines/sampling.rs:25-48):
    per window (t_curr, t_prev): img += pred(img, t_curr) * (t_prev - t_curr).

    ``step_fn(img_f32, t_scalar) -> pred`` (the model call); ``sigmas`` has
    num_steps+1 entries. Carry is f32.

    ``inpaint``: optional ``(mask, init, noise)`` packed f32 arrays
    ([B,S,1-or-C], [B,S,C], [B,S,C]). After every Euler update the carry is
    blended ``mask*x + (1-mask)*(tp*noise + (1-tp)*init)`` — unmasked
    regions are pinned to the correctly-renoised init latent each step
    (diffusers FluxInpaintPipeline construction; at the final tp=0 they are
    exactly the init latent).
    """
    import os

    img = img.astype(jnp.float32)
    t_curr = sigmas[:-1]
    t_prev = sigmas[1:]
    n_steps = int(t_curr.shape[0])
    # Optional per-step progress (the reference renders a bar per denoise
    # step, pipelines/sampling.rs:37 — a host sync per step; off by default
    # because it breaks the zero-round-trip scan).
    # ``progress`` (pipeline option) wins; the env var is only the default.
    # NOTE: this resolves at TRACE time — callers must pass a value fixed at
    # construction (FluxPipeline.step_progress), not re-read env per call.
    report = (
        progress if progress is not None
        else bool(os.environ.get("DIFFUSION_RS_TPU_PROGRESS"))
    )

    def body(carry, xs):
        i, tc, tp = xs
        pred = step_fn(carry, tc)
        if report:
            jax.debug.callback(
                lambda i_, t_: print(f"denoise step {int(i_) + 1}/{n_steps} (t={float(t_):.3f})"),
                i, tc, ordered=True,
            )
        x = carry + pred.astype(jnp.float32) * (tp - tc)
        if inpaint is not None:
            mask, init, noise = inpaint
            renoised = tp * noise + (1.0 - tp) * init
            x = mask * x + (1.0 - mask) * renoised
        return x, None

    steps = jnp.arange(n_steps)
    out, _ = jax.lax.scan(body, img, (steps, t_curr, t_prev))
    return out
