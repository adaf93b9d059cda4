#!/usr/bin/env python
"""Per-config synthetic golden images for the offline quality gate
(VERDICT r4 next #7).

One 256² golden per production config axis — schnell/dev pipeline style,
nf4/q8t exec formats, and the int8 attention variants — each generated
through the REAL user-facing Pipeline from the deterministic synthetic
checkpoint (tests/synth.py, seed 0). Because every config owns its golden,
the per-config floors don't have to absorb quantization noise (it is IN the
golden); they only absorb cross-version XLA numeric drift, so they can sit
far tighter than the old single-64²-golden gate (PSNR 30 → 34). The gate's
teeth are proved by a mutation test (tests/test_quality_gate.py): a 1-bit
codebook/kernel perturbation must fail the gate.

Regenerate after an INTENTIONAL numerics change:

    python tools/gen_goldens.py            # writes tests/goldens/*.png
    python tools/gen_goldens.py --check    # regenerate + compare only

Reference anchor: the reference pins quantized outputs against committed
goldens with fixed tolerances (core/tests/quantized_tests.rs:11-16); this
is the same idea at image level, per config.
"""

from __future__ import annotations

import argparse
import pathlib
import sys

import numpy as np

_REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(_REPO))
sys.path.insert(0, str(_REPO / "tests"))

GOLDEN_DIR = _REPO / "tests" / "goldens"

# name -> (checkpoint kwargs, Pipeline kwargs, env)
CONFIGS = {
    "schnell-dense-256": (dict(), dict(), dict()),
    "dev-dense-256": (dict(guidance=True, dynamic_shifting=True), dict(),
                      dict()),
    "schnell-nf4-256": (dict(quant="nf4"), dict(), dict()),
    "schnell-q8t-256": (dict(quant="nf4"), dict(isq="q8t"), dict()),
    # int8 attention (QK^T + P.V) through the interpret-mode flash kernel —
    # the opt-in DIFFUSION_RS_TPU_ATTN_S8/S8PV production path's numerics
    "schnell-q8t-s8attn-256": (
        dict(quant="nf4"), dict(isq="q8t"),
        dict(DIFFUSION_RS_TPU_FLASH="interpret",
             DIFFUSION_RS_TPU_ATTN_S8="1",
             DIFFUSION_RS_TPU_ATTN_S8PV="1"),
    ),
}

PROMPT = "a golden reference image"
SIZE = 256
STEPS = 4
SEED = 42


def generate(name: str, ck_root: pathlib.Path) -> np.ndarray:
    """Generate config ``name``'s image through the user-facing Pipeline.

    ``ck_root``: scratch directory for the synthetic checkpoints (they are
    deterministic; one per checkpoint-kwarg set)."""
    import os

    ck_kw, pipe_kw, env = CONFIGS[name]
    from synth import write_checkpoint

    from diffusion_rs_tpu import (
        DiffusionGenerationParams,
        ModelSource,
        Pipeline,
    )
    from diffusion_rs_tpu.ops import attention

    ck = write_checkpoint(
        ck_root / ("ck-" + "-".join(sorted(map(str, ck_kw.values()))) if ck_kw
                   else ck_root / "ck-base"),
        seed=0, **ck_kw,
    )
    old = {k: os.environ.get(k) for k in env}
    os.environ.update(env)
    # env-derived dispatch defaults are lru-cached per process
    attention._flash_mode.cache_clear()
    attention._s8_default.cache_clear()
    attention._s8_pv_default.cache_clear()
    try:
        pipe = Pipeline(ModelSource.from_model_id(str(ck)), silent=True,
                        **pipe_kw)
        params = DiffusionGenerationParams(
            height=SIZE, width=SIZE, num_steps=STEPS,
            guidance_scale=3.5 if ck_kw.get("guidance") else 0.0, seed=SEED,
        )
        return np.asarray(pipe.forward_images([PROMPT], params)[0])
    finally:
        for k, v in old.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v
        attention._flash_mode.cache_clear()
        attention._s8_default.cache_clear()
        attention._s8_pv_default.cache_clear()


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--check", action="store_true",
                    help="regenerate and report PSNR vs committed goldens "
                         "without writing")
    ap.add_argument("--only", default=None, help="single config name")
    args = ap.parse_args()

    import os
    import tempfile

    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax

    jax.config.update("jax_platforms", "cpu")
    from PIL import Image

    sys.path.insert(0, str(_REPO / "tools"))
    from compare_images import psnr, ssim

    GOLDEN_DIR.mkdir(exist_ok=True)
    names = [args.only] if args.only else list(CONFIGS)
    with tempfile.TemporaryDirectory() as td:
        for name in names:
            img = generate(name, pathlib.Path(td))
            out = GOLDEN_DIR / f"{name}.png"
            if args.check and out.exists():
                gold = np.asarray(Image.open(out).convert("RGB"))
                print(f"{name}: PSNR {psnr(img, gold):.2f} dB, "
                      f"SSIM {ssim(img, gold):.4f}")
            else:
                Image.fromarray(img).save(out)
                print(f"wrote {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
