"""Image-quality gate (BASELINE: LPIPS <= 0.05 vs reference outputs).

Offline plumbing for the gate, per-config (VERDICT r4 next #7): one
committed 256² golden PER production config axis (schnell/dev, nf4/q8t
exec, int8 attention), generated through the real Pipeline from the
deterministic synthetic checkpoint by tools/gen_goldens.py. Because each
config owns its golden, quantization noise is IN the golden and the floors
only absorb cross-version XLA numeric drift — so they sit at 42 dB / 0.99
instead of the old single-golden 30 dB / 0.90.

Calibration ladder (measured r5, this jax build):
* same-build regeneration: bit-exact (PSNR inf) — tools/gen_goldens.py --check
* 1-bit decode-LUT index error (nf4 entries 6/7 swapped): 36.9 dB / 0.9895
  -> CAUGHT by the gate (the mutation test below proves it stays caught)
* one-bf16-ulp global dequant scale error (x(1+1/128)): 51.2 dB -> below
  image-gate granularity; that class is owned by the kernel parity bands
  in tests/test_ops.py (budget 2e-2), not by an image gate.

Real-checkpoint path: set DIFFUSION_RS_TPU_GOLDEN_DIR to a directory of
(prompt.txt, golden.png, generated.png) triples produced from the actual
FLUX weights and the same gate code scores them; LPIPS activates when the
`lpips` package + weights are present locally (zero-egress environments
can't fetch the VGG weights, so PSNR/SSIM are the offline proxy).
"""

import os
import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))
from compare_images import lpips_or_none, psnr, ssim  # noqa: E402
from gen_goldens import CONFIGS, GOLDEN_DIR, generate  # noqa: E402

PSNR_FLOOR = 42.0
SSIM_FLOOR = 0.99
LPIPS_GATE = 0.05  # BASELINE gate, applied when lpips is installed


def _metrics(a: np.ndarray, b: np.ndarray):
    return psnr(a, b), ssim(a, b), lpips_or_none(a, b)


def _golden(name: str) -> np.ndarray:
    from PIL import Image

    return np.asarray(Image.open(GOLDEN_DIR / f"{name}.png").convert("RGB"))


@pytest.mark.parametrize("name", sorted(CONFIGS))
def test_golden_config_gate(name, tmp_path):
    img = generate(name, tmp_path)
    gold = _golden(name)
    assert img.shape == gold.shape
    p, s, lp = _metrics(img, gold)
    assert p >= PSNR_FLOOR, f"{name}: PSNR {p:.2f} dB below gate {PSNR_FLOOR}"
    assert s >= SSIM_FLOOR, f"{name}: SSIM {s:.4f} below gate {SSIM_FLOOR}"
    if lp is not None:
        assert lp <= LPIPS_GATE, f"{name}: LPIPS {lp:.4f} above {LPIPS_GATE}"


def test_gate_catches_one_bit_lut_regression(tmp_path, monkeypatch):
    """The gate must actually gate at kernel granularity: a 1-bit index
    error in the nf4 decode LUT (entries 6/7 swapped — the kind of bug a
    packing/indexing change introduces) must FAIL the per-config gate.
    Measured 36.9 dB / 0.9895 vs floors 42 / 0.99."""
    import dataclasses

    import jax.numpy as jnp

    import diffusion_rs_tpu.quant.qtensor as qt_mod

    lin_mod = sys.modules["diffusion_rs_tpu.ops.linear"]
    orig = qt_mod.dequantize
    perm = jnp.asarray([0, 1, 2, 3, 4, 5, 7, 6, 8, 9, 10, 11, 12, 13, 14, 15])

    def mutated(qt, d):
        if qt.codebook is not None:
            qt = dataclasses.replace(qt, codebook=qt.codebook[perm])
        return orig(qt, d)

    monkeypatch.setattr(lin_mod, "dequantize", mutated)
    img = generate("schnell-nf4-256", tmp_path)
    gold = _golden("schnell-nf4-256")
    p, s, _ = _metrics(img, gold)
    assert p < PSNR_FLOOR, f"gate missed the LUT regression (PSNR {p:.2f})"
    assert s < SSIM_FLOOR, f"gate missed the LUT regression (SSIM {s:.4f})"


def test_gate_fails_on_garbage():
    """Comparing a golden against noise fails every metric (the
    'failing-threshold test exists' requirement)."""
    gold = _golden("schnell-dense-256")
    noise = np.random.default_rng(0).integers(
        0, 256, gold.shape, dtype=np.uint8
    )
    p, s, _ = _metrics(noise, gold)
    assert p < PSNR_FLOOR
    assert s < SSIM_FLOOR


def test_lpips_local_weights_activate(tmp_path, monkeypatch):
    """LPIPS auto-activates from LOCAL weight files (VERDICT r4 next #7) —
    no lpips/torchvision package needed. Synthetic random weights in the
    torchvision/lpips state-dict layout prove the code path: identical
    images score exactly 0, different images score > 0. (Real calibration
    of the <= 0.05 gate needs the real VGG weights — hub egress.)"""
    import torch

    from compare_images import lpips_or_none

    cfg = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
           512, 512, 512, "M", 512, 512, 512, "M"]
    g = torch.Generator().manual_seed(0)
    vgg, li, cin = {}, 0, 3
    taps = []
    conv_i = 0
    for c in cfg:
        if c == "M":
            continue
        vgg[f"features.{li}.weight"] = torch.randn(
            (c, cin, 3, 3), generator=g) * 0.05
        vgg[f"features.{li}.bias"] = torch.zeros(c)
        li += 2
        conv_i += 1
        if conv_i in (2, 4, 7, 10, 13):
            taps.append(c)
        if conv_i in (2, 4, 7, 10):
            li += 1
        cin = c
    lin = {
        f"lin{i}.model.1.weight": torch.rand((1, c, 1, 1), generator=g)
        for i, c in enumerate(taps)
    }
    torch.save(vgg, tmp_path / "vgg16-397923af.pth")
    torch.save(lin, tmp_path / "vgg.pth")
    monkeypatch.setenv("DIFFUSION_RS_TPU_LPIPS_WEIGHTS", str(tmp_path))

    rng = np.random.default_rng(1)
    a = rng.integers(0, 256, (64, 64, 3), dtype=np.uint8)
    b = rng.integers(0, 256, (64, 64, 3), dtype=np.uint8)
    same = lpips_or_none(a, a.copy())
    diff = lpips_or_none(a, b)
    assert same == 0.0, same
    assert diff is not None and diff > 0.0, diff


def test_real_golden_dir_gate():
    """Real-checkpoint gate: scores every (x.png, x.ref.png) pair under
    DIFFUSION_RS_TPU_GOLDEN_DIR. Skipped unless the dir is provided (needs
    hub access to produce)."""
    d = os.environ.get("DIFFUSION_RS_TPU_GOLDEN_DIR")
    if not d:
        pytest.skip("set DIFFUSION_RS_TPU_GOLDEN_DIR for the real gate")
    from PIL import Image

    pairs = sorted(Path(d).glob("*.ref.png"))
    assert pairs, f"no *.ref.png under {d}"
    for ref in pairs:
        gen = ref.with_name(ref.name.replace(".ref.png", ".png"))
        a = np.asarray(Image.open(gen).convert("RGB"))
        b = np.asarray(Image.open(ref).convert("RGB"))
        p, s, lp = _metrics(a, b)
        if lp is not None:
            assert lp <= LPIPS_GATE, (ref.name, lp)
        else:
            # real-weight floors: the BASELINE gate is LPIPS; PSNR/SSIM
            # proxy floors stay at the r1-r4 levels for real checkpoints
            assert p >= 30.0 and s >= 0.90, (ref.name, p, s)
