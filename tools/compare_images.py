#!/usr/bin/env python
"""Image parity metrics (PSNR / SSIM) for comparing generations against
reference outputs.

The BASELINE quality gate is LPIPS <= 0.05 vs reference outputs; LPIPS needs
a pretrained VGG/AlexNet which cannot be fetched in this zero-egress
environment, so this tool provides PSNR + SSIM (pure numpy) as the offline
proxy, and will use the `lpips` package automatically when it is installed.

Usage: python tools/compare_images.py a.png b.png
"""

from __future__ import annotations

import sys

import numpy as np


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    a = a.astype(np.float64)
    b = b.astype(np.float64)
    mse = np.mean((a - b) ** 2)
    if mse == 0:
        return float("inf")
    return 10.0 * np.log10(255.0 ** 2 / mse)


def _gaussian_kernel(size=11, sigma=1.5):
    ax = np.arange(size) - size // 2
    g = np.exp(-(ax**2) / (2 * sigma**2))
    k = np.outer(g, g)
    return k / k.sum()


def ssim(a: np.ndarray, b: np.ndarray) -> float:
    """Mean SSIM over channels (Wang et al. 2004), valid-window convolution."""
    a = a.astype(np.float64)
    b = b.astype(np.float64)
    if a.ndim == 2:
        a = a[..., None]
        b = b[..., None]
    k = _gaussian_kernel()
    c1, c2 = (0.01 * 255) ** 2, (0.03 * 255) ** 2

    def filt(x):
        from numpy.lib.stride_tricks import sliding_window_view

        w = sliding_window_view(x, k.shape)  # [H', W', 11, 11]
        return np.einsum("hwij,ij->hw", w, k)

    vals = []
    for c in range(a.shape[2]):
        x, y = a[..., c], b[..., c]
        mx, my = filt(x), filt(y)
        mxx, myy, mxy = filt(x * x), filt(y * y), filt(x * y)
        vx = mxx - mx * mx
        vy = myy - my * my
        cxy = mxy - mx * my
        s = ((2 * mx * my + c1) * (2 * cxy + c2)) / (
            (mx**2 + my**2 + c1) * (vx + vy + c2)
        )
        vals.append(s.mean())
    return float(np.mean(vals))


# VGG16 feature config (torchvision layout): conv channel counts, 'M' = pool.
_VGG16_CFG = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
              512, 512, 512, "M", 512, 512, 512, "M"]
# LPIPS taps the activations AFTER relu1_2/2_2/3_3/4_3/5_3 — i.e. after the
# 2nd, 4th, 7th, 10th and 13th conv of the stack.
_LPIPS_TAPS = (2, 4, 7, 10, 13)
# input normalization from the LPIPS reference implementation
_LPIPS_SHIFT = (-0.030, -0.088, -0.188)
_LPIPS_SCALE = (0.458, 0.448, 0.450)


def _find_lpips_weights():
    """Locate local LPIPS weight files: a torchvision VGG16 state dict
    (vgg16*.pth) and the LPIPS linear-calibration state dict (vgg.pth, keys
    lin{0..4}.model.1.weight). Search order: DIFFUSION_RS_TPU_LPIPS_WEIGHTS
    (a directory), then the torch-hub checkpoint cache. Returns (vgg_path,
    lin_path) or None."""
    import os
    from pathlib import Path

    dirs = []
    env = os.environ.get("DIFFUSION_RS_TPU_LPIPS_WEIGHTS")
    if env:
        dirs.append(Path(env))
    hub = Path(os.environ.get("TORCH_HOME", Path.home() / ".cache" / "torch"))
    dirs.append(hub / "hub" / "checkpoints")
    for d in dirs:
        if not d.is_dir():
            continue
        vggs = sorted(d.glob("vgg16-*.pth")) or sorted(d.glob("vgg16.pth"))
        lins = [p for p in d.glob("*.pth") if p not in vggs]
        # the lpips lin file is conventionally named vgg.pth (lpips repo)
        lin = next((p for p in lins if p.name == "vgg.pth"), None) or (
            lins[0] if lins else None
        )
        if vggs and lin is not None:
            return vggs[0], lin
    return None


def _lpips_local(a: np.ndarray, b: np.ndarray, vgg_path, lin_path) -> float:
    """LPIPS (Zhang et al. 2018, VGG variant) computed directly in torch
    from LOCAL weight files — no `lpips`/`torchvision` package needed, so a
    host that has the weights on disk gets the real BASELINE gate even in a
    zero-egress environment (VERDICT r4 next #7)."""
    import torch
    import torch.nn.functional as F

    vgg = torch.load(vgg_path, map_location="cpu", weights_only=True)
    lin = torch.load(lin_path, map_location="cpu", weights_only=True)

    def feats(x: np.ndarray):
        t = torch.tensor(
            x.transpose(2, 0, 1)[None] / 127.5 - 1.0, dtype=torch.float32
        )
        t = (t - torch.tensor(_LPIPS_SHIFT).view(1, 3, 1, 1)) / torch.tensor(
            _LPIPS_SCALE
        ).view(1, 3, 1, 1)
        out, conv_i, li = [], 0, 0
        for c in _VGG16_CFG:
            if c == "M":
                t = F.max_pool2d(t, 2)
                continue
            w = vgg[f"features.{li}.weight"]
            bias = vgg[f"features.{li}.bias"]
            t = F.relu(F.conv2d(t, w, bias, padding=1))
            li += 2  # conv + relu in the torchvision features indexing
            conv_i += 1
            if conv_i in _LPIPS_TAPS:
                out.append(t)
            # account for the pool layer's index slot
            if conv_i in (2, 4, 7, 10):
                li += 1
        return out

    with torch.no_grad():
        fa, fb = feats(a), feats(b)
        total = 0.0
        for i, (x, y) in enumerate(zip(fa, fb)):
            x = x / (x.square().sum(1, keepdim=True).sqrt() + 1e-10)
            y = y / (y.square().sum(1, keepdim=True).sqrt() + 1e-10)
            w = lin[f"lin{i}.model.1.weight"]  # [1, C, 1, 1]
            d = F.conv2d((x - y).square(), w)
            total += float(d.mean())
    return total


def lpips_or_none(a: np.ndarray, b: np.ndarray):
    """LPIPS via the `lpips` package when installed, else via local weight
    files (see _find_lpips_weights), else None (PSNR/SSIM proxy)."""
    try:
        import lpips  # type: ignore
        import torch

        net = lpips.LPIPS(net="alex")
        ta = torch.tensor(a.transpose(2, 0, 1)[None] / 127.5 - 1.0, dtype=torch.float32)
        tb = torch.tensor(b.transpose(2, 0, 1)[None] / 127.5 - 1.0, dtype=torch.float32)
        return float(net(ta, tb).item())
    except Exception:
        pass
    found = _find_lpips_weights()
    if found is not None:
        try:
            return _lpips_local(a, b, *found)
        except Exception:
            return None
    return None


def main():
    from PIL import Image

    a = np.asarray(Image.open(sys.argv[1]).convert("RGB"))
    b = np.asarray(Image.open(sys.argv[2]).convert("RGB"))
    if a.shape != b.shape:
        print(f"shape mismatch: {a.shape} vs {b.shape}")
        return 1
    print(f"PSNR: {psnr(a, b):.2f} dB")
    print(f"SSIM: {ssim(a, b):.4f}")
    lp = lpips_or_none(a, b)
    if lp is not None:
        print(f"LPIPS: {lp:.4f} (gate: <= 0.05)")
    else:
        print("LPIPS: unavailable offline (install `lpips` to enable)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
