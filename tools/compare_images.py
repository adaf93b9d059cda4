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


def lpips_or_none(a: np.ndarray, b: np.ndarray):
    try:
        import lpips  # type: ignore
        import torch

        net = lpips.LPIPS(net="alex")
        ta = torch.tensor(a.transpose(2, 0, 1)[None] / 127.5 - 1.0, dtype=torch.float32)
        tb = torch.tensor(b.transpose(2, 0, 1)[None] / 127.5 - 1.0, dtype=torch.float32)
        return float(net(ta, tb).item())
    except Exception:
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
