#!/usr/bin/env python
"""Turnkey real-checkpoint validation runbook (VERDICT r3 next #4).

One command for the first hub-connected host:

    python tools/validate_real.py --model black-forest-labs/FLUX.1-dev \\
        [--goldens DIR] [--out report.json] [--images-dir DIR] \\
        [--configs dev-1024,schnell-256] [--isq nf4]

chains everything the repo already has for real-weight readiness:

  1. source resolution  — local dir or hub snapshot (io/source.FileLoader,
     token via the usual TokenSource chain)
  2. key/shape audit    — every component's tensors vs the authoritative
     inventories (io/audit.py; quantized checkpoints audited at their
     LOGICAL shapes via quant_state/GGUF metadata)
  3. pipeline load      — the user-facing Pipeline facade, optional --isq
  4. generation         — the BASELINE.md config matrix (scaled by
     --synthetic for the offline dry-run), determinism re-check
  5. quality gate       — PSNR/SSIM (+ LPIPS when installed) against
     --goldens reference images (tools/compare_images.py), the
     BASELINE LPIPS <= 0.05 bar

and writes one JSON report. Exit code 0 only if every stage passed.

Offline dry-run (CI): `--model SYNTH --synthetic` builds the tiny synthetic
checkpoint from tests/synth.py and runs the same five stages end to end, so
the command itself is verified green before it ever sees real weights.

Reference anchor: diffusion_rs_cli/src/main.rs:57-144 (load-and-generate is
one command in the reference; validation is one command here).
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tools"))

# BASELINE.md config matrix -> generation parameters. Real sizes; the
# --synthetic dry-run scales every config down to the tiny checkpoint.
CONFIGS = {
    "schnell-256": dict(h=256, w=256, steps=4, guidance=0.0),
    "dev-1024": dict(h=1024, w=1024, steps=28, guidance=3.5),
    "dev-720x1280": dict(h=720, w=1280, steps=50, guidance=3.5),
    "schnell-1024-b8": dict(h=1024, w=1024, steps=4, guidance=0.0, batch=8),
    "dev-2048": dict(h=2048, w=2048, steps=28, guidance=3.5),
}
DEFAULT_CONFIGS = "schnell-256,dev-1024"

PSNR_FLOOR, SSIM_FLOOR, LPIPS_GATE = 30.0, 0.90, 0.05

_QUANT_COMPANIONS = (
    ".absmax", ".quant_map", ".nested_absmax", ".nested_quant_map", ".SCB",
)


def _logical_shapes(store) -> dict:
    """Key->LOGICAL tensor shape for audit: quantized entries report the
    shape they dequantize to (bnb quant_state JSON / GGUF metadata), and
    quantization companion tensors are folded into their weight."""
    import numpy as np

    out = {}
    keys = set(store.keys())
    for k in sorted(keys):
        if k.endswith(_QUANT_COMPANIONS) or ".quant_state." in k:
            continue
        if f"{k}.absmax" in keys:  # bnb 4-bit: logical shape from quant_state
            state_key = next(
                (s for s in keys if s.startswith(f"{k}.quant_state.")), None
            )
            if state_key is not None:
                state = json.loads(bytes(np.asarray(store.raw_entry(state_key))))
                out[k] = tuple(state["shape"])
                continue
        e = store.raw_entry(k)
        out[k] = tuple(e.shape)
    return out


def stage_audit(loader, report: dict) -> bool:
    """Audit each component's keys/shapes against io/audit.py inventories."""
    from diffusion_rs_tpu.io.audit import (
        audit_keys,
        expected_clip_keys,
        expected_flux_keys,
        expected_t5_keys,
        expected_vae_keys,
    )
    from diffusion_rs_tpu.models.clip import ClipTextConfig
    from diffusion_rs_tpu.models.flux import FluxConfig
    from diffusion_rs_tpu.models.t5 import T5Config
    from diffusion_rs_tpu.models.vae import VAEConfig
    from diffusion_rs_tpu.pipelines.loader import _component_store

    import jax.numpy as jnp

    comps = [
        ("transformer", FluxConfig, expected_flux_keys),
        ("vae", VAEConfig, expected_vae_keys),
        ("text_encoder_2", T5Config, expected_t5_keys),
        ("text_encoder", ClipTextConfig, expected_clip_keys),
    ]
    ok = True
    report["audit"] = {}
    for prefix, cfg_cls, expect in comps:
        try:
            cfg = cfg_cls.from_json(
                json.loads(loader.read_bytes(f"{prefix}/config.json"))
            )
            store = _component_store(loader, prefix, jnp.float32, silent=True)
            rep = audit_keys(_logical_shapes(store), expect(cfg))
            report["audit"][prefix] = {
                "ok": rep.ok,
                "missing": rep.missing[:20],
                "unexpected": rep.unexpected[:20],
                "shape_mismatch": [
                    [k, list(a), list(b)] for k, a, b in rep.shape_mismatch[:20]
                ],
            }
            print(f"  audit {prefix}: {rep.summary()}")
            ok &= rep.ok
        except Exception as e:  # noqa: BLE001 — report, don't crash the runbook
            report["audit"][prefix] = {"ok": False, "error": str(e)}
            print(f"  audit {prefix}: ERROR {e}")
            ok = False
    return ok


def stage_generate(pipe, configs, images_dir: Path, synthetic: bool,
                   report: dict) -> bool:
    from diffusion_rs_tpu import DiffusionGenerationParams

    import numpy as np

    ok = True
    report["generate"] = {}
    images_dir.mkdir(parents=True, exist_ok=True)
    prompt = "a photo of a red fox in the snow, detailed fur, golden hour"
    for name in configs:
        c = CONFIGS[name]
        h, w, steps = c["h"], c["w"], c["steps"]
        if synthetic:
            h, w, steps = 64, 64, 2
        batch = c.get("batch", 1)
        params = DiffusionGenerationParams(
            height=h, width=w, num_steps=steps,
            guidance_scale=c["guidance"], seed=42,
        )
        t0 = time.perf_counter()
        try:
            imgs = pipe.forward_images([prompt] * batch, params)
            dt = time.perf_counter() - t0
            # determinism re-check on the first config (same seed, same bytes)
            deterministic = None
            if name == configs[0]:
                imgs2 = pipe.forward_images([prompt] * batch, params)
                deterministic = bool(
                    np.array_equal(np.asarray(imgs[0]), np.asarray(imgs2[0]))
                )
                ok &= deterministic
            path = images_dir / f"{name}.png"
            imgs[0].save(path)
            report["generate"][name] = {
                "ok": True, "seconds": round(dt, 2),
                "image": str(path), "deterministic": deterministic,
            }
            print(f"  generate {name}: {dt:.1f}s -> {path}")
        except Exception as e:  # noqa: BLE001
            report["generate"][name] = {"ok": False, "error": str(e)[:500]}
            print(f"  generate {name}: ERROR {str(e)[:200]}")
            ok = False
    return ok


def stage_gate(goldens: Path, images_dir: Path, report: dict) -> bool:
    """Score generated vs golden reference images (BASELINE LPIPS gate)."""
    import numpy as np
    from PIL import Image

    from compare_images import lpips_or_none, psnr, ssim

    ok = True
    report["gate"] = {}
    refs = sorted(goldens.glob("*.png"))
    if not refs:
        report["gate"]["error"] = f"no *.png under {goldens}"
        return False
    for ref in refs:
        gen = images_dir / ref.name
        if not gen.exists():
            report["gate"][ref.name] = {"ok": False, "error": "not generated"}
            ok = False
            continue
        a = np.asarray(Image.open(gen).convert("RGB"))
        b = np.asarray(Image.open(ref).convert("RGB"))
        if a.shape != b.shape:
            report["gate"][ref.name] = {
                "ok": False, "error": f"shape {a.shape} vs {b.shape}"
            }
            ok = False
            continue
        p, s, lp = psnr(a, b), ssim(a, b), lpips_or_none(a, b)
        passed = (lp <= LPIPS_GATE) if lp is not None else (
            p >= PSNR_FLOOR and s >= SSIM_FLOOR
        )
        report["gate"][ref.name] = {
            "ok": bool(passed), "psnr_db": round(float(p), 2),
            "ssim": round(float(s), 4),
            "lpips": None if lp is None else round(float(lp), 4),
        }
        print(f"  gate {ref.name}: psnr {p:.1f} ssim {s:.3f} "
              f"lpips {lp if lp is not None else 'n/a'} -> "
              f"{'PASS' if passed else 'FAIL'}")
        ok &= bool(passed)
    return ok


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--model", required=True,
                    help="HF model id, local dir, or SYNTH (offline dry-run)")
    ap.add_argument("--synthetic", action="store_true",
                    help="tiny shapes (offline dry-run against tests/synth.py)")
    ap.add_argument("--configs", default=DEFAULT_CONFIGS,
                    help=f"comma list from {sorted(CONFIGS)}")
    ap.add_argument("--goldens", default=None,
                    help="dir of <config>.png reference images to gate against")
    ap.add_argument("--out", default="validate_report.json")
    ap.add_argument("--images-dir", default="validate_images")
    ap.add_argument("--isq", default=None, help="in-situ quantize (e.g. nf4, q8t)")
    ap.add_argument("--token", default=None, help="hub token (TokenSource syntax)")
    args = ap.parse_args()

    configs = [c.strip() for c in args.configs.split(",") if c.strip()]
    unknown = [c for c in configs if c not in CONFIGS]
    if unknown:
        ap.error(f"unknown configs {unknown}; choose from {sorted(CONFIGS)}")

    model = args.model
    if model == "SYNTH":
        sys.path.insert(0, str(REPO / "tests"))
        import tempfile

        from synth import write_checkpoint

        model = str(write_checkpoint(
            Path(tempfile.mkdtemp(prefix="validate_synth_")) / "ck", seed=0
        ))
        args.synthetic = True
        print(f"[validate] synthetic checkpoint at {model}")

    report = {"model": args.model, "resolved": model,
              "synthetic": args.synthetic, "configs": configs,
              "started_unix": time.time()}
    overall = True

    print("[validate] stage 1/4: source + key/shape audit")
    from diffusion_rs_tpu.io.source import FileLoader

    t0 = time.perf_counter()
    loader = FileLoader(model_id=model, token=args.token, silent=True)
    overall &= stage_audit(loader, report)
    report["audit_seconds"] = round(time.perf_counter() - t0, 1)

    print("[validate] stage 2/4: pipeline load")
    from diffusion_rs_tpu import ModelSource, Pipeline

    t0 = time.perf_counter()
    try:
        pipe = Pipeline(
            ModelSource.from_model_id(model), silent=True,
            token=args.token, isq=args.isq,
        )
        report["load"] = {"ok": True,
                          "seconds": round(time.perf_counter() - t0, 1)}
        print(f"  loaded in {report['load']['seconds']}s"
              + (f" (isq={args.isq})" if args.isq else ""))
    except Exception as e:  # noqa: BLE001
        report["load"] = {"ok": False, "error": str(e)[:500]}
        print(f"  load ERROR: {str(e)[:200]}")
        _write(args.out, report, ok=False)
        return 1

    print("[validate] stage 3/4: generation matrix")
    overall &= stage_generate(
        pipe, configs, Path(args.images_dir), args.synthetic, report
    )

    if args.goldens:
        print("[validate] stage 4/4: quality gate")
        overall &= stage_gate(Path(args.goldens), Path(args.images_dir), report)
    else:
        print("[validate] stage 4/4: quality gate SKIPPED (no --goldens; "
              "generated images saved for manual review / future goldens)")
        report["gate"] = {"skipped": "no --goldens dir provided"}

    _write(args.out, report, ok=overall)
    print(f"[validate] {'PASS' if overall else 'FAIL'} -> {args.out}")
    return 0 if overall else 1


def _write(path: str, report: dict, ok: bool):
    report["ok"] = ok
    Path(path).write_text(json.dumps(report, indent=2))


if __name__ == "__main__":
    sys.exit(main())
