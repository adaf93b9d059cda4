"""FLUX.1 example with dev/schnell presets.

Mirrors diffusion_rs_examples/examples/flux/main.rs:55-79: schnell = 4
steps / guidance 0.0, dev = 50 steps / guidance 3.5; prints wall-clock.

    python examples/flux.py --which schnell -m <model-id-or-dir>
"""

import argparse
import time

from diffusion_rs_tpu import DiffusionGenerationParams, ModelSource, Pipeline


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--which", choices=["dev", "schnell"], default="schnell")
    ap.add_argument("-m", "--model-id", required=True)
    ap.add_argument("--prompt", default="A vivid watercolor painting of a lighthouse at dawn")
    ap.add_argument("--height", type=int, default=720)
    ap.add_argument("--width", type=int, default=1280)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("-o", "--out", default="flux_out.png")
    args = ap.parse_args()

    num_steps, scale = (50, 3.5) if args.which == "dev" else (4, 0.0)
    pipe = Pipeline(ModelSource.from_model_id(args.model_id))
    params = DiffusionGenerationParams(
        height=args.height, width=args.width,
        num_steps=num_steps, guidance_scale=scale, seed=args.seed,
    )
    t0 = time.time()
    img = pipe.forward_images([args.prompt], params)[0]
    print(f"Took: {time.time() - t0:.2f}s")
    img.save(args.out)
    print(f"Saved to {args.out}")


if __name__ == "__main__":
    main()
