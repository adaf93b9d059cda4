"""DDUF example (diffusion_rs_examples/examples/dduf/main.rs equivalent):
load a .dduf archive and generate with the README recipe defaults
(720x1280, 50 steps, guidance 3.5).

    python examples/dduf.py -f FLUX.1-dev-Q4-bnb.dduf --prompt "..."
"""

import argparse
import time

from diffusion_rs_tpu import DiffusionGenerationParams, ModelSource, Pipeline


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-f", "--file", required=True, help=".dduf archive")
    ap.add_argument("--prompt", default="Draw a pretty river")
    ap.add_argument("--num-steps", type=int, default=50)
    ap.add_argument("--scale", type=float, default=3.5)
    ap.add_argument("--height", type=int, default=720)
    ap.add_argument("--width", type=int, default=1280)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("-o", "--out", default="dduf_out.png")
    args = ap.parse_args()

    pipe = Pipeline(ModelSource.dduf(args.file))
    params = DiffusionGenerationParams(
        height=args.height, width=args.width,
        num_steps=args.num_steps, guidance_scale=args.scale, seed=args.seed,
    )
    t0 = time.time()
    img = pipe.forward_images([args.prompt], params)[0]
    print(f"Took: {time.time() - t0:.2f}s")
    img.save(args.out)
    print(f"Saved to {args.out}")


if __name__ == "__main__":
    main()
