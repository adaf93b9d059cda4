"""img2img / inpainting / LoRA examples.

All three compose: a LoRA-styled pipeline can inpaint, serving lanes can
run img2img, etc.
"""

import numpy as np
from PIL import Image

from diffusion_rs_tpu import DiffusionGenerationParams, ModelSource, Pipeline


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("-m", "--model-id", required=True)
    ap.add_argument("--image", required=True, help="init image file")
    ap.add_argument("--lora", default=None, help="LoRA safetensors (optional)")
    ap.add_argument("--steps", type=int, default=28)
    args = ap.parse_args()

    pipe = Pipeline(
        ModelSource.from_model_id(args.model_id),
        silent=True,
        lora=args.lora,            # fused into dense weights; runtime
        lora_scale=1.0,            # low-rank term on quantized weights
    )
    init = Image.open(args.image)
    params = DiffusionGenerationParams(
        height=1024, width=1024, num_steps=args.steps, guidance_scale=3.5,
        seed=0,
    )

    # img2img: keep ~40% of the original structure
    img = pipe.img2img_images(["a watercolor painting"], params, init,
                              strength=0.6)[0]
    img.save("img2img.png")

    # inpainting: repaint the center square only
    mask = np.zeros((1024, 1024), np.uint8)
    mask[256:768, 256:768] = 255
    out = pipe.inpaint_images(["a fox sitting in the grass"], params, init,
                              mask)[0]
    out.save("inpaint.png")
    print("wrote img2img.png, inpaint.png")


if __name__ == "__main__":
    main()
