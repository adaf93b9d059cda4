"""Continuous-batching server example.

Requests submitted at different times share batched denoise forwards; a
request's lane retires (and its image decodes) the moment its own schedule
finishes, freeing the slot for the next queued prompt.
"""

from diffusion_rs_tpu import DiffusionGenerationParams, ModelSource, Pipeline
from diffusion_rs_tpu.serving import FluxServer


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("-m", "--model-id", required=True)
    ap.add_argument("--steps", type=int, default=4)
    ap.add_argument("--max-batch", type=int, default=4)
    args = ap.parse_args()

    pipe = Pipeline(ModelSource.from_model_id(args.model_id), silent=True)
    server = FluxServer(pipe._inner, max_batch=args.max_batch)
    try:
        prompts = [
            "a watercolor fox", "a neon city at night",
            "a bowl of ramen", "a paper crane", "a tide pool",
        ]
        futs = [
            server.submit(p, DiffusionGenerationParams(
                height=512, width=512, num_steps=args.steps,
                guidance_scale=0.0, seed=i,
            ))
            for i, p in enumerate(prompts)
        ]
        for p, f in zip(prompts, futs):
            img = f.result()
            print(f"{p!r}: {img.shape}")
        s = server.stats()
        print(f"occupancy {s['occupancy']:.0%}, "
              f"mean latency {s['mean_latency_s']:.2f}s, "
              f"{s['forwards']} batched forwards for {s['lane_steps']} lane-steps")
    finally:
        server.shutdown()
    # For an HTTP endpoint over the same server:
    #   from diffusion_rs_tpu.serving import serve_http
    #   serve_http(server, "0.0.0.0", 8000)   # POST /generate, GET /metrics
    # or: python -m diffusion_rs_tpu.cli -m <model> --serve --port 8000


if __name__ == "__main__":
    main()
