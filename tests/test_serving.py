"""Serving layer: continuous batching must reproduce the sequential
pipeline's images exactly (per-lane math is batch-independent), while lanes
at DIFFERENT denoise steps share forwards."""

import numpy as np
import pytest

from diffusion_rs_tpu import DiffusionGenerationParams, ModelSource, Pipeline
from diffusion_rs_tpu.serving import FluxServer

from synth import write_checkpoint


@pytest.fixture(scope="module")
def pipe(tmp_path_factory):
    root = write_checkpoint(tmp_path_factory.mktemp("serve_ck"), seed=0)
    return Pipeline(ModelSource.from_model_id(str(root)), silent=True)


def _params(steps, seed):
    return DiffusionGenerationParams(
        height=64, width=64, num_steps=steps, guidance_scale=0.0, seed=seed
    )


def test_continuous_batching_matches_sequential(pipe):
    inner = pipe._inner
    server = FluxServer(inner, max_batch=4)
    try:
        # different step counts -> lanes finish at different times and the
        # freed lanes keep serving (the continuous part)
        reqs = [("a cat", _params(2, 1)), ("a dog", _params(4, 2)),
                ("a tree", _params(3, 3))]
        futs = [server.submit(p, gp) for p, gp in reqs]
        got = [f.result(timeout=600) for f in futs]
    finally:
        server.shutdown()
    for (prompt, gp), img in zip(reqs, got):
        want = inner.forward_arrays([prompt], gp)[0]
        diff = np.abs(img.astype(np.float32) - want.astype(np.float32))
        assert diff.mean() < 1.0 and diff.max() <= 16, (prompt, diff.mean(), diff.max())


def test_server_queues_beyond_batch(pipe):
    """More requests than lanes: the queue drains as lanes retire."""
    server = FluxServer(pipe._inner, max_batch=2)
    try:
        futs = [server.submit(f"req {i}", _params(2, 10 + i)) for i in range(5)]
        outs = [f.result(timeout=600) for f in futs]
    finally:
        server.shutdown()
    assert len(outs) == 5
    assert all(o.shape == (64, 64, 3) for o in outs)
    # different seeds -> different images
    assert (outs[0] != outs[1]).any()
