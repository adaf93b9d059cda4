"""CLI front-end test (non-interactive path) against a synthetic checkpoint,
mirroring the reference binary's flags (diffusion_rs_cli/src/main.rs:30-55)."""

from pathlib import Path

import pytest

from synth import write_checkpoint


def test_cli_noninteractive(tmp_path, capsys):
    root = write_checkpoint(tmp_path / "ck", seed=0)
    out = tmp_path / "img.png"
    from diffusion_rs_tpu.cli import main

    rc = main([
        "--model-id", str(root),
        "--num-steps", "2",
        "--scale", "0.0",
        "--height", "64", "--width", "64",
        "--seed", "1",
        "--silent",
        "--prompt", "a photo of a cat",
        "-o", str(out),
    ])
    assert rc == 0
    assert out.exists()
    from PIL import Image

    assert Image.open(out).size == (64, 64)


def test_cli_requires_source():
    from diffusion_rs_tpu.cli import main

    with pytest.raises(SystemExit):
        main(["--num-steps", "2"])
