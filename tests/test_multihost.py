"""Multi-host tests: REAL multi-process jax.distributed over localhost
(2 processes x 4 virtual CPU devices = 8 global devices), exercising
init_multihost, the multi-slice mesh axis order (dp across processes),
per-host data feeding, and a cross-host psum — the full multihost bootstrap
the reference lacks entirely (SURVEY §2.8)."""

import socket
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]

WORKER = r"""
import os, sys
pid = int(sys.argv[1]); port = sys.argv[2]
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
import jax
jax.config.update("jax_platforms", "cpu")
from diffusion_rs_tpu.parallel import (
    init_multihost, local_batch_to_global, make_multislice_mesh,
)
assert init_multihost(f"localhost:{port}", num_processes=2, process_id=pid)
assert jax.process_count() == 2 and len(jax.devices()) == 8
mesh = make_multislice_mesh(sp=1, tp=4)  # dp=2 inferred, across processes
assert dict(mesh.shape) == {"dp": 2, "sp": 1, "tp": 4}
# dp axis must span processes: row 0 on proc 0, row 1 on proc 1
rows = mesh.devices.reshape(2, -1)
assert all(d.process_index == i for i in range(2) for d in rows[i])

# per-host data feeding: each process contributes its LOCAL batch half
import numpy as np
local = np.full((2, 4), pid, np.float32)  # global batch 4, 2 rows per host
from jax.sharding import PartitionSpec as P
g = local_batch_to_global(local, mesh, P("dp"))
assert g.shape == (4, 4)

# a cross-host collective: global sum over the dp-sharded batch
total = jax.jit(lambda a: a.sum())(g)
assert float(total) == (0 * 8 + 1 * 8), float(total)
print(f"proc {pid} OK")
"""


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_distributed(tmp_path):
    port = _free_port()
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", WORKER, str(pid), str(port)],
            cwd=str(REPO),
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append((p.returncode, out))
    for rc, out in outs:
        assert rc == 0, out[-2000:]
    assert "proc 0 OK" in outs[0][1]
    assert "proc 1 OK" in outs[1][1]
