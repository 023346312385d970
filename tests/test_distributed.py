"""Multi-process distributed path: 2 simulated hosts x 4 virtual CPU devices.

Fulfills SURVEY §2's comm-backend row (`jax.distributed` + collectives):
each subprocess initializes the distributed runtime, builds a process-
spanning mesh, ingests its own host-local stream shard through a RingBank16,
and runs one shard_map step whose psum crosses the process boundary (gloo).
"""

import os
import pathlib
import socket
import subprocess
import sys

import numpy as np
import pytest

from spectrogram_tpu.parallel import distributed as dist

REPO = pathlib.Path(__file__).resolve().parent.parent
WORKER = REPO / "tests" / "dist_worker.py"


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_mesh_end_to_end():
    port = _free_port()
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env.pop("JAX_PLATFORMS", None)
    env["PYTHONPATH"] = str(REPO)
    procs = [
        subprocess.Popen(
            [sys.executable, str(WORKER), str(pid), "2", str(port)],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            env=env,
            cwd=str(REPO),
        )
        for pid in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=300)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out[-4000:]}"
        assert f"DIST_OK pid={pid}" in out, out[-2000:]
    # Shard ranges are complementary halves.
    assert "range=(0,8)" in outs[0] and "range=(8,16)" in outs[1]


def test_local_stream_range_single_process():
    """In a single-process session the local range is the whole batch, and
    non-divisible stream counts are rejected loudly."""
    import jax

    mesh = dist.global_mesh()
    n_dev = len(list(mesh.devices.flat))
    lo, hi = dist.local_stream_range(mesh, 2 * n_dev)
    assert (lo, hi) == (0, 2 * n_dev)
    with pytest.raises(ValueError, match="divisible"):
        dist.local_stream_range(mesh, 2 * n_dev + 1)


def test_make_global_chunk_single_process():
    import jax

    mesh = dist.global_mesh()
    n_dev = len(list(mesh.devices.flat))
    n = 2 * n_dev
    local = np.arange(n * 3 * 2, dtype=np.float32).reshape(n, 3, 2)
    arr = dist.make_global_chunk(mesh, local, n)
    assert arr.shape == (n, 3, 2)
    np.testing.assert_array_equal(np.asarray(arr), local)


def test_host_shard_ingest_single_process(rng):
    """HostShardIngest drains the local bank into a mesh-sharded global
    chunk (single-process: the local shard is the whole batch)."""
    import jax

    from spectrogram_tpu.io import ring as ring_mod

    if not ring_mod.native_available():
        pytest.skip("native ring library unavailable")
    mesh = dist.global_mesh()
    n_dev = len(list(mesh.devices.flat))
    n = 2 * n_dev
    ingest = dist.HostShardIngest(mesh, n, chunk_size=64, capacity=256)
    assert ingest.local_streams == n
    pcm = rng.integers(-20000, 20000, (n, 64, 2)).astype(np.int16)
    for s in range(n):
        ingest.bank.push(s, pcm[s])
    chunk = ingest.drain()
    assert chunk.shape == (n, 64, 2)
    np.testing.assert_allclose(
        np.asarray(chunk), pcm.astype(np.float32) / 32768.0
    )
    # underrun after drain: zero-fill, no crash
    chunk2 = ingest.drain()
    np.testing.assert_array_equal(np.asarray(chunk2), 0.0)
    m = ingest.metrics()
    assert m["streams"] == (0, n) and m["dropped"] == 0
