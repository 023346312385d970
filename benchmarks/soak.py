"""E27 (round 5): sustained-load soak at the serving population.

Every published throughput number is a 100-150-push scan; a capacity
claim for a *service* needs steady-state evidence (VERDICT r4 #8).  Two
complementary soaks:

* THIS script — the device-resident soak: dispatch single pushes
  back-to-back for SOAK_SECONDS at SOAK_STREAMS, forcing a tiny
  dependent readback per push.  Publishes p50/p95/p99 dispatch wall
  (relay RPC included — an upper bound), a scan-amortized device
  ms/push checkpoint every minute (the drift/memory-leak detector: a
  leaking loop slows down or OOMs; the state is donated every push so
  HBM must stay flat), and device memory stats where the backend
  exposes them.
* `examples/serve.py --seconds 600 --wire-int16 --probe-readback` — the
  full ingest->push->drain loop with real drop counters, at a
  population the relay's ~56 MB/s H2D can sustain (the 10k-stream chunk
  is ~32 MB int16 — a production PCIe host covers it 100x over;
  BASELINE.md transfer table).

Usage: python benchmarks/soak.py   [env: SOAK_STREAMS=10240
SOAK_SECONDS=600 SOAK_SCAN=100 SOAK_LAYOUT=scattered]
"""
import json
import os
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import numpy as np


def mem_stats(dev):
    try:
        ms = dev.memory_stats()
    except Exception:
        return None
    if not ms:
        return None
    return {k: ms[k] for k in ("bytes_in_use", "peak_bytes_in_use")
            if k in ms}


def main():
    import jax
    import jax.numpy as jnp

    from spectrogram_tpu.config import BENCH_CONFIG
    from spectrogram_tpu.models.spectrogram import SpectrogramPipeline

    s = int(os.environ.get("SOAK_STREAMS", "10240"))
    seconds = float(os.environ.get("SOAK_SECONDS", "600"))
    scan_len = int(os.environ.get("SOAK_SCAN", "100"))
    layout = os.environ.get("SOAK_LAYOUT", "scattered")

    pipeline = SpectrogramPipeline(
        BENCH_CONFIG, chunk_hops=1, store_ring=False, packed_output=True,
        precision_profile="fast",
    )
    rng = np.random.default_rng(0)
    chunks = [
        jnp.asarray(
            (rng.standard_normal((s, pipeline.chunk_size, 2)) * 0.1)
            .astype(np.float32))
        for _ in range(3)
    ]
    ids = (np.arange(s) % 19).astype(np.int32)
    state = pipeline.init_state(s)
    if layout == "scattered":
        state = pipeline.set_palette(state, ids)
    elif layout == "uniform":
        state = pipeline.set_palette(state, 1)

    def scan(state, ch):
        def body(st, _):
            st, rgba = pipeline.push_impl(st, ch)
            return st, rgba[:, 0, 0]
        return jax.lax.scan(body, state, None, length=scan_len)

    scan_fn = jax.jit(scan, donate_argnums=0)
    push = jax.jit(pipeline.push_impl, donate_argnums=0)

    dev = jax.devices()[0]
    t0 = time.perf_counter()
    state, rgba = push(state, chunks[0])
    np.asarray(rgba[0, 0])
    print(f"compile+warm push: {time.perf_counter()-t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    state, sums = scan_fn(state, chunks[0])
    np.asarray(sums[-1, :8])
    print(f"compile+warm scan: {time.perf_counter()-t0:.1f}s", flush=True)
    print(f"mem after warmup: {mem_stats(dev)}", flush=True)

    walls = []
    checkpoints = []
    pushes = 0
    start = time.perf_counter()
    next_ckpt = start + 60.0
    while time.perf_counter() - start < seconds:
        t0 = time.perf_counter()
        state, rgba = push(state, chunks[pushes % 3])
        np.asarray(rgba[0, 0])
        walls.append(time.perf_counter() - t0)
        pushes += 1
        if time.perf_counter() >= next_ckpt:
            t0 = time.perf_counter()
            state, sums = scan_fn(state, chunks[0])
            np.asarray(sums[-1, :8])
            dt = (time.perf_counter() - t0) / scan_len
            pushes += scan_len
            checkpoints.append(round(dt * 1e3, 3))
            print(
                f"t={time.perf_counter()-start:6.0f}s pushes={pushes} "
                f"scan-amortized {dt*1e3:.3f} ms/push  mem={mem_stats(dev)}",
                flush=True,
            )
            next_ckpt += 60.0

    w = np.sort(np.array(walls)) * 1e3
    result = {
        "metric": "soak",
        "streams": s,
        "layout": layout,
        "seconds": round(time.perf_counter() - start, 1),
        "pushes": pushes,
        "rows": pushes * s,
        "dispatch_wall_ms": {
            "p50": round(float(np.percentile(w, 50)), 2),
            "p95": round(float(np.percentile(w, 95)), 2),
            "p99": round(float(np.percentile(w, 99)), 2),
            "max": round(float(w[-1]), 2),
        },
        "scan_ms_per_push_checkpoints": checkpoints,
        "checkpoint_drift_pct": (
            round(100 * (checkpoints[-1] - checkpoints[0]) / checkpoints[0], 2)
            if len(checkpoints) >= 2 else None
        ),
        "mem_final": mem_stats(dev),
    }
    print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
