"""Overlap-efficiency evidence for the serving-latency claim (VERDICT r4
item 6): trace the depth-2 feeder loop and measure, FROM THE DEVICE
TIMELINE, how much device compute overlaps host<->device transfer activity
and what fraction of the loop the device sits idle.

Methodology: drive `DeviceFeeder` (the production async feed) for N pushes
under jax.profiler; parse the trace's complete events per lane; compute
  * wall span of the traced loop (first..last device-lane event)
  * union of compute intervals -> device busy / idle %
  * union of transfer-ish intervals (name heuristics) and their overlap
    with compute intervals -> % of transfer time hidden by compute
On the relay-tunneled dev chip the TRANSFERS are ~1000x production speed,
so idle % here is a harness artifact; the OVERLAP ratio (transfer time
during which the device also computes) is the composable, relay-valid
number: it shows the feeder actually runs legs in parallel.

Usage: python benchmarks/profile_serve_overlap.py [streams] [pushes]
"""
import glob
import gzip
import json
import os
import pathlib
import sys
from collections import defaultdict

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np


def union_len(intervals):
    if not intervals:
        return 0.0, []
    iv = sorted(intervals)
    merged = [list(iv[0])]
    for a, b in iv[1:]:
        if a <= merged[-1][1]:
            merged[-1][1] = max(merged[-1][1], b)
        else:
            merged.append([a, b])
    return sum(b - a for a, b in merged), merged


def overlap_len(m1, m2):
    i = j = 0
    tot = 0.0
    while i < len(m1) and j < len(m2):
        a = max(m1[i][0], m2[j][0])
        b = min(m1[i][1], m2[j][1])
        if b > a:
            tot += b - a
        if m1[i][1] < m2[j][1]:
            i += 1
        else:
            j += 1
    return tot


def main():
    import time

    import jax
    import jax.numpy as jnp

    from spectrogram_tpu.config import BENCH_CONFIG
    from spectrogram_tpu.io.feeder import ChunkPool, DeviceFeeder
    from spectrogram_tpu.models.spectrogram import SpectrogramPipeline

    n_streams = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    n_pushes = int(sys.argv[2]) if len(sys.argv) > 2 else 12
    pipeline = SpectrogramPipeline(
        BENCH_CONFIG, chunk_hops=1, store_ring=False, packed_output=True,
        precision_profile="fast",
    )
    rng = np.random.default_rng(0)
    chunks = [
        (rng.standard_normal((n_streams, 2, pipeline.chunk_size)) * 0.1
         ).astype(np.float32)
        for _ in range(3)
    ]

    # The composable overlap measurement (valid THROUGH the relay): the
    # identical loop at feeder depth=1 (serialized: each push's transfer +
    # compute + completion finishes before the next) vs depth=2 (the
    # production async pipeline).  The wall-time ratio is the measured
    # pipelining gain of the depth-2 feeder — whatever legs dominate.
    def run_loop(depth):
        feeder = DeviceFeeder(
            pipeline, pipeline.init_state(n_streams), depth=depth,
            planar=True, readback="probe", copy_chunks=False,
        )
        pool = ChunkPool.for_feeder(feeder, n_streams)
        for i in range(depth + 1):  # warm/compile
            buf = pool.next(); np.copyto(buf, chunks[i % 3]); feeder.push(buf)
        feeder.flush()
        t0 = time.perf_counter()
        for i in range(n_pushes):
            buf = pool.next(); np.copyto(buf, chunks[i % 3]); feeder.push(buf)
        feeder.flush()
        return (time.perf_counter() - t0) / n_pushes * 1e3

    d1 = min(run_loop(1) for _ in range(2))
    d2 = min(run_loop(2) for _ in range(2))
    print(f"depth=1 (serialized) : {d1:8.2f} ms/push")
    print(f"depth=2 (async feed) : {d2:8.2f} ms/push")
    print(f"pipelining gain      : {d1 / d2:8.2f}x "
          f"({(1 - d2 / d1) * 100:.0f}% of the serialized loop hidden)")

    # Two traced sections: the FEED direction (readback="probe": rows stay
    # on device, transfers are H2D chunks) and — round 5, VERDICT r4
    # missing #3 / weak #5 — the OUTPUT direction (readback="full": every
    # push's packed rows cross D2H inside the loop, the production drain).
    # The depth-2 feeder enqueues push i+1 before draining push i, so the
    # row readback of i should overlap the compute of i+1 on the device
    # timeline; the overlap ratio below is the claim's evidence.
    for label, readback in (("feed (H2D chunks)", "probe"),
                            ("drain (row D2H)", "full")):
        feeder = DeviceFeeder(
            pipeline, pipeline.init_state(n_streams), depth=2, planar=True,
            readback=readback, copy_chunks=False,
        )
        pool = ChunkPool.for_feeder(feeder, n_streams)
        # warm/compile outside the trace
        for i in range(3):
            buf = pool.next(); np.copyto(buf, chunks[i % 3]); feeder.push(buf)
        feeder.flush()

        log_dir = f"/tmp/sg_overlap_{n_streams}_{readback}"
        jax.profiler.start_trace(log_dir)
        for i in range(n_pushes):
            buf = pool.next(); np.copyto(buf, chunks[i % 3]); feeder.push(buf)
        feeder.flush()
        jax.profiler.stop_trace()
        print(f"\n==== direction: {label} ====")
        analyze(log_dir, n_streams, n_pushes)


def analyze(log_dir, n_streams, n_pushes):
    paths = glob.glob(f"{log_dir}/**/*.trace.json.gz", recursive=True)
    path = max(paths, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    pid_names = {
        e.get("pid"): e.get("args", {}).get("name", "")
        for e in events
        if e.get("ph") == "M" and e.get("name") == "process_name"
    }
    tid_names = {
        (e.get("pid"), e.get("tid")): e.get("args", {}).get("name", "")
        for e in events
        if e.get("ph") == "M" and e.get("name") == "thread_name"
    }
    lanes = defaultdict(list)
    for e in events:
        if e.get("ph") != "X":
            continue
        key = (pid_names.get(e.get("pid"), ""),
               tid_names.get((e.get("pid"), e.get("tid")), ""))
        t0 = e.get("ts", 0) / 1e3
        lanes[key].append((t0, t0 + e.get("dur", 0) / 1e3, e.get("name", "")))
    print("lanes seen:")
    for (p, t), evs in sorted(lanes.items(), key=lambda kv: -len(kv[1])):
        print(f"  [{len(evs):5d} ev] pid={p!r} tid={t!r} "
              f"e.g. {evs[0][2][:60]!r}")

    compute, transfer = [], []
    for (p, t), evs in lanes.items():
        pl_ = (p + " " + t).lower()
        if "tpu" not in pl_ and "device" not in pl_:
            continue
        for a, b, name in evs:
            nl = name.lower()
            if any(k in nl for k in ("transfer", "copy-start", "copy-done",
                                     "infeed", "outfeed", "h2d", "d2h",
                                     "buffer-transfer")):
                transfer.append((a, b))
            else:
                compute.append((a, b))
    cb, cm = union_len(compute)
    tb, tm = union_len(transfer)
    if compute:
        span = (max(b for _, b in compute + transfer)
                - min(a for a, _ in compute + transfer))
        ov = overlap_len(cm, tm)
        print(f"\npushes={n_pushes} streams={n_streams}")
        print(f"wall span          : {span:9.2f} ms")
        print(f"device compute busy: {cb:9.2f} ms ({100*cb/span:5.1f}% of span)")
        print(f"transfer activity  : {tb:9.2f} ms")
        if tb:
            print(f"transfer hidden by compute: {ov:9.2f} ms "
                  f"({100*ov/tb:5.1f}% of transfer time)")
        print(f"device idle        : {span-cb:9.2f} ms "
              f"({100*(span-cb)/span:5.1f}%) [relay-dominated here; see "
              f"module docstring]")
    else:
        print("no device compute events found — inspect lane names above")


if __name__ == "__main__":
    main()
