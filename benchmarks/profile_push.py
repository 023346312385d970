"""Op-level decomposition of one push on the real TPU.

Traces a scan of pushes with jax.profiler, parses the trace events, and
prints per-op device time — the authoritative breakdown (per-call host
timings are fiction through the relay; see CLAUDE.md).

Usage: python benchmarks/profile_push.py [streams] [precision] [backend]
Env:   PROFILE_SCAN_LEN (default 20); PROFILE_PLANAR=1 feeds channels-planar
       [S, 2, T] chunks (push_planar_impl, the production wire format).
"""

import gzip
import glob
import json
import os
import pathlib
import sys
from collections import defaultdict

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np


def trace_scan(fn, state, chunk, scan_len, log_dir):
    import jax

    def scan_pushes(state, chunk):
        def body(s, _):
            s, rgba = fn(s, chunk)
            return s, rgba[:, 0, 0]

        return jax.lax.scan(body, state, None, length=scan_len)

    scan_fn = jax.jit(scan_pushes)
    state2, sums = scan_fn(state, chunk)  # compile outside the trace
    np.asarray(sums)
    jax.profiler.start_trace(log_dir)
    _, sums = scan_fn(state, chunk)
    np.asarray(sums)
    jax.profiler.stop_trace()


def parse_trace(log_dir, scan_len):
    paths = glob.glob(f"{log_dir}/**/*.trace.json.gz", recursive=True)
    if not paths:
        raise FileNotFoundError(f"no trace under {log_dir}")
    path = max(paths, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    # Device-lane complete events: pid/tid lanes whose names mention TPU/XLA ops.
    op_total = defaultdict(float)
    op_count = defaultdict(int)
    pid_names = {
        e.get("pid"): e.get("args", {}).get("name", "")
        for e in events
        if e.get("ph") == "M" and e.get("name") == "process_name"
    }
    for e in events:
        if e.get("ph") != "X":
            continue
        pname = pid_names.get(e.get("pid"), "")
        if "TPU" not in pname and "/device" not in pname.lower():
            continue
        name = e.get("name", "")
        dur = e.get("dur", 0) / 1e3  # us -> ms
        op_total[name] += dur
        op_count[name] += 1
    return op_total, op_count


def main():
    import jax
    import jax.numpy as jnp

    from spectrogram_tpu.config import BENCH_CONFIG
    from spectrogram_tpu.models.spectrogram import SpectrogramPipeline

    n_streams = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    precision = sys.argv[2] if len(sys.argv) > 2 else "fast"
    backend = sys.argv[3] if len(sys.argv) > 3 else "auto"
    scan_len = int(os.environ.get("PROFILE_SCAN_LEN", "20"))

    pipeline = SpectrogramPipeline(
        BENCH_CONFIG,
        chunk_hops=1,
        store_ring=False,
        packed_output=True,
        precision_profile=precision,
        stft_backend=backend,
        # PROFILE_STATIC_PALETTE=<name|index>: profile the single-palette
        # baked-LUT configuration
        static_palette=(
            int(sp) if sp.lstrip("-").isdigit() else sp
        ) if (sp := os.environ.get("PROFILE_STATIC_PALETTE", "")) else None,
        # round-5 serving modes: PROFILE_I16=1 (int16 sample planes),
        # PROFILE_PRESORTED=1 (host-sorted drain contract)
        i16_planes=os.environ.get("PROFILE_I16", "0") == "1",
        presorted_input=os.environ.get("PROFILE_PRESORTED", "0") == "1",
    )
    print(
        f"streams={n_streams} precision={precision} fused={pipeline.fused_chain} "
        f"banded={pipeline.cmap_segments_full is not None}",
        flush=True,
    )
    rng = np.random.default_rng(0)
    planar = os.environ.get("PROFILE_PLANAR", "0") == "1"
    pcm = rng.standard_normal(
        (n_streams, 2, pipeline.chunk_size)
    ).astype(np.float32) * 0.1
    if pipeline.i16_planes:
        pcm = (pcm * 32767).astype(np.int16)
    chunk = jnp.asarray(pcm if planar else pcm.transpose(0, 2, 1).copy())
    push = pipeline.push_planar_impl if planar else pipeline.push_impl
    state = pipeline.init_state(n_streams)
    if os.environ.get("PROFILE_UNIFORM", "0") == "1":
        # scalar set_palette -> the SMEM-scalar uniform colormap kernel
        state = pipeline.set_palette(state, 1)
    elif os.environ.get("PROFILE_PALETTE_LAYOUT", "") == "scattered":
        # the official-bench scattered 19-palette layout: per-row tables
        # at <= 10,240 flat populations (palette_sort engages block-
        # relative there), the GLOBAL sort + blockwise kernel at
        # stream-blocked populations (S >= 12,288)
        state = pipeline.set_palette(
            state, (np.arange(n_streams) % 19).astype(np.int32)
        )
        print(
            "layout=scattered sorted="
            f"{pipeline._state_perm(state) is not None} "
            f"global={pipeline._tables_perm_global(state.tables)}",
            flush=True,
        )
    log_dir = f"/tmp/sg_trace_{n_streams}_{precision}" + ("_pl" if planar else "")
    trace_scan(push, state, chunk, scan_len, log_dir)
    op_total, op_count = parse_trace(log_dir, scan_len)

    total = sum(op_total.values())
    print(f"device total: {total:.2f} ms over {scan_len} pushes "
          f"= {total/scan_len:.3f} ms/push", flush=True)
    rows = sorted(op_total.items(), key=lambda kv: -kv[1])
    for name, ms in rows[:25]:
        print(f"  {ms/scan_len:8.3f} ms/push  x{op_count[name]//scan_len:<3d} {name[:110]}")


if __name__ == "__main__":
    main()
