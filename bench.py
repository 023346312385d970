"""Benchmark: spectrogram rows/sec/chip at 4096-pt FFT x N streams.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...extras}

Geometry follows BASELINE.json's metric: window 2048 @ 48 kHz, zero-padded x2
-> 4096-point FFT, hop 800 -> 60 rows/s/stream (the north-star per-stream
rate).  vs_baseline = measured rows/s/chip / 600,000 (the north-star target:
10,000 streams x 60 rows/s on one v5e chip).

Measurement notes:
* Throughput is measured as N pushes inside ONE jitted lax.scan, timed
  end-to-end with a forced host materialization.  Per-call timing is not
  trustworthy in this environment: the dev harness tunnels the TPU through
  a relay where `block_until_ready` returns before execution completes and
  each dispatch costs 10-30 ms of RPC overhead.
* The forced materialization reads a TINY dependent slice of the checksum
  stack (`sums[-1, :8]`, 32 bytes), not the full [scan_len, S] array: the
  slice depends on the whole scan program (one XLA executable — no partial
  completion exists), so it forces identical device work, but it does not
  drag megabytes through the relay's ~50 MB/s D2H leg INSIDE the timed
  region.  The full-readback harness overstated ms/push by a pure
  transfer term that grew with S x scan_len — measured 0.68 ms/push at
  the 4096-stream headline and 3.60 ms/push at 24,576 streams
  (benchmarks/exp_readback_tax.py, interleaved A/B, same executable).
  Numbers recorded before 2026-08-19 include that harness tax.
* Latency is the wall time of one dispatched push with a forced
  materialization — i.e. what a live single-push server loop would see
  through this harness (upper bound; on-device time is total/N from the scan).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

import numpy as np

BASELINE_ROWS_PER_SEC = 600_000.0  # north star: 10k streams x 60 rows/s/chip


def main() -> None:
    import jax
    import jax.numpy as jnp

    from spectrogram_tpu.config import BENCH_CONFIG
    from spectrogram_tpu.models.spectrogram import SpectrogramPipeline

    n_streams = int(os.environ.get("BENCH_STREAMS", "4096"))
    chunk_hops = int(os.environ.get("BENCH_CHUNK_HOPS", "1"))
    # 150 scan iterations amortize the relay's ~45 ms/dispatch overhead to
    # ~0.3 ms/push (at 50 it was ~0.9 ms/push — a 10% understatement).
    scan_len = int(os.environ.get("BENCH_SCAN_LEN", "150"))
    trials = int(os.environ.get("BENCH_TRIALS", "5"))

    cfg = BENCH_CONFIG
    assert cfg.padded_size == 4096, cfg
    pipeline = SpectrogramPipeline(
        cfg,
        chunk_hops=chunk_hops,
        store_ring=False,
        colormap_backend=os.environ.get("BENCH_COLORMAP", "auto"),
        stft_backend=os.environ.get("BENCH_STFT", "auto"),
        # BENCH_STFT_PACKED: packed-complex STFT formulation (round-4
        # final default "auto" = on where the flat-2D orientation applies;
        # 0 pins split-real v4 for on-hardware A/Bs of the production push)
        stft_packed={"auto": "auto", "0": False, "1": True}[
            os.environ.get("BENCH_STFT_PACKED", "auto")
        ],
        packed_output=True,  # RGBA8888 i32 wire format (production config)
        # "fast" relaxes only the colormap resample matmul to bf16 (its
        # all-positive contraction bounds the error at ~0.4% relative — on
        # par with the reference's F16F16 texture); the FFT always runs
        # true-f32.  BENCH_PRECISION=exact for all-f32.
        precision_profile=os.environ.get("BENCH_PRECISION", "fast"),
        # BENCH_AUTOTUNE=1: resolve the FFT factorization + kernel block size
        # from the runtime tuner cache (utils/autotune.py) instead of the
        # static cost model.
        autotune=os.environ.get("BENCH_AUTOTUNE", "0") == "1",
        # BENCH_STATIC_PALETTE=<name|index>: bake one palette into the
        # colormap kernels (the single-tenant fast path; the headline
        # metric stays the per-row multi-palette configuration).
        static_palette=(
            int(sp) if sp.lstrip("-").isdigit() else sp
        ) if (sp := os.environ.get("BENCH_STATIC_PALETTE", "")) else None,
        # BENCH_FRAMING=allk|planes|auto (round-4 all-windows kernel knob)
        framing=os.environ.get("BENCH_FRAMING", "auto"),
        # BENCH_BLOCKWISE: per-block palette-uniformity colormap kernel —
        # "auto" (default, matches the library default: concrete layout
        # decides), "1" forced on, "0" forced off.  The headline stays
        # honest either way because BENCH_PALETTE_LAYOUT pins a scattered
        # layout (auto declines it).
        blockwise_palettes={"0": False, "1": True}.get(
            os.environ.get("BENCH_BLOCKWISE", "auto"), "auto"
        ),
        # BENCH_PALETTE_SORT: the round-4-late palette sort — scattered
        # per-stream layouts argsort at set_palette into the blockwise
        # kernel (sorted-carry streaming mode).  Default follows the
        # library default (ON, measured +13% at 10,240 scattered on v5e);
        # set 0 to measure the raw per-row scattered cost.  The 4096-
        # stream headline is identical either way: 19 palettes sort into
        # ~215-stream runs there and the blockwise economics gate refuses.
        palette_sort=os.environ.get("BENCH_PALETTE_SORT", "1") == "1",
        # BENCH_SORTED_OUTPUT=1: the serving contract where rows are
        # emitted in sorted stream order and the host drain reindexes via
        # output_perm(state) — deletes the device-side packed-row
        # unpermute (a [S, H] i32 take).  Off for the headline (external-
        # order output is the reference-parity contract).  Requires
        # palette_sort, so it silently follows BENCH_PALETTE_SORT=0.
        sorted_output=(
            os.environ.get("BENCH_SORTED_OUTPUT", "0") == "1"
            and os.environ.get("BENCH_PALETTE_SORT", "1") == "1"
        ),
        # BENCH_PRESORTED=1: the host-sorted drain contract (round 5) —
        # the chunk arrives with rows already in the carry's sorted order
        # (production: RingBank pop writes stream e into row
        # input_dest[e], free on the host) so the device-side per-push
        # chunk gather never exists.  The bench pre-permutes the constant
        # chunk once outside the timed scan (same bytes the drain would
        # deliver).  Requires palette_sort; follows BENCH_PALETTE_SORT=0.
        presorted_input=(
            os.environ.get("BENCH_PRESORTED", "0") == "1"
            and os.environ.get("BENCH_PALETTE_SORT", "1") == "1"
        ),
        # BENCH_I16=1: int16 sample planes end-to-end (round 5) — the
        # wire dtype stays int16 through the carry, framing, and kernel
        # operands (half the bytes on the kernel's measured DMA
        # bottleneck); bitwise vs the f32 path fed the same int16 chunks.
        i16_planes=os.environ.get("BENCH_I16", "0") == "1",
        # BENCH_UNPACK_SPLIT: bf16-split `prev` permutation dot in the
        # packed STFT kernel ("auto" = 3 wherever packed engages — BITWISE
        # equal to the HIGHEST dot at -4.3% standalone, exp_unpack_split;
        # 0 pins the plain HIGHEST dot; 2 = one fewer MXU pass at 4.7e-8
        # maxabs, opt-in).
        stft_unpack_split={"auto": "auto", "0": 0, "2": 2, "3": 3}[
            os.environ.get("BENCH_UNPACK_SPLIT", "auto")
        ],
    )

    rng = np.random.default_rng(0)
    # BENCH_PLANAR=1 feeds channels-planar [S, 2, T] chunks — the production
    # wire format (RingBank planar drains).  Measured: planar wins at 10k
    # streams (11.28 vs 11.90 ms/push) but loses at 4k (4.29 vs 4.05) — XLA
    # fuses the interleaved edge transpose better at the smaller batch, so
    # the default stays interleaved at the headline geometry.
    planar = os.environ.get("BENCH_PLANAR", "0") == "1"
    pcm = rng.standard_normal(
        (n_streams, 2, pipeline.chunk_size)
    ).astype(np.float32) * 0.1
    if pipeline.i16_planes:
        pcm = (pcm * 32767).astype(np.int16)
    chunk = jnp.asarray(pcm if planar else pcm.transpose(0, 2, 1).copy())
    push = pipeline.push_planar_impl if planar else pipeline.push_impl

    # --- throughput: scanned pushes, one dispatch ---
    def scan_pushes(state, chunk):
        def body(s, _):
            s, rgba = push(s, chunk)
            return s, rgba[:, 0, 0]  # tiny per-push checksum, keeps rgba live

        return jax.lax.scan(body, state, None, length=scan_len)

    # BENCH_UNIFORM_PALETTE=1: scalar set_palette -> the [1, R*4]
    # SMEM-scalar uniform colormap kernel (runtime-switchable single-
    # palette mode; the headline stays per-stream multi-tenant tables)
    uniform = os.environ.get("BENCH_UNIFORM_PALETTE", "0") == "1"
    # BENCH_PALETTE_LAYOUT (round 4 late): the per-stream headline now sets
    # an explicitly SCATTERED id layout so it keeps measuring true per-row
    # tables — blockwise_palettes="auto" (the new default) would otherwise
    # flip init_state's all-one-palette layout to the blockwise kernel and
    # quietly inflate the headline.  "clustered" = 128-stream palette
    # blocks (every colormap row block single-palette -> the auto blockwise
    # win); "default" = init_state's layout (all one palette -> blockwise
    # under auto).
    layout = os.environ.get("BENCH_PALETTE_LAYOUT", "scattered")

    def init_state():
        state = pipeline.init_state(n_streams)
        if uniform:
            return pipeline.set_palette(state, 1)
        n_p = len(pipeline.schemes)
        if layout == "scattered":
            ids = np.arange(n_streams, dtype=np.int32) % n_p
            state = pipeline.set_palette(state, ids)
        elif layout == "clustered":
            ids = ((np.arange(n_streams) // 128) % n_p).astype(np.int32)
            state = pipeline.set_palette(state, ids)
        elif layout != "default":
            raise SystemExit(f"unknown BENCH_PALETTE_LAYOUT {layout!r}")
        return state

    scan_fn = jax.jit(scan_pushes, donate_argnums=0)
    state = init_state()
    if pipeline.presorted_input:
        p_in = pipeline.input_perm(state)
        if p_in is not None:  # deliver what the host-sorted drain would
            chunk = jnp.asarray(np.asarray(chunk)[p_in])
    state, sums = scan_fn(state, chunk)  # compile + warmup
    np.asarray(sums)

    per_push = []
    for _ in range(trials):
        state = init_state()
        t0 = time.perf_counter()
        state, sums = scan_fn(state, chunk)
        # Forces completion through the relay: the slice depends on the
        # whole scan program; 32 bytes cross the wire instead of the full
        # [scan_len, S] stack (see the harness-tax note in the docstring).
        np.asarray(sums[-1, :8])
        per_push.append((time.perf_counter() - t0) / scan_len)
    dt = min(per_push)
    rows_per_sec = n_streams * chunk_hops / dt

    # --- latency: single dispatched push (harness upper bound) ---
    push_jit = pipeline.push_planar if planar else pipeline.push
    lat_state = init_state()
    lat_state, rgba = push_jit(lat_state, chunk)
    np.asarray(rgba[0, 0])
    lats = []
    for _ in range(10):
        t0 = time.perf_counter()
        lat_state, rgba = push_jit(lat_state, chunk)
        np.asarray(rgba[0, 0])
        lats.append(time.perf_counter() - t0)
    p50_latency = statistics.median(lats)

    print(
        json.dumps(
            {
                "metric": "spectrogram_rows_per_sec_per_chip",
                "value": round(rows_per_sec, 1),
                "unit": "rows/s (4096-pt FFT, STFT+colormap->RGBA, "
                f"{n_streams} streams, {pipeline.precision_profile} profile)",
                "vs_baseline": round(rows_per_sec / BASELINE_ROWS_PER_SEC, 4),
                "on_device_ms_per_push": round(dt * 1e3, 3),
                "p50_dispatch_latency_ms": round(p50_latency * 1e3, 3),
                "streams": n_streams,
                "chunk_hops": chunk_hops,
                "rows_per_stream_per_sec": round(cfg.rows_per_second, 2),
                "realtime_stream_capacity": round(rows_per_sec / cfg.rows_per_second),
                "device": str(jax.devices()[0]),
            }
        )
    )


if __name__ == "__main__":
    if "--smoke" in sys.argv[1:]:
        # one-command on-hardware regression gate: compile+run every pinned
        # geometry/kernel class (see spectrogram_tpu/smoke.py); exit code
        # red/green.  The throughput bench below is NOT run in smoke mode.
        from spectrogram_tpu.smoke import main as smoke_main

        sys.exit(smoke_main())
    main()
