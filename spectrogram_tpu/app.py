"""CLI app shell: render, live-stream, inspect.

The host-side equivalent of the reference's app layer (src/main.rs): where
the Rust builds a GTK window with device/palette dropdowns and a GL
visualizer, the TPU framework's surface is a CLI + Python API — inputs are
selected from the same kind of registry, palettes from the same 19-scheme
list, and output goes to PNG files (or a terminal live view) instead of a
GLArea.

    python -m spectrogram_tpu.app render input.wav out.png --palette Viridis
    python -m spectrogram_tpu.app render --source chirp out.png
    python -m spectrogram_tpu.app live --seconds 3 out.png   # streaming loop
    python -m spectrogram_tpu.app palettes                   # list schemes
    python -m spectrogram_tpu.app inputs                     # list devices
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np


def _build_source(args, sample_rate):
    from spectrogram_tpu.io import sources

    if args.source == "file":
        src = sources.WavSource(args.input)
        return src, src.sample_rate
    if args.source == "chirp":
        return sources.ChirpSource(sample_rate), sample_rate
    if args.source == "sine":
        return sources.SineSource(sample_rate, args.freq, args.freq * 1.5), sample_rate
    if args.source == "noise":
        return sources.NoiseSource(), sample_rate
    raise SystemExit(f"unknown source {args.source}")


def cmd_render(args) -> int:
    import jax.numpy as jnp

    from spectrogram_tpu.color.colorscheme import scheme_index
    from spectrogram_tpu.config import SpectrogramConfig
    from spectrogram_tpu.models.golden import GoldenSpectrogram
    from spectrogram_tpu.models.spectrogram import SpectrogramPipeline
    from spectrogram_tpu.utils.image import save_png

    source, rate = _build_source(args, args.sample_rate)
    cfg = SpectrogramConfig(
        sample_rate=rate,
        window_period=args.window,
        hop_period=args.hop,
        viewport_height=args.height,
    )
    if args.source == "file":
        pcm = source.read_all()
    else:
        pcm = source.next_block(int(args.seconds * rate))
    pid = scheme_index(args.palette)

    if args.golden:
        from spectrogram_tpu.color.colorscheme import DEFAULT_COLOR_SCHEMES

        g = GoldenSpectrogram(cfg, scheme=DEFAULT_COLOR_SCHEMES[pid])
        rgba = g.render(pcm)
        rgb = g.composite(rgba)
    else:
        pipeline = SpectrogramPipeline(cfg, store_ring=False)
        rgba = pipeline.process(jnp.asarray(pcm), palette_id=pid)
        rgb = np.asarray(
            pipeline.composite(rgba[None], jnp.asarray([pid]))
        )[0]
    save_png(args.output, rgb)
    print(f"wrote {args.output}: {rgb.shape[0]} rows x {rgb.shape[1]} px "
          f"({cfg.rows_per_second:.1f} rows/s geometry, palette {args.palette})")
    return 0


def cmd_live(args) -> int:
    """Streaming loop: source -> host ring -> batched pipeline -> PNG.

    The CLI face of the full production path (ring ingest, chunked pushes,
    latency tracking); writes the final viewport as an image.
    """
    import jax.numpy as jnp

    from spectrogram_tpu.color.colorscheme import scheme_index
    from spectrogram_tpu.config import SpectrogramConfig
    from spectrogram_tpu.io.registry import StreamBatch
    from spectrogram_tpu.models.spectrogram import SpectrogramPipeline
    from spectrogram_tpu.utils.image import save_png
    from spectrogram_tpu.utils.profiling import LatencyTracker

    rate = args.sample_rate
    cfg = SpectrogramConfig(
        sample_rate=rate,
        window_period=args.window,
        hop_period=args.hop,
        viewport_height=args.height,
    )
    pipeline = SpectrogramPipeline(cfg, chunk_hops=args.chunk_hops)
    pid = scheme_index(args.palette)
    batch = StreamBatch(args.streams, ring_capacity=1 << 16)

    from spectrogram_tpu.io import sources

    def attach(kind: str) -> None:
        batch.attach_all(
            lambda s: sources.ChirpSource(rate, f0=100.0 * (1 + s % 4))
            if kind == "chirp"
            else sources.SineSource(rate, 220.0 * (1 + s % 8), 330.0)
            if kind == "sine"
            else sources.NoiseSource()
        )

    attach(args.source)

    state = pipeline.init_state(args.streams, palette_id=pid)
    tracker = LatencyTracker()
    total_rows = 0
    t_end = time.time() + args.seconds

    if args.view:
        from spectrogram_tpu.color.colorscheme import DEFAULT_COLOR_SCHEMES
        from spectrogram_tpu.utils.terminal import TerminalViewer

        source_kinds = ["chirp", "sine", "noise"]
        src_i = source_kinds.index(args.source) if args.source in source_kinds else 0
        frame_period = 1.0 / args.fps
        with TerminalViewer() as tv:
            next_frame = time.time()
            while time.time() < t_end:
                batch.tick(pipeline.chunk_size)
                while batch.ready_chunks(pipeline.chunk_size) > 0:
                    chunk, _ = batch.pop_chunk(pipeline.chunk_size)
                    with tracker.measure():
                        state, rgba = pipeline.push(state, jnp.asarray(chunk))
                        np.asarray(rgba[0, 0, 0])
                    total_rows += args.streams * pipeline.chunk_hops
                for key in tv.keys():
                    if key in ("q", "\x03"):
                        t_end = 0.0
                    elif key in ("p", "P"):  # palette cycle: pure state update
                        step = 1 if key == "p" else -1
                        pid = (pid + step) % len(DEFAULT_COLOR_SCHEMES)
                        state = pipeline.set_palette(state, pid)
                    elif key == "s":  # source cycle mid-run
                        src_i = (src_i + 1) % len(source_kinds)
                        attach(source_kinds[src_i])
                if time.time() >= next_frame:
                    # stream 0's scrolling viewport, frequency axis vertical
                    vp = pipeline.render_viewport(state)[0]       # [R, H, 4]
                    rgb = np.asarray(
                        pipeline.composite(vp[None], state.palette_id[:1])
                    )[0]
                    img = rgb.transpose(1, 0, 2)[::-1]            # [H, R, 3]
                    tv.draw(
                        img,
                        status=(
                            f"palette {DEFAULT_COLOR_SCHEMES[pid].name}  "
                            f"source {source_kinds[src_i]}  "
                            f"{total_rows} rows  p/P palette  s source  q quit"
                        ),
                    )
                    next_frame = time.time() + frame_period
                time.sleep(0.001)
    else:
        while time.time() < t_end:
            batch.tick(pipeline.chunk_size)
            while batch.ready_chunks(pipeline.chunk_size) > 0:
                chunk, _ = batch.pop_chunk(pipeline.chunk_size)
                with tracker.measure():
                    state, rgba = pipeline.push(state, jnp.asarray(chunk))
                    np.asarray(rgba[0, 0, 0])
                total_rows += args.streams * pipeline.chunk_hops
    viewport = np.asarray(pipeline.render_viewport(state))[0]
    rgb = np.asarray(pipeline.composite(viewport[None][None], state.palette_id[:1]))
    save_png(args.output, np.asarray(rgb)[0, 0])
    print(
        f"streamed {total_rows} rows across {args.streams} streams; "
        f"latency {tracker.summary()}; dropped {batch.dropped_total} frames; "
        f"wrote {args.output}"
    )
    return 0


def cmd_bench(args) -> int:
    import os

    if args.streams:
        os.environ["BENCH_STREAMS"] = str(args.streams)
    import bench  # repo-root bench.py when run from a checkout

    bench.main()
    return 0


def cmd_palettes(_args) -> int:
    from spectrogram_tpu.color.colorscheme import DEFAULT_COLOR_SCHEMES

    for i, s in enumerate(DEFAULT_COLOR_SCHEMES):
        kind = "stereo" if s.is_stereo else "mono"
        print(f"{i:2d}  {s.name:32s} [{kind}]  bg={s.background_color()}")
    return 0


def cmd_inputs(_args) -> int:
    from spectrogram_tpu.io.registry import InputRegistry

    reg = InputRegistry()
    for i, d in enumerate(reg.inputs):
        print(f"{i:2d}  {d.name:40s} [{d.kind}] {d.sample_rate:.0f} Hz")
    return 0


def _positive_float(text: str) -> float:
    value = float(text)
    if value <= 0:
        raise argparse.ArgumentTypeError(f"must be > 0, got {text}")
    return value


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(prog="spectrogram_tpu")
    sub = parser.add_subparsers(dest="cmd", required=True)

    def common(p):
        p.add_argument("--palette", default="Magma")
        p.add_argument("--sample-rate", type=float, default=48_000.0, dest="sample_rate")
        p.add_argument("--window", type=float, default=0.05)
        p.add_argument("--hop", type=float, default=2.5 / 2048.0)
        p.add_argument("--height", type=int, default=1024)

    p_render = sub.add_parser("render", help="render PCM to a spectrogram PNG")
    p_render.add_argument("input", nargs="?", help="WAV file (with --source file)")
    p_render.add_argument("output")
    p_render.add_argument(
        "--source", default="file", choices=["file", "chirp", "sine", "noise"]
    )
    p_render.add_argument("--seconds", type=float, default=3.0)
    p_render.add_argument("--freq", type=float, default=440.0)
    p_render.add_argument(
        "--golden", action="store_true", help="use the CPU-path golden law"
    )
    common(p_render)
    p_render.set_defaults(fn=cmd_render)

    p_live = sub.add_parser("live", help="run the streaming pipeline")
    p_live.add_argument("output")
    p_live.add_argument(
        "--source", default="chirp", choices=["chirp", "sine", "noise"]
    )
    p_live.add_argument("--seconds", type=float, default=2.0)
    p_live.add_argument("--streams", type=int, default=4)
    p_live.add_argument("--chunk-hops", type=int, default=8, dest="chunk_hops")
    p_live.add_argument(
        "--view", action="store_true",
        help="live ANSI terminal viewer (p/P palette, s source, q quit)",
    )
    p_live.add_argument("--fps", type=_positive_float, default=20.0)
    common(p_live)
    p_live.set_defaults(fn=cmd_live)

    sub.add_parser("palettes", help="list color schemes").set_defaults(fn=cmd_palettes)
    sub.add_parser("inputs", help="list input devices/sources").set_defaults(fn=cmd_inputs)

    p_bench = sub.add_parser("bench", help="run the throughput benchmark")
    p_bench.add_argument("--streams", type=int, default=None)
    p_bench.set_defaults(fn=cmd_bench)

    args = parser.parse_args(argv)
    if args.cmd == "render" and args.source == "file" and not args.input:
        parser.error("render --source file requires an input WAV path")
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
