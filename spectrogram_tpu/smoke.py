"""One-command on-hardware regression gate: `python -m spectrogram_tpu.smoke`.

Compiles AND RUNS every pinned geometry/kernel class of the production
pipeline on the CURRENT default backend (the real TPU chip in deployment;
CPU interpret under tests) and exits non-zero on any failure.

Why this exists (round-3 lesson, CLAUDE.md): Mosaic layout/lowering
failures — e.g. the dT stage-2 'unsupported shape cast' on n2 % 128 != 0
plans — are STRUCTURALLY invisible to the test suite, because interpret
mode checks numerics, not compilability.  That failure reached hardware
first via examples/demo.py, found by a human.  This module is the machine
that remembers: one command, every kernel-shape class, green/red.

Classes pinned here (each exercises a distinct compile path):
  flip          — n2 % 128 == 0 plan, dT stage-2 orientation, k>1
                  window-plane framing (bench geometry)
  bufk          — k>1 element-offset buf framing (aligned-hop geometry:
                  hop_rows % 8 == 0)
  lane_pad      — n2 % 128 != 0 plan via zero-padded stage-1 constants +
                  padded-layout colormap handoff (the REFERENCE-native
                  2400/4800 geometry, fft.rs:33,44)
  small_flip    — low-latency 512/1024 plan (small-block shapes, ts=64)
  static        — static_palette colormap (LUT baked as scalars)
  uniform       — scalar set_palette -> SMEM-scalar uniform-table kernel
  generic       — user-defined FactoredScheme registry (two-table kernel)
  transposed    — transposed-carry state format (4D kernel operand)
  tsplit        — split-state k=1 framing (boundary-split dots, in-kernel
                  unaligned static lane-dim carry stores)
  k1            — chunk_hops=1 (channel planes ARE the window operands);
                  packed-complex formulation (the round-4-final default)
  packed_off    — split-real v4 on the same plan (stft_packed=False):
                  the fallback orientation keeps compiling
  blockwise_auto — blockwise_palettes="auto": clustered layout takes the
                  scalar-prefetch blockwise kernel (marker present),
                  scattered stays per-row; bitwise vs blockwise=False
  palette_sort  — sorted-carry streaming mode: scattered layout argsorted
                  at set_palette, permuted-chunk push through the
                  blockwise kernel, unpermuted packed rows; bitwise vs
                  the per-row pipeline
  global_sort   — GLOBAL palette sort under stream blocking (length-4
                  tables tuple): chunk permuted above the block slicing,
                  blocks run blockwise on contiguous sorted slices;
                  bitwise vs the flat per-row pipeline
  viewport      — ring render + GL-law width rescale matmul
  xla_parity    — classes 'flip' and 'lane_pad' vs the XLA-composed
                  backends on the same chunk (<= 1 u8)

Wall budget: first run compiles everything (~2-4 min on the relay-tunneled
dev chip, less on a local chip); re-runs hit the jit cache in seconds.
"""

from __future__ import annotations

import sys
import time
import traceback

import numpy as np


def _mk_chunk(rng, s, pipeline):
    return rng.standard_normal((s, pipeline.chunk_size, 2)).astype(np.float32) * 0.2


def _n_streams(want: int) -> int:
    """Stream count per class: `want` on hardware; tiny under CPU interpret
    (the CPU run only checks smoke's own plumbing — interpret mode at
    hardware batch sizes takes minutes and proves nothing extra)."""
    import jax

    return want if jax.default_backend() in ("tpu", "axon") else 4


def _push_twice(pipeline, s_streams, rng, palette_ids=None):
    """Two pushes; returns host rows of the second (state advance + output
    both exercised; the second push catches donation/aliasing bugs)."""
    import jax.numpy as jnp

    s_streams = _n_streams(s_streams)
    state = pipeline.init_state(s_streams)
    if palette_ids is not None and pipeline.static_table is None:
        state = pipeline.set_palette(
            state, jnp.asarray(np.resize(palette_ids, s_streams))
        )
    out = None
    for _ in range(2):
        chunk = jnp.asarray(_mk_chunk(rng, s_streams, pipeline))
        state, out = pipeline.push(state, chunk)
    rows = np.asarray(out)
    if rows.dtype == np.int32:
        rows = rows.view(np.uint8)
    assert np.isfinite(rows.astype(np.float32)).all(), "non-finite pixels"
    assert rows.any(), "all-zero output"
    return state, rows




def _pl(cfg, **kw):
    """Pipeline forced onto the Pallas kernel paths: interpret mode off-TPU
    (so the suite can exercise smoke's logic on CPU), REAL Mosaic compiles
    on hardware — which is the entire point of this gate."""
    import jax

    from spectrogram_tpu.models.spectrogram import SpectrogramPipeline

    interp = jax.default_backend() not in ("tpu", "axon")
    kw.setdefault("stft_backend", "pallas")
    kw.setdefault("colormap_backend", "pallas")
    kw.setdefault("kernel_interpret", interp)
    return SpectrogramPipeline(cfg, **kw)

def _cfg_bench():
    from spectrogram_tpu.config import BENCH_CONFIG

    return BENCH_CONFIG


def _cfg_reference():
    from spectrogram_tpu.config import SpectrogramConfig

    return SpectrogramConfig(sample_rate=48000.0, window_period=0.05,
                             viewport_height=512)


def _cfg_lowlat():
    from spectrogram_tpu.config import SpectrogramConfig

    return SpectrogramConfig(sample_rate=48000.0, window_period=512 / 48000.0,
                             hop_period=128 / 48000.0, viewport_height=256)


def class_flip(rng):
    from spectrogram_tpu.ops.pallas import stft_kernel as sk

    cfg = _cfg_bench()
    p = _pl(cfg, chunk_hops=8, store_ring=False,
            packed_output=True, precision_profile="fast")
    assert p.fused_chain and sk.flip_supported(p.fft_plan), (
        "bench plan lost the flip path"
    )
    assert p.allk_framing, "bench k=8 lost the all-windows framing kernel"
    assert p.stft_packed, "bench plan lost the packed-complex default"
    assert p.stft_unpack_split == 3, (
        "packed kernel lost the bf16-split unpack default"
    )
    _, rows = _push_twice(p, 256, rng, palette_ids=np.arange(256) % 19)
    return p, rows


def class_bufk(rng):
    """k>1 element-offset buf framing needs hop_rows % 8 == 0 — an
    aligned-hop geometry (the bench hop 800 -> hop_rows 25 does NOT
    qualify; it takes the window-plane path, covered by class_flip)."""
    from spectrogram_tpu.config import SpectrogramConfig
    from spectrogram_tpu.ops.pallas import stft_kernel as sk

    cfg = SpectrogramConfig(
        sample_rate=48000.0,
        window_period=2048 / 48000.0,
        hop_period=1024 / 48000.0,
        viewport_height=1024,
    )
    # framing="planes" routes the aligned-hop geometry through the
    # element-offset buf kernel (auto would pick the round-4 allk kernel,
    # which class_flip covers)
    p = _pl(cfg, chunk_hops=4, store_ring=False, packed_output=True,
            framing="planes")
    assert sk.buf_framing_supported(cfg, 4, p.fft_plan), (
        "aligned-hop geometry lost k>1 buf framing"
    )
    _push_twice(p, 256, rng)


def class_lane_pad(rng):
    cfg = _cfg_reference()
    p = _pl(cfg, chunk_hops=8, store_ring=False,
            packed_output=True, precision_profile="fast")
    assert p.fused_chain and p.stft_lane_pad, (
        "reference 2400/4800 geometry lost the padded-lane flip"
    )
    assert p.stft_packed, "2400/4800 lost the packed-complex default"
    _, rows = _push_twice(p, 256, rng, palette_ids=np.arange(256) % 19)
    return p, rows


def class_small_flip(rng):
    p = _pl(_cfg_lowlat(), chunk_hops=8, store_ring=False,
            packed_output=True)
    assert p.fused_chain
    _push_twice(p, 256, rng)


def class_static(rng):
    p = _pl(_cfg_bench(), chunk_hops=8, store_ring=False,
            packed_output=True, static_palette="Magma")
    _push_twice(p, 256, rng)


def class_uniform(rng):
    """Scalar set_palette -> [1, R*4] SMEM-scalar table kernel (round 4:
    faster than the static bake AND runtime-switchable)."""
    import jax.numpy as jnp

    p = _pl(_cfg_bench(), chunk_hops=8, store_ring=False, packed_output=True)
    s = _n_streams(256)
    state = p.set_palette(p.init_state(s), 2)
    assert state.tables[0].shape[0] == 1, "scalar set_palette lost uniform mode"
    out = None
    for _ in range(2):
        chunk = jnp.asarray(_mk_chunk(rng, s, p))
        state, out = p.push(state, chunk)
    rows = np.asarray(out).view(np.uint8)
    assert rows.any() and np.isfinite(rows.astype(np.float32)).all()


def class_generic(rng):
    from spectrogram_tpu.color.colorscheme import (
        DEFAULT_COLOR_SCHEMES, FactoredScheme,
    )

    res = 32
    ramp = np.linspace(0.0, 1.0, res, dtype=np.float32)
    u = np.stack([ramp, ramp**2, np.sqrt(ramp), ramp], axis=1)
    v = np.stack([1 - 0.3 * ramp, np.ones(res, np.float32),
                  0.5 + 0.5 * ramp, np.ones(res, np.float32)], axis=1)
    custom = FactoredScheme("smoke-custom", u, v, background=(10, 10, 10))
    schemes = (custom,) + tuple(DEFAULT_COLOR_SCHEMES[:3])
    p = _pl(_cfg_bench(), chunk_hops=8, store_ring=False,
            packed_output=True, schemes=schemes)
    assert p.generic_tables is not None, "custom scheme failed to route generic"
    _push_twice(p, 256, rng, palette_ids=np.arange(256) % len(schemes))


def class_transposed(rng):
    from spectrogram_tpu.ops.pallas import stft_kernel as sk

    cfg = _cfg_bench()
    plan = sk.make_plan(cfg)
    if not sk.carry_transposed_supported(cfg, plan):
        raise AssertionError("bench geometry lost transposed-carry support")
    p = _pl(cfg, chunk_hops=1, store_ring=False,
            packed_output=True, transposed_carry=True)
    _push_twice(p, 256, rng)


def class_tsplit(rng):
    """Split-state k=1 framing (round-4-late measured negative, kept
    opt-in): carry state + hop chunk as separate kernel operands, next
    carry emitted in-kernel via unaligned static lane-dim stores — a
    distinct Mosaic lowering class (boundary-split accumulating dots)."""
    from spectrogram_tpu.ops.pallas import stft_kernel as sk

    cfg = _cfg_bench()
    plan = sk.make_plan(cfg)
    assert sk.tsplit_supported(cfg, 1, plan), (
        "bench geometry lost tsplit framing support"
    )
    p = _pl(cfg, chunk_hops=1, store_ring=False,
            packed_output=True, framing="tsplit")
    assert p.tsplit_framing
    _push_twice(p, 256, rng)


def class_k1(rng):
    p = _pl(_cfg_bench(), chunk_hops=1, store_ring=False,
            packed_output=True)
    assert p.stft_packed, "bench k=1 lost the packed-complex default"
    assert p.stft_unpack_split == 3, (
        "packed kernel lost the bf16-split unpack default"
    )
    _push_twice(p, 256, rng)


def class_packed_off(rng):
    """Split-real v4 on the bench plan (stft_packed=False): packed-complex
    is the default wherever the flat-2D orientation applies (round 4
    final), but the split-real formulation stays reachable (knob + any
    plan without the flat-2D orientation) and must keep compiling."""
    p = _pl(_cfg_bench(), chunk_hops=1, store_ring=False,
            packed_output=True, stft_packed=False)
    assert not p.stft_packed
    _push_twice(p, 256, rng)


def class_i16(rng):
    """int16 sample planes (round 5, i16_planes=True): the carry/framing/
    kernel operands stay in the wire dtype, the kernel casts in-VMEM with
    the 2^-15 scale folded into Hann.  Must compile the int16-operand
    Mosaic kernel AND match the f32 pipeline fed the same int16 chunks
    BITWISE."""
    import jax.numpy as jnp

    s = _n_streams(256)
    p16 = _pl(_cfg_bench(), chunk_hops=1, store_ring=False,
              packed_output=True, i16_planes=True)
    pf = _pl(_cfg_bench(), chunk_hops=1, store_ring=False,
             packed_output=True)
    s16, sf = p16.init_state(s), pf.init_state(s)
    out16 = outf = None
    for _ in range(2):
        chunk = jnp.asarray(
            (_mk_chunk(rng, s, p16) * 32767).astype(np.int16))
        s16, out16 = p16.push(s16, chunk)
        sf, outf = pf.push(sf, chunk)
    assert (np.asarray(out16) == np.asarray(outf)).all(), (
        "i16 planes diverged from the f32 pipeline"
    )
    # k=8 display mode: the allk packed kernel's int16 variant
    p16k = _pl(_cfg_bench(), chunk_hops=8, store_ring=False,
               packed_output=True, i16_planes=True)
    assert p16k.allk_framing
    stk = p16k.init_state(s)
    chunk = jnp.asarray((_mk_chunk(rng, s, p16k) * 32767).astype(np.int16))
    stk, outk = p16k.push(stk, chunk)
    assert np.asarray(outk).any()


def class_blockwise_auto(rng):
    """blockwise_palettes="auto" (round-4-late default): a clustered
    concrete layout must carry the marker and compile the scalar-prefetch
    blockwise kernel; a scattered layout must stay on the per-row kernel.
    Output parity vs blockwise=False is bitwise (the per-row fallback
    branch inside the blockwise kernel is the same math)."""
    import jax.numpy as jnp

    s = 256
    p = _pl(_cfg_bench(), chunk_hops=1, store_ring=False,
            packed_output=True)
    clustered = np.repeat(np.arange(s // 128) % 19, 128).astype(np.int32)
    scattered = (np.arange(s) % 19).astype(np.int32)
    st = p.set_palette(p.init_state(s), clustered)
    assert p._state_blockwise(st), "clustered layout lost the auto marker"
    st_sc = p.set_palette(st, scattered)
    assert not p._state_blockwise(st_sc), (
        "scattered layout wrongly kept the blockwise marker"
    )
    _, rows_auto = _push_twice(p, s, np.random.default_rng(7),
                               palette_ids=clustered)
    p_off = _pl(_cfg_bench(), chunk_hops=1, store_ring=False,
                packed_output=True, blockwise_palettes=False)
    _, rows_off = _push_twice(p_off, s, np.random.default_rng(7),
                              palette_ids=clustered)
    assert (rows_auto == rows_off).all(), (
        "auto-blockwise output differs from the per-row kernel"
    )


def class_palette_sort(rng):
    """palette_sort=True, sorted-carry streaming mode (round 4 late): a
    scattered layout sorts at set_palette, the push runs permuted-chunk ->
    sorted STFT -> blockwise colormap -> unpermuted packed rows.  Bitwise
    vs the per-row pipeline on the same ids."""
    import jax.numpy as jnp

    s = _n_streams(256)
    ids = (np.arange(s) % 2).astype(np.int32)  # alternating: scattered
    p = _pl(_cfg_bench(), chunk_hops=1, store_ring=False,
            packed_output=True, palette_sort=True)
    assert p.carry_sort_mode
    st = p.set_palette(p.init_state(s), ids)
    if s >= 256:
        assert p._state_perm(st) is not None, "sort did not engage"
    p_pr = _pl(_cfg_bench(), chunk_hops=1, store_ring=False,
               packed_output=True, palette_sort=False,
               blockwise_palettes=False)
    st_pr = p_pr.set_palette(p_pr.init_state(s), ids)
    out = out_pr = None
    for _ in range(2):
        chunk = jnp.asarray(_mk_chunk(rng, s, p))
        st, out = p.push(st, chunk)
        st_pr, out_pr = p_pr.push(st_pr, chunk)
    assert (np.asarray(out) == np.asarray(out_pr)).all(), (
        "palette_sort output differs from the per-row kernel"
    )


def class_global_sort(rng):
    """GLOBAL palette sort (length-4 tables tuple, round 4 late): under
    stream blocking, a scattered layout whose per-block sort fails the
    blockwise economics sorts GLOBALLY instead — the chunk permutes once
    above the block slicing, every block runs the blockwise kernel on a
    contiguous slice of the sorted order, and the packed rows unpermute
    once after reassembly.  Bitwise vs the flat per-row pipeline."""
    import jax.numpy as jnp

    s = _n_streams(1280)
    bs = 256
    # 5 palettes scattered: per-block sorted runs are bs/5 = 51 — shorter
    # than ANY plausible colormap block (ts 64 or 128), so zero uniform
    # blocks and the per-block economics refuse regardless of colormap
    # retunes; global runs are s/5 = 256 (aligned to both ts values,
    # passes) -> the length-4 global class engages.  (The first cut used
    # 3 palettes at s=768: per-block runs of ~85 sit at EXACTLY 50%
    # uniform for ts=64 — one colormap-block retune away from flipping to
    # the block-relative class and a phantom assert failure.)
    ids = (np.arange(s) % 5).astype(np.int32)
    p = _pl(_cfg_bench(), chunk_hops=1, store_ring=False,
            packed_output=True, palette_sort=True, stream_blocks=bs)
    st = p.set_palette(p.init_state(s), ids)
    if s >= 1280:
        assert p._tables_perm_global(st.tables), "global sort did not engage"
    p_pr = _pl(_cfg_bench(), chunk_hops=1, store_ring=False,
               packed_output=True, palette_sort=False,
               blockwise_palettes=False)
    st_pr = p_pr.set_palette(p_pr.init_state(s), ids)
    out = out_pr = None
    for _ in range(2):
        chunk = jnp.asarray(_mk_chunk(rng, s, p))
        st, out = p.push(st, chunk)
        st_pr, out_pr = p_pr.push(st_pr, chunk)
    assert (np.asarray(out) == np.asarray(out_pr)).all(), (
        "global palette sort output differs from the per-row kernel"
    )


def class_viewport(rng):
    p = _pl(_cfg_bench(), chunk_hops=8, viewport_rows=64)
    state, _ = _push_twice(p, 16, rng)
    full = np.asarray(p.render_viewport(state))
    assert full.shape[1] == p.viewport_rows
    scaled = np.asarray(p.render_viewport(state, width=200))
    assert scaled.shape[1] == 200 and scaled.any()


def class_xla_parity(rng):
    """The fused chain vs the XLA-composed path on a CHIRP (tonal content —
    noise hides FFT precision bugs) for both the flip and lane_pad plans."""
    import jax.numpy as jnp

    from spectrogram_tpu.models.spectrogram import SpectrogramPipeline

    for cfg in (_cfg_bench(), _cfg_reference()):
        fs = cfg.sample_rate
        t = np.arange(cfg.window_size * 4) / fs
        chirp = 0.4 * np.sin(2 * np.pi * (200 + 2000 * t) * t)
        pcm = np.stack([chirp, 0.2 * np.sin(2 * np.pi * 440 * t)], -1)
        pcm = pcm[None].astype(np.float32)
        p_f = _pl(cfg, store_ring=False, packed_output=True)
        p_x = SpectrogramPipeline(cfg, store_ring=False, packed_output=True,
                                  stft_backend="xla", colormap_backend="xla")
        a = np.asarray(p_f.process(jnp.asarray(pcm))).view(np.uint8).astype(int)
        b = np.asarray(p_x.process(jnp.asarray(pcm))).view(np.uint8).astype(int)
        diff = np.abs(a - b).max()
        assert diff <= 1, f"{cfg.window_size}/{cfg.padded_size}: {diff} u8"


CLASSES = (
    ("flip", class_flip),
    ("bufk", class_bufk),
    ("lane_pad", class_lane_pad),
    ("small_flip", class_small_flip),
    ("static", class_static),
    ("uniform", class_uniform),
    ("generic", class_generic),
    ("transposed", class_transposed),
    ("tsplit", class_tsplit),
    ("k1", class_k1),
    ("packed_off", class_packed_off),
    ("i16", class_i16),
    ("blockwise_auto", class_blockwise_auto),
    ("palette_sort", class_palette_sort),
    ("global_sort", class_global_sort),
    ("viewport", class_viewport),
    ("xla_parity", class_xla_parity),
)


def main(argv=None) -> int:
    import os

    import jax

    # Optional persistent compile cache (SMOKE_CACHE=1): helps on directly
    # attached chips; left OFF by default because the dev relay backend
    # stalled with it enabled (observed 2026-08-17: >4 min with no first
    # class vs 85 s without).
    if os.environ.get("SMOKE_CACHE", "0") == "1":
        cache_dir = os.path.expanduser("~/.cache/spectrogram_tpu/xla_cache")
        try:
            os.makedirs(cache_dir, exist_ok=True)
            jax.config.update("jax_compilation_cache_dir", cache_dir)
            jax.config.update(
                "jax_persistent_cache_min_compile_time_secs", 1.0
            )
        except Exception:
            pass  # cache is an optimization; the gate must run without it

    argv = list(sys.argv[1:] if argv is None else argv)
    only = None
    if "--only" in argv:  # e.g. --only flip,lane_pad (debug/split runs)
        only = set(argv[argv.index("--only") + 1].split(","))

    rng = np.random.default_rng(0)
    backend = jax.default_backend()
    print(f"smoke: backend={backend} device={jax.devices()[0]}", flush=True)
    if backend not in ("tpu", "axon"):
        print("smoke: WARNING not on TPU — compile coverage is only "
              "meaningful on hardware (interpret mode cannot catch Mosaic "
              "layout failures)", flush=True)
    failures = []
    classes = [c for c in CLASSES if only is None or c[0] in only]
    for name, fn in classes:
        t0 = time.perf_counter()
        try:
            fn(rng)
            print(f"smoke: {name:<12} PASS  ({time.perf_counter() - t0:.1f}s)",
                  flush=True)
        except Exception:
            failures.append(name)
            print(f"smoke: {name:<12} FAIL  ({time.perf_counter() - t0:.1f}s)",
                  flush=True)
            traceback.print_exc()
    if failures:
        print(f"smoke: RED — {len(failures)} class(es) failed: "
              f"{', '.join(failures)}", flush=True)
        return 1
    print(f"smoke: GREEN — all {len(classes)} geometry/kernel classes "
          f"compiled and ran on {backend}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
