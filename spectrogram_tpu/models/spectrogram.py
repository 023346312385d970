"""The flagship model: batched streaming spectrogram pipeline.

TPU-native redesign of the reference's `GPUSpectrogram` widget
(src/widgets/gpu_spectrogram.rs), which per vsync tick pulls all ready STFT
rows into a scrolling F16F16 ring texture (:254-275) and renders it with a
log-frequency/dB/palette fragment shader (:135-191).  Here:

* the ring texture becomes a device-resident `[streams, rows, bins, 2]`
  bfloat16 array, donated across pushes; "scrolling" is a modular row cursor
  (gpu_spectrogram.rs:274's `offset` arithmetic), shared by all streams in a
  batch because they advance in lockstep;
* hot loop A (STFT production) is `ops.stft` batched over streams;
* hot loop B (the fragment shader) is the colormap stage: one precomputed
  resample matmul + dB/pan + per-stream palette LUT lookup, vmapped over the
  stream axis so every stream can use a different palette without re-upload
  (the TPU equivalent of swapping the palette texture, :232-239);
* runtime palette switching is a state update (`set_palette`), no recompile;
  sample-rate switching re-specializes the jit like the reference rebuilds
  its FFTW plan (gpu_spectrogram.rs:320-327).

Push contract: each `push` carries `chunk_hops * hop_size` new samples per
stream and emits exactly `chunk_hops` rows per stream.  Fixed chunk size keeps
all shapes static for XLA; the host ingest layer (io/) does the re-chunking.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from spectrogram_tpu.color.colorscheme import (
    stacked_backgrounds,
    stacked_factored_tables,
)
from spectrogram_tpu.config import SpectrogramConfig
from spectrogram_tpu.ops import colormap as cmap_ops
from spectrogram_tpu.ops import mxu_fft
from spectrogram_tpu.ops.pallas import colormap_kernel as cmap_kernel
from spectrogram_tpu.ops import stft as stft_ops


def _unpack_rgba_device(packed: jax.Array) -> jax.Array:
    """[..., H] i32 RGBA8888 -> [..., H, 4] u8 on device."""
    return jnp.stack(
        [((packed >> (8 * c)) & 0xFF).astype(jnp.uint8) for c in range(4)],
        axis=-1,
    )


class StreamState(NamedTuple):
    """Per-batch device state. All arrays lead with the stream axis except
    the scalars shared by the lockstep batch."""

    carry: jax.Array      # [S, 2, window-hop] f32 planar sample history
    ring: jax.Array       # [S, R, 2, B] bf16 — scrolling row ring, channels-planar
    cursor: jax.Array     # [] int32 — next write row (gpu_spectrogram.rs `offset`)
    palette_id: jax.Array # [S] int32 — per-stream palette index
    row_count: jax.Array  # [] int32 — total rows produced since init
    # Pre-picked per-stream colormap kernel tables, refreshed by
    # init_state/set_palette — NOT by every push (the reference uploads its
    # palette texture once at set time, gpu_spectrogram.rs:232-239, and so
    # do we; round-3 profiling showed the per-push one-hot pick + tile cost
    # ~0.25 ms at 10k streams).  () = static-palette pipelines (LUT baked
    # into the kernel) and legacy states (push falls back to picking).
    # 1-tuple ([S, R*4],) for the built-in registry, 2-tuple (u, v) generic.
    tables: tuple = ()


class SpectrogramPipeline:
    """Streaming STFT -> colormap pipeline over a batch of S streams.

    Args:
      cfg: geometry/presentation config (static under jit).
      chunk_hops: rows emitted per push; chunk = chunk_hops * hop samples.
      viewport_rows: ring length (rounded up to a multiple of chunk_hops so
        the write slice never wraps — cursor stays a multiple of chunk_hops).
      ring_dtype: storage dtype of the row ring. bfloat16 mirrors the
        reference's F16F16 texture (gpu_spectrogram.rs:222) in TPU-native form.
    """

    def __init__(
        self,
        cfg: SpectrogramConfig,
        chunk_hops: int = 8,
        viewport_rows: Optional[int] = None,
        ring_dtype=jnp.bfloat16,
        lut_resolution: Optional[int] = None,
        store_ring: bool = True,
        stft_backend: str = "auto",
        colormap_backend: str = "auto",
        packed_output: bool = False,
        precision_profile: str = "exact",
        kernel_interpret: bool = False,
        autotune: bool = False,
        sanitize_input: bool = False,
        schemes=None,
        transposed_carry: bool = False,
        static_palette=None,
        framing: str = "auto",
        blockwise_palettes="auto",
        stream_blocks="auto",
        palette_sort: bool = True,
        sorted_output: bool = False,
        presorted_input: bool = False,
        i16_planes: bool = False,
        stft_packed="auto",
        stft_unpack_split="auto",
    ):
        cfg.validate()
        self.cfg = cfg
        self.chunk_hops = int(chunk_hops)
        rows = viewport_rows or cfg.viewport_rows
        # Round the ring up so cursor never wraps mid-write.
        self.viewport_rows = -(-rows // self.chunk_hops) * self.chunk_hops
        self.ring_dtype = ring_dtype
        # Streaming mode: at 10k-stream scale a full per-stream viewport ring
        # does not fit HBM (SURVEY.md §6); rows are emitted to the consumer
        # instead of retained. store_ring=False keeps a zero-length ring.
        self.store_ring = bool(store_ring)
        # schemes: the palette registry for this pipeline.  Defaults to the
        # 19 built-ins (colorscheme.rs:125-151) but accepts ANY sequence of
        # ColorScheme / FactoredScheme — the analog of the reference's
        # public ColorScheme constructors + arbitrary-LUT upload
        # (colorscheme.rs:24-39, gpu_spectrogram.rs:232-239).  palette ids
        # index THIS list.
        from spectrogram_tpu.color.colorscheme import DEFAULT_COLOR_SCHEMES

        self.schemes = tuple(schemes) if schemes is not None else DEFAULT_COLOR_SCHEMES
        self.scheme_names = tuple(s.name for s in self.schemes)
        res = lut_resolution or cfg.lut_resolution
        u, v = stacked_factored_tables(res, self.schemes)
        self.lut_u = jnp.asarray(u)                                     # [P,r,4]
        self.lut_v = jnp.asarray(v)                                     # [P,r,4]
        self.backgrounds = jnp.asarray(
            stacked_backgrounds(self.schemes)
        )                                                               # [P,3] u8
        self.chunk_size = self.chunk_hops * cfg.hop_size
        self.carry_size = stft_ops.carry_size(cfg)
        # STFT backend: "mxu" = four-step matmul FFT (ops/mxu_fft.py, the
        # production path), "xla" = jnp.fft golden path, "pallas" = fused
        # Pallas STFT kernel chained directly into the Pallas colormap
        # (zero-copy half-spectrum handoff), "auto" = mxu when a
        # factorization exists for the geometry.
        if stft_backend not in ("auto", "mxu", "xla", "pallas"):
            raise ValueError(f"unknown stft_backend {stft_backend!r}")
        self.fft_plan = mxu_fft.make_plan(cfg) if stft_backend != "xla" else None
        # The MXU paths used here (stft_planar_windows / the fused kernel)
        # require an even-n1 plan AND the half-spectrum covering all bins
        # (pad_factor >= 2) — the same guard stft_rows_split_planar applies.
        plan_usable = (
            self.fft_plan is not None
            and self.fft_plan.n1 % 2 == 0
            and cfg.pad_factor >= 2
        )
        if stft_backend in ("mxu", "pallas") and not plan_usable:
            raise ValueError(
                f"stft_backend={stft_backend!r} needs an even-n1 MXU "
                f"factorization and pad_factor >= 2; geometry {cfg} has "
                f"plan={self.fft_plan} pad_factor={cfg.pad_factor}. "
                f"Use stft_backend='xla' or 'auto'."
            )
        if not plan_usable:
            self.fft_plan = None  # all downstream paths fall back to XLA
        # Pallas stream-block size for the fused STFT kernel: None = each
        # entry point's per-plan default (stft_kernel.default_block_rows —
        # 64 where the v4 shapes measured best and compile, 32 otherwise);
        # the autotuner overrides with a measured value.
        self.stft_block_rows = None
        if autotune and plan_usable:
            # FFTW MEASURE analog: measure the even-n1 factorizations + block
            # sizes on this device, cached per (device kind, geometry) —
            # see utils/autotune.py.  Static model stays the no-tune default.
            from spectrogram_tpu.utils import autotune as autotune_mod

            tuned_plan, tuned_ts = autotune_mod.tune(
                cfg,
                # the deployment config changes the measured graph (framing
                # path, colormap precision, output packing) — tune THIS one
                pipeline_kwargs=dict(
                    chunk_hops=self.chunk_hops,
                    store_ring=self.store_ring,
                    packed_output=bool(packed_output),
                    precision_profile=precision_profile,
                ),
            )
            if tuned_plan is not None:
                self.fft_plan = tuned_plan
                self.stft_block_rows = tuned_ts
        if stft_backend == "auto":
            # Fused Pallas chain when on a TPU backend and the geometry
            # factors with even n1 — measured fastest (692k rows/s vs 658k
            # for mxu+pallas at the bench geometry).
            on_tpu = jax.default_backend() in ("tpu", "axon")
            stft_backend = (
                "pallas"
                if on_tpu and plan_usable
                else "mxu" if plan_usable else "xla"
            )
        self.fused_chain = stft_backend == "pallas"
        # Transposed-carry state format (MEASURED NEGATIVE, kept opt-in as
        # evidence): carry as [S, 2, n1, C/n1] (the kernel's native window
        # layout) deletes the per-channel slice + full-buffer transpose
        # glue, BUT the replacement concat/slice run on the LANE axis at
        # non-tile offsets — profiler: framing 0.62 -> 1.84 ms at 4096
        # streams (slice_maximum + pad_maximum 0.59 each ~ 113 GB/s
        # effective, 7x under HBM peak), 1.38M -> 953k rows/s end-to-end
        # even though the 4D-operand kernel itself times identically
        # (1.025 ms).  Lesson: minor-dim concats at unaligned offsets cost
        # more than the copies they replace.  DESIGN.md kernel ledger.
        from spectrogram_tpu.ops.pallas import stft_kernel as _sk

        # Padded-lane flip (round 4): plans whose n2 fails the direct
        # n2 % 128 Mosaic gate run the fused STFT with zero-padded stage-1
        # constants (n2 -> n2p lane tiles, physically free) so the fast
        # flipped stage 2 applies — the reference-native 2400/4800 geometry
        # (fft.rs:33,44) was the one plan family stuck on the slow
        # orientation.  The kernel then emits the PADDED bin layout
        # (position k1*n2p + k2; pad positions exact zero) and the resample
        # matrix is row-expanded to consume it with zero slicing passes.
        self.stft_lane_pad = (
            self.fused_chain
            and self.fft_plan is not None
            and _sk.lane_pad_default(self.fft_plan)
        )
        # Packed-complex STFT formulation (round 4 final): stereo-packed
        # z = l + i*r four-step with the conjugate unpack in-kernel — the
        # reference's own packing (fft.rs:57,81-92) rebuilt as MXU
        # structure: stage 1 contracts both channels in one dense K=2m
        # dot, the unpack reversal is one batched permutation matmul.
        # Measured -16% standalone vs split-real v4 at the bench plan
        # (exp_stft_packed, the 160/192 MXU-pass model).  "auto" = on
        # wherever the flat-2D orientation applies.
        if stft_packed not in ("auto", True, False):
            raise ValueError(f"unknown stft_packed {stft_packed!r}")
        self._stft_packed_arg = stft_packed
        self.stft_packed = (
            self.fused_chain
            and self.fft_plan is not None
            and _sk.packed_supported(self.fft_plan, self.stft_lane_pad)
            if stft_packed == "auto"
            else bool(stft_packed)
        )
        if self.stft_packed and not (
            self.fused_chain
            and self.fft_plan is not None
            and _sk.packed_supported(self.fft_plan, self.stft_lane_pad)
        ):
            raise ValueError(
                f"stft_packed=True requires the fused chain and a "
                f"flat-2D-capable plan (cfg {cfg}, plan={self.fft_plan})"
            )
        # bf16-split unpack permutation dot (exp_unpack_split): the packed
        # kernel's `prev` matmul is pure data movement (0/1 entries), so
        # splitting the data operand into 3 bf16 terms and summing three
        # single-pass DEFAULT dots reproduces the HIGHEST dot BITWISE at
        # 16/32 of its MXU passes (kernel model 160 -> 144 cycles).
        # "auto" = 3 wherever packed runs; 0 = the plain HIGHEST dot;
        # 2 = one fewer pass at ~2^-17 relative error (opt-in: measured
        # max dB delta 5.7e-5, crosstalk floor -132 dB — far below the
        # -70 dB display window, but bitwise is the stronger invariant).
        if stft_unpack_split not in ("auto", 0, 2, 3):
            raise ValueError(
                f"unknown stft_unpack_split {stft_unpack_split!r}"
            )
        self._stft_unpack_split_arg = stft_unpack_split
        self.stft_unpack_split = (
            (3 if self.stft_packed else 0)
            if stft_unpack_split == "auto"
            else int(stft_unpack_split)
        )
        if self.stft_unpack_split and not self.stft_packed:
            raise ValueError(
                "stft_unpack_split requires the packed STFT formulation"
            )
        self.carry_transposed = bool(transposed_carry) and (
            self.fused_chain
            and not self.stft_lane_pad
            and _sk.carry_transposed_supported(cfg, self.fft_plan)
            and not (
                self.chunk_hops > 1
                and _sk.buf_framing_supported(cfg, self.chunk_hops, self.fft_plan)
            )
        )
        if transposed_carry and not self.carry_transposed:
            raise ValueError(
                f"transposed_carry requires the fused chain and "
                f"hop % n1 == 0 (cfg {cfg}, plan {self.fft_plan})"
            )
        # Framing formulation for the fused chain (round 4):
        #   "allk"   — the all-windows kernel (stft_mag_fused2_allk): one
        #              grid step reads a stream block of the whole
        #              carry+chunk buffer and slices the k windows
        #              in-kernel; the k materialized window planes never
        #              exist (measured -19% on STFT+framing at k=8,
        #              bitwise-equal; exp_stft_allk).  Needs hop % n1 == 0.
        #   "planes" — round-3 window-plane materialization.
        #   "auto"   — allk where supported at k > 1; planes otherwise.
        # The split-OPERAND form (carry+chunk as separate kernel inputs,
        # exp_stft_allk --split) measured ~2.4 ms WORSE at 4096 streams
        # k=8 than allk's single per-channel buffer operand — the 4D
        # combined-channel operand layout costs more than the concat it
        # deletes.  MEASURED NEGATIVE, kept in the experiment file.
        if framing not in ("auto", "allk", "planes", "tsplit"):
            raise ValueError(f"unknown framing {framing!r}")
        self.framing = framing
        allk_ok = (
            self.fused_chain
            and not self.carry_transposed
            and _sk.split_framing_supported(cfg, self.chunk_hops, self.fft_plan)
        )
        self.allk_framing = allk_ok and (
            framing == "allk" or (framing == "auto" and self.chunk_hops > 1)
        )
        if framing == "allk" and not allk_ok:
            raise ValueError(
                f"framing='allk' requires the fused chain and hop % n1 == 0 "
                f"(cfg {cfg}, plan {self.fft_plan})"
            )
        # "tsplit" (round 4 late, MEASURED NEGATIVE, opt-in as evidence): k=1
        # split-state framing — the kernel consumes the transposed carry
        # STATE + hop chunk directly (two accumulating stage-1 dots at the
        # carry/chunk boundary) and emits the next carry in-kernel.  The
        # per-push concat + full-buffer operand transposes never exist,
        # but the boundary-split dots (39/25-lane operands padded to 128)
        # cost more MXU work than that glue: 5.33 vs 4.87 ms/push at
        # 10,240 streams (see stft_mag_fused2_tsplit's ledger docstring).
        tsplit_ok = (
            self.fused_chain
            and not self.carry_transposed
            and self.chunk_hops == 1
            and _sk.tsplit_supported(
                cfg, self.chunk_hops, self.fft_plan,
                lane_pad=self.stft_lane_pad,
            )
        )
        self.tsplit_framing = tsplit_ok and framing == "tsplit"
        if framing == "tsplit" and not tsplit_ok:
            raise ValueError(
                f"framing='tsplit' requires the fused chain, chunk_hops=1, "
                f"hop % n1 == 0 and a flip-capable stage 2 "
                f"(cfg {cfg}, plan {self.fft_plan})"
            )
        # blockwise_palettes: per-BLOCK palette uniformity in the colormap
        # kernels — ts-row blocks whose streams share one palette take the
        # SMEM-scalar path, mixed blocks fall back to per-row tables (one
        # SMEM flag test per grid step).  Pays off when tenants cluster in
        # contiguous stream ranges (the expected multi-tenant layout):
        # measured -29% colormap clustered, +4% fully scattered
        # (exp_colormap_blockwise).
        #   "auto" (default, round 4 late) — set_palette/init_state decide
        #     per STATE from concrete palette layouts: when >= half the
        #     colormap row blocks are single-palette the state carries a
        #     zero-size marker in its tables tuple and pushes trace the
        #     blockwise kernel; scattered layouts keep the per-row kernel
        #     (no +4% tax).  Traced (in-jit) ids preserve the previous
        #     state's decision.  Structure changes re-trace once, exactly
        #     like the uniform <-> per-stream switch.
        #   True — always blockwise (the round-4 opt-in); False — never.
        if blockwise_palettes not in (False, True, "auto"):
            raise ValueError(
                "blockwise_palettes must be False, True or 'auto'; got "
                f"{blockwise_palettes!r}"
            )
        self.blockwise_palettes = blockwise_palettes
        # stream_blocks (round 4 late): split very large pushes into
        # UNROLLED sub-pushes over stream blocks.  Mechanism (exp_glue_16k
        # + exp_blocked_push): the compiled HLO at 10,240 and 16,384
        # streams is instruction-identical EXCEPT memory-space assignment —
        # the framing concat/pad fusion outputs ([S, padded] f32) live in
        # S(1) scoped fast memory up to ~10k streams and fall back to HBM
        # beyond it, which is the measured super-linear glue-copy scaling
        # that set the 16k+ throughput droop.  Blocked sub-pushes keep each
        # block's intermediates inside the scoped regime: 16,384 streams
        # 13.20 -> 12.01 ms/push (4096-blocks, +10%), 20,480 16.25 ->
        # 15.30 — inside the 16.67 ms real-time budget.  lax.map blocking
        # measured NEGATIVE (+12% at 16k: loop machinery costs more than
        # the regime recovery) — blocks are unrolled straight-line calls.
        #   "auto" — 4096-stream blocks when S >= _STREAM_BLOCK_AUTO_MIN
        #            on the k=1 fused streaming config (store_ring=False);
        #   int N  — always block at N streams;  0 — never block.
        if stream_blocks != "auto" and not isinstance(stream_blocks, int):
            raise ValueError(f"stream_blocks must be 'auto' or int, got "
                             f"{stream_blocks!r}")
        self.stream_blocks = stream_blocks
        # palette_sort (round 4 late; DEFAULT ON since measured on v5e —
        # exp_palette_sort at 10,240 scattered streams: per-row 7.670 ms ->
        # sorted-carry 6.787 (+13%, bitwise), vs the clustered ceiling
        # 6.255; engagement is fully self-gating below, so ineligible /
        # uneconomic layouts are untouched):
        # for SCATTERED per-stream palette layouts — where blockwise_palettes
        # can't help and the colormap pays per-row LUT broadcasts — a stable
        # argsort of the palette ids at set_palette time makes any layout
        # clustered.  The state stores the SORTED kernel tables plus the
        # (block-relative) permutation; each push permutes the STFT
        # magnitude planes into sorted order, runs the cheaper blockwise
        # colormap, and unpermutes the packed output.  Pays iff leading-axis
        # row takes ride the copy engines (exp_permute_gather) and the
        # SORTED layout passes the blockwise economics (>= half the colormap
        # row blocks single-palette after sorting — e.g. 19 palettes over
        # 10k streams sorts into ~540-stream runs).  Engages only on the
        # fused Pallas chain with the single-array built-in table registry.
        # Under parallel.mesh sharding the sort goes PER SHARD SLICE
        # (round 4 final): set_palette with concrete ids, and
        # mesh.shard_state(state, mesh, pipeline), argsort each shard's
        # slice independently (length-4 tuple, values global-but-
        # confined) so every device keeps the blockwise colormap with no
        # cross-ICI gathers — same economics gate per shard.
        self.palette_sort = bool(palette_sort)
        # Sorted-carry fast mode (streaming configs, store_ring=False): the
        # CARRY lives in sorted stream order (permuted once at set_palette),
        # so the mag planes come out of the STFT already sorted — the two
        # per-push [S, half] mag takes (measured 0.55 ms each at 10,240 on
        # v5e, exp_permute_gather) never exist.  Per push only the incoming
        # chunk is permuted (a gather XLA can fuse into the framing concat
        # copy) and the packed rows unpermuted.  Ring mode keeps the
        # mag-bridge (the ring must stay external-order for the viewport).
        self.carry_sort_mode = self.palette_sort and not self.store_ring
        # sorted_output (opt-in, requires palette_sort): emit the packed
        # rows in SORTED stream order and let the host drain reindex via
        # `output_perm(state)` — deletes the device-side output unpermute
        # (a [S, H] i32 row take, ~0.34 ms at 10,240 streams) for serving
        # loops that scatter rows per stream on the host anyway.  The
        # consumer contract: `out[output_perm(state)[s_]]` is stream s_'s
        # rows whenever output_perm(state) is not None (unsorted states
        # stay external-order with output_perm None).
        if sorted_output and not palette_sort:
            raise ValueError("sorted_output requires palette_sort=True")
        self.sorted_output = bool(sorted_output)
        # presorted_input (opt-in, round 5): the HOST delivers chunk rows
        # already in the carry's sorted stream order — the drain layer
        # permutes destination rows at pop time (`RingBank*.pop_matrix*`'s
        # dest param, fed from `input_dest(state)`; free on the host, the
        # bank already scatters per stream) — so the device-side per-push
        # chunk gather (`jnp.take(chunk_pl, perm)` below) never exists.
        # Contract: whenever `input_perm(state)` is not None the pushed
        # chunk's row i must carry external stream input_perm(state)[i]'s
        # PCM (re-query after every set_palette/shard_state — the sort
        # permutation changes).  Carry-sort mode only: in ring mode the
        # chunk is never permuted, so a pre-permuted chunk would be wrong.
        # Stream order at the transport boundary is a host-side free
        # choice (reference: audio_transform.rs:38-39 pulls per-stream
        # rings in arbitrary order).
        if presorted_input and not self.carry_sort_mode:
            raise ValueError(
                "presorted_input requires the sorted-carry streaming mode "
                "(palette_sort=True and store_ring=False)"
            )
        self.presorted_input = bool(presorted_input)
        # i16_planes (round 5): keep the PCM sample planes int16 end-to-end
        # — the wire dtype — so the carry, the framing concats, and the
        # STFT kernel operands all move HALF the bytes; the kernel casts
        # in-VMEM and the exact 2^-15 wire scale folds into the Hann
        # constant (an exponent shift — BITWISE equal to the f32 path fed
        # int16/32768; proven in tests).  Measured: the packed kernel's
        # operand leg is its bottleneck (59% of kernel wall,
        # exp_stft_ablate/exp_stft_dma: f32 operand floor 1.95 ms ->
        # int16 1.21 at 16,384 rows).  Pushes must supply int16 chunks
        # (RingBank16.pop_matrix_i16_planar is the matching drain).
        # Scoped to the k=1 fused packed streaming path — validated below
        # and re-validated by override_plan (a plan swap can disable the
        # packed formulation).
        self.i16_planes = bool(i16_planes)
        self._validate_i16_planes()
        resample_full_t = cmap_ops.resample_matrix_full(cfg).T
        if self.stft_lane_pad:
            resample_full_t = self._pad_resample_rows(resample_full_t)
        self.resample_t_full = jnp.asarray(resample_full_t)
        # Banded colormap plan: the two-tap resample matrix lets each pixel
        # tile contract only its narrow bin band (~17% of the dense FLOPs at
        # the default geometry; measured 1.96x on v5e, bitwise identical).
        segs = cmap_kernel.band_segments(resample_full_t)
        self.cmap_segments_full = (
            segs if cmap_kernel._banded_worthwhile(segs, *resample_full_t.shape)
            else None
        )
        # Colormap backend: "pallas" = fused kernel (ops/pallas/colormap_kernel,
        # ~2.4x the XLA-composed path on v5e), "xla" = composed jnp ops,
        # "auto" = pallas on TPU backends, xla elsewhere (interpret-mode
        # Pallas is too slow for production CPU use).
        if colormap_backend not in ("auto", "pallas", "xla"):
            raise ValueError(f"unknown colormap_backend {colormap_backend!r}")
        if colormap_backend == "auto":
            colormap_backend = (
                "pallas" if jax.default_backend() in ("tpu", "axon") else "xla"
            )
        self.colormap_backend = colormap_backend
        # kernel_interpret: run the Pallas kernels in interpret mode — lets
        # the production (fused) code path execute on the CPU backend, e.g.
        # under the 8-virtual-device sharding tests and dryrun_multichip.
        self.kernel_interpret = bool(kernel_interpret)
        # sanitize_input: zero non-finite PCM samples at the ingestion edge.
        # One buggy producer's NaN otherwise poisons its stream's carry (and
        # with store_ring its viewport) until slot reuse — unacceptable in a
        # multi-tenant service.  Off by default: the reference propagates
        # NaN too (DESIGN.md D3), and the check costs one fused elementwise
        # pass over the chunk.
        self.sanitize_input = bool(sanitize_input)
        resample_t = cmap_ops.resample_matrix(cfg).T                    # [B,H]
        self.resample_t = jnp.asarray(resample_t)
        segs2 = cmap_kernel.band_segments(resample_t)
        self.cmap_segments = (
            segs2 if cmap_kernel._banded_worthwhile(segs2, *resample_t.shape)
            else None
        )
        # packed_output: emit rows as [S, k, H] int32 RGBA8888 (little-endian
        # byte 0 = R) instead of [S, k, H, 4] u8 — identical bytes, the
        # TPU-friendly wire format (no minor-dim-4 u8 layout); unpack on host
        # with arr.view(np.uint8).reshape(..., 4).
        self.packed_output = bool(packed_output)
        # Kernel table format: schemes fitting the built-in mono/stereo LUT
        # structure share the specialized (halved-LUT-work) kernel; any
        # other factored scheme routes the WHOLE registry through the
        # generic two-table kernel (mixing kernels per row would need a
        # gather).  Detection is structural — see _builtin_table_row.
        try:
            self.builtin_tables = jnp.asarray(
                cmap_kernel.builtin_color_tables(res, self.schemes)
            )
            self.generic_tables = None
        except ValueError:
            self.builtin_tables = None
            gu, gv = cmap_kernel.generic_color_tables(res, self.schemes)
            self.generic_tables = (jnp.asarray(gu), jnp.asarray(gv))
        # static_palette: bake ONE scheme's LUT into the colormap kernel as
        # compile-time scalars — the single-palette fast path (2.3x the
        # per-row colormap, exact pixels; exp_colormap_static_palette).
        # This is the reference's own operating mode (one scheme per
        # widget, gpu_spectrogram.rs:88).  Trades runtime palette agility
        # for speed: set_palette raises; switching = a new pipeline (a
        # recompile, like the reference's plan rebuild on rate change).
        self.static_table = None
        self.static_palette_id = None
        if static_palette is not None:
            pid = (
                static_palette
                if isinstance(static_palette, int)
                else self.scheme_names.index(static_palette)
            )
            if not 0 <= pid < len(self.schemes):
                raise ValueError(f"static_palette {static_palette!r} out of range")
            self.static_palette_id = int(pid)
            if self.builtin_tables is not None:
                self.static_table = tuple(
                    float(v)
                    for v in cmap_kernel.builtin_color_tables(res, self.schemes)[pid]
                )
            else:
                # generic registry (user-defined FactoredSchemes): bake the
                # two factor rows — static generic kernel
                gu, gv = cmap_kernel.generic_color_tables(res, self.schemes)
                self.static_table = (
                    tuple(float(v) for v in gu[pid]),
                    tuple(float(v) for v in gv[pid]),
                )
        # precision_profile: "exact" pins true-f32 matmuls everywhere (the
        # parity contract vs the reference's f32 pipeline).  "fast" relaxes
        # ONLY the colormap resample matmul to the MXU's native bf16 passes:
        # that contraction sums non-negative terms (interp weights x
        # magnitudes), so bf16 error is provably <= ~0.4% relative with NO
        # cancellation — comparable to the reference's own F16F16 texture
        # quantization (gpu_spectrogram.rs:222).  The FFT stages always stay
        # HIGHEST: their signed near-cancellations (spectral leakage floors
        # of tonal signals) are destroyed by bf16 — measured mean u8 error
        # of 45/255 on a chirp when tried.
        if precision_profile not in ("exact", "fast"):
            raise ValueError(f"unknown precision_profile {precision_profile!r}")
        self.precision_profile = precision_profile
        self.precision_stft = jax.lax.Precision.HIGHEST
        self.precision_cmap = (
            jax.lax.Precision.HIGHEST
            if precision_profile == "exact"
            else jax.lax.Precision.DEFAULT
        )

    @property
    def carry_is_transposed(self) -> bool:
        """True when the state's carry uses the transposed [S, 2, n1, C/n1]
        layout (either the opt-in transposed_carry format or the tsplit
        framing path) — checkpoint migration and mesh sharding key off
        this, not the individual knobs."""
        return self.carry_transposed or self.tsplit_framing

    def override_plan(self, plan, block_rows: int | None = None) -> None:
        """Autotuner hook: swap the FFT factorization and recompute EVERY
        plan-derived structure — lane_pad routing, the (possibly padded)
        resample matrix + banding plan, and the framing gates.  A bare
        `pipeline.fft_plan = plan` leaves those stale: for lane_pad
        geometries the padded-bin resample matrix then mismatches the
        kernel output width (the tuner's 50x96/40x120 candidates failed
        exactly this way, round 4)."""
        from spectrogram_tpu.ops.pallas import stft_kernel as _sk

        self.fft_plan = plan
        self.stft_block_rows = block_rows
        self.stft_lane_pad = (
            self.fused_chain and plan is not None
            and _sk.lane_pad_default(plan)
        )
        self.stft_packed = (
            self.fused_chain
            and plan is not None
            and _sk.packed_supported(plan, self.stft_lane_pad)
            if self._stft_packed_arg == "auto"
            else bool(self._stft_packed_arg)
        )
        self.stft_unpack_split = (
            (3 if self.stft_packed else 0)
            if self._stft_unpack_split_arg == "auto"
            else int(self._stft_unpack_split_arg)
        )
        self.carry_transposed = self.carry_transposed and (
            not self.stft_lane_pad
            and _sk.carry_transposed_supported(self.cfg, plan)
        )
        allk_ok = (
            self.fused_chain
            and not self.carry_transposed
            and _sk.split_framing_supported(self.cfg, self.chunk_hops, plan)
        )
        self.allk_framing = allk_ok and (
            self.framing == "allk"
            or (self.framing == "auto" and self.chunk_hops > 1)
        )
        self.tsplit_framing = self.tsplit_framing and _sk.tsplit_supported(
            self.cfg, self.chunk_hops, plan, lane_pad=self.stft_lane_pad
        )
        resample_full_t = cmap_ops.resample_matrix_full(self.cfg).T
        if self.stft_lane_pad:
            resample_full_t = self._pad_resample_rows(resample_full_t)
        self.resample_t_full = jnp.asarray(resample_full_t)
        segs = cmap_kernel.band_segments(resample_full_t)
        self.cmap_segments_full = (
            segs
            if cmap_kernel._banded_worthwhile(segs, *resample_full_t.shape)
            else None
        )
        # a plan swap can disable the packed formulation i16_planes needs
        self._validate_i16_planes()

    def _pad_resample_rows(self, resample_t: "np.ndarray") -> "np.ndarray":
        """Row-expand a [half, H] resample matrix to the padded bin layout
        [k1h * n2p, H] (row k1*n2p + k2 = true bin k1*n2 + k2; pad rows
        zero) — the magnitude positions the lane-padded STFT kernel emits."""
        from spectrogram_tpu.ops.pallas.stft_kernel import padded_n2

        plan = self.fft_plan
        n2, n2p, k1h = plan.n2, padded_n2(plan), plan.n1 // 2
        out = np.zeros((k1h * n2p, resample_t.shape[1]), resample_t.dtype)
        out.reshape(k1h, n2p, -1)[:, :n2] = resample_t.reshape(k1h, n2, -1)
        return out

    def _unpad_mag(self, mag: jax.Array) -> jax.Array:
        """[N, k1h*n2p] padded-layout magnitudes -> [N, half] true-bin
        layout (one slice-copy; only the store_ring path needs it)."""
        from spectrogram_tpu.ops.pallas.stft_kernel import padded_n2

        plan = self.fft_plan
        n2, n2p, k1h = plan.n2, padded_n2(plan), plan.n1 // 2
        return mag.reshape(-1, k1h, n2p)[:, :, :n2].reshape(
            mag.shape[0], k1h * n2
        )

    # ------------------------------------------------------------------ state

    def init_state(self, n_streams: int, palette_id: int = 1) -> StreamState:
        """Fresh state for S streams. Default palette 1 = Magma, the
        reference widget's default (gpu_spectrogram.rs:88)."""
        cfg = self.cfg
        if self.static_palette_id is not None:
            palette_id = self.static_palette_id  # pinned by construction
        ring_rows = self.viewport_rows if self.store_ring else 0
        if self.carry_transposed or self.tsplit_framing:
            n1 = self.fft_plan.n1
            carry = jnp.zeros(
                (n_streams, 2, n1, self.carry_size // n1), jnp.float32
            )
        else:
            carry = jnp.zeros(
                (n_streams, 2, self.carry_size),
                jnp.int16 if self.i16_planes else jnp.float32,
            )
        pid = jnp.full((n_streams,), palette_id, jnp.int32)
        tables = self.state_tables_for(pid)
        if (
            self.blockwise_palettes == "auto"
            and len(tables) == 1
            and self.colormap_backend == "pallas"
            and self._blockwise_auto_decision(
                np.full((n_streams,), int(palette_id), np.int64)
            )
        ):
            # the all-one-palette default layout is maximally clustered
            tables = tables + (self._bw_marker(),)
        return StreamState(
            carry=carry,
            ring=jnp.zeros(
                (n_streams, ring_rows, 2, cfg.num_bins), self.ring_dtype
            ),
            cursor=jnp.zeros((), jnp.int32),
            palette_id=pid,
            row_count=jnp.zeros((), jnp.int32),
            tables=tables,
        )

    def set_palette(self, state: StreamState, palette_id) -> StreamState:
        """Runtime palette switch (per stream or broadcast) — a pure state
        update, the analog of the `palette` GObject property (main.rs:102-104).
        Also re-picks the per-stream kernel tables (the analog of the
        reference's one-time palette texture upload): the push itself never
        touches the palette registry."""
        if self.static_table is not None:
            raise ValueError(
                "this pipeline bakes static_palette="
                f"{self.scheme_names[self.static_palette_id]!r} into its "
                "kernels; runtime switching needs a pipeline without "
                "static_palette (or a new pipeline per palette)"
            )
        # Two notions of "concrete": range VALIDATION raises only for
        # host-provided python/numpy ids (jax arrays — eager or traced —
        # keep the documented clamp semantics, the GL-sampler behavior,
        # ADVICE r3); the blockwise-auto LAYOUT decision can additionally
        # inspect eager jax arrays — only true tracers are opaque.
        ids = np.asarray(palette_id) if not isinstance(palette_id, jax.Array) else None
        ids_layout = (
            None
            if isinstance(palette_id, jax.core.Tracer)
            else np.asarray(palette_id)
        )
        if ids is not None and (
            ids.min() < 0 or ids.max() >= len(self.schemes)
        ):
            raise ValueError(
                f"palette_id {palette_id!r} out of range 0..{len(self.schemes) - 1}"
            )
        pid = jnp.broadcast_to(
            jnp.asarray(palette_id, jnp.int32), state.palette_id.shape
        )
        # A SCALAR id (every stream on one palette — the reference's own
        # mode, one scheme per widget) stores the table as [1, R*4]: the
        # colormap kernels read it as SMEM scalars (_uniform_builtin_kernel,
        # no per-row broadcasts) and switching stays a pure state update.
        # Structure-changing (uniform <-> per-stream) pushes re-trace once.
        if np.ndim(palette_id) == 0:
            tables = self.state_tables_for(
                jnp.asarray([palette_id], jnp.int32)
            )
        else:
            tables = self.state_tables_for(pid)
            sorted_t = self._maybe_sort_palettes(tables, ids_layout, state)
            if sorted_t is not None:
                tables = sorted_t
            else:
                tables = self._maybe_mark_blockwise(
                    tables, ids_layout, state
                )
        return state._replace(
            palette_id=pid, tables=tables,
            carry=self._resorted_carry(state, tables),
        )

    # ---------------------------------------------------------- blockwise auto
    @staticmethod
    def _bw_marker() -> jax.Array:
        """Zero-size 1-D sentinel appended to state.tables when the state's
        palette layout should take the blockwise colormap kernel: pytree
        STRUCTURE carries the decision, so jitted pushes re-trace on a
        layout-class change exactly like the uniform <-> per-stream switch
        (real tables are all 2-D, so 1-D is unambiguous)."""
        return jnp.zeros((0,), jnp.int32)

    def _cmap_ts(self, n_rows: int) -> int:
        """Replicate the colormap entries' row-block-size (ts) choice
        (colormap_kernel._auto_blocks + the n % block_rows fallback) so the
        auto-blockwise clustering decision matches the kernel's actual
        uniformity granularity."""
        if self.cmap_segments_full is not None:
            b = max(hi - lo for _, _, lo, hi in self.cmap_segments_full)
        else:
            b = self.resample_t_full.shape[0]
        block_rows, _ = cmap_kernel._auto_blocks(b, None, None)
        return min(block_rows, n_rows) if n_rows % block_rows else block_rows

    # Blockwise economics threshold: engage when >= this fraction of the
    # ts-row colormap blocks are single-palette.  Measured
    # (exp_colormap_blockwise): -29% colormap on uniform blocks, +4% on
    # mixed — raw breakeven ~12%; 0.5 keeps a wide margin for the
    # flag-test overhead AND the sort's own fixed costs.  Lowering to
    # 0.25 was MEASURED A WASH at the 43.8% point (sorted 19-palette
    # layout, 4096 streams, exp_gate_threshold on v5e: bench +2.0%,
    # untuned 2400/4800 +9.8%, tuned 40x120 2400/4800 -8.3% — all inside
    # the ~10% single-harness noise band, opposite signs at the same
    # fraction): the ~0.2 ms chunk-gather + output-unpermute cost cancels
    # the 44%-fraction colormap EV at 4k populations.  Class attribute so
    # experiments can A/B the boundary (exp_gate_threshold).
    _BW_AUTO_FRAC = 0.5

    def _blockwise_auto_decision(self, ids: np.ndarray) -> bool:
        """True when >= `_BW_AUTO_FRAC` of the ts-row colormap blocks of
        this concrete per-stream palette layout are single-palette."""
        s = int(ids.shape[0])
        ts = self._cmap_ts(s * self.chunk_hops)
        nb = s // ts
        if nb == 0:
            return bool((ids == ids.flat[0]).all())
        head = ids[: nb * ts].reshape(nb, ts)
        uniform = (head == head[:, :1]).all(axis=1)
        return float(uniform.mean()) >= self._BW_AUTO_FRAC

    def _maybe_mark_blockwise(self, tables: tuple, ids,
                              prev_state: "StreamState") -> tuple:
        """Append the blockwise marker to a freshly picked per-stream tables
        tuple when the auto policy applies.  `ids` is the concrete numpy id
        layout, or None when the caller passed a traced array — then the
        previous state's decision is preserved (there is nothing concrete
        to inspect, and flipping structure under jit would be an error
        anyway)."""
        if (
            self.blockwise_palettes != "auto"
            or len(tables) != 1
            or self.colormap_backend != "pallas"
        ):
            return tables  # forced/off, static, generic, or XLA colormap
        if ids is None:
            if (
                prev_state.tables
                and prev_state.tables[-1].ndim == 1
                and prev_state.tables[-1].size == 0
            ):
                return tables + (self._bw_marker(),)
            return tables
        s = prev_state.palette_id.shape[0]
        layout = np.broadcast_to(np.asarray(ids, np.int64), (s,))
        if self._blockwise_auto_decision(layout):
            return tables + (self._bw_marker(),)
        return tables

    # ---------------------------------------------------------- palette sort
    def _palette_sort_eligible(self, tables: tuple) -> bool:
        """palette_sort engages only where the blockwise kernel exists: the
        fused Pallas chain with the single-array built-in table registry."""
        return (
            self.palette_sort
            and self.fused_chain
            and self.colormap_backend == "pallas"
            and self.static_table is None
            and self.builtin_tables is not None
            and len(tables) == 1
        )

    def _maybe_sort_palettes(self, tables: tuple, ids,
                             prev_state: "StreamState"):
        """(t_sorted, perm, inv) replacing a freshly picked 1-tuple when
        palette_sort applies, else None.  `ids` is the concrete numpy id
        layout or None (traced set_palette — the previous state's sortedness
        is preserved by re-applying its permutation to the new tables, the
        same class-preservation rule as the blockwise marker)."""
        if not self._palette_sort_eligible(tables):
            return None
        s = prev_state.palette_id.shape[0]
        if ids is None:
            pi = self._state_perm(prev_state)
            if pi is None:
                return None
            perm, inv = pi
            glob = self._tables_perm_global(prev_state.tables)
            gp = self._global_perm(perm, s, glob)
            t2 = jnp.take(tables[0], gp, axis=0)
            return (t2, perm, inv, self._bw_marker()) if glob else (
                t2, perm, inv)
        layout = np.broadcast_to(np.asarray(ids, np.int64), (s,))
        if self._blockwise_auto_decision(layout):
            return None  # already clustered: marker path, no gathers
        sh = getattr(prev_state.palette_id, "sharding", None)
        if sh is not None and len(getattr(sh, "device_set", ())) > 1:
            # sharded state: sort PER SHARD SLICE (view blocks = shard
            # slices, perm values global-but-confined) so every device's
            # local view stays self-contained under shard_map and the
            # GSPMD gathers never cross ICI.  Carry-sort mode only, same
            # gate as the whole-state global sort.
            if (
                not self.carry_sort_mode
                or self.blockwise_palettes not in ("auto", True)
            ):
                return None
            shard = sh.shard_shape((s,))[0]
            if shard >= s or s % shard:
                return None
            return self._view_sorted_tables(tables, layout, shard)
        return self._sorted_tables(tables, layout)

    def _sorted_tables(self, tables: tuple, layout: np.ndarray):
        """Stable per-sort-block argsort of a concrete scattered layout.
        Sort blocks coincide with the stream blocks `_push_blocked` will
        slice (so the stored BLOCK-RELATIVE perm/inv stay valid after
        slicing).  When the per-block sort fails the blockwise economics
        but a GLOBAL sort passes — the stream-blocked regime, where
        4096-block sorting shrinks the palette runs below the colormap
        block size (19 palettes -> 215-stream runs vs ts=128 at 16k+
        streams) while a whole-state sort keeps ~860-stream runs inside
        every block — fall back to `_global_sorted_tables`.  Returns None
        when neither form pays (more distinct palettes than rows per
        colormap block — gathers would buy nothing)."""
        s = int(layout.shape[0])
        bs = self._push_block_streams(s) or s
        perm = np.empty(s, np.int32)
        inv = np.empty(s, np.int32)
        sorted_layout = np.empty_like(layout)
        for b0 in range(0, s, bs):
            b1 = min(b0 + bs, s)
            p = np.argsort(layout[b0:b1], kind="stable").astype(np.int32)
            perm[b0:b1] = p
            inv[b0:b1][p] = np.arange(b1 - b0, dtype=np.int32)
            sorted_layout[b0:b1] = layout[b0:b1][p]
        if not self._blockwise_auto_decision(sorted_layout):
            return self._global_sorted_tables(tables, layout, bs)
        gp = perm + (np.arange(s, dtype=np.int32) // bs).astype(np.int32) * bs
        return (
            jnp.take(tables[0], jnp.asarray(gp), axis=0),
            jnp.asarray(perm),
            jnp.asarray(inv),
        )

    def _global_sorted_tables(self, tables: tuple, layout: np.ndarray,
                              bs: int):
        """GLOBAL palette sort (round 4 late, the stream-blocked regime):
        one whole-state stable argsort stored as a length-4 tuple
        (t_sorted, perm, inv, zero-size marker) — structurally distinct
        from the block-relative length-3 form.  `_push_core` permutes the
        incoming chunk ONCE before block slicing and unpermutes the packed
        output after reassembly; the blocks themselves see a plain
        blockwise-marked state (contiguous slices of the sorted order), so
        the per-block push body needs no perm logic at all.  Carry-sort
        mode only: the carry lives globally sorted between pushes — the
        mag-bridge would need a per-block permute that crosses block
        boundaries, which the blocked push cannot express."""
        s = int(layout.shape[0])
        if (
            bs >= s  # flat push: the per-block sort WAS the global sort
            or not self.carry_sort_mode
            or self.blockwise_palettes not in ("auto", True)
        ):
            return None
        return self._view_sorted_tables(tables, layout, s)

    def _view_sorted_tables(self, tables: tuple, layout: np.ndarray,
                            view_bs: int):
        """Length-4 sorted tuple with VIEW blocks of `view_bs` streams:
        one stable argsort per view block, perm/inv holding GLOBAL
        external indices confined to their block.  view_bs = s is the
        whole-state global sort; view_bs = the shard slice size is the
        mesh form (`parallel.mesh.shard_state`), where each device's
        local slice is self-contained — `_push_global_sorted` recovers
        block-local indices by subtracting the slice minimum (= the
        block offset), so the same state pushes correctly single-process,
        under GSPMD jit, and inside shard_map local views.  Returns None
        when the view-sorted layout fails the blockwise economics."""
        s = int(layout.shape[0])
        perm = np.empty(s, np.int32)
        inv = np.empty(s, np.int32)
        sorted_layout = np.empty_like(layout)
        for b0 in range(0, s, view_bs):
            b1 = min(b0 + view_bs, s)
            p = b0 + np.argsort(layout[b0:b1], kind="stable").astype(np.int32)
            perm[b0:b1] = p
            inv[p] = np.arange(b0, b1, dtype=np.int32)
            sorted_layout[b0:b1] = layout[p]
        if not self._blockwise_auto_decision(sorted_layout):
            return None
        return (
            jnp.take(tables[0], jnp.asarray(perm), axis=0),
            jnp.asarray(perm),
            jnp.asarray(inv),
            self._bw_marker(),
        )

    @staticmethod
    def _tables_perm(t: tuple):
        """(perm, inv) when a tables tuple is palette-sorted.  The sorted
        tuples are structurally unambiguous: built-in states are 1-tuples
        (+ zero-size marker), generic states 2-tuples — only sorted states
        have length 3 (block-relative perm) or 4 (GLOBAL perm, trailing
        zero-size marker; see `_tables_perm_global`)."""
        if (
            len(t) in (3, 4)
            and t[1].ndim == 1 and t[1].size
            and t[2].ndim == 1 and t[2].size
            and (len(t) == 3 or (t[3].ndim == 1 and not t[3].size))
        ):
            return t[1], t[2]
        return None

    @staticmethod
    def _tables_perm_global(t: tuple) -> bool:
        """True when a sorted tables tuple stores a GLOBAL permutation
        (length-4 form): perm/inv index the whole state, not block-local
        slices — handled at the `_push_core` level, above block slicing."""
        return len(t) == 4 and SpectrogramPipeline._tables_perm(t) is not None

    def _state_perm(self, state: "StreamState"):
        return self._tables_perm(state.tables)

    def _resorted_carry(self, prev_state: "StreamState",
                        new_tables: tuple) -> jax.Array:
        """Carry-sort mode: keep the carry's stream order consistent with
        the tables tuple across set_palette transitions — unpermute back to
        external order when leaving the sorted class, (re-)permute when
        entering or changing layouts.  Identity transitions (traced
        set_palette preserving the same perm arrays) skip both takes."""
        carry = prev_state.carry
        if not self.carry_sort_mode:
            return carry
        old = self._state_perm(prev_state)
        new = self._tables_perm(new_tables)
        if old is not None and new is not None and old[0] is new[0]:
            return carry
        s = prev_state.palette_id.shape[0]
        if old is not None:
            carry = jnp.take(
                carry,
                self._global_perm(
                    old[1], s, self._tables_perm_global(prev_state.tables)
                ),
                axis=0,
            )
        if new is not None:
            carry = jnp.take(
                carry,
                self._global_perm(
                    new[0], s, self._tables_perm_global(new_tables)
                ),
                axis=0,
            )
        return carry

    def _global_perm(self, perm: jax.Array, s: int,
                     glob: bool = False) -> jax.Array:
        """Block-relative perm -> global row indices (for table re-picks).
        `glob=True` (the length-4 global-sort form, `_tables_perm_global`):
        the stored perm already IS global — returned unchanged."""
        if glob:
            return perm
        bs = self._push_block_streams(s) or s
        off = (jnp.arange(s, dtype=jnp.int32) // bs) * bs
        return off + perm

    def output_perm(self, state: "StreamState"):
        """Host-side row index for `sorted_output` pipelines: when not None,
        `out[output_perm(state)[s_]]` is external stream s_'s rows in the
        push output (and rows arrive in sorted order otherwise identical).
        None whenever the state is unsorted — the output is then already
        external-order.  Returns numpy (the drain layer indexes host rows)."""
        if not self.sorted_output:
            return None
        pi = self._state_perm(state)
        if pi is None:
            return None
        s = state.palette_id.shape[0]
        return np.asarray(
            self._global_perm(pi[1], s, self._tables_perm_global(state.tables))
        )

    def input_perm(self, state: "StreamState"):
        """Host-side chunk order for `presorted_input` pipelines: when not
        None, the pushed chunk's row i must carry external stream
        input_perm(state)[i]'s PCM (i.e. chunk_sorted = chunk_external
        [input_perm]).  None whenever the state is unsorted — deliver
        external order.  Re-query after every set_palette / shard_state:
        the sort permutation changes with the palette layout."""
        pi = self._state_perm(state)
        if pi is None:
            return None
        s = state.palette_id.shape[0]
        return np.asarray(
            self._global_perm(pi[0], s, self._tables_perm_global(state.tables))
        )

    def input_dest(self, state: "StreamState"):
        """Destination-row array for the drain layer (the `dest` parameter
        of `RingBank*.pop_matrix*`): external stream e's frames land in
        chunk row input_dest(state)[e].  The inverse permutation of
        `input_perm`; None when the state is unsorted (drain without
        dest).  uint64, ready for the native perm drains."""
        p = self.input_perm(state)
        if p is None:
            return None
        return np.argsort(p).astype(np.uint64)

    def unsort_state(self, state: "StreamState") -> "StreamState":
        """Return `state` in external stream order with the palette sort
        dropped (identity for unsorted states): the per-stream tables fall
        back to the plain per-row 1-tuple and, in carry-sort mode, the
        carry unpermutes.  `parallel.mesh.shard_state(state, mesh,
        pipeline)` calls this before re-sorting PER SHARD SLICE; use it
        directly to leave the sorted class entirely."""
        pi = self._state_perm(state)
        if pi is None:
            return state
        _, inv = pi
        s = state.palette_id.shape[0]
        g_inv = self._global_perm(
            inv, s, self._tables_perm_global(state.tables)
        )
        carry = state.carry
        if self.carry_sort_mode:
            carry = jnp.take(carry, g_inv, axis=0)
        return state._replace(
            carry=carry, tables=(jnp.take(state.tables[0], g_inv, axis=0),)
        )

    @staticmethod
    def _row_perm(perm: jax.Array, s: int, k: int) -> jax.Array:
        """Extend a [s]-stream permutation to the window-major [s*k] row
        layout (row r*s + s_) the fused entry points emit."""
        if k == 1:
            return perm
        off = jnp.arange(k, dtype=jnp.int32)[:, None] * s
        return (off + perm[None, :]).reshape(-1)

    def restored_tables_for(self, palette_id) -> tuple:
        """state_tables_for + the blockwise-auto decision re-applied from
        CONCRETE ids — for checkpoint restore, where palette_id is real
        data (the persisted layout keeps its kernel class across a
        save/load cycle)."""
        tables = self.state_tables_for(jnp.asarray(palette_id, jnp.int32))
        if not getattr(palette_id, "is_fully_addressable", True):
            return tables
        layout = np.asarray(palette_id, np.int64)
        if (
            self.blockwise_palettes == "auto"
            and len(tables) == 1
            and self.colormap_backend == "pallas"
            and self._blockwise_auto_decision(layout)
        ):
            return tables + (self._bw_marker(),)
        # palette_sort layout class survives a save/load cycle too: the
        # persisted ids are concrete, so re-derive the sorted tuple (same
        # precedence as set_palette: already-clustered layouts never sort).
        if self._palette_sort_eligible(tables) and not (
            self._blockwise_auto_decision(layout)
        ):
            sorted_t = self._sorted_tables(tables, layout)
            if sorted_t is not None:
                return sorted_t
        return tables

    def _state_blockwise(self, state: "StreamState") -> bool:
        """Trace-time blockwise flag for this state: forced True, the auto
        marker present in the tables tuple, or a palette-sorted state (whose
        tables are clustered by construction — the sort only exists to feed
        the blockwise kernel, independent of the blockwise_palettes knob)."""
        if self.blockwise_palettes is True:
            return True
        if self._state_perm(state) is not None:
            return True
        return (
            self.blockwise_palettes == "auto"
            and bool(state.tables)
            and state.tables[-1].ndim == 1
            and state.tables[-1].size == 0
        )

    def state_tables_for(self, palette_id: jax.Array) -> tuple:
        """The pre-picked kernel-table tuple for a [S] palette-id array:
        () for static-palette pipelines, ([S, R*4],) built-in registry,
        (u, v) generic.  Ids are clamped to the registry (an out-of-range id
        under the old per-push one-hot rendered black; the reference's GL
        sampler clamps, ADVICE r3)."""
        if self.static_table is not None:
            return ()
        pid = jnp.clip(palette_id, 0, len(self.schemes) - 1)

        def pick(t):
            onehot = jax.nn.one_hot(pid, t.shape[0], dtype=t.dtype)
            return jnp.dot(onehot, t, precision=jax.lax.Precision.HIGHEST)

        if self.builtin_tables is not None:
            return (pick(self.builtin_tables),)
        u, v = self.generic_tables
        return (pick(u), pick(v))

    # ------------------------------------------------------------------- push

    @functools.partial(jax.jit, static_argnums=0, donate_argnums=1)
    def push(self, state: StreamState, chunk: jax.Array):
        """Jitted `push_impl`; the state is donated so the ring updates in
        place in HBM."""
        return self.push_impl(state, chunk)

    @functools.partial(jax.jit, static_argnums=0, donate_argnums=1)
    def push_planar(self, state: StreamState, chunk_planar: jax.Array):
        """As push, but the chunk arrives channels-planar [S, 2, chunk_size]
        (e.g. from RingBank.pop_matrix_planar) — skips the device-side
        transpose at the ingestion edge."""
        return self.push_planar_impl(state, chunk_planar)

    def _validate_i16_planes(self) -> None:
        """i16_planes is scoped to the fused packed STFT paths: k=1
        window planes and the k>1 all-windows kernel (both cast in-VMEM
        with the wire scale folded into Hann).  The XLA fallback paths,
        the buf/tsplit/transposed-carry variants, and non-packed plans
        convert at the edge instead — they would need int16 variants of
        every kernel."""
        if not getattr(self, "i16_planes", False):
            return
        if not (
            self.fused_chain
            and self.stft_packed
            and (self.chunk_hops == 1 or self.allk_framing)
            and not self.carry_transposed
            and not self.tsplit_framing
        ):
            raise ValueError(
                "i16_planes requires the fused packed STFT path (k=1 "
                "planes or k>1 allk framing; "
                f"fused_chain={self.fused_chain}, "
                f"stft_packed={self.stft_packed}, "
                f"chunk_hops={self.chunk_hops}, "
                f"allk={getattr(self, 'allk_framing', False)})"
            )

    def _chunk_in(self, chunk: jax.Array) -> jax.Array:
        """Wire-dtype edge dispatch: i16_planes pipelines keep int16
        samples raw (the kernel casts in-VMEM, scale folded into Hann);
        everything else converts via _chunk_f32."""
        if self.i16_planes:
            if chunk.dtype != jnp.int16:
                raise ValueError(
                    "i16_planes pipelines require int16 chunks (the wire "
                    f"dtype; RingBank16.pop_matrix_i16_planar); got "
                    f"{chunk.dtype}"
                )
            return chunk
        return self._chunk_f32(chunk)

    @staticmethod
    def _chunk_f32(chunk: jax.Array) -> jax.Array:
        """Wire-dtype edge: float chunks cast to f32; int16 chunks are raw
        PCM words and scale by 1/32768 ON DEVICE (exactly the scale the
        native bank's f32 drains apply host-side, ring_buffer.cpp
        pop16_range_planar) — pushing int16 halves the host->device
        transfer bytes and the multiply fuses into the framing pass.
        The dtype is part of the traced aval, so each wire format compiles
        its own graph; no runtime branch exists."""
        if chunk.dtype == jnp.int16:
            return chunk.astype(jnp.float32) * jnp.float32(1.0 / 32768.0)
        return chunk.astype(jnp.float32)

    def push_planar_impl(self, state: StreamState, chunk_planar: jax.Array):
        if chunk_planar.ndim != 3 or chunk_planar.shape[1:] != (2, self.chunk_size):
            raise ValueError(
                f"planar chunk must be [S, 2, {self.chunk_size}]; got "
                f"{chunk_planar.shape}"
            )
        return self._push_core(state, self._chunk_in(chunk_planar))

    def push_impl(self, state: StreamState, chunk: jax.Array):
        """Advance all streams by one chunk (pure, untraced — used directly
        by `push` and by `parallel.mesh` under shard_map/pjit).

        chunk: [S, chunk_size, 2] f32 PCM.
        Returns (new_state, rgba) with rgba [S, chunk_hops, H, 4] u8 — the
        freshly produced colormapped rows (streaming product).
        """
        cfg = self.cfg
        k = self.chunk_hops
        if chunk.ndim != 3 or chunk.shape[1:] != (self.chunk_size, 2):
            raise ValueError(
                f"chunk must be [S, {self.chunk_size}, 2] "
                f"(chunk_hops={k} x hop={cfg.hop_size}); got {chunk.shape}"
            )
        # One small transpose at the ingestion edge; everything downstream is
        # channels-planar (transposing the full carry+chunk buffer instead
        # cost ~0.8 ms/push at 4k streams, trace-verified).  push_planar
        # skips even this when the host supplies planar chunks.
        chunk_pl = jnp.swapaxes(self._chunk_in(chunk), 1, 2)  # [S, 2, T]
        return self._push_core(state, chunk_pl)

    def _push_core(self, state: StreamState, chunk_pl: jax.Array):
        if self.sanitize_input and chunk_pl.dtype == jnp.float32:
            # int16 wire chunks cannot carry NaN/inf — nothing to scrub
            chunk_pl = jnp.where(jnp.isfinite(chunk_pl), chunk_pl, 0.0)
        bs = self._push_block_streams(chunk_pl.shape[0])
        if self._tables_perm_global(state.tables):
            return self._push_global_sorted(state, chunk_pl, bs)
        if bs:
            return self._push_blocked(state, chunk_pl, bs)
        return self._push_one_block(state, chunk_pl)

    def _push_global_sorted(self, state: StreamState, chunk_pl: jax.Array,
                            bs: int):
        """Push a GLOBALLY palette-sorted state (length-4 tables tuple):
        permute the incoming chunk once into the carry's sorted order,
        run the body on a plain blockwise-marked state — the stream blocks
        slice contiguous ranges of the sorted order, so no per-block perm
        logic exists — and unpermute the packed rows once at the end.
        Carry-sort mode only (`_global_sorted_tables` gates creation):
        the carry is at rest globally sorted, so the mag planes come out
        of the STFT already in table order.

        perm/inv hold GLOBAL external indices confined to their view
        block (`_view_sorted_tables`).  Subtracting the slice minimum
        maps them to THIS view's local index space: a no-op for whole-
        state views (min 0, so GSPMD jit over a sharded state stays
        globally correct too) and the shard-offset removal inside
        shard_map local views, where this function only ever sees one
        self-contained block."""
        perm, inv = self._state_perm(state)
        perm = perm - jnp.min(perm)
        inv = inv - jnp.min(inv)
        if not self.presorted_input:
            chunk_pl = jnp.take(chunk_pl, perm, axis=0)
        inner = state._replace(tables=(state.tables[0], self._bw_marker()))
        if bs:
            new_state, rgba = self._push_blocked(inner, chunk_pl, bs)
        else:
            new_state, rgba = self._push_one_block(inner, chunk_pl)
        if not self.sorted_output:
            rgba = jnp.take(rgba, inv, axis=0)
        return new_state._replace(tables=state.tables), rgba

    # Auto stream-blocking threshold: flat wins at 10,240 (8.06 vs 8.61
    # ms blocked — the scoped-memory regime still holds), blocked wins
    # from the measured crossover up (see exp_blocked_push RESULTs).
    _STREAM_BLOCK_AUTO_MIN = 12288
    _STREAM_BLOCK_SIZE = 4096

    def _push_block_streams(self, s: int) -> int:
        """Stream-block size for this push (0 = flat).  Auto blocks only
        the k=1 fused streaming config (store_ring=False) — the measured
        wins; other shapes are unmeasured and stay flat unless the user
        passes an explicit block size."""
        sb = self.stream_blocks
        if sb == "auto":
            if (
                self.fused_chain
                and self.chunk_hops == 1
                and not self.store_ring
                and s >= self._STREAM_BLOCK_AUTO_MIN
            ):
                return self._STREAM_BLOCK_SIZE
            return 0
        return sb if 0 < sb < s else 0

    def _push_blocked(self, state: StreamState, chunk_pl: jax.Array,
                      bs: int):
        """Unrolled stream-blocked push: slice the per-stream state leaves
        into bs-stream blocks, run the normal push body per block, and
        reassemble.  Bitwise-identical to the flat push (the kernels are
        row-blocked already; only XLA's memory-space assignment changes).
        Scalars (cursor, row_count) advance identically in every block;
        palette tables and ids are read-only under push and pass through."""
        s = chunk_pl.shape[0]
        nb = -(-s // bs)
        per_stream_ring = state.ring.ndim >= 1 and state.ring.shape[0] == s

        def blk(x, b):
            return x[b * bs : min((b + 1) * bs, s)]

        new_blocks = []
        outs = []
        for b in range(nb):
            st_b = StreamState(
                carry=blk(state.carry, b),
                ring=blk(state.ring, b) if per_stream_ring else state.ring,
                cursor=state.cursor,
                palette_id=blk(state.palette_id, b),
                row_count=state.row_count,
                tables=tuple(
                    blk(t, b) if t.shape[0] == s else t
                    for t in state.tables
                ),
            )
            nst, rgba = self._push_one_block(st_b, blk(chunk_pl, b))
            new_blocks.append(nst)
            outs.append(rgba)
        n0 = new_blocks[0]
        new_state = StreamState(
            carry=jnp.concatenate([n.carry for n in new_blocks], axis=0),
            ring=(
                jnp.concatenate([n.ring for n in new_blocks], axis=0)
                if per_stream_ring else n0.ring
            ),
            cursor=n0.cursor,
            palette_id=state.palette_id,
            row_count=n0.row_count,
            tables=state.tables,
        )
        return new_state, jnp.concatenate(outs, axis=0)

    def _push_one_block(self, state: StreamState, chunk_pl: jax.Array):
        cfg = self.cfg
        k = self.chunk_hops
        if self.carry_sort_mode:
            # Sorted-carry fast mode: the carry is at rest in sorted order;
            # permute the incoming chunk to match (one gather XLA fuses
            # into the framing concat) — the mag planes then come out of
            # the STFT already sorted, no per-push mag takes.  perm is
            # block-relative, which IS this block's local index space.
            pi = self._state_perm(state)
            if pi is not None and not self.presorted_input:
                chunk_pl = jnp.take(chunk_pl, pi[0], axis=0)
        if self.tsplit_framing:
            return self._push_fused_tsplit(state, chunk_pl)
        if self.carry_transposed:
            return self._push_fused_t(state, chunk_pl)
        if self.fused_chain:
            # Split-channel framing: per-channel 2D sample planes.  The
            # strided channel reads fuse into the concat copies; at k=1 the
            # planes ARE the kernel's window operands — the [S, W]-per-
            # channel extraction copies of the 3D-buf formulation (1.2 ms
            # at 10,240 streams, profiler-measured round 2) never exist.
            c = self.carry_size
            t = self.chunk_size
            buf_l = jnp.concatenate(
                [state.carry[:, 0, :], chunk_pl[:, 0, :]], axis=1
            )                                                  # [S, C+T]
            buf_r = jnp.concatenate(
                [state.carry[:, 1, :], chunk_pl[:, 1, :]], axis=1
            )
            if self.allk_framing:
                return self._push_fused_allk(state, buf_l, buf_r, chunk_pl)
            # next carry = last C samples of the buffer, built from the
            # SOURCES (old-carry tail + chunk) rather than slices of buf:
            # same bytes, but no dependency on the materialized buf planes
            # (drops one stack pass from the 10k framing glue)
            if t >= c:
                new_carry = chunk_pl[:, :, t - c:]
            else:
                new_carry = jnp.concatenate(
                    [state.carry[:, :, t:], chunk_pl], axis=2
                )
            return self._push_fused(state, buf_l, buf_r, new_carry)
        buf = jnp.concatenate([state.carry, chunk_pl], axis=2)    # [S, 2, C+T]
        new_carry = buf[:, :, buf.shape[2] - self.carry_size :]
        rows = self._stft_planar_buf(buf)  # [S, k, 2, B] f32

        if self.store_ring:
            ring = jax.lax.dynamic_update_slice(
                state.ring,
                rows.astype(self.ring_dtype),
                (0, state.cursor, 0, 0),
            )
        else:
            ring = state.ring
        cursor = (state.cursor + k) % self.viewport_rows

        rgba_u8 = self._colormap_u8(
            rows, state.palette_id, picked=self._state_tables(state),
            blockwise=self._state_blockwise(state),
        )
        new_state = StreamState(
            carry=new_carry,
            ring=ring,
            cursor=cursor,
            palette_id=state.palette_id,
            row_count=state.row_count + k,
            tables=state.tables,
        )
        return new_state, rgba_u8

    def _push_fused_allk(self, state: StreamState, buf_l: jax.Array,
                         buf_r: jax.Array, chunk_pl: jax.Array):
        """All-windows fused push (round 4): the kernel slices the k
        hop-shifted windows out of the carry+chunk planes in VMEM — no
        materialized window planes (see stft_mag_fused2_allk).  Next carry
        builds from the sources like the planes path (the kernel's
        emit_carry output measured no better; the concat from sources is
        one fused pass)."""
        from spectrogram_tpu.ops.pallas import stft_kernel

        cfg = self.cfg
        s = buf_l.shape[0]
        c, t = self.carry_size, self.chunk_size
        mag_l, mag_r = stft_kernel.stft_mag_fused2_allk(
            buf_l, buf_r, cfg, k=self.chunk_hops,
            precision=self.precision_stft, interpret=self.kernel_interpret,
            plan=self.fft_plan, lane_pad=self.stft_lane_pad,
            padded_layout=self.stft_lane_pad,
            packed=self.stft_packed,
            unpack_split=self.stft_unpack_split,
        )
        if t >= c:
            new_carry = chunk_pl[:, :, t - c:]
        else:
            new_carry = jnp.concatenate(
                [state.carry[:, :, t:], chunk_pl], axis=2
            )
        return self._fused_tail(state, mag_l, mag_r, new_carry, s)

    def _push_fused(self, state: StreamState, buf_l: jax.Array,
                    buf_r: jax.Array, new_carry):
        """Fully-kernelized push: fused Pallas STFT -> fused Pallas colormap
        with a full-half-spectrum handoff (no bin-slice pass).  Operands are
        per-channel [S, W + (k-1)*hop] sample planes (split-channel framing)."""
        from spectrogram_tpu.ops.pallas import stft_kernel

        cfg = self.cfg
        k = self.chunk_hops
        s = buf_l.shape[0]
        w, h = cfg.window_size, cfg.hop_size
        if (
            k > 1
            and not self.stft_lane_pad
            and stft_kernel.buf_framing_supported(cfg, k, self.fft_plan)
        ):
            # Zero-copy framing: the kernel DMAs each hop-shifted window out
            # of the channel planes via element-offset BlockSpecs — avoids
            # materializing k overlapping [S, W] window planes.
            mag_l, mag_r = stft_kernel.stft_mag_fused2_buf(
                buf_l, buf_r, cfg, k=k, precision=self.precision_stft,
                interpret=self.kernel_interpret, plan=self.fft_plan,
                # untransposed dT blocks OOM at 64 (exp_stft_r3): cap at 32
                block_rows=min(self.stft_block_rows or 32, 32),
            )  # [S*k, N/2] incl DC, window r of stream s at row r*S + s
        else:
            # window planes [S*k, W] per channel; at k=1 the channel planes
            # ARE the windows — no copy at all (round-3 framing win).
            lefts = [buf_l[:, r * h : r * h + w] for r in range(k)]
            rights = [buf_r[:, r * h : r * h + w] for r in range(k)]
            left = jnp.concatenate(lefts, axis=0) if k > 1 else lefts[0]
            right = jnp.concatenate(rights, axis=0) if k > 1 else rights[0]
            # NOTE row order for k>1 is [r0 streams.., r1 streams..]; remapped below.
            mag_l, mag_r = stft_kernel.stft_mag_fused2(
                left, right, cfg, slice_bins=False,
                precision=self.precision_stft,
                interpret=self.kernel_interpret, plan=self.fft_plan,
                block_rows=self.stft_block_rows,
                lane_pad=self.stft_lane_pad,
                padded_layout=self.stft_lane_pad,
                packed=self.stft_packed,
                unpack_split=self.stft_unpack_split,
            )  # [S*k, N/2] incl DC (padded bin layout when stft_lane_pad)
        return self._fused_tail(state, mag_l, mag_r, new_carry, s)

    def _push_fused_tsplit(self, state: StreamState, chunk_pl: jax.Array):
        """Split-state k=1 framing (round 4 late, MEASURED NEGATIVE — see
        stft_mag_fused2_tsplit; kept opt-in as evidence): the fused STFT
        kernel consumes the transposed carry STATE and the hop chunk as
        separate operands (stage 1 = two accumulating dots meeting at the
        carry/chunk boundary) and writes the next carry in-kernel — the
        per-push carry+chunk concat and the full-buffer operand transposes
        never exist, but the split stage-1 dots cost more MXU work than
        that glue (5.33 vs 4.87 ms/push at 10,240 streams on v5e)."""
        from spectrogram_tpu.ops.pallas import stft_kernel

        plan = self.fft_plan
        n1 = plan.n1
        s = chunk_pl.shape[0]
        t_cols = self.chunk_size // n1
        chunk_t = jnp.swapaxes(
            chunk_pl.reshape(s, 2, t_cols, n1), 2, 3
        )                                                # [S, 2, n1, T/n1]
        mag_l, mag_r, new_carry = stft_kernel.stft_mag_fused2_tsplit(
            state.carry, chunk_t, self.cfg,
            block_rows=self.stft_block_rows,
            precision=self.precision_stft,
            interpret=self.kernel_interpret,
            plan=plan, lane_pad=self.stft_lane_pad,
        )
        return self._fused_tail(state, mag_l, mag_r, new_carry, s)

    def _push_fused_t(self, state: StreamState, chunk_pl: jax.Array):
        """Transposed-carry fast path: the carry is stored [S, 2, n1, C/n1]
        (the kernel's native window layout), so the per-push framing is ONE
        chunk transpose (over the small chunk, not the full buffer) + a
        concat + a slice — the per-channel slice copies and the full-buffer
        transpose of the planar formulation never exist (HLO-verified)."""
        from spectrogram_tpu.ops.pallas import stft_kernel

        cfg = self.cfg
        k = self.chunk_hops
        plan = self.fft_plan
        n1, m = plan.n1, plan.m
        s = chunk_pl.shape[0]
        chunk_t = jnp.swapaxes(
            chunk_pl.reshape(s, 2, self.chunk_size // n1, n1), 2, 3
        )                                                  # [S, 2, n1, T/n1]
        buf_t = jnp.concatenate([state.carry, chunk_t], axis=3)
        cols = buf_t.shape[3]
        new_carry = buf_t[:, :, :, cols - self.carry_size // n1 :]
        if k == 1:
            x = buf_t                                      # cols == m
        else:
            hop_m = cfg.hop_size // n1
            x = jnp.concatenate(
                [buf_t[:, :, :, r * hop_m : r * hop_m + m] for r in range(k)],
                axis=0,
            )                                              # [k*S, 2, n1, m]
        mag_l, mag_r = stft_kernel.stft_mag_fused2_t(
            x, cfg, precision=self.precision_stft,
            interpret=self.kernel_interpret, plan=plan,
            block_rows=self.stft_block_rows,
        )
        return self._fused_tail(state, mag_l, mag_r, new_carry, s)

    def _fused_tail(self, state: StreamState, mag_l, mag_r, new_carry, s):
        """Shared back half of the fused push: banded colormap on the full
        half-spectrum planes, row reorder, ring update, pack."""
        cfg = self.cfg
        k = self.chunk_hops
        w = cfg.window_size
        if self.static_table is not None:
            tabs, static = None, self.static_table
        else:
            # Pre-picked [S, R*4] tables straight from the state; the kernel
            # re-reads the stream-s block for every window r via a modular
            # index map (table_period) — no per-push pick, no k-expansion.
            tabs, static = self._state_tables(state), None
        bw = self._state_blockwise(state)
        # palette_sort: permute the magnitude planes into sorted-stream
        # order so the colormap runs on the clustered layout the state's
        # tables were sorted for; the packed rows unpermute below.  Row
        # order is window-major (r*S + s_) for every fused entry point, so
        # one block-offset broadcast extends the stream perm to k windows.
        # The ring update keeps the UNsorted planes (external row order).
        pi = self._state_perm(state)
        if pi is not None and not self.carry_sort_mode:
            perm, inv = pi
            cm_l = jnp.take(mag_l, self._row_perm(perm, s, k), axis=0)
            cm_r = jnp.take(mag_r, self._row_perm(perm, s, k), axis=0)
        else:
            # carry-sort mode: the planes arrive pre-sorted (sorted carry +
            # permuted chunk) — only the packed rows unpermute below.
            cm_l, cm_r = mag_l, mag_r
        if self.cmap_segments_full is not None:
            packed = cmap_kernel.colormap_planes_banded(
                cm_l, cm_r, tabs, self.resample_t_full, cfg,
                self.cmap_segments_full,
                precision=self.precision_cmap,
                interpret=self.kernel_interpret,
                static_table=static,
                table_period=s,
                blockwise=bw,
            )                                                 # [S*k, H]
        else:
            packed = cmap_kernel.colormap_planes_builtin(
                cm_l, cm_r, tabs, self.resample_t_full, cfg,
                precision=self.precision_cmap,
                interpret=self.kernel_interpret,
                static_table=static,
                table_period=s,
                blockwise=bw,
            )                                                 # [S*k, H]
        if pi is not None and not self.sorted_output:
            packed = jnp.take(packed, self._row_perm(pi[1], s, k), axis=0)
        if k > 1:
            packed = packed.reshape(k, s, -1).swapaxes(0, 1)  # [S, k, H]
        else:
            packed = packed.reshape(s, 1, -1)
        if self.store_ring:
            if self.stft_lane_pad:
                mag_l, mag_r = self._unpad_mag(mag_l), self._unpad_mag(mag_r)
            rows_pl = jnp.stack(
                [mag_l[:, 1 : w], mag_r[:, 1 : w]], axis=1
            )  # [S*k, 2, B]
            if k > 1:
                rows_pl = rows_pl.reshape(k, s, 2, -1).swapaxes(0, 1)
            else:
                rows_pl = rows_pl.reshape(s, 1, 2, -1)
            ring = jax.lax.dynamic_update_slice(
                state.ring, rows_pl.astype(self.ring_dtype),
                (0, state.cursor, 0, 0),
            )
        else:
            ring = state.ring
        cursor = (state.cursor + k) % self.viewport_rows
        new_state = StreamState(
            carry=new_carry, ring=ring, cursor=cursor,
            palette_id=state.palette_id, row_count=state.row_count + k,
            tables=state.tables,
        )
        out = packed if self.packed_output else _unpack_rgba_device(packed)
        return new_state, out

    def _state_tables(self, state: StreamState):
        """The state's pre-picked kernel tables in entry-point form
        ([S, R*4] array or (u, v) tuple).  States from before the hoist
        (or hand-built in tests) carry tables=(): fall back to picking from
        palette_id on the fly — the round-3 behavior."""
        if self.static_table is not None:
            return None
        tabs = state.tables or self.state_tables_for(state.palette_id)
        tabs = tuple(t for t in tabs if t.ndim != 1)  # drop blockwise marker
        return tabs[0] if len(tabs) == 1 else tabs

    def _kernel_tables(self, palette_id: jax.Array, k: int, order: str):
        """Per-row colormap-kernel table operand(s) for `palette_id` [N]:
        a single [N*k, R*4] array (built-in registry) or a (u, v) tuple
        (generic two-table kernel).  `order` matches the caller's row
        layout for k > 1: "tile" = window-major ([r0 streams.., r1 ..],
        the fused chain), "repeat" = stream-major (reshape(s*k) layouts).

        One-hot matmul instead of a row gather: bitwise-exact (0/1 weights
        pick exact rows) and rides the MXU (the gather lowering is the known
        TPU hazard class, CLAUDE.md perf invariants).  Hot paths no longer
        call this per push — tables live pre-picked in StreamState."""
        tabs = self.state_tables_for(palette_id)
        tabs = tuple(self._expand_tables(t, k, order) for t in tabs)
        return tabs[0] if len(tabs) == 1 else tabs

    @staticmethod
    def _expand_tables(t: jax.Array, k: int, order: str) -> jax.Array:
        if k == 1 or t.shape[0] == 1:  # uniform tables serve any row count
            return t
        return jnp.tile(t, (k, 1)) if order == "tile" else jnp.repeat(t, k, axis=0)

    def _stft(self, pcm: jax.Array) -> jax.Array:
        """[S, T, 2] interleaved PCM -> [S, rows, 2, bins] planar rows."""
        if self.fft_plan is not None:
            return mxu_fft.stft_rows_split_planar(pcm, self.cfg, self.fft_plan)
        return stft_ops.stft_rows_planar(pcm, self.cfg)

    def _stft_planar_buf(self, buf: jax.Array) -> jax.Array:
        """[S, 2, T] planar buffer -> [S, k, 2, bins] planar rows; static
        slice framing (peek-window/skip-hop semantics)."""
        cfg = self.cfg
        w, h = cfg.window_size, cfg.hop_size
        n = stft_ops.num_rows(buf.shape[2], cfg)
        windows = jnp.stack(
            [buf[:, :, r * h : r * h + w] for r in range(n)], axis=1
        )  # [S, k, 2, W]
        if self.fft_plan is not None:
            return mxu_fft.stft_planar_windows(windows, cfg, self.fft_plan)
        interleaved = jnp.swapaxes(windows, -1, -2)  # fallback path
        return stft_ops.stft_frame_planar(interleaved, cfg)

    def _colormap_u8(
        self, rows: jax.Array, palette_id: jax.Array, picked=None,
        blockwise: bool | None = None,
    ) -> jax.Array:
        """[S, k, B, 2] magnitude rows -> [S, k, H, 4] u8 RGBA with a
        per-stream palette, via the selected backend.  `picked` short-cuts
        the palette pick with pre-picked [S, R*4] tables (state.tables) —
        rows here are stream-major, so they still k-expand with repeat."""
        s, k = rows.shape[0], rows.shape[1]
        if blockwise is None:
            blockwise = self.blockwise_palettes is True
        if self.colormap_backend == "pallas":
            flat = rows.reshape(s * k, 2, rows.shape[3])
            if self.static_table is not None:
                tabs, static = None, self.static_table
            elif picked is not None:
                pick_t = picked if isinstance(picked, tuple) else (picked,)
                tabs = tuple(
                    self._expand_tables(t, k, "repeat") for t in pick_t
                )
                tabs = tabs[0] if len(tabs) == 1 else tabs
                static = None
            else:
                tabs, static = self._kernel_tables(palette_id, k, order="repeat"), None
            if self.cmap_segments is not None:
                packed = cmap_kernel.colormap_planes_banded(
                    flat[:, 0, :], flat[:, 1, :], tabs, self.resample_t,
                    self.cfg, self.cmap_segments,
                    interpret=self.kernel_interpret,
                    static_table=static,
                    blockwise=blockwise,
                ).reshape(s, k, -1)
            else:
                packed = cmap_kernel.colormap_planes_builtin(
                    flat[:, 0, :], flat[:, 1, :], tabs, self.resample_t,
                    self.cfg, interpret=self.kernel_interpret,
                    static_table=static,
                    blockwise=blockwise,
                ).reshape(s, k, -1)
            if self.packed_output:
                return packed
            return _unpack_rgba_device(packed)
        rgba = self._colormap(rows, palette_id)
        if self.packed_output:
            q = jnp.clip(jnp.round(rgba * 255.0), 0.0, 255.0).astype(jnp.int32)
            return (
                q[..., 0] | (q[..., 1] << 8) | (q[..., 2] << 16) | (q[..., 3] << 24)
            )
        return cmap_ops.rgba_f32_to_u8(rgba)

    def _colormap(self, rows: jax.Array, palette_id: jax.Array) -> jax.Array:
        """[S, k, 2, B] planar magnitude rows -> [S, k, H, 4] f32 RGBA with a
        per-stream palette (XLA-composed path)."""
        cfg = self.cfg
        pixels = jnp.einsum(
            "skcb,bh->skch",
            rows,
            self.resample_t,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        left, right = pixels[..., 0, :], pixels[..., 1, :]
        mag = cmap_ops.db_normalize(left, right, cfg)
        pan = cmap_ops.pan_fraction(left, right)
        # Per-stream palettes via the rank-1 LUT factorization: a per-pixel
        # gather from [S, r, r, 4] scalarizes on TPU (~20x the whole push
        # cost); two tent-basis matmuls against [S, r, 4] tables are exact
        # and ride the MXU.
        return cmap_ops.sample_lut_factored(
            self.lut_u[palette_id], self.lut_v[palette_id], pan, mag
        )

    # ----------------------------------------------------------------- render

    @functools.partial(jax.jit, static_argnums=(0, 2))
    def render_viewport(
        self, state: StreamState, width: int | None = None
    ) -> jax.Array:
        """Full scrolling viewport per stream: [S, R, H, 4] u8 RGBA,
        chronological (oldest row first) — the batch analog of the fragment
        shader's `(uv.x * rows + offset) / rows` time wrap
        (gpu_spectrogram.rs:166-171).

        `width` renders the viewport at any time-axis size, matching the GL
        widget's width-independent display: the ring texture is sampled
        bilinearly along continuous uv.x (gpu_spectrogram.rs:166-174, the
        Linear sampler at :285) — here a two-tap interpolation matmul over
        the row axis, in magnitude space BEFORE the colormap exactly like
        GL filters the F16 texture before the shader laws.  Edge policy is
        clamp (DESIGN.md D2; the reference's Repeat wrap is a sampler
        artifact).

        Reads the bf16 ring, so output precision matches the texture path,
        not the f32 streaming path.
        """
        ordered = jnp.roll(state.ring, -state.cursor, axis=1).astype(jnp.float32)
        if width is not None and width != self.viewport_rows:
            m = jnp.asarray(_time_resample_matrix(self.viewport_rows, width))
            ordered = jnp.einsum(
                "rw,srcb->swcb", m, ordered,
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
        if self._state_perm(state) is not None:
            # Sorted states keep their kernel tables in SORTED stream order
            # for the push hot path; the ring is external-order, so re-pick
            # unsorted tables from the ids here (occasional display path —
            # the round-3 per-render pick cost is fine off the hot loop).
            return self._colormap_u8(ordered, state.palette_id)
        return self._colormap_u8(
            ordered, state.palette_id, picked=self._state_tables(state),
            blockwise=self._state_blockwise(state),
        )

    @functools.partial(jax.jit, static_argnums=0)
    def composite(self, rgba_u8: jax.Array, palette_id: jax.Array) -> jax.Array:
        """Blend [S, ..., 4] u8 RGBA rows over each stream's palette
        background (frame clear + alpha blend, gpu_spectrogram.rs:278-293)."""
        bg = self.backgrounds[palette_id]  # [S, 3] u8
        rgba = rgba_u8.astype(jnp.float32) / 255.0
        shape = (rgba.shape[0],) + (1,) * (rgba.ndim - 2) + (3,)
        return cmap_ops.composite_over_background(rgba, bg.reshape(shape) * 1.0)

    # ------------------------------------------------------------ one-shot API

    def process(self, pcm: jax.Array, palette_id: int | None = None):
        """Non-streaming convenience: [S, T, 2] (or [T, 2]) PCM -> u8 RGBA
        rows for all complete windows. Matches push()-ing the same samples
        in hop-multiple chunks.  Default palette: the pinned static_palette
        when set, else 1 (Magma, the reference widget's default)."""
        if palette_id is None:
            palette_id = (
                self.static_palette_id
                if self.static_palette_id is not None
                else 1
            )
        squeeze = pcm.ndim == 2
        if squeeze:
            pcm = pcm[None]
        if self.sanitize_input:
            # same ingestion-edge guard as _push_core — process() must keep
            # matching push() under every option
            pcm = jnp.where(jnp.isfinite(pcm), pcm, 0.0)
        rows = self._stft(pcm)
        pid = jnp.full((pcm.shape[0],), palette_id, jnp.int32)
        rgba = self._colormap_u8(rows, pid)
        return rgba[0] if squeeze else rgba


@functools.lru_cache(maxsize=32)
def _time_resample_matrix(rows: int, width: int) -> "np.ndarray":
    """[rows, width] two-tap bilinear time-resample matrix implementing the
    GL texel sampling law: output column j reads continuous coordinate
    x = (j + 0.5) / width * rows, i.e. lerp(texel floor(x-.5), next,
    frac) with clamp-to-edge taps (gpu_spectrogram.rs:166-174 + DESIGN D2).
    Works for both minification and magnification, like the GL sampler."""
    x = (np.arange(width) + 0.5) / width * rows - 0.5
    i0 = np.floor(x).astype(int)
    w = (x - i0).astype(np.float32)
    cols = np.arange(width)
    m = np.zeros((rows, width), np.float32)
    np.add.at(m, (np.clip(i0, 0, rows - 1), cols), 1.0 - w)
    np.add.at(m, (np.clip(i0 + 1, 0, rows - 1), cols), w)
    return m


def reference_pipeline(**overrides) -> SpectrogramPipeline:
    """Pipeline with the exact reference geometry (48 kHz, window 0.05 s,
    819.2 rows/s, 2048-row viewport)."""
    return SpectrogramPipeline(SpectrogramConfig(**overrides))
