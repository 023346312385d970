"""End-to-end A/B: v4 (transposed planes) vs dT-only (untransposed) at 10k.

The 10k HLO shows the v4 framing costs FOUR passes per channel (channel
slice -> concat -> {1,2,0} relayout -> {1,0} transpose copy).  The
dT-only kernel reads the [N, m, n1] free view of the concat directly
(no relayout, no transpose) but its middle-axis stage-1 contraction is
slower (1.84 vs 1.39 ms standalone at 4096).  Which wins END TO END at
10,240 streams is an empirical question — answered here with profiler
device times of the full push.

Run: python benchmarks/exp_stft_untw_e2e.py   (real TPU)

MEASURED (v5e, 2026-08-17), 10,240 streams, profiler device times:
  v4tw: total 6.728  stft 2.562  copies/pads 1.771
  untw: total 7.314  stft 2.647  copies/pads 2.273
NEGATIVE on both axes: the [N, m, n1] "free view" still forces a tiled
relayout copy to feed the Pallas operand, and without the transpose XLA
picks an even worse copy chain — the v4 transposed-plane formulation
stands.  The remaining ~1.8 ms of 10k framing glue is the floor of the
XLA-side formulation; further cuts need the kernel to consume carry +
chunk directly (in-kernel concat measured neutral in r2, lane-axis
transposed-carry measured negative in r3 — both ledgered).
"""
import sys, pathlib, functools
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from spectrogram_tpu.config import BENCH_CONFIG
from spectrogram_tpu.ops.mxu_fft import make_plan, _block_plan_constants
from spectrogram_tpu.ops.pallas import stft_kernel as sk
from benchmarks.profile_push import parse_trace

N_STREAMS = 10240
ITERS = 20


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "block_rows", "precision", "interpret",
                     "slice_bins", "plan"),
)
def stft_mag_fused2_untw(left, right, cfg, block_rows=None,
                         precision=jax.lax.Precision.HIGHEST,
                         interpret=False, slice_bins=True, plan=None):
    """stft_mag_fused2 with UNTRANSPOSED [N, m, n1] operands (free reshape
    view of the framing concat) + the flipped stage 2."""
    plan = plan or make_plan(cfg)
    n, w = left.shape
    ts = 32 if block_rows is None else min(block_rows, 32)
    if n % ts:
        pad = ts - n % ts
        left = jnp.pad(left, ((0, pad), (0, 0)))
        right = jnp.pad(right, ((0, pad), (0, 0)))
    n_pad = left.shape[0]
    n1, n2, m = plan.n1, plan.n2, plan.m
    half = (n1 // 2) * n2
    left3 = left.reshape(n_pad, m, n1)      # free view, no transpose
    right3 = right.reshape(n_pad, m, n1)
    hann2 = sk._scaled_hann(w, m, n1)
    f2cat, twr, twi, f1blk = _block_plan_constants(plan)
    twcat = np.concatenate([twr, twi], axis=1).astype(np.float32)

    def const_spec(arr):
        return pl.BlockSpec(arr.shape, lambda i: (0,)*arr.ndim, memory_space=pltpu.VMEM)

    kernel = functools.partial(sk._kernel2, plan=plan, precision=precision,
                               transposed=False)
    mag_l, mag_r = pl.pallas_call(
        kernel, grid=(n_pad // ts,),
        in_specs=[pl.BlockSpec((ts, m, n1), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)]*2
                 + [const_spec(c) for c in (hann2, f2cat, twcat, f1blk)],
        out_specs=[pl.BlockSpec((ts, n1//2, n2), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)]*2,
        out_shape=[jax.ShapeDtypeStruct((n_pad, n1//2, n2), jnp.float32)]*2,
        interpret=interpret,
    )(left3, right3, jnp.asarray(hann2), jnp.asarray(f2cat), jnp.asarray(twcat),
      jnp.asarray(f1blk))
    mag_l = mag_l.reshape(n_pad, half)[:n]
    mag_r = mag_r.reshape(n_pad, half)[:n]
    if slice_bins:
        return mag_l[:, 1:w], mag_r[:, 1:w]
    return mag_l, mag_r


def profile_variant(name):
    from spectrogram_tpu.models.spectrogram import SpectrogramPipeline

    p = SpectrogramPipeline(BENCH_CONFIG, chunk_hops=1, store_ring=False,
                            packed_output=True, precision_profile="fast")
    rng = np.random.default_rng(0)
    chunk = jnp.asarray(rng.standard_normal(
        (N_STREAMS, 2, p.chunk_size)).astype(np.float32) * 0.1)
    state = p.init_state(N_STREAMS)

    @jax.jit
    def scan(state, chunk):
        def body(s, _):
            s, rgba = p.push_planar_impl(s, chunk)
            return s, rgba[:, 0, 0]
        return jax.lax.scan(body, state, None, length=ITERS)

    state2, sums = scan(state, chunk)
    np.asarray(sums)
    log_dir = f"/tmp/untw_{name}"
    jax.profiler.start_trace(log_dir)
    _, sums = scan(state, chunk)
    np.asarray(sums)
    jax.profiler.stop_trace()
    op_total, _ = parse_trace(log_dir, ITERS)
    total = sum(v for k, v in op_total.items() if k.startswith("while")) / ITERS
    kern = sum(v for k, v in op_total.items() if "stft_mag" in k) / ITERS
    glue = sum(v for k, v in op_total.items()
               if any(t in k for t in ("copy", "pad_maximum", "slice_bitcast"))) / ITERS
    print(f"{name}: total {total:.3f}  stft {kern:.3f}  copies/pads {glue:.3f}",
          flush=True)


def main():
    profile_variant("v4tw")
    orig = sk.stft_mag_fused2
    sk.stft_mag_fused2 = stft_mag_fused2_untw
    try:
        jax.clear_caches()
        profile_variant("untw")
    finally:
        sk.stft_mag_fused2 = orig


if __name__ == "__main__":
    main()
