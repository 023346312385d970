"""Runtime plan/block autotuning — the FFTW `Flag::MEASURE` analog.

The reference measures FFT plans at startup (reference src/fourier/fft.rs:23,
`Flag::MEASURE`); the TPU equivalent tunes two discrete choices the static
cost model cannot settle:

* the four-step factorization N = n1 x n2 (FLOPs tie badly with layout: how
  (n1, n2, m) land on the MXU's (8, 128) tiles decides the transpose and
  padding waste — e.g. at N=4096 the model's top pick by MACs is n1=32, but
  nothing but a measurement proves it beats 64x64);
* the Pallas stream-block size ts (VMEM residency vs grid overhead).

Results persist in a JSON cache keyed by (device kind, geometry, pipeline
config), so the measurement cost is paid once per machine per deployment
config, exactly like FFTW wisdom.  That cost is REAL on first run: each
candidate compiles a full-pipeline measurement scan (minutes on
relay-tunneled dev TPUs; tens of seconds on a direct host) — warm the cache
out-of-band (benchmarks/tune_geometries.py) before latency-sensitive
startups.
"""

from __future__ import annotations

import json
import os
import pathlib
import time
from typing import Optional

import numpy as np

from spectrogram_tpu.config import SpectrogramConfig
from spectrogram_tpu.ops.mxu_fft import FftPlan, candidate_plans, make_plan

DEFAULT_CACHE = pathlib.Path(
    os.environ.get(
        "SPECTROGRAM_TPU_TUNE_CACHE",
        os.path.expanduser("~/.cache/spectrogram_tpu/autotune.json"),
    )
)
DEFAULT_BLOCK_ROWS = (16, 32, 64)

# Bump when the fused STFT kernel changes materially: cached rankings were
# measured against a specific kernel formulation (FFTW re-plans when its
# codelets change, for the same reason).
_TUNER_VERSION = 7  # v7: packed-complex formulation (stft_packed default);
# plan rankings move — packed favors minimal n1*n2o with 2m <= 128.
# The bf16-split unpack (stft_unpack_split=3, round-4 continuation) does
# NOT bump the version: it scales the prev term uniformly (pass model
# 5*n1*n2o -> 4.5*n1*n2o per row), so the argmin — and therefore every
# cached ranking — is unchanged.


def _cache_key(cfg: SpectrogramConfig, device_kind: str,
               pipeline_kwargs: dict) -> str:
    # The pipeline config changes the measured graph (chunk_hops selects a
    # different framing path; precision/packing change the colormap), so
    # rankings cached for one deployment config must not shadow another's.
    extras = ",".join(f"{k}={pipeline_kwargs[k]}" for k in sorted(pipeline_kwargs))
    return (
        f"v{_TUNER_VERSION}|{device_kind}|n={cfg.padded_size}"
        f"|w={cfg.window_size}|{extras}"
    )


def _load_cache(path: pathlib.Path) -> dict:
    try:
        with open(path) as f:
            return json.load(f)
    except (OSError, ValueError):
        return {}


def _store_cache(path: pathlib.Path, cache: dict) -> None:
    try:
        path.parent.mkdir(parents=True, exist_ok=True)
        tmp = path.with_suffix(".tmp")
        with open(tmp, "w") as f:
            json.dump(cache, f, indent=1, sort_keys=True)
        os.replace(tmp, path)
    except OSError:
        pass  # cache is an optimization; never fail the pipeline over it


def measure_stft(
    cfg: SpectrogramConfig,
    plan: FftPlan,
    block_rows: int,
    n_streams: int = 1024,
    iters: int = 100,  # relay dispatch (~45 ms/scan) must amortize well
    # below the ~0.1-0.3 ms candidate deltas being ranked
    trials: int = 2,
    pipeline_kwargs: dict | None = None,
) -> float:
    """ms/push of the FULL production push with this (plan, block) on the
    real device, scan-measured (per-call timing lies through the relay).

    Measures the whole chain, not the standalone STFT kernel: a plan's
    shapes change the surrounding XLA glue too — at N=4096 the 64x64 plan's
    kernel is ~6% faster than 32x128's but its re-layouts cost more than
    that, netting -2% end-to-end.  Only the full push ranks candidates
    correctly."""
    import jax
    import jax.numpy as jnp

    from spectrogram_tpu.models.spectrogram import SpectrogramPipeline

    kwargs = dict(chunk_hops=1, store_ring=False, packed_output=True,
                  precision_profile="fast")
    kwargs.update(pipeline_kwargs or {})
    pipeline = SpectrogramPipeline(cfg, **kwargs)
    pipeline.override_plan(plan, block_rows)
    rng = np.random.default_rng(0)
    chunk = jnp.asarray(
        rng.standard_normal((n_streams, pipeline.chunk_size, 2)).astype(np.float32)
        * 0.1
    )

    def scan(state, chunk):
        def body(s, _):
            s, rgba = pipeline.push_impl(s, chunk)
            return s, rgba[:, 0, 0]

        return jax.lax.scan(body, state, None, length=iters)

    fn = jax.jit(scan, donate_argnums=0)
    state = pipeline.init_state(n_streams)
    state, sums = fn(state, chunk)
    np.asarray(sums)
    best = np.inf
    for _ in range(trials):
        state = pipeline.init_state(n_streams)
        t0 = time.perf_counter()
        state, sums = fn(state, chunk)
        np.asarray(sums)
        best = min(best, time.perf_counter() - t0)
    return best / iters * 1e3


def tune(
    cfg: SpectrogramConfig,
    cache_path: Optional[pathlib.Path] = None,
    top_plans: int = 3,
    block_rows_candidates=DEFAULT_BLOCK_ROWS,
    measure=None,
    verbose: bool = False,
    pipeline_kwargs: dict | None = None,
) -> tuple[Optional[FftPlan], int]:
    """(plan, block_rows) for this geometry AND deployment config (pass the
    pipeline's chunk_hops/precision/packing via pipeline_kwargs — they
    change the measured graph): cached if seen before on this device kind,
    measured otherwise.  Falls back to the static model when no even-n1
    candidate exists (caller then uses the XLA path)."""
    import jax

    measure = measure or measure_stft  # late bind (testable / patchable)
    pipeline_kwargs = pipeline_kwargs or {}
    cands = [p for p in candidate_plans(cfg, top=top_plans) if p.n1 % 2 == 0]
    if not cands:
        return None, 32
    device_kind = jax.devices()[0].device_kind
    path = cache_path or DEFAULT_CACHE
    key = _cache_key(cfg, device_kind, pipeline_kwargs)
    cache = _load_cache(path)
    hit = cache.get(key)
    if hit is not None:
        plan = FftPlan(n=hit["n"], n1=hit["n1"], n2=hit["n2"], m=hit["m"])
        if plan in cands or plan == make_plan(cfg):
            return plan, int(hit["block_rows"])

    results = []
    failures = []
    for plan in cands:
        for ts in block_rows_candidates:
            try:
                ms = measure(cfg, plan, ts, pipeline_kwargs=pipeline_kwargs)
            except Exception as e:  # noqa: BLE001 — a candidate that fails
                # to compile (VMEM overflow, Mosaic limits) is simply not a
                # viable plan; infinite cost, like FFTW skipping an algo.
                failures.append(e)
                if verbose:
                    print(f"  tune {plan.n1}x{plan.n2} ts={ts}: "
                          f"FAILED {type(e).__name__}")
                continue
            results.append((ms, plan, ts))
            if verbose:
                print(f"  tune {plan.n1}x{plan.n2} ts={ts}: {ms:.3f} ms")
    if not results:
        if failures:
            # EVERY candidate failed: that is a systemic problem (backend
            # down, constructor regression), not per-plan inviability —
            # surface it instead of silently running untuned.
            raise RuntimeError(
                f"autotune: all {len(failures)} candidate measurements "
                f"failed; last error follows"
            ) from failures[-1]
        return make_plan(cfg), 32  # no candidates: static fallback
    ms, plan, ts = min(results, key=lambda t: t[0])
    cache[key] = {
        "n": plan.n, "n1": plan.n1, "n2": plan.n2, "m": plan.m,
        "block_rows": ts, "ms_per_push_1024": round(ms, 4),
        "candidates": len(results),
    }
    _store_cache(path, cache)
    return plan, ts
