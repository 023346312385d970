"""Autotuner tests: candidate enumeration, cache round-trip, plan injection
(parity of a non-default factorization through the full pipeline)."""

import numpy as np
import jax.numpy as jnp
import pytest

from spectrogram_tpu.config import SpectrogramConfig
from spectrogram_tpu.models.spectrogram import SpectrogramPipeline
from spectrogram_tpu.ops.mxu_fft import FftPlan, candidate_plans, make_plan
from spectrogram_tpu.utils import autotune

CFG = SpectrogramConfig(
    sample_rate=8000.0, window_period=0.032, hop_period=0.008,
    viewport_height=64, viewport_rows=16,
)


def test_candidate_plans_are_valid():
    cands = candidate_plans(CFG, top=4)
    assert len(cands) >= 2
    for p in cands:
        assert p.n1 * p.n2 == CFG.padded_size
        assert p.n1 % 2 == 0 and CFG.window_size % p.n1 == 0
        assert p.m == CFG.window_size // p.n1
    # static model's pick is among (or consistent with) the candidates
    assert make_plan(CFG) in cands


def test_tune_measures_once_then_caches(tmp_path):
    calls = []

    def fake_measure(cfg, plan, ts, **kw):
        calls.append((plan.n1, ts))
        return 1.0 if (plan.n1, ts) != (16, 16) else 0.5  # favour 16x16

    cache = tmp_path / "tune.json"
    plan, ts = autotune.tune(CFG, cache_path=cache, measure=fake_measure)
    assert (plan.n1, ts) == (16, 16)
    assert len(calls) == len(candidate_plans(CFG, top=3)) * len(
        autotune.DEFAULT_BLOCK_ROWS
    )
    # second call: pure cache hit, no measurement
    plan2, ts2 = autotune.tune(
        CFG, cache_path=cache,
        measure=lambda *a, **k: pytest.fail("must not re-measure"),
    )
    assert (plan2, ts2) == (plan, ts)


def test_nondefault_plan_matches_default_through_pipeline(rng):
    """A tuned factorization must change only speed, never pixels: push the
    same PCM through the default plan and an alternative candidate."""
    cands = [p for p in candidate_plans(CFG, top=3) if p != make_plan(CFG)]
    assert cands, "geometry has only one candidate"
    alt = cands[0]

    def with_plan(plan):
        p = SpectrogramPipeline(
            CFG, chunk_hops=2, packed_output=True,
            stft_backend="pallas", colormap_backend="pallas",
            kernel_interpret=True,
        )
        if plan is not None:
            p.fft_plan = plan
        s = p.init_state(2)
        pcm = rng2.standard_normal((2, p.chunk_size, 2)).astype(np.float32) * 0.3
        import jax

        s, out = jax.jit(p.push_impl)(s, jnp.asarray(pcm))
        return np.asarray(out)

    rng2 = np.random.default_rng(42)
    a = with_plan(None)
    rng2 = np.random.default_rng(42)
    b = with_plan(alt)
    # different accumulation orders: allow 1 u8 of rounding
    av = a.view(np.uint8)
    bv = b.view(np.uint8)
    assert np.abs(av.astype(int) - bv.astype(int)).max() <= 1


def test_pipeline_autotune_flag_uses_cache(tmp_path, monkeypatch):
    monkeypatch.setattr(
        autotune, "measure_stft", lambda cfg, plan, ts, **kw: float(plan.n1)
    )
    monkeypatch.setattr(autotune, "DEFAULT_CACHE", tmp_path / "t.json")
    p = SpectrogramPipeline(CFG, chunk_hops=2, autotune=True)
    cands = [c for c in candidate_plans(CFG, top=3) if c.n1 % 2 == 0]
    assert p.fft_plan == min(cands, key=lambda c: c.n1)
    assert p.stft_block_rows in autotune.DEFAULT_BLOCK_ROWS
