"""Round-4: padded-lane flip (dT via n2 -> n2p=ceil(n2/128)*128 zero-padded
constants) on the REFERENCE-NATIVE geometry (48 kHz, window 2400, padded
4800; /root/reference/src/fourier/fft.rs:33,44) — the one plan family the
round-3 v4 kernel could not flip (no factorization of 4800 has
n2 % 128 == 0, VERDICT r3 missing #1).

Measures the production entry point (stft_mag_fused2) standalone:
no-flip v3c orientation vs lane_pad dT, across candidate plans/block sizes.
"""
import sys, pathlib, time
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import numpy as np, jax, jax.numpy as jnp
from spectrogram_tpu.config import SpectrogramConfig
from spectrogram_tpu.ops.mxu_fft import FftPlan, candidate_plans
from spectrogram_tpu.ops.pallas import stft_kernel as sk

CFG = SpectrogramConfig(sample_rate=48000.0, window_period=0.05)
N = 4096
rng = np.random.default_rng(0)
LEFT = jnp.asarray(rng.standard_normal((N, CFG.window_size)).astype(np.float32) * 0.1)
RIGHT = jnp.asarray(rng.standard_normal((N, CFG.window_size)).astype(np.float32) * 0.1)


def scan_bench(fn, iters=60):
    @jax.jit
    def runb(x):
        def body(c, _):
            ol, _ = fn(c, RIGHT)
            return c + ol[:1, :1] * 1e-20, ol[0, 0]
        return jax.lax.scan(body, x, None, length=iters)
    c, outs = runb(LEFT); np.asarray(outs)
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter(); c, outs = runb(LEFT)
        np.asarray(c[0, 0]); np.asarray(outs)
        best = min(best, time.perf_counter() - t0)
    return best / iters * 1e3


def main():
    ref = None
    plans = candidate_plans(CFG, top=4)
    print("candidates:", plans, flush=True)
    for plan in plans[:2]:
        for lane_pad in (False, True):
            for ts in (16, 32):
                label = f"{plan.n1}x{plan.n2} lane_pad={int(lane_pad)} ts={ts}"
                try:
                    fn = lambda l, r, p=plan, lp=lane_pad, t=ts: sk.stft_mag_fused2(
                        l, r, CFG, block_rows=t, slice_bins=False,
                        plan=p, lane_pad=lp)
                    ml, _ = fn(LEFT, RIGHT)
                    ml = np.asarray(ml)
                except Exception as e:
                    print(f"{label}: FAILED {type(e).__name__}: {str(e)[:120]}",
                          flush=True)
                    continue
                if ref is None:
                    ref, ok = ml, "ref"
                else:
                    rel = (np.abs(ml - ref) / (np.abs(ref) + 1e-12)).max()
                    ok = f"maxrel={rel:.2e}"
                t = scan_bench(fn)
                print(f"{label}: {t:.3f} ms/push  {ok}", flush=True)


if __name__ == "__main__":
    main()
