"""Head-to-head: element-offset buf framing vs the all-windows kernel at
an ALIGNED hop (round-4 lead).

At the bench geometry (hop 800, n1 32) hop_rows=25 is not sublane-aligned,
so k>1 buf framing never applies and `auto` routes to allk unopposed.
At hop 1024 (50% overlap, hop_rows=32 % 8 == 0) BOTH entry points apply
and the auto routing preference (allk first) is an unmeasured choice.
This harness scans both on identical carry+chunk planes and checks parity.

Usage: python benchmarks/exp_buf_vs_allk.py [S] [k]  (defaults 4096 8)

RESULT (v5e, round 4 late; S=4096 k=8, window 2048 hop 1024, plan
32x128): parity BITWISE (maxabs 0.00e+00 on hardware; interpret-mode
cross-check 1.9e-9 at tiny S); allk 11.94 ms/push vs buf 13.54 —
**allk wins by 13% even where buf's alignment gate passes**.  The
element-offset window DMAs re-fetch the overlapped samples once per
window (2x reads at 50% overlap) while allk reads each sample plane
once and slices windows in-VMEM — bandwidth beats DMA-addressing
convenience.  The `auto` routing preference (allk first, buf only as
explicit override) is now a measured choice, closing the round-4 lead.
"""
import sys
import pathlib
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import numpy as np
import jax
import jax.numpy as jnp

from spectrogram_tpu.config import SpectrogramConfig
from spectrogram_tpu.ops.pallas import stft_kernel as sk

S = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
K = int(sys.argv[2]) if len(sys.argv) > 2 else 8

CFG = SpectrogramConfig(sample_rate=48000.0, window_period=2048 / 48000.0,
                        hop_period=1024 / 48000.0)
PLAN = sk.make_plan(CFG)
W, H = CFG.window_size, CFG.hop_size
TLEN = W + (K - 1) * H
assert sk.buf_framing_supported(CFG, K, PLAN), "buf gate must pass here"
assert CFG.hop_size % PLAN.n1 == 0, "allk gate must pass here"

rng = np.random.default_rng(0)
BUF_L = jnp.asarray(rng.standard_normal((S, TLEN)).astype(np.float32) * 0.1)
BUF_R = jnp.asarray(rng.standard_normal((S, TLEN)).astype(np.float32) * 0.1)


def scan_bench(fn, iters=60):
    @jax.jit
    def scan(l, r):
        def body(c, _):
            ml, mr = fn(l + c, r)
            return ml[0, 0] * 1e-20, (ml[0, 0], mr[0, 0])
        _, outs = jax.lax.scan(body, 0.0, None, length=iters)
        return outs
    np.asarray(scan(BUF_L, BUF_R)[0])  # compile
    t0 = time.perf_counter()
    np.asarray(scan(BUF_L, BUF_R)[0])
    return (time.perf_counter() - t0) / iters * 1e3


def run_buf(l, r):
    return sk.stft_mag_fused2_buf(l, r, CFG, k=K, plan=PLAN, block_rows=32)


def run_allk(l, r):
    return sk.stft_mag_fused2_allk(l, r, CFG, k=K, plan=PLAN)


al, ar = run_allk(BUF_L, BUF_R)
bl, br = run_buf(BUF_L, BUF_R)
# BOTH entry points emit window-major rows (window r of stream s at row
# r*S + s — see the two docstrings); compare directly.  (The first cut
# of this harness remapped buf as if allk were stream-major, which made
# parity look broken at ~100% relative error — harness bug, not kernel.)
d = float(np.abs(np.asarray(bl) - np.asarray(al)).max())
ref = float(np.abs(np.asarray(al)).max())
print(f"  (max |allk| = {ref:.3e})")
print(f"S={S} k={K} window {W} hop {H} plan {PLAN.n1}x{PLAN.n2}: "
      f"parity maxabs={d:.2e}", flush=True)

t_allk = scan_bench(run_allk)
print(f"allk: {t_allk:.3f} ms/push", flush=True)
t_buf = scan_bench(run_buf)
print(f"buf:  {t_buf:.3f} ms/push", flush=True)
print(f"ratio buf/allk = {t_buf / t_allk:.3f}")
