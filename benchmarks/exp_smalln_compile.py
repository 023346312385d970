"""E28 (round 5): attribute the small-N compile blowup.

Round-4 observation (CLAUDE.md relay protocol): standalone STFT kernel
compiles through the dev relay's remote compile helper blow up as N
SHRINKS (N=2048 7.7 s; N=1536 72 s; N=1024 111-200+ s), and killing a
timing-out client orphans the compile server-side.  Whether the blowup
is (a) the relay helper or (b) real XLA/Mosaic behavior is UNKNOWN and
blocks the low-latency 512/1024 geometry row (BASELINE.md:257, stale
since round 3).

Legs, all timed as jit(...).lower(args).compile() in ONE detached
process (no timeouts — the protocol):
  pallas/TPU : the fused packed kernel, per N           (the blowup)
  xla/TPU    : the SAME geometry through the pure-XLA stft path (no
               Mosaic) on the chip — separates Mosaic from XLA-on-relay
  xla/CPU    : the same pure-XLA program compiled by the LOCAL CPU
               XLA (subprocess) — separates the relay from XLA itself

If pallas/TPU blows up while xla/TPU stays flat -> Mosaic (or its
remote helper leg).  If both TPU legs blow up but CPU stays flat ->
the relay compile service.  If all three grow the same way -> real
XLA behavior.  N sweeps LARGE -> SMALL so the orphan risk of the
slowest compiles comes last.

Usage: python benchmarks/exp_smalln_compile.py  [N ...]
       (default 4096 2048 1536 1024)
"""
import json
import pathlib
import subprocess
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import numpy as np

NS = [int(a) for a in sys.argv[1:]] or [4096, 2048, 1536, 1024]

CPU_LEG = r"""
import sys, time, json
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np, jax.numpy as jnp
sys.path.insert(0, {repo!r})
from spectrogram_tpu.config import SpectrogramConfig
from spectrogram_tpu.ops import stft as stft_ops

n = {n}
cfg = SpectrogramConfig(sample_rate=48000.0,
                        window_period=(n // 2) / 48000.0,
                        hop_period=(n // 8) / 48000.0)
rng = np.random.default_rng(0)
pcm = jnp.asarray(rng.standard_normal((64, cfg.window_size, 2))
                  .astype(np.float32))
fn = jax.jit(jax.vmap(lambda f: stft_ops.stft_frame(f, cfg)))
t0 = time.perf_counter()
lowered = fn.lower(pcm)
t1 = time.perf_counter()
compiled = lowered.compile()
t2 = time.perf_counter()
print(json.dumps({{"lower_s": t1 - t0, "compile_s": t2 - t1}}))
"""


def tpu_legs(n):
    import jax
    import jax.numpy as jnp

    from spectrogram_tpu.config import SpectrogramConfig
    from spectrogram_tpu.ops import stft as stft_ops
    from spectrogram_tpu.ops.pallas import stft_kernel as sk

    cfg = SpectrogramConfig(
        sample_rate=48_000.0,
        window_period=(n // 2) / 48_000.0,
        hop_period=(n // 8) / 48_000.0,
    )
    rng = np.random.default_rng(0)
    rows = 64
    left = jnp.asarray(
        rng.standard_normal((rows, cfg.window_size)).astype(np.float32))
    right = jnp.asarray(
        rng.standard_normal((rows, cfg.window_size)).astype(np.float32))

    out = {}
    # pallas leg: the production kernel for this plan — packed where the
    # formulation applies (the bench plan), split-real v4 otherwise (the
    # small-N default plans have n2=64: exactly the kernels whose round-4
    # compiles blew up)
    from spectrogram_tpu.ops.mxu_fft import make_plan
    from spectrogram_tpu.ops.pallas.stft_kernel import (
        lane_pad_default, packed_supported,
    )

    plan = make_plan(cfg)
    use_packed = plan is not None and packed_supported(
        plan, lane_pad_default(plan))

    def pk(l, r):
        return sk.stft_mag_fused2(
            l, r, cfg, packed=use_packed,
            unpack_split=3 if use_packed else 0)

    try:
        t0 = time.perf_counter()
        lowered = jax.jit(pk).lower(left, right)
        t1 = time.perf_counter()
        compiled = lowered.compile()
        t2 = time.perf_counter()
        out["pallas_tpu"] = {"lower_s": round(t1 - t0, 2),
                             "compile_s": round(t2 - t1, 2)}
        print(f"  N={n} pallas/TPU lower {t1-t0:.1f}s compile {t2-t1:.1f}s",
              flush=True)
        # run once so the executable isn't left half-materialized
        ml, _ = compiled(left, right)
        np.asarray(ml[0, :4])
    except ValueError as e:
        out["pallas_tpu"] = {"error": str(e)[:120]}
        print(f"  N={n} pallas/TPU unsupported: {e}", flush=True)

    # pure-XLA leg on the chip (no Mosaic anywhere)
    pcm = jnp.asarray(
        rng.standard_normal((rows, cfg.window_size, 2)).astype(np.float32))
    fx = jax.jit(jax.vmap(lambda x: stft_ops.stft_frame(x, cfg)))
    t0 = time.perf_counter()
    lowered = fx.lower(pcm)
    t1 = time.perf_counter()
    compiled = lowered.compile()
    t2 = time.perf_counter()
    out["xla_tpu"] = {"lower_s": round(t1 - t0, 2),
                      "compile_s": round(t2 - t1, 2)}
    print(f"  N={n} xla/TPU    lower {t1-t0:.1f}s compile {t2-t1:.1f}s",
          flush=True)
    r = compiled(pcm)
    jax.block_until_ready(r)
    return out


def main():
    repo = str(pathlib.Path(__file__).resolve().parent.parent)
    results = {}
    for n in NS:
        print(f"== N={n}", flush=True)
        results[n] = tpu_legs(n)
        cp = subprocess.run(
            [sys.executable, "-c", CPU_LEG.format(repo=repo, n=n)],
            capture_output=True, text=True,
        )
        try:
            cpu = json.loads(cp.stdout.strip().splitlines()[-1])
            cpu = {k: round(v, 2) for k, v in cpu.items()}
        except Exception:
            cpu = {"error": cp.stderr[-300:]}
        results[n]["xla_cpu"] = cpu
        print(f"  N={n} xla/CPU    {cpu}", flush=True)
    print("\nRESULT " + json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
