"""Round-4 tail lead: NAME the 16k glue-copy regime change.

BASELINE.md's 16,384-stream decomposition shows the framing concat +
operand-transpose copies scaling 2.4x while streams scale 1.6x
(0.26 -> 0.63 ms per copy from 10,240), while the STFT and colormap
kernels scale linearly.  This harness compiles the SAME k=1 push at a
list of stream counts and diffs the glue instructions (copy / fusion /
pad) by shape, layout, and (with --profile) measured op time, to find
WHAT changes regime: layout assignment, fusion strategy, or plain
bandwidth droop.

Usage: python benchmarks/exp_glue_16k.py [N ...] [--profile]
Default Ns: 10240 16384.
"""
import re
import sys
import pathlib

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import jax
import jax.numpy as jnp

from spectrogram_tpu.config import BENCH_CONFIG
from spectrogram_tpu.models.spectrogram import SpectrogramPipeline

GLUE = re.compile(
    r"^\s*(%?[\w.-]*(?:fusion|copy|pad|transpose|concatenate)[\w.-]*)\s*=\s*"
    r"([^\s]+)\s+([^(]*)\(", re.M,
)


def glue_table(n_streams: int) -> list[tuple[str, str, str]]:
    p = SpectrogramPipeline(BENCH_CONFIG, chunk_hops=1, store_ring=False,
                            packed_output=True, precision_profile="fast")
    state = p.set_palette(p.init_state(n_streams), 1)
    chunk = jnp.zeros((n_streams, p.chunk_size, 2), jnp.float32)
    txt = jax.jit(p.push_impl).lower(state, chunk).compile().as_text()
    rows = []
    for m in GLUE.finditer(txt):
        name, shape, op = m.group(1), m.group(2), m.group(3).strip()
        if any(k in name for k in ("fusion", "copy", "pad", "transpose",
                                   "concatenate")):
            rows.append((name, shape, op))
    return rows


def main():
    ns = [int(a) for a in sys.argv[1:] if a.isdigit()] or [10240, 16384]
    tables = {}
    for n in ns:
        print(f"===== N={n} =====")
        rows = glue_table(n)
        tables[n] = rows
        for name, shape, op in rows:
            print(f"  {name:44s} {shape}")
    if len(ns) == 2:
        a, b = (set((r[0].split('.')[0], r[1].split('{')[1] if '{' in r[1]
                     else '') for r in tables[n]) for n in ns)
        only_a, only_b = a - b, b - a
        print("\n=== layout/op families only at N=%d ===" % ns[0])
        for t in sorted(only_a):
            print(" ", t)
        print("=== layout/op families only at N=%d ===" % ns[1])
        for t in sorted(only_b):
            print(" ", t)


if __name__ == "__main__":
    main()
