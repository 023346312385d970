"""Dump the compiled HLO of one k=1 push to NAME the glue fusions."""
import sys, re
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from spectrogram_tpu.config import BENCH_CONFIG
from spectrogram_tpu.models.spectrogram import SpectrogramPipeline

p = SpectrogramPipeline(BENCH_CONFIG, chunk_hops=1, store_ring=False,
                        packed_output=True, precision_profile="fast")
S = 10240
state = p.set_palette(p.init_state(S), 1)
chunk = jnp.zeros((S, p.chunk_size, 2), jnp.float32)
lowered = jax.jit(p.push_impl).lower(state, chunk)
txt = lowered.compile().as_text()
# print every fusion/copy with its shape + first op lines
for m in re.finditer(r'^\s*(%?[\w.-]*(?:fusion|copy|slice|pad)[\w.-]*)\s*=\s*([^\n]*)', txt, re.M):
    name, rest = m.group(1), m.group(2)[:160]
    if any(k in name for k in ("fusion", "copy", "slice.9", "pad")):
        print(f"{name}: {rest}")
print("=" * 20)
# fusion bodies: map fusion name -> its computation ops summary
for m in re.finditer(r'%fused_computation[.\w]*\s*\(', txt):
    pass
