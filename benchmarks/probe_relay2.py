"""Relay probe #2: separate the compile leg from the dispatch/execute legs.

If compile is slow but warm dispatch+readback times match the ledgered
12-30 ms RPC band, official-bench measurements are still trustworthy
through a degraded compile helper (trials run on warmed executables);
only wall-clock patience is affected.
"""
import time

import numpy as np

import jax
import jax.numpy as jnp

print(f"devices {jax.devices()}", flush=True)

a = jnp.ones((256, 256), jnp.float32)
f = jax.jit(lambda x: x @ x)
t0 = time.perf_counter()
np.asarray(f(a))
print(f"compile+first-exec {time.perf_counter()-t0:.1f}s", flush=True)

for i in range(10):
    t0 = time.perf_counter()
    np.asarray(f(a))
    print(f"warm dispatch+readback {i}: {(time.perf_counter()-t0)*1e3:.1f} ms",
          flush=True)
