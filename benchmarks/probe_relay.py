"""Relay health probe: one 256x256 matmul on the default (TPU) backend.

Protocol (CLAUDE.md): run DETACHED with no timeout before queueing any
real chip job; a healthy relay answers in ~2-20 s warm.  If this hangs
for many minutes the compile path is wedged (tunnel may still be fine —
jax.devices() returning instantly proves nothing) — wait out the
cooldown, do NOT kill-and-retry in a loop (kills orphan server-side
compiles and make it worse).
"""
import time

import numpy as np

t0 = time.perf_counter()
import jax
import jax.numpy as jnp

print(f"devices {jax.devices()} ({time.perf_counter()-t0:.1f}s)", flush=True)

t0 = time.perf_counter()
a = jnp.ones((256, 256), jnp.float32)
out = np.asarray(jnp.dot(a, a))
print(f"matmul ok sum={out.sum():.1f} ({time.perf_counter()-t0:.1f}s)", flush=True)
