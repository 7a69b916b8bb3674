"""Minimal repro: the axon tunnel client retains host upload buffers.

Bare jax.device_put of 35 MB -> fetch -> del -> gc+malloc_trim leaks
~37 MB of host RSS PER ITERATION with zero tpujpeg code involved
(measured r4: 179 -> 1662 MB over 40 iterations).  This is the whole
RSS growth the sustained benchmark sees (~0.3 MB per image = the
scan bytes uploaded); the engine itself holds nothing across
windows.  Harness infrastructure, not fixable from here; on a
standard PJRT backend device_put does not retain.

  python tools/probe_axon_leak.py
"""
import os, sys, gc, ctypes
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp

def rss():
    with open("/proc/self/statm") as f:
        return int(f.read().split()[1]) * 4096 / 1e6

x0 = jax.device_put(np.zeros(8, np.uint8)); np.asarray(jax.device_get(x0))
print("start", round(rss(), 1))
for i in range(40):
    a = jax.device_put(np.random.randint(0, 255, (35 << 20,), np.uint8))
    np.asarray(jax.device_get(a.ravel()[:1]))
    del a
    if i % 10 == 9:
        gc.collect(); ctypes.CDLL("libc.so.6").malloc_trim(0)
        print(f"iter {i}: RSS {rss():.1f} MB")
