"""Probe: does the relay defer execution past block_until_ready for
big-buffer outputs, only forcing on a small-output program / fetch?

Chain n data-dependent ColorVidNet dispatches (big [1,H,W,7] outputs),
block_until_ready, then run one tiny reduction program and block on its
scalar. If execution was deferred, phase 1 is instant and phase 2 absorbs
the n * ~10.4 ms of real compute.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from devc_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import devc_tpu.models.colorvidnet as cvn

rng = np.random.RandomState(0)
params = cvn.colorvidnet_init(jax.random.PRNGKey(0))
h, w = 432, 768
x0 = jax.device_put(jnp.asarray(rng.randn(1, h, w, 7), jnp.float32))
jax.block_until_ready(x0)
n = 24


def step(p, x):
    y = cvn.colorvidnet_apply(p, x)
    return x.at[..., 1:3].add(y * 1e-3)


fB = jax.jit(step)
red = jax.jit(lambda x: x.sum())

# warm both programs
xw = fB(params, x0)
jax.block_until_ready(red(xw))

x = x0
t0 = time.perf_counter()
for _ in range(n):
    x = fB(params, x)
jax.block_until_ready(x)
t1 = time.perf_counter()
s = red(x)
jax.block_until_ready(s)
t2 = time.perf_counter()
v = float(s)
t3 = time.perf_counter()
print(f"phase1 {n} chained dispatches + block: {(t1-t0)*1e3:9.1f} ms")
print(f"phase2 tiny reduction + block:         {(t2-t1)*1e3:9.1f} ms")
print(f"phase3 scalar fetch:                   {(t3-t2)*1e3:9.1f} ms")
print(f"(expected real compute ~{n*10.44:.0f} ms; value {v:.3e})")
