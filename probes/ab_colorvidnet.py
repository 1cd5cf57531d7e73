"""Isolated ColorVidNet s2b-vs-direct A/B on the real chip.

Measurement: run colorvidnet_apply K times inside one lax.scan program with
a data-dependent carry (each iteration's input depends on the previous
output), so the device must execute all K iterations sequentially and no
relay-side dispatch caching/reordering can shortcut it. Per-iteration cost
= (t(K2) - t(K1)) / (K2 - K1), which also cancels dispatch latency.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from devc_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import devc_tpu.models.colorvidnet as cvn

rng = np.random.RandomState(0)
params = cvn.colorvidnet_init(jax.random.PRNGKey(0))


def make_scan(k):
    def body(x, i):
        y = cvn.colorvidnet_apply(params, x)  # [1,H,W,2]
        # feed output back into the next input (data dependency)
        x = x.at[..., 1:3].add(y * 1e-3 + i * 1e-6)
        return x, ()

    def run(x0, offset):
        x, _ = lax.scan(body, x0 + offset, jnp.arange(k, dtype=jnp.float32))
        return x[0, 0, 0, 0]  # tiny output

    return jax.jit(run)


def med_time(f, x0, n=5):
    ts = []
    step = 0
    for _ in range(n):
        step += 1
        t0 = time.perf_counter()
        jax.block_until_ready(f(x0, jnp.float32(step * 1e-6)))
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[len(ts) // 2]


for (h, w) in ((216, 384), (432, 768)):
    x0 = jax.device_put(jnp.asarray(rng.randn(1, h, w, 7), jnp.float32))
    jax.block_until_ready(x0)
    for mode, flag in (("s2b", True), ("direct", False)):
        cvn._DILATED_S2B = flag
        k1, k2 = 4, 16
        f1, f2 = make_scan(k1), make_scan(k2)
        jax.block_until_ready(f1(x0, jnp.float32(0.0)))  # compile
        jax.block_until_ready(f2(x0, jnp.float32(0.0)))
        t1, t2 = med_time(f1, x0), med_time(f2, x0)
        ms = (t2 - t1) / (k2 - k1) * 1e3
        print(f"colorvidnet {h}x{w} {mode:>6}: {ms:7.2f} ms/iter "
              f"(t{k1}={t1*1e3:.1f} ms, t{k2}={t2*1e3:.1f} ms)", flush=True)
        f1.clear_cache(); f2.clear_cache()
