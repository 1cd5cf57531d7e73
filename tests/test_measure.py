"""Tests for the relay-proof timing primitives (utils/measure.py)."""

import jax.numpy as jnp
import numpy as np

from devc_tpu.utils.measure import Forcer, delta_time


def test_forcer_reduces_pytrees_to_float():
    f = Forcer()
    v = f.force({"a": jnp.ones((3, 4)), "b": (jnp.full((2,), 2.0),
                                              jnp.zeros((5,), jnp.uint8))})
    assert isinstance(v, float)
    np.testing.assert_allclose(v, 12.0 + 4.0)


def test_delta_time_scales_with_work():
    # a run() that dispatches n chained device reductions; the per-unit
    # time must be finite and the harness must call run() with both sizes
    calls = []

    def run(n):
        calls.append(n)
        x = jnp.ones((64, 64))
        for _ in range(n):
            x = x @ x * 1e-3
        return x

    f = Forcer()
    dt = delta_time(run, 1, 4, f, rounds=3)
    assert np.isfinite(dt)
    # warmup (1, 4) + 3 rounds of (1, 4)
    assert calls == [1, 4] * 4
