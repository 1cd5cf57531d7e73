"""Fast global smoother: tridiagonal solver correctness + edge-aware
smoothing properties."""

import numpy as np
import jax.numpy as jnp

from devc_tpu.ops.fgs import _tridiag_pcr, _tridiag_thomas, fast_global_smoother


def test_pcr_matches_thomas(rng):
    L, B = 53, 6
    a = rng.rand(L, B).astype(np.float32) * 0.3
    c = rng.rand(L, B).astype(np.float32) * 0.3
    b = 1.0 + rng.rand(L, B).astype(np.float32)
    a[0] = 0
    c[-1] = 0
    d = rng.randn(L, B).astype(np.float32)
    x_pcr = np.asarray(_tridiag_pcr(jnp.array(a), jnp.array(b), jnp.array(c), jnp.array(d)))
    x_th = np.asarray(_tridiag_thomas(jnp.array(a), jnp.array(b), jnp.array(c), jnp.array(d)))
    np.testing.assert_allclose(x_pcr, x_th, atol=2e-4)


def test_fgs_solvers_agree(rng):
    src = rng.randn(24, 40, 2).astype(np.float32) * 10
    guide = (rng.rand(24, 40) * 255).astype(np.float32)
    a = np.asarray(fast_global_smoother(jnp.array(src), jnp.array(guide), solver="pcr"))
    b = np.asarray(fast_global_smoother(jnp.array(src), jnp.array(guide), solver="thomas"))
    np.testing.assert_allclose(a, b, atol=1e-3)


def test_thomas_solver_matches_dense(rng):
    L, B = 37, 4
    a = rng.rand(L, B).astype(np.float32) * 0.3
    c = rng.rand(L, B).astype(np.float32) * 0.3
    b = 1.0 + rng.rand(L, B).astype(np.float32)  # diagonally dominant
    a[0] = 0
    c[-1] = 0
    d = rng.randn(L, B).astype(np.float32)

    x = np.asarray(_tridiag_thomas(jnp.array(a), jnp.array(b), jnp.array(c), jnp.array(d)))
    for j in range(B):
        m = np.diag(b[:, j]) + np.diag(a[1:, j], -1) + np.diag(c[:-1, j], 1)
        expected = np.linalg.solve(m, d[:, j])
        np.testing.assert_allclose(x[:, j], expected, atol=1e-4)


def test_fgs_smooths_noise_in_flat_regions(rng):
    h, w = 32, 48
    guide = np.full((h, w), 128.0, np.float32)  # flat guide
    noise = rng.randn(h, w, 2).astype(np.float32) * 10
    out = np.asarray(fast_global_smoother(jnp.array(noise), jnp.array(guide)))
    # heavy smoothing: variance collapses
    assert out.var() < 0.05 * noise.var()


def test_fgs_preserves_edges():
    h, w = 32, 48
    guide = np.zeros((h, w), np.float32)
    guide[:, w // 2 :] = 255.0  # hard guide edge
    src = np.zeros((h, w, 1), np.float32)
    src[:, w // 2 :, 0] = 100.0  # signal step aligned with the edge
    out = np.asarray(fast_global_smoother(jnp.array(src), jnp.array(guide)))
    left = out[:, : w // 2 - 2].mean()
    right = out[:, w // 2 + 2 :].mean()
    # step survives: sides stay far apart
    assert right - left > 90.0


def test_fgs_constant_input_is_fixed_point():
    h, w = 16, 16
    guide = (np.arange(w, dtype=np.float32)[None, :] * 7 % 255).repeat(h, 0)
    src = np.full((h, w, 3), 42.0, np.float32)
    out = np.asarray(fast_global_smoother(jnp.array(src), jnp.array(guide)))
    np.testing.assert_allclose(out, src, atol=1e-3)
