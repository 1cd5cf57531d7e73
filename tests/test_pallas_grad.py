"""Custom flash-style VJP of the fused correspondence kernel vs einsum
autodiff (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp

from devc_tpu.ops.correspondence import correspondence_warp_einsum
from devc_tpu.ops.pallas_corr import correspondence_warp_pallas


def _setup(b, nq, nk, c, v, seed=0):
    rng = np.random.RandomState(seed)
    theta = rng.randn(b, nq, c).astype(np.float32)
    theta /= np.linalg.norm(theta, axis=-1, keepdims=True)
    phi = rng.randn(b, nk, c).astype(np.float32)
    phi /= np.linalg.norm(phi, axis=-1, keepdims=True)
    values = (rng.rand(b, nk, v).astype(np.float32) - 0.5) * 100
    ct_out = rng.randn(b, nq, v).astype(np.float32)
    ct_sim = rng.randn(b, nq, 1).astype(np.float32)
    return (jnp.array(theta), jnp.array(phi), jnp.array(values),
            jnp.array(ct_out), jnp.array(ct_sim))


def _grads(fn, theta, phi, values, ct_out, ct_sim):
    def loss(th, ph, va):
        w, s = fn(th, ph, va)
        return jnp.sum(w * ct_out) + jnp.sum(s * ct_sim)

    return jax.grad(loss, argnums=(0, 1, 2))(theta, phi, values)


def test_pallas_vjp_matches_einsum():
    theta, phi, values, ct_out, ct_sim = _setup(1, 160, 224, 32, 3)
    T = 0.01

    g_ref = _grads(
        lambda a, b, c: correspondence_warp_einsum(a, b, c, T),
        theta, phi, values, ct_out, ct_sim,
    )
    g_pal = _grads(
        lambda a, b, c: correspondence_warp_pallas(
            a, b, c, T, interpret=True, differentiable=True, tq=128, tk=128
        ),
        theta, phi, values, ct_out, ct_sim,
    )
    for name, r, p in zip(("dtheta", "dphi", "dvalues"), g_ref, g_pal):
        np.testing.assert_allclose(
            np.asarray(p), np.asarray(r), atol=5e-3, rtol=1e-3, err_msg=name
        )


def test_pallas_vjp_forward_consistent():
    theta, phi, values, *_ = _setup(2, 128, 128, 16, 3, seed=1)
    w1, s1 = correspondence_warp_pallas(theta, phi, values, 0.05,
                                        interpret=True)
    w2, s2 = correspondence_warp_pallas(theta, phi, values, 0.05,
                                        interpret=True, differentiable=True)
    np.testing.assert_allclose(np.asarray(w1), np.asarray(w2), atol=1e-5)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), atol=1e-6)
