"""Fused Pallas correspondence kernel vs the einsum oracle (interpret mode
on CPU; the same kernel compiles with Mosaic on TPU)."""

import numpy as np
import jax.numpy as jnp
import pytest

from devc_tpu.ops.correspondence import correspondence_warp_einsum
from devc_tpu.ops.pallas_corr import correspondence_warp_pallas


def _run(b, nq, nk, c, v, temperature, tq=128, tk=128, seed=0):
    rng = np.random.RandomState(seed)
    theta = rng.randn(b, nq, c).astype(np.float32)
    theta /= np.linalg.norm(theta, axis=-1, keepdims=True)
    phi = rng.randn(b, nk, c).astype(np.float32)
    phi /= np.linalg.norm(phi, axis=-1, keepdims=True)
    values = (rng.rand(b, nk, v).astype(np.float32) - 0.5) * 200

    w_ref, s_ref = correspondence_warp_einsum(
        jnp.array(theta), jnp.array(phi), jnp.array(values), temperature
    )
    w, s = correspondence_warp_pallas(
        jnp.array(theta), jnp.array(phi), jnp.array(values), temperature,
        tq=tq, tk=tk, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(s), np.asarray(s_ref), atol=1e-5)
    np.testing.assert_allclose(np.asarray(w), np.asarray(w_ref), atol=1e-3)


def test_pallas_corr_aligned():
    _run(1, 256, 256, 64, 3, temperature=0.01)


def test_pallas_corr_unaligned_sizes():
    # Nq/Nk not multiples of the tile (216x384 -> N=5184 = 40.5 * 128)
    _run(1, 200, 312, 64, 3, temperature=0.01)


def test_pallas_corr_multi_k_tiles():
    _run(1, 128, 512, 32, 3, temperature=0.05, tq=128, tk=128)


def test_pallas_corr_hard_argmax_temperature():
    _run(1, 128, 384, 32, 3, temperature=1e-10)


def test_pallas_corr_batched():
    _run(2, 128, 256, 32, 3, temperature=0.01)


def test_pallas_corr_bf16_scores_close():
    rng = np.random.RandomState(0)
    b, nq, nk, c, v = 1, 128, 256, 64, 3
    theta = rng.randn(b, nq, c).astype(np.float32)
    theta /= np.linalg.norm(theta, axis=-1, keepdims=True)
    phi = rng.randn(b, nk, c).astype(np.float32)
    phi /= np.linalg.norm(phi, axis=-1, keepdims=True)
    values = (rng.rand(b, nk, v).astype(np.float32) - 0.5) * 200

    w32, s32 = correspondence_warp_pallas(
        jnp.array(theta), jnp.array(phi), jnp.array(values), 0.05,
        interpret=True)
    w16, s16 = correspondence_warp_pallas(
        jnp.array(theta), jnp.array(phi), jnp.array(values), 0.05,
        interpret=True, score_bf16=True)
    # bf16 scores: ~1e-2 similarity noise, warped colors stay close at a
    # smooth temperature
    np.testing.assert_allclose(np.asarray(s16), np.asarray(s32), atol=2e-2)
    np.testing.assert_allclose(np.asarray(w16), np.asarray(w32), atol=8.0)
    assert np.abs(np.asarray(w16) - np.asarray(w32)).mean() < 1.0


def test_pallas_corr_bf16_inputs_score_f32():
    """bf16 inputs with the kernel-internal f32 upcast (score_f32 — an
    experiment flag, BASELINE.md round-5 corr-dtype A/B) must match the
    f32 scores of the same bf16-rounded embeddings exactly."""
    rng = np.random.RandomState(1)
    b, nq, nk, c, v = 1, 128, 256, 64, 3
    theta = rng.randn(b, nq, c).astype(np.float32)
    theta /= np.linalg.norm(theta, axis=-1, keepdims=True)
    phi = rng.randn(b, nk, c).astype(np.float32)
    phi /= np.linalg.norm(phi, axis=-1, keepdims=True)
    values = (rng.rand(b, nk, v).astype(np.float32) - 0.5) * 200

    th16 = jnp.array(theta).astype(jnp.bfloat16)
    ph16 = jnp.array(phi).astype(jnp.bfloat16)
    va16 = jnp.array(values).astype(jnp.bfloat16)

    # oracle: the same rounded embeddings upcast to f32 OUTSIDE the kernel
    w_ref, s_ref = correspondence_warp_pallas(
        th16.astype(jnp.float32), ph16.astype(jnp.float32),
        va16.astype(jnp.float32), 0.05, interpret=True)
    # kernel-internal upcast
    w, s = correspondence_warp_pallas(th16, ph16, va16, 0.05, interpret=True,
                                      score_f32=True)
    np.testing.assert_allclose(np.asarray(s), np.asarray(s_ref), atol=1e-6)
    # out is accumulated f32 then stored bf16 -> one rounding step
    np.testing.assert_allclose(
        np.asarray(w, dtype=np.float32), np.asarray(w_ref), atol=1.0)
