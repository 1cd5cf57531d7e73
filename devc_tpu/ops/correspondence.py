"""Dense nonlocal correspondence: correlation -> (row-max, softmax) -> warp.

This is the hot op of the whole system (reference models/NonlocalNet.py:
477-500): an (HW/16)x(HW/16) cosine-similarity matrix between projected
frame features (theta) and exemplar features (phi), whose row-max becomes a
confidence map and whose temperature-softmax warps the exemplar's Lab colors
onto the frame's geometry.

Two implementations:
  * `correspondence_warp_einsum` — straightforward XLA path, materializes the
    N x N matrix. Used as the numerics oracle and for small inputs.
  * `devc_tpu.ops.pallas_corr.correspondence_warp_pallas` — flash-attention
    style fused Pallas kernel (online softmax, never materializes N x N in
    HBM). Used at high resolution.

`correspondence_warp` picks an implementation.

Inference uses temperature=1e-10 (reference test.py:94), which makes the
softmax an argmax-average over exact-tied maxima. Both implementations
subtract the row max before exponentiating, so this is numerically exact:
exp((f - m)/T) is 1.0 for every tie and 0.0 elsewhere.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def wta_scale(f, scale: float):
    """Winner-take-all scaling (reference NonlocalNet.py:288-309 forward).

    Keeps each row's max, multiplies everything else by `scale`.
    Differentiating this forward gives grad 1 at row maxima and `scale`
    elsewhere. Note: the reference's hand-written backward
    (NonlocalNet.py:311-327) hardcodes 1e-4 for non-max positions
    regardless of the forward `scale` argument; the two coincide exactly at
    the intended default scale=1e-4 (the only value the reference ever
    passes, NonlocalNet.py:296).
    """
    row_max = jnp.max(f, axis=-1, keepdims=True)
    return jnp.where(f == row_max, f, f * scale)


def correspondence_warp_einsum(
    theta,
    phi,
    values,
    temperature: float = 0.001 * 5,
    wta_scale_weight: float = 1.0,
):
    """Reference-path correspondence warp (materializes the full matrix).

    Args:
      theta:  [B, Nq, C] centered+L2-normalized query features (frame A).
      phi:    [B, Nk, C] centered+L2-normalized key features (exemplar B).
      values: [B, Nk, V] per-position payload (avg-pooled exemplar Lab).
      temperature: softmax temperature.
      wta_scale_weight: 1.0 disables WTA scaling (inference default).

    Returns:
      warped:     [B, Nq, V] softmax-weighted payload.
      similarity: [B, Nq, 1] row-max correlation (pre-WTA, pre-softmax).
    """
    f = jnp.einsum(
        "bqc,bkc->bqk", theta, phi, preferred_element_type=jnp.float32
    )
    similarity = jnp.max(f, axis=-1, keepdims=True)
    if wta_scale_weight != 1.0:
        f_wta = wta_scale(f, wta_scale_weight)
    else:
        f_wta = f
    # softmax(f/T) computed as softmax((f - rowmax)/T) for T -> 0 stability
    f_shifted = (f_wta - jnp.max(f_wta, axis=-1, keepdims=True)) / temperature
    attn = jax.nn.softmax(f_shifted, axis=-1)
    warped = jnp.einsum(
        "bqk,bkv->bqv", attn, values.astype(attn.dtype),
        preferred_element_type=jnp.float32,
    )
    return warped, similarity


def correspondence_warp(
    theta,
    phi,
    values,
    temperature: float = 0.001 * 5,
    wta_scale_weight: float = 1.0,
    use_pallas: bool | None = None,
    differentiable: bool = False,
):
    """Dispatching wrapper: Pallas fused kernel on TPU, einsum elsewhere.

    With use_pallas=None, the fused kernel is selected on TPU backends when
    WTA scaling is off (the fused kernel computes row-max online, and WTA
    with weight != 1 needs the same row-max, which it also has — but the
    einsum path is kept as the oracle for that rare training-only mode).
    """
    if use_pallas is None:
        use_pallas = (
            jax.default_backend() == "tpu" and wta_scale_weight == 1.0
        )
    if use_pallas:
        from devc_tpu.ops.pallas_corr import correspondence_warp_pallas

        return correspondence_warp_pallas(
            theta, phi, values, temperature=temperature,
            wta_scale_weight=wta_scale_weight, differentiable=differentiable,
        )
    return correspondence_warp_einsum(
        theta, phi, values, temperature=temperature,
        wta_scale_weight=wta_scale_weight,
    )
