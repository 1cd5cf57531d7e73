"""Fused correspondence kernel: correlation -> online softmax -> color warp.

Flash-attention-style Pallas TPU kernel for the hot op of the pipeline
(reference models/NonlocalNet.py:477-500). For N = (H/4)(W/4) feature
positions the reference materializes an N x N correlation matrix in HBM
(1.7 GB fp32 at 768x432). This kernel streams key tiles through VMEM with a
running (max, denominator, accumulator) triple, so HBM traffic is O(N*C)
instead of O(N^2), and the row-max similarity map falls out of the online
max for free.

Semantics (matching ops.correspondence.correspondence_warp_einsum):
  f    = theta @ phi^T                    [Nq, Nk]  (cosine scores)
  sim  = rowmax(f)                        [Nq, 1]
  attn = softmax(f / T)  computed as softmax((f - rowmax(f)) / T)
  out  = attn @ values                    [Nq, V]

T = 1e-10 (inference) turns the softmax into an exact argmax-average:
exp((f - m)/T) is 1.0 for row maxima and underflows to 0.0 otherwise.

Grid: (batch, q_tiles, k_tiles), k innermost; the (m, l, acc) state lives
in VMEM scratch that persists across the k sweep for each q tile.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_TQ = 256
DEFAULT_TK = 512
_NEG_INF = -1e30


def _corr_kernel(
    theta_ref,  # [1, TQ, C]
    phi_ref,  # [1, TK, C]
    values_ref,  # [1, TK, V]
    out_ref,  # [1, TQ, V]
    sim_ref,  # [1, TQ]
    m_scr,  # [TQ, 1] f32
    l_scr,  # [TQ, 1] f32
    acc_scr,  # [TQ, V] f32
    *,
    inv_temperature: float,
    nk_valid: int,
    tk: int,
):
    k = pl.program_id(2)
    nk_tiles = pl.num_programs(2)

    @pl.when(k == 0)
    def _():
        m_scr[:] = jnp.full_like(m_scr, _NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    theta = theta_ref[0]
    phi = phi_ref[0]
    s = jax.lax.dot_general(
        theta,
        phi,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [TQ, TK]

    # mask padded key columns (static shapes: nk_valid known at trace time)
    base = k * tk
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + base
    s = jnp.where(col < nk_valid, s, _NEG_INF)

    m_prev = m_scr[:]
    m_tile = jnp.max(s, axis=-1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_tile)
    scale = jnp.exp((m_prev - m_new) * inv_temperature)
    p = jnp.exp((s - m_new) * inv_temperature)  # [TQ, TK]

    l_scr[:] = l_scr[:] * scale + jnp.sum(p, axis=-1, keepdims=True)
    pv = jax.lax.dot_general(
        p,
        values_ref[0].astype(jnp.float32),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [TQ, V]
    acc_scr[:] = acc_scr[:] * scale + pv
    m_scr[:] = m_new

    @pl.when(k == nk_tiles - 1)
    def _():
        out_ref[0] = (acc_scr[:] / l_scr[:]).astype(out_ref.dtype)
        sim_ref[0] = m_scr[:, 0].astype(sim_ref.dtype)


def _round_up(x, m):
    return (x + m - 1) // m * m


@functools.partial(
    jax.jit,
    static_argnames=("temperature", "tq", "tk", "interpret"),
)
def _corr_pallas(theta, phi, values, temperature, tq, tk, interpret):
    b, nq, c = theta.shape
    _, nk, v = values.shape

    tq = min(tq, _round_up(nq, 128))
    tk = min(tk, _round_up(nk, 128))
    nq_pad = _round_up(nq, tq)
    nk_pad = _round_up(nk, tk)

    if nq_pad != nq:
        theta = jnp.pad(theta, ((0, 0), (0, nq_pad - nq), (0, 0)))
    if nk_pad != nk:
        phi = jnp.pad(phi, ((0, 0), (0, nk_pad - nk), (0, 0)))
        values = jnp.pad(values, ((0, 0), (0, nk_pad - nk), (0, 0)))

    grid = (b, nq_pad // tq, nk_pad // tk)

    kernel = functools.partial(
        _corr_kernel,
        inv_temperature=float(1.0 / temperature),
        nk_valid=nk,
        tk=tk,
    )

    out, sim = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tq, c), lambda b, q, k: (b, q, 0)),
            pl.BlockSpec((1, tk, c), lambda b, q, k: (b, k, 0)),
            pl.BlockSpec((1, tk, values.shape[-1]), lambda b, q, k: (b, k, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, tq, values.shape[-1]), lambda b, q, k: (b, q, 0)),
            pl.BlockSpec((1, tq), lambda b, q, k: (b, q)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, nq_pad, v), theta.dtype),
            jax.ShapeDtypeStruct((b, nq_pad), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((tq, 1), jnp.float32),
            pltpu.VMEM((tq, 1), jnp.float32),
            pltpu.VMEM((tq, v), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * nq_pad * nk_pad * (c + v),
            bytes_accessed=4 * b * (nq_pad * c + nk_pad * c * (nq_pad // tq)),
            transcendentals=b * nq_pad * nk_pad,
        ),
        interpret=interpret,
    )(theta, phi, values)

    return out[:, :nq, :], sim[:, :nq, None]


def correspondence_warp_pallas(
    theta,
    phi,
    values,
    temperature: float = 0.001 * 5,
    wta_scale_weight: float = 1.0,
    tq: int = DEFAULT_TQ,
    tk: int = DEFAULT_TK,
    interpret: bool = False,
):
    """Fused correspondence warp. Same contract as correspondence_warp_einsum.

    WTA scaling (train-only, off by default in the reference train loop) is
    not fused; callers needing it use the einsum path.
    """
    if wta_scale_weight != 1.0:
        raise NotImplementedError(
            "WTA scaling is not fused; use the einsum path (it is train-only "
            "and off by default in the reference)."
        )
    return _corr_pallas(
        theta, phi, values, float(temperature), int(tq), int(tk), bool(interpret)
    )
