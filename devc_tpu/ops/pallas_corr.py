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

Training uses a custom flash-style VJP (differentiable=True): residuals are
(theta, phi, values, rowmax m, denominator l, out) — all O(N*C) — and the
backward kernels recompute attention tile-wise. The softmax Jacobian term
uses the flash-attention delta trick D_i = dout_i . out_i; the similarity
gradient routes to every exactly-tied maximum (the einsum path splits ties
evenly; exact float ties have measure zero).

Grids iterate (batch, row tiles, reduction tiles) with the reduction
innermost; state lives in VMEM scratch that persists across the sweep.
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


def _round_up(x, m):
    return (x + m - 1) // m * m


def _scores(theta_ref, phi_ref, k_tile_idx, tk, nk_valid, score_bf16=False,
            score_f32=False):
    """Correlation tile [TQ, TK] with padded key columns masked to -inf.

    score_bf16 casts the embeddings to bfloat16 for the matmul (MXU-native
    rate; fp32 accumulation) at ~1e-3 cosine-score noise — opt-in, since at
    inference temperature the argmax may flip between near-tied matches.
    score_f32 casts bf16 embeddings UP to f32 before the matmul — an
    experiment flag for the round-5 corr-dtype A/B (probes/ab_corr_dtype.py)
    which REFUTED the "Mosaic bf16 matmul is slow" hypothesis: the isolated
    kernel costs the same either way (BASELINE.md round-5).
    """
    th, ph = theta_ref[0], phi_ref[0]
    if score_bf16:
        th = th.astype(jnp.bfloat16)
        ph = ph.astype(jnp.bfloat16)
    elif score_f32:
        th = th.astype(jnp.float32)
        ph = ph.astype(jnp.float32)
    s = jax.lax.dot_general(
        th,
        ph,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + k_tile_idx * tk
    valid = col < nk_valid
    return jnp.where(valid, s, _NEG_INF), valid


# --------------------------------------------------------------- forward
def _corr_fwd_kernel(
    theta_ref,  # [1, TQ, C]
    phi_ref,  # [1, TK, C]
    values_ref,  # [1, TK, V]
    out_ref,  # [1, TQ, V]
    sim_ref,  # [1, TQ, 1]
    l_ref,  # [1, TQ, 1]
    m_scr,  # [TQ, 1] f32
    l_scr,  # [TQ, 1] f32
    acc_scr,  # [TQ, V] f32
    *,
    inv_temperature: float,
    nk_valid: int,
    tk: int,
    emit_l: bool,
    score_bf16: bool = False,
    score_f32: bool = False,
):
    k = pl.program_id(2)
    nk_tiles = pl.num_programs(2)

    @pl.when(k == 0)
    def _():
        m_scr[:] = jnp.full_like(m_scr, _NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    s, _ = _scores(theta_ref, phi_ref, k, tk, nk_valid, score_bf16, score_f32)

    m_prev = m_scr[:]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
    scale = jnp.exp((m_prev - m_new) * inv_temperature)
    p = jnp.exp((s - m_new) * inv_temperature)  # [TQ, TK]
    l_scr[:] = l_scr[:] * scale + jnp.sum(p, axis=-1, keepdims=True)
    acc_scr[:] = acc_scr[:] * scale + jax.lax.dot_general(
        p,
        values_ref[0].astype(jnp.float32),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    m_scr[:] = m_new

    @pl.when(k == nk_tiles - 1)
    def _():
        out_ref[0] = (acc_scr[:] / l_scr[:]).astype(out_ref.dtype)
        sim_ref[0] = m_scr[:].astype(sim_ref.dtype)
        if emit_l:
            l_ref[0] = l_scr[:]


@functools.partial(
    jax.jit,
    static_argnames=("temperature", "tq", "tk", "interpret", "emit_l",
                     "score_bf16", "score_f32"),
)
def _corr_pallas_fwd(theta, phi, values, temperature, tq, tk, interpret,
                     emit_l=True, score_bf16=False, score_f32=False):
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
        _corr_fwd_kernel,
        inv_temperature=float(1.0 / temperature),
        nk_valid=nk,
        tk=tk,
        emit_l=emit_l,
        score_bf16=score_bf16,
        score_f32=score_f32,
    )
    out, sim, l = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tq, c), lambda b, q, k: (b, q, 0)),
            pl.BlockSpec((1, tk, c), lambda b, q, k: (b, k, 0)),
            pl.BlockSpec((1, tk, values.shape[-1]), lambda b, q, k: (b, k, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, tq, values.shape[-1]), lambda b, q, k: (b, q, 0)),
            pl.BlockSpec((1, tq, 1), lambda b, q, k: (b, q, 0)),
            pl.BlockSpec((1, tq, 1), lambda b, q, k: (b, q, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, nq_pad, v), theta.dtype),
            jax.ShapeDtypeStruct((b, nq_pad, 1), jnp.float32),
            jax.ShapeDtypeStruct((b, nq_pad, 1), jnp.float32),
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
    return out, sim, l


# -------------------------------------------------------------- backward
def _grad_tile(theta_ref, phi_ref, values_ref, m_ref, l_ref, dout_ref,
               dsim_ref, dd_ref, k_tile_idx, tk, nk_valid, inv_temperature):
    """Shared tile math for both backward kernels.

    Returns (attn [TQ,TK], df [TQ,TK]) where df is the cotangent of the raw
    scores f: attn * (dout.V^T - D) / T + dsim * 1[f == m].
    """
    s, valid = _scores(theta_ref, phi_ref, k_tile_idx, tk, nk_valid)
    m = m_ref[0]  # [TQ, 1]
    l = l_ref[0]  # [TQ, 1]
    attn = jnp.exp((s - m) * inv_temperature) / l
    dps = jax.lax.dot_general(
        dout_ref[0].astype(jnp.float32),
        values_ref[0].astype(jnp.float32),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [TQ, TK]
    df = attn * (dps - dd_ref[0]) * inv_temperature
    df = df + jnp.where((s == m) & valid, dsim_ref[0], 0.0)
    return attn, df


def _corr_dq_kernel(
    theta_ref, phi_ref, values_ref, m_ref, l_ref, dout_ref, dsim_ref, dd_ref,
    dtheta_ref,
    acc_scr,
    *, inv_temperature, nk_valid, tk,
):
    k = pl.program_id(2)
    nk_tiles = pl.num_programs(2)

    @pl.when(k == 0)
    def _():
        acc_scr[:] = jnp.zeros_like(acc_scr)

    _attn, df = _grad_tile(theta_ref, phi_ref, values_ref, m_ref, l_ref,
                           dout_ref, dsim_ref, dd_ref, k, tk, nk_valid,
                           inv_temperature)
    acc_scr[:] += jax.lax.dot_general(
        df,
        phi_ref[0].astype(jnp.float32),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(k == nk_tiles - 1)
    def _():
        dtheta_ref[0] = acc_scr[:].astype(dtheta_ref.dtype)


def _corr_dkv_kernel(
    theta_ref, phi_ref, values_ref, m_ref, l_ref, dout_ref, dsim_ref, dd_ref,
    dphi_ref, dvalues_ref,
    dphi_scr, dv_scr,
    *, inv_temperature, nk_valid, tk,
):
    q = pl.program_id(2)
    nq_tiles = pl.num_programs(2)

    @pl.when(q == 0)
    def _():
        dphi_scr[:] = jnp.zeros_like(dphi_scr)
        dv_scr[:] = jnp.zeros_like(dv_scr)

    kk = pl.program_id(1)
    attn, df = _grad_tile(theta_ref, phi_ref, values_ref, m_ref, l_ref,
                          dout_ref, dsim_ref, dd_ref, kk, tk, nk_valid,
                          inv_temperature)
    dphi_scr[:] += jax.lax.dot_general(
        df,
        theta_ref[0].astype(jnp.float32),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [TK, C]
    dv_scr[:] += jax.lax.dot_general(
        attn,
        dout_ref[0].astype(jnp.float32),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [TK, V]

    @pl.when(q == nq_tiles - 1)
    def _():
        dphi_ref[0] = dphi_scr[:].astype(dphi_ref.dtype)
        dvalues_ref[0] = dv_scr[:].astype(dvalues_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("temperature", "tq", "tk", "interpret")
)
def _corr_pallas_bwd(
    theta, phi, values, sim, l, out, d_out, d_sim,
    temperature, tq, tk, interpret
):
    b, nq, c = theta.shape
    _, nk, v = values.shape
    tq = min(tq, _round_up(nq, 128))
    tk = min(tk, _round_up(nk, 128))
    nq_pad = _round_up(nq, tq)
    nk_pad = _round_up(nk, tk)

    if nq_pad != nq:
        padq3 = ((0, 0), (0, nq_pad - nq), (0, 0))
        theta = jnp.pad(theta, padq3)
        d_out = jnp.pad(d_out, padq3)
        out = jnp.pad(out, padq3)
        sim = jnp.pad(sim, padq3)
        l = jnp.pad(l, padq3, constant_values=1.0)
        d_sim = jnp.pad(d_sim, padq3)
    if nk_pad != nk:
        padk3 = ((0, 0), (0, nk_pad - nk), (0, 0))
        phi = jnp.pad(phi, padk3)
        values = jnp.pad(values, padk3)

    inv_t = float(1.0 / temperature)
    # flash-attention delta trick: D_i = rowsum_k(attn_ik * (dout_i . V_k))
    #                                  = dout_i . out_i (out is a primal)
    dd = jnp.sum(
        d_out.astype(jnp.float32) * out.astype(jnp.float32),
        axis=-1, keepdims=True,
    )  # [B, nq_pad, 1]

    kernel_dq = functools.partial(
        _corr_dq_kernel, inv_temperature=inv_t, nk_valid=nk, tk=tk,
    )
    dtheta = pl.pallas_call(
        kernel_dq,
        grid=(b, nq_pad // tq, nk_pad // tk),
        in_specs=[
            pl.BlockSpec((1, tq, c), lambda b, q, k: (b, q, 0)),
            pl.BlockSpec((1, tk, c), lambda b, q, k: (b, k, 0)),
            pl.BlockSpec((1, tk, v), lambda b, q, k: (b, k, 0)),
            pl.BlockSpec((1, tq, 1), lambda b, q, k: (b, q, 0)),
            pl.BlockSpec((1, tq, 1), lambda b, q, k: (b, q, 0)),
            pl.BlockSpec((1, tq, v), lambda b, q, k: (b, q, 0)),
            pl.BlockSpec((1, tq, 1), lambda b, q, k: (b, q, 0)),
            pl.BlockSpec((1, tq, 1), lambda b, q, k: (b, q, 0)),
        ],
        out_specs=pl.BlockSpec((1, tq, c), lambda b, q, k: (b, q, 0)),
        out_shape=jax.ShapeDtypeStruct((b, nq_pad, c), theta.dtype),
        scratch_shapes=[pltpu.VMEM((tq, c), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(theta, phi, values, sim, l, d_out, d_sim, dd)

    kernel_dkv = functools.partial(
        _corr_dkv_kernel, inv_temperature=inv_t, nk_valid=nk, tk=tk,
    )
    dphi, dvalues = pl.pallas_call(
        kernel_dkv,
        grid=(b, nk_pad // tk, nq_pad // tq),
        in_specs=[
            pl.BlockSpec((1, tq, c), lambda b, k, q: (b, q, 0)),
            pl.BlockSpec((1, tk, c), lambda b, k, q: (b, k, 0)),
            pl.BlockSpec((1, tk, v), lambda b, k, q: (b, k, 0)),
            pl.BlockSpec((1, tq, 1), lambda b, k, q: (b, q, 0)),
            pl.BlockSpec((1, tq, 1), lambda b, k, q: (b, q, 0)),
            pl.BlockSpec((1, tq, v), lambda b, k, q: (b, q, 0)),
            pl.BlockSpec((1, tq, 1), lambda b, k, q: (b, q, 0)),
            pl.BlockSpec((1, tq, 1), lambda b, k, q: (b, q, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, tk, c), lambda b, k, q: (b, k, 0)),
            pl.BlockSpec((1, tk, v), lambda b, k, q: (b, k, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, nk_pad, c), phi.dtype),
            jax.ShapeDtypeStruct((b, nk_pad, v), values.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((tk, c), jnp.float32),
            pltpu.VMEM((tk, v), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(theta, phi, values, sim, l, d_out, d_sim, dd)

    return dtheta[:, :nq], dphi[:, :nk], dvalues[:, :nk]


# ------------------------------------------------------------ public API
@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _corr_pallas_diff(theta, phi, values, temperature, tq, tk, interpret):
    out, sim, _l = _corr_pallas_fwd(theta, phi, values, temperature, tq, tk,
                                    interpret)
    nq = theta.shape[1]
    return out[:, :nq], sim[:, :nq]


def _corr_pallas_diff_fwd(theta, phi, values, temperature, tq, tk, interpret):
    out_pad, sim_pad, l_pad = _corr_pallas_fwd(
        theta, phi, values, temperature, tq, tk, interpret
    )
    nq = theta.shape[1]
    primal = (out_pad[:, :nq], sim_pad[:, :nq])
    residuals = (theta, phi, values, sim_pad[:, :nq], l_pad[:, :nq],
                 out_pad[:, :nq])
    return primal, residuals


def _corr_pallas_diff_bwd(temperature, tq, tk, interpret, residuals, grads):
    theta, phi, values, sim, l, out = residuals
    d_out, d_sim = grads
    return _corr_pallas_bwd(
        theta, phi, values, sim, l, out, d_out, d_sim,
        temperature, tq, tk, interpret,
    )


_corr_pallas_diff.defvjp(_corr_pallas_diff_fwd, _corr_pallas_diff_bwd)


def correspondence_warp_pallas(
    theta,
    phi,
    values,
    temperature: float = 0.001 * 5,
    wta_scale_weight: float = 1.0,
    tq: int = DEFAULT_TQ,
    tk: int | None = None,
    interpret: bool = False,
    differentiable: bool = False,
    score_bf16: bool = False,
    score_f32: bool | None = None,
):
    """Fused correspondence warp. Same contract as correspondence_warp_einsum.

    With differentiable=True a custom flash-style VJP is attached (see module
    docstring). score_bf16 runs the correlation matmul at the MXU's bf16
    rate (forward-only; ~1e-3 score noise). score_f32 (default off) casts
    bf16 embeddings up to f32 inside the kernel before the score matmul,
    making bf16-input scores exact f32 products of the rounded embeddings —
    kept as an experiment flag after the round-5 corr-dtype A/B refuted any
    kernel-internal bf16 penalty (probes/ab_corr_dtype.py, BASELINE.md).
    WTA scaling (train-only, off by default in the reference train loop) is
    not fused; callers needing it use the einsum path.

    tk=None auto-selects the key tile: 512 keeps pad waste low at the
    reference half-res N=5184, while at full-res N>=16384 a 2048 tile
    amortizes the per-tile overhead better (measured 2026-08-16 on v5e at
    N=20736: 6.96 ms -> 5.93 ms, 37 TFLOP/s fp32; VMEM/tile at (256,2048):
    theta 0.25 MB + phi 2 MB + scores 2 MB + acc/scratch < 0.1 MB,
    comfortably inside 16 MB).
    """
    if wta_scale_weight != 1.0:
        raise NotImplementedError(
            "WTA scaling is not fused; use the einsum path (it is train-only "
            "and off by default in the reference)."
        )
    if tk is None:
        tk = 2048 if phi.shape[1] >= 16384 else DEFAULT_TK
    if score_f32 is None:
        # REFUTED default-on: the isolated kernel is NOT slower on bf16
        # inputs (2.48 bf16 vs 2.58 f32 ms at N=20736 — the fused-profile
        # "+1.4 ms bf16 corr penalty" was a program-context effect, not a
        # Mosaic bf16-matmul cost; probes/ab_corr_dtype.py, BASELINE.md
        # round-5). Kept as an experiment flag only.
        score_f32 = False
    args = (theta, phi, values, float(temperature), int(tq), int(tk),
            bool(interpret))
    if differentiable:
        if score_bf16:
            raise NotImplementedError("score_bf16 is forward-only")
        return _corr_pallas_diff(*args)
    out, sim, _ = _corr_pallas_fwd(*args, emit_l=False,
                                   score_bf16=bool(score_bf16),
                                   score_f32=bool(score_f32))
    nq = theta.shape[1]
    return out[:, :nq], sim[:, :nq]
