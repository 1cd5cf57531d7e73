"""Model-parallel dense correspondence (the workload's TP/SP analog).

The O(N^2) correlation is the only op worth model-parallelism here
(SURVEY.md §2.6): at 768x432 inference N = (H/4)(W/4) = 20736 and the
full matrix would be 1.7 GB. Sharding strategy:

  * QUERY (frame) rows are split across the "model" mesh axis;
  * phi / values (the exemplar side) are replicated — they are small
    (N x 256 and N x 3) and every row block needs all keys;
  * the softmax axis is the key axis, so each chip's row block is complete:
    NO cross-chip collectives are needed inside the op. The all_gather of
    the warped rows happens implicitly when the caller needs the full map.

This composes with the fused Pallas kernel: each shard runs the same
flash-style kernel on its row block.

`correspondence_warp_key_sharded` below is the complementary
context-parallel variant for when the EXEMPLAR side must also be split:
keys/values are sharded, each chip computes a local flash (max, sum, acc)
triple over its key shard, and the exact global softmax is recovered with
a pmax + two psums (the distributed form of the kernel's online-softmax
recurrence — chips play the role of key tiles, ICI plays the VMEM sweep).
Both variants are exercised by tests/test_parallel.py and the driver's
dryrun_multichip gate, and are routed through frame_colorization via its
corr_sharding argument.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from devc_tpu.ops.correspondence import correspondence_warp_einsum


def correspondence_warp_sharded(
    theta,
    phi,
    values,
    mesh: Mesh,
    temperature: float = 0.001 * 5,
    axis: str = "model",
    use_pallas: bool | None = None,
):
    """Row-sharded correspondence warp over `axis` of `mesh`.

    theta: [B, Nq, C] (Nq must divide by the axis size), phi: [B, Nk, C],
    values: [B, Nk, V]. Returns (warped [B, Nq, V], similarity [B, Nq, 1])
    with Nq sharded over `axis`.
    """

    def local(theta_blk, phi_full, values_full):
        if use_pallas:
            from devc_tpu.ops.pallas_corr import correspondence_warp_pallas

            return correspondence_warp_pallas(
                theta_blk, phi_full, values_full, temperature=temperature
            )
        return correspondence_warp_einsum(
            theta_blk, phi_full, values_full, temperature=temperature
        )

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(None, axis, None), P(), P()),
        out_specs=(P(None, axis, None), P(None, axis, None)),
    )
    return fn(theta, phi, values)


def correspondence_warp_key_sharded(
    theta,
    phi,
    values,
    mesh: Mesh,
    temperature: float = 0.001 * 5,
    axis: str = "model",
    use_pallas: bool | None = None,
):
    """Context-parallel correspondence: KEYS (the exemplar side) sharded.

    For resolutions where even the exemplar embedding no longer fits per
    chip, phi/values are split over `axis` and theta is replicated. Each
    chip computes its local flash triple (m_loc row-max, l_loc denominator,
    out_loc) over its key shard; the exact global softmax is recovered with
    two collectives:

        m   = pmax(m_loc)
        l   = psum(l_loc * exp((m_loc - m)/T))
        out = psum(out_loc * l_loc * exp((m_loc - m)/T)) / l
        sim = m

    This is the distributed form of the same online-softmax recurrence the
    kernel runs over key tiles — chips play the role of tiles, ICI plays
    the role of the VMEM sweep.

    theta: [B, Nq, C] replicated; phi: [B, Nk, C], values: [B, Nk, V] with
    Nk divisible by the axis size. Returns (warped [B, Nq, V] and
    similarity [B, Nq, 1]), both replicated.
    """
    inv_t = 1.0 / temperature

    def local(theta_full, phi_blk, values_blk):
        if use_pallas:
            from devc_tpu.ops.pallas_corr import _corr_pallas_fwd

            out_loc, m_loc, l_loc = _corr_pallas_fwd(
                theta_full, phi_blk, values_blk, float(temperature),
                256, 512, False,
            )
            nq = theta_full.shape[1]
            out_loc = out_loc[:, :nq]
            m_loc = m_loc[:, :nq]
            l_loc = l_loc[:, :nq]
        else:
            f = jnp.einsum("bqc,bkc->bqk", theta_full, phi_blk,
                           preferred_element_type=jnp.float32)
            m_loc = jnp.max(f, axis=-1, keepdims=True)
            p = jnp.exp((f - m_loc) * inv_t)
            l_loc = jnp.sum(p, axis=-1, keepdims=True)
            out_loc = jnp.einsum(
                "bqk,bkv->bqv", p, values_blk.astype(p.dtype)
            ) / l_loc

        m = jax.lax.pmax(m_loc, axis)
        corr = l_loc * jnp.exp((m_loc - m) * inv_t)
        l = jax.lax.psum(corr, axis)
        out = jax.lax.psum(out_loc * corr, axis) / l
        return out.astype(theta_full.dtype), m

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), P(None, axis, None), P(None, axis, None)),
        out_specs=(P(), P()),
    )
    return fn(theta, phi, values)
