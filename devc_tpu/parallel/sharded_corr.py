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
flash-style kernel on its row block. A key-sharded (context-parallel)
variant would combine partial (max, sum, acc) triples with psum_max/psum —
not needed at reference scale since keys fit comfortably per chip.
"""

from __future__ import annotations

from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map

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
