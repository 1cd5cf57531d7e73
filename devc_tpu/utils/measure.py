"""Relay-proof timing primitives for the tunneled TPU.

Measured 2026-08-18 (round 4, ab_chain_probe.py): the axon relay now
acknowledges dispatches before executing them and `block_until_ready`
returns without waiting — 24 chained ColorVidNet dispatches "completed"
in 2.2 ms of wall clock and the ~250 ms of real compute only happened
when a value was actually FETCHED to the host. Any timing that ends at
`block_until_ready` therefore measures dispatch enqueue rate, not the
chip. (Round 2/3 numbers predate this relay behavior and were validated
against XLA cost-analysis rooflines at the time.)

The only trustworthy protocol:

1. End every timed region by FETCHING a scalar that transitively depends
   on all dispatched work (a jitted device-side reduction -> float()).
   The 4-byte d2h is negligible; the fetch round-trip (~20-180 ms relay
   latency) is not —
2— so measure at TWO workload sizes and divide the DELTA by the extra
   work. Constant overheads (fetch round-trip, dispatch latency, queue
   drain) cancel exactly.

`Forcer` pre-compiles the reduction so it never pollutes a timed region;
`delta_time` runs the two-size protocol.
"""

from __future__ import annotations

import time


class Forcer:
    """Pre-compiled checksum-fetch used to end timed regions.

    force(pytree) runs one tiny device reduction over every leaf and
    fetches the resulting scalar, which makes the relay execute the whole
    pending dependency chain. Call force() once OUTSIDE the timed region
    first (same pytree structure/shapes) so compilation is not timed.
    """

    def __init__(self):
        import jax
        import jax.numpy as jnp

        def _reduce(xs):
            leaves = jax.tree.leaves(xs)
            return sum(x.astype(jnp.float32).sum() for x in leaves)

        self._f = jax.jit(_reduce)

    def force(self, xs) -> float:
        return float(self._f(xs))


def delta_time(run, n_small: int, n_large: int, forcer: Forcer,
               rounds: int = 3, return_all: bool = False):
    """Seconds of device time per work unit, relay-proof.

    run(n) must dispatch n units of chained work and return a pytree to
    checksum (the final output/carry — forcing it must force everything).
    Returns the median over `rounds` of (T(n_large) - T(n_small)) /
    (n_large - n_small), each T ending in a forced fetch; with
    return_all, (median, sorted per-round deltas) for variance checks.
    """
    # warm the forcer on both result structures (they are usually equal)
    forcer.force(run(n_small))
    forcer.force(run(n_large))
    deltas = []
    for _ in range(rounds):
        t0 = time.perf_counter()
        forcer.force(run(n_small))
        t1 = time.perf_counter()
        forcer.force(run(n_large))
        t2 = time.perf_counter()
        deltas.append(((t2 - t1) - (t1 - t0)) / (n_large - n_small))
    deltas.sort()
    med = deltas[len(deltas) // 2]
    return (med, deltas) if return_all else med
