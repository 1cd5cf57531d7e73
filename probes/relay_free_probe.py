"""Does the relay defer buffer frees/donation like it defers execution?

Round-4 hypothesis (BASELINE.md round-4 train-step note): bench_train.py at
batch 16 RESOURCE_EXHAUSTs through the relay even though the step donates
its TrainState and the identical step ran at batch 16 in round 2 — the
proposed mechanism was that the relay, which acks dispatches before
executing them (probes/ab_chain_probe.py), also defers the *frees* of
donated/dead buffers until a synchronizing fetch, so a chain of n
undispatched steps holds n live copies of the donated state.

This probe turns that hypothesis into a measurement, the ab_chain_probe
way. Protocol:

  1. Allocate one BUF_GB buffer x0 and a jitted donated update
     f(x) = x + c (donate_argnums=0) — steady-state live memory for a
     working donation chain is 2 buffers regardless of chain length.
  2. For growing chain lengths n: dispatch n chained donated updates with
     NO intermediate fetch, then force one 4-byte checksum fetch.
  3. If donation frees promptly, every n succeeds (2 x BUF_GB live).
     If frees are deferred until the fetch, live memory grows as
     (n+1) x BUF_GB and the chain RESOURCE_EXHAUSTs near
     n ~= HBM/BUF_GB - 1; the failing n measures the deferral.

Each attempt's inputs differ (c varies per dispatch and per attempt) so
the relay's execution memoization cannot replay a cached chain.

Usage: python probes/relay_free_probe.py [--buf-gb 2] [--max-n 16]
Prints one JSON line; exit 0 either way (the result is the record).
"""

from __future__ import annotations

import argparse
import gc
import json


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--buf-gb", type=float, default=2.0)
    ap.add_argument("--max-n", type=int, default=16)
    ap.add_argument("--platform", default=None)
    args = ap.parse_args(argv)

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    import jax
    import jax.numpy as jnp

    n_elem = int(args.buf_gb * (1 << 30) / 4)
    # 2D shape keeps any layout games trivial
    rows = 1 << 14
    shape = (rows, n_elem // rows)

    upd = jax.jit(lambda x, c: x + c, donate_argnums=(0,))
    checksum = jax.jit(lambda x: x[0, :8].sum())

    def fresh(seed):
        return jnp.full(shape, float(seed), jnp.float32)

    # warm compile outside the measured attempts
    x = upd(fresh(0.5), jnp.float32(1.0))
    float(checksum(x))
    del x
    gc.collect()

    results = []
    failed_at = None
    attempt = 0
    for n in sorted({1, 2, 4, 6, 8, 12, args.max_n}):
        if n > args.max_n:
            continue
        attempt += 1
        try:
            x = fresh(attempt)
            for i in range(n):
                x = upd(x, jnp.float32(attempt * 100 + i))
            val = float(checksum(x))
            del x
            results.append({"n": n, "ok": True, "checksum": val})
            print(f"chain n={n}: OK", flush=True)
        except Exception as e:  # noqa: BLE001 — the failure IS the signal
            msg = f"{type(e).__name__}: {e}"
            oom = "RESOURCE_EXHAUSTED" in msg or "Out of memory" in msg
            results.append({"n": n, "ok": False, "oom": oom,
                            "error": msg[:300]})
            print(f"chain n={n}: FAILED ({'OOM' if oom else 'other'})",
                  flush=True)
            failed_at = n
            break
        finally:
            gc.collect()

    ok_ns = [r["n"] for r in results if r["ok"]]
    verdict = (
        "donation-frees-work" if failed_at is None else
        f"frees-deferred (chain of {failed_at} x {args.buf_gb} GiB donated "
        f"updates exhausted HBM; working donation needs only 2 buffers)"
    )
    print(json.dumps({
        "metric": "relay_deferred_free_probe",
        "buf_gb": args.buf_gb,
        "max_ok_chain": max(ok_ns) if ok_ns else 0,
        "failed_at": failed_at,
        "verdict": verdict,
        "results": results,
    }), flush=True)
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
