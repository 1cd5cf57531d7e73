"""Why does the R=3 multi-exemplar ColorVidNet cost ~6x the single-ref
in-scan ColorVidNet instead of 3x? (round 5, VERDICT r4 #7 follow-up)

probes/fused_prefix_probe.py --refs 3 measured the multi-exemplar fused
scan at half-res: ColorVidNet marginal 10.0 ms/frame for R=3 while the
whole single-ref production step is 4.44 ms. Hypothesis: XLA's
space-to-batch conv rewrite (the round-5 split-embed discovery,
docs/DESIGN.md) only fires for batch-1 convs — a batch-3 conv keeps
batch in sublanes, wasting 5/8 of each VREG, so per-sample cost is
~8/3x the space-to-batched batch-1 cost.

A/B inside one lax.scan (forced-fetch delta protocol, utils/measure.py):
  batched:  colorvidnet_apply on [R, h, w, 7]
  unrolled: R separate batch-1 colorvidnet_apply calls, stacked
  mapped:   lax.map of a batch-1 colorvidnet_apply over R
for R in {1, 3} at the reference half-res net size and full-res.

MEASURED (v5e, 2026-08-19, BASELINE.md round-5): batched R=3 9.98
ms/frame, unrolled 6.55, mapped 6.23 — batch-1 convs win (space-to-
batch fires), and lax.map is the SHIPPED lowering (_frame_body_multi):
it traces the body once, where the Python unroll's 3x HLO exceeded the
relay's remote-compile size cap (HTTP 413) at the production chunk-64
scan. (Reference behavior being replicated: test.py:168-181 re-runs
the whole pipeline per exemplar.)

Usage: python probes/ab_cvn_batch.py [--net-size 216 384]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default=None)
    ap.add_argument("--net-size", type=int, nargs=2, default=(216, 384),
                    help="ColorVidNet input H W (the net runs at input/2)")
    ap.add_argument("--chunk", type=int, default=16)
    ap.add_argument("--n-chunks", type=int, default=4)
    ap.add_argument("--refs", type=int, nargs="+", default=[1, 3])
    args = ap.parse_args(argv)

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    from devc_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    import devc_tpu.models.colorvidnet as cvn
    from devc_tpu.utils.measure import Forcer, delta_time

    on_tpu = jax.default_backend() == "tpu"
    h, w = args.net_size
    if not on_tpu:
        h, w = 32, 64
        args.chunk, args.n_chunks = 2, 2
    k = args.chunk

    params = cvn.colorvidnet_init(jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    forcer = Forcer()
    results = {}

    for r in args.refs:
        chunks = [
            jax.device_put(
                rng.randn(k, r, h, w, 7).astype(np.float32) * 0.1)
            for _ in range(args.n_chunks)
        ]
        jax.block_until_ready(chunks)

        def make_prog(mode):
            def body(carry, x):
                # data-dependent input so iterations cannot be elided
                xin = x.at[..., 1:3].add(carry * 1e-3)
                if mode == "unrolled":
                    ys = jnp.concatenate(
                        [cvn.colorvidnet_apply(params, xin[i][None])
                         for i in range(r)], axis=0)
                elif mode == "mapped":
                    # lax.map: batch-1 convs (space-to-batch eligible) but
                    # the body is traced ONCE — the unrolled variant's 3x
                    # HLO blew past the relay's remote-compile request
                    # limit (HTTP 413) at production chunk sizes
                    ys = jax.lax.map(
                        lambda xi: cvn.colorvidnet_apply(params, xi[None])[0],
                        xin)
                else:
                    ys = cvn.colorvidnet_apply(params, xin)  # [r,h,w,2]
                return ys, jnp.sum(ys)

            @jax.jit
            def prog(xs, c0):
                carry, sums = jax.lax.scan(body, c0, xs)
                return carry, sums

            return prog

        c0 = jnp.zeros((r, h, w, 2), jnp.float32)
        rec = {}
        for tag in ("batched", "unrolled", "mapped"):
            if r == 1 and tag != "batched":
                continue  # identical program
            prog = make_prog(tag)
            out = prog(chunks[0], c0)
            forcer.force(out)
            ctr = [0]

            def run(n, prog=prog, ctr=ctr):
                ctr[0] += 1
                carry = c0 + ctr[0] * 1e-6
                outs = None
                for chunk in chunks[:n]:
                    carry, outs = prog(chunk, carry)
                return (carry, outs)

            ms = delta_time(run, 1, args.n_chunks, forcer) / k * 1e3
            rec[tag + "_ms"] = round(ms, 3)
            print(f"R={r} {tag}: {ms:7.3f} ms/frame", flush=True)
        results[f"R{r}"] = rec

    print(json.dumps({
        "metric": "cvn_batch_ab",
        "net_size": [h, w],
        "chunk": k,
        "results": results,
    }), flush=True)
    return 0


if __name__ == "__main__":
    from devc_tpu.utils.retry import bench_guard

    sys.exit(bench_guard(main, metric="cvn_batch_ab", unit="ms"))
