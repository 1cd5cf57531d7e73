"""A/B: height-strip-batched ColorVidNet stage 1 vs the direct chain.

probes/cvn_prefix_probe.py (round 5) localized ~3.7 of ColorVidNet's
10.4 ms at net 432x768 to enc1 — the three full-plane stage-1 convs
(7->32->64->64, reference ColorVidNet.py:10-11,96-99) running ~10 TF/s
effective while the H/8 512-ch stages run at 165-204 TF/s (MXU peak at
the default bf16-multiply precision). Hypothesis: batch-1 full-plane
convs keep batch in VREG sublanes (1/8 occupancy) when XLA's
space-to-batch pass does not fire; ops/strips.py restores the packing
by hand (exactly — tests/test_models.py::
test_colorvidnet_enc1_strips_matches_direct).

Measures, per variant, in a lax.scan at production-like chunking with
xor-varied inputs and forced-fetch delta timing (utils/measure.py):
  enc1_direct / enc1_strips{S}   the stage-1 chain alone
  cvn_direct  / cvn_strips{S}    the full generator
plus an on-chip max-abs-diff check of full-generator outputs.

Usage: python probes/ab_enc1_strips.py [--net-size 432 768] [--strips 8 4]
Prints one JSON line.
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
    ap.add_argument("--net-size", type=int, nargs=2, default=(432, 768))
    ap.add_argument("--chunk", type=int, default=8)
    ap.add_argument("--n-chunks", type=int, default=4)
    ap.add_argument("--strips", type=int, nargs="+", default=[8])
    ap.add_argument("--skip-enc1-only", action="store_true")
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
        h, w = 64, 128
        args.chunk, args.n_chunks = 2, 2
    k = args.chunk

    params = cvn.colorvidnet_init(jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    chunks = [
        jax.device_put(rng.randint(0, 256, (k, h, w, 7), dtype=np.uint8))
        for _ in range(args.n_chunks)
    ]
    jax.block_until_ready(chunks)
    forcer = Forcer()

    scale = jnp.asarray([100 / 255, 1, 1, 1 / 255, 100 / 255, 1, 1],
                        jnp.float32)
    shift = jnp.asarray([-50, -128, -128, 0, -50, -128, -128], jnp.float32)

    def make_prog(fn):
        @jax.jit
        def prog(frames_u8, s):
            def body(_, x_u8):
                x = (x_u8.astype(jnp.float32) * scale + shift)[None]
                return None, jnp.sum(fn(x).astype(jnp.float32))

            _, ys = jax.lax.scan(body, None, frames_u8 ^ s)
            return ys

        return prog

    def time_prog(prog):
        ctr = [0]

        def run(n):
            ctr[0] += 1
            return [prog(chunk, jnp.uint8((ctr[0] + i) % 256))
                    for i, chunk in enumerate(chunks[:n])]

        return delta_time(run, 1, args.n_chunks, forcer) / k

    variants = {}
    if not args.skip_enc1_only:
        variants["enc1_direct"] = lambda x: cvn._enc1_direct(params, x)
        for s in args.strips:
            variants[f"enc1_strips{s}"] = (
                lambda x, s=s: cvn._enc1_strips(params, x, s))
    variants["cvn_direct"] = lambda x: cvn.colorvidnet_apply(params, x)
    for s in args.strips:
        variants[f"cvn_strips{s}"] = (
            lambda x, s=s: cvn.colorvidnet_apply(params, x, enc1_strips=s))

    results = {}
    for name, fn in variants.items():
        prog = make_prog(fn)
        ys = prog(chunks[0], jnp.uint8(255))
        forcer.force(ys)
        results[name] = round(time_prog(prog) * 1e3, 3)
        print(f"{name:>14}: {results[name]:7.3f} ms/frame", flush=True)

    # on-chip numerics: full-generator max abs diff, scalar fetch only
    s0 = args.strips[0]

    @jax.jit
    def diff(x_u8):
        x = (x_u8.astype(jnp.float32) * scale + shift)[None]
        return jnp.max(jnp.abs(
            cvn.colorvidnet_apply(params, x)
            - cvn.colorvidnet_apply(params, x, enc1_strips=s0)))

    max_diff = float(diff(chunks[0][0]))
    print(f"max abs diff (direct vs strips{s0}, ab scale ±128): "
          f"{max_diff:.2e}", flush=True)

    print(json.dumps({
        "metric": "enc1_strips_ab",
        "net_size": [h, w],
        "chunk": k,
        "ms_per_frame": results,
        "max_abs_diff": max_diff,
    }), flush=True)
    return 0


if __name__ == "__main__":
    from devc_tpu.utils.retry import bench_guard

    sys.exit(bench_guard(main, metric="enc1_strips_ab", unit="ms"))
