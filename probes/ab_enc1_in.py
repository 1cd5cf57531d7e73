"""Attribute ColorVidNet enc1's in-context cost: convs vs InstanceNorm.

probes/ab_enc1_strips.py (round 5) refuted the sublane-packing
hypothesis for enc1 (strips lose: cvn 10.59 vs 10.19 ms) AND showed the
three stage-1 convs alone cost only 1.23 ms — yet the enc1 marginal
inside the generator is 3.62 ms (probes/cvn_prefix_probe.py). The
missing ~2.4 ms must be in instance_norm(c1) at the full plane
(85 MB), the strided-scale down, or the materialization the dead-code-
friendly convs-only scan avoids.

Variants (each in a lax.scan, forced-fetch delta timing):
  convs            _enc1_direct, sum                (dead-code friendly)
  convs_mat        _enc1_direct, sum + per-pixel use of c1 via down
                   (forces materializing-ish dataflow without IN)
  convs_in         _enc1_direct + instance_norm, sum
  convs_in_down    + strided-scale down (== cvn_prefix enc1 stage)
  convs_in_keep    + down, and BOTH n1 and x2 summed (n1 kept live,
                   as the dec10 skip keeps it in the real generator)
  in_only          instance_norm of a precomputed [1,H,W,64] constant
                   perturbed per frame (isolates the IN primitive)

Usage: python probes/ab_enc1_in.py [--net-size 432 768]
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
    args = ap.parse_args(argv)

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    from devc_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    import devc_tpu.models.colorvidnet as cvn
    from devc_tpu.ops.layers import instance_norm
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

    def fn_convs(x):
        return jnp.sum(cvn._enc1_direct(params, x))

    def fn_convs_mat(x):
        c1 = cvn._enc1_direct(params, x)
        return jnp.sum(cvn._down(params, "conv1_2norm_ss", c1)) + jnp.sum(c1)

    def fn_convs_in(x):
        return jnp.sum(instance_norm(cvn._enc1_direct(params, x)))

    def fn_convs_in_down(x):
        n1 = instance_norm(cvn._enc1_direct(params, x))
        return jnp.sum(cvn._down(params, "conv1_2norm_ss", n1))

    def fn_convs_in_keep(x):
        n1 = instance_norm(cvn._enc1_direct(params, x))
        x2 = cvn._down(params, "conv1_2norm_ss", n1)
        return jnp.sum(x2) + jnp.sum(n1 * n1)

    def fn_in_only(x):
        # 64-ch plane built by cheap broadcast from the 7-ch input
        c = jnp.concatenate([x] * 10, axis=-1)[..., :64]
        return jnp.sum(instance_norm(c))

    variants = {
        "convs": fn_convs,
        "convs_mat": fn_convs_mat,
        "convs_in": fn_convs_in,
        "convs_in_down": fn_convs_in_down,
        "convs_in_keep": fn_convs_in_keep,
        "in_only": fn_in_only,
    }

    def make_prog(fn):
        @jax.jit
        def prog(frames_u8, s):
            def body(_, x_u8):
                x = (x_u8.astype(jnp.float32) * scale + shift)[None]
                return None, fn(x)

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

    results = {}
    for name, fn in variants.items():
        prog = make_prog(fn)
        ys = prog(chunks[0], jnp.uint8(255))
        forcer.force(ys)
        results[name] = round(time_prog(prog) * 1e3, 3)
        print(f"{name:>14}: {results[name]:7.3f} ms/frame", flush=True)

    print(json.dumps({
        "metric": "enc1_in_ab",
        "net_size": [h, w],
        "chunk": k,
        "ms_per_frame": results,
    }), flush=True)
    return 0


if __name__ == "__main__":
    from devc_tpu.utils.retry import bench_guard

    sys.exit(bench_guard(main, metric="enc1_in_ab", unit="ms"))
