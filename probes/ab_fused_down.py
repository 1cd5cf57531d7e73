"""A/B: fused *_ss-downsample-into-next-conv vs the direct boundary.

probes/ab_enc1_in.py (round 5) attributed enc1's in-context cost at net
432x768: the three convs are 1.36 ms, +IN only 1.93, but materializing
the full 85 MB plane and consuming it with the stride-2 slice costs
3.0-3.8 ms — the strided-slice sublane repack, not the InstanceNorm
arithmetic, is the hog. `colorvidnet_apply(fused_down=True)` removes the
decimated-plane materialization entirely: each encoder boundary
`conv(w_ss * n[::2, ::2])` (reference ColorVidNet.py:96-113) becomes ONE
stride-2 rhs-dilation-2 3x3 conv on the full plane with the per-channel
scale folded into the weights (models/colorvidnet.py::_down_into; exact
up to fp association — tests/test_models.py::
test_colorvidnet_fused_down_matches_direct).

Measures cvn_direct vs cvn_fused in a lax.scan at production-like
chunking with xor-varied inputs and forced-fetch delta timing
(utils/measure.py), plus an on-chip max-abs-diff of generator outputs.

Usage: python probes/ab_fused_down.py [--net-size 432 768]
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

    variants = {
        "cvn_direct": lambda x: cvn.colorvidnet_apply(params, x,
                                                      fused_down=False),
        "cvn_fused": lambda x: cvn.colorvidnet_apply(params, x,
                                                     fused_down=True),
    }

    results = {}
    for name, fn in variants.items():
        prog = make_prog(fn)
        ys = prog(chunks[0], jnp.uint8(255))
        forcer.force(ys)
        results[name] = round(time_prog(prog) * 1e3, 3)
        print(f"{name:>12}: {results[name]:7.3f} ms/frame", flush=True)

    @jax.jit
    def diff(x_u8):
        x = (x_u8.astype(jnp.float32) * scale + shift)[None]
        return jnp.max(jnp.abs(
            cvn.colorvidnet_apply(params, x, fused_down=False)
            - cvn.colorvidnet_apply(params, x, fused_down=True)))

    max_diff = float(diff(chunks[0][0]))
    print(f"max abs diff (direct vs fused, ab scale ±128): {max_diff:.2e}",
          flush=True)

    print(json.dumps({
        "metric": "fused_down_ab",
        "net_size": [h, w],
        "chunk": k,
        "ms_per_frame": results,
        "max_abs_diff": max_diff,
    }), flush=True)
    return 0


if __name__ == "__main__":
    from devc_tpu.utils.retry import bench_guard

    sys.exit(bench_guard(main, metric="fused_down_ab", unit="ms"))
