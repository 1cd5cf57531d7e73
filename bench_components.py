"""Per-component timing of the inference frame step on the real chip.

Times each device stage of the 432x768 pipeline (net at 216x384) with
async-chained dispatches over varied inputs, so relay latency amortizes and
the relay's execution memoization is defeated. Also times full-precision vs
bfloat16 variants of the conv-heavy stages to ground the fp32-vs-bf16
decision in measurement (VERDICT r1 weak #4).

Usage: python bench_components.py [--platform cpu] [-n 20]
Prints one line per stage; not the driver bench (see bench.py).
"""

from __future__ import annotations

import argparse
import time

import numpy as np


def _chain_time(fn, inputs, n):
    """Median-of-3 of: dispatch fn over n varied inputs, block at end."""
    import jax

    outs = [fn(*inputs(0))]  # warm/compile
    jax.block_until_ready(outs)
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        outs = []
        for i in range(n):
            outs.append(fn(*inputs(i)))
        jax.block_until_ready(outs)
        times.append((time.perf_counter() - t0) / n)
    return sorted(times)[1]


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default=None)
    ap.add_argument("-n", type=int, default=20)
    ap.add_argument("--image-size", type=int, nargs=2, default=(432, 768))
    args = ap.parse_args(argv)

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    from devc_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _make_params
    from devc_tpu import colorspace as cs
    from devc_tpu.models.colorvidnet import colorvidnet_apply
    from devc_tpu.models.vgg19 import vgg19_extract
    from devc_tpu.models.warpnet import embed_queries, warp_with_keys
    from devc_tpu.ops.fgs import fast_global_smoother
    from devc_tpu.ops.resize import resize_bilinear
    from devc_tpu.pipeline.frame import FEATURE_TAPS
    from devc_tpu.pipeline.video import _device_ref_features, _preprocess_device

    on_tpu = jax.default_backend() == "tpu"
    n = args.n if on_tpu else 2
    params = _make_params(jax.random.PRNGKey(0))
    h, w = args.image_size
    h2, w2 = h // 2, w // 2
    rng = np.random.RandomState(0)

    # staged inputs (uploads excluded from stage timings)
    frames = [
        jax.device_put(rng.randint(0, 256, (h, w, 3), np.uint8))
        for _ in range(8)
    ]
    jax.block_until_ready(frames)
    ref_lab_small, ref_state = _device_ref_features(params, frames[0])
    jax.block_until_ready(ref_state["phi"])

    labs = [
        jax.device_put(rng.uniform(-50, 50, (1, h2, w2, 3)).astype(np.float32))
        for _ in range(8)
    ]
    l_only = [x[..., 0:1] for x in labs]
    rgbs = [jax.device_put(rng.rand(1, h2, w2, 3).astype(np.float32)) for _ in range(8)]
    jax.block_until_ready([labs, rgbs])

    report = {}

    # 1. preprocess (uint8 -> lab_large + lab_small)
    pre = jax.jit(_preprocess_device)
    report["preprocess"] = _chain_time(pre, lambda i: (frames[i % 8],), n)

    # 2. VGG19 on gray-replicated rgb
    vgg = jax.jit(lambda p, x: vgg19_extract(p, x, FEATURE_TAPS))
    report["vgg19_fp32"] = _chain_time(
        vgg, lambda i: (params["vgg"], rgbs[i % 8]), n
    )
    params_vgg_bf16 = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params["vgg"])
    report["vgg19_bf16"] = _chain_time(
        vgg,
        lambda i: (params_vgg_bf16, rgbs[i % 8].astype(jnp.bfloat16)),
        n,
    )

    # 3. query embedding (frame half of WarpNet)
    feats = vgg(params["vgg"], rgbs[0])
    a_n = tuple(cs.feature_normalize(f) for f in feats[1:])
    a_n = jax.block_until_ready(a_n)

    @jax.jit
    def embed(p, *fs):
        return embed_queries(p, fs, (h2, w2))

    report["warp_embed_q"] = _chain_time(
        embed, lambda i: (params["warpnet"],) + a_n, n
    )

    # 4. fused correspondence (pallas on tpu)
    theta = jax.block_until_ready(embed(params["warpnet"], *a_n))
    thetas = [
        jax.device_put(np.asarray(theta) + rng.randn(*theta.shape).astype(np.float32) * 0.01)
        for _ in range(8)
    ]

    corr = jax.jit(
        lambda p, t: warp_with_keys(
            p, t, ref_state["phi"], ref_state["values"], (h2, w2),
            temperature=1e-10, use_pallas=on_tpu,
        )
    )
    report["correspondence"] = _chain_time(
        corr, lambda i: (params["warpnet"], thetas[i % 8]), n
    )

    # 5. ColorVidNet
    cin = [
        jax.device_put(rng.uniform(-50, 50, (1, h2, w2, 7)).astype(np.float32))
        for _ in range(8)
    ]
    cvn = jax.jit(colorvidnet_apply)
    report["colorvid_fp32"] = _chain_time(
        cvn, lambda i: (params["colorvid"], cin[i % 8]), n
    )
    params_cv_bf16 = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16), params["colorvid"]
    )
    report["colorvid_bf16"] = _chain_time(
        cvn, lambda i: (params_cv_bf16, cin[i % 8].astype(jnp.bfloat16)), n
    )

    # 6. ab upsample x2 + chroma
    abs_ = [x[..., 1:3] for x in labs]
    up = jax.jit(lambda x: resize_bilinear(x, (h, w)) * 1.25)
    report["ab_upsample"] = _chain_time(up, lambda i: (abs_[i % 8],), n)

    # 7. FGS
    ab_up = [
        jax.device_put(rng.uniform(-100, 100, (h, w, 2)).astype(np.float32))
        for _ in range(8)
    ]
    guides = [
        jax.device_put(rng.randint(0, 256, (h, w)).astype(np.float32))
        for _ in range(8)
    ]
    fgs = jax.jit(lambda x, g: fast_global_smoother(x, g, lam=500.0, sigma_color=4.0))
    report["fgs"] = _chain_time(fgs, lambda i: (ab_up[i % 8], guides[i % 8]), n)

    # 8. lab -> rgb -> uint8
    out_labs = [
        jax.device_put(rng.uniform(-50, 50, (1, h, w, 3)).astype(np.float32))
        for _ in range(8)
    ]

    def post(x):
        rgb = cs.lab_centered_to_rgb(x)[0]
        return jnp.clip(jnp.round(rgb * 255.0), 0, 255).astype(jnp.uint8)

    post = jax.jit(post)
    report["lab_to_rgb_u8"] = _chain_time(post, lambda i: (out_labs[i % 8],), n)

    total = sum(report.values())
    for k, v in report.items():
        print(f"{k:>16}: {v*1e3:7.2f} ms")
    print(f"{'sum':>16}: {total*1e3:7.2f} ms  ({1.0/total:.1f} fps equivalent)")


if __name__ == "__main__":
    from devc_tpu.utils.retry import run_with_backend_retry

    run_with_backend_retry(main)
