"""Per-component timing of the inference frame step on the real chip.

Times each device stage of the 432x768 pipeline (net at 216x384). Also
times full-precision vs bfloat16 variants of the conv-heavy stages to
ground the fp32-vs-bf16 decision in measurement (VERDICT r1 weak #4).

Relay-proof methodology (round 4, devc_tpu/utils/measure.py): the relay
acks dispatches before executing them and block_until_ready does NOT
wait, so chained-dispatch timings measure enqueue rate, not the chip
(measured 2026-08-18: 24 ColorVidNet dispatches "done" in 2.2 ms vs
~250 ms real). Every stage is therefore timed as the DELTA between an
8-dispatch and a 32-dispatch batch, each ended by a forced 4-byte
checksum fetch over all outputs (the chip is serial, so forcing the
outputs forces every execution; constant fetch/dispatch overheads cancel
in the delta). Each dispatch mixes a fresh scalar into one input so the
relay's (executable, inputs) execution memoization can never fire.

Usage: python bench_components.py [--platform cpu] [-n 32]
Prints one line per stage; not the driver bench (see bench.py).
"""

from __future__ import annotations

import argparse

import numpy as np

from devc_tpu.utils.measure import Forcer, delta_time


def _stage_time(fn, args_fn, forcer, n_small, n_large):
    """Seconds/dispatch of jitted `fn`, relay-proof.

    args_fn(i) must return fn's argument tuple with a component that is
    unique for every i (a mixed-in scalar), so no execution repeats.
    """
    ctr = [0]

    def run(n):
        outs = []
        for _ in range(n):
            ctr[0] += 1
            outs.append(fn(*args_fn(ctr[0])))
        return outs

    return delta_time(run, n_small, n_large, forcer, rounds=5)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default=None)
    ap.add_argument("-n", type=int, default=32,
                    help="large batch size of the delta (small is n//4)")
    ap.add_argument("--image-size", type=int, nargs=2, default=(432, 768))
    ap.add_argument("--refs", type=int, default=1,
                    help="also time the R-batched multi-exemplar stages "
                         "(VERDICT r4 next #7)")
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
    n_large = args.n if on_tpu else 3
    n_small = max(1, n_large // 4)
    forcer = Forcer()
    params = _make_params(jax.random.PRNGKey(0))
    h, w = args.image_size
    h2, w2 = h // 2, w // 2
    rng = np.random.RandomState(0)

    # staged inputs (uploads excluded from stage timings); per-dispatch
    # uniqueness comes from the scalar mixed in by each stage's args_fn
    frames = [
        jax.device_put(rng.randint(0, 256, (h, w, 3), np.uint8))
        for _ in range(8)
    ]
    jax.block_until_ready(frames)
    ref_lab_small, ref_state = _device_ref_features(params, frames[0])
    forcer.force(ref_state["phi"])

    labs = [
        jax.device_put(rng.uniform(-50, 50, (1, h2, w2, 3)).astype(np.float32))
        for _ in range(8)
    ]
    rgbs = [jax.device_put(rng.rand(1, h2, w2, 3).astype(np.float32)) for _ in range(8)]
    jax.block_until_ready([labs, rgbs])

    def feps(i):
        return jnp.float32(i * 1e-6)

    report = {}

    # 1. preprocess (uint8 -> lab_large + lab_small); uniqueness via xor
    pre = jax.jit(lambda x, s: _preprocess_device(x ^ s))
    report["preprocess"] = _stage_time(
        pre, lambda i: (frames[i % 8], jnp.uint8(i // 8 % 256)),
        forcer, n_small, n_large,
    )

    # 2. VGG19 on gray-replicated rgb
    vgg = jax.jit(lambda p, x, e: vgg19_extract(p, x + e, FEATURE_TAPS))
    report["vgg19_fp32"] = _stage_time(
        vgg, lambda i: (params["vgg"], rgbs[i % 8], feps(i)),
        forcer, n_small, n_large,
    )
    params_vgg_bf16 = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params["vgg"])
    report["vgg19_bf16"] = _stage_time(
        vgg,
        lambda i: (params_vgg_bf16, rgbs[i % 8].astype(jnp.bfloat16),
                   jnp.bfloat16(i * 1e-3)),
        forcer, n_small, n_large,
    )

    # 3. query embedding (frame half of WarpNet)
    feats = vgg(params["vgg"], rgbs[0], feps(0))
    a_n = tuple(cs.feature_normalize(f) for f in feats[1:])
    forcer.force(a_n)

    @jax.jit
    def embed(p, e, *fs):
        return embed_queries(p, (fs[0] + e,) + fs[1:], (h2, w2))

    report["warp_embed_q"] = _stage_time(
        embed, lambda i: (params["warpnet"], feps(i)) + a_n,
        forcer, n_small, n_large,
    )

    # 4. fused correspondence (pallas on tpu)
    theta = embed(params["warpnet"], feps(0), *a_n)
    forcer.force(theta)

    corr = jax.jit(
        lambda p, t, e: warp_with_keys(
            p, t + e, ref_state["phi"], ref_state["values"], (h2, w2),
            temperature=1e-10, use_pallas=on_tpu,
        )
    )
    report["correspondence"] = _stage_time(
        corr, lambda i: (params["warpnet"], theta, feps(i)),
        forcer, n_small, n_large,
    )

    # 5. ColorVidNet
    cin = [
        jax.device_put(rng.uniform(-50, 50, (1, h2, w2, 7)).astype(np.float32))
        for _ in range(8)
    ]
    cvn = jax.jit(lambda p, x, e: colorvidnet_apply(p, x + e))
    report["colorvid_fp32"] = _stage_time(
        cvn, lambda i: (params["colorvid"], cin[i % 8], feps(i)),
        forcer, n_small, n_large,
    )
    params_cv_bf16 = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16), params["colorvid"]
    )
    report["colorvid_bf16"] = _stage_time(
        cvn,
        lambda i: (params_cv_bf16, cin[i % 8].astype(jnp.bfloat16),
                   jnp.bfloat16(i * 1e-3)),
        forcer, n_small, n_large,
    )

    # 6. ab upsample x2 + chroma
    abs_ = [x[..., 1:3] for x in labs]
    up = jax.jit(lambda x, e: resize_bilinear(x + e, (h, w)) * 1.25)
    report["ab_upsample"] = _stage_time(
        up, lambda i: (abs_[i % 8], feps(i)), forcer, n_small, n_large,
    )

    # 7. FGS
    ab_up = [
        jax.device_put(rng.uniform(-100, 100, (h, w, 2)).astype(np.float32))
        for _ in range(8)
    ]
    guides = [
        jax.device_put(rng.randint(0, 256, (h, w)).astype(np.float32))
        for _ in range(8)
    ]
    fgs = jax.jit(
        lambda x, g, e: fast_global_smoother(x + e, g, lam=500.0,
                                             sigma_color=4.0)
    )
    report["fgs"] = _stage_time(
        fgs, lambda i: (ab_up[i % 8], guides[i % 8], feps(i)),
        forcer, n_small, n_large,
    )

    # 8. lab -> rgb -> uint8
    out_labs = [
        jax.device_put(rng.uniform(-50, 50, (1, h, w, 3)).astype(np.float32))
        for _ in range(8)
    ]

    def post(x, e):
        rgb = cs.lab_centered_to_rgb(x + e)[0]
        return jnp.clip(jnp.round(rgb * 255.0), 0, 255).astype(jnp.uint8)

    post = jax.jit(post)
    report["lab_to_rgb_u8"] = _stage_time(
        post, lambda i: (out_labs[i % 8], feps(i)), forcer, n_small, n_large,
    )

    total = sum(report.values())
    for k, v in report.items():
        print(f"{k:>16}: {v*1e3:7.2f} ms")
    print(f"{'sum':>16}: {total*1e3:7.2f} ms  ({1.0/total:.1f} fps equivalent)")

    # ---- multi-exemplar breakdown (VERDICT r4 next #7) ----
    # _frame_body_multi shares preprocess/VGG/query-embed across refs and
    # R-batches correspondence, ColorVidNet, ab-upsample, FGS and the Lab
    # conversion. Timing each R-batched stage at R tells whether the
    # multi-ref fps is "the R-scaled stages, as designed" or whether the
    # shared half is being re-paid per ref.
    if args.refs > 1:
        r = args.refs
        print(f"\n--- R={r} multi-exemplar stages (shared stages above "
              f"are paid once) ---")
        multi = {}
        theta_r = jnp.broadcast_to(theta, (r,) + theta.shape[1:])
        phi_r = jnp.broadcast_to(
            ref_state["phi"], (r,) + ref_state["phi"].shape[1:]
        )
        values_r = jnp.broadcast_to(
            ref_state["values"], (r,) + ref_state["values"].shape[1:]
        )
        jax.block_until_ready([theta_r, phi_r, values_r])

        corr_r = jax.jit(
            lambda p, t, e: warp_with_keys(
                p, t + e, phi_r, values_r, (h2, w2),
                temperature=1e-10, use_pallas=on_tpu,
            )
        )
        multi["correspondence"] = _stage_time(
            corr_r, lambda i: (params["warpnet"], theta_r, feps(i)),
            forcer, n_small, n_large,
        )

        cin_r = [
            jax.device_put(
                rng.uniform(-50, 50, (r, h2, w2, 7)).astype(np.float32)
            )
            for _ in range(8)
        ]
        multi["colorvid"] = _stage_time(
            cvn, lambda i: (params["colorvid"], cin_r[i % 8], feps(i)),
            forcer, n_small, n_large,
        )

        ab_r = [
            jax.device_put(
                rng.uniform(-50, 50, (r, h2, w2, 2)).astype(np.float32)
            )
            for _ in range(8)
        ]
        multi["ab_upsample"] = _stage_time(
            up, lambda i: (ab_r[i % 8], feps(i)), forcer, n_small, n_large,
        )

        ab_up_r = [
            jax.device_put(
                rng.uniform(-100, 100, (r, h, w, 2)).astype(np.float32)
            )
            for _ in range(8)
        ]
        fgs_r = jax.jit(
            lambda x, g, e: jax.vmap(
                lambda xi: fast_global_smoother(
                    xi + e, g, lam=500.0, sigma_color=4.0
                )
            )(x)
        )
        multi["fgs"] = _stage_time(
            fgs_r, lambda i: (ab_up_r[i % 8], guides[i % 8], feps(i)),
            forcer, n_small, n_large,
        )

        out_labs_r = [
            jax.device_put(
                rng.uniform(-50, 50, (r, h, w, 3)).astype(np.float32)
            )
            for _ in range(8)
        ]

        def post_r(x, e):
            rgb = cs.lab_centered_to_rgb(x + e)
            return jnp.clip(jnp.round(rgb * 255.0), 0, 255).astype(jnp.uint8)

        post_r = jax.jit(post_r)
        multi["lab_to_rgb_u8"] = _stage_time(
            post_r, lambda i: (out_labs_r[i % 8], feps(i)),
            forcer, n_small, n_large,
        )

        shared = (report["preprocess"] + report["vgg19_fp32"]
                  + report["warp_embed_q"])
        single_scaled = (report["correspondence"] + report["colorvid_fp32"]
                         + report["ab_upsample"] + report["fgs"]
                         + report["lab_to_rgb_u8"])
        for k, v in multi.items():
            ratio = v / report[k if k != "colorvid" else "colorvid_fp32"]
            print(f"{k:>16}: {v*1e3:7.2f} ms  ({ratio:.2f}x the R=1 stage)")
        m_total = sum(multi.values())
        print(f"{'R-scaled sum':>16}: {m_total*1e3:7.2f} ms "
              f"(R=1: {single_scaled*1e3:.2f} ms)")
        print(f"{'shared (once)':>16}: {shared*1e3:7.2f} ms")
        print(f"staged multi-ref step ~ {(shared + m_total)*1e3:.2f} ms "
              f"({1.0/(shared + m_total):.1f} fps equivalent)")


if __name__ == "__main__":
    import sys

    from devc_tpu.utils.retry import bench_guard

    sys.exit(bench_guard(main, metric="component_breakdown_ms", unit="ms"))
