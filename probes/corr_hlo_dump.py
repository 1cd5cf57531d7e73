"""Dump optimized HLO of the corr-in-context programs (round-5 diagnosis).

probes/corr_context_probe.py measured: warp_with_keys costs 2.56 ms alone
in a scan, 9.0 ms when its theta comes from embed_queries in-program, and
an optimization_barrier at the boundary changes nothing, with identical
cost-analysis FLOPs/bytes. Remaining suspect: the Mosaic custom call's
operand-layout constraints forcing different (slower) layouts through the
upstream conv/normalize stages.

This compiles the scan-only and scan(embed+corr) programs and writes
their optimized HLO to /tmp/corr_hlo_{scan,embed}.txt for offline
inspection (transpose/copy ops, conv layouts, fusion shapes).

Usage: python probes/corr_hlo_dump.py [--image-size 864 1536]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default=None)
    ap.add_argument("--image-size", type=int, nargs=2, default=(864, 1536))
    ap.add_argument("--chunk", type=int, default=8)
    ap.add_argument("--out-dir", default="/tmp")
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
    from devc_tpu.models.vgg19 import vgg19_extract
    from devc_tpu.models.warpnet import embed_queries, warp_with_keys
    from devc_tpu.pipeline.frame import FEATURE_TAPS
    from devc_tpu.pipeline.video import _device_ref_features

    on_tpu = jax.default_backend() == "tpu"
    h, w = args.image_size
    if not on_tpu:
        h, w = 64, 128
        args.chunk = 2
    h2, w2 = h // 2, w // 2
    k = args.chunk
    n_feat = (h2 // 4) * (w2 // 4)

    params = _make_params(jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    ref_u8 = jnp.asarray(rng.randint(0, 256, (h, w, 3), dtype=np.uint8))
    _, ref_state = _device_ref_features(params, ref_u8)
    phi, values = ref_state["phi"], ref_state["values"]
    net_dt = jnp.float32

    thetas = jnp.asarray(rng.randn(k, 1, n_feat, 256).astype(np.float32))
    frames_u8 = jnp.asarray(rng.randint(0, 256, (k, h2, w2, 1),
                                        dtype=np.uint8))

    @jax.jit
    def scan_corr(ts, e):
        def body(_, t):
            warped, sim = warp_with_keys(
                params["warpnet"], t + e, phi, values, (h2, w2),
                temperature=1e-10, use_pallas=on_tpu, out_dtype=net_dt,
            )
            return None, (jnp.sum(warped), jnp.sum(sim))
        _, ys = jax.lax.scan(body, None, ts)
        return ys

    def make_scan_embed(with_corr):
        @jax.jit
        def scan_embed(fs, e):
            def body(_, f_u8):
                a_l = (f_u8.astype(jnp.float32) / 255.0 * 100.0 - 50.0)
                a_l = a_l[None, ..., 0:1] + e
                a_rgb = cs.gray_to_rgb(a_l[0][None])
                feats = vgg19_extract(params["vgg"], a_rgb, FEATURE_TAPS)
                a_n = tuple(cs.feature_normalize(x) for x in feats[1:])
                theta = embed_queries(params["warpnet"], a_n, (h2, w2))
                if with_corr == "corr":
                    warped, sim = warp_with_keys(
                        params["warpnet"], theta, phi, values, (h2, w2),
                        temperature=1e-10, use_pallas=on_tpu,
                        out_dtype=net_dt,
                    )
                    return None, (jnp.sum(warped), jnp.sum(sim))
                if with_corr == "constcorr":
                    # kernel co-resident but fed a CONSTANT theta: embed is
                    # still computed (consumed by a sum) with no data path
                    # into the kernel — separates co-residence effects from
                    # the embed->kernel dependence
                    warped, sim = warp_with_keys(
                        params["warpnet"], theta_const + e, phi, values,
                        (h2, w2), temperature=1e-10, use_pallas=on_tpu,
                        out_dtype=net_dt,
                    )
                    return None, (jnp.sum(warped) + jnp.sum(theta),
                                  jnp.sum(sim))
                if with_corr == "rawcorr":
                    # kernel fed the UN-normalized theta projection: the
                    # dependence reaches the convs but skips
                    # _center_normalize (numerics garbage — timing only)
                    from devc_tpu.models.warpnet import _embed
                    from devc_tpu.ops.layers import conv2d

                    a_emb = _embed(params["warpnet"], a_n)
                    raw = conv2d(params["warpnet"]["theta"], a_emb)
                    raw = raw.reshape(1, (h2 // 4) * (w2 // 4), 256)
                    warped, sim = warp_with_keys(
                        params["warpnet"], raw, phi, values, (h2, w2),
                        temperature=1e-10, use_pallas=on_tpu,
                        out_dtype=net_dt,
                    )
                    return None, (jnp.sum(warped), jnp.sum(sim))
                if with_corr == "normcorr":
                    # kernel dependence ONLY through _center_normalize of a
                    # constant (embed/VGG computed beside, summed): if slow,
                    # the normalize->kernel hop alone triggers the anomaly
                    from devc_tpu.models.warpnet import _center_normalize

                    theta_n = _center_normalize(theta_const + e)
                    warped, sim = warp_with_keys(
                        params["warpnet"], theta_n, phi, values, (h2, w2),
                        temperature=1e-10, use_pallas=on_tpu,
                        out_dtype=net_dt,
                    )
                    return None, (jnp.sum(warped) + jnp.sum(theta),
                                  jnp.sum(sim))
                return None, (jnp.sum(theta), jnp.sum(theta[..., 0]))
            _, ys = jax.lax.scan(body, None, fs)
            return ys
        return scan_embed

    theta_const = thetas[0]

    def embed_of(f_u8, e):
        a_l = (f_u8.astype(jnp.float32) / 255.0 * 100.0 - 50.0)
        a_l = a_l[None, ..., 0:1] + e
        a_rgb = cs.gray_to_rgb(a_l[0][None])
        feats = vgg19_extract(params["vgg"], a_rgb, FEATURE_TAPS)
        a_n = tuple(cs.feature_normalize(x) for x in feats[1:])
        return embed_queries(params["warpnet"], a_n, (h2, w2))

    @jax.jit
    def scan_twoscan(fs, e):
        # convs and the Mosaic kernel in SEPARATE while loops: scan 1
        # embeds every frame (stacking thetas in HBM), scan 2 runs the
        # kernel over the stack. If the anomaly is the custom call
        # blocking XLA's space-to-batch rewrite of the conv chain it
        # feeds from, this dodges it at the cost of k*21 MB of stacking.
        def body1(_, f_u8):
            return None, embed_of(f_u8, e)[0]
        _, theta_stack = jax.lax.scan(body1, None, fs)

        def body2(_, t):
            warped, sim = warp_with_keys(
                params["warpnet"], t[None], phi, values, (h2, w2),
                temperature=1e-10, use_pallas=on_tpu, out_dtype=net_dt,
            )
            return None, (jnp.sum(warped), jnp.sum(sim))
        _, ys = jax.lax.scan(body2, None, theta_stack)
        return ys

    @jax.jit
    def scan_pipelined(fs, e):
        # ONE scan, software-pipelined: the kernel consumes the CARRY
        # theta (loop parameter) while this iteration's convs produce
        # the NEXT carry. The conv->kernel dependence never appears
        # inside one iteration's dataflow. Numerics are shifted by one
        # frame — timing-only probe (carry seeded with a constant).
        def body(theta_prev, f_u8):
            warped, sim = warp_with_keys(
                params["warpnet"], theta_prev, phi, values, (h2, w2),
                temperature=1e-10, use_pallas=on_tpu, out_dtype=net_dt,
            )
            theta_next = embed_of(f_u8, e)
            return theta_next, (jnp.sum(warped), jnp.sum(sim))
        _, ys = jax.lax.scan(body, theta_const + e, fs)
        return ys

    from devc_tpu.utils.measure import Forcer, delta_time

    forcer = Forcer()
    arg_pool = {}

    all_modes = (("scan", scan_corr, thetas),
                 ("embed", make_scan_embed("corr"), frames_u8),
                 ("embed_nocorr", make_scan_embed("nocorr"), frames_u8),
                 ("embed_constcorr", make_scan_embed("constcorr"),
                  frames_u8),
                 ("embed_rawcorr", make_scan_embed("rawcorr"), frames_u8),
                 ("embed_normcorr", make_scan_embed("normcorr"),
                  frames_u8),
                 ("embed_twoscan", scan_twoscan, frames_u8),
                 ("embed_pipelined", scan_pipelined, frames_u8))
    if os.environ.get("DEVC_HLO_MODES"):
        wanted = os.environ["DEVC_HLO_MODES"].split(",")
        all_modes = tuple(m for m in all_modes if m[0] in wanted)

    for name, prog, arg in all_modes:
        txt = prog.lower(arg, jnp.float32(0.5)).compile().as_text()
        path = os.path.join(args.out_dir, f"corr_hlo_{name}.txt")
        with open(path, "w") as f:
            f.write(txt)
        # relay-proof per-frame timing of the same program (chained calls
        # with per-call varied epsilon; n-call delta)
        forcer.force(prog(arg, jnp.float32(0.5)))
        ctr = arg_pool.setdefault(name, [0])

        def run(n, prog=prog, arg=arg, ctr=ctr):
            outs = []
            for _ in range(n):
                ctr[0] += 1
                outs.append(prog(arg, jnp.float32(ctr[0] * 1e-6)))
            return outs

        ms = delta_time(run, 1, 4, forcer) / k * 1e3
        print(f"{name}: {len(txt)/1e6:.1f} MB -> {path}; "
              f"{ms:.3f} ms/frame", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
