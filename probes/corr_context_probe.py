"""Why does correspondence cost 9.1 ms inside the fused scan but ~2.6 ms
as a staged program? (round 5, follow-up to probes/fused_prefix_probe.py)

fused_prefix_probe measured the full-res (N=20736) fused frame step's
corr marginal at 9.1 ms fp32 / 10.5 ms bf16, while bench_components'
staged `warp_with_keys` read 2.58 ms on the same shapes (BASELINE r4).
One of three things is true:

  a. the Pallas kernel really is slower inside `lax.scan` (e.g. the
     loop-invariant phi/values get a layout or copy per iteration);
  b. the staged number is wrong;
  c. the prefix marginal mis-attributes neighbouring work to corr.

This probe separates (a) from (b)/(c) by timing the SAME warp_with_keys
op three ways on identical shapes/dtypes:

  1. staged:      one dispatch per call, exactly like bench_components;
  2. scan-only:   jax.lax.scan over K pre-staged thetas, phi/values as
                  scan constants — corr is the only body content;
  3. scan+embed:  scan whose body runs embed_queries -> warp_with_keys
                  from pre-staged VGG features, isolating whether the
                  embed->corr boundary (not scan itself) adds the cost.

All three end in forced-fetch delta timing (utils/measure.py).

Usage: python probes/corr_context_probe.py [--image-size 864 1536]
Prints one JSON line of ms-per-call for each mode and dtype.
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
    ap.add_argument("--image-size", type=int, nargs=2, default=(864, 1536))
    ap.add_argument("--chunk", type=int, default=8)
    ap.add_argument("--n-chunks", type=int, default=4)
    ap.add_argument("--dtypes", nargs="+", default=["fp32", "bf16"])
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
    from devc_tpu.utils.measure import Forcer, delta_time

    on_tpu = jax.default_backend() == "tpu"
    h, w = args.image_size
    if not on_tpu:
        h, w = 64, 128
        args.chunk, args.n_chunks = 2, 2
    h2, w2 = h // 2, w // 2
    k = args.chunk
    n_feat = (h2 // 4) * (w2 // 4)

    params32 = _make_params(jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    ref_u8 = jnp.asarray(rng.randint(0, 256, (h, w, 3), dtype=np.uint8))
    forcer = Forcer()
    results = {}

    for dt_name in args.dtypes:
        if dt_name == "bf16":
            net_dt = jnp.bfloat16
            params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params32)
            _, ref_state = _device_ref_features(params, ref_u8,
                                                compute_dtype="bfloat16")
        else:
            net_dt = jnp.float32
            params = params32
            _, ref_state = _device_ref_features(params, ref_u8)
        forcer.force(ref_state["phi"])
        phi, values = ref_state["phi"], ref_state["values"]

        # pre-staged thetas (one scan chunk's worth, per-iteration varied)
        def unit(x):
            return x / (np.linalg.norm(x, axis=-1, keepdims=True) + 1e-12)

        thetas = [
            jax.device_put(jnp.asarray(
                unit(rng.randn(k, 1, n_feat, 256)).astype(np.float32)
            ).astype(net_dt))
            for _ in range(args.n_chunks)
        ]
        jax.block_until_ready(thetas)

        # pre-staged VGG features of ONE gray frame (scan constant inputs
        # for mode 3; per-iteration uniqueness via xor on the raw frame)
        frames_u8 = [
            jax.device_put(rng.randint(0, 256, (k, h2, w2, 1),
                                       dtype=np.uint8))
            for _ in range(args.n_chunks)
        ]
        jax.block_until_ready(frames_u8)

        rec = {}

        # ---- 1. staged, one dispatch per call ----
        corr = jax.jit(lambda t, e: warp_with_keys(
            params["warpnet"], t + e, phi, values, (h2, w2),
            temperature=1e-10, use_pallas=on_tpu, out_dtype=net_dt,
        ))
        theta0 = thetas[0][0]
        ctr = [0]

        def run_staged(n):
            outs = []
            for _ in range(n):
                ctr[0] += 1
                outs.append(corr(theta0, net_dt(ctr[0] * 1e-6)))
            return outs

        forcer.force(corr(theta0, net_dt(0.5)))
        rec["staged_ms"] = round(
            delta_time(run_staged, k // 2, 2 * k, forcer) * 1e3, 3)
        print(f"{dt_name} staged: {rec['staged_ms']} ms", flush=True)

        # ---- 2. scan over pre-staged thetas, corr-only body ----
        @jax.jit
        def scan_corr(ts, e):
            def body(_, t):
                warped, sim = warp_with_keys(
                    params["warpnet"], t + e, phi, values, (h2, w2),
                    temperature=1e-10, use_pallas=on_tpu, out_dtype=net_dt,
                )
                return None, (jnp.sum(warped.astype(jnp.float32)),
                              jnp.sum(sim.astype(jnp.float32)))
            _, ys = jax.lax.scan(body, None, ts)
            return ys

        sctr = [0]

        def run_scan(n):
            outs = []
            for i in range(n):
                sctr[0] += 1
                outs.append(scan_corr(thetas[i % len(thetas)],
                                      net_dt(sctr[0] * 1e-6)))
            return outs

        forcer.force(scan_corr(thetas[0], net_dt(0.5)))
        try:
            ca = scan_corr.lower(thetas[0], net_dt(0.5)).compile(
            ).cost_analysis()
            rec["scan_gflop"] = round(ca.get("flops", 0.0) / 1e9 / k, 2)
            rec["scan_gb"] = round(ca.get("bytes accessed", 0.0) / 1e9 / k, 3)
        except Exception:  # noqa: BLE001
            pass
        rec["scan_ms"] = round(
            delta_time(run_scan, 1, args.n_chunks, forcer) / k * 1e3, 3)
        print(f"{dt_name} scan-only: {rec['scan_ms']} ms "
              f"({rec.get('scan_gflop', '?')} GFLOP/frame)", flush=True)

        # ---- 2b. scan-only with score_bf16 (the correlation matmul at the
        # MXU's bf16 rate, fp32 accumulate; ops/pallas_corr.py:49-68) ----
        if on_tpu:
            from devc_tpu.models.warpnet import upsample_nearest
            from devc_tpu.ops.pallas_corr import correspondence_warp_pallas

            fh, fw = h2 // 4, w2 // 4

            @jax.jit
            def scan_corr_sb(ts, e):
                def body(_, t):
                    warped, sim = correspondence_warp_pallas(
                        t + e, phi, values, temperature=1e-10,
                        score_bf16=True,
                    )
                    warped = upsample_nearest(
                        warped.reshape(1, fh, fw, 3), 4).astype(net_dt)
                    sim = upsample_nearest(
                        sim.reshape(1, fh, fw, 1), 4).astype(net_dt)
                    return None, (jnp.sum(warped.astype(jnp.float32)),
                                  jnp.sum(sim.astype(jnp.float32)))
                _, ys = jax.lax.scan(body, None, ts)
                return ys

            bctr = [0]

            def run_scan_sb(n):
                outs = []
                for i in range(n):
                    bctr[0] += 1
                    outs.append(scan_corr_sb(thetas[i % len(thetas)],
                                             net_dt(bctr[0] * 1e-6)))
                return outs

            forcer.force(scan_corr_sb(thetas[0], net_dt(0.5)))
            rec["scan_score_bf16_ms"] = round(
                delta_time(run_scan_sb, 1, args.n_chunks, forcer) / k * 1e3,
                3)
            print(f"{dt_name} scan-only score_bf16: "
                  f"{rec['scan_score_bf16_ms']} ms", flush=True)

        # ---- 3. scan with embed -> corr body (VGG from uint8 gray);
        # barrier=True inserts jax.lax.optimization_barrier on theta at
        # the embed->kernel boundary (kills producer-fusion interactions
        # with the Mosaic custom call without changing semantics) ----
        def make_scan_embed_corr(barrier):
            @jax.jit
            def scan_embed_corr(fs, e):
                def body(_, f_u8):
                    a_l = (f_u8.astype(jnp.float32) / 255.0 * 100.0 - 50.0)
                    a_l = a_l[None, ..., 0:1].astype(net_dt) + e
                    a_rgb = cs.gray_to_rgb(a_l[0][None])
                    feats = vgg19_extract(params["vgg"], a_rgb, FEATURE_TAPS)
                    a_n = tuple(cs.feature_normalize(x) for x in feats[1:])
                    theta = embed_queries(params["warpnet"], a_n, (h2, w2))
                    if barrier:
                        theta = jax.lax.optimization_barrier(theta)
                    warped, sim = warp_with_keys(
                        params["warpnet"], theta, phi, values, (h2, w2),
                        temperature=1e-10, use_pallas=on_tpu,
                        out_dtype=net_dt,
                    )
                    return None, (jnp.sum(warped.astype(jnp.float32)),
                                  jnp.sum(sim.astype(jnp.float32)))
                _, ys = jax.lax.scan(body, None, fs)
                return ys
            return scan_embed_corr

        for tag, barrier in (("scan_embed_corr", False),
                             ("scan_embed_corr_barrier", True)):
            prog = make_scan_embed_corr(barrier)
            ectr = [0]

            def run_embed(n, prog=prog, ectr=ectr):
                outs = []
                for i in range(n):
                    ectr[0] += 1
                    outs.append(prog(frames_u8[i % len(frames_u8)],
                                     net_dt(ectr[0] * 1e-6)))
                return outs

            forcer.force(prog(frames_u8[0], net_dt(0.5)))
            try:
                ca = prog.lower(frames_u8[0], net_dt(0.5)).compile(
                ).cost_analysis()
                rec[tag + "_gflop"] = round(ca.get("flops", 0.0) / 1e9 / k, 2)
                rec[tag + "_gb"] = round(
                    ca.get("bytes accessed", 0.0) / 1e9 / k, 3)
            except Exception:  # noqa: BLE001 — cost analysis is best-effort
                pass
            rec[tag + "_ms"] = round(
                delta_time(run_embed, 1, args.n_chunks, forcer) / k * 1e3, 3)
            print(f"{dt_name} {tag}: {rec[tag + '_ms']} ms "
                  f"({rec.get(tag + '_gflop', '?')} GFLOP/frame, "
                  f"{rec.get(tag + '_gb', '?')} GB/frame)", flush=True)

        results[dt_name] = rec

    print(json.dumps({
        "metric": "corr_context_probe",
        "image_size": [h, w],
        "n_feat": n_feat,
        "chunk": k,
        "results": results,
    }), flush=True)
    return 0


if __name__ == "__main__":
    from devc_tpu.utils.retry import bench_guard

    sys.exit(bench_guard(main, metric="corr_context_probe", unit="ms"))
