"""Localize where the fused bf16 step loses the staged bf16 savings.

VERDICT r4 missing #3: at full-res (net 768x432) the STAGED VGG and
ColorVidNet each win in bf16 (3.52->2.74 ms, 10.60->8.90 ms), yet the
FUSED scan step is a wash (36.0 vs 35.4 fps). Nobody measured WHERE the
~2.5 ms of staged savings evaporate inside the fused program; the
roadmap's guess was layout/convert ops at the fp32 pre/post boundaries.

jax.profiler traces are not trustworthy through the relay (execution is
deferred past the trace window — probes/ab_chain_probe.py), so this probe
measures instead: it times PREFIXES of the fused per-frame program under
the same lax.scan chunking as production, in fp32 and bf16. The delta
T(P_k) - T(P_{k-1}) is the marginal cost of stage k *inside the fused
program* (including the converts/layouts its boundary induces), which is
exactly the quantity the staged breakdown cannot see.

Prefixes (mirroring pipeline/video.py::_frame_body):
  1 preprocess   uint8 -> lab_large + lab_small
  2 vgg          VGG19 taps of the gray frame        (bf16-able)
  3 embed        WarpNet query embedding theta       (bf16-able)
  4 corr         fused Pallas correspondence warp    (bf16-able)
  5 colorvid     ColorVidNet + recurrent carry       (bf16-able)
  6 upsample     ab x2 bilinear + 1.25 chroma
  7 fgs          fast global smoother (fp32 always)
  8 post         Lab -> RGB -> uint8

Every prefix ends in a per-frame scalar reduction (ys [K]) so forcing the
output forces every scan iteration; timing is the forced-fetch delta
protocol (utils/measure.py). Inputs are xor-perturbed per dispatch so the
relay's execution memoization cannot fire. The real production scan
(_device_chunk_scan) is timed in both dtypes as the anchor.

Usage: python probes/fused_prefix_probe.py [--image-size 864 1536]
Prints one JSON line with ms-per-frame per (dtype, prefix) + marginals.

--refs R (default 1) switches to the MULTI-exemplar fused body
(pipeline/video.py::_frame_body_multi semantics: VGG/embed shared, theta
broadcast, corr/ColorVidNet/FGS/post R-batched) — the per-stage multi-ref
headroom breakdown of VERDICT r4 #7 (reference: test.py:168-181).

--split {auto,on,off} (default auto = on for TPU, matching production
_resolve_split_embed): structure the prefix programs as the TWO-scan
split-embed program (scan 1: preprocess+VGG+embed with theta stacked;
scan 2: preprocess+corr+ColorVidNet+FGS+post). The original r5 full-res
breakdown rows in BASELINE.md were measured with --split off (the
pre-split single-scan program); production is now split, so marginals
measured here with split on are the ones that add up to the production
scan. Note scan 2 re-runs the cheap uint8 preprocess (as production
does), so its cost folds into the corr marginal.
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
    ap.add_argument("--refs", type=int, default=1,
                    help="R>1: per-stage breakdown of the MULTI-exemplar "
                    "fused scan (VERDICT r4 #7 — shows which stages are "
                    "shared across refs vs R-scaled); fp32 only")
    ap.add_argument("--split", choices=["auto", "on", "off"], default="auto",
                    help="structure prefixes as the production two-scan "
                    "split-embed program (auto = on for TPU)")
    args = ap.parse_args(argv)
    if args.refs > 1:
        args.dtypes = ["fp32"]

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
    from devc_tpu.pipeline.video import (
        _device_chunk_scan,
        _device_chunk_scan_multi,
        _device_ref_features,
        _device_ref_features_multi,
        _preprocess_device,
    )
    from devc_tpu.utils.measure import Forcer, delta_time

    on_tpu = jax.default_backend() == "tpu"
    split = on_tpu if args.split == "auto" else (args.split == "on")
    h, w = args.image_size
    if not on_tpu:
        h, w = 64, 128
        args.chunk, args.n_chunks = 2, 2
    h2, w2 = h // 2, w // 2
    k = args.chunk

    params32 = _make_params(jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    r = args.refs
    ref_u8 = jnp.asarray(rng.randint(0, 256, (h, w, 3), dtype=np.uint8))
    refs_u8 = jnp.asarray(rng.randint(0, 256, (r, h, w, 3), dtype=np.uint8))
    chunks = [
        jax.device_put(rng.randint(0, 256, (k, h, w, 3), dtype=np.uint8))
        for _ in range(args.n_chunks)
    ]
    jax.block_until_ready(chunks)
    last0 = jnp.zeros((r, h2, w2, 3), jnp.float32)
    forcer = Forcer()

    STAGES = ("preprocess", "vgg", "embed", "corr", "colorvid", "upsample",
              "fgs", "post")

    def make_prefix(params, ref_state, n_stages, net_dt, split):
        """Jitted scan over [K,H,W,3] uint8 frames computing the first
        n_stages of the fused per-frame program; returns per-frame scalars.

        split=True mirrors production's two-scan split-embed structure:
        stages 1-3 live in scan 1 (theta stacked across frames), stages
        4-8 in scan 2 (which re-runs the cheap preprocess, as production
        does). split=False is the original single fused scan.
        """

        def stages13(rgb_u8, upto):
            outs = []
            lab_large, lab_small = _preprocess_device(rgb_u8)
            outs.append(jnp.sum(lab_small[..., 0]))
            theta = None
            if upto >= 2:
                a_l = lab_small[..., 0:1].astype(net_dt)
                a_rgb = cs.gray_to_rgb(a_l)
                feats = vgg19_extract(params["vgg"], a_rgb, FEATURE_TAPS)
                outs.append(
                    jnp.sum(feats[-1].astype(jnp.float32)[..., 0]))
            if upto >= 3:
                a_n = tuple(cs.feature_normalize(f) for f in feats[1:])
                theta = embed_queries(params["warpnet"], a_n, (h2, w2))
                outs.append(jnp.sum(theta.astype(jnp.float32)[..., 0]))
            return outs, theta

        def stages48(last, rgb_u8, theta):
            outs = []
            lab_large, lab_small = _preprocess_device(rgb_u8)
            a_l = lab_small[..., 0:1].astype(net_dt)
            new_last = last
            if n_stages >= 4:
                theta_r = jnp.broadcast_to(theta, (r,) + theta.shape[1:])
                warped_lab, similarity = warp_with_keys(
                    params["warpnet"], theta_r, ref_state["phi"],
                    ref_state["values"], (h2, w2), temperature=1e-10,
                    use_pallas=on_tpu, out_dtype=theta.dtype,
                )
                outs.append(jnp.sum(similarity.astype(jnp.float32)))
            if n_stages >= 5:
                a_l_r = jnp.broadcast_to(a_l, (r,) + a_l.shape[1:])
                color_input = jnp.concatenate(
                    [a_l_r, warped_lab[..., 1:3], similarity,
                     last.astype(net_dt)], axis=-1,
                )
                pred_ab = colorvidnet_apply(
                    params["colorvid"], color_input
                ).astype(jnp.float32)
                new_last = jnp.concatenate(
                    [jnp.broadcast_to(lab_small[..., 0:1],
                                      (r,) + lab_small.shape[1:3] + (1,)),
                     pred_ab], axis=-1
                )
                outs.append(jnp.sum(pred_ab[..., 0]))
            if n_stages >= 6:
                ab_up = resize_bilinear(pred_ab, (h, w)) * 1.25
                outs.append(jnp.sum(ab_up[..., 0]))
            if n_stages >= 7:
                l_large = lab_large[..., 0:1]
                guide = jnp.clip(
                    jnp.floor(
                        cs.uncenter_l(l_large[0, ..., 0]) * 255.0 / 100.0
                    ), 0.0, 255.0,
                )
                ab_up = jax.vmap(
                    lambda x: fast_global_smoother(
                        x, guide, lam=500.0, sigma_color=4.0)
                )(ab_up)
                outs.append(jnp.sum(ab_up[..., 0]))
            if n_stages >= 8:
                l_large_r = jnp.broadcast_to(
                    lab_large[..., 0:1], (r,) + lab_large.shape[1:3] + (1,))
                out_lab = jnp.concatenate([l_large_r, ab_up], axis=-1)
                rgb_out = cs.lab_centered_to_rgb(out_lab)
                u8 = jnp.floor(
                    jnp.clip(rgb_out, 0.0, 1.0) * 255.0
                ).astype(jnp.uint8)
                outs.append(jnp.sum(u8[..., 0].astype(jnp.float32)))
            return new_last, outs

        if split:
            if n_stages <= 3:
                @jax.jit
                def prog(frames_u8, last, s):
                    def body1(_, rgb_u8):
                        outs, _ = stages13(rgb_u8, n_stages)
                        return None, sum(outs)

                    _, ys = jax.lax.scan(body1, None, frames_u8 ^ s)
                    return ys, last
            else:
                @jax.jit
                def prog(frames_u8, last, s):
                    frames = frames_u8 ^ s

                    def body1(_, rgb_u8):
                        outs, theta = stages13(rgb_u8, 3)
                        return None, (theta[0], sum(outs))

                    _, (thetas, ys1) = jax.lax.scan(body1, None, frames)

                    def body2(lst, xs):
                        rgb_u8, theta, y1 = xs
                        new_last, outs = stages48(lst, rgb_u8, theta[None])
                        return new_last, y1 + sum(outs)

                    new_last, ys = jax.lax.scan(
                        body2, last, (frames, thetas, ys1))
                    return ys, new_last
        else:
            def frame(last, rgb_u8):
                outs1, theta = stages13(rgb_u8, min(n_stages, 3))
                if n_stages <= 3:
                    return last, sum(outs1)
                new_last, outs2 = stages48(last, rgb_u8, theta)
                return new_last, sum(outs1) + sum(outs2)

            @jax.jit
            def prog(frames_u8, last, s):
                new_last, ys = jax.lax.scan(frame, last, frames_u8 ^ s)
                return ys, new_last

        return prog

    def time_prog(prog):
        ctr = [0]

        def run(n):
            ctr[0] += 1
            outs = []
            cur = last0
            for chunk in chunks[:n]:
                ys, cur = prog(chunk, cur, jnp.uint8(ctr[0] % 256))
                outs.append(ys)
            return (outs, cur)

        sec_per_chunk = delta_time(run, 1, args.n_chunks, forcer)
        return sec_per_chunk / k

    results = {}
    for dt_name in args.dtypes:
        if dt_name == "bf16":
            net_dt = jnp.bfloat16
            params = jax.tree.map(
                lambda x: x.astype(jnp.bfloat16), params32
            )
            _, ref_state = _device_ref_features(params, ref_u8,
                                                compute_dtype="bfloat16")
        elif r > 1:
            net_dt = jnp.float32
            params = params32
            _, ref_state = _device_ref_features_multi(params, refs_u8)
        else:
            net_dt = jnp.float32
            params = params32
            _, ref_state = _device_ref_features(params, ref_u8)
        forcer.force(ref_state["phi"])

        per_prefix = {}
        for n_stages in range(1, len(STAGES) + 1):
            prog = make_prefix(params, ref_state, n_stages, net_dt, split)
            # warm/compile
            ys, _ = prog(chunks[0], last0, jnp.uint8(255))
            forcer.force(ys)
            per_prefix[STAGES[n_stages - 1]] = time_prog(prog)
            print(f"{dt_name} prefix<= {STAGES[n_stages-1]:>10}: "
                  f"{per_prefix[STAGES[n_stages-1]]*1e3:7.3f} ms/frame",
                  flush=True)

        # anchor: the real production scan program
        if r > 1:
            def scan_anchor(chunk, cur):
                return _device_chunk_scan_multi(
                    params, chunk, cur, ref_state, temperature=1e-10,
                    wls=True, use_pallas=on_tpu, split_embed=split,
                )
        else:
            def scan_anchor(chunk, cur):
                return _device_chunk_scan(
                    params, chunk, cur, ref_state, temperature=1e-10,
                    wls=True, use_pallas=on_tpu, split_embed=split,
                    compute_dtype="bfloat16" if dt_name == "bf16" else None,
                )
        out, cur = scan_anchor(chunks[0], last0)
        forcer.force((out, cur))
        rctr = [0]

        def run_anchor(n):
            rctr[0] += 1
            cur = last0 + rctr[0] * 1e-6
            out = None
            for chunk in chunks[:n]:
                out, cur = scan_anchor(chunk, cur)
            return (out, cur)

        anchor = delta_time(run_anchor, 1, args.n_chunks, forcer) / k
        print(f"{dt_name} production scan: {anchor*1e3:7.3f} ms/frame",
              flush=True)

        marginals = {}
        prev = 0.0
        for s in STAGES:
            marginals[s] = round((per_prefix[s] - prev) * 1e3, 3)
            prev = per_prefix[s]
        results[dt_name] = {
            "prefix_ms": {s: round(v * 1e3, 3) for s, v in per_prefix.items()},
            "marginal_ms": marginals,
            "production_scan_ms": round(anchor * 1e3, 3),
        }

    print(json.dumps({
        "metric": "fused_prefix_breakdown",
        "image_size": [h, w],
        "chunk": k,
        "refs": r,
        "split": split,
        "results": results,
    }), flush=True)
    return 0


if __name__ == "__main__":
    import sys

    from devc_tpu.utils.retry import bench_guard

    sys.exit(bench_guard(main, metric="fused_prefix_breakdown", unit="ms"))
