"""Per-stage breakdown of ColorVidNet itself at full resolution.

After the round-5 split-embed fix, ColorVidNet is the dominant cost of
the full-res frame: 10.42 ms of the 21.81 ms production step (48%), and
its in-context marginal equals its standalone apply cost — so the lever,
if any, is inside the generator, not the program structure around it
(BASELINE.md round-5 "Split-embed full-res prefix breakdown" row).

This probe localizes the 10.4 ms across the ten conv stages of
`models/colorvidnet.py::colorvidnet_apply` (reference
models/ColorVidNet.py:96-144) with the same prefix-delta protocol as
probes/fused_prefix_probe.py: time scans computing growing PREFIXES of
the generator, take marginals, and pair each marginal with the prefix's
XLA cost-analysis FLOP/byte delta so every stage gets an effective
TFLOP/s and a roofline verdict. jax.profiler is not trustworthy through
the relay (execution is deferred past the trace window), hence prefixes.

Stage cuts (mirroring colorvidnet_apply):
  enc1   conv1_1a/1_1b/1_2 + IN + ss-down      @ full net res, 64ch
  enc2   conv2_1/2_2 + IN + ss-down            @ 1/2,  128ch
  enc3   conv3_1..3 + IN + ss-down             @ 1/4,  256ch
  enc4   conv4_1..3 + IN                       @ 1/8,  512ch
  mid56  conv5_1..6_3 (dilation 2) + 2x IN     @ 1/8,  512ch
  mid7   conv7_1..3 + IN                       @ 1/8,  512ch
  dec8   up x2 + conv8_1 + skip(conv3_3_short) + conv8_2/8_3 + IN  @ 1/4
  dec9   up x2 + conv9_1 + skip(conv2_2_short) + conv9_2 + IN      @ 1/2
  dec10  up x2 + conv10_1 + skip(conv1_2_short) + conv10_2 + ab + tanh

Inputs are uint8 [K, H, W, 7] chunks scaled on device to network ranges
(L +-50, ab +-128, similarity 0..1) and xor-perturbed per dispatch so
the relay's execution memoization cannot fire; every timed region ends
in a forced checksum fetch (utils/measure.py).

Usage: python probes/cvn_prefix_probe.py [--net-size 432 768]
Prints one JSON line: per-stage marginal ms, GFLOP, effective TFLOP/s.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

STAGES = ("enc1", "enc2", "enc3", "enc4", "mid56", "mid7",
          "dec8", "dec9", "dec10")


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default=None)
    ap.add_argument("--net-size", type=int, nargs=2, default=(432, 768),
                    help="ColorVidNet input resolution (net res = image/2)")
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

    from devc_tpu.models.colorvidnet import _c, _down, colorvidnet_init
    from devc_tpu.ops.layers import instance_norm
    from devc_tpu.ops.resize import upsample_nearest
    from devc_tpu.utils.measure import Forcer, delta_time

    on_tpu = jax.default_backend() == "tpu"
    h, w = args.net_size
    if not on_tpu:
        h, w = 64, 128
        args.chunk, args.n_chunks = 2, 2
    k = args.chunk

    params32 = colorvidnet_init(jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    chunks = [
        jax.device_put(rng.randint(0, 256, (k, h, w, 7), dtype=np.uint8))
        for _ in range(args.n_chunks)
    ]
    jax.block_until_ready(chunks)
    forcer = Forcer()

    def prefix(params, x, upto, net_dt):
        """colorvidnet_apply (models/colorvidnet.py:112-175) cut after
        STAGES[upto-1]; returns the last activation computed."""
        c1 = jax.nn.relu(_c(params, "conv1_1b", _c(params, "conv1_1a", x)))
        c1 = jax.nn.relu(_c(params, "conv1_2", c1, relu=False))
        n1 = instance_norm(c1)
        x2 = _down(params, "conv1_2norm_ss", n1)
        if upto == 1:
            return x2
        c2 = _c(params, "conv2_1", x2)
        c2 = jax.nn.relu(_c(params, "conv2_2", c2, relu=False))
        n2 = instance_norm(c2)
        x3 = _down(params, "conv2_2norm_ss", n2)
        if upto == 2:
            return x3
        c3 = _c(params, "conv3_1", x3)
        c3 = _c(params, "conv3_2", c3)
        c3 = _c(params, "conv3_3", c3)
        n3 = instance_norm(c3)
        x4 = _down(params, "conv3_3norm_ss", n3)
        if upto == 3:
            return x4
        c4 = _c(params, "conv4_1", x4)
        c4 = _c(params, "conv4_2", c4)
        c4 = _c(params, "conv4_3", c4)
        h_ = instance_norm(c4)
        if upto == 4:
            return h_
        for stage in ("conv5", "conv6"):
            h_ = _c(params, f"{stage}_1", h_)
            h_ = _c(params, f"{stage}_2", h_)
            h_ = _c(params, f"{stage}_3", h_)
            h_ = instance_norm(h_)
        if upto == 5:
            return h_
        h_ = _c(params, "conv7_1", h_)
        h_ = _c(params, "conv7_2", h_)
        h_ = _c(params, "conv7_3", h_)
        h_ = instance_norm(h_)
        if upto == 6:
            return h_
        u8_ = _c(params, "conv8_1", upsample_nearest(h_, 2), relu=False)
        s8 = _c(params, "conv3_3_short", n3, relu=False)
        h_ = jax.nn.relu(u8_ + s8)
        h_ = _c(params, "conv8_2", h_)
        h_ = _c(params, "conv8_3", h_)
        h_ = instance_norm(h_)
        if upto == 7:
            return h_
        u9 = _c(params, "conv9_1", upsample_nearest(h_, 2), relu=False)
        s9 = _c(params, "conv2_2_short", n2, relu=False)
        h_ = jax.nn.relu(u9 + s9)
        h_ = _c(params, "conv9_2", h_)
        h_ = instance_norm(h_)
        if upto == 8:
            return h_
        u10 = _c(params, "conv10_1", upsample_nearest(h_, 2), relu=False)
        s10 = _c(params, "conv1_2_short", n1, relu=False)
        h_ = jax.nn.relu(u10 + s10)
        from devc_tpu.ops.layers import leaky_relu

        h_ = leaky_relu(_c(params, "conv10_2", h_, relu=False), 0.2)
        ab = _c(params, "conv10_ab", h_, relu=False)
        return jnp.tanh(ab) * 128.0

    # network-range scaling of the uint8 input, matching the 7 channels
    # [L, warped_a, warped_b, similarity, prev_L, prev_a, prev_b]
    scale = jnp.asarray([100 / 255, 1, 1, 1 / 255, 100 / 255, 1, 1],
                        jnp.float32)
    shift = jnp.asarray([-50, -128, -128, 0, -50, -128, -128], jnp.float32)

    def make_prog(params, upto, net_dt):
        @jax.jit
        def prog(frames_u8, s):
            def body(_, x_u8):
                x = (x_u8.astype(jnp.float32) * scale + shift)[None]
                y = prefix(params, x.astype(net_dt), upto, net_dt)
                return None, jnp.sum(y.astype(jnp.float32))

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
    for dt_name in args.dtypes:
        net_dt = jnp.bfloat16 if dt_name == "bf16" else jnp.float32
        params = (jax.tree.map(lambda x: x.astype(jnp.bfloat16), params32)
                  if dt_name == "bf16" else params32)

        per_prefix, per_flops, per_bytes = {}, {}, {}
        for upto, name in enumerate(STAGES, start=1):
            prog = make_prog(params, upto, net_dt)
            lowered = prog.lower(chunks[0], jnp.uint8(255))
            compiled = lowered.compile()
            ca = compiled.cost_analysis() or {}
            # XLA's HloCostAnalysis visits a while-loop body ONCE (trip
            # count is not folded in), so the reported flops/bytes of the
            # scan program are already ~per-frame (verified: the enc2-enc1
            # flops delta equals one frame's conv FLOPs, not k frames').
            per_flops[name] = float(ca.get("flops", 0.0))
            per_bytes[name] = float(ca.get("bytes accessed", 0.0))
            ys = prog(chunks[0], jnp.uint8(255))
            forcer.force(ys)
            per_prefix[name] = time_prog(prog)
            print(f"{dt_name} prefix<= {name:>6}: "
                  f"{per_prefix[name]*1e3:7.3f} ms/frame "
                  f"({per_flops[name]/1e9:6.1f} GF, "
                  f"{per_bytes[name]/1e9:5.2f} GB)", flush=True)

        marg = {}
        prev_t, prev_f, prev_b = 0.0, 0.0, 0.0
        for s in STAGES:
            dt_ms = (per_prefix[s] - prev_t) * 1e3
            df = per_flops[s] - prev_f
            db = per_bytes[s] - prev_b
            marg[s] = {
                "ms": round(dt_ms, 3),
                "gflop": round(df / 1e9, 1),
                "gbytes": round(db / 1e9, 3),
                "tflops": round(df / max(dt_ms, 1e-9) / 1e9, 1),
                "gbps": round(db / max(dt_ms, 1e-9) / 1e6, 0),
            }
            prev_t, prev_f, prev_b = per_prefix[s], per_flops[s], per_bytes[s]
            print(f"{dt_name} marginal {s:>6}: {marg[s]['ms']:7.3f} ms  "
                  f"{marg[s]['gflop']:6.1f} GF -> {marg[s]['tflops']:5.1f} "
                  f"TF/s, {marg[s]['gbps']:5.0f} GB/s", flush=True)
        results[dt_name] = {
            "prefix_ms": {s: round(v * 1e3, 3) for s, v in per_prefix.items()},
            "marginal": marg,
            "total_ms": round(per_prefix[STAGES[-1]] * 1e3, 3),
        }

    print(json.dumps({
        "metric": "cvn_prefix_breakdown",
        "net_size": [h, w],
        "chunk": k,
        "results": results,
    }), flush=True)
    return 0


if __name__ == "__main__":
    from devc_tpu.utils.retry import bench_guard

    sys.exit(bench_guard(main, metric="cvn_prefix_breakdown", unit="ms"))
