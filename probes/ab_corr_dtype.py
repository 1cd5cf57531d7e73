"""Why is the Pallas correspondence kernel SLOWER on bf16 inputs?

probes/fused_prefix_probe.py (round 5, BASELINE.md) measured the corr
marginal at full-res as 9.08 ms fp32 vs 10.49 ms bf16 inside the fused
scan — the kernel loses on bf16 inputs even though bf16 halves its HBM
traffic and the MXU's bf16 rate is 2x fp32. Hypothesis: Mosaic's bf16
matmul lowering (packed sublanes, layout conversion before the MXU) is
slower than its f32 path at these tile shapes, so the dot should be
done in f32 INSIDE the kernel while keeping the bf16 HBM format.

A/B (forced-fetch delta protocol, utils/measure.py), kernel alone in a
lax.scan at the full-res shape N=20736, C=256, V=3:
  f32        — f32 inputs (the production fp32 path)
  bf16       — bf16 inputs, bf16 dot (the pre-fix bf16-pipeline path)
  bf16_kf32  — bf16 inputs, kernel casts embeddings up to f32 for the
               dot (`score_f32=True`) — halved HBM traffic, fast matmul
  bf16_xcast — bf16 inputs cast to f32 by XLA before the kernel
               (isolates the conversion cost from the kernel path)
  f32_sbf16  — f32 inputs, `score_bf16=True` (kernel casts DOWN)

Also reports max |out| deviation of each variant vs the f32 reference
(values scale +-128) at training temperature.

Usage: python probes/ab_corr_dtype.py [--n 20736] [--chunk 16]
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
    ap.add_argument("--n", type=int, default=20736)
    ap.add_argument("--c", type=int, default=256)
    ap.add_argument("--chunk", type=int, default=16)
    ap.add_argument("--n-chunks", type=int, default=4)
    ap.add_argument("--temperature", type=float, default=1e-10)
    args = ap.parse_args(argv)

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    from devc_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from devc_tpu.ops.pallas_corr import correspondence_warp_pallas
    from devc_tpu.utils.measure import Forcer, delta_time

    on_tpu = jax.default_backend() == "tpu"
    n, c, k = args.n, args.c, args.chunk
    interpret = not on_tpu
    if not on_tpu:
        n, c, k = 512, 64, 2
        args.n_chunks = 2

    rng = np.random.RandomState(0)
    # unit-norm-ish embeddings as the network produces (cosine scores)
    theta_f32 = rng.randn(args.n_chunks, k, 1, n, c).astype(np.float32)
    theta_f32 /= np.linalg.norm(theta_f32, axis=-1, keepdims=True)
    phi_f32 = rng.randn(1, n, c).astype(np.float32)
    phi_f32 /= np.linalg.norm(phi_f32, axis=-1, keepdims=True)
    values_f32 = (rng.rand(1, n, 3).astype(np.float32) * 256.0) - 128.0

    forcer = Forcer()
    results = {}
    ref_out = {}

    variants = [
        ("f32", np.float32, dict(score_f32=False)),
        ("bf16", jnp.bfloat16, dict(score_f32=False)),
        ("bf16_kf32", jnp.bfloat16, dict(score_f32=True)),
        ("bf16_xcast", jnp.bfloat16, dict(score_f32=False, xcast=True)),
        ("f32_sbf16", np.float32, dict(score_bf16=True)),
    ]

    for tag, dt, opts in variants:
        opts = dict(opts)
        xcast = opts.pop("xcast", False)
        chunks = [jax.device_put(t.astype(dt)) for t in theta_f32]
        phi = jax.device_put(phi_f32.astype(dt))
        values = jax.device_put(values_f32.astype(dt))
        jax.block_until_ready([chunks, phi, values])

        def body(carry, th, phi=phi, values=values, opts=opts, xcast=xcast):
            th = th + carry.astype(th.dtype) * 1e-3
            if xcast:
                th32 = th.astype(jnp.float32)
                out, sim = correspondence_warp_pallas(
                    th32, phi.astype(jnp.float32),
                    values.astype(jnp.float32),
                    temperature=args.temperature, interpret=interpret,
                    **opts)
            else:
                out, sim = correspondence_warp_pallas(
                    th, phi, values, temperature=args.temperature,
                    interpret=interpret, **opts)
            return out[..., :1].astype(jnp.float32), (
                jnp.sum(out.astype(jnp.float32)),
                jnp.sum(sim.astype(jnp.float32)))

        @jax.jit
        def prog(ths, c0, body=body):
            return jax.lax.scan(body, c0, ths)

        c0 = jnp.zeros((1, n, 1), jnp.float32)
        out0 = prog(chunks[0], c0)
        forcer.force(out0)

        # numerics: one un-scanned apply vs the f32 reference
        th1 = chunks[0][0]
        if xcast:
            o1, _ = correspondence_warp_pallas(
                th1.astype(jnp.float32), phi.astype(jnp.float32),
                values.astype(jnp.float32),
                temperature=args.temperature, interpret=interpret, **opts)
        else:
            o1, _ = correspondence_warp_pallas(
                th1, phi, values, temperature=args.temperature,
                interpret=interpret, **opts)
        o1 = np.asarray(o1, dtype=np.float32)
        if tag == "f32":
            ref_out["o"] = o1
        dev = float(np.max(np.abs(o1 - ref_out["o"]))) if "o" in ref_out else -1.0

        ctr = [0]

        def run(nc, prog=prog, chunks=chunks, ctr=ctr):
            ctr[0] += 1
            carry = c0 + ctr[0] * 1e-6
            outs = None
            for ch in chunks[:nc]:
                carry, outs = prog(ch, carry)
            return (carry, outs)

        ms = delta_time(run, 1, args.n_chunks, forcer) / k * 1e3
        results[tag] = {"ms": round(ms, 3), "max_dev_vs_f32": round(dev, 4)}
        print(f"{tag:11s}: {ms:7.3f} ms/apply   max|out-f32| {dev:.4f}",
              flush=True)

    print(json.dumps({
        "metric": "corr_dtype_ab",
        "n": n, "c": c, "chunk": k,
        "temperature": args.temperature,
        "results": results,
    }), flush=True)
    return 0


if __name__ == "__main__":
    from devc_tpu.utils.retry import bench_guard

    sys.exit(bench_guard(main, metric="corr_dtype_ab", unit="ms"))
