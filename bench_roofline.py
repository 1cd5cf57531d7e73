"""Roofline accounting for the fused frame step (reproduces BASELINE.md).

Compiles the whole-clip scan program for the half-res and full-res
configs, pulls FLOPs / bytes-accessed from XLA's own cost model
(Compiled.cost_analysis()), and compares the implied HBM and fp32-compute
rooflines against a measured run. This is the one-command reproduction of
BASELINE.md's "speed of light" rows and DESIGN.md's full-res analysis.

Usage: python bench_roofline.py [--platform cpu] [--skip-measure]
Prints one JSON line per config.
"""

from __future__ import annotations

import argparse
import json

import numpy as np

# v5e (per chip). Other chips: override via flags.
HBM_GBPS_DEFAULT = 820.0
FP32_TFLOPS_DEFAULT = 49.0  # bf16 peak ~197; fp32-faithful ~1/4


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default=None)
    ap.add_argument("--hbm-gbps", type=float, default=HBM_GBPS_DEFAULT)
    ap.add_argument("--fp32-tflops", type=float, default=FP32_TFLOPS_DEFAULT)
    ap.add_argument("--skip-measure", action="store_true",
                    help="cost analysis only (no timed run)")
    ap.add_argument("-k", type=int, default=16, help="frames per scan chunk")
    args = ap.parse_args(argv)

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    from devc_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _make_params
    from devc_tpu.pipeline.video import _device_chunk_scan, _device_ref_features

    on_tpu = jax.default_backend() == "tpu"
    params = _make_params(jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    k = args.k if on_tpu else 2

    configs = [("halfres_net216x384", 432, 768)]
    if on_tpu:
        configs.append(("fullres_net432x768", 864, 1536))

    for name, h, w in configs:
        ref_u8 = jnp.asarray(rng.randint(0, 256, (h, w, 3), dtype=np.uint8))
        _, ref_state = _device_ref_features(params, ref_u8)
        last = jnp.zeros((1, h // 2, w // 2, 3), jnp.float32)
        frames = jnp.asarray(rng.randint(0, 256, (k, h, w, 3), dtype=np.uint8))

        lowered = jax.jit(
            lambda p, f, l, r: _device_chunk_scan(
                p, f, l, r, temperature=1e-10, wls=True, use_pallas=on_tpu
            )
        ).lower(params, frames, last, ref_state)
        compiled = lowered.compile()
        ca = compiled.cost_analysis()
        flops = float(ca.get("flops", 0.0)) / k
        byts = float(ca.get("bytes accessed", 0.0)) / k

        hbm_roof_ms = byts / (args.hbm_gbps * 1e9) * 1e3
        flop_roof_ms = flops / (args.fp32_tflops * 1e12) * 1e3

        measured_ms = None
        if not args.skip_measure:
            # relay-proof timing (utils/measure.py): forced-fetch delta
            # between a 1-chunk and a 3-chunk chain; distinct inputs per
            # dispatch (carry perturbation) defeat relay memoization
            from devc_tpu.utils.measure import Forcer, delta_time

            rep_frames = [
                jax.device_put(
                    rng.randint(0, 256, (k, h, w, 3), dtype=np.uint8)
                )
                for _ in range(3)
            ]
            jax.block_until_ready(rep_frames)
            forcer = Forcer()
            ctr = [0]

            def run(n):
                ctr[0] += 1
                cur = last + ctr[0] * 1e-6
                out = None
                for f in rep_frames[:n]:
                    out, cur = compiled(params, f, cur, ref_state)
                return (out, cur)

            forcer.force(run(1))
            measured_ms = delta_time(run, 1, 3, forcer) / k * 1e3

        rec = {
            "config": name,
            "per_frame_gflop": round(flops / 1e9, 1),
            "per_frame_gbytes": round(byts / 1e9, 2),
            "hbm_roofline_ms": round(hbm_roof_ms, 2),
            "fp32_compute_roofline_ms": round(flop_roof_ms, 2),
            "binding_roofline_ms": round(max(hbm_roof_ms, flop_roof_ms), 2),
        }
        if measured_ms is not None:
            rec["measured_ms"] = round(measured_ms, 2)
            rec["pct_of_roofline"] = round(
                100.0 * max(hbm_roof_ms, flop_roof_ms) / measured_ms, 1
            )
        print(json.dumps(rec))


if __name__ == "__main__":
    import sys

    from devc_tpu.utils.retry import bench_guard

    sys.exit(bench_guard(main, metric="roofline_ms", unit="ms"))
