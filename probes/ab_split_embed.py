"""A/B the split-embed scan restructure on the PRODUCTION program.

The round-5 diagnosis (probes/corr_hlo_dump.py, BASELINE.md round-5
corr-in-context row): the Mosaic correspondence kernel blocks XLA's
space-to-batch rewrite of the batch-1 conv chain that feeds it, costing
+6.6 ms/frame at net 768x432 and +1.7 ms/frame at net 216x384 on the
embed+corr sub-program. `_device_chunk_scan(split_embed=True)` moves the
embed convs into their own lax.scan (theta stacked in HBM) so the kernel
never consumes a conv output in the same loop.

This times the REAL production chunk-scan program (the one bench.py and
cli.colorize --mode scan dispatch) with split_embed False vs True at the
reference half-res (432x768 input) and full-res (864x1536) configs, under
the forced-fetch delta protocol.

Usage: python probes/ab_split_embed.py
Prints one JSON line: ms/frame + fps per (resolution, split).
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
    ap.add_argument("--n-chunks", type=int, default=4)
    args = ap.parse_args(argv)

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    from devc_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _make_params
    from devc_tpu.pipeline.video import (
        _device_chunk_scan,
        _device_ref_features,
    )
    from devc_tpu.utils.measure import Forcer, delta_time

    on_tpu = jax.default_backend() == "tpu"
    configs = [("half", 432, 768, 64), ("full", 864, 1536, 8)]
    if not on_tpu:
        configs = [("tiny", 64, 128, 2)]
        args.n_chunks = 2

    params = _make_params(jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    forcer = Forcer()
    results = {}

    for name, h, w, k in configs:
        ref_u8 = jnp.asarray(rng.randint(0, 256, (h, w, 3), dtype=np.uint8))
        _, ref_state = _device_ref_features(params, ref_u8)
        forcer.force(ref_state["phi"])
        chunks = [
            jax.device_put(
                rng.randint(0, 256, (k, h, w, 3), dtype=np.uint8))
            for _ in range(args.n_chunks)
        ]
        jax.block_until_ready(chunks)
        last0 = jnp.zeros((1, h // 2, w // 2, 3), jnp.float32)

        for split in (False, True):
            out, cur = _device_chunk_scan(
                params, chunks[0], last0, ref_state, temperature=1e-10,
                wls=True, use_pallas=on_tpu, split_embed=split,
            )
            forcer.force((out, cur))
            ctr = [0]

            def run(n, split=split, chunks=chunks, last0=last0,
                    ref_state=ref_state):
                ctr[0] += 1
                cur = last0 + ctr[0] * 1e-6
                out = None
                for chunk in chunks[:n]:
                    out, cur = _device_chunk_scan(
                        params, chunk, cur, ref_state, temperature=1e-10,
                        wls=True, use_pallas=on_tpu, split_embed=split,
                    )
                return (out, cur)

            ms = delta_time(run, 1, args.n_chunks, forcer) / k * 1e3
            results[f"{name}_split_{split}"] = {
                "ms_per_frame": round(ms, 3),
                "fps": round(1e3 / ms, 1),
            }
            print(f"{name} split={split}: {ms:.3f} ms/frame "
                  f"({1e3 / ms:.1f} fps)", flush=True)

    print(json.dumps({
        "metric": "split_embed_ab",
        "results": results,
    }), flush=True)
    return 0


if __name__ == "__main__":
    from devc_tpu.utils.retry import bench_guard

    sys.exit(bench_guard(main, metric="split_embed_ab", unit="ms"))
