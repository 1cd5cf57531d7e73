"""Benchmark: end-to-end frame colorization throughput on one chip.

Measures the full device pipeline per frame at 432x768 input (the
reference's default --image_size, network at 216x384): uint8 RGB in ->
Lab + downscale -> VGG19 -> fused correspondence -> ColorVidNet ->
ab upsample x2 + chroma boost -> device-side edge-aware smoothing ->
Lab -> uint8 RGB out. Random weights (the reference ships no checkpoints);
throughput is weight-independent.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} where
vs_baseline is against the 30 fps/chip target from BASELINE.md.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from devc_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    from __graft_entry__ import _make_params
    from devc_tpu.pipeline.video import _device_frame_step, _device_ref_features

    on_tpu = jax.default_backend() == "tpu"
    params = _make_params(jax.random.PRNGKey(0))

    h, w = 432, 768
    rng = np.random.RandomState(0)
    ref_u8 = jnp.asarray(rng.randint(0, 256, (h, w, 3), dtype=np.uint8))
    frames = [
        jnp.asarray(rng.randint(0, 256, (h, w, 3), dtype=np.uint8))
        for _ in range(4)
    ]

    ref_lab_small, ref_state = _device_ref_features(params, ref_u8)
    last = jnp.zeros((1, h // 2, w // 2, 3), jnp.float32)

    def step(frame, last):
        return _device_frame_step(
            params, frame, last, ref_lab_small, ref_state,
            temperature=1e-10, wls=True, use_pallas=True if on_tpu else False,
        )

    # warmup / compile
    out, last = step(frames[0], last)
    jax.block_until_ready(out)

    n_iters = 30 if on_tpu else 3
    t0 = time.perf_counter()
    for i in range(n_iters):
        out, last = step(frames[i % len(frames)], last)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    fps = n_iters / dt

    print(
        json.dumps(
            {
                "metric": "frame_colorization_fps_768x432_1chip",
                "value": round(fps, 3),
                "unit": "frames/sec",
                "vs_baseline": round(fps / 30.0, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
