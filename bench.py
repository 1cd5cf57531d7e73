"""Benchmark: end-to-end frame colorization throughput on one chip.

Measures the full device pipeline per frame at 432x768 input (the
reference's default --image_size, network at 216x384): uint8 RGB in ->
Lab + downscale -> VGG19 -> fused correspondence -> ColorVidNet ->
ab upsample x2 + chroma boost -> device-side edge-aware smoothing ->
Lab -> uint8 RGB out. Random weights (the reference ships no checkpoints);
throughput is weight-independent.

Measurement methodology (round-4 redesign, devc_tpu/utils/measure.py):
frames are processed `chunk` at a time with the whole-clip lax.scan
program (pipeline/video.py::_device_chunk_scan — the recurrent carry
crosses chunk boundaries exactly as in real clip processing). The relay
acknowledges dispatches before executing them and `block_until_ready`
does NOT wait (measured 2026-08-18: only a host fetch forces execution),
so every timed region ends with a forced 4-byte checksum fetch and
throughput comes from the DELTA between a small and a large chunk count —
constant overheads (fetch round-trip, dispatch latency, relay queue)
cancel exactly. Inputs are perturbed per round so relay execution
memoization cannot fire; outputs are never bulk-fetched (the d2h tunnel
moves ~0.4 MB/s).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "extra"}
where vs_baseline is against the 30 fps/chip target from BASELINE.md and
extra carries secondary metrics (per-dispatch stream fps; multi-exemplar
R=3 scan; full-resolution config with the net at 768x432, N=20736
correspondence).
"""

from __future__ import annotations

import json

import jax
import jax.numpy as jnp
import numpy as np

from devc_tpu.utils.measure import Forcer, delta_time


def _stage_chunks(rng, n_chunks, k, h, w):
    """Distinct uint8 frames for every chunk, staged on device up front."""
    chunks = [
        jax.device_put(rng.randint(0, 256, (k, h, w, 3), dtype=np.uint8))
        for _ in range(n_chunks)
    ]
    jax.block_until_ready(chunks)
    return chunks


def _scan_fps(params, ref_state, chunks, last0, use_pallas, forcer,
              n_small=2):
    """Frames/sec of the chunked-scan program, relay-proof (see module
    docstring). The recurrent carry chains the chunk dispatches; the
    final (out, carry) checksum transitively forces every chunk."""
    from devc_tpu.pipeline.video import _device_chunk_scan

    k = chunks[0].shape[0]
    round_ctr = [0]

    def run(n):
        round_ctr[0] += 1
        cur = last0 + round_ctr[0] * 1e-6  # defeat execution memoization
        out = None
        for chunk in chunks[:n]:
            out, cur = _device_chunk_scan(
                params, chunk, cur, ref_state,
                temperature=1e-10, wls=True, use_pallas=use_pallas,
            )
        return (out, cur)

    sec_per_chunk = delta_time(run, n_small, len(chunks), forcer)
    return k / sec_per_chunk


def main():
    from devc_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    from __graft_entry__ import _make_params
    from devc_tpu.pipeline.video import (
        _device_chunk_scan,
        _device_frame_step,
        _device_ref_features,
    )

    on_tpu = jax.default_backend() == "tpu"
    use_pallas = True if on_tpu else False
    forcer = Forcer()
    params = _make_params(jax.random.PRNGKey(0))

    h, w = 432, 768
    rng = np.random.RandomState(0)
    ref_u8 = jnp.asarray(rng.randint(0, 256, (h, w, 3), dtype=np.uint8))
    ref_lab_small, ref_state = _device_ref_features(params, ref_u8)
    last0 = jnp.zeros((1, h // 2, w // 2, 3), jnp.float32)

    k = 64 if on_tpu else 2
    n_chunks = 6 if on_tpu else 2
    chunks = _stage_chunks(rng, n_chunks, k, h, w)

    # warm / compile the scan program
    out, cur = _device_chunk_scan(params, chunks[0], last0, ref_state,
                                  temperature=1e-10, wls=True,
                                  use_pallas=use_pallas)
    forcer.force((out, cur))

    fps = _scan_fps(params, ref_state, chunks, last0, use_pallas, forcer,
                    n_small=2 if on_tpu else 1)

    # secondary: per-dispatch stream mode (relay-latency bound on axon)
    frames = [c[0] for c in chunks]
    out, cur = _device_frame_step(params, frames[0], last0, ref_lab_small,
                                  ref_state, temperature=1e-10, wls=True,
                                  use_pallas=use_pallas)
    forcer.force(cur)
    round_ctr = [0]

    def run_stream(n):
        round_ctr[0] += 1
        cur = last0 + round_ctr[0] * 1e-6
        for i in range(n):
            _, cur = _device_frame_step(params, frames[i % len(frames)], cur,
                                        ref_lab_small, ref_state,
                                        temperature=1e-10, wls=True,
                                        use_pallas=use_pallas)
        return cur

    n_stream = (5, 20) if on_tpu else (1, 2)
    stream_fps = 1.0 / delta_time(run_stream, n_stream[0], n_stream[1],
                                  forcer)

    # secondary: multi-exemplar scan mode (R=3 refs per frame in one
    # program; VERDICT r2 missing #4 — was stream-only and dispatch-bound)
    multi_scan_fps = None
    if on_tpu:
        from devc_tpu.pipeline.video import (
            _device_chunk_scan_multi,
            _device_ref_features_multi,
        )

        refs_u8 = jnp.asarray(
            rng.randint(0, 256, (3, h, w, 3), dtype=np.uint8)
        )
        _, ref_state_m = _device_ref_features_multi(params, refs_u8)
        last_m = jnp.zeros((3, h // 2, w // 2, 3), jnp.float32)
        round_ctr_m = [0]

        def run_multi(n):
            round_ctr_m[0] += 1
            cur = last_m + round_ctr_m[0] * 1e-6
            out = None
            for chunk in chunks[:n]:
                out, cur = _device_chunk_scan_multi(
                    params, chunk, cur, ref_state_m, temperature=1e-10,
                    wls=True, use_pallas=use_pallas,
                )
            return (out, cur)

        forcer.force(run_multi(1))
        multi_scan_fps = round(k / delta_time(run_multi, 2, n_chunks,
                                              forcer), 3)

    # secondary: full-resolution config — net at 768x432 (N=20736
    # correspondence, the regime the Pallas kernel exists for;
    # BASELINE.json config 3). Input 864x1536, halved by the pipeline.
    fullres_fps = None
    if on_tpu:
        fh, fw = 864, 1536
        ref_u8_f = jnp.asarray(rng.randint(0, 256, (fh, fw, 3), dtype=np.uint8))
        _, ref_state_f = _device_ref_features(params, ref_u8_f)
        last_f = jnp.zeros((1, fh // 2, fw // 2, 3), jnp.float32)
        fchunks = _stage_chunks(rng, 4, 8, fh, fw)
        out, cur = _device_chunk_scan(params, fchunks[0], last_f, ref_state_f,
                                      temperature=1e-10, wls=True,
                                      use_pallas=True)
        forcer.force((out, cur))
        fullres_fps = round(
            _scan_fps(params, ref_state_f, fchunks, last_f, True, forcer,
                      n_small=1), 3
        )

    # secondary: bf16 network stages (pre/post + carry + FGS stay fp32).
    # r2 called bf16 "not faster" from block_until_ready timings the relay
    # no longer honors; re-measured relay-proof in r4 (VERDICT r3 #5).
    bf16_fps = bf16_fullres_fps = None
    if on_tpu:
        params_bf16 = jax.tree.map(
            lambda x: x.astype(jnp.bfloat16), params
        )
        _, ref_state_b = _device_ref_features(params_bf16, ref_u8,
                                              compute_dtype="bfloat16")
        out, cur = _device_chunk_scan(params_bf16, chunks[0], last0,
                                      ref_state_b, temperature=1e-10,
                                      wls=True, use_pallas=True,
                                      compute_dtype="bfloat16")
        forcer.force((out, cur))
        round_ctr_b = [0]

        def run_bf16(n, _chunks=chunks, _ref=ref_state_b, _last=last0):
            round_ctr_b[0] += 1
            cur = _last + round_ctr_b[0] * 1e-6
            out = None
            for chunk in _chunks[:n]:
                out, cur = _device_chunk_scan(
                    params_bf16, chunk, cur, _ref, temperature=1e-10,
                    wls=True, use_pallas=True, compute_dtype="bfloat16",
                )
            return (out, cur)

        bf16_fps = round(k / delta_time(run_bf16, 2, n_chunks, forcer), 3)

        _, ref_state_bf = _device_ref_features(params_bf16, ref_u8_f,
                                               compute_dtype="bfloat16")
        out, cur = _device_chunk_scan(params_bf16, fchunks[0], last_f,
                                      ref_state_bf, temperature=1e-10,
                                      wls=True, use_pallas=True,
                                      compute_dtype="bfloat16")
        forcer.force((out, cur))

        def run_bf16_f(n):
            return run_bf16(n, _chunks=fchunks, _ref=ref_state_bf,
                            _last=last_f)

        bf16_fullres_fps = round(
            8 / delta_time(run_bf16_f, 1, 4, forcer), 3
        )

    print(
        json.dumps(
            {
                "metric": "frame_colorization_fps_input768x432_net384x216_1chip",
                "value": round(fps, 3),
                "unit": "frames/sec",
                "vs_baseline": round(fps / 30.0, 3),
                "extra": {
                    "stream_mode_per_dispatch_fps": round(stream_fps, 3),
                    "multi_ref_scan_R3_fps": multi_scan_fps,
                    "fullres_net768x432_N20736_fps": fullres_fps,
                    "bf16_net_fps": bf16_fps,
                    "bf16_net_fullres_fps": bf16_fullres_fps,
                    "chunk": k,
                    "frames_measured": n_chunks * k,
                    "methodology": "forced-fetch delta (utils/measure.py)",
                },
            }
        )
    )


if __name__ == "__main__":
    import sys

    from devc_tpu.utils.retry import bench_guard

    sys.exit(bench_guard(
        main, metric="frame_colorization_fps_input768x432_net384x216_1chip"
    ))
