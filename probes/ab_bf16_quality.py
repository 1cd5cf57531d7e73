"""A/B: bf16 network stages vs fp32 — QUALITY on real frames.

bf16 wins throughput at the full-res config (49.9 vs 45.9 fps,
BASELINE.md round-5 official bench row) but until now had no quality
measurement behind it.  This probe colorizes real reference sample
frames (`/root/reference/sample_videos/clips/v32`) with the SAME
weights both ways and reports, per frame:

  * TEACHER-FORCED deltas — the bf16 frame step consumes the fp32
    path's recurrent carry, so the recurrence cannot amplify (CLAUDE.md:
    free-running cross-program comparisons with random weights amplify
    ~20x/frame through the non-contractive generator).  This is the
    honest per-frame numeric cost of bf16: uint8 output PSNR, max abs
    uint8 diff, and the carry's network-ab delta (±128 scale).
  * FREE-RUNNING PSNR between the two paths' own trajectories
    (context only; amplified by the recurrence under random weights).

Weights: --train_ckpt <orbax dir> (e.g. the 1000-step convergence
checkpoint, /tmp/devc_convergence/ckpt) loads the trained generator the
way cli.colorize --train_ckpt does (seed-1 random VGG fallback);
default is the seed-0 random init.  Metrics are computed ON DEVICE and
only K scalars are fetched (the relay d2h link is ~0.4 MB/s; never bulk-
fetch frames).

Usage:
  python probes/ab_bf16_quality.py                      # TPU, full-res
  python probes/ab_bf16_quality.py --platform cpu --image-size 128 256
"""

import argparse
import functools
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default=None, choices=["cpu", "axon"])
    ap.add_argument("--image-size", type=int, nargs=2, default=[864, 1536],
                    help="input H W (net runs at /2); default the full-res "
                         "config where bf16 wins throughput")
    ap.add_argument("--frames", type=int, default=16)
    ap.add_argument("--clip", default="/root/reference/sample_videos/clips/v32")
    ap.add_argument("--ref", default="/root/reference/sample_videos/ref/v32/01.jpg")
    ap.add_argument("--train_ckpt", default=None,
                    help="orbax checkpoint dir from cli.train; default "
                         "random seed-0 weights")
    ap.add_argument("--temperature", type=float, default=1e-10)
    args = ap.parse_args(argv)

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    from devc_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    import jax.numpy as jnp
    import numpy as np

    from devc_tpu.data.transforms import list_clip_frames, load_frame_rgb
    from devc_tpu.pipeline.video import _device_ref_features, _frame_body

    on_tpu = jax.default_backend() == "tpu"
    use_pallas = True if on_tpu else False
    h, w = args.image_size

    if args.train_ckpt:
        from devc_tpu.models import vgg19_init
        from devc_tpu.train.checkpoint import (
            load_run_metadata,
            load_train_params_g,
        )

        src = (load_run_metadata(args.train_ckpt) or {}).get("vgg_source")
        if src and src.startswith("torch:"):
            # same guard as cli.colorize: pairing a torch-VGG-trained
            # generator with the seed-1 random extractor would measure
            # quality on mismatched features without any hard failure
            raise SystemExit(
                f"{args.train_ckpt} trained against {src}; this probe "
                "only carries the seed-1 random VGG — run it through "
                "cli.colorize with --vgg_ckpt instead")
        params = {"vgg": vgg19_init(jax.random.PRNGKey(1)),
                  **load_train_params_g(args.train_ckpt)}
        weights = f"trained:{args.train_ckpt}"
    else:
        from __graft_entry__ import _make_params

        params = _make_params(jax.random.PRNGKey(0))
        weights = "random:seed0"
    params_bf16 = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)

    names = list_clip_frames(args.clip)[: args.frames]
    frames = jnp.asarray(np.stack([
        load_frame_rgb(os.path.join(args.clip, n), (h, w)) for n in names
    ]))
    ref_u8 = jnp.asarray(load_frame_rgb(args.ref, (h, w)))
    _, ref32 = _device_ref_features(params, ref_u8)
    _, ref16 = _device_ref_features(params_bf16, ref_u8,
                                    compute_dtype="bfloat16")

    def psnr_u8(a, b):
        d = a.astype(jnp.float32) - b.astype(jnp.float32)
        mse = jnp.maximum(jnp.mean(d * d), 1e-12)
        return 10.0 * jnp.log10(255.0 * 255.0 / mse)

    # THREE single-body programs, not one triple-body scan: the fused
    # 3-body full-res program exceeded the relay's remote-compile request
    # size cap (HTTP 413, same failure mode as the multi-ref Python
    # unroll — BASELINE.md round-5). Program A also materializes the fp32
    # per-frame carries so B can teacher-force from them.

    @functools.partial(jax.jit, static_argnames=("temperature",))
    def run_fp32(frames_u8, last0, temperature):
        def body(last, rgb_u8):
            out, new = _frame_body(
                params, rgb_u8, last, ref32, temperature, True,
                500.0, 4.0, use_pallas)
            return new, (out, new)

        _, (outs, carries) = jax.lax.scan(body, last0, frames_u8)
        return outs, carries

    @functools.partial(jax.jit, static_argnames=("temperature",))
    def run_bf16_tf(frames_u8, in_carries, outs32, last0, temperature):
        # teacher-forced: frame i consumes the fp32 carry from frame i-1
        def body(_, xs):
            rgb_u8, last32, out32 = xs
            out16, new16 = _frame_body(
                params_bf16, rgb_u8, last32, ref16, temperature, True,
                500.0, 4.0, use_pallas, compute_dtype="bfloat16")
            d = out32.astype(jnp.int32) - out16.astype(jnp.int32)
            return None, (psnr_u8(out32, out16),
                          jnp.max(jnp.abs(d)).astype(jnp.float32),
                          new16)

        prev = jnp.concatenate([last0[None], in_carries[:-1]], axis=0)
        _, (psnr, maxu8, news16) = jax.lax.scan(
            body, None, (frames_u8, prev, outs32))
        ab_dev = jnp.max(
            jnp.abs(news16[..., 1:3] - in_carries[..., 1:3]),
            axis=(1, 2, 3, 4))
        return psnr, maxu8, ab_dev

    @functools.partial(jax.jit, static_argnames=("temperature",))
    def run_bf16_free(frames_u8, outs32, last0, temperature):
        def body(last, xs):
            rgb_u8, out32 = xs
            out16, new16 = _frame_body(
                params_bf16, rgb_u8, last, ref16, temperature, True,
                500.0, 4.0, use_pallas, compute_dtype="bfloat16")
            return new16, psnr_u8(out32, out16)

        return jax.lax.scan(body, last0, (frames_u8, outs32))[1]

    last0 = jnp.zeros((1, h // 2, w // 2, 3), jnp.float32)
    outs32, carries32 = run_fp32(frames, last0, args.temperature)
    tf_psnr, tf_maxu8, tf_ab = map(np.asarray, run_bf16_tf(
        frames, carries32, outs32, last0, args.temperature))
    fr_psnr = np.asarray(run_bf16_free(frames, outs32, last0,
                                       args.temperature))

    for i in range(len(tf_psnr)):
        print(f"frame {i:2d}: teacher-forced PSNR {tf_psnr[i]:6.2f} dB  "
              f"max|u8| {tf_maxu8[i]:4.0f}  carry|ab| {tf_ab[i]:7.3f}  "
              f"free-running PSNR {fr_psnr[i]:6.2f} dB")
    rec = {
        "metric": "bf16_quality_ab",
        "image_size": [h, w],
        "frames": int(len(tf_psnr)),
        "weights": weights,
        "temperature": args.temperature,
        "results": {
            "teacher_forced_psnr_db": {
                "min": round(float(tf_psnr.min()), 2),
                "mean": round(float(tf_psnr.mean()), 2)},
            "teacher_forced_max_u8_diff": int(tf_maxu8.max()),
            "teacher_forced_max_carry_ab": round(float(tf_ab.max()), 3),
            "free_running_psnr_db": {
                "min": round(float(fr_psnr.min()), 2),
                "mean": round(float(fr_psnr.mean()), 2)},
        },
    }
    print(json.dumps(rec))
    return 0


if __name__ == "__main__":
    from devc_tpu.utils.retry import bench_guard

    sys.exit(bench_guard(main, metric="bf16_quality_ab", unit="db"))
