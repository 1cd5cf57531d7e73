"""Colorize a clip of grayscale frames with one or more exemplar images.

CLI mirror of the reference inference entry point (test.py:127-186):

  python -m cli.colorize --clip_path sample_videos/clips/v32 \
      --ref_path sample_videos/ref/v32 --output_path out/ \
      --vgg_ckpt data/vgg19_conv.pth \
      --warpnet_ckpt checkpoints/.../nonlocal_net_iter_76000.pth \
      --colornet_ckpt checkpoints/.../colornet_iter_76000.pth

Without checkpoints (none ship with the reference repo), --random_init runs
the full pipeline with randomly initialized weights (useful for smoke/perf).
"""

from __future__ import annotations

import argparse
import os
import sys
import time


def build_params(args):
    import jax
    import jax.numpy as jnp

    if getattr(args, "train_ckpt", None):
        # inference from our own cli.train checkpoint (orbax): generator
        # params from the TrainState, VGG resolved exactly as cli.train
        # resolved it (torch weights if present, else the seed-1 random
        # extractor the training run actually used)
        import os

        from devc_tpu.train.checkpoint import (
            load_run_metadata,
            load_train_params_g,
        )

        params_g = load_train_params_g(args.train_ckpt, args.train_ckpt_step)
        meta = load_run_metadata(args.train_ckpt)
        trained_vgg = (meta or {}).get("vgg_source")  # None for old ckpts
        if os.path.exists(args.vgg_ckpt):
            from devc_tpu.utils.convert import (
                load_torch_state_dict,
                vgg19_from_torch,
            )

            if trained_vgg == "random:seed1":
                raise SystemExit(
                    f"{args.train_ckpt} was trained with the seed-1 random "
                    f"VGG but {args.vgg_ckpt} exists here — inference with "
                    "torch VGG weights would mismatch the trained features. "
                    "Point --vgg_ckpt at a nonexistent path to use the "
                    "random extractor the run trained against."
                )
            vgg = vgg19_from_torch(load_torch_state_dict(args.vgg_ckpt))
        else:
            from devc_tpu.models import vgg19_init

            if trained_vgg and trained_vgg.startswith("torch:") and \
                    not args.allow_random_vgg:
                raise SystemExit(
                    f"{args.train_ckpt} was trained against torch VGG "
                    f"weights ({trained_vgg}) but {args.vgg_ckpt} is "
                    "missing — the random-VGG fallback would silently "
                    "produce wrong colorizations. Provide --vgg_ckpt or "
                    "pass --allow_random_vgg to override."
                )
            print(f"WARNING: {args.vgg_ckpt} missing; using the seed-1 "
                  "random VGG (matches cli.train's fallback)")
            vgg = vgg19_init(jax.random.PRNGKey(1))
        params = {"vgg": vgg, **params_g}
    elif args.random_init:
        from devc_tpu.utils.init import host_pipeline_params

        params = host_pipeline_params(args.seed)
    else:
        from devc_tpu.utils.convert import convert_checkpoints

        vgg, warp, color = convert_checkpoints(
            args.vgg_ckpt, args.warpnet_ckpt, args.colornet_ckpt
        )
        params = {"vgg": vgg, "warpnet": warp, "colorvid": color}
    dtype = jnp.bfloat16 if args.bf16 else jnp.float32
    if args.bf16:
        params = jax.tree.map(lambda x: jnp.asarray(x, dtype), params)
    else:
        params = jax.tree.map(jnp.asarray, params)
    return params


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--clip_path", type=str, required=True)
    p.add_argument("--ref_path", type=str, required=True,
                   help="directory of reference images, or a single image")
    p.add_argument("--output_path", type=str, required=True)
    p.add_argument("--image_size", type=int, nargs=2, default=[432, 768],
                   metavar=("H", "W"))
    p.add_argument("--frame_propagate", action="store_true",
                   help="use the first frame as the reference")
    p.add_argument("--no_wls", action="store_true",
                   help="disable edge-aware post smoothing")
    p.add_argument("--temperature", type=float, default=1e-10)
    p.add_argument("--vgg_ckpt", type=str, default="data/vgg19_conv.pth")
    p.add_argument("--warpnet_ckpt", type=str,
                   default="checkpoints/video_moredata_l1/nonlocal_net_iter_76000.pth")
    p.add_argument("--colornet_ckpt", type=str,
                   default="checkpoints/video_moredata_l1/colornet_iter_76000.pth")
    p.add_argument("--random_init", action="store_true")
    p.add_argument("--train_ckpt", type=str, default=None,
                   help="colorize with a cli.train checkpoint directory "
                        "(orbax; overrides the torch checkpoint flags)")
    p.add_argument("--allow_random_vgg", action="store_true",
                   help="with --train_ckpt: permit the seed-1 random VGG "
                        "even though the checkpoint records training "
                        "against torch VGG weights")
    p.add_argument("--train_ckpt_step", type=int, default=None,
                   help="checkpoint step to load (default: latest)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--bf16", action="store_true",
                   help="run the network stages in bfloat16: +9%% "
                        "throughput at the full-res config (49.9 vs 45.9 "
                        "fps on v5e; half-res a wash) and quality-checked "
                        "vs fp32 on trained weights (teacher-forced PSNR "
                        "49.6 dB — BASELINE.md round-5). fp32 stays the "
                        "default for bit-faithful reference parity")
    p.add_argument("--no_pallas", action="store_true",
                   help="force the einsum correspondence path")
    p.add_argument("--serial_refs", action="store_true",
                   help="process reference images one at a time (the "
                        "reference behavior) instead of batched on device")
    p.add_argument("--no_video", action="store_true")
    p.add_argument("--mode", type=str, default="stream",
                   choices=["stream", "scan"],
                   help="stream: one program per frame; scan: chunks of "
                        "frames as one lax.scan program")
    p.add_argument("--chunk", type=int, default=64,
                   help="frames per scan program (mode=scan)")
    p.add_argument("--split_embed", action=argparse.BooleanOptionalAction,
                   default=None,
                   help="mode=scan: run VGG/embed and correspondence/"
                        "generator as two lax.scan loops so the Mosaic "
                        "corr kernel does not block XLA's space-to-batch "
                        "conv rewrite (default: on for TPU, off "
                        "elsewhere; see BASELINE.md round-5)")
    p.add_argument("--device_resize", action="store_true",
                   help="run the CenterPad anti-aliased resize on device "
                        "as matmuls (host keeps only JPEG decode; needs a "
                        "uniform clip resolution; <=1 uint8 deviation)")
    p.add_argument("--platform", type=str, default=None,
                   choices=["cpu", "tpu", "axon"],
                   help="force a JAX backend (this image pins 'axon')")
    args = p.parse_args(argv)

    # the net runs at (H/2, W/2); its H must divide by 8 (the feature pyramid
    # replicate-pads the mod-16==8 case in H only, reference
    # NonlocalNet.py:461-463) and its W by 16 — so input H % 16, W % 32.
    h, w = args.image_size
    if h % 16 or w % 32:
        p.error(
            f"--image_size {h} {w}: H must be a multiple of 16 and W a "
            "multiple of 32 (the reference default is 432 768)"
        )
    # NOTE: no jax-bearing devc_tpu imports before the jax.config.update
    # below — they create device constants at import time, which pins the
    # pre-set backend (axon on this image) and silently defeats
    # --platform. data.transforms is numpy/PIL-only and safe.
    from devc_tpu.data.transforms import VIDEO_EXTS

    clip_is_video = (os.path.isfile(args.clip_path)
                     and args.clip_path.lower().endswith(VIDEO_EXTS))
    if not (os.path.isdir(args.clip_path) or clip_is_video):
        p.error(f"--clip_path {args.clip_path}: not a directory or a "
                "video file (.mp4/.avi/.mov/.mkv/.webm)")
    if not os.path.exists(args.ref_path):
        p.error(f"--ref_path {args.ref_path}: does not exist")

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    from devc_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    from devc_tpu.pipeline.video import colorize_video

    params = build_params(args)
    clip_name = os.path.basename(os.path.normpath(args.clip_path))
    if clip_is_video:  # strip the container extension, keep dir names as-is
        clip_name = os.path.splitext(clip_name)[0]

    if os.path.isdir(args.ref_path):
        refs = sorted(os.listdir(args.ref_path))
        refs = [os.path.join(args.ref_path, r) for r in refs]
    else:
        refs = [args.ref_path]

    if len(refs) > 1 and not args.serial_refs and not args.frame_propagate:
        from devc_tpu.pipeline.video import colorize_video_multi

        out_dirs = [
            os.path.join(
                args.output_path,
                f"{clip_name}_{os.path.splitext(os.path.basename(r))[0]}",
            )
            for r in refs
        ]
        print(f"colorizing {args.clip_path} against {len(refs)} exemplars "
              f"(batched) -> {args.output_path}")
        t0 = time.time()
        written = colorize_video_multi(
            params,
            args.clip_path,
            refs,
            out_dirs,
            image_size=tuple(args.image_size),
            temperature=args.temperature,
            wls=not args.no_wls,
            use_pallas=False if args.no_pallas else None,
            write_video=not args.no_video,
            device_resize=args.device_resize,
            split_embed=args.split_embed,
        )
        dt = time.time() - t0
        n = sum(len(w) for w in written)
        print(f"  {n} frames in {dt:.1f}s ({n / dt:.2f} fps incl. compile)")
        return

    for ref in refs:
        ref_id = os.path.splitext(os.path.basename(ref))[0]
        out_dir = os.path.join(args.output_path, f"{clip_name}_{ref_id}")
        print(f"colorizing {args.clip_path} with exemplar {ref} -> {out_dir}")
        t0 = time.time()
        try:
            written = colorize_video(
                params,
                args.clip_path,
                ref,
                out_dir,
                image_size=tuple(args.image_size),
                temperature=args.temperature,
                wls=not args.no_wls,
                frame_propagate=args.frame_propagate,
                use_pallas=False if args.no_pallas else None,
                write_video=not args.no_video,
                mode=args.mode,
                chunk=args.chunk,
                compute_dtype="bfloat16" if args.bf16 else None,
                device_resize=args.device_resize,
                split_embed=args.split_embed,
            )
        except Exception as err:  # keep going per exemplar (reference
            print(f"  error colorizing with {ref}: {err}")  # test.py:179-181)
            continue
        dt = time.time() - t0
        n = len(written)
        print(f"  {n} frames in {dt:.1f}s ({n / dt:.2f} fps incl. compile)")


if __name__ == "__main__":
    main()
