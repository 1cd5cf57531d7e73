"""Train the colorization networks (CLI mirror of reference train.py:39-79).

  python -m cli.train --data_root <video_pairs> \
      --data_root_imagenet <imagenet_pairs> --checkpoint_dir ckpt/

Runs the jitted GAN train step over a ("data", "model") mesh; batch is
sharded over "data" (the reference's 4-GPU DataParallel, done as SPMD).
"""

from __future__ import annotations

import argparse
import math
import time


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--data_root", type=str, default=None,
                   help="video-pairs dataset root")
    p.add_argument("--data_root_imagenet", type=str, default=None,
                   help="imagenet-pairs dataset root")
    p.add_argument("--workers", type=int, default=8)
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--image_size", type=int, nargs=2, default=[216, 384])
    p.add_argument("--ic", type=int, default=7)
    p.add_argument("--epoch", type=int, default=40)
    p.add_argument("--max_steps", type=int, default=None)
    p.add_argument("--resume", action="store_true")
    p.add_argument("--allow_vgg_mismatch", action="store_true",
                   help="let --resume continue with a different VGG "
                        "provenance than the checkpoint records")
    p.add_argument("--checkpoint_dir", type=str, default="checkpoints/default")
    p.add_argument("--checkpoint_step", type=int, default=2000)
    p.add_argument("--log_dir", type=str, default="runs")
    p.add_argument("--tb_log_step", type=int, default=50)
    p.add_argument("--print_step", type=int, default=2)
    p.add_argument("--lr_step", type=int, default=100000)
    p.add_argument("--lr_gamma", type=float, default=0.1)
    p.add_argument("--real_reference_probability", type=float, default=0.7)
    p.add_argument("--nonzero_placeholder_probability", type=float, default=0.0)
    p.add_argument("--with_bad", action=argparse.BooleanOptionalAction,
                   default=True)
    p.add_argument("--with_mid", action=argparse.BooleanOptionalAction,
                   default=True)
    p.add_argument("--weight_l1", type=float, default=2.0)
    p.add_argument("--weight_contextual", type=float, default=0.2)
    p.add_argument("--weight_perceptual", type=float, default=0.001)
    p.add_argument("--weight_smoothness", type=float, default=5.0)
    p.add_argument("--weight_gan", type=float, default=0.2)
    p.add_argument("--weight_nonlocal_smoothness", type=float, default=0.0)
    p.add_argument("--weight_consistent", type=float, default=0.02)
    p.add_argument("--weight_nonlocal_consistent", type=float, default=0.0)
    p.add_argument("--luminance_noise", type=float, default=2.0)
    # BooleanOptionalAction so --no-permute_data actually works — the
    # reference's `type=bool` flags are truthy for any string (SURVEY §5)
    p.add_argument("--permute_data", action=argparse.BooleanOptionalAction,
                   default=True)
    p.add_argument("--domain_invariant", action="store_true")
    p.add_argument("--contextual_loss_direction", type=str, default="forward")
    p.add_argument("--vgg_ckpt", type=str, default="data/vgg19_conv.pth")
    p.add_argument("--load_pretrained_model", type=str, nargs=2, default=None,
                   metavar=("WARPNET_PTH", "COLORNET_PTH"))
    p.add_argument("--device_preprocess", action="store_true",
                   help="loader ships uint8 RGB + fp16 flows; Lab "
                        "conversion/jitter/placeholder run inside the "
                        "jitted train step (~3.7x less host->device "
                        "transfer and ~60 ms/sample less host work). "
                        "Numerics note: fp16 flow quantization shifts the "
                        "consistency-loss warp targets by <=0.5 px ulp at "
                        "several-hundred-px flows (fp16 beats bf16 here: "
                        "0.25 vs 2.0 px ulp at |flow|=256; sentinels are "
                        "clamped before the cast)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--n_model", type=int, default=1,
                   help="model-axis size of the mesh")
    p.add_argument("--spmd_step", choices=["auto", "on", "off"],
                   default="auto",
                   help="explicit-SPMD shard_map train step with bucketed "
                        "gradient pmeans (vs GSPMD per-tensor all-reduces)."
                        " auto = on for multi-device TPU meshes")
    p.add_argument("--platform", type=str, default=None,
                   choices=["cpu", "tpu", "axon"],
                   help="force a JAX backend (this image pins 'axon')")
    args = p.parse_args(argv)

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp
    import numpy as np
    import os

    from devc_tpu.data.videoloader import (
        ImageNetPairsDataset,
        PrefetchLoader,
        VideoPairsDataset,
    )
    from devc_tpu.parallel.mesh import make_mesh, shard_batch, shard_params
    from devc_tpu.train.checkpoint import CheckpointManager
    from devc_tpu.train.loop import TrainConfig, make_train_step
    from devc_tpu.train.state import create_train_state
    from devc_tpu.utils.logging import (
        AsyncImageLogger,
        MetricsLogger,
        render_lab_grids,
    )
    from devc_tpu.utils.profiling import StepTimer

    print("options:", vars(args))
    from devc_tpu.utils.logging import dump_options

    os.makedirs(args.checkpoint_dir, exist_ok=True)
    dump_options(args, os.path.join(args.checkpoint_dir, "opt.txt"))

    # ---- data ----
    datasets = []
    if args.data_root:
        datasets.append(
            VideoPairsDataset(
                args.data_root,
                image_size=args.image_size,
                real_reference_probability=args.real_reference_probability,
                nonzero_placeholder_probability=args.nonzero_placeholder_probability,
                device_preprocess=args.device_preprocess,
            )
        )
    if args.data_root_imagenet:
        datasets.append(
            ImageNetPairsDataset(
                args.data_root_imagenet,
                image_size=args.image_size,
                with_bad=args.with_bad,
                with_mid=args.with_mid,
                real_reference_probability=args.real_reference_probability,
                nonzero_placeholder_probability=args.nonzero_placeholder_probability,
                device_preprocess=args.device_preprocess,
            )
        )
    if not datasets:
        raise SystemExit("need --data_root and/or --data_root_imagenet")
    total = sum(len(d) for d in datasets)
    steps = args.max_steps or (total * args.epoch) // args.batch_size
    loader = PrefetchLoader(datasets, args.batch_size, steps,
                            workers=args.workers, seed=args.seed)
    print(f"dataset: {total} pairs, {steps} steps")

    # ---- params / state ----
    key = jax.random.PRNGKey(args.seed)
    if os.path.exists(args.vgg_ckpt):
        from devc_tpu.utils.convert import load_torch_state_dict, vgg19_from_torch

        vgg_params = vgg19_from_torch(load_torch_state_dict(args.vgg_ckpt))
        vgg_params = jax.tree.map(jnp.asarray, vgg_params)
        vgg_source = f"torch:{os.path.basename(args.vgg_ckpt)}"
    else:
        print(f"WARNING: {args.vgg_ckpt} missing; random VGG weights")
        from devc_tpu.models import vgg19_init

        vgg_params = vgg19_init(jax.random.PRNGKey(1))
        vgg_source = "random:seed1"

    warm_w = warm_c = None
    if args.load_pretrained_model:
        from devc_tpu.utils.convert import (
            colorvidnet_from_torch,
            load_torch_state_dict,
            warpnet_from_torch,
        )

        warm_w = warpnet_from_torch(load_torch_state_dict(args.load_pretrained_model[0]))
        warm_c = colorvidnet_from_torch(load_torch_state_dict(args.load_pretrained_model[1]))

    state, tx_g, tx_d = create_train_state(
        key, warm_w, warm_c, in_ch=args.ic,
        lr_step=args.lr_step, lr_gamma=args.lr_gamma,
    )

    ckpt = CheckpointManager(args.checkpoint_dir,
                             save_interval_steps=args.checkpoint_step)
    from devc_tpu.train.checkpoint import load_run_metadata, save_run_metadata

    # inference (cli.colorize --train_ckpt) reads this to refuse a
    # mismatched feature extractor instead of silently degrading.
    # On --resume the EXISTING metadata is authoritative: resuming a run
    # trained against torch VGG on a host where --vgg_ckpt is missing must
    # abort, not silently continue with the seed-1 random VGG and rewrite
    # the recorded provenance (ADVICE r3, medium).
    resuming = args.resume and ckpt.latest_step() is not None
    if resuming:
        prev_meta = load_run_metadata(args.checkpoint_dir)
        prev_vgg = (prev_meta or {}).get("vgg_source")
        if prev_vgg is not None and prev_vgg != vgg_source:
            if not args.allow_vgg_mismatch:
                raise SystemExit(
                    f"--resume: checkpoint was trained with vgg_source="
                    f"{prev_vgg!r} but this run would use {vgg_source!r}. "
                    f"Provide the matching --vgg_ckpt, or pass "
                    f"--allow_vgg_mismatch to override (this rewrites the "
                    f"recorded provenance)."
                )
            save_run_metadata(args.checkpoint_dir, {"vgg_source": vgg_source})
        elif prev_meta is None:
            save_run_metadata(args.checkpoint_dir, {"vgg_source": vgg_source})
        state = ckpt.restore(state)
        print(f"resumed at step {int(state.step)}")
    else:
        save_run_metadata(args.checkpoint_dir, {"vgg_source": vgg_source})

    # ---- mesh + jit ----
    # the data axis must divide the batch; use the largest divisor that fits
    avail = max(1, len(jax.devices()) // args.n_model)
    n_data = 1
    for d in range(min(avail, args.batch_size), 0, -1):
        if args.batch_size % d == 0:
            n_data = d
            break
    mesh = make_mesh(n_data=n_data, n_model=args.n_model)
    print(f"mesh: data={n_data}, model={args.n_model}")
    state = shard_params(mesh, state)
    vgg_params = shard_params(mesh, vgg_params)

    cfg = TrainConfig(
        weight_l1=args.weight_l1,
        weight_gan=args.weight_gan,
        weight_perceptual=args.weight_perceptual,
        weight_contextual=args.weight_contextual,
        weight_smoothness=args.weight_smoothness,
        weight_nonlocal_smoothness=args.weight_nonlocal_smoothness,
        weight_consistent=args.weight_consistent,
        weight_nonlocal_consistent=args.weight_nonlocal_consistent,
        luminance_noise=args.luminance_noise,
        permute_data=args.permute_data,
        domain_invariant=args.domain_invariant,
        contextual_direction=args.contextual_loss_direction,
        use_pallas=jax.default_backend() == "tpu",
    )
    use_spmd = (args.spmd_step == "on"
                or (args.spmd_step == "auto" and mesh.devices.size > 1
                    and jax.default_backend() == "tpu"))
    if use_spmd:
        # multi-chip: the explicit-SPMD step buckets gradient reductions
        # (one pmean per tree instead of GSPMD's per-tensor all-reduces —
        # latency-bound on ICI) and computes the RaLSGAN relativistic
        # means over the GLOBAL batch like the reference's DataParallel.
        # auto picks it only on real TPU meshes: on CPU virtual-device
        # meshes the concurrent shard_map executions convoy on the thunk
        # executors' shared locks (see docs/ROADMAP.md round-3 notes)
        from devc_tpu.train.loop import make_train_step_spmd

        step_fn = make_train_step_spmd(
            mesh, tx_g, tx_d, vgg_params, cfg,
            device_preprocess=args.device_preprocess)
    else:
        step_fn = make_train_step(tx_g, tx_d, vgg_params, cfg,
                                  device_preprocess=args.device_preprocess)

    logger = MetricsLogger(args.log_dir)
    if args.device_preprocess:
        # convert the logged uint8 batch to Lab in the logger's background
        # thread (incl. the train-time brightness jitter), never in the
        # train loop
        from devc_tpu.data.transforms import lab_to_network, rgb_to_lab_np

        def _render_u8(tensors):
            cur = np.stack([lab_to_network(rgb_to_lab_np(x))
                            for x in tensors["current_rgb"][:8]])
            cur[..., 0] += tensors["jitter"][:8, 0][:, None, None]
            ref = np.stack([lab_to_network(rgb_to_lab_np(x))
                            for x in tensors["ref_rgb"][:8]])
            return render_lab_grids({"current_gt": cur, "reference": ref})

        img_logger = AsyncImageLogger(logger, _render_u8)
    else:
        img_logger = AsyncImageLogger(logger, render_lab_grids)
    timer = StepTimer()

    with mesh:
        for batch_np in loader:
            timer.tic()
            batch = shard_batch(mesh, {
                k: jnp.asarray(v) for k, v in batch_np.items()
            })
            key, sub = jax.random.split(key)
            state, metrics = step_fn(state, batch, sub)
            step = int(state.step)
            dt = timer.toc()

            if step % args.print_step == 0:
                m = {k: float(v) for k, v in metrics.items()}
                print(
                    f"step {step}/{steps} "
                    f"({dt*1e3:.0f} ms/step) total={m['total_loss']:.3f} "
                    f"l1={m['l1_loss']:.3f} gan={m['generator_loss']:.3f}"
                )
                logger.log_scalars(step, m)
            if step % args.tb_log_step == 0:
                if args.device_preprocess:
                    img_logger.put(step, {
                        "current_rgb": batch_np["current_rgb"],
                        "ref_rgb": batch_np["ref_rgb"],
                        "jitter": batch_np["jitter"],
                    })
                else:
                    img_logger.put(step, {
                        "current_gt": batch_np["current_lab"],
                        "reference": batch_np["ref_lab"],
                    })
            ckpt.save(step, state)

    if ckpt.latest_step() != int(state.step):
        ckpt.save(int(state.step), state, force=True)
    ckpt.wait()
    img_logger.close()
    logger.close()
    print("training done")


if __name__ == "__main__":
    main()
