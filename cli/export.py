"""Export a cli.train checkpoint to the reference's .pth format.

The reference loads its generator as two torch state_dicts
(test.py:150-159: nonlocal_net_iter_N.pth + colornet_iter_N.pth, saved by
train.py:174-226). This CLI writes a devc_tpu orbax training checkpoint in
exactly that layout, so a model trained here drops into the reference's
own inference script unmodified — the reverse of utils/convert.py's
import direction (and round-trip-tested against it,
tests/test_convert_roundtrip.py).

  python -m cli.export --train_ckpt runs/exp1/ckpt --out exported/ --iter 76000

Optionally also exports the discriminator (--discriminator, reference
discriminator_iter_N.pth) when the checkpoint carries one, and the VGG
extractor (--vgg, reference data/vgg19_conv.pth layout) so feature
parity is reproducible even for runs trained against the random-VGG
fallback.

torch is used only to serialize (CPU); the CLI pins the CPU backend
before orbax initializes jax, so the TPU is never touched.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--train_ckpt", required=True,
                    help="orbax checkpoint dir written by cli.train")
    ap.add_argument("--step", type=int, default=None,
                    help="checkpoint step (default: latest)")
    ap.add_argument("--out", required=True, help="output directory")
    ap.add_argument("--iter", type=int, default=None, dest="iteration",
                    help="iteration number in the .pth filenames "
                         "(default: the checkpoint step)")
    ap.add_argument("--discriminator", action="store_true",
                    help="also export discriminator_iter_N.pth")
    ap.add_argument("--vgg", action="store_true",
                    help="also export vgg19_conv.pth (the extractor the "
                         "run trained against — the seed-1 random VGG for "
                         "checkpoints without torch weights)")
    args = ap.parse_args(argv)

    import os

    # Pin the CPU backend BEFORE anything that initializes jax: on this
    # image sitecustomize pre-pins axon, and orbax's CheckpointManager
    # initializes the backend on construction — a later config.update
    # would silently no-op and every jax op (vgg19_init, np.asarray of
    # device leaves) would run over the TPU relay (CLAUDE.md gotcha).
    import jax

    jax.config.update("jax_platforms", "cpu")

    from devc_tpu.train.checkpoint import (
        load_run_metadata,
        load_train_state_dict,
    )
    from devc_tpu.utils.convert import (
        discriminator_to_torch,
        save_reference_checkpoints,
        vgg19_to_torch,
    )

    directory = os.path.abspath(args.train_ckpt)

    # Validate everything BEFORE writing any file, so a refusal cannot
    # leave a partial export behind.
    vgg_src = None
    if args.vgg:
        meta = load_run_metadata(directory) or {}
        vgg_src = meta.get("vgg_source")
        if vgg_src and vgg_src.startswith("torch:"):
            raise SystemExit(
                f"--vgg: this run trained against external torch VGG "
                f"weights ({vgg_src}); nothing to export — the original "
                "file is the artifact to ship")

    restored, step = load_train_state_dict(directory, args.step)
    if args.discriminator and (
            restored.get("params_d") is None
            or restored.get("sn_state") is None):
        raise SystemExit(
            "--discriminator: checkpoint has no params_d/sn_state")

    iteration = args.iteration if args.iteration is not None else step

    paths = list(save_reference_checkpoints(
        restored["params_g"], args.out, iteration))

    if args.discriminator:
        import torch

        p = os.path.join(args.out, f"discriminator_iter_{iteration}.pth")
        torch.save(discriminator_to_torch(
            restored["params_d"], restored["sn_state"]), p)
        paths.append(p)

    if args.vgg:
        import torch

        from devc_tpu.models import vgg19_init

        vgg = vgg19_init(jax.random.PRNGKey(1))  # cli.train's fallback
        p = os.path.join(args.out, "vgg19_conv.pth")
        torch.save(vgg19_to_torch(vgg), p)
        paths.append(p)

    print(json.dumps({"step": int(step), "iteration": int(iteration),
                      "written": paths}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
