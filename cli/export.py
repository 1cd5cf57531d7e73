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

torch is used only to serialize (CPU); the TPU backend is never touched
(orbax restore is host-side numpy).
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

    import orbax.checkpoint as ocp

    from devc_tpu.utils.convert import (
        discriminator_to_torch,
        save_reference_checkpoints,
        vgg19_to_torch,
    )

    directory = os.path.abspath(args.train_ckpt)
    mgr = ocp.CheckpointManager(directory)
    step = args.step if args.step is not None else mgr.latest_step()
    if step is None:
        raise SystemExit(f"no checkpoint found under {directory}")
    restored = mgr.restore(step)
    mgr.close()
    iteration = args.iteration if args.iteration is not None else step

    paths = list(save_reference_checkpoints(
        restored["params_g"], args.out, iteration))

    if args.discriminator:
        import torch

        pd = restored.get("params_d")
        snd = restored.get("sn_state")
        if pd is None or snd is None:
            raise SystemExit(
                "--discriminator: checkpoint has no params_d/sn_state")
        p = os.path.join(args.out, f"discriminator_iter_{iteration}.pth")
        torch.save(discriminator_to_torch(pd, snd), p)
        paths.append(p)

    if args.vgg:
        import jax
        import torch

        from devc_tpu.train.checkpoint import load_run_metadata

        meta = load_run_metadata(directory) or {}
        src = meta.get("vgg_source")
        if src and src.startswith("torch:"):
            raise SystemExit(
                f"this run trained against external torch VGG weights "
                f"({src}); export nothing — the original file is the "
                "artifact to ship")
        jax.config.update("jax_platforms", "cpu")
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
