"""Golden-parity switch (VERDICT r3 #4).

The reference ships 14 precomputed output frames
(`/root/reference/sample_videos/output/v32_01/00000.jpg…00013.jpg`)
produced by its iteration-76000 checkpoints (`test.py:154-158`) on clip
v32 with exemplar ref/v32/01.jpg at the default 432×768 image size, WLS
on, frame_propagate off (`test.py:130`). The checkpoints themselves are an
external download absent from this snapshot, so this test SKIPS until
they exist — the moment they appear it converts them, colorizes the same
14 frames through cli.colorize, and scores PSNR against the shipped
goldens (target <0.5 dB delta per BASELINE.json; since the goldens ARE
the reference output, that materializes as a high absolute PSNR bar).

One-command recipe once the downloads are available (see README):

  mkdir -p data checkpoints/video_moredata_l1
  # place vgg19_conv.pth in data/ and
  # {nonlocal_net,colornet}_iter_76000.pth in checkpoints/video_moredata_l1/
  python -m pytest tests/test_golden_pretrained.py -q

Checkpoint locations checked (first hit wins):
  $DEVC_PRETRAINED_DIR, <repo>/checkpoints/video_moredata_l1,
  /root/reference/checkpoints/video_moredata_l1
VGG:  $DEVC_VGG_CKPT, <repo>/data/vgg19_conv.pth,
  /root/reference/data/vgg19_conv.pth
"""

import os

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF = "/root/reference"


def _first_existing(paths):
    for p in paths:
        if p and os.path.exists(p):
            return p
    return None


def _ckpt_paths():
    dirs = [
        os.environ.get("DEVC_PRETRAINED_DIR"),
        os.path.join(REPO, "checkpoints", "video_moredata_l1"),
        os.path.join(REF, "checkpoints", "video_moredata_l1"),
    ]
    for d in dirs:
        if not d:
            continue
        warp = os.path.join(d, "nonlocal_net_iter_76000.pth")
        color = os.path.join(d, "colornet_iter_76000.pth")
        if os.path.exists(warp) and os.path.exists(color):
            return warp, color
    return None, None


VGG = _first_existing([
    os.environ.get("DEVC_VGG_CKPT"),
    os.path.join(REPO, "data", "vgg19_conv.pth"),
    os.path.join(REF, "data", "vgg19_conv.pth"),
])
WARP, COLOR = _ckpt_paths()
GOLDEN_DIR = os.path.join(REF, "sample_videos", "output", "v32_01")
CLIP_DIR = os.path.join(REF, "sample_videos", "clips", "v32")
REF_IMG = os.path.join(REF, "sample_videos", "ref", "v32", "01.jpg")

pytestmark = pytest.mark.skipif(
    not (VGG and WARP and COLOR and os.path.isdir(GOLDEN_DIR)),
    reason="pretrained checkpoints (external download) not present — see "
           "module docstring for the one-command recipe",
)


def test_golden_v32_ref01_psnr(tmp_path):
    from PIL import Image

    from cli.colorize import main as colorize_main
    from devc_tpu.utils.metrics import psnr

    goldens = sorted(
        f for f in os.listdir(GOLDEN_DIR) if f.endswith(".jpg")
    )
    n = len(goldens)  # 14 shipped frames
    assert n >= 14

    # the goldens cover the first n frames (numeric order) of the clip;
    # recurrence only looks backward, so colorizing just those n frames
    # reproduces the same outputs as running the full 180-frame clip
    clip = tmp_path / "v32"
    clip.mkdir()
    frames = sorted(
        os.listdir(CLIP_DIR),
        key=lambda x: int(os.path.splitext(x)[0]),
    )[:n]
    for f in frames:
        os.symlink(os.path.join(CLIP_DIR, f), clip / f)

    out = tmp_path / "out"
    colorize_main([
        "--clip_path", str(clip),
        "--ref_path", REF_IMG,
        "--output_path", str(out),
        "--image_size", "432", "768",
        "--vgg_ckpt", VGG,
        "--warpnet_ckpt", WARP,
        "--colornet_ckpt", COLOR,
        "--temperature", "1e-10",
        "--no_video",
    ])

    scores = []
    for i, g in enumerate(goldens):
        ours = np.asarray(
            Image.open(out / "v32_01" / f"{i:05d}.jpg").convert("RGB"),
            np.float64,
        )
        gold = np.asarray(
            Image.open(os.path.join(GOLDEN_DIR, g)).convert("RGB"),
            np.float64,
        )
        assert ours.shape == gold.shape
        scores.append(psnr(ours, gold))

    mean_psnr = float(np.mean(scores))
    print(f"golden v32_01 PSNR per frame: "
          f"{[round(s, 2) for s in scores]} mean={mean_psnr:.2f} dB")
    # goldens are the reference's own output (through one extra JPEG
    # encode); parity with trained (contractive) weights should land well
    # above 30 dB. 30 dB is the refuse-to-regress floor, not the target —
    # record the measured number in PARITY.md when this first passes.
    assert mean_psnr >= 30.0
