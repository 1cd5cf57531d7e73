"""Quality metrics (devc_tpu/utils/metrics.py) + cli.evaluate.

PSNR is pinned analytically; SSIM by its defining properties and a
hand-computable constant-offset case; warp_backward against the jax
flow_warp used by the training consistency loss (the same sampling
semantics as the reference's WarpingLayer, utils/warping.py:16-30).
"""

import numpy as np
import pytest

from devc_tpu.utils.metrics import (
    psnr,
    ssim,
    temporal_warp_error,
    warp_backward,
)


def test_psnr_analytic():
    a = np.zeros((16, 16), np.float64)
    b = np.full((16, 16), 16.0)  # mse = 256 -> psnr = 10*log10(255^2/256)
    assert psnr(a, b) == pytest.approx(10 * np.log10(255.0**2 / 256.0))
    assert psnr(a, a) == float("inf")


def test_psnr_shape_mismatch():
    with pytest.raises(ValueError):
        psnr(np.zeros((4, 4)), np.zeros((4, 5)))


def test_ssim_properties():
    rng = np.random.RandomState(0)
    img = rng.randint(0, 256, (64, 64)).astype(np.float64)
    assert ssim(img, img) == pytest.approx(1.0)

    # more noise -> lower ssim; any distortion < 1
    n1 = img + rng.randn(64, 64) * 5
    n2 = img + rng.randn(64, 64) * 25
    s1, s2 = ssim(img, n1), ssim(img, n2)
    assert s2 < s1 < 1.0

    # luminance-only shift: SSIM = (2 mu_a mu_b + c1)/(mu_a^2+mu_b^2+c1)
    # for constant images (variance terms drop out)
    a = np.full((32, 32), 100.0)
    b = np.full((32, 32), 120.0)
    c1 = (0.01 * 255) ** 2
    expect = (2 * 100 * 120 + c1) / (100**2 + 120**2 + c1)
    assert ssim(a, b) == pytest.approx(expect, rel=1e-6)


def test_ssim_color_is_channel_mean():
    rng = np.random.RandomState(1)
    a = rng.randint(0, 256, (32, 32, 3)).astype(np.float64)
    b = a + rng.randn(32, 32, 3) * 10
    per_ch = np.mean([ssim(a[..., c], b[..., c]) for c in range(3)])
    assert ssim(a, b) == pytest.approx(per_ch)


def test_warp_backward_matches_training_flow_warp():
    """Same bilinear sampling as the loss-side jax flow_warp (which is
    itself grid_sample-parity-tested vs the reference WarpingLayer)."""
    import jax.numpy as jnp

    from devc_tpu.train.losses import flow_warp

    rng = np.random.RandomState(2)
    img = rng.rand(12, 20, 3).astype(np.float32)
    flow = (rng.rand(12, 20, 2).astype(np.float32) - 0.5) * 4.0

    ours = warp_backward(img, flow)
    theirs = np.asarray(flow_warp(jnp.asarray(img[None]), jnp.asarray(flow[None]))[0])
    # interior matches tightly; borders differ by zero-pad vs clamp choices
    assert np.abs(ours[2:-2, 2:-2] - theirs[2:-2, 2:-2]).max() < 1e-4


def test_temporal_warp_error_zero_for_perfectly_warped():
    rng = np.random.RandomState(3)
    f0 = rng.rand(16, 16, 3) * 255
    # shift content right by 2: f1[y, x] = f0[y, x-2]
    f1 = np.roll(f0, 2, axis=1)
    # forward flow t0->t1 is (u=+2, v=0): warp_backward(f1)[y,x]=f1[y,x+2]=f0
    flow = np.zeros((16, 16, 2))
    flow[..., 0] = 2.0
    mask = np.ones((16, 16))
    mask[:, -2:] = 0  # wrapped columns are occlusions
    err = temporal_warp_error([f0, f1], [flow], [mask])
    assert err < 1e-6
    # and without the correct flow it is large
    assert temporal_warp_error([f0, f1]) > 10


def test_evaluate_cli(tmp_path):
    from PIL import Image

    from cli.evaluate import main as eval_main

    rng = np.random.RandomState(4)
    a_dir, b_dir = tmp_path / "a", tmp_path / "b"
    a_dir.mkdir(), b_dir.mkdir()
    for i in range(3):
        img = rng.randint(0, 256, (32, 48, 3)).astype(np.uint8)
        Image.fromarray(img).save(a_dir / f"{i:05d}.png")
        noisy = np.clip(img.astype(int) + rng.randint(-4, 5, img.shape), 0, 255)
        Image.fromarray(noisy.astype(np.uint8)).save(b_dir / f"{i:05d}.png")

    assert eval_main(["--dir_a", str(a_dir), "--dir_b", str(b_dir),
                      "--min_psnr", "30"]) == 0
    # impossible threshold -> nonzero
    assert eval_main(["--dir_a", str(a_dir), "--dir_b", str(b_dir),
                      "--min_psnr", "99"]) == 1
