"""Data layer tests: flow I/O, native forward warp, masks, transforms."""

import numpy as np
import pytest
from PIL import Image

from devc_tpu.data import distortion as D
from devc_tpu.data.flow import read_flo, write_flo
from devc_tpu.data.native import _forward_warp_numpy, forward_warp, get_lib
from devc_tpu.data.transforms import (
    center_crop,
    center_pad,
    rgb_to_lab_np,
    lab_to_network,
    sort_frames_numerically,
)


def test_flo_roundtrip(tmp_path, rng):
    flow = rng.randn(7, 9, 2).astype(np.float32)
    p = str(tmp_path / "x.flo")
    write_flo(p, flow)
    back = read_flo(p)
    np.testing.assert_array_equal(back, flow)


def test_sort_frames_numerically():
    names = ["f10.jpg", "f2.jpg", "frame001.png", "f1.jpg"]
    assert sort_frames_numerically(names) == [
        "frame001.png", "f1.jpg", "f2.jpg", "f10.jpg",
    ]


def test_forward_warp_identity(rng):
    src = (rng.rand(20, 30, 3) * 255).astype(np.uint8)
    zero = np.zeros((20, 30), np.float32)
    out = forward_warp(src, zero, zero)
    np.testing.assert_array_equal(out, src)


def test_forward_warp_translation(rng):
    # constant flow u=2: source content appears shifted right by 2
    src = np.zeros((16, 24, 3), np.uint8)
    src[:, 5:8] = 200
    u = np.full((16, 24), 2.0, np.float32)
    v = np.zeros((16, 24), np.float32)
    out = forward_warp(src, u, v, max_iter=10, precision=1e-4)
    assert out[:, 7:10].mean() > 150
    assert out[:, 5:6].mean() < 60


def test_forward_warp_native_matches_numpy(rng):
    if get_lib() is None:
        pytest.skip("native lib unavailable")
    src = (rng.rand(32, 48, 3) * 255).astype(np.uint8)
    import scipy.ndimage as ndi

    u = (ndi.gaussian_filter(rng.rand(32, 48) * 2 - 1, 8) * 40).astype(np.float32)
    v = (ndi.gaussian_filter(rng.rand(32, 48) * 2 - 1, 8) * 40).astype(np.float32)
    a = forward_warp(src, u, v, 3, 1e-3)
    b = _forward_warp_numpy(src, u, v, 3, 1e-3)
    assert (np.abs(a.astype(int) - b.astype(int)) > 2).mean() < 0.01


def test_occlusion_mask_zero_flow_all_valid(rng):
    img = (rng.rand(16, 16, 3) * 255).astype(np.uint8)
    flow = np.zeros((16, 16, 2), np.float32)
    mask = D.occlusion_mask(img, img, flow)
    assert mask.shape == (16, 16, 1)
    np.testing.assert_array_equal(mask, np.ones_like(mask))


def test_occlusion_mask_flags_out_of_frame():
    img = np.full((16, 16, 3), 128, np.uint8)
    flow = np.zeros((16, 16, 2), np.float32)
    flow[:, :4, 0] = -100.0  # first cols warp out of frame
    mask = D.occlusion_mask(img, img, flow)
    assert mask[:, :4].max() == 0.0
    assert mask[:, 8:].min() == 1.0


def test_center_pad_shapes():
    img = Image.fromarray(np.zeros((100, 300, 3), np.uint8))
    out = center_pad(img, (64, 128))
    assert out.size == (128, 64)
    img2 = Image.fromarray(np.zeros((300, 100, 3), np.uint8))
    out2 = center_pad(img2, (64, 128))
    assert out2.size == (128, 64)


def test_native_resize_matches_numpy():
    """The C++ anti-aliased resize must be numerically identical (float64)
    to the numpy implementation of the reference's CenterPad resize."""
    from devc_tpu.data.native import resize_aa_native
    from devc_tpu.data.transforms import resize_antialiased_np

    rng = np.random.RandomState(0)
    img = (rng.rand(90, 140, 3) * 255).astype(np.uint8)
    native = resize_aa_native(img, (61, 97))
    if native is None:  # no compiler in this environment
        import pytest

        pytest.skip("native library unavailable")
    ref = resize_antialiased_np(img.astype(np.float64), (61, 97))
    assert np.abs(native - ref).max() < 1e-9
    # upscale (no prefilter) and grayscale paths
    up_n = resize_aa_native(img[::4, ::4], (80, 120))
    up_r = resize_antialiased_np(img[::4, ::4].astype(np.float64), (80, 120))
    assert np.abs(up_n - up_r).max() < 1e-9
    g_n = resize_aa_native(img[..., 0], (45, 70))
    g_r = resize_antialiased_np(img[..., 0].astype(np.float64), (45, 70))
    assert np.abs(g_n - g_r).max() < 1e-9


def test_center_crop():
    arr = np.arange(5 * 6).reshape(5, 6)
    out = center_crop(arr, (3, 4))
    assert out.shape == (3, 4)
    np.testing.assert_array_equal(out, arr[1:4, 1:5])


def test_rgb_to_lab_np_matches_device(rng):
    import jax.numpy as jnp

    from devc_tpu import colorspace as cs

    rgb = (rng.rand(8, 9, 3) * 255).astype(np.uint8)
    host = rgb_to_lab_np(rgb)
    dev = np.asarray(cs.rgb_to_lab(jnp.array(rgb / 255.0, jnp.float32)))
    np.testing.assert_allclose(host, dev, atol=2e-3)


def test_lab_to_network_centers_l():
    lab = np.array([[[50.0, 3.0, -4.0]]], np.float32)
    out = lab_to_network(lab)
    np.testing.assert_allclose(out, [[[0.0, 3.0, -4.0]]])


def test_random_erasing_bounds(rng):
    img = np.zeros((32, 32, 3), np.uint8)
    out = D.random_erasing(img, probability=1.0, rng=np.random.RandomState(0))
    assert out.shape == img.shape
    assert out.sum() > 0  # something was erased with noise


def test_elastic_flow_smoothness(rng):
    dx, dy = D.random_elastic_flow((32, 48), alpha_max=3.0,
                                   rng=np.random.RandomState(1))
    assert dx.shape == (32, 48)
    # gaussian-smoothed field: neighboring values are close
    assert np.abs(np.diff(dx, axis=0)).max() < 5.0


def test_fft_gaussian_blur_matches_scipy():
    """The FFT path of _gaussian_blur_constant is the same zero-padded
    truncated-kernel operator scipy.ndimage applies directly."""
    from scipy.ndimage import gaussian_filter

    x = np.random.RandomState(7).rand(96, 128) * 2 - 1
    for sigma in (8.0, 20.0, 50.0):
        ref = gaussian_filter(x, sigma, mode="constant", cval=0)
        got = D._gaussian_blur_constant(x, sigma)
        assert np.abs(ref - got).max() < 1e-12


def test_flow_to_color_properties(rng):
    from devc_tpu.data.flow import flow_to_color

    flow = rng.randn(16, 20, 2).astype(np.float32) * 5
    img = flow_to_color(flow)
    assert img.shape == (16, 20, 3) and img.dtype == np.uint8
    # zero flow maps to (near-)white under the Middlebury convention
    white = flow_to_color(np.zeros((4, 4, 2), np.float32))
    assert white.min() >= 250


def test_moving_avg():
    from devc_tpu.utils.logging import MovingAvg

    m = MovingAvg(pool_size=3)
    assert m.update(1) == 1
    assert m.update(3) == 2
    assert m.update(5) == 3
    assert m.update(7) == 5  # window slides: (3+5+7)/3
