"""Colorspace unit tests: known CIELAB values, round-trips, and parity of
lab_to_rgb against the reference's on-device torch converter."""

import numpy as np
import jax.numpy as jnp
import torch

from devc_tpu import colorspace as cs
from tests.oracles import reference_module


def test_rgb_to_lab_known_values():
    # Standard sRGB/D65 CIELAB values for primary colors.
    rgb = np.array(
        [[[[1.0, 1.0, 1.0], [0.0, 0.0, 0.0], [1.0, 0.0, 0.0],
           [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]]]],
        dtype=np.float32,
    )
    lab = np.asarray(cs.rgb_to_lab(jnp.array(rgb)))
    expected = np.array(
        [
            [100.0, 0.0, 0.0],
            [0.0, 0.0, 0.0],
            [53.2408, 80.0925, 67.2032],
            [87.7347, -86.1827, 83.1793],
            [32.2970, 79.1875, -107.8602],
        ]
    )
    np.testing.assert_allclose(lab[0, 0], expected, atol=0.03)


def test_lab_rgb_roundtrip(rng):
    rgb = rng.rand(2, 8, 9, 3).astype(np.float32)
    lab = cs.rgb_to_lab(jnp.array(rgb))
    back = np.asarray(cs.lab_to_rgb(lab))
    np.testing.assert_allclose(back, rgb, atol=2e-3)


def test_lab_to_rgb_matches_reference_torch(rng):
    util = reference_module("utils.util")
    # network-space Lab: centered L plus ab; feed raw Lab to both.
    L = rng.rand(2, 6, 7, 1).astype(np.float32) * 100.0
    ab = (rng.rand(2, 6, 7, 2).astype(np.float32) - 0.5) * 220.0
    lab_nhwc = np.concatenate([L, ab], axis=-1)
    ours = np.asarray(cs.lab_to_rgb(jnp.array(lab_nhwc)))

    lab_nchw = torch.from_numpy(lab_nhwc.transpose(0, 3, 1, 2)).double()
    theirs = util.tensor_lab2rgb(lab_nchw).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(ours, theirs, atol=2e-5)


def test_gray_to_rgb_matches_reference(rng):
    util = reference_module("utils.util")
    l_centered = (rng.rand(2, 5, 5, 1).astype(np.float32) - 0.5) * 100
    ours = np.asarray(cs.gray_to_rgb(jnp.array(l_centered)))
    theirs = (
        util.gray2rgb_batch(torch.from_numpy(l_centered.transpose(0, 3, 1, 2)))
        .numpy()
        .transpose(0, 2, 3, 1)
    )
    np.testing.assert_allclose(ours, theirs, atol=1e-6)


def test_vgg_preprocess_matches_reference(rng):
    util = reference_module("utils.util")
    rgb = rng.rand(2, 4, 6, 3).astype(np.float32)
    ours = np.asarray(cs.vgg_preprocess(jnp.array(rgb)))
    theirs = (
        util.vgg_preprocess(torch.from_numpy(rgb.transpose(0, 3, 1, 2)))
        .numpy()
        .transpose(0, 2, 3, 1)
    )
    np.testing.assert_allclose(ours, theirs, atol=1e-5)


def test_feature_normalize_matches_reference(rng):
    util = reference_module("utils.util")
    feat = rng.randn(2, 3, 4, 8).astype(np.float32)
    ours = np.asarray(cs.feature_normalize(jnp.array(feat), axis=-1))
    theirs = (
        util.feature_normalize(torch.from_numpy(feat.transpose(0, 3, 1, 2)))
        .numpy()
        .transpose(0, 2, 3, 1)
    )
    np.testing.assert_allclose(ours, theirs, atol=1e-6)


def test_center_uncenter():
    lab = jnp.array([[[[60.0, 10.0, -20.0]]]])
    c = cs.center_lab(lab)
    np.testing.assert_allclose(np.asarray(c), [[[[10.0, 10.0, -20.0]]]])
    np.testing.assert_allclose(np.asarray(cs.uncenter_lab(c)), np.asarray(lab))
