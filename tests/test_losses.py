"""Loss parity vs the reference implementations."""

import numpy as np
import jax.numpy as jnp
import torch

from devc_tpu.train import losses as L
from tests.oracles import reference_module


def _nchw(x):
    return torch.from_numpy(np.ascontiguousarray(x.transpose(0, 3, 1, 2)))


def test_contextual_loss_parity(rng):
    cl = reference_module("models.ContextualLoss")
    x = rng.randn(2, 8, 10, 16).astype(np.float32)
    y = rng.randn(2, 8, 10, 16).astype(np.float32)

    ours_fwd = np.asarray(L.contextual_loss(jnp.array(x), jnp.array(y),
                                            direction="forward"))
    ours_bwd = np.asarray(L.contextual_loss(jnp.array(x), jnp.array(y),
                                            direction="backward"))
    with torch.no_grad():
        ref_fwd = cl.ContextualLoss_forward()(_nchw(x), _nchw(y)).numpy()
        ref_bwd = cl.ContextualLoss()(_nchw(x), _nchw(y)).numpy()
    np.testing.assert_allclose(ours_fwd, ref_fwd, atol=1e-4)
    np.testing.assert_allclose(ours_bwd, ref_bwd, atol=1e-4)


def test_weighted_average_color_parity(rng):
    nl = reference_module("models.NonlocalNet")
    lab_gt = rng.randn(2, 8, 9, 3).astype(np.float32) * 20
    lab_pred = rng.randn(2, 8, 9, 3).astype(np.float32) * 20

    ours = np.asarray(
        L.weighted_average_color(jnp.array(lab_gt), jnp.array(lab_pred),
                                 patch_size=3, alpha=10.0)
    )
    with torch.no_grad():
        theirs = nl.WeightedAverage_color()(
            _nchw(lab_gt), _nchw(lab_pred), patch_size=3, alpha=10
        ).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(ours, theirs, atol=1e-4)


def test_nonlocal_weighted_average_parity(rng):
    nl = reference_module("models.NonlocalNet")
    lab = rng.randn(1, 8, 8, 3).astype(np.float32) * 20
    feat = rng.randn(1, 8, 8, 6).astype(np.float32)
    feat /= np.linalg.norm(feat, axis=-1, keepdims=True)

    ours, _ = L.nonlocal_weighted_average(
        jnp.array(lab), jnp.array(feat), patch_size=3, alpha=0.5, scale_factor=1
    )
    with torch.no_grad():
        theirs = nl.NonlocalWeightedAverage()(
            _nchw(lab), _nchw(feat), patch_size=3, alpha=0.5, scale_factor=1
        ).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(ours), theirs, atol=1e-4)


def test_flow_warp_matches_grid_sample(rng):
    x = rng.randn(2, 9, 11, 3).astype(np.float32)
    flow = rng.randn(2, 9, 11, 2).astype(np.float32) * 2

    ours = np.asarray(L.flow_warp(jnp.array(x), jnp.array(flow)))

    # reference WarpingLayer semantics (utils/warping.py:16-30) without cuda
    xt = _nchw(x)
    ft = _nchw(flow)
    n, c, h, w = xt.shape
    gx = torch.linspace(-1, 1, w).view(1, 1, 1, w).expand(n, 1, h, w)
    gy = torch.linspace(-1, 1, h).view(1, 1, h, 1).expand(n, 1, h, w)
    norm = torch.zeros_like(ft)
    norm[:, 0] = ft[:, 0] / ((w - 1) / 2.0)
    norm[:, 1] = ft[:, 1] / ((h - 1) / 2.0)
    grid = (torch.cat([gx, gy], 1) + norm).permute(0, 2, 3, 1)
    theirs = torch.nn.functional.grid_sample(
        xt, grid, align_corners=True
    ).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(ours, theirs, atol=1e-4)


def test_weighted_losses_parity(rng):
    util = reference_module("utils.util")
    x = rng.randn(2, 4, 5, 2).astype(np.float32)
    y = rng.randn(2, 4, 5, 2).astype(np.float32)
    w = rng.rand(2, 4, 5, 2).astype(np.float32)
    ours_l1 = float(L.weighted_l1(jnp.array(x), jnp.array(y), jnp.array(w)))
    ours_mse = float(L.weighted_mse(jnp.array(x), jnp.array(y), jnp.array(w)))
    ref_l1 = float(util.weighted_l1_loss(_nchw(x), _nchw(y), _nchw(w)))
    ref_mse = float(util.weighted_mse_loss(_nchw(x), _nchw(y), _nchw(w)))
    np.testing.assert_allclose(ours_l1, ref_l1, rtol=1e-5)
    np.testing.assert_allclose(ours_mse, ref_mse, rtol=1e-5)


def test_colorfulness_parity(rng):
    util = reference_module("utils.util")
    ab = rng.randn(3, 6, 7, 2).astype(np.float32) * 30
    ours = np.asarray(L.colorfulness(jnp.array(ab)))
    theirs = util.colorfulness(_nchw(ab)).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-4)


def test_ralsgan_losses(rng):
    # reference formulas train.py:594-599 (D) and :629-636 (G)
    real = rng.randn(8, 1).astype(np.float32)
    fake = rng.randn(8, 1).astype(np.float32)
    d = float(L.ralsgan_d_loss(jnp.array(real), jnp.array(fake)))
    g = float(L.ralsgan_g_loss(jnp.array(real), jnp.array(fake)))
    d_ref = (
        np.mean((real - fake.mean() - 1) ** 2)
        + np.mean((fake - real.mean() + 1) ** 2)
    ) / 2
    g_ref = (
        np.mean((real - fake.mean() + 1) ** 2)
        + np.mean((fake - real.mean() - 1) ** 2)
    ) / 2
    np.testing.assert_allclose(d, d_ref, rtol=1e-5)
    np.testing.assert_allclose(g, g_ref, rtol=1e-5)
