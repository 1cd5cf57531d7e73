"""Parity tests for resize / pooling / layer primitives vs torch."""

import numpy as np
import jax
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from devc_tpu import ops


def _t(x_nhwc):
    return torch.from_numpy(np.ascontiguousarray(x_nhwc.transpose(0, 3, 1, 2)))


def _n(x_torch):
    return x_torch.detach().numpy().transpose(0, 2, 3, 1)


def test_resize_bilinear_down_matches_torch(rng):
    x = rng.randn(2, 12, 16, 3).astype(np.float32)
    ours = np.asarray(ops.resize_bilinear(jnp.array(x), (6, 8)))
    theirs = _n(F.interpolate(_t(x), scale_factor=0.5, mode="bilinear"))
    np.testing.assert_allclose(ours, theirs, atol=1e-5)


def test_resize_bilinear_up_matches_torch(rng):
    x = rng.randn(1, 7, 9, 2).astype(np.float32)
    ours = np.asarray(ops.resize_bilinear(jnp.array(x), (14, 18)))
    theirs = _n(F.interpolate(_t(x), scale_factor=2, mode="bilinear"))
    np.testing.assert_allclose(ours, theirs, atol=1e-5)


def test_resize_bilinear_arbitrary_matches_torch(rng):
    x = rng.randn(1, 11, 5, 4).astype(np.float32)
    ours = np.asarray(ops.resize_bilinear(jnp.array(x), (17, 13)))
    theirs = _n(F.interpolate(_t(x), size=(17, 13), mode="bilinear"))
    np.testing.assert_allclose(ours, theirs, atol=1e-5)


def test_upsample_nearest_matches_torch(rng):
    x = rng.randn(2, 5, 6, 3).astype(np.float32)
    for s in (2, 4):
        ours = np.asarray(ops.upsample_nearest(jnp.array(x), s))
        theirs = _n(torch.nn.Upsample(scale_factor=s)(_t(x)))
        np.testing.assert_allclose(ours, theirs)


def test_avg_pool_matches_torch(rng):
    x = rng.randn(2, 8, 12, 3).astype(np.float32)
    ours = np.asarray(ops.avg_pool(jnp.array(x), 4))
    theirs = _n(F.avg_pool2d(_t(x), 4))
    np.testing.assert_allclose(ours, theirs, atol=1e-6)


def test_max_pool_matches_torch(rng):
    x = rng.randn(2, 9, 9, 4).astype(np.float32)  # odd: floor mode
    ours = np.asarray(ops.max_pool(jnp.array(x), 2))
    theirs = _n(F.max_pool2d(_t(x), 2))
    np.testing.assert_allclose(ours, theirs)


def test_conv2d_matches_torch(rng):
    x = rng.randn(2, 9, 10, 5).astype(np.float32)
    conv = torch.nn.Conv2d(5, 7, 3, stride=2, padding=1)
    w = conv.weight.detach().numpy().transpose(2, 3, 1, 0)  # OIHW->HWIO
    b = conv.bias.detach().numpy()
    ours = np.asarray(
        ops.conv2d({"w": jnp.array(w), "b": jnp.array(b)}, jnp.array(x),
                   stride=2, padding=1)
    )
    theirs = _n(conv(_t(x)))
    np.testing.assert_allclose(ours, theirs, atol=1e-5)


def test_conv2d_dilated_matches_torch(rng):
    x = rng.randn(1, 8, 8, 4).astype(np.float32)
    conv = torch.nn.Conv2d(4, 6, 3, stride=1, padding=2, dilation=2)
    w = conv.weight.detach().numpy().transpose(2, 3, 1, 0)
    b = conv.bias.detach().numpy()
    ours = np.asarray(
        ops.conv2d({"w": jnp.array(w), "b": jnp.array(b)}, jnp.array(x),
                   padding=2, dilation=2)
    )
    theirs = _n(conv(_t(x)))
    np.testing.assert_allclose(ours, theirs, atol=1e-5)


def test_conv2d_grouped_matches_torch(rng):
    # the learned per-channel 1x1 stride-2 downsample of ColorVidNet
    x = rng.randn(2, 8, 8, 16).astype(np.float32)
    conv = torch.nn.Conv2d(16, 16, 1, stride=2, bias=False, groups=16)
    w = conv.weight.detach().numpy().transpose(2, 3, 1, 0)
    ours = np.asarray(
        ops.conv2d({"w": jnp.array(w)}, jnp.array(x), stride=2, groups=16)
    )
    theirs = _n(conv(_t(x)))
    np.testing.assert_allclose(ours, theirs, atol=1e-6)


def test_instance_norm_matches_torch(rng):
    x = rng.randn(3, 6, 7, 8).astype(np.float32) * 4 + 2
    ours = np.asarray(ops.instance_norm(jnp.array(x)))
    theirs = _n(torch.nn.InstanceNorm2d(8)(_t(x)))
    np.testing.assert_allclose(ours, theirs, atol=1e-5)


def test_prelu_matches_torch(rng):
    x = rng.randn(2, 4, 4, 3).astype(np.float32)
    m = torch.nn.PReLU()
    with torch.no_grad():
        m.weight.fill_(0.3)
    ours = np.asarray(ops.prelu({"a": jnp.array([0.3], jnp.float32)}, jnp.array(x)))
    theirs = _n(m(_t(x)))
    np.testing.assert_allclose(ours, theirs, atol=1e-6)


def test_reflect_pad_matches_torch(rng):
    x = rng.randn(1, 5, 6, 2).astype(np.float32)
    ours = np.asarray(ops.reflect_pad(jnp.array(x), 1))
    theirs = _n(torch.nn.ReflectionPad2d(1)(_t(x)))
    np.testing.assert_allclose(ours, theirs)


def test_replicate_pad_matches_torch(rng):
    x = rng.randn(1, 5, 6, 2).astype(np.float32)
    ours = np.asarray(ops.replicate_pad(jnp.array(x), pad_h=(1, 1)))
    theirs = _n(F.pad(_t(x), (0, 0, 1, 1), "replicate"))
    np.testing.assert_allclose(ours, theirs)


def test_unfold_matches_torch(rng):
    x = rng.randn(2, 6, 7, 3).astype(np.float32)
    ours = np.asarray(ops.unfold_patches(jnp.array(x), 3))
    t = F.unfold(_t(x), kernel_size=3, padding=1)  # [N, C*9, H*W]
    theirs = t.numpy().reshape(2, 3 * 9, 6, 7).transpose(0, 2, 3, 1)
    np.testing.assert_allclose(ours, theirs, atol=1e-6)


def test_correspondence_einsum_basic(rng):
    b, nq, nk, c = 2, 12, 10, 8
    theta = rng.randn(b, nq, c).astype(np.float32)
    phi = rng.randn(b, nk, c).astype(np.float32)
    vals = rng.randn(b, nk, 3).astype(np.float32)
    warped, sim = ops.correspondence_warp_einsum(
        jnp.array(theta), jnp.array(phi), jnp.array(vals), temperature=0.01
    )
    # oracle in numpy
    f = np.einsum("bqc,bkc->bqk", theta, phi)
    sim_ref = f.max(-1, keepdims=True)
    a = np.exp((f - f.max(-1, keepdims=True)) / 0.01)
    a /= a.sum(-1, keepdims=True)
    warped_ref = np.einsum("bqk,bkv->bqv", a, vals)
    np.testing.assert_allclose(np.asarray(sim), sim_ref, atol=1e-5)
    np.testing.assert_allclose(np.asarray(warped), warped_ref, atol=1e-4)


def test_correspondence_hard_argmax_temperature():
    # T=1e-10 must behave as exact argmax-average, not produce NaNs.
    theta = jnp.array([[[1.0, 0.0], [0.0, 1.0]]])
    phi = jnp.array([[[1.0, 0.0], [0.0, 1.0], [1.0, 0.0]]])
    vals = jnp.array([[[10.0], [20.0], [30.0]]])
    warped, sim = ops.correspondence_warp_einsum(theta, phi, vals, temperature=1e-10)
    w = np.asarray(warped)
    assert np.isfinite(w).all()
    # row 0 ties between keys 0 and 2 -> mean(10, 30) = 20
    np.testing.assert_allclose(w[0, 0, 0], 20.0, atol=1e-4)
    np.testing.assert_allclose(w[0, 1, 0], 20.0, atol=1e-4)


def test_wta_scale_matches_reference(rng):
    """Forward + backward parity with the reference custom autograd Function
    at its default scale=1e-4 (the only scale it ever uses)."""
    import jax
    from tests.oracles import reference_module

    nl = reference_module("models.NonlocalNet")
    f = rng.randn(2, 6, 8).astype(np.float32)
    ct = rng.randn(2, 6, 8).astype(np.float32)

    # forward
    ours = np.asarray(ops.wta_scale(jnp.array(f), 1e-4))
    ft = torch.tensor(f, requires_grad=True)
    out_t = nl.WTA_scale.apply(ft, 1e-4)
    np.testing.assert_allclose(ours, out_t.detach().numpy(), atol=1e-6)

    # backward
    grad_ours = np.asarray(
        jax.grad(lambda x: jnp.sum(ops.wta_scale(x, 1e-4) * jnp.array(ct)))(
            jnp.array(f)
        )
    )
    out_t.backward(torch.tensor(ct))
    np.testing.assert_allclose(grad_ours, ft.grad.numpy(), atol=1e-6)
