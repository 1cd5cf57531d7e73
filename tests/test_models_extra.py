"""Parity for the off-live-path models: vgg19_gray, discriminator (incl.
spectral norm power iteration and checkpoint conversion), WeightedAverage."""

import numpy as np
import jax
import jax.numpy as jnp
import torch
import torch.nn as nn

from devc_tpu.utils import convert
from tests.oracles import reference_module


def _nchw(x):
    return torch.from_numpy(np.ascontiguousarray(x.transpose(0, 3, 1, 2)))


def _nhwc(t):
    return t.detach().numpy().transpose(0, 2, 3, 1)


def _build_ref_gray_net():
    """Reconstruct the reference vgg19_gray trunk with random weights
    (the real module loads a missing .pth at import, so we only mirror its
    architecture: vgg19_gray.py:81-118)."""
    layers = []
    cfg = [
        (3, 64), (64, 64), "P",
        (64, 128), (128, 128), "P",
        (128, 256), (256, 256), (256, 256), (256, 256), "P",
        (256, 512), (512, 512), (512, 512), (512, 512), "P",
        (512, 512), (512, 512), (512, 512), (512, 512), "P",
    ]
    for item in cfg:
        if item == "P":
            layers.append(nn.MaxPool2d(2, 2, 0, ceil_mode=True))
        else:
            layers.append(nn.Conv2d(item[0], item[1], 3, 1, 1))
            layers.append(nn.ReLU())
    return nn.Sequential(*layers)


def test_vgg19_gray_parity(rng):
    from devc_tpu.models.vgg19_gray import vgg19_gray_extract

    torch.manual_seed(0)
    net = _build_ref_gray_net().eval()
    params = convert.vgg19_gray_from_torch(net.state_dict())

    # odd size exercises ceil-mode pooling
    x = (rng.rand(1, 54, 70, 3).astype(np.float32)) * 255.0
    r31, r41, r51 = vgg19_gray_extract(params, jnp.array(x))

    xt = _nchw(x)
    with torch.no_grad():
        h = net[:12](xt)      # relu3_1
        h41 = net[12:21](h)   # relu4_1
        h51 = net[21:30](h41)  # relu5_1
    np.testing.assert_allclose(np.asarray(r31), _nhwc(h), atol=2e-2, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(r41), _nhwc(h41), atol=5e-2, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(r51), _nhwc(h51), atol=2e-1, rtol=1e-3)
    # relu2_1 variant
    from devc_tpu.models.vgg19_gray import vgg19_gray_extract as ex

    r21, *_ = ex(params, jnp.array(x), include_r21=True)
    with torch.no_grad():
        h21 = net[:7](xt)
    np.testing.assert_allclose(np.asarray(r21), _nhwc(h21), atol=5e-3, rtol=1e-3)


def test_discriminator_parity(rng):
    gm = reference_module("models.GAN_models")
    from devc_tpu.models.discriminator import discriminator_apply

    torch.manual_seed(1)
    ref = gm.Discriminator_x64(in_size=6, ndf=64).eval()
    params, sn_state = convert.discriminator_from_torch(ref.state_dict())
    params = jax.tree.map(jnp.asarray, params)
    sn_state = jax.tree.map(jnp.asarray, sn_state)

    x = rng.randn(1, 192, 384, 6).astype(np.float32)
    logit, feat4, _new_sn = discriminator_apply(params, sn_state, jnp.array(x))
    with torch.no_grad():
        logit_t, feat4_t = ref(_nchw(x))
    np.testing.assert_allclose(
        np.asarray(logit), logit_t.numpy(), atol=2e-3, rtol=1e-2
    )
    np.testing.assert_allclose(
        np.asarray(feat4), _nhwc(feat4_t), atol=2e-2, rtol=1e-2
    )


def test_weighted_average_plain_parity(rng):
    nl = reference_module("models.NonlocalNet")
    from devc_tpu.train.losses import weighted_average

    lab = rng.randn(2, 8, 9, 3).astype(np.float32) * 20
    ours = np.asarray(weighted_average(jnp.array(lab), 3, alpha=1.0))
    with torch.no_grad():
        theirs = nl.WeightedAverage()(_nchw(lab), patch_size=3, alpha=1).numpy()
    np.testing.assert_allclose(ours, theirs.transpose(0, 2, 3, 1), atol=1e-4)
