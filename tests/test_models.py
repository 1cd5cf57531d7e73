"""Numerical parity of VGG19 / WarpNet / ColorVidNet / frame composition
against the reference PyTorch modules (random weights, converted with
devc_tpu.utils.convert — so these tests also cover the checkpoint converter).
"""

import numpy as np
import jax
import jax.numpy as jnp
import torch

from devc_tpu.models import (
    vgg19_extract,
    warpnet_apply,
    colorvidnet_apply,
)
from devc_tpu.utils import convert
from tests.oracles import reference_module


def _nchw(x_nhwc):
    return torch.from_numpy(np.ascontiguousarray(x_nhwc.transpose(0, 3, 1, 2)))


def _nhwc(x_torch):
    return x_torch.detach().numpy().transpose(0, 2, 3, 1)


def _feature_normalize_np(x_nhwc):
    n = np.linalg.norm(x_nhwc, axis=-1, keepdims=True) + np.finfo(np.float64).eps
    return (x_nhwc / n).astype(np.float32)


def test_vgg19_parity(rng):
    nl = reference_module("models.NonlocalNet")
    torch.manual_seed(0)
    ref = nl.VGG19_pytorch().eval()
    params = convert.vgg19_from_torch(ref.state_dict())

    rgb = rng.rand(1, 64, 64, 3).astype(np.float32)
    keys = ["r12", "r22", "r32", "r42", "r52"]
    ours = vgg19_extract(params, jnp.array(rgb), keys)
    with torch.no_grad():
        theirs = ref(_nchw(rgb), keys, preprocess=True)
    for o, t, k in zip(ours, theirs, keys):
        np.testing.assert_allclose(
            np.asarray(o), _nhwc(t), atol=2e-3, rtol=1e-3, err_msg=k
        )


def _random_warpnet_inputs(rng, b, h, w):
    """Random normalized pyramid features with the right shapes."""
    shapes = {
        "2_1": (b, h // 2, w // 2, 128),
        "3_1": (b, h // 4, w // 4, 256),
        "4_1": (b, h // 8, w // 8, 512),
        "5_1": (b, h // 16, w // 16, 512),
    }
    feats = {k: _feature_normalize_np(rng.randn(*s).astype(np.float32))
             for k, s in shapes.items()}
    return feats


def _warpnet_parity(h, w, temperature):
    nl = reference_module("models.NonlocalNet")
    rng = np.random.RandomState(42)
    torch.manual_seed(1)
    ref = nl.WarpNet(1).eval()
    params = convert.warpnet_from_torch(ref.state_dict())

    b = 1
    b_lab = (rng.rand(b, h, w, 3).astype(np.float32) - 0.5) * 100
    a_f = _random_warpnet_inputs(rng, b, h, w)
    b_f = _random_warpnet_inputs(rng, b, h, w)

    warped, sim = warpnet_apply(
        params,
        jnp.array(b_lab),
        tuple(jnp.array(a_f[k]) for k in ("2_1", "3_1", "4_1", "5_1")),
        tuple(jnp.array(b_f[k]) for k in ("2_1", "3_1", "4_1", "5_1")),
        temperature=temperature,
        use_pallas=False,
    )
    with torch.no_grad():
        warped_t, sim_t = ref(
            _nchw(b_lab),
            _nchw(a_f["2_1"]), _nchw(a_f["3_1"]), _nchw(a_f["4_1"]), _nchw(a_f["5_1"]),
            _nchw(b_f["2_1"]), _nchw(b_f["3_1"]), _nchw(b_f["4_1"]), _nchw(b_f["5_1"]),
            temperature=temperature,
        )
    np.testing.assert_allclose(np.asarray(sim), _nhwc(sim_t), atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(warped), _nhwc(warped_t), atol=5e-3, rtol=1e-3)


def test_warpnet_parity():
    _warpnet_parity(64, 96, 0.005)


def test_warpnet_parity_pad_path_hard_temperature():
    # H=72: relu5_1 floor-pools to H/16=4 -> pyramid gives 16, needs the
    # replicate pad to reach H/4=18 (reference NonlocalNet.py:461-463).
    # Also exercises the T=1e-10 hard-argmax warp (reference test.py:94).
    _warpnet_parity(72, 96, 1e-10)


def test_colorvidnet_parity(rng):
    cv = reference_module("models.ColorVidNet")
    torch.manual_seed(2)
    ref = cv.ColorVidNet(7).eval()
    params = convert.colorvidnet_from_torch(ref.state_dict())

    x = rng.randn(2, 32, 48, 7).astype(np.float32) * 20
    ours = np.asarray(colorvidnet_apply(params, jnp.array(x)))
    with torch.no_grad():
        theirs = _nhwc(ref(_nchw(x)))
    # 3e-3 on a ±128 output (≈2e-5 relative): the s2b instance-norm stats
    # (ops/dilated.py) reassociate the fp32 spatial sums vs torch's plane
    # reduction; worst observed element 2.2e-3
    np.testing.assert_allclose(ours, theirs, atol=3e-3, rtol=1e-3)


def test_colorvidnet_s2b_matches_direct_dilated(rng):
    """The space-to-batch execution of the dilation-2 stages 5-6
    (ops/dilated.py) must match the direct rhs_dilation lowering exactly —
    including ODD conv5 grids, where the parity sub-grids are zero-padded
    and re-masked (the reference's 216-row input reaches conv5 at 27 rows:
    models/ColorVidNet.py:52-75)."""
    import devc_tpu.models.colorvidnet as cvn

    params = cvn.colorvidnet_init(jax.random.PRNGKey(4))
    # conv5 grids: (4,4) even/even, (3,5) odd/odd, (7,5) odd/odd asym
    for h, w in [(32, 32), (24, 40), (56, 40)]:
        x = jnp.asarray(rng.randn(2, h, w, 7).astype(np.float32) * 20)
        old = cvn._DILATED_S2B
        try:
            cvn._DILATED_S2B = True
            y_s2b = jax.jit(cvn.colorvidnet_apply)(params, x)
            cvn._DILATED_S2B = False
            y_dir = jax.jit(cvn.colorvidnet_apply)(params, x)
        finally:
            cvn._DILATED_S2B = old
        np.testing.assert_allclose(
            np.asarray(y_s2b), np.asarray(y_dir), atol=1e-4, rtol=1e-5
        )


def test_colorvidnet_enc1_strips_matches_direct(rng):
    """Height-strip-batched stage-1 convs (ops/strips.py) must match the
    direct batch-1 chain: interior band halos carry the real neighbour
    rows; out-of-image halo rows are re-zeroed per conv level, which is
    exactly chained SAME-conv zero padding (reference ColorVidNet.py:
    10-11,96-99). Covers bands taller and shorter than the halo reach
    and a non-multiple-of-strips guard."""
    import devc_tpu.models.colorvidnet as cvn

    params = cvn.colorvidnet_init(jax.random.PRNGKey(5))
    for h, w, s in [(32, 32, 8), (24, 40, 4), (56, 40, 8), (48, 64, 16)]:
        x = jnp.asarray(rng.randn(1, h, w, 7).astype(np.float32) * 20)
        y_strips = jax.jit(
            lambda p, x: cvn.colorvidnet_apply(p, x, enc1_strips=s)
        )(params, x)
        y_direct = jax.jit(cvn.colorvidnet_apply)(params, x)
        np.testing.assert_allclose(
            np.asarray(y_strips), np.asarray(y_direct), atol=1e-4, rtol=1e-5
        )
    # stage-1 chain alone, tight tolerance (same conv shapes, no norm)
    x = jnp.asarray(rng.randn(1, 40, 48, 7).astype(np.float32) * 20)
    c_s = cvn._enc1_strips(params, x, 8)
    c_d = cvn._enc1_direct(params, x)
    np.testing.assert_allclose(
        np.asarray(c_s), np.asarray(c_d), atol=1e-5, rtol=1e-6
    )
    # batch > 1 inputs fall back to the direct chain (strips assume B=1)
    xb = jnp.asarray(rng.randn(2, 32, 32, 7).astype(np.float32))
    yb = cvn.colorvidnet_apply(params, xb, enc1_strips=8)
    np.testing.assert_allclose(
        np.asarray(yb), np.asarray(cvn.colorvidnet_apply(params, xb)),
        atol=0, rtol=0,
    )


def test_colorvidnet_fused_down_matches_direct(rng):
    """Folding each *_ss strided downsample into the following 3x3 conv
    (stride-2 rhs-dilation-2 on the full plane, per-channel scale folded
    into the weights — models/colorvidnet.py::_down_into) must reproduce
    the reference boundary `conv(w_ss * n[::2, ::2])` (reference
    ColorVidNet.py:96-113) up to fp association of the weight scale.
    Covers odd decimated extents (H/2, W/2 not multiples of 8) and
    batch > 1 (the fold is batch-agnostic, unlike enc1_strips)."""
    import devc_tpu.models.colorvidnet as cvn

    params = cvn.colorvidnet_init(jax.random.PRNGKey(7))
    for b, h, w in [(1, 32, 32), (1, 24, 40), (2, 48, 64)]:
        x = jnp.asarray(rng.randn(b, h, w, 7).astype(np.float32) * 20)
        y_fused = jax.jit(
            lambda p, x: cvn.colorvidnet_apply(p, x, fused_down=True)
        )(params, x)
        y_direct = jax.jit(
            lambda p, x: cvn.colorvidnet_apply(p, x, fused_down=False)
        )(params, x)
        np.testing.assert_allclose(
            np.asarray(y_fused), np.asarray(y_direct), atol=1e-3, rtol=1e-5
        )


def test_frame_colorization_parity(rng):
    """End-to-end single-frame parity: VGG -> WarpNet -> ColorVidNet."""
    nl = reference_module("models.NonlocalNet")
    cv = reference_module("models.ColorVidNet")
    fc = reference_module("models.FrameColor")
    from devc_tpu.pipeline.frame import frame_colorization, extract_reference_features

    torch.manual_seed(3)
    vgg_t = nl.VGG19_pytorch().eval()
    warp_t = nl.WarpNet(1).eval()
    color_t = cv.ColorVidNet(7).eval()

    params = {
        "vgg": convert.vgg19_from_torch(vgg_t.state_dict()),
        "warpnet": convert.warpnet_from_torch(warp_t.state_dict()),
        "colorvid": convert.colorvidnet_from_torch(color_t.state_dict()),
    }

    h, w = 64, 64
    a_lab = np.concatenate(
        [
            (rng.rand(1, h, w, 1).astype(np.float32) - 0.5) * 90,
            (rng.rand(1, h, w, 2).astype(np.float32) - 0.5) * 180,
        ],
        axis=-1,
    )
    b_lab = np.concatenate(
        [
            (rng.rand(1, h, w, 1).astype(np.float32) - 0.5) * 90,
            (rng.rand(1, h, w, 2).astype(np.float32) - 0.5) * 180,
        ],
        axis=-1,
    )
    last_lab = np.zeros((1, h, w, 3), np.float32)

    features_b = extract_reference_features(params["vgg"], jnp.array(b_lab))
    pred_ab, warped_lab, sim, _ = frame_colorization(
        params,
        jnp.array(a_lab),
        jnp.array(b_lab),
        jnp.array(last_lab),
        features_b,
        temperature=0.01,
        joint_training=False,
        use_pallas=False,
    )

    util = reference_module("utils.util")
    with torch.no_grad():
        b_lab_t = _nchw(b_lab)
        b_rgb_t = util.tensor_lab2rgb(
            torch.cat([util.uncenter_l(b_lab_t[:, 0:1]), b_lab_t[:, 1:3]], dim=1)
        )
        features_b_t = vgg_t(b_rgb_t, ["r12", "r22", "r32", "r42", "r52"])
        pred_t, warped_t, _feats = fc.frame_colorization(
            _nchw(a_lab),
            b_lab_t,
            _nchw(last_lab),
            features_b_t,
            vgg_t,
            warp_t,
            color_t,
            joint_training=False,
            temperature=0.01,
        )
    # ab is in [-128, 128]; 0.1 absolute = 0.04% of range. Residual error is
    # accumulated fp noise through 20 convs amplified by tanh*128.
    np.testing.assert_allclose(
        np.asarray(pred_ab), _nhwc(pred_t), atol=1e-1
    )
    np.testing.assert_allclose(
        np.asarray(warped_lab), _nhwc(warped_t), atol=1e-2, rtol=1e-3
    )
