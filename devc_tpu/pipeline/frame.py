"""Single-frame colorization composition (pure functions).

Re-designs models/FrameColor.py:5-67 of the reference as pure jittable
functions over a params pytree:

  params = {"vgg": ..., "warpnet": ..., "colorvid": ...}

All tensors are NHWC network-Lab (L centered by -50).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from devc_tpu import colorspace as cs
from devc_tpu.models.vgg19 import vgg19_extract
from devc_tpu.models.warpnet import warpnet_apply
from devc_tpu.models.colorvidnet import colorvidnet_apply

# VGG taps used throughout the live path (reference FrameColor.py:8-10)
FEATURE_TAPS = ("r12", "r22", "r32", "r42", "r52")


def extract_reference_features(vgg_params, ref_lab):
    """Exemplar VGG features, computed once per clip (reference test.py:61-66).

    ref_lab: [B, H, W, 3] network-Lab exemplar.
    Returns tuple of 5 NHWC feature maps (r12, r22, r32, r42, r52).
    """
    ref_rgb = cs.lab_centered_to_rgb(ref_lab)
    return tuple(vgg19_extract(vgg_params, ref_rgb, FEATURE_TAPS))


def prepare_reference(params, ref_lab):
    """Full clip-constant exemplar state: VGG features + WarpNet key
    embedding (phi, values).

    The reference recomputes the exemplar's half of the correspondence
    network every frame; it only depends on the exemplar, so at inference
    we compute it once and carry it (saving ~half of WarpNet per frame).
    Returns dict(features, phi, values).
    """
    from devc_tpu.models.warpnet import embed_keys

    features_b = extract_reference_features(params["vgg"], ref_lab)
    b_n = tuple(cs.feature_normalize(f) for f in features_b[1:])
    phi, values = embed_keys(params["warpnet"], ref_lab, b_n)
    return {"features": features_b, "phi": phi, "values": values}


def warp_color(
    params,
    a_l,
    b_lab,
    features_b,
    temperature: float = 0.01,
    use_pallas: bool | None = None,
    ref_embedding=None,
    differentiable: bool = False,
    corr_sharding=None,
):
    """Warp exemplar color onto the gray frame (reference FrameColor.py:5-38).

    a_l: [B, H, W, 1] centered luminance of the frame.
    b_lab: [B, H, W, 3] exemplar network-Lab.
    features_b: 5-tuple from extract_reference_features.
    ref_embedding: optional (phi, values) from prepare_reference — skips
      recomputing the exemplar half of WarpNet (inference fast path).

    Returns (warped_lab [B,H,W,3], similarity [B,H,W,1], features_a 5-tuple).
    VGG features of the gray frame are non-differentiable (frozen extractor,
    no_grad in the reference) — wrapped in stop_gradient.
    """
    a_rgb = cs.gray_to_rgb(a_l)
    feats_a = vgg19_extract(params["vgg"], a_rgb, FEATURE_TAPS)
    feats_a = tuple(jax.lax.stop_gradient(f) for f in feats_a)

    # channel-L2 normalization of scales 2_1..5_1 (FrameColor.py:16-23)
    a_n = tuple(cs.feature_normalize(f) for f in feats_a[1:])

    if ref_embedding is not None:
        from devc_tpu.models.warpnet import embed_queries, warp_with_keys

        hw = (a_l.shape[1], a_l.shape[2])
        theta = embed_queries(params["warpnet"], a_n, hw)
        phi, values = ref_embedding
        warped_lab, similarity = warp_with_keys(
            params["warpnet"], theta, phi, values, hw,
            temperature=temperature, use_pallas=use_pallas,
            out_dtype=a_l.dtype, differentiable=differentiable,
            corr_sharding=corr_sharding,
        )
    else:
        b_n = tuple(
            cs.feature_normalize(jax.lax.stop_gradient(f))
            for f in features_b[1:]
        )
        warped_lab, similarity = warpnet_apply(
            params["warpnet"],
            b_lab,
            a_n,
            b_n,
            temperature=temperature,
            use_pallas=use_pallas,
            differentiable=differentiable,
        )
    return warped_lab, similarity, feats_a


def frame_colorization(
    params,
    a_lab,
    b_lab,
    a_last_lab,
    features_b,
    temperature: float = 0.01,
    luminance_noise: float = 0.0,
    noise_key=None,
    joint_training: bool = True,
    use_pallas: bool | None = None,
    ref_embedding=None,
    corr_sharding=None,
):
    """Colorize one frame (reference FrameColor.py:41-67).

    a_lab: [B, H, W, 3] current frame network-Lab (only L is used).
    b_lab: exemplar network-Lab.
    a_last_lab: [B, H, W, 3] previous frame's predicted network-Lab
      (zeros for the first frame, reference test.py:80).
    features_b: exemplar VGG features.
    luminance_noise/noise_key: train-time L noise (reference :56-57).
    joint_training: when False, the warp branch output is stop_gradient'ed
      (reference gates grads with torch.autograd.set_grad_enabled).

    Returns (pred_ab [B,H,W,2], warped_lab, similarity, features_a).
    """
    a_l = a_lab[..., 0:1]
    if luminance_noise and noise_key is not None:
        a_l = a_l + jax.random.normal(noise_key, a_l.shape, a_l.dtype) * (
            luminance_noise
        )

    warped_lab, similarity, feats_a = warp_color(
        params, a_l, b_lab, features_b, temperature=temperature,
        use_pallas=use_pallas, ref_embedding=ref_embedding,
        differentiable=joint_training, corr_sharding=corr_sharding,
    )
    if not joint_training:
        warped_lab = jax.lax.stop_gradient(warped_lab)
        similarity = jax.lax.stop_gradient(similarity)

    color_input = jnp.concatenate(
        [a_l, warped_lab[..., 1:3], similarity, a_last_lab], axis=-1
    )
    pred_ab = colorvidnet_apply(params["colorvid"], color_input)
    return pred_ab, warped_lab, similarity, feats_a
