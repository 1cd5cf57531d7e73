"""WarpNet — the dense-correspondence network.

Functional re-design of the reference WarpNet (models/NonlocalNet.py:355-502):
four conv+InstanceNorm+PReLU pyramids project VGG relu2_1..relu5_1 features
to 64 channels each at H/4 x W/4, three residual blocks fuse the 256-channel
concat, 1x1 theta/phi convs project to 256-d, features are spatially
mean-centered and channel-L2-normalized, and the correspondence op
(ops/correspondence.py) warps the exemplar's avg-pooled Lab onto the frame.

Returns (warped_lab, similarity_map) both upsampled x4 to image resolution,
NHWC. The N x N correlation itself lives in ops/ so the einsum oracle and
the fused Pallas kernel share this module unchanged.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from devc_tpu.ops.layers import (
    conv2d,
    conv_init,
    instance_norm,
    prelu,
    prelu_init,
    reflect_pad,
    replicate_pad,
)
from devc_tpu.ops.resize import avg_pool, upsample_nearest
from devc_tpu.ops.correspondence import correspondence_warp

FEATURE_CH = 64
INTER_CH = 256


def _pyramid_init(key, in_ch, mid_ch, dtype):
    k1, k2 = jax.random.split(key)
    return {
        "conv1": conv_init(k1, in_ch, mid_ch, 3, dtype=dtype),
        "prelu1": prelu_init(dtype),
        "conv2": conv_init(k2, mid_ch, FEATURE_CH, 3, dtype=dtype),
        "prelu2": prelu_init(dtype),
    }


def _resblock_init(key, ch, dtype):
    k1, k2 = jax.random.split(key)
    return {
        "conv1": conv_init(k1, ch, ch, 3, dtype=dtype),
        "conv2": conv_init(k2, ch, ch, 3, dtype=dtype),
        "prelu": prelu_init(dtype),  # shared by both activations in the block
    }


def warpnet_init(key, dtype=jnp.float32):
    keys = jax.random.split(key, 9)
    ch = FEATURE_CH * 4
    return {
        "layer2_1": _pyramid_init(keys[0], 128, 128, dtype),
        "layer3_1": _pyramid_init(keys[1], 256, 128, dtype),
        "layer4_1": _pyramid_init(keys[2], 512, 256, dtype),
        "layer5_1": _pyramid_init(keys[3], 512, 256, dtype),
        "res": [
            _resblock_init(keys[4], ch, dtype),
            _resblock_init(keys[5], ch, dtype),
            _resblock_init(keys[6], ch, dtype),
        ],
        "theta": conv_init(keys[7], ch, INTER_CH, 1, dtype=dtype),
        "phi": conv_init(keys[8], ch, INTER_CH, 1, dtype=dtype),
    }


def _conv_in_prelu(p_conv, p_prelu, x, stride=1):
    x = reflect_pad(x, 1)
    x = conv2d(p_conv, x, stride=stride, padding=0)
    x = instance_norm(x)
    return prelu(p_prelu, x)


def _pyramid(params, x, kind: str):
    """Project one VGG scale to 64ch at H/4 x W/4 (reference :364-410)."""
    if kind == "2_1":  # H/2 -> stride-2 second conv
        x = _conv_in_prelu(params["conv1"], params["prelu1"], x)
        x = _conv_in_prelu(params["conv2"], params["prelu2"], x, stride=2)
    elif kind == "3_1":  # already H/4
        x = _conv_in_prelu(params["conv1"], params["prelu1"], x)
        x = _conv_in_prelu(params["conv2"], params["prelu2"], x)
    elif kind == "4_1":  # H/8 -> upsample x2 at the end
        x = _conv_in_prelu(params["conv1"], params["prelu1"], x)
        x = _conv_in_prelu(params["conv2"], params["prelu2"], x)
        x = upsample_nearest(x, 2)
    elif kind == "5_1":  # H/16 -> upsample between convs and at the end
        x = _conv_in_prelu(params["conv1"], params["prelu1"], x)
        x = upsample_nearest(x, 2)
        x = _conv_in_prelu(params["conv2"], params["prelu2"], x)
        x = upsample_nearest(x, 2)
    return x


def _resblock(p, x):
    y = reflect_pad(x, 1)
    y = conv2d(p["conv1"], y, padding=0)
    y = instance_norm(y)
    y = prelu(p["prelu"], y)
    y = reflect_pad(y, 1)
    y = conv2d(p["conv2"], y, padding=0)
    y = instance_norm(y)
    return prelu(p["prelu"], y + x)


def _embed(params, feats):
    """Pyramids + resblocks + shared trunk for one image's features."""
    f2, f3, f4, f5 = feats
    p2 = _pyramid(params["layer2_1"], f2, "2_1")
    p3 = _pyramid(params["layer3_1"], f3, "3_1")
    p4 = _pyramid(params["layer4_1"], f4, "4_1")
    p5 = _pyramid(params["layer5_1"], f5, "5_1")
    if p5.shape[1] != p2.shape[1] or p5.shape[2] != p2.shape[2]:
        # replicate-pad H by 1 on both sides (reference :461-463)
        p5 = replicate_pad(p5, pad_h=(1, 1))
    x = jnp.concatenate([p2, p3, p4, p5], axis=-1)
    for rb in params["res"]:
        x = _resblock(rb, x)
    return x


def _center_normalize(feat_flat, eps=2.220446049250313e-16):
    """Spatial mean-centering + channel L2 norm (reference :468-476).

    feat_flat: [B, N, C]. Mean over N per channel; L2 over C per position.
    Statistics in float32 (bf16 reductions over N~20k positions lose the
    mantissa); output keeps the input dtype.
    """
    ff = feat_flat.astype(jnp.float32)
    feat = ff - jnp.mean(ff, axis=1, keepdims=True)
    norm = jnp.linalg.norm(feat, ord=2, axis=-1, keepdims=True) + eps
    return (feat / norm).astype(feat_flat.dtype)


def embed_queries(params, a_feats, hw):
    """Frame-side embedding -> centered/normalized theta [B, N, C]."""
    fh, fw = hw[0] // 4, hw[1] // 4
    a_emb = _embed(params, a_feats)
    theta = conv2d(params["theta"], a_emb)
    b = theta.shape[0]
    return _center_normalize(theta.reshape(b, fh * fw, INTER_CH))


def embed_keys(params, b_lab, b_feats):
    """Exemplar-side embedding -> (phi [B,N,C], values [B,N,3]).

    Clip-constant: the reference recomputes this every frame
    (NonlocalNet.py:452-458 runs the pyramids on B each forward); here it is
    computed once per exemplar and carried like features_B (test.py:61-66).
    """
    B, H, W, _ = b_lab.shape
    fh, fw = H // 4, W // 4
    b_emb = _embed(params, b_feats)
    phi = conv2d(params["phi"], b_emb)
    phi = _center_normalize(phi.reshape(B, fh * fw, INTER_CH))
    values = avg_pool(b_lab, 4).reshape(B, fh * fw, 3)
    return phi, values


def warp_with_keys(
    params,
    theta,
    phi,
    values,
    out_hw,
    temperature: float = 0.001 * 5,
    wta_scale_weight: float = 1.0,
    use_pallas: bool | None = None,
    out_dtype=jnp.float32,
    differentiable: bool = False,
    corr_sharding=None,
):
    """Correspondence + upsample given precomputed embeddings.

    corr_sharding: optional (mesh, axis_name, kind) with kind in
    {"rows", "keys"} — runs the N x N correspondence model-parallel over
    the mesh axis (rows: query rows sharded, no collectives; keys:
    context-parallel with an exact online-softmax psum/pmax combine). See
    devc_tpu/parallel/sharded_corr.py. Inference-only (wta off).
    """
    B = theta.shape[0]
    fh, fw = out_hw[0] // 4, out_hw[1] // 4
    if corr_sharding is not None:
        assert wta_scale_weight == 1.0 and not differentiable, (
            "sharded correspondence is the inference fast path"
        )
        from devc_tpu.parallel.sharded_corr import (
            correspondence_warp_key_sharded,
            correspondence_warp_sharded,
        )

        mesh, axis, kind = corr_sharding
        fn = (
            correspondence_warp_sharded
            if kind == "rows"
            else correspondence_warp_key_sharded
        )
        warped, similarity = fn(
            theta, phi, values, mesh,
            temperature=temperature, axis=axis, use_pallas=use_pallas,
        )
    else:
        warped, similarity = correspondence_warp(
            theta, phi, values,
            temperature=temperature,
            wta_scale_weight=wta_scale_weight,
            use_pallas=use_pallas,
            differentiable=differentiable,
        )
    warped = warped.reshape(B, fh, fw, 3)
    similarity = similarity.reshape(B, fh, fw, 1)
    return (
        upsample_nearest(warped, 4).astype(out_dtype),
        upsample_nearest(similarity, 4).astype(out_dtype),
    )


def warpnet_apply(
    params,
    b_lab,
    a_feats,
    b_feats,
    temperature: float = 0.001 * 5,
    wta_scale_weight: float = 1.0,
    use_pallas: bool | None = None,
    differentiable: bool = False,
):
    """Warp exemplar colors onto the frame geometry.

    Args:
      params: warpnet param dict.
      b_lab: [B, H, W, 3] exemplar image in network-Lab.
      a_feats / b_feats: tuples of 4 NHWC VGG feature maps
        (relu2_1, relu3_1, relu4_1, relu5_1), already feature_normalized
        (reference models/FrameColor.py:16-23).
      temperature: correspondence softmax temperature.
      wta_scale_weight: winner-take-all scale (1.0 = off).
      use_pallas: force (True/False) or auto-select (None) the fused kernel.

    Returns:
      warped_lab: [B, H, W, 3], similarity: [B, H, W, 1].
    """
    H, W = b_lab.shape[1], b_lab.shape[2]
    theta = embed_queries(params, a_feats, (H, W))
    phi, values = embed_keys(params, b_lab, b_feats)
    return warp_with_keys(
        params, theta, phi, values, (H, W),
        temperature=temperature,
        wta_scale_weight=wta_scale_weight,
        use_pallas=use_pallas,
        out_dtype=b_lab.dtype,
        differentiable=differentiable,
    )
