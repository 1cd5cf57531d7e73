"""Convert reference PyTorch checkpoints into devc_tpu param pytrees.

The reference ships three torch state_dicts (test.py:150-159):
  data/vgg19_conv.pth                      -> vgg19 params
  checkpoints/.../nonlocal_net_iter_*.pth  -> warpnet params
  checkpoints/.../colornet_iter_*.pth      -> colorvidnet params

Key mapping is mechanical: torch OIHW conv weights become HWIO; PReLU
weights stay 1-vectors. torch is only needed when converting (lazy import),
never on the TPU compute path.
"""

from __future__ import annotations

import numpy as np


def _np(t):
    import torch

    if isinstance(t, torch.Tensor):
        return t.detach().cpu().numpy()
    return np.asarray(t)


def conv_from_torch(sd, prefix: str, bias: bool = True):
    w = _np(sd[prefix + ".weight"]).transpose(2, 3, 1, 0)  # OIHW -> HWIO
    p = {"w": w}
    if bias and prefix + ".bias" in sd:
        p["b"] = _np(sd[prefix + ".bias"])
    return p


def prelu_from_torch(sd, prefix: str):
    return {"a": _np(sd[prefix + ".weight"]).reshape(-1)}


def vgg19_from_torch(sd):
    """Map VGG19_pytorch state_dict (conv1_1..conv5_4) to our params."""
    from devc_tpu.models.vgg19 import _CFG

    return {name: conv_from_torch(sd, name) for name, _, _ in _CFG}


def warpnet_from_torch(sd):
    """Map WarpNet state_dict to our params.

    Reference module indices within each pyramid Sequential
    (models/NonlocalNet.py:364-410): convs at positions {1, 5} except
    layer5_1 where the second conv is at 6 (Upsample sits at 4); PReLUs at
    {3, 7} except layer5_1 where the second PReLU is at 8.
    """
    def pyramid(prefix, conv2_idx, prelu2_idx):
        return {
            "conv1": conv_from_torch(sd, f"{prefix}.1"),
            "prelu1": prelu_from_torch(sd, f"{prefix}.3"),
            "conv2": conv_from_torch(sd, f"{prefix}.{conv2_idx}"),
            "prelu2": prelu_from_torch(sd, f"{prefix}.{prelu2_idx}"),
        }

    res = []
    for i in range(3):
        res.append(
            {
                "conv1": conv_from_torch(sd, f"layer.{i}.conv1"),
                "conv2": conv_from_torch(sd, f"layer.{i}.conv2"),
                "prelu": prelu_from_torch(sd, f"layer.{i}.prelu"),
            }
        )
    return {
        "layer2_1": pyramid("layer2_1", 5, 7),
        "layer3_1": pyramid("layer3_1", 5, 7),
        "layer4_1": pyramid("layer4_1", 5, 7),
        "layer5_1": pyramid("layer5_1", 6, 8),
        "res": res,
        "theta": conv_from_torch(sd, "theta"),
        "phi": conv_from_torch(sd, "phi"),
    }


def colorvidnet_from_torch(sd):
    """Map ColorVidNet state_dict to our params.

    conv1_1 is a Sequential(conv, relu, conv) -> conv1_1.0 / conv1_1.2;
    conv8_1/9_1/10_1 are Sequential(upsample, conv) -> *.1
    (reference models/ColorVidNet.py:9,81-83).
    """
    from devc_tpu.models.colorvidnet import _CONVS

    out = {}
    for name in _CONVS:
        if name == "conv1_1a":
            out[name] = conv_from_torch(sd, "conv1_1.0")
        elif name == "conv1_1b":
            out[name] = conv_from_torch(sd, "conv1_1.2")
        elif name in ("conv8_1", "conv9_1", "conv10_1"):
            out[name] = conv_from_torch(sd, f"{name}.1")
        else:
            out[name] = conv_from_torch(sd, name)
    return out


def vgg19_gray_from_torch(sd):
    """Map the torchvision-layout vgg19_gray state_dict (integer-named
    Sequential, reference models/vgg19_gray.py:81-128) to our params."""
    from devc_tpu.models.vgg19_gray import TORCHVISION_CONV_INDICES

    return {
        f"conv{i}": conv_from_torch(sd, str(idx))
        for i, idx in enumerate(TORCHVISION_CONV_INDICES)
    }


def discriminator_from_torch(sd):
    """Map Discriminator_x64 state_dict to (params, sn_state).

    SpectralNorm wraps each conv as <layer>.<i>.module.weight_{bar,u,v}
    (reference spectral_normalization.py:41-57); attention convs live at
    attention.{query,key,value}_conv.module.*; gamma at attention.gamma.
    """
    import numpy as np

    def sn_conv(prefix):
        w = _np(sd[prefix + ".module.weight_bar"]).transpose(2, 3, 1, 0)
        p = {"w": w}
        if prefix + ".module.bias" in sd:
            p["b"] = _np(sd[prefix + ".module.bias"])
        uv = {
            "u": _np(sd[prefix + ".module.weight_u"]).reshape(-1),
            "v": _np(sd[prefix + ".module.weight_v"]).reshape(-1),
        }
        return p, uv

    mapping = {
        "layer1": "layer1.0", "layer2": "layer2.0",
        "attn_q": "attention.query_conv", "attn_k": "attention.key_conv",
        "attn_v": "attention.value_conv",
        "layer3": "layer3.0", "layer4": "layer4.0",
        "layer5": "layer5.0", "layer6": "layer6.0",
        "last": "last",
    }
    params = {"gamma": _np(sd["attention.gamma"]).reshape(-1)}
    sn_state = {}
    for ours, theirs in mapping.items():
        params[ours], sn_state[ours] = sn_conv(theirs)
    return params, sn_state


def load_torch_state_dict(path: str):
    import torch

    return torch.load(path, map_location="cpu", weights_only=True)


def convert_checkpoints(vgg_path, warpnet_path, colornet_path):
    """Load the three reference checkpoints -> (vgg, warpnet, colorvid)."""
    return (
        vgg19_from_torch(load_torch_state_dict(vgg_path)),
        warpnet_from_torch(load_torch_state_dict(warpnet_path)),
        colorvidnet_from_torch(load_torch_state_dict(colornet_path)),
    )
