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


# ---------------------------------------------------------------------------
# Inverse direction: devc_tpu param pytrees -> reference torch state_dicts.
#
# Completes the train->deploy interop loop: a checkpoint trained with
# cli.train can be exported in the exact .pth layout the reference's
# test.py:150-159 / train.py:174-226 load, so reference users can consume
# models trained here (and vice versa). Every *_to_torch is the mechanical
# inverse of its *_from_torch above; tests/test_convert_roundtrip.py
# round-trips them and strict-loads the exports into the reference modules.
# ---------------------------------------------------------------------------


def conv_to_torch(p, prefix: str, out: dict):
    import torch

    # .copy(): contiguous AND writable (orbax-restored arrays are
    # read-only; torch.from_numpy warns on non-writable inputs)
    w = np.asarray(p["w"], dtype=np.float32).transpose(3, 2, 0, 1).copy()
    out[prefix + ".weight"] = torch.from_numpy(w)
    if "b" in p:
        out[prefix + ".bias"] = torch.from_numpy(
            np.asarray(p["b"], dtype=np.float32).reshape(-1).copy()
        )


def prelu_to_torch(p, prefix: str, out: dict):
    import torch

    out[prefix + ".weight"] = torch.from_numpy(
        np.asarray(p["a"], dtype=np.float32).reshape(-1).copy()
    )


def vgg19_to_torch(params) -> dict:
    out = {}
    for name, p in params.items():
        conv_to_torch(p, name, out)
    return out


def warpnet_to_torch(params) -> dict:
    """Inverse of warpnet_from_torch (key layout: NonlocalNet.py:364-410)."""
    out = {}

    def pyramid(prefix, p, conv2_idx, prelu2_idx):
        conv_to_torch(p["conv1"], f"{prefix}.1", out)
        prelu_to_torch(p["prelu1"], f"{prefix}.3", out)
        conv_to_torch(p["conv2"], f"{prefix}.{conv2_idx}", out)
        prelu_to_torch(p["prelu2"], f"{prefix}.{prelu2_idx}", out)

    pyramid("layer2_1", params["layer2_1"], 5, 7)
    pyramid("layer3_1", params["layer3_1"], 5, 7)
    pyramid("layer4_1", params["layer4_1"], 5, 7)
    pyramid("layer5_1", params["layer5_1"], 6, 8)
    for i, r in enumerate(params["res"]):
        conv_to_torch(r["conv1"], f"layer.{i}.conv1", out)
        conv_to_torch(r["conv2"], f"layer.{i}.conv2", out)
        prelu_to_torch(r["prelu"], f"layer.{i}.prelu", out)
    conv_to_torch(params["theta"], "theta", out)
    conv_to_torch(params["phi"], "phi", out)
    return out


def colorvidnet_to_torch(params) -> dict:
    """Inverse of colorvidnet_from_torch (key layout: ColorVidNet.py:9-83)."""
    out = {}
    for name, p in params.items():
        if name == "conv1_1a":
            conv_to_torch(p, "conv1_1.0", out)
        elif name == "conv1_1b":
            conv_to_torch(p, "conv1_1.2", out)
        elif name in ("conv8_1", "conv9_1", "conv10_1"):
            conv_to_torch(p, f"{name}.1", out)
        else:
            conv_to_torch(p, name, out)
    return out


def discriminator_to_torch(params, sn_state) -> dict:
    """Inverse of discriminator_from_torch: weight_bar/u/v per wrapped conv
    (spectral_normalization.py:41-57) + attention gamma."""
    import torch

    mapping = {
        "layer1": "layer1.0", "layer2": "layer2.0",
        "attn_q": "attention.query_conv", "attn_k": "attention.key_conv",
        "attn_v": "attention.value_conv",
        "layer3": "layer3.0", "layer4": "layer4.0",
        "layer5": "layer5.0", "layer6": "layer6.0",
        "last": "last",
    }
    out = {
        "attention.gamma": torch.from_numpy(
            np.asarray(params["gamma"], dtype=np.float32).reshape(-1).copy()
        )
    }
    for ours, theirs in mapping.items():
        p, uv = params[ours], sn_state[ours]
        w = np.asarray(p["w"], dtype=np.float32).transpose(3, 2, 0, 1).copy()
        out[theirs + ".module.weight_bar"] = torch.from_numpy(w)
        if "b" in p:
            out[theirs + ".module.bias"] = torch.from_numpy(
                np.asarray(p["b"], dtype=np.float32).reshape(-1).copy()
            )
        out[theirs + ".module.weight_u"] = torch.from_numpy(
            np.asarray(uv["u"], dtype=np.float32).reshape(-1).copy()
        )
        out[theirs + ".module.weight_v"] = torch.from_numpy(
            np.asarray(uv["v"], dtype=np.float32).reshape(-1).copy()
        )
    return out


def save_reference_checkpoints(params_g, out_dir: str, iteration: int = 0):
    """Write a generator pytree ({"warpnet", "colorvid"}) as the two .pth
    files the reference's test.py:150-159 loads
    (nonlocal_net_iter_N.pth / colornet_iter_N.pth). Returns the paths."""
    import os

    import torch

    os.makedirs(out_dir, exist_ok=True)
    paths = (
        os.path.join(out_dir, f"nonlocal_net_iter_{iteration}.pth"),
        os.path.join(out_dir, f"colornet_iter_{iteration}.pth"),
    )
    torch.save(warpnet_to_torch(params_g["warpnet"]), paths[0])
    torch.save(colorvidnet_to_torch(params_g["colorvid"]), paths[1])
    return paths


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
