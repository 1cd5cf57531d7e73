"""Round-trip tests for the EXPORT direction of utils/convert.py.

The import direction (reference .pth -> pytree) is exercised by every
parity test; these cover the inverse (*_to_torch / save_reference_
checkpoints, the cli.export surface): a pytree exported to the reference
state_dict layout must (a) strict-load into the reference's own torch
modules (key-set exactness — reference test.py:150-159 is a strict load),
(b) survive the round trip bit-exactly, and (c) drive the reference
module to the same outputs as ours (forward parity through the export).
"""

import numpy as np
import jax
import jax.numpy as jnp
import torch

from devc_tpu.utils import convert
from devc_tpu.utils.init import (
    host_colorvidnet_init,
    host_pipeline_params,
    host_vgg19_init,
    host_warpnet_init,
)
from tests.oracles import reference_module


def _tree_equal(a, b):
    la = jax.tree.leaves(a)
    lb = jax.tree.leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_warpnet_export_strict_load_and_roundtrip():
    nl = reference_module("models.NonlocalNet")
    params = host_warpnet_init(seed=3)
    sd = convert.warpnet_to_torch(params)
    ref = nl.WarpNet(1)
    ref.load_state_dict(sd, strict=True)  # key-set must match exactly
    _tree_equal(params, convert.warpnet_from_torch(ref.state_dict()))


def test_colorvidnet_export_strict_load_roundtrip_and_forward_parity():
    cv = reference_module("models.ColorVidNet")
    from devc_tpu.models.colorvidnet import colorvidnet_apply

    params = host_colorvidnet_init(seed=4)
    sd = convert.colorvidnet_to_torch(params)
    ref = cv.ColorVidNet(7).eval()
    ref.load_state_dict(sd, strict=True)
    _tree_equal(params, convert.colorvidnet_from_torch(ref.state_dict()))

    rng = np.random.RandomState(0)
    x = rng.randn(1, 32, 64, 7).astype(np.float32)
    ours = np.asarray(colorvidnet_apply(
        jax.tree.map(jnp.asarray, params), jnp.array(x)))
    with torch.no_grad():
        theirs = ref(
            torch.from_numpy(np.ascontiguousarray(x.transpose(0, 3, 1, 2)))
        ).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(ours, theirs, atol=2e-3, rtol=1e-3)


def test_vgg19_export_strict_load_and_roundtrip():
    nl = reference_module("models.NonlocalNet")
    params = host_vgg19_init(seed=5)
    sd = convert.vgg19_to_torch(params)
    ref = nl.VGG19_pytorch()
    ref.load_state_dict(sd, strict=True)
    _tree_equal(params, convert.vgg19_from_torch(ref.state_dict()))


def test_discriminator_export_strict_load_and_roundtrip():
    gm = reference_module("models.GAN_models")
    from devc_tpu.models.discriminator import discriminator_init

    params, sn_state = discriminator_init(jax.random.PRNGKey(6))
    sd = convert.discriminator_to_torch(params, sn_state)
    ref = gm.Discriminator_x64(in_size=6, ndf=64)
    ref.load_state_dict(sd, strict=True)
    p2, s2 = convert.discriminator_from_torch(ref.state_dict())
    _tree_equal(params, p2)
    _tree_equal(sn_state, s2)


def test_cli_export_end_to_end(tmp_path):
    """cli.export: orbax train checkpoint -> reference .pth files that
    strict-load into the reference modules (the deploy-to-reference
    path; reference test.py:150-159 / train.py:174-226)."""
    import orbax.checkpoint as ocp

    from cli.export import main as export_main
    from devc_tpu.models.discriminator import discriminator_init

    params = host_pipeline_params(seed=8)
    params_d, sn_state = discriminator_init(jax.random.PRNGKey(9))
    state = {
        "step": 42,
        "params_g": {"warpnet": params["warpnet"],
                     "colorvid": params["colorvid"]},
        "params_d": jax.tree.map(np.asarray, params_d),
        "sn_state": jax.tree.map(np.asarray, sn_state),
    }
    ckpt_dir = str(tmp_path / "ckpt")
    mgr = ocp.CheckpointManager(
        ckpt_dir, options=ocp.CheckpointManagerOptions(create=True))
    mgr.save(42, args=ocp.args.StandardSave(state))
    mgr.wait_until_finished()
    mgr.close()

    out = str(tmp_path / "exported")
    assert export_main(["--train_ckpt", ckpt_dir, "--out", out,
                        "--discriminator"]) == 0

    nl = reference_module("models.NonlocalNet")
    cv = reference_module("models.ColorVidNet")
    gm = reference_module("models.GAN_models")
    nl.WarpNet(1).load_state_dict(
        convert.load_torch_state_dict(f"{out}/nonlocal_net_iter_42.pth"),
        strict=True)
    cv.ColorVidNet(7).load_state_dict(
        convert.load_torch_state_dict(f"{out}/colornet_iter_42.pth"),
        strict=True)
    gm.Discriminator_x64(in_size=6, ndf=64).load_state_dict(
        convert.load_torch_state_dict(f"{out}/discriminator_iter_42.pth"),
        strict=True)


def test_save_reference_checkpoints_layout(tmp_path):
    params = host_pipeline_params(seed=7)
    params_g = {"warpnet": params["warpnet"], "colorvid": params["colorvid"]}
    paths = convert.save_reference_checkpoints(
        params_g, str(tmp_path), iteration=76000)
    names = sorted(p.split("/")[-1] for p in paths)
    assert names == ["colornet_iter_76000.pth", "nonlocal_net_iter_76000.pth"]
    # reload through the import direction used on real reference ckpts
    warp = convert.warpnet_from_torch(convert.load_torch_state_dict(paths[0]))
    color = convert.colorvidnet_from_torch(
        convert.load_torch_state_dict(paths[1]))
    _tree_equal(params_g["warpnet"], warp)
    _tree_equal(params_g["colorvid"], color)
