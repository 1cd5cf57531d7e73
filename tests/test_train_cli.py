"""End-to-end training CLI smoke: synthetic dataset on disk -> 2 steps ->
checkpoint written. Exercises dataset parsing, the prefetch loader, the
jitted step, metrics logging and orbax checkpointing through cli.train."""

import json
import os

import numpy as np
import pytest
from PIL import Image


def _make_imagenet_dataset(root, n_classes=1, n_images=3):
    rng = np.random.RandomState(0)
    for ci in range(n_classes):
        d = root / f"class{ci}"
        (d / "input").mkdir(parents=True)
        names = []
        for i in range(n_images):
            name = f"img{i}"
            arr = (rng.rand(80, 100, 3) * 255).astype(np.uint8)
            Image.fromarray(arr).save(d / "input" / f"{name}.JPEG")
            names.append(name)
        with open(d / "pairs.txt", "w") as f:
            for i in range(n_images - 1):
                f.write(f"{names[i]}.JPEG {names[i+1]}.JPEG 1.0\n")
    return root


def test_train_cli_two_steps(tmp_path):
    from cli.train import main

    data_root = _make_imagenet_dataset(tmp_path / "data")
    ckpt_dir = tmp_path / "ckpt"
    log_dir = tmp_path / "runs"

    main([
        "--data_root_imagenet", str(data_root),
        "--batch_size", "2",
        "--image_size", "64", "64",
        "--max_steps", "2",
        "--workers", "2",
        "--checkpoint_dir", str(ckpt_dir),
        "--checkpoint_step", "1",
        "--log_dir", str(log_dir),
        "--print_step", "1",
        "--tb_log_step", "1",
        "--vgg_ckpt", "/nonexistent/forces-random-vgg.pth",
    ])

    # metrics were logged
    metrics_file = log_dir / "metrics.jsonl"
    assert metrics_file.exists()
    lines = [json.loads(l) for l in open(metrics_file)]
    assert any("total_loss" in l for l in lines)
    for l in lines:
        if "total_loss" in l:
            assert np.isfinite(l["total_loss"])

    # a checkpoint was written and options dumped
    assert (ckpt_dir / "opt.txt").exists()
    steps = [d for d in os.listdir(ckpt_dir) if d.isdigit()]
    assert steps, f"no checkpoint dirs in {os.listdir(ckpt_dir)}"

    # ---- resume (reference --resume, train.py:322-333) ----
    main([
        "--data_root_imagenet", str(data_root),
        "--batch_size", "2",
        "--image_size", "64", "64",
        "--max_steps", "2",
        "--workers", "2",
        "--checkpoint_dir", str(ckpt_dir),
        "--checkpoint_step", "1",
        "--log_dir", str(log_dir),
        "--print_step", "1",
        "--vgg_ckpt", "/nonexistent/forces-random-vgg.pth",
        "--resume",
    ])
    lines = [json.loads(l) for l in open(metrics_file)]
    max_step = max(l["step"] for l in lines)
    assert max_step >= 3, f"resume did not continue past step 2 (max {max_step})"


def test_boolean_optional_flags_reach_config(tmp_path, monkeypatch):
    """--no-permute_data / --no-with_bad must round-trip into TrainConfig /
    the dataset — the reference's `type=bool` flags are truthy for any
    string (SURVEY §5); VERDICT r3 #7 regression guard."""
    import devc_tpu.train.loop as loop_mod
    from cli.train import main

    data_root = _make_imagenet_dataset(tmp_path / "data")

    captured = {}
    real_make = loop_mod.make_train_step

    class _Abort(Exception):
        pass

    def spy(tx_g, tx_d, vgg_params, cfg, **kw):
        captured["cfg"] = cfg
        raise _Abort()

    monkeypatch.setattr(loop_mod, "make_train_step", spy)
    args = [
        "--data_root_imagenet", str(data_root),
        "--batch_size", "2", "--image_size", "64", "64",
        "--max_steps", "1", "--workers", "1",
        "--checkpoint_dir", str(tmp_path / "ckpt"),
        "--log_dir", str(tmp_path / "runs"),
        "--vgg_ckpt", "/nonexistent/forces-random-vgg.pth",
    ]
    with pytest.raises(_Abort):
        main(args + ["--no-permute_data"])
    assert captured["cfg"].permute_data is False

    with pytest.raises(_Abort):
        main(args)
    assert captured["cfg"].permute_data is True
    monkeypatch.setattr(loop_mod, "make_train_step", real_make)


def test_resume_refuses_vgg_provenance_mismatch(tmp_path):
    """--resume with a different VGG provenance than the checkpoint records
    must abort instead of silently rewriting run_metadata.json (ADVICE r3
    medium)."""
    import json as _json

    from cli.train import main

    data_root = _make_imagenet_dataset(tmp_path / "data")
    ckpt_dir = tmp_path / "ckpt"
    args = [
        "--data_root_imagenet", str(data_root),
        "--batch_size", "2", "--image_size", "64", "64",
        "--max_steps", "1", "--workers", "1",
        "--checkpoint_dir", str(ckpt_dir),
        "--checkpoint_step", "1",
        "--log_dir", str(tmp_path / "runs"),
        "--vgg_ckpt", "/nonexistent/forces-random-vgg.pth",
    ]
    main(args)
    meta_path = ckpt_dir / "run_metadata.json"
    assert _json.load(open(meta_path))["vgg_source"] == "random:seed1"

    # simulate: checkpoint was trained against torch VGG weights
    with open(meta_path, "w") as f:
        _json.dump({"vgg_source": "torch:vgg19_conv.pth"}, f)

    with pytest.raises(SystemExit, match="vgg_source"):
        main(args + ["--resume"])
    # metadata untouched by the refused resume
    assert _json.load(open(meta_path))["vgg_source"] == "torch:vgg19_conv.pth"

    # explicit override proceeds and rewrites provenance
    main(args + ["--resume", "--allow_vgg_mismatch", "--max_steps", "2"])
    assert _json.load(open(meta_path))["vgg_source"] == "random:seed1"
