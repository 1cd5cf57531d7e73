"""Multi-clip batched scheduler: B clip slots through one device program
must reproduce the serial per-clip driver, rotate queued jobs through
freed slots, and survive bad jobs."""

import numpy as np
import pytest
from PIL import Image

import jax
import jax.numpy as jnp


@pytest.fixture
def params():
    from devc_tpu.utils.init import host_pipeline_params

    return jax.tree.map(jnp.asarray, host_pipeline_params(0))


def _make_clip(tmp_path, name, n_frames, rng, h=64, w=128):
    d = tmp_path / name
    d.mkdir()
    for i in range(n_frames):
        Image.fromarray((rng.rand(h, w, 3) * 255).astype(np.uint8)).save(
            d / f"{i:03d}.jpg"
        )
    return d


def test_scheduler_matches_serial(params, tmp_path):
    """Slot rotation, ref-row updates and carry resets must reproduce each
    clip exactly as if it ran alone.

    The reference is a manual loop of the SAME B=2 batched program with the
    job pinned to row 0 and row 1 idle: every op in the step is per-sample
    (instance norm, correspondence, vmapped FGS), so the scheduler's
    outputs must be bitwise identical no matter which slot the job landed
    in or what shared it. (Comparing against the single-frame driver
    instead would re-measure compiled-program fp reorder amplified by the
    recurrence with random weights — covered by
    test_batched_inference_data_parallel at the one-step level.)
    """
    from devc_tpu.parallel.inference import batched_frame_step
    from devc_tpu.pipeline.scheduler import ClipBatchScheduler
    from devc_tpu.pipeline.video import _device_ref_features, list_clip_frames
    from devc_tpu.data.transforms import load_frame_rgb
    import os

    rng = np.random.RandomState(0)
    h, w = 64, 128
    # 3 jobs, 2 slots, different clip lengths: exercises slot rotation
    clips = [_make_clip(tmp_path, f"clip{i}", n, rng)
             for i, n in enumerate((3, 2, 4))]
    refs = []
    for i in range(3):
        p = tmp_path / f"ref{i}.jpg"
        Image.fromarray((rng.rand(h, w, 3) * 255).astype(np.uint8)).save(p)
        refs.append(p)

    sched = ClipBatchScheduler(
        params, image_size=(h, w), slots=2, wls=True, use_pallas=False,
        out_ext="png",
    )
    for i in range(3):
        sched.submit(str(clips[i]), str(refs[i]), str(tmp_path / f"batch{i}"))
    results = sched.run()
    assert [r["frames"] for r in results] == [3, 2, 4]

    step = jax.jit(
        lambda p, f, l, rs: batched_frame_step(
            p, f, l, rs, temperature=1e-10, wls=True, use_pallas=False
        )
    )
    for i, r in enumerate(results):
        ref_u8 = jnp.asarray(load_frame_rgb(str(refs[i]), (h, w)))
        _, state = _device_ref_features(params, ref_u8)
        ref_stack = jax.tree.map(
            lambda x: jnp.concatenate([x, x], axis=0), state
        )
        last = jnp.zeros((2, h // 2, w // 2, 3), jnp.float32)
        names = list_clip_frames(str(clips[i]))
        for fi, (name, out_path) in enumerate(zip(names, r["outputs"])):
            frame = load_frame_rgb(os.path.join(str(clips[i]), name), (h, w))
            batch = np.stack([frame, np.zeros_like(frame)])
            out, last = step(params, jnp.asarray(batch), last, ref_stack)
            got = np.asarray(Image.open(out_path))
            assert np.array_equal(got, np.asarray(out[0])), (i, fi)


def test_scheduler_skips_bad_job(params, tmp_path):
    from devc_tpu.pipeline.scheduler import ClipBatchScheduler

    rng = np.random.RandomState(1)
    h, w = 64, 128
    good = _make_clip(tmp_path, "good", 2, rng)
    empty = tmp_path / "empty"
    empty.mkdir()
    ref = tmp_path / "ref.jpg"
    Image.fromarray((rng.rand(h, w, 3) * 255).astype(np.uint8)).save(ref)

    sched = ClipBatchScheduler(params, image_size=(h, w), slots=2,
                               wls=False, use_pallas=False)
    sched.submit(str(empty), str(ref), str(tmp_path / "out_bad"))
    sched.submit(str(good), str(ref), str(tmp_path / "out_good"))
    results = sched.run()
    assert "error" in results[0]
    assert results[1]["frames"] == 2
