"""Pipeline-level tests: clip scan vs per-frame equivalence, streaming API,
end-to-end video driver on synthetic frames."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from devc_tpu.pipeline.clip import colorize_clip, make_frame_step
from devc_tpu.pipeline.frame import extract_reference_features, frame_colorization


def _tiny_params(seed=0):
    from devc_tpu.models import colorvidnet_init, vgg19_init, warpnet_init

    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(seed), 3)
    return {
        "vgg": vgg19_init(k1),
        "warpnet": warpnet_init(k2),
        "colorvid": colorvidnet_init(k3),
    }


@pytest.fixture(scope="module")
def params():
    return _tiny_params()


def test_clip_scan_matches_per_frame(params, rng):
    t, h, w = 3, 32, 64
    frames = jnp.array(
        (rng.rand(t, h, w, 3).astype(np.float32) - 0.5) * 80
    )
    ref = jnp.array((rng.rand(h, w, 3).astype(np.float32) - 0.5) * 80)

    pred_scan, sim_scan = colorize_clip(params, frames, ref, temperature=0.01)

    # jitted per-frame oracle (eager numerics differ slightly from compiled,
    # and the recurrence amplifies that; compiled-vs-compiled is exact)
    import functools

    from devc_tpu.pipeline.frame import prepare_reference

    ref_state = jax.jit(prepare_reference)(params, ref[None])
    # re-run the scan with the SAME precomputed ref_state the oracle uses
    import functools as _ft

    pred_scan, sim_scan = jax.jit(_ft.partial(
        colorize_clip, temperature=0.01
    ))(params, frames, ref, ref_state)

    step = jax.jit(functools.partial(
        frame_colorization, temperature=0.01, joint_training=False,
        ref_embedding=(ref_state["phi"], ref_state["values"]),
    ))
    last = jnp.zeros((1, h, w, 3), jnp.float32)
    preds = []
    for i in range(t):
        pred_ab, _, sim, _ = step(
            params, frames[i][None], ref[None], last, ref_state["features"]
        )
        last = jnp.concatenate([frames[i][None, ..., 0:1], pred_ab], axis=-1)
        preds.append(np.asarray(pred_ab[0]))

    np.testing.assert_allclose(np.asarray(pred_scan), np.stack(preds), atol=1e-4)


def test_cached_ref_embedding_matches_full_path(params, rng):
    """prepare_reference + ref_embedding == recomputing the exemplar half of
    WarpNet every frame (single frame: no recurrence amplification)."""
    import functools

    from devc_tpu.pipeline.frame import prepare_reference

    h, w = 32, 64
    frame = jnp.array((rng.rand(1, h, w, 3).astype(np.float32) - 0.5) * 80)
    ref = jnp.array((rng.rand(1, h, w, 3).astype(np.float32) - 0.5) * 80)
    last = jnp.zeros((1, h, w, 3), jnp.float32)

    ref_state = jax.jit(prepare_reference)(params, ref)
    cached = jax.jit(functools.partial(
        frame_colorization, temperature=0.01, joint_training=False,
        ref_embedding=(ref_state["phi"], ref_state["values"]),
    ))(params, frame, ref, last, ref_state["features"])
    full = jax.jit(functools.partial(
        frame_colorization, temperature=0.01, joint_training=False,
    ))(params, frame, ref, last, ref_state["features"])
    np.testing.assert_allclose(
        np.asarray(cached[0]), np.asarray(full[0]), atol=5e-3
    )


def test_recurrence_feeds_forward(params, rng):
    """The prediction for frame t must depend on frame t-1's prediction."""
    t, h, w = 2, 32, 64
    frames = np.broadcast_to(
        (rng.rand(1, h, w, 3).astype(np.float32) - 0.5) * 80, (t, h, w, 3)
    ).copy()
    ref = jnp.array((rng.rand(h, w, 3).astype(np.float32) - 0.5) * 80)
    pred, _ = colorize_clip(params, jnp.array(frames), ref, temperature=0.01)
    pred = np.asarray(pred)
    # identical frames, different carry -> different predictions
    assert np.abs(pred[0] - pred[1]).max() > 1e-4


def test_streaming_matches_scan(params, rng):
    t, h, w = 2, 32, 64
    frames = (rng.rand(t, h, w, 3).astype(np.float32) - 0.5) * 80
    ref = (rng.rand(h, w, 3).astype(np.float32) - 0.5) * 80

    from devc_tpu.pipeline.clip import make_clip_fn

    pred_scan, _ = make_clip_fn(temperature=0.01)(
        params, jnp.array(frames), jnp.array(ref)
    )

    init_fn, step_fn = make_frame_step(params, temperature=0.01)
    ref_state = init_fn(jnp.array(ref))
    last = jnp.zeros((1, h, w, 3), jnp.float32)
    outs = []
    for i in range(t):
        pred_ab, _sim, last = step_fn(
            jnp.array(frames[i]), last, jnp.array(ref), ref_state
        )
        outs.append(np.asarray(pred_ab[0]))
    np.testing.assert_allclose(np.asarray(pred_scan), np.stack(outs), atol=1e-4)


def test_video_driver_end_to_end(params, tmp_path, rng):
    """Full host pipeline: frames on disk -> colorized jpgs (+ sanity)."""
    from PIL import Image

    from devc_tpu.pipeline.video import colorize_video

    clip = tmp_path / "clip"
    clip.mkdir()
    h, w = 64, 128
    for i in range(3):
        arr = (rng.rand(h, w, 3) * 255).astype(np.uint8)
        Image.fromarray(arr).save(clip / f"{i:03d}.jpg")
    ref_path = tmp_path / "ref.jpg"
    Image.fromarray((rng.rand(h, w, 3) * 255).astype(np.uint8)).save(ref_path)

    out = tmp_path / "out"
    written = colorize_video(
        params,
        str(clip),
        str(ref_path),
        str(out),
        image_size=(h, w),
        wls=True,
        write_video=False,
        use_pallas=False,
    )
    assert len(written) == 3
    img = np.asarray(Image.open(written[0]))
    assert img.shape == (h, w, 3)
    assert img.std() > 1.0  # not a constant image


def test_multi_ref_matches_serial(params, tmp_path, rng):
    """Batched multi-exemplar colorization == per-exemplar serial runs."""
    from PIL import Image

    from devc_tpu.pipeline.video import colorize_video, colorize_video_multi

    clip = tmp_path / "clip"
    clip.mkdir()
    h, w = 64, 128
    for i in range(2):
        Image.fromarray((rng.rand(h, w, 3) * 255).astype(np.uint8)).save(
            clip / f"{i:03d}.jpg"
        )
    refs = []
    for i in range(2):
        p = tmp_path / f"ref{i}.jpg"
        Image.fromarray((rng.rand(h, w, 3) * 255).astype(np.uint8)).save(p)
        refs.append(str(p))

    multi_dirs = [str(tmp_path / f"multi{i}") for i in range(2)]
    written_multi = colorize_video_multi(
        params, str(clip), refs, multi_dirs, image_size=(h, w),
        wls=False, write_video=False, use_pallas=False,
    )
    for i, ref in enumerate(refs):
        serial = colorize_video(
            params, str(clip), ref, str(tmp_path / f"serial{i}"),
            image_size=(h, w), wls=False, write_video=False, use_pallas=False,
        )
        for pm, ps in zip(written_multi[i], serial):
            a = np.asarray(Image.open(pm)).astype(int)
            b = np.asarray(Image.open(ps)).astype(int)
            # same pipeline, different batching/compilation: allow tiny
            # uint8-level wobble
            assert np.abs(a - b).mean() < 1.0
            assert np.abs(a - b).max() <= 30


def test_bf16_compute_dtype_path_runs(params, tmp_path, rng):
    """The opt-in bf16 network path must produce sane uint8 frames and a
    float32 carry (numerically it differs from fp32 by design; measured
    not faster on v5e — kept as a re-test hook, pipeline/video.py)."""
    import jax
    import jax.numpy as jnp

    from devc_tpu.pipeline.video import (
        _device_frame_step,
        _device_ref_features,
    )

    h, w = 64, 128
    params_bf = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)
    frame = jnp.asarray((rng.rand(h, w, 3) * 255).astype(np.uint8))
    ref = jnp.asarray((rng.rand(h, w, 3) * 255).astype(np.uint8))
    rls, rs = _device_ref_features(params_bf, ref, compute_dtype="bfloat16")
    assert rs["phi"].dtype == jnp.bfloat16
    last = jnp.zeros((1, h // 2, w // 2, 3), jnp.float32)
    out, new_last = _device_frame_step(
        params_bf, frame, last, rls, rs, temperature=0.01, wls=True,
        use_pallas=False, compute_dtype="bfloat16",
    )
    assert out.dtype == jnp.uint8 and out.shape == (h, w, 3)
    assert new_last.dtype == jnp.float32
    assert np.asarray(out).std() > 1.0


def test_multi_ref_drops_corrupt_exemplar(params, tmp_path, rng):
    """One corrupt exemplar must be skipped with a warning, not abort the
    batch (reference test.py:179-181 per-reference fault tolerance)."""
    import warnings

    from PIL import Image

    from devc_tpu.pipeline.video import colorize_video_multi

    clip = tmp_path / "clip"
    clip.mkdir()
    h, w = 64, 128
    for i in range(2):
        Image.fromarray((rng.rand(h, w, 3) * 255).astype(np.uint8)).save(
            clip / f"{i:03d}.jpg"
        )
    good = tmp_path / "good.jpg"
    Image.fromarray((rng.rand(h, w, 3) * 255).astype(np.uint8)).save(good)
    bad = tmp_path / "bad.jpg"
    bad.write_bytes(b"not an image")

    dirs = [str(tmp_path / "out_bad"), str(tmp_path / "out_good")]
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        written = colorize_video_multi(
            params, str(clip), [str(bad), str(good)], dirs,
            image_size=(h, w), wls=False, write_video=False, use_pallas=False,
        )
    assert any("skipping reference" in str(c.message) for c in caught)
    assert len(written) == 1 and len(written[0]) == 2
    assert all(p.startswith(dirs[1]) for p in written[0])

    import pytest as _pytest

    with _pytest.raises(ValueError, match="all reference images failed"):
        colorize_video_multi(
            params, str(clip), [str(bad)], [dirs[0]],
            image_size=(h, w), wls=False, write_video=False, use_pallas=False,
        )


def test_scan_mode_matches_stream(params, tmp_path, rng):
    """mode=scan (chunked lax.scan incl. postproc) == mode=stream."""
    from PIL import Image

    from devc_tpu.pipeline.video import colorize_video

    clip = tmp_path / "clip"
    clip.mkdir()
    h, w = 64, 128
    for i in range(5):  # 5 frames with chunk=2: exercises tail padding
        Image.fromarray((rng.rand(h, w, 3) * 255).astype(np.uint8)).save(
            clip / f"{i:03d}.jpg"
        )
    ref = tmp_path / "ref.jpg"
    Image.fromarray((rng.rand(h, w, 3) * 255).astype(np.uint8)).save(ref)

    stream = colorize_video(
        params, str(clip), str(ref), str(tmp_path / "stream"),
        image_size=(h, w), wls=True, write_video=False, use_pallas=False,
    )
    scan = colorize_video(
        params, str(clip), str(ref), str(tmp_path / "scan"),
        image_size=(h, w), wls=True, write_video=False, use_pallas=False,
        mode="scan", chunk=2,
    )
    assert len(stream) == len(scan) == 5
    for ps, pc in zip(stream, scan):
        a = np.asarray(Image.open(ps)).astype(int)
        b = np.asarray(Image.open(pc)).astype(int)
        assert np.abs(a - b).mean() < 1.0
        assert np.abs(a - b).max() <= 30


def test_split_embed_scan_matches_fused(params, rng):
    """split_embed=True (two-loop program: embed scan -> corr/generator
    scan) == split_embed=False on the same inputs. Semantically identical
    op sequences compiled as different programs — compared at T=0.01 (soft
    warp) with the documented cross-program tolerance (conftest notes:
    fp-reorder deltas amplified by the untrained recurrence)."""
    from devc_tpu.pipeline.video import (
        _device_chunk_scan,
        _device_ref_features,
    )

    h, w = 64, 128
    frames = jnp.asarray(
        (rng.rand(4, h, w, 3) * 255).astype(np.uint8)
    )
    ref = jnp.asarray((rng.rand(h, w, 3) * 255).astype(np.uint8))
    _, ref_state = _device_ref_features(params, ref)
    last0 = jnp.zeros((1, h // 2, w // 2, 3), jnp.float32)

    out_f, carry_f = _device_chunk_scan(
        params, frames, last0, ref_state, temperature=0.01, wls=True,
        use_pallas=False, split_embed=False,
    )
    out_s, carry_s = _device_chunk_scan(
        params, frames, last0, ref_state, temperature=0.01, wls=True,
        use_pallas=False, split_embed=True,
    )
    a = np.asarray(out_f).astype(int)
    b = np.asarray(out_s).astype(int)
    assert np.abs(a - b).mean() < 1.0
    assert np.abs(a - b).max() <= 30
    np.testing.assert_allclose(
        np.asarray(carry_f), np.asarray(carry_s), atol=0.5
    )


def test_split_embed_scan_multi_matches_fused(params, rng):
    """The multi-exemplar split-embed scan == the fused multi scan."""
    from devc_tpu.pipeline.video import (
        _device_chunk_scan_multi,
        _device_ref_features_multi,
    )

    h, w = 64, 128
    frames = jnp.asarray(
        (rng.rand(4, h, w, 3) * 255).astype(np.uint8)
    )
    refs = jnp.asarray((rng.rand(2, h, w, 3) * 255).astype(np.uint8))
    _, ref_state = _device_ref_features_multi(params, refs)
    last0 = jnp.zeros((2, h // 2, w // 2, 3), jnp.float32)

    out_f, _ = _device_chunk_scan_multi(
        params, frames, last0, ref_state, temperature=0.01, wls=True,
        use_pallas=False, split_embed=False,
    )
    out_s, _ = _device_chunk_scan_multi(
        params, frames, last0, ref_state, temperature=0.01, wls=True,
        use_pallas=False, split_embed=True,
    )
    a = np.asarray(out_f).astype(int)
    b = np.asarray(out_s).astype(int)
    assert np.abs(a - b).mean() < 1.0
    assert np.abs(a - b).max() <= 30


def test_unrolled_refs_matches_batched(params, rng):
    """The TPU default unrolls the R-batched generator into R batch-1
    applies (space-to-batch conv rewrite — probes/ab_cvn_batch.py,
    BASELINE.md round-5); semantics must match the batched path."""
    from devc_tpu.pipeline.video import (
        _device_chunk_scan_multi,
        _device_ref_features_multi,
    )

    h, w = 64, 128
    frames = jnp.asarray(
        (rng.rand(3, h, w, 3) * 255).astype(np.uint8)
    )
    refs = jnp.asarray((rng.rand(2, h, w, 3) * 255).astype(np.uint8))
    _, ref_state = _device_ref_features_multi(params, refs)
    last0 = jnp.zeros((2, h // 2, w // 2, 3), jnp.float32)

    out_b, carry_b = _device_chunk_scan_multi(
        params, frames, last0, ref_state, temperature=0.01, wls=True,
        use_pallas=False, split_embed=True, unroll_refs=False,
    )
    out_u, carry_u = _device_chunk_scan_multi(
        params, frames, last0, ref_state, temperature=0.01, wls=True,
        use_pallas=False, split_embed=True, unroll_refs=True,
    )
    a = np.asarray(out_b).astype(int)
    b = np.asarray(out_u).astype(int)
    assert np.abs(a - b).mean() < 1.0
    assert np.abs(a - b).max() <= 30
    np.testing.assert_allclose(
        np.asarray(carry_b), np.asarray(carry_u), atol=0.5
    )


def test_multi_scan_mode_matches_stream(params, tmp_path, rng):
    """colorize_video_multi mode=scan (chunked lax.scan over the R-batched
    frame body) == mode=stream (VERDICT r2 missing #4)."""
    from PIL import Image

    from devc_tpu.pipeline.video import colorize_video_multi

    clip = tmp_path / "clip"
    clip.mkdir()
    h, w = 64, 128
    for i in range(5):  # 5 frames with chunk=2: exercises tail padding
        Image.fromarray((rng.rand(h, w, 3) * 255).astype(np.uint8)).save(
            clip / f"{i:03d}.jpg"
        )
    refs = []
    for i in range(2):
        p = tmp_path / f"ref{i}.jpg"
        Image.fromarray((rng.rand(h, w, 3) * 255).astype(np.uint8)).save(p)
        refs.append(str(p))

    stream = colorize_video_multi(
        params, str(clip), refs,
        [str(tmp_path / f"st{i}") for i in range(2)],
        image_size=(h, w), wls=False, write_video=False, use_pallas=False,
    )
    scan = colorize_video_multi(
        params, str(clip), refs,
        [str(tmp_path / f"sc{i}") for i in range(2)],
        image_size=(h, w), wls=False, write_video=False, use_pallas=False,
        mode="scan", chunk=2,
    )
    assert [len(x) for x in stream] == [len(x) for x in scan] == [5, 5]
    for ri in range(2):
        for ps, pc in zip(stream[ri], scan[ri]):
            a = np.asarray(Image.open(ps)).astype(int)
            b = np.asarray(Image.open(pc)).astype(int)
            # different compiled programs; same tolerance rationale as
            # test_scan_mode_matches_stream
            assert np.abs(a - b).mean() < 1.0
            assert np.abs(a - b).max() <= 30


def test_async_writer_failure_propagates():
    """_AsyncWriter: a write exception re-raises at the producer instead of
    silently killing the thread and deadlocking a full queue."""
    import pytest as _pytest

    from devc_tpu.pipeline.video import _AsyncWriter

    calls = []

    def bad_write(idx, arr):
        calls.append(idx)
        raise OSError("disk full")

    wt = _AsyncWriter(bad_write, maxsize=1)
    with _pytest.raises(OSError, match="disk full"):
        # the first put triggers the failure; subsequent puts must raise
        # (not block) even though maxsize=1
        for i in range(50):
            wt.put(i, None)
    wt.close(raise_err=False)
    assert wt.err is not None and calls == [0]

    # a clean writer closes without error
    ok = _AsyncWriter(lambda i, a: None, maxsize=1)
    ok.put(0, None)
    ok.close()


def test_video_driver_writer_failure_raises(params, tmp_path, rng, monkeypatch):
    """A failing writer (e.g. disk full) aborts colorize_video with the
    writer's exception instead of hanging on a full queue (VERDICT r2
    weak #5)."""
    import pytest as _pytest
    from PIL import Image

    from devc_tpu.pipeline.video import colorize_video

    clip = tmp_path / "clip"
    clip.mkdir()
    h, w = 64, 128
    for i in range(6):
        Image.fromarray((rng.rand(h, w, 3) * 255).astype(np.uint8)).save(
            clip / f"{i:03d}.jpg"
        )
    ref = tmp_path / "ref.jpg"
    Image.fromarray((rng.rand(h, w, 3) * 255).astype(np.uint8)).save(ref)

    def boom(self, *a, **k):
        raise OSError("disk full")

    monkeypatch.setattr(Image.Image, "save", boom)
    with _pytest.raises(OSError, match="disk full"):
        colorize_video(
            params, str(clip), str(ref), str(tmp_path / "out"),
            image_size=(h, w), wls=False, write_video=False, use_pallas=False,
            prefetch=1,
        )
