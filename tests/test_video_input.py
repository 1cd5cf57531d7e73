"""Video-FILE input for colorize_video (beyond the reference, which only
accepts frame folders — test.py:39-41): frames cv2-decoded in stream
order, host CenterPad or fused device resize applied as for folders."""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

import jax


def _write_avi(path, frames):
    h, w = frames[0].shape[:2]
    wr = cv2.VideoWriter(str(path), cv2.VideoWriter_fourcc(*"DIVX"), 24,
                         (w, h))
    assert wr.isOpened()
    for f in frames:
        wr.write(f[..., ::-1])  # RGB -> BGR
    wr.release()


@pytest.fixture(scope="module")
def params():
    from devc_tpu.models import colorvidnet_init, vgg19_init, warpnet_init

    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    return {
        "vgg": vgg19_init(k1),
        "warpnet": warpnet_init(k2),
        "colorvid": colorvidnet_init(k3),
    }


@pytest.fixture(scope="module")
def clip_avi(tmp_path_factory):
    rng = np.random.RandomState(4)
    frames = [rng.randint(0, 256, (96, 160, 3), dtype=np.uint8)
              for _ in range(3)]
    path = tmp_path_factory.mktemp("vid") / "clip.avi"
    _write_avi(path, frames)
    return str(path)


def test_is_video_file(clip_avi, tmp_path):
    from devc_tpu.pipeline.video import is_video_file

    assert is_video_file(clip_avi)
    assert not is_video_file(str(tmp_path))  # a directory
    missing = str(tmp_path / "nope.mp4")
    assert not is_video_file(missing)


def test_video_frames_decode_in_order(tmp_path):
    from devc_tpu.pipeline.video import _video_frames_rgb

    # solid per-frame gray levels survive DIVX compression well enough to
    # identify each frame and its position in the stream
    levels = [30, 120, 220]
    frames_in = [np.full((96, 160, 3), v, np.uint8) for v in levels]
    path = tmp_path / "ordered.avi"
    _write_avi(path, frames_in)

    frames = list(_video_frames_rgb(str(path)))
    assert len(frames) == 3
    assert all(f.shape == (96, 160, 3) and f.dtype == np.uint8
               for f in frames)
    for f, v in zip(frames, levels):
        assert abs(float(f.mean()) - v) < 15, (float(f.mean()), v)


@pytest.mark.parametrize("device_resize", [False, True])
def test_colorize_video_from_file(params, clip_avi, tmp_path, device_resize):
    from PIL import Image

    from devc_tpu.pipeline.video import colorize_video

    rng = np.random.RandomState(5)
    ref_path = tmp_path / "ref.png"
    Image.fromarray(
        rng.randint(0, 256, (96, 160, 3), dtype=np.uint8)
    ).save(ref_path)

    out = tmp_path / f"out_{device_resize}"
    written = colorize_video(
        params, clip_avi, str(ref_path), str(out),
        image_size=(64, 128), wls=False, write_video=False,
        use_pallas=False, device_resize=device_resize,
    )
    assert len(written) == 3
    arr = np.asarray(Image.open(written[0]))
    assert arr.shape == (64, 128, 3)
    assert np.abs(arr[..., 0].astype(int) - arr[..., 1].astype(int)).max() > 3


def test_colorize_video_multi_from_file(params, clip_avi, tmp_path):
    from PIL import Image

    from devc_tpu.pipeline.video import colorize_video_multi

    rng = np.random.RandomState(6)
    refs = []
    for i in range(2):
        rp = tmp_path / f"ref{i}.png"
        Image.fromarray(
            rng.randint(0, 256, (96, 160, 3), dtype=np.uint8)
        ).save(rp)
        refs.append(str(rp))
    outs = [str(tmp_path / "m0"), str(tmp_path / "m1")]
    written = colorize_video_multi(
        params, clip_avi, refs, outs, image_size=(64, 128),
        wls=False, write_video=False, use_pallas=False,
    )
    assert [len(w) for w in written] == [3, 3]
    arr = np.asarray(Image.open(written[1][0]))
    assert arr.shape == (64, 128, 3)


def test_unknown_mode_rejected(params, clip_avi, tmp_path):
    from devc_tpu.pipeline.video import colorize_video

    with pytest.raises(ValueError, match="unknown mode"):
        colorize_video(params, clip_avi, "", str(tmp_path / "o"),
                       image_size=(64, 128), mode="Scan")


def test_colorize_video_from_file_frame_propagate(params, clip_avi, tmp_path):
    from devc_tpu.pipeline.video import colorize_video

    written = colorize_video(
        params, clip_avi, ref_path="", output_dir=str(tmp_path / "out"),
        image_size=(64, 128), wls=False, write_video=False,
        use_pallas=False, frame_propagate=True,
    )
    assert len(written) == 3
