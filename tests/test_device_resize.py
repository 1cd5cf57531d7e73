"""Device CenterPad (ops/device_resize.py) vs the exact host path.

The plan matrices must reproduce transforms.center_pad + center_crop
(reference CenterPad, utils/util_distortion.py:217-258) exactly in float64;
on device the only deviation is float32 matmul accumulation, bounded at
<= 1 uint8 step.
"""

import glob

import numpy as np
import pytest
from PIL import Image

from devc_tpu.data.transforms import centerpad_np as _host_ref
from devc_tpu.data.transforms import load_frame_rgb
from devc_tpu.ops.device_resize import centerpad_plan, device_centerpad


def _plan_f64(arr_u8, size):
    a_h, a_w = centerpad_plan(arr_u8.shape[:2], size, dtype=np.float64)
    x = arr_u8.astype(np.float64)
    out = np.einsum("ts,swc->twc", a_h, x)
    out = np.einsum("uw,twc->tuc", a_w, out)
    return out


@pytest.mark.parametrize(
    "src,dst",
    [
        ((97, 150), (64, 96)),    # too wide for the target: crop width
        ((160, 100), (64, 96)),   # too tall: crop height
        ((128, 192), (64, 96)),   # equal aspect, downscale
        ((64, 96), (64, 96)),     # identity
        ((48, 64), (64, 96)),     # upscale (no prefilter)
        ((720, 1280), (432, 768)),  # the production shape
    ],
)
def test_plan_matches_host_float64(src, dst):
    rng = np.random.RandomState(0)
    arr = rng.randint(0, 256, src + (3,), dtype=np.uint8)
    ref = _host_ref(arr, dst)
    out = _plan_f64(arr, dst)
    # same float64 math reordered (matrix compose vs sequential filter):
    # identical up to fp64 reassociation, then the same truncating cast
    assert out.shape == ref.shape
    got = np.floor(np.clip(out, 0.0, 255.0)).astype(np.uint8)
    diff = np.abs(got.astype(int) - ref.astype(int))
    assert diff.max() <= 1
    assert (diff > 0).mean() < 5e-3


def test_device_path_close_to_host():
    frames = sorted(glob.glob("/root/reference/sample_videos/clips/v32/*.png"))
    if not frames:
        pytest.skip("reference sample data unavailable")
    raw = np.asarray(Image.open(frames[0]).convert("RGB"))
    size = (128, 256)
    ref = load_frame_rgb(frames[0], size)

    import jax.numpy as jnp

    a_h, a_w = centerpad_plan(raw.shape[:2], size)
    got = np.asarray(device_centerpad(jnp.asarray(raw), a_h, a_w))
    assert got.shape == ref.shape
    diff = np.abs(got.astype(int) - ref.astype(int))
    # f32 accumulation flips truncation ties by at most 1 LSB
    assert diff.max() <= 1
    assert (diff > 0).mean() < 0.02


def test_colorize_video_device_resize_end_to_end(tmp_path):
    """The driver with device_resize=True decodes raw frames and resizes
    inside the device program; outputs are target-sized and colorized."""
    import jax

    from devc_tpu.pipeline.video import colorize_video

    clip = tmp_path / "clip"
    clip.mkdir()
    rng = np.random.RandomState(2)
    for i in range(2):
        arr = rng.randint(0, 256, (96, 160, 3), dtype=np.uint8)
        Image.fromarray(arr).save(clip / f"{i:03d}.png")
    ref_path = tmp_path / "ref.png"
    Image.fromarray(
        rng.randint(0, 256, (96, 160, 3), dtype=np.uint8)
    ).save(ref_path)

    from devc_tpu.models import colorvidnet_init, vgg19_init, warpnet_init

    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    params = {
        "vgg": vgg19_init(k1),
        "warpnet": warpnet_init(k2),
        "colorvid": colorvidnet_init(k3),
    }
    written = colorize_video(
        params, str(clip), str(ref_path), str(tmp_path / "out"),
        image_size=(64, 128), wls=False, write_video=False,
        use_pallas=False, device_resize=True,
    )
    assert len(written) == 2
    out = np.asarray(Image.open(written[0]))
    assert out.shape == (64, 128, 3)
    assert np.abs(out[..., 0].astype(int) - out[..., 1].astype(int)).max() > 3


def test_colorize_video_device_resize_nonuniform_clip_raises(tmp_path):
    import jax

    from devc_tpu.pipeline.video import colorize_video

    clip = tmp_path / "clip"
    clip.mkdir()
    rng = np.random.RandomState(3)
    Image.fromarray(
        rng.randint(0, 256, (96, 160, 3), dtype=np.uint8)
    ).save(clip / "000.png")
    Image.fromarray(
        rng.randint(0, 256, (80, 160, 3), dtype=np.uint8)
    ).save(clip / "001.png")
    ref_path = tmp_path / "ref.png"
    Image.fromarray(
        rng.randint(0, 256, (96, 160, 3), dtype=np.uint8)
    ).save(ref_path)

    from devc_tpu.models import colorvidnet_init, vgg19_init, warpnet_init

    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    params = {
        "vgg": vgg19_init(k1),
        "warpnet": warpnet_init(k2),
        "colorvid": colorvidnet_init(k3),
    }
    with pytest.raises(ValueError, match="uniform clip resolution"):
        colorize_video(
            params, str(clip), str(ref_path), str(tmp_path / "out"),
            image_size=(64, 128), wls=False, write_video=False,
            use_pallas=False, device_resize=True,
        )


def test_device_centerpad_batched():
    import jax.numpy as jnp

    rng = np.random.RandomState(1)
    frames = rng.randint(0, 256, (3, 80, 120, 3), dtype=np.uint8)
    a_h, a_w = centerpad_plan((80, 120), (32, 64))
    out = np.asarray(device_centerpad(jnp.asarray(frames), a_h, a_w))
    assert out.shape == (3, 32, 64, 3)
    single = np.asarray(device_centerpad(jnp.asarray(frames[1]), a_h, a_w))
    np.testing.assert_array_equal(out[1], single)
