"""Frozen real-clip golden: the FULL host+device pipeline (decode ->
CenterPad -> device colorize with FGS -> PNG write) on real sample frames
with fixed random weights must keep producing the same images (VERDICT r1
next-step #10 — the synthetic 64x64 golden in test_golden.py cannot see
regressions in the host decode/resize/write path).

Golden generated on CPU with host_pipeline_params(seed=0) and the NATIVE
anti-aliased resize (the canonical host path; the numpy fallback differs
by float64-tie truncation flips of +-1 on the uint8 CenterPad output,
which the T=1e-10 argmax warp then amplifies with these random weights).
The +-2 uint8 tolerance absorbs XLA-version fp reassociation while
catching any real semantic change (actual bugs move tens of levels).
"""

import os
import shutil

import numpy as np
import pytest
from PIL import Image

_GOLDEN = os.path.join(os.path.dirname(__file__), "golden_clip.npz")
_SRC = "/root/reference/sample_videos/clips/v32"
_REF = "/root/reference/sample_videos/ref/v32/01.jpg"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(_SRC), reason="reference sample clip missing"
)


def test_real_clip_pipeline_matches_golden(tmp_path):
    import jax
    import jax.numpy as jnp

    from devc_tpu.data.native import get_lib

    if get_lib() is None:
        pytest.skip("native library unavailable (golden pins that path)")

    from devc_tpu.pipeline.video import colorize_video
    from devc_tpu.utils.init import host_pipeline_params

    data = np.load(_GOLDEN, allow_pickle=False)
    golden = data["frames"]
    names = [str(n) for n in data["names"]]

    clip = tmp_path / "clip"
    clip.mkdir()
    for n in names:
        shutil.copy(os.path.join(_SRC, n), clip / n)

    params = jax.tree.map(jnp.asarray, host_pipeline_params(0))
    written = colorize_video(
        params, str(clip), _REF, str(tmp_path / "out"),
        image_size=(160, 320), wls=True, write_video=False,
        use_pallas=False, out_ext="png",
    )
    assert len(written) == len(names)
    got = np.stack([np.asarray(Image.open(p)) for p in written])
    assert got.shape == golden.shape
    diff = np.abs(got.astype(int) - golden.astype(int))
    assert diff.max() <= 2, (diff.max(), (diff > 2).mean())
