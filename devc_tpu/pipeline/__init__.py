from devc_tpu.pipeline.frame import (
    extract_reference_features,
    warp_color,
    frame_colorization,
)
from devc_tpu.pipeline.clip import colorize_clip, make_clip_fn
