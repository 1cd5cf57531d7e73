from devc_tpu.pipeline.frame import (
    extract_reference_features,
    prepare_reference,
    warp_color,
    frame_colorization,
)
from devc_tpu.pipeline.clip import colorize_clip, make_clip_fn, make_frame_step
from devc_tpu.pipeline.video import colorize_video, colorize_video_multi
