from devc_tpu.data.transforms import (
    center_pad,
    center_crop,
    sort_frames_numerically,
    rgb_to_lab_np,
    lab_to_network,
)
from devc_tpu.data.flow import read_flo, write_flo
