from devc_tpu.ops.resize import (
    resize_bilinear,
    upsample_nearest,
    avg_pool,
    max_pool,
)
from devc_tpu.ops.layers import (
    conv2d,
    conv_init,
    instance_norm,
    prelu,
    reflect_pad,
    replicate_pad,
    leaky_relu,
    unfold_patches,
)
from devc_tpu.ops.correspondence import (
    correspondence_warp_einsum,
    correspondence_warp,
    wta_scale,
)
from devc_tpu.ops.fgs import fast_global_smoother
