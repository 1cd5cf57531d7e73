from devc_tpu.models.vgg19 import VGG19_TAPS, vgg19_init, vgg19_extract
from devc_tpu.models.warpnet import warpnet_init, warpnet_apply
from devc_tpu.models.colorvidnet import colorvidnet_init, colorvidnet_apply
from devc_tpu.models.discriminator import (
    discriminator_init,
    discriminator_apply,
)
