"""devc_tpu — TPU-native exemplar-based video colorization framework.

A from-scratch JAX/XLA/Pallas implementation of the capabilities of
"Deep Exemplar-based Video Colorization" (CVPR 2019). Given a directory of
grayscale frames and one color exemplar image, it colorizes the clip with the
exemplar's palette while staying temporally coherent.

Package map (see SURVEY.md for the reference structural analysis):
  colorspace    device-side RGB<->Lab, gray->RGB, VGG preprocessing
  ops           resize / norm / pad / pooling primitives with PyTorch-exact
                semantics, the dense-correspondence op (einsum reference path
                and the fused Pallas kernel), device-side edge-aware smoothing
  models        VGG19 feature extractor, WarpNet correspondence network,
                ColorVidNet generator, GAN discriminator (pure-function params)
  pipeline      frame_colorization composition, lax.scan clip recurrence,
                host-side video driver
  data          transforms, .flo I/O, training datasets, elastic distortion
  train         losses (contextual / perceptual / smoothness / RaLSGAN /
                temporal consistency), optax train state, checkpointing
  parallel      jax.sharding mesh + pjit/shard_map specs
  utils         torch-checkpoint conversion, logging, profiling
"""

__version__ = "0.1.0"
