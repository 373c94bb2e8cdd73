"""pasta_tpu — TPU-native virtual try-on framework (PASTA-GAN++ capabilities).

A ground-up JAX / XLA / Pallas re-design of the PASTA-GAN++ system
(reference: xiezhy6/PASTA-GAN-plusplus): keypoint-driven garment patch
normalization/denormalization, a patch-routed spatially-adaptive StyleGAN2
generator with a parsing-prediction style branch and a SPADE texture branch,
dual image/parsing discriminators with ADA training, and a FID/KID/IS metric
harness.

Layout convention: all image tensors are NHWC (TPU-native), conv weights are
HWIO. The reference's NCHW/OIHW tensors are transposed at the weight-import
boundary only.
"""

__version__ = "0.1.0"
