from manigaussian_tpu.models import blocks, unet3d, resnetfc
