from manigaussian_tpu.ops import camera, gaussian_math
