from hcmvs_tpu.ops.sampling import bilinear_sample
from hcmvs_tpu.ops.gradients import sobel_magnitude
