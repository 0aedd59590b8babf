from hcmvs_tpu.core.camera import Camera
from hcmvs_tpu.core.config import DenseConfig
