from hcmvs_tpu.sfm.features import detect_and_describe
from hcmvs_tpu.sfm.matching import match_descriptors
