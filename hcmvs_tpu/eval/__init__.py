from hcmvs_tpu.eval.compare import (compare_depth_maps, compare_normal_maps,
                                    point_cloud_fscore)
