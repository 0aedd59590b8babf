from hcmvs_tpu.parallel.sharding import (make_device_mesh, shard_scene,
                                         scene_shardings)
