from hcmvs_tpu.io.dmap import DepthMapData, read_dmap, write_dmap
from hcmvs_tpu.io.mvs import SceneMVS, read_mvs, write_mvs
