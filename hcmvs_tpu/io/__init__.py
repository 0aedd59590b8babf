from hcmvs_tpu.io.dmap import DepthMapData, read_dmap, write_dmap
from hcmvs_tpu.io.mvs import SceneMVS, read_mvs, write_mvs
from hcmvs_tpu.io.nvm import read_nvm, write_nvm
from hcmvs_tpu.io.obj import ObjMesh, read_obj, write_obj
from hcmvs_tpu.io.openmvg import read_openmvg_json, write_openmvg_json
from hcmvs_tpu.io.photoscan import read_photoscan_xml, write_photoscan_xml
