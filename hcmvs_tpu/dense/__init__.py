from hcmvs_tpu.dense.types import PatchMatchState, ViewGeometry, make_view_geometry
from hcmvs_tpu.dense.patchmatch import estimate_depth_map
