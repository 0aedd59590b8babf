from hcmvs_tpu.mesh.delaunay import reconstruct_mesh
from hcmvs_tpu.mesh.mesh_ops import (clean_mesh, decimate_mesh,
                                     laplacian_smooth, remove_small_components)
