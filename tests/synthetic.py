"""Test shim: the synthetic scene generator lives in the package so the
bench and graft entries can use it too."""
from hcmvs_tpu.utils.synth import (PlaneScene, make_plane_scene, _texture,
                                   _texture_params, _rotation)
