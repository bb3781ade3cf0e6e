from legion_tpu.parallel.mesh import make_mesh, DP_AXES, dp_size

__all__ = ["make_mesh", "DP_AXES", "dp_size"]
