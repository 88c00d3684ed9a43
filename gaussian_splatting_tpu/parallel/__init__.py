from gaussian_splatting_tpu.parallel.mesh import make_mesh
from gaussian_splatting_tpu.parallel.sharded_step import make_sharded_train_step

__all__ = ["make_mesh", "make_sharded_train_step"]
