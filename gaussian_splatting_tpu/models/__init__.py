from gaussian_splatting_tpu.models.gaussians import GaussianParams, GaussianState, init_from_points, init_random
from gaussian_splatting_tpu.models.densify import densify_and_prune, reset_opacity

__all__ = [
    "GaussianParams",
    "GaussianState",
    "init_from_points",
    "init_random",
    "densify_and_prune",
    "reset_opacity",
]
