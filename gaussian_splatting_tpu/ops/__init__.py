from gaussian_splatting_tpu.ops.projection import project_gaussians
from gaussian_splatting_tpu.ops.rasterize_ref import rasterize_reference
from gaussian_splatting_tpu.ops.render import render

__all__ = ["project_gaussians", "rasterize_reference", "render"]
