from gaussian_splatting_tpu.core.cameras import Camera, projection_matrix, focal_from_heuristic
from gaussian_splatting_tpu.core.quaternions import quat_normalize, quat_to_rotmat
from gaussian_splatting_tpu.core.sh import eval_sh, num_sh_bases, rgb_to_sh0, sh0_to_rgb
from gaussian_splatting_tpu.core.activations import (
    scale_activation,
    scale_inverse_activation,
    opacity_activation,
    opacity_inverse_activation,
)

__all__ = [
    "Camera",
    "projection_matrix",
    "focal_from_heuristic",
    "quat_normalize",
    "quat_to_rotmat",
    "eval_sh",
    "num_sh_bases",
    "rgb_to_sh0",
    "sh0_to_rgb",
    "scale_activation",
    "scale_inverse_activation",
    "opacity_activation",
    "opacity_inverse_activation",
]
