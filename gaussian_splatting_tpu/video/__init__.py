from gaussian_splatting_tpu.video.loader import VideoLoader
from gaussian_splatting_tpu.video.calibrate import Calibrator
from gaussian_splatting_tpu.video.sfm import VideoSfM
from gaussian_splatting_tpu.video.processor import MultiVideoProcessor

__all__ = ["VideoLoader", "Calibrator", "VideoSfM", "MultiVideoProcessor"]
