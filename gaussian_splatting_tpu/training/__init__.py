from gaussian_splatting_tpu.training.config import TrainingConfig
from gaussian_splatting_tpu.training.trainer import GaussianTrainer

__all__ = ["TrainingConfig", "GaussianTrainer"]
