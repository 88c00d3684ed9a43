from gaussian_splatting_tpu.utils.metrics import MetricsLogger

__all__ = ["MetricsLogger"]
