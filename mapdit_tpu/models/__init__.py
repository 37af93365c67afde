from mapdit_tpu.models.config import DiTConfig
from mapdit_tpu.models.dit import DiT, init_model, param_count, project_weights
from mapdit_tpu.models.registry import DIT_MODELS, build_config

__all__ = [
    "DiT",
    "DiTConfig",
    "DIT_MODELS",
    "build_config",
    "init_model",
    "param_count",
    "project_weights",
]
