from tpuserve.repository.config import (  # noqa: F401
    GenerationConfig,
    ModelConfig,
    QuantizationConfig,
    ShardingConfig,
    TensorConfig,
)
from tpuserve.repository.repo import ModelRepository, ModelType  # noqa: F401
