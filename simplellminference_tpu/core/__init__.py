from simplellminference_tpu.core.config import (  # noqa: F401
    EngineConfig,
    KVCacheConfig,
    ModelConfig,
    QuantConfig,
)
