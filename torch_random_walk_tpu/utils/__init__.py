from torch_random_walk_tpu.utils import prng
from torch_random_walk_tpu.utils.elastic import (
    ElasticConfig,
    Heartbeat,
    run_resumable,
)
from torch_random_walk_tpu.utils.logging import get_logger

__all__ = ["prng", "get_logger", "ElasticConfig", "Heartbeat",
           "run_resumable"]
