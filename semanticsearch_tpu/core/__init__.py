from .config import (
    ChunkingConfig,
    Config,
    EncoderConfig,
    IndexConfig,
    RankingConfig,
    TrainConfig,
    get_named_config,
    register_config,
    NAMED_CONFIGS,
)
from .logging import get_logger, log_msg
from .mesh import MeshSpec, make_mesh, local_mesh

__all__ = [
    "ChunkingConfig",
    "Config",
    "EncoderConfig",
    "IndexConfig",
    "RankingConfig",
    "TrainConfig",
    "get_named_config",
    "register_config",
    "NAMED_CONFIGS",
    "get_logger",
    "log_msg",
    "MeshSpec",
    "make_mesh",
    "local_mesh",
]
