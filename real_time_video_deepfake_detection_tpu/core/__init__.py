from .config import (
    TrackerConfig,
    ForensicConfig,
    DetectorConfig,
    ServerConfig,
    TrainConfig,
)

__all__ = [
    "TrackerConfig",
    "ForensicConfig",
    "DetectorConfig",
    "ServerConfig",
    "TrainConfig",
]
