from .prng import noise_inputs, seed_key
from .config import Config, GanConfig, RConfig, ApplyConfig, PretrainGConfig, PretrainPrevConfig, SampleConfig

__all__ = [
    "noise_inputs", "seed_key",
    "Config", "GanConfig", "RConfig", "ApplyConfig",
    "PretrainGConfig", "PretrainPrevConfig", "SampleConfig",
]
