from .schema import EtudeConfig
from .loader import load_config, save_config

__all__ = ["EtudeConfig", "load_config", "save_config"]
