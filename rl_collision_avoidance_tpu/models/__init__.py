from .policy import CNNPolicy, MLPPolicy, torch_uniform_init
from . import distributions

__all__ = ["CNNPolicy", "MLPPolicy", "torch_uniform_init", "distributions"]
