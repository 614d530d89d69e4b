from .gae import generate_train_data, calculate_returns
from .ppo import (PPOConfig, Batch, ppo_loss, ppo_update,
                  ppo_update_sharded, normalize_advantages)

__all__ = [
    "generate_train_data", "calculate_returns", "PPOConfig", "Batch",
    "ppo_loss", "ppo_update", "ppo_update_sharded", "normalize_advantages",
]
