from .env import Env, EnvState, Obs, StepInfo, make_env
from . import lidar, physics, sampling

__all__ = ["Env", "EnvState", "Obs", "StepInfo", "make_env", "lidar", "physics", "sampling"]
