"""TPU-native multi-robot collision-avoidance RL framework.

A ground-up JAX/XLA rebuild of the capabilities of the PyTorch + ROS/Stage
reference (Acmece/rl-collision-avoidance): multi-agent PPO for decentralized
collision avoidance (arXiv:1709.10082), with the simulator, policy, and
learner fused into single jitted programs running on TPU device meshes.
"""
__version__ = "0.1.0"
