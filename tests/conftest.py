"""Test harness: everything runs on a virtual 8-device CPU mesh so sharding
logic is exercised without TPU hardware (mirrors the driver's multi-chip
dry-run).  The axon TPU plugin registers itself at interpreter start and
forces jax_platforms; undo that before any backend is initialized."""
import os

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")
