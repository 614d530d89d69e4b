#!/usr/bin/env python3
"""Driver benchmark entry: one JSON line with the headline metric."""
from rl_collision_avoidance_tpu.bench import main

if __name__ == "__main__":
    main()
