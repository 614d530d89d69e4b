"""Rendering utilities (Stage-GUI / demo-GIF parity surface)."""
import numpy as np
import pytest

from rl_collision_avoidance_tpu.worlds import mini

pytest.importorskip("matplotlib")


def test_png_and_gif(tmp_path):
    from rl_collision_avoidance_tpu.utils.render import (save_arena_png,
                                                         save_trajectory_gif)
    spec = mini()
    rng = np.random.default_rng(0)
    pose = rng.uniform(-5, 5, (4, 3)).astype(np.float32)
    goal = rng.uniform(-5, 5, (4, 2)).astype(np.float32)
    p = save_arena_png(str(tmp_path / "a.png"), spec, pose, goal)
    assert (tmp_path / "a.png").stat().st_size > 0
    poses = pose[None] + np.linspace(0, 1, 5)[:, None, None] * 0.1
    g = save_trajectory_gif(str(tmp_path / "t.gif"), spec, poses, goal)
    assert (tmp_path / "t.gif").stat().st_size > 0
