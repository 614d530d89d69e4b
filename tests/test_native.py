"""Native worldc library vs the numpy fallback (skipped when unbuilt)."""
import numpy as np
import pytest

from rl_collision_avoidance_tpu.worlds.compile import _boundary_edges_np


def _native():
    from rl_collision_avoidance_tpu.utils.native import worldc_boundary_edges
    try:
        worldc_boundary_edges(np.zeros((2, 2), bool))
    except RuntimeError:
        pytest.skip("native/worldc not built (make -C native)")
    return worldc_boundary_edges


def test_native_matches_numpy():
    f = _native()
    rng = np.random.default_rng(7)
    for shape in ((1, 1), (3, 5), (40, 40)):
        g = rng.random(shape) < 0.4
        a = set(map(tuple, f(g).tolist()))
        b = set(map(tuple, _boundary_edges_np(g).tolist()))
        assert a == b
