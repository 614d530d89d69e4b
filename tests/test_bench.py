"""bench.py CLI behavior: the OOM fallback must not swallow real errors."""
import json

import jax
import pytest

from rl_collision_avoidance_tpu import bench


def test_bench_fallback_reraises_non_resource_errors(monkeypatch, capsys):
    """A real regression (here: a deliberate shape bug -> ValueError) must
    fail the benchmark loudly, not silently shrink the arena count
    (VERDICT r3 weak #6)."""
    def broken_measure(*a, **k):
        raise ValueError("boom: deliberate shape bug")

    monkeypatch.setattr(bench, "measure", broken_measure)
    with pytest.raises(ValueError, match="deliberate shape bug"):
        bench.main(["--arenas", "4", "--inner-steps", "2", "--repeats", "1"])


def test_bench_fallback_halves_on_resource_exhaustion(monkeypatch, capsys):
    """Resource exhaustion at a large arena count falls back to half."""
    calls = []

    def oom_then_ok(n_arenas, *a, **k):
        calls.append(n_arenas)
        if n_arenas > 2:
            raise jax.errors.JaxRuntimeError(
                "RESOURCE_EXHAUSTED: out of memory allocating 1 bytes")
        return 123456.0

    monkeypatch.setattr(bench, "measure", oom_then_ok)
    bench.main(["--arenas", "8", "--inner-steps", "2", "--repeats", "1"])
    out = capsys.readouterr().out.strip().splitlines()[-1]
    assert json.loads(out)["value"] == 123456.0
    assert calls == [8, 4, 2]
