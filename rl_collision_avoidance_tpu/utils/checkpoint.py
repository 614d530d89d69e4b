"""Full-state checkpointing (params + optimizer + env + RNG).

The reference saves only ``policy.state_dict()`` every 20 updates
(``ppo_stage1.py:122-126``) and warm-starts curriculum stages from it
(``ppo_stage2.py:194-200``).  Here the whole :class:`TrainState` pytree is
saved via Orbax, giving exact stop/resume; ``load_params``/``save_params``
cover the reference's params-only transfer (stage1 -> stage2 warm start).
"""
from __future__ import annotations

import os
from typing import Any

import jax
import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, directory: str, keep: int = 5):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._ckpt = ocp.PyTreeCheckpointer()
        self.keep = keep

    def _path(self, step: int) -> str:
        return os.path.join(self.directory, f"update_{step}")

    def save(self, step: int, state: Any):
        self._ckpt.save(self._path(step), jax.device_get(state), force=True)
        self._gc()

    def restore(self, step: int, template: Any | None = None) -> Any:
        if template is not None:
            return self._ckpt.restore(self._path(step), item=template)
        return self._ckpt.restore(self._path(step))

    def latest_step(self) -> int | None:
        steps = []
        if not os.path.isdir(self.directory):
            return None
        for name in os.listdir(self.directory):
            if name.startswith("update_"):
                try:
                    steps.append(int(name.split("_", 1)[1]))
                except ValueError:
                    pass
        return max(steps) if steps else None

    def save_best(self, step: int, state: Any, score: float) -> bool:
        """Keep a rolling 'best' checkpoint by a scalar score (e.g. mean
        return or goal-reach rate); returns True when it improved."""
        marker = os.path.join(self.directory, "best_score")
        prev = None
        if os.path.exists(marker):
            with open(marker) as f:
                prev = float(f.read().split()[0])
        if prev is not None and score <= prev:
            return False
        self._ckpt.save(os.path.join(self.directory, "best"),
                        jax.device_get(state), force=True)
        with open(marker, "w") as f:
            f.write(f"{score} {step}\n")
        return True

    def restore_best(self, template: Any | None = None) -> Any:
        path = os.path.join(self.directory, "best")
        if template is not None:
            return self._ckpt.restore(path, item=template)
        return self._ckpt.restore(path)

    def _gc(self):
        steps = sorted(
            int(n.split("_", 1)[1]) for n in os.listdir(self.directory)
            if n.startswith("update_") and n.split("_", 1)[1].isdigit())
        for s in steps[:-self.keep] if self.keep else []:
            import shutil
            shutil.rmtree(self._path(s), ignore_errors=True)


def save_params(path: str, params: Any):
    """Params-only save (the reference's ``torch.save(state_dict)``)."""
    ocp.PyTreeCheckpointer().save(os.path.abspath(path),
                                  jax.device_get(params), force=True)


def load_params(path: str, template: Any | None = None) -> Any:
    c = ocp.PyTreeCheckpointer()
    if template is not None:
        return c.restore(os.path.abspath(path), item=template)
    return c.restore(os.path.abspath(path))


def save_params_npz(path: str, params: Any):
    """Single-file params export (committable artifact, e.g. results/)."""
    import numpy as np

    flat, _ = jax.tree_util.tree_flatten_with_path(jax.device_get(params))
    np.savez_compressed(path, **{jax.tree_util.keystr(k): np.asarray(v)
                                 for k, v in flat})


def load_params_npz(path: str, template: Any) -> Any:
    """Restore a ``save_params_npz`` file into ``template``'s structure."""
    import numpy as np

    data = np.load(path)
    flat, treedef = jax.tree_util.tree_flatten_with_path(template)
    leaves = [data[jax.tree_util.keystr(k)] for k, _ in flat]
    return jax.tree_util.tree_unflatten(treedef, leaves)
