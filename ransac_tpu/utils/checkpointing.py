"""Checkpoint / resume for long-running pipelines (orbax-backed).

The reference has no persistence beyond output CSVs — its 458-candidate
search recomputes from scratch every run (SURVEY.md §5).  Here any pytree
of arrays (SfM maps, BA problems, search scores) snapshots asynchronously
between phases and resumes exactly, so a preempted multi-hour SfM/BA job
restarts from its last phase instead of from zero.
"""

from __future__ import annotations

import os
from typing import Any

import jax
import numpy as np


def _to_pytree_of_arrays(state: Any):
    return jax.tree.map(lambda x: np.asarray(x), state)


class CheckpointManager:
    """Thin wrapper over orbax CheckpointManager with a numpy fallback.

    Orbax gives async multi-host-safe snapshots; the fallback (plain .npz
    per step) keeps checkpointing functional in minimal environments.
    """

    def __init__(self, directory: str, max_to_keep: int = 3):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self.max_to_keep = max_to_keep
        try:
            import orbax.checkpoint as ocp

            self._ocp = ocp
            self._mgr = ocp.CheckpointManager(
                self.directory,
                options=ocp.CheckpointManagerOptions(
                    max_to_keep=max_to_keep, create=True),
            )
        except Exception:  # pragma: no cover - orbax is normally present
            self._ocp = None
            self._mgr = None

    def save(self, step: int, state: Any) -> None:
        state = _to_pytree_of_arrays(state)
        if self._mgr is not None:
            self._mgr.save(
                step, args=self._ocp.args.StandardSave(state))
            self._mgr.wait_until_finished()
        else:
            flat, treedef = jax.tree.flatten(state)
            np.savez(os.path.join(self.directory, f"step_{step}.npz"),
                     *flat, treedef=str(treedef))

    def latest_step(self) -> int | None:
        if self._mgr is not None:
            return self._mgr.latest_step()
        steps = [int(f[5:-4]) for f in os.listdir(self.directory)
                 if f.startswith("step_") and f.endswith(".npz")]
        return max(steps) if steps else None

    def restore(self, step: int | None = None, template: Any = None) -> Any:
        if step is None:
            step = self.latest_step()
        if step is None:
            return None
        if self._mgr is not None:
            if template is not None:
                template = _to_pytree_of_arrays(template)
                return self._mgr.restore(
                    step, args=self._ocp.args.StandardRestore(template))
            return self._mgr.restore(step)
        data = np.load(os.path.join(self.directory, f"step_{step}.npz"),
                       allow_pickle=True)
        flat = [data[k] for k in data.files if k != "treedef"]
        if template is None:
            return flat
        _, treedef = jax.tree.flatten(template)
        return jax.tree.unflatten(treedef, flat)

    def close(self):
        if self._mgr is not None:
            self._mgr.close()
