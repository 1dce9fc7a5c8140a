"""Checkpoint/resume via orbax (save AND restore, unlike the reference).

The reference only ever saves best-validation state_dicts and cannot resume
mid-run (SURVEY.md §5: optimizer state never saved). Here full TrainState
(params + optimizer state + step) round-trips through orbax, plus a light
"best params" slot for the reference's keep-best-by-val-metric behavior.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int = 3):
        self._dir = os.path.abspath(directory)
        os.makedirs(self._dir, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self._dir, options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep, create=True)
        )

    def save(self, step: int, state: Any, *, metrics: Optional[dict] = None, wait: bool = True):
        self._mgr.save(step, args=ocp.args.StandardSave(state), metrics=metrics)
        if wait:
            self._mgr.wait_until_finished()

    def restore(self, state_template: Any, step: Optional[int] = None) -> Any:
        step = self.latest_step() if step is None else step
        if step is None:
            raise FileNotFoundError(f"no checkpoints under {self._dir}")
        return self._mgr.restore(step, args=ocp.args.StandardRestore(state_template))

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def close(self):
        self._mgr.close()


def save_params(path: str, params: Any):
    """One-shot best-params save (the reference's .pth equivalent)."""
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, params, force=True)
    ckptr.wait_until_finished()


def load_params(path: str, template: Any | None = None) -> Any:
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(path, template)
