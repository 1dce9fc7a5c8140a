"""Train state and optimizer factories (reference learning-rate rules).

Replicates the reference's loader.load_models policy (loader.py:8-69):

- status 'vanilla':                 Adam(lr)
- status 'pretrained' + finetune:   Adam(0.5 * lr * 10e-2) == 0.05*lr
- status 'pretrained' + frozen:     Adam(lr), both conv trunks frozen
- status 'clmr' + finetune:         Adam(0.5 * lr)
- status 'clmr' + frozen:           Adam(lr), conv trunk frozen

Freezing is expressed with optax.multi_transform over a param label tree
(trainable heads vs frozen encoder trunks), the functional equivalent of the
reference's requires_grad=False loop.
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import optax
from flax.training import train_state


class TrainState(train_state.TrainState):
    """Standard flax TrainState; dropout rng is threaded per-step."""


def downstream_learning_rate(status: str, pre: str, lr: float) -> float:
    if status == "pretrained" and pre != "frozen":
        return 0.5 * lr * 10e-2
    if status == "clmr" and pre != "frozen":
        return 0.5 * lr
    return lr


def _trunk_label_tree(params: Any) -> Any:
    """Label each leaf 'frozen' if it belongs to an encoder trunk, else 'train'."""

    def label_path(path, _):
        keys = [getattr(p, "key", getattr(p, "name", "")) for p in path]
        return "frozen" if "encoder" in keys else "train"

    return jax.tree_util.tree_map_with_path(label_path, params)


@functools.lru_cache(maxsize=64)
def make_optimizer(status: str, pre: str, lr: float, params: Any = None) -> optax.GradientTransformation:
    """Cached so repeated fold/repeat state inits reuse ONE transform object —
    a fresh optax instance per fold would change the TrainState's static
    field hash and force a full XLA recompile of every train/eval step.
    ``params`` is unused (labels are computed lazily) and kept for API shape.
    """
    eff_lr = downstream_learning_rate(status, pre, lr)
    adam = optax.adam(eff_lr, b1=0.9, b2=0.999)
    if pre == "frozen" and status in ("pretrained", "clmr"):
        return optax.multi_transform({"train": adam, "frozen": optax.set_to_zero()}, _trunk_label_tree)
    return adam


@functools.lru_cache(maxsize=8)
def pretext_optimizer(task: str = "zerons", lr: float = None) -> optax.GradientTransformation:
    """Reference pretext optimizers (pretext.py:202,208); cached (see above).

    ``lr=None`` = reference parity (zerons 1e-6, clmr 1e-5). The reference
    amortizes its tiny zerons lr over ~3e5 steps (20 chunks x 1440 tracks x
    10+ epochs, pretext.py:255-321); demo-scale runs (~1e2 steps) may pass an
    explicitly larger lr to reach an equivalent optimization distance.
    """
    if lr is None:
        lr = 1e-6 if task == "zerons" else 1e-5
    return optax.adam(lr, b1=0.9, b2=0.999)
