"""Checkpoint / resume for training state and detector weights.

The reference has no checkpointing at all — weights re-download on every
``run()`` call and results die with the process (SURVEY.md §5).  Here:

- detector weights are explicit .npz artifacts (models/weights.py), and
- training state (params + optimizer + step) checkpoints through Orbax with
  atomic directory swaps, ``latest``/step addressing, and resume.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.PyTreeCheckpointer()


def save_train_state(directory: str, state: Any, step: Optional[int] = None) -> str:
    """Save a TrainState (or any pytree) under ``directory/step_N``."""
    if step is None:
        step = int(getattr(state, "step", 0))
    path = os.path.join(os.path.abspath(directory), f"step_{step:08d}")
    _checkpointer().save(path, jax.tree_util.tree_map(lambda x: x, state), force=True)
    return path


def latest_step(directory: str) -> Optional[int]:
    if not os.path.isdir(directory):
        return None
    steps = []
    for name in os.listdir(directory):
        if name.startswith("step_"):
            try:
                steps.append(int(name.split("_", 1)[1]))
            except ValueError:
                continue
    return max(steps) if steps else None


def restore_train_state(directory: str, template: Any,
                        step: Optional[int] = None) -> Any:
    """Restore the given (or latest) step; ``template`` supplies structure
    and dtypes."""
    if step is None:
        step = latest_step(directory)
        if step is None:
            raise FileNotFoundError(f"no checkpoints under {directory}")
    path = os.path.join(os.path.abspath(directory), f"step_{step:08d}")
    import orbax.checkpoint as ocp

    # Restore args carry each leaf's sharding from the template, so arrays
    # land on the CURRENT topology's shardings (restoring without them
    # reads sharding from the checkpoint file — slower, and wrong when the
    # mesh differs from the one that saved).
    item = jax.tree_util.tree_map(lambda x: x, template)
    restored = _checkpointer().restore(
        path, item=item,
        restore_args=ocp.checkpoint_utils.construct_restore_args(item),
    )
    return restored
