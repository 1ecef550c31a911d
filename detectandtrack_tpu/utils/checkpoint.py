"""Checkpoint / resume via orbax (+ .npz weight import/export).

Reference parity: `lib/utils/net.py` (SURVEY.md §3.4/§5): the reference
pickles `{blob_name: ndarray}` every CHECKPOINT_PERIOD iters
(`model_iter{N}.pkl`, `model_final.pkl`) and initializes from such files
with name mapping + 2D→3D inflation. Here:

- full train state (params + opt state + step) goes through
  orbax-checkpoint with async save and latest-step auto-resume;
- `save_weights_npz` / `load_weights_npz` provide a flat-name weight
  exchange format (the `.pkl` analogue) used by the CLI's --weights flag
  and by cross-model surgery (e.g. inflation: load 2D npz → inflate).
"""

from __future__ import annotations

import os
import re
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


# -- orbax full-state checkpoints -------------------------------------------

# One manager per directory, kept alive for the process: orbax async saves
# run on the manager's background thread, so the manager must outlive the
# call, and two managers on one directory would race the async commit.
_MANAGERS: Dict[str, Any] = {}


def _manager(ckpt_dir: str, max_to_keep: int = 5):
    import orbax.checkpoint as ocp
    key = os.path.abspath(ckpt_dir)
    mgr = _MANAGERS.get(key)
    if mgr is None:
        mgr = ocp.CheckpointManager(
            key,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True),
        )
        _MANAGERS[key] = mgr
    return mgr


def save_checkpoint(ckpt_dir: str, state, step: int,
                    max_to_keep: int = 5) -> None:
    """Asynchronous save: orbax snapshots `state` to host buffers and
    commits on a background thread — the train loop does NOT block on the
    filesystem (the previous snapshot is drained first so at most one save
    is in flight). Call `wait_for_checkpoints()` before reading the files
    back or exiting."""
    import orbax.checkpoint as ocp
    mgr = _manager(ckpt_dir, max_to_keep)
    mgr.save(step, args=ocp.args.StandardSave(state))


def wait_for_checkpoints(ckpt_dir: Optional[str] = None) -> None:
    """Block until in-flight async saves commit (one dir, or all)."""
    if ckpt_dir is not None:
        mgr = _MANAGERS.get(os.path.abspath(ckpt_dir))
        if mgr is not None:
            mgr.wait_until_finished()
        return
    for mgr in _MANAGERS.values():
        mgr.wait_until_finished()


def _drain_at_exit() -> None:
    try:
        wait_for_checkpoints()
    except Exception:
        pass


import atexit  # noqa: E402  (registration belongs with the cache above)

atexit.register(_drain_at_exit)


def latest_checkpoint_step(ckpt_dir: str) -> Optional[int]:
    if not os.path.isdir(ckpt_dir):
        return None
    mgr = _manager(ckpt_dir)
    return mgr.latest_step()


def restore_checkpoint(ckpt_dir: str, template, step: Optional[int] = None):
    """Restore into the structure/shardings of `template` (a matching
    state pytree). Returns (state, step) or (None, None)."""
    import orbax.checkpoint as ocp
    mgr = _manager(ckpt_dir)
    mgr.wait_until_finished()        # don't read past an in-flight save
    step = step if step is not None else mgr.latest_step()
    if step is None:
        return None, None
    state = mgr.restore(step, args=ocp.args.StandardRestore(template))
    return state, step


# -- flat npz weights (the .pkl-file analogue) ------------------------------

def flatten_params(params: Any, sep: str = "/") -> Dict[str, np.ndarray]:
    flat = {}
    for path, leaf in jax.tree.flatten_with_path(params)[0]:
        name = sep.join(
            str(getattr(p, "key", getattr(p, "idx", p))) for p in path)
        flat[name] = np.asarray(leaf)
    return flat


def unflatten_params(template: Any, flat: Dict[str, np.ndarray],
                     sep: str = "/") -> Any:
    leaves, treedef = jax.tree.flatten_with_path(template)
    out = []
    missing = []
    for path, leaf in leaves:
        name = sep.join(
            str(getattr(p, "key", getattr(p, "idx", p))) for p in path)
        if name in flat:
            v = flat[name]
            if v.shape != leaf.shape:
                raise ValueError(
                    f"shape mismatch for {name}: checkpoint {v.shape} vs "
                    f"model {leaf.shape}")
            out.append(jnp.asarray(v, leaf.dtype))
        else:
            missing.append(name)
            out.append(leaf)
    if missing:
        import logging
        logging.getLogger(__name__).warning(
            "%d params not found in weights file (kept init): %s...",
            len(missing), missing[:5])
    return jax.tree.unflatten(jax.tree.structure(template), out)


def save_weights_npz(path: str, params: Any) -> None:
    np.savez(path, **flatten_params(params))


def load_weights_npz(path: str, template: Any) -> Any:
    with np.load(path) as data:
        flat = {k: data[k] for k in data.files}
    return unflatten_params(template, flat)
