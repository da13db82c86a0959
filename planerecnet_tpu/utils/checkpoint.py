"""Checkpoint I/O: flat-npz model/train-state persistence.

Replaces the reference's ``torch.save(state_dict)`` weight I/O
(reference planerecnet.py:121-128) with a dependency-free flat ``.npz``
containing the flattened variable pytree ("/"-joined paths). The
``<name>_<epoch>_<iter>`` file-name codec lives in
``planerecnet_tpu/utils/utils.py::SavePath``.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Tuple

import jax
import numpy as np


def _atomic_savez(path: str, flat: Dict[str, np.ndarray]) -> None:
    """Write an .npz atomically: temp file in the same directory, then
    ``os.replace``. The closed-loop supervisor resumes after SIGKILL
    (kernel OOM, tools/closed_loop.py); a kill mid-save must never leave a
    truncated 'latest' checkpoint that would fail every subsequent
    ``--resume latest`` relaunch."""
    path = path if path.endswith(".npz") else path + ".npz"
    tmp = path + f".tmp{os.getpid()}"
    try:
        with open(tmp, "wb") as f:
            np.savez(f, **flat)
        os.replace(tmp, path)
    except BaseException:
        try:
            os.remove(tmp)
        except OSError:
            pass
        raise


def flatten_pytree(tree: Any, prefix: str = "") -> Dict[str, np.ndarray]:
    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        key = "/".join(_path_str(p) for p in path)
        flat[key] = np.asarray(leaf)
    return flat


def _path_str(p) -> str:
    if hasattr(p, "key"):
        return str(p.key)
    if hasattr(p, "idx"):
        return str(p.idx)
    return str(p)


def unflatten_to_dict(flat: Dict[str, np.ndarray]) -> Dict:
    """Rebuild a nested dict from "/"-joined keys."""
    tree: Dict = {}
    for key, value in flat.items():
        parts = key.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = value
    return tree


def save_weights(path: str, variables: Dict) -> None:
    """Save a flax variables dict ({"params": ..., "batch_stats": ...})."""
    _atomic_savez(path, flatten_pytree(variables))


def load_weights(path: str) -> Dict:
    with np.load(path, allow_pickle=False) as data:
        flat = {k: data[k] for k in data.files}
    return unflatten_to_dict(flat)


def save_train_state(path: str, state) -> None:
    """Persist params / batch_stats / opt_state / step of a TrainState."""
    payload = {
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
        "step": np.asarray(state.step),
        "rng": np.asarray(state.rng) if state.rng is not None else np.zeros(2),
    }
    _atomic_savez(path, flatten_pytree(payload))


def load_train_state(path: str, state):
    """Restore a TrainState template from a file written by
    ``save_train_state`` (shapes/structure must match)."""
    nested = load_weights(path)

    def restore(template, saved):
        leaves_t, treedef = jax.tree_util.tree_flatten(template)
        flat_saved = flatten_pytree(saved)
        flat_template = flatten_pytree(template)
        assert set(flat_saved) == set(flat_template), (
            "checkpoint structure mismatch")
        ordered = [flat_saved[k] for k in flat_template]
        return jax.tree_util.tree_unflatten(
            treedef, [np.asarray(v).reshape(l.shape).astype(l.dtype)
                      for v, l in zip(ordered, leaves_t)])

    try:
        opt_state = restore(state.opt_state, nested["opt_state"])
    except AssertionError:
        # Optimizer-layout migration: checkpoints written before the
        # flattened-Adam core (optax.flatten) carry per-leaf moment trees
        # that no longer match the template. Resume with params/step intact
        # and fresh optimizer moments (Adam re-warms within ~1/(1-b2) steps)
        # rather than refusing the checkpoint.
        import warnings
        warnings.warn(
            f"{path}: opt_state layout differs from the current optimizer "
            "(pre-flatten checkpoint?); resuming with fresh optimizer state.")
        opt_state = state.opt_state

    return state.replace(
        params=restore(state.params, nested["params"]),
        batch_stats=restore(state.batch_stats, nested["batch_stats"]),
        opt_state=opt_state,
        step=int(np.asarray(nested["step"])),
        rng=jax.numpy.asarray(nested["rng"], dtype=jax.numpy.uint32),
    )
