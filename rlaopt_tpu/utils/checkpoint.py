"""Checkpoint / resume for solver state.

The reference has **no** checkpointing (SURVEY §5); this is a first-class TPU
addition built on Orbax: solver state pytrees (PCG/SAP/LSQR NamedTuples, the
convergence mask, and the iteration counter) are saved every
``checkpoint_freq`` logging rounds and can be restored to resume a solve.
"""

import json
import os
from typing import Any, Optional

import jax
import numpy as np


__all__ = ["SolveCheckpointer"]


def _jsonify(obj):
    """Best-effort conversion of a metrics/log tree to JSON-safe values."""
    if isinstance(obj, dict):
        return {str(k): _jsonify(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [_jsonify(v) for v in obj]
    if isinstance(obj, (jax.Array, np.ndarray)):
        return np.asarray(obj).tolist()
    if isinstance(obj, (np.floating, np.integer)):
        return obj.item()
    if obj is None or isinstance(obj, (bool, int, float, str)):
        return obj
    return repr(obj)


class SolveCheckpointer:
    """Persist (iteration, solver state, mask) under a directory.

    Uses ``orbax.checkpoint`` when available, falling back to ``.npz``
    flat-array storage (same tree structure, host arrays).
    """

    def __init__(self, directory: str):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        try:
            import orbax.checkpoint as ocp

            self._ocp = ocp
        except Exception:
            self._ocp = None

    # -- paths ---------------------------------------------------------------
    def _step_dir(self, step: int) -> str:
        return os.path.join(self.directory, f"step_{step:08d}")

    def latest_step(self) -> Optional[int]:
        steps = []
        for name in os.listdir(self.directory):
            if name.startswith("step_"):
                try:
                    steps.append(int(name.split("_")[1].split(".")[0]))
                except ValueError:
                    continue
        return max(steps) if steps else None

    # -- save/restore --------------------------------------------------------
    def save(self, step: int, payload: Any, aux: Optional[dict] = None) -> None:
        """Save a pytree payload at ``step`` (stored as flattened leaves, so
        NamedTuple/dataclass states survive the round-trip).

        ``aux``: optional JSON-serializable sidecar (log history, cumulative
        wall-clock) so a resumed solve keeps timing/log continuity instead of
        restarting them from zero.
        """
        leaves = jax.tree_util.tree_leaves(payload)
        if self._ocp is not None:
            path = self._step_dir(step)
            with self._ocp.PyTreeCheckpointer() as ckptr:
                ckptr.save(path, {"leaves": list(leaves)}, force=True)
        else:
            np.savez(
                self._step_dir(step) + ".npz",
                **{f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)},
            )
        if aux is not None:
            with open(self._step_dir(step) + ".aux.json", "w") as f:
                json.dump(_jsonify(aux), f)

    def restore_aux(self, step: Optional[int] = None) -> Optional[dict]:
        """Load the aux sidecar saved at ``step`` (default: latest), if any."""
        if step is None:
            step = self.latest_step()
        if step is None:
            return None
        path = self._step_dir(step) + ".aux.json"
        if not os.path.exists(path):
            return None
        with open(path) as f:
            return json.load(f)

    def restore(self, step: Optional[int] = None, like: Any = None) -> Any:
        """Restore the payload at ``step`` (default: latest).

        ``like`` is the reference pytree providing the structure and dtypes
        (required — payloads are stored as flat leaves).
        """
        if step is None:
            step = self.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoints under {self.directory}")
        if like is None:
            raise ValueError("restore requires `like` (reference pytree)")
        if self._ocp is not None:
            with self._ocp.PyTreeCheckpointer() as ckptr:
                data = ckptr.restore(self._step_dir(step))
            leaves = data["leaves"]
            if isinstance(leaves, dict):  # some orbax versions key lists
                leaves = [leaves[k] for k in sorted(leaves, key=int)]
        else:
            data = np.load(self._step_dir(step) + ".npz", allow_pickle=False)
            n = len([k for k in data.files if k.startswith("leaf_")])
            leaves = [data[f"leaf_{i}"] for i in range(n)]
        ref_leaves, treedef = jax.tree_util.tree_flatten(like)
        leaves = [
            jax.numpy.asarray(x, dtype=ref.dtype)
            for ref, x in zip(ref_leaves, leaves)
        ]
        return jax.tree_util.tree_unflatten(treedef, leaves), step
