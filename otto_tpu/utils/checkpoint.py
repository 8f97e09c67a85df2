"""Orbax checkpointing of training state.

The reference's persistence is per-model ad-hoc files (torch state_dicts on
best-val-loss, lgb fold models, gensim .save — SURVEY §5.4) with no optimizer
-state resume.  Here every trainer's state (params + optimizer state + step)
checkpoints through one Orbax-backed manager with retention and async-save
support, restoring sharded arrays onto the current mesh.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any

import numpy as np

from otto_tpu.logging_utils import get_logger

log = get_logger(__name__)

try:
    import orbax.checkpoint as ocp

    _HAS_ORBAX = True
except Exception:  # pragma: no cover - orbax is in the image
    _HAS_ORBAX = False


class CheckpointManager:
    """Thin wrapper over orbax CheckpointManager with an npz fallback."""

    def __init__(self, directory: str | Path, max_to_keep: int = 3):
        self.directory = Path(directory)
        self.directory.mkdir(parents=True, exist_ok=True)
        self.max_to_keep = max_to_keep
        if _HAS_ORBAX:
            self._mgr = ocp.CheckpointManager(
                self.directory.resolve(),
                options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep),
            )
        else:
            self._mgr = None

    def save(self, step: int, state: Any) -> None:
        if self._mgr is not None:
            self._mgr.save(step, args=ocp.args.StandardSave(state))
            self._mgr.wait_until_finished()
        else:  # flat-npz fallback
            flat = _flatten("", state)
            np.savez_compressed(self.directory / f"step_{step}.npz", **flat)

    def restore(self, step: int | None = None, template: Any = None) -> Any:
        if self._mgr is not None:
            step = self.latest_step() if step is None else step
            if step is None:
                return None
            if template is not None:
                return self._mgr.restore(step, args=ocp.args.StandardRestore(template))
            return self._mgr.restore(step)
        steps = self.all_steps()
        if not steps:
            return None
        step = steps[-1] if step is None else step
        z = np.load(self.directory / f"step_{step}.npz")
        return _unflatten(dict(z))

    def latest_step(self) -> int | None:
        if self._mgr is not None:
            return self._mgr.latest_step()
        steps = self.all_steps()
        return steps[-1] if steps else None

    def all_steps(self) -> list[int]:
        if self._mgr is not None:
            return sorted(self._mgr.all_steps())
        return sorted(
            int(p.stem.split("_")[1]) for p in self.directory.glob("step_*.npz")
        )

    def close(self):
        if self._mgr is not None:
            self._mgr.close()


def _flatten(prefix: str, tree: Any) -> dict[str, np.ndarray]:
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(f"{prefix}{k}/", v))
    else:
        out[prefix.rstrip("/")] = np.asarray(tree)
    return out


def _unflatten(flat: dict[str, np.ndarray]) -> dict:
    out: dict = {}
    for k, v in flat.items():
        parts = k.split("/")
        d = out
        for p in parts[:-1]:
            d = d.setdefault(p, {})
        d[parts[-1]] = v
    return out
