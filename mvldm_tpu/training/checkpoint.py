"""Checkpoint save/restore.

Replaces Lightning's ``ModelCheckpoint`` + torch ``.ckpt`` loading (reference
``src/main.py:75-115``) with orbax: ``<run_dir>/checkpoints/<step>`` trees
holding {params, ema_params, opt_state, step}, a ``last`` pointer for
auto-resume, and ``save_top_k=1``-style pruning. Torch ``.ckpt`` files (the
released ``asimbluemoon/mvldm-1.0``) are loaded through the weight converter
(``utils/weight_convert.py``) for warm starts."""

from __future__ import annotations

import json
import shutil
from pathlib import Path
from typing import Any, Dict, Optional

import numpy as np
import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, directory: Path, save_top_k: int = 1):
        self.directory = Path(directory)
        self.directory.mkdir(parents=True, exist_ok=True)
        self.save_top_k = save_top_k
        self._ckpt = ocp.StandardCheckpointer()

    def _step_dir(self, step: int) -> Path:
        return self.directory / f"step_{step:09d}"

    def save(self, step: int, state: Dict[str, Any]) -> Path:
        path = self._step_dir(step)
        if path.exists():
            shutil.rmtree(path)
        self._ckpt.save(path.absolute(), state)
        self._ckpt.wait_until_finished()
        (self.directory / "last.json").write_text(json.dumps({"step": step}))
        self._prune()
        return path

    def _prune(self) -> None:
        steps = sorted(self.all_steps())
        # Keep the newest save_top_k (reference keeps top-1 + last; here
        # newest == last so a single retention list suffices).
        for step in steps[: -self.save_top_k]:
            shutil.rmtree(self._step_dir(step), ignore_errors=True)

    def all_steps(self):
        return [
            int(p.name.split("_")[1])
            for p in self.directory.glob("step_*")
            if p.is_dir()
        ]

    def latest_step(self) -> Optional[int]:
        last = self.directory / "last.json"
        if last.exists():
            step = json.loads(last.read_text())["step"]
            if self._step_dir(step).exists():
                return step
        steps = self.all_steps()
        return max(steps) if steps else None

    def restore(self, step: int, target: Dict[str, Any]) -> Dict[str, Any]:
        return self._ckpt.restore(self._step_dir(step).absolute(), target=target)

    def restore_partial(self, step: int, target: Dict[str, Any]) -> Dict[str, Any]:
        """Restore only the keys present in ``target`` from a checkpoint that
        holds a larger tree (e.g. the params/ema_params subtree of a full
        TrainState save) — eval loads weights without materializing optimizer
        moments."""
        ckpt = ocp.Checkpointer(ocp.PyTreeCheckpointHandler())
        return ckpt.restore(
            self._step_dir(step).absolute(),
            args=ocp.args.PyTreeRestore(item=target, partial_restore=True),
        )


def load_torch_checkpoint_params(path: Path) -> Dict[str, Dict]:
    """Load a reference Lightning ``.ckpt`` and convert to flax params
    ({"unet": ..., "vae": ...}); see ``utils/weight_convert.py``."""
    import torch

    from ..utils.weight_convert import convert_mvldm_checkpoint

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    state_dict = ckpt.get("state_dict", ckpt)
    return convert_mvldm_checkpoint(state_dict)
