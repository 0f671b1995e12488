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

from ..parallel.distributed import is_main_process, sync_processes


class CheckpointManager:
    """Async saves: ``StandardCheckpointer`` is an ``AsyncCheckpointer``, so
    ``save()`` returns as soon as the device->host copy completes and the
    multi-GB serialization overlaps the next ~1000 train steps instead of
    stalling them. The ``last.json`` pointer and top-k pruning for a step
    are FINALIZED only after its write commits — on the next ``save()`` or
    an explicit ``flush()`` — so a crash mid-write can never leave
    ``last.json`` pointing at a torn checkpoint (orbax writes the step dir
    atomically via a tmp dir + rename; ``latest_step`` additionally falls
    back past the pointer if the dir is gone).

    Multi-process: ``save``/``restore``/``flush`` are COLLECTIVE — every
    process calls them with the (globally sharded) state, orbax writes each
    process's addressable shards, and only rank 0 touches the shared
    filesystem metadata (pre-delete, ``last.json``, pruning) with barriers
    ordering the rmtree before the collective write."""

    def __init__(self, directory: Path, save_top_k: int = 1):
        self.directory = Path(directory)
        self.directory.mkdir(parents=True, exist_ok=True)
        self.save_top_k = save_top_k
        self._ckpt = ocp.StandardCheckpointer()
        self._pending: Optional[int] = None

    def _step_dir(self, step: int) -> Path:
        return self.directory / f"step_{step:09d}"

    def save(self, step: int, state: Dict[str, Any]) -> Path:
        path = self._step_dir(step)
        self.flush()  # previous write committed + finalized
        if is_main_process() and path.exists():
            shutil.rmtree(path)
        sync_processes(f"ckpt_pre_save_{step}")
        self._ckpt.save(path.absolute(), state)
        self._pending = step
        return path

    def flush(self) -> None:
        """Block until the in-flight save (if any) commits, then publish its
        ``last.json`` pointer and prune. Call at end of training / before
        restore. Collective: the wait runs on every process; the pointer
        write and pruning run once."""
        self._ckpt.wait_until_finished()
        if self._pending is None:
            return
        if is_main_process():
            (self.directory / "last.json").write_text(
                json.dumps({"step": self._pending})
            )
            self._prune()
        self._pending = None
        sync_processes("ckpt_flush")

    def _prune(self) -> None:
        steps = sorted(self.all_steps())
        # Keep the newest save_top_k (reference keeps top-1 + last; here
        # newest == last so a single retention list suffices).
        for step in steps[: -self.save_top_k]:
            shutil.rmtree(self._step_dir(step), ignore_errors=True)

    def all_steps(self):
        # A crash mid-write leaves an orbax tmp dir (step_X.orbax-checkpoint-
        # tmp-...) that matches the glob; skip anything whose suffix is not a
        # bare step number so resume never trips over a torn checkpoint.
        steps = []
        for p in self.directory.glob("step_*"):
            if not p.is_dir():
                continue
            suffix = p.name.split("_", 1)[1]
            if suffix.isdigit():
                steps.append(int(suffix))
        return steps

    def latest_step(self) -> Optional[int]:
        """Newest fully-committed step. Orbax renames the step dir into
        place atomically only after the write completes (and ``all_steps``
        filters tmp dirs), so every named dir is durable — a crash between
        a commit and its ``flush()`` leaves ``last.json`` stale, and the
        directory scan, not the pointer, is authoritative."""
        self.flush()  # an in-flight save from this process counts
        steps = self.all_steps()
        if steps:
            return max(steps)
        last = self.directory / "last.json"  # vestigial fallback
        if last.exists():
            step = json.loads(last.read_text())["step"]
            if self._step_dir(step).exists():
                return step
        return None

    def restore(self, step: int, target: Dict[str, Any]) -> Dict[str, Any]:
        self.flush()
        return self._ckpt.restore(self._step_dir(step).absolute(), target=target)

    def restore_partial(self, step: int, target: Dict[str, Any]) -> Dict[str, Any]:
        """Restore only the keys present in ``target`` from a checkpoint that
        holds a larger tree (e.g. the params/ema_params subtree of a full
        TrainState save) — eval loads weights without materializing optimizer
        moments."""
        self.flush()
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
