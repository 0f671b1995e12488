"""Exercise the wandb:// resolution and Logger paths with a stubbed wandb
module (the package is not in this image — reference ``src/misc/
wandb_tools.py:10-62`` — so without the stub this code would be dead in CI).
"""

from __future__ import annotations

import json
import sys
import types
from pathlib import Path

import numpy as np
import pytest

from mvldm_tpu.utils import wandb_tools


class _FakeArtifact:
    def __init__(self, version: str, type_: str = "model",
                 ckpt_name: str = "model.ckpt"):
        self.version = version
        self.type = type_
        self._ckpt_name = ckpt_name
        self.downloaded_to = None

    def download(self, root: str):
        self.downloaded_to = Path(root)
        self.downloaded_to.mkdir(parents=True, exist_ok=True)
        (self.downloaded_to / self._ckpt_name).write_bytes(b"ckpt")


class _FakeRun:
    def __init__(self, artifacts):
        self._artifacts = artifacts

    def logged_artifacts(self):
        return list(self._artifacts)


def _install_fake_wandb(monkeypatch, artifacts, logged=None):
    mod = types.ModuleType("wandb")
    run = _FakeRun(artifacts)

    class _Api:
        def __init__(self):
            self.requested = []

        def run(self, run_id):
            self.requested.append(run_id)
            mod._last_requested = run_id
            return run

    mod.Api = _Api
    mod._last_requested = None
    if logged is not None:
        mod.init = lambda **kw: logged.setdefault("init", kw)
        mod.log = lambda values, step=None: logged.setdefault(
            "log", []
        ).append((step, values))
        mod.Image = lambda arr: ("image", np.asarray(arr).shape)
    monkeypatch.setitem(sys.modules, "wandb", mod)
    return mod


class TestVersionToInt:
    def test_parses(self):
        assert wandb_tools.version_to_int(_FakeArtifact("v12")) == 12
        assert wandb_tools.version_to_int(_FakeArtifact("v0")) == 0


class TestUpdateCheckpointPath:
    def test_none_passthrough(self):
        assert wandb_tools.update_checkpoint_path(None, {}) is None

    def test_plain_path_passthrough(self):
        out = wandb_tools.update_checkpoint_path("checkpoints/last.ckpt", {})
        assert out == Path("checkpoints/last.ckpt")

    def test_wandb_ref_without_package_raises(self, monkeypatch):
        monkeypatch.delitem(sys.modules, "wandb", raising=False)
        import builtins

        real_import = builtins.__import__

        def block_wandb(name, *a, **kw):
            if name == "wandb":
                raise ImportError("no wandb")
            return real_import(name, *a, **kw)

        monkeypatch.setattr(builtins, "__import__", block_wandb)
        with pytest.raises(RuntimeError, match="wandb"):
            wandb_tools.update_checkpoint_path("wandb://abc123", {})

    def test_resolves_latest_version(self, monkeypatch, tmp_path):
        monkeypatch.chdir(tmp_path)
        arts = [
            _FakeArtifact("v1"),
            _FakeArtifact("v3"),  # latest model artifact wins
            _FakeArtifact("v9", type_="dataset"),  # ignored: wrong type
            _FakeArtifact("v2"),
        ]
        mod = _install_fake_wandb(monkeypatch, arts)
        out = wandb_tools.update_checkpoint_path(
            "wandb://abc123", {"project": "mvdiff", "entity": "me"}
        )
        assert mod._last_requested == "me/mvdiff/abc123"
        assert arts[1].downloaded_to is not None
        assert out.name == "model.ckpt"
        assert out.exists()

    def test_resolves_pinned_version(self, monkeypatch, tmp_path):
        monkeypatch.chdir(tmp_path)
        arts = [_FakeArtifact("v1"), _FakeArtifact("v3")]
        _install_fake_wandb(monkeypatch, arts)
        out = wandb_tools.update_checkpoint_path("wandb://abc123:v1", {})
        assert arts[0].downloaded_to is not None
        assert arts[1].downloaded_to is None
        assert out.exists()

    def test_no_entity_strips_leading_slash(self, monkeypatch, tmp_path):
        monkeypatch.chdir(tmp_path)
        mod = _install_fake_wandb(monkeypatch, [_FakeArtifact("v0")])
        wandb_tools.update_checkpoint_path("wandb://r1", {"project": "p"})
        assert mod._last_requested == "p/r1"

    def test_missing_model_artifact_raises(self, monkeypatch, tmp_path):
        monkeypatch.chdir(tmp_path)
        _install_fake_wandb(
            monkeypatch, [_FakeArtifact("v9", type_="dataset")]
        )
        with pytest.raises(ValueError, match="No model artifact"):
            wandb_tools.update_checkpoint_path("wandb://r1", {})


class TestLogger:
    def test_local_fallback(self, tmp_path, monkeypatch):
        monkeypatch.delitem(sys.modules, "wandb", raising=False)
        lg = wandb_tools.Logger({"activated": False}, tmp_path)
        lg.log_scalars(3, {"loss": 0.5})
        lg.log_image("val/sample", np.zeros((8, 8, 3), np.float32), 3)
        rows = [
            json.loads(l)
            for l in (tmp_path / "metrics.jsonl").read_text().splitlines()
        ]
        assert rows == [{"step": 3, "loss": 0.5}]
        assert (tmp_path / "val_sample_0000003.png").exists()

    def test_wandb_active(self, tmp_path, monkeypatch):
        logged: dict = {}
        _install_fake_wandb(monkeypatch, [], logged=logged)
        lg = wandb_tools.Logger(
            {"activated": True, "project": "p", "tags": ["t"]}, tmp_path
        )
        assert lg.use_wandb
        assert logged["init"]["project"] == "p"
        lg.log_scalars(1, {"loss": 1.0})
        lg.log_image("k", np.zeros((4, 4, 3), np.float32), 2)
        steps = [s for s, _ in logged["log"]]
        assert steps == [1, 2]
        # No local files were written on the wandb path.
        assert not list(tmp_path.glob("*.jsonl"))
