"""The checkpoint-parity harness (scripts/verify_parity.py): smoke mode
dumps a fixture; fixture mode diffs against it (self-comparison -> exact
PASS). Real-checkpoint use needs the released torch ckpt (unavailable
here); the harness itself is exercised end to end with init weights."""

import numpy as np
import pytest

from mvldm_tpu.scripts import verify_parity

pytestmark = pytest.mark.slow  # flagship-shaped compiles are multi-minute


class TestVerifyParity:
    def test_smoke_then_self_fixture_pass(self, tmp_path, capsys):
        out = tmp_path / "parity"
        common = [
            "+experiment=tiny",
            "steps=2",
            f"out={out}",
            "dataset.image_shape=[32,32]",
            "model.scheduler.num_inference_steps=2",
        ]
        verify_parity.main(common)
        fixture = out / "jax_fixture.npz"
        assert fixture.exists()
        fx = np.load(fixture)
        assert fx["latents_final"].shape == (1, 3, 4, 4, 4)
        assert np.isfinite(fx["latents_final"]).all()

        verify_parity.main([*common, f"fixtures={fixture}"])
        captured = capsys.readouterr().out
        assert "Parity PASS" in captured
        assert (out / "jax_outputs.npz").exists()
