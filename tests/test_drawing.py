import jax
import jax.numpy as jnp
import numpy as np

from mvldm_tpu.evaluation.co3d_evaluation_index_generator import (
    CO3DEvaluationIndexGenerator,
    CO3DEvaluationIndexGeneratorCfg,
)
from mvldm_tpu.visualization.drawing import render_lines, render_points


class TestDrawing:
    def test_render_lines_marks_pixels(self):
        img = jnp.ones((64, 64, 3))
        out = render_lines(
            img,
            jnp.asarray([[0.1, 0.5]]),
            jnp.asarray([[0.9, 0.5]]),
            jnp.asarray([1.0, 0.0, 0.0]),
            width=0.02,
        )
        mid = np.asarray(out[32, 32])
        np.testing.assert_allclose(mid, [1.0, 0.0, 0.0], atol=0.05)
        corner = np.asarray(out[2, 2])
        np.testing.assert_allclose(corner, [1.0, 1.0, 1.0], atol=1e-6)

    def test_render_points(self):
        img = jnp.zeros((32, 32, 3))
        out = render_points(
            img, jnp.asarray([[0.5, 0.5]]), jnp.asarray([0.0, 1.0, 0.0]),
            radius=0.1,
        )
        np.testing.assert_allclose(np.asarray(out[16, 16]), [0, 1, 0], atol=0.05)

    def test_differentiable(self):
        img = jnp.zeros((16, 16, 3))

        def loss(start):
            out = render_lines(
                img, start, jnp.asarray([[0.9, 0.5]]),
                jnp.asarray([1.0, 1.0, 1.0]), width=0.05,
            )
            return jnp.sum(out)

        g = jax.grad(loss)(jnp.asarray([[0.1, 0.5]]))
        assert np.isfinite(np.asarray(g)).all()
        assert np.any(np.asarray(g) != 0)


class TestCO3DIndexGenerator:
    def test_intra_context(self):
        gen = CO3DEvaluationIndexGenerator(
            CO3DEvaluationIndexGeneratorCfg(
                num_context_pairs_per_scene=3,
                num_target_views=2,
                min_context_distance=5,
                max_context_distance=10,
                seed=0,
            )
        )
        views = gen.process_scene("sceneX", 100)
        assert len(views) >= 1
        for entry in views:
            left, right = entry.context
            assert 0 <= left < 100 and 0 <= right < 100
            assert len(entry.target) == 2

    def test_save_index(self, tmp_path):
        gen = CO3DEvaluationIndexGenerator(
            CO3DEvaluationIndexGeneratorCfg(output_path=tmp_path, seed=1)
        )
        gen.process_scene("s", 80)
        gen.save_index()
        assert (tmp_path / "evaluation_index.json").exists()
