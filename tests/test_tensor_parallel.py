"""Tensor parallelism over the ``model`` mesh axis (parallel/tp.py +
mesh.tensor_parallel_shardings): the joint cross-view attention sharded
over heads, Megatron projection shardings, loss parity with pure DP.

No reference counterpart — this is the SURVEY §2.4 "TPU-native mapping"
extension. Runs on the virtual 8-device CPU mesh from conftest."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec

from mvldm_tpu.config import OptimizerCfg
from mvldm_tpu.parallel.mesh import make_mesh, tensor_parallel_shardings
from mvldm_tpu.parallel.tp import (
    head_sharded_attention,
    set_model_mesh,
    use_head_sharding,
)
from mvldm_tpu.training.optim import build_lr_schedule, build_optimizer
from mvldm_tpu.training.trainer import TrainState, make_train_step

from test_engine import tiny_engine, make_batch  # fixtures
from test_training import sharded_bytes_fraction


@pytest.fixture(autouse=True)
def _clear_tp_context():
    yield
    set_model_mesh(None)


class TestHeadShardedAttention:
    def test_matches_unsharded(self):
        from mvldm_tpu.ops.attention import mha_reference

        mesh = make_mesh(num_data=4, num_model=2)
        rng = np.random.default_rng(0)
        q = jnp.asarray(rng.standard_normal((4, 4, 64, 16)), jnp.float32)
        k = jnp.asarray(rng.standard_normal((4, 4, 64, 16)), jnp.float32)
        v = jnp.asarray(rng.standard_normal((4, 4, 64, 16)), jnp.float32)
        bias = jnp.where(
            jnp.arange(64)[None, :] < 48, 0.0, -1e30
        ).astype(jnp.float32) * jnp.ones((4, 1))

        out = head_sharded_attention(mesh, q, k, v, bias=bias)
        ref = mha_reference(q, k, v, bias=bias)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=1e-5
        )
        out_nb = head_sharded_attention(mesh, q, k, v)
        ref_nb = mha_reference(q, k, v)
        np.testing.assert_allclose(
            np.asarray(out_nb), np.asarray(ref_nb), atol=1e-5
        )

    def test_use_head_sharding_gate(self):
        mesh = make_mesh(num_data=4, num_model=2)
        assert use_head_sharding((4, 4, 64, 16), mesh)
        assert not use_head_sharding((3, 4, 64, 16), mesh)  # b % data != 0
        assert not use_head_sharding((4, 3, 64, 16), mesh)  # h % model != 0
        assert not use_head_sharding((4, 4, 64, 16), None)


class TestTensorParallelShardings:
    def test_attn1_kernels_sharded(self, tiny_engine):
        engine, unet_params, vae_params = tiny_engine
        mesh = make_mesh(num_data=4, num_model=2)
        shardings = tensor_parallel_shardings(mesh, unet_params)

        flat = jax.tree_util.tree_flatten_with_path(shardings)[0]
        model_specs = {
            "/".join(getattr(p, "key", str(p)) for p in path): s.spec
            for path, s in flat
            if any(ax == "model" for ax in s.spec if ax is not None)
        }
        assert model_specs, "no leaves sharded over the model axis"
        for path, spec in model_specs.items():
            assert "cross_view" in path and "attn1" in path, path
            if "to_out" in path:
                assert spec == PartitionSpec("model", None), (path, spec)
            else:
                assert spec == PartitionSpec(None, "model"), (path, spec)


class TestDataModelParity:
    @pytest.mark.slow
    def test_loss_matches_dp(self, tiny_engine):
        """One train step on a (4 data, 2 model) mesh must produce the same
        loss and updated params as the (8, 1) pure-DP step, with attention
        weights actually distributed over the model axis."""
        engine, unet_params, vae_params = tiny_engine
        opt_cfg = OptimizerCfg(name="AdamW", lr=1e-4, scale_lr=False)
        tx = build_optimizer(opt_cfg, build_lr_schedule(1e-4, None), 0.1)

        def fresh_state():
            return TrainState(
                params=unet_params,
                opt_state=tx.init(unet_params),
                ema_params=None,
                step=jnp.asarray(0, jnp.int32),
            )

        batch = make_batch(jax.random.PRNGKey(0), b=8)
        rng = jax.random.PRNGKey(1)

        mesh_dp = make_mesh(num_data=8)
        step_dp = make_train_step(
            engine, tx, vae_params, num_context_views=2, mesh=mesh_dp,
            donate=False,
        )
        dp_state, dp_metrics = step_dp(fresh_state(), batch, rng)

        mesh_tp = make_mesh(num_data=4, num_model=2)
        step_tp = make_train_step(
            engine, tx, vae_params, num_context_views=2, mesh=mesh_tp,
            donate=False, shard_model_axis=True, example_params=unet_params,
        )
        tp_state, tp_metrics = step_tp(fresh_state(), batch, rng)

        np.testing.assert_allclose(
            float(tp_metrics["loss/diffusion"]),
            float(dp_metrics["loss/diffusion"]),
            rtol=1e-5,
        )
        for a, b_ in zip(
            jax.tree_util.tree_leaves(dp_state.params),
            jax.tree_util.tree_leaves(tp_state.params),
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b_), atol=1e-5
            )

        # The attn1 projection weights are genuinely distributed: their
        # addressable shards are smaller than the global arrays.
        flat = jax.tree_util.tree_flatten_with_path(tp_state.params)[0]
        attn1 = {
            "/".join(getattr(p, "key", str(p)) for p in path): leaf
            for path, leaf in flat
            if "cross_view" in "/".join(getattr(p, "key", str(p))
                                        for p in path)
            and "attn1" in "/".join(getattr(p, "key", str(p)) for p in path)
            and leaf.ndim == 2
        }
        assert attn1
        frac = sharded_bytes_fraction(attn1)
        assert frac > 0.9, f"attn1 weights not distributed: {frac:.2%}"
