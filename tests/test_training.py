import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mvldm_tpu.config import LRSchedulerCfg, OptimizerCfg
from mvldm_tpu.diffusion.engine import Batch
from mvldm_tpu.parallel.mesh import make_mesh
from mvldm_tpu.training.checkpoint import CheckpointManager
from mvldm_tpu.training.optim import build_lr_schedule, build_optimizer, ema_update
from mvldm_tpu.training.trainer import TrainState, batch_from_arrays, make_train_step

from test_engine import tiny_engine, make_batch  # fixtures


def sharded_bytes_fraction(tree) -> float:
    """Fraction of the tree's bytes whose addressable shard is strictly
    smaller than the global array — i.e. memory actually distributed, not
    merely annotated. Scalar/empty leaves count as unsharded."""
    total = 0
    sharded = 0
    for leaf in jax.tree_util.tree_leaves(tree):
        if not hasattr(leaf, "addressable_shards") or leaf.size == 0:
            continue
        nbytes = leaf.size * leaf.dtype.itemsize
        total += nbytes
        shard_shape = leaf.addressable_shards[0].data.shape
        if np.prod(shard_shape) < leaf.size:
            sharded += nbytes
    return sharded / total if total else 0.0


class TestLRSchedule:
    def test_linear_lr_torch_semantics(self):
        cfg = LRSchedulerCfg(
            name="LinearLR", kwargs={"start_factor": 5e-4, "total_iters": 200}
        )
        sched = build_lr_schedule(2e-5, cfg)
        assert float(sched(0)) == pytest.approx(2e-5 * 5e-4)
        assert float(sched(100)) == pytest.approx(2e-5 * (5e-4 + (1 - 5e-4) / 2))
        assert float(sched(200)) == pytest.approx(2e-5)
        assert float(sched(10_000)) == pytest.approx(2e-5)


class TestEMA:
    def test_decay(self):
        ema = {"w": jnp.ones((3,))}
        params = {"w": jnp.zeros((3,))}
        out = ema_update(ema, params, decay=0.995)
        np.testing.assert_allclose(np.asarray(out["w"]), 0.995, rtol=1e-6)


class TestTrainStep:
    def _setup(self, tiny_engine, use_ema=False, accum=1):
        engine, unet_params, vae_params = tiny_engine
        opt_cfg = OptimizerCfg(name="AdamW", lr=1e-4, scale_lr=False)
        tx = build_optimizer(
            opt_cfg,
            build_lr_schedule(1e-4, None),
            gradient_clip_val=0.1,
            accumulate_grad_batches=accum,
        )
        step_fn = make_train_step(
            engine, tx, vae_params, num_context_views=2, donate=False
        )
        state = TrainState(
            params=unet_params,
            opt_state=tx.init(unet_params),
            ema_params=(
                jax.tree_util.tree_map(jnp.copy, unet_params) if use_ema else None
            ),
            step=jnp.asarray(0, jnp.int32),
        )
        return engine, step_fn, state

    @pytest.mark.slow
    def test_step_updates_params(self, tiny_engine):
        engine, step_fn, state = self._setup(tiny_engine)
        batch = make_batch(jax.random.PRNGKey(0))
        new_state, metrics = step_fn(state, batch, jax.random.PRNGKey(1))
        assert int(new_state.step) == 1
        assert np.isfinite(float(metrics["loss/diffusion"]))
        assert np.isfinite(float(metrics["grad_norm"]))
        # At least one parameter changed.
        changed = jax.tree_util.tree_map(
            lambda a, b: bool(jnp.any(a != b)), state.params, new_state.params
        )
        assert any(jax.tree_util.tree_leaves(changed))

    @pytest.mark.slow
    def test_ema_tracks_params(self, tiny_engine):
        engine, step_fn, state = self._setup(tiny_engine, use_ema=True)
        batch = make_batch(jax.random.PRNGKey(0))
        new_state, _ = step_fn(state, batch, jax.random.PRNGKey(1))
        # EMA must differ from both old ema (moved) and new params (lagging).
        diff_new = jax.tree_util.tree_leaves(
            jax.tree_util.tree_map(
                lambda e, p: bool(jnp.any(e != p)), new_state.ema_params,
                new_state.params,
            )
        )
        assert any(diff_new)

    @pytest.mark.slow
    def test_grad_accumulation_delays_update(self, tiny_engine):
        engine, step_fn, state = self._setup(tiny_engine, accum=2)
        batch = make_batch(jax.random.PRNGKey(0))
        s1, _ = step_fn(state, batch, jax.random.PRNGKey(1))
        # After one micro-step with accum=2, params must be unchanged.
        same = jax.tree_util.tree_map(
            lambda a, b: bool(jnp.all(a == b)), state.params, s1.params
        )
        assert all(jax.tree_util.tree_leaves(same))
        s2, _ = step_fn(s1, batch, jax.random.PRNGKey(2))
        changed = jax.tree_util.tree_map(
            lambda a, b: bool(jnp.any(a != b)), state.params, s2.params
        )
        assert any(jax.tree_util.tree_leaves(changed))


class TestShardedTrainStep:
    @pytest.mark.slow
    def test_8_device_data_parallel(self, tiny_engine):
        """One sharded step over the virtual 8-device mesh — the DDP
        equivalent (gradient psum via XLA)."""
        engine, unet_params, vae_params = tiny_engine
        mesh = make_mesh(num_data=8)
        opt_cfg = OptimizerCfg(name="AdamW", lr=1e-4, scale_lr=False)
        tx = build_optimizer(opt_cfg, build_lr_schedule(1e-4, None), 0.1)
        step_fn = make_train_step(
            engine, tx, vae_params, num_context_views=2, mesh=mesh, donate=False
        )
        state = TrainState(
            params=unet_params,
            opt_state=tx.init(unet_params),
            ema_params=None,
            step=jnp.asarray(0, jnp.int32),
        )
        batch = make_batch(jax.random.PRNGKey(0), b=8)
        new_state, metrics = step_fn(state, batch, jax.random.PRNGKey(1))
        assert np.isfinite(float(metrics["loss/diffusion"]))
        assert int(new_state.step) == 1
        # The dispatch publishes its meshes SCOPED around the call: they
        # must not leak into later traces in the process (e.g. the
        # validation hook's single-device sampling jits).
        from mvldm_tpu.parallel import tp

        assert tp.get_active_mesh() is None
        assert tp.get_model_mesh() is None


class TestZero1Sharding:
    @pytest.mark.slow
    def test_opt_state_sharded_and_equivalent(self, tiny_engine):
        """ZeRO-1: optimizer moments sharded over the data axis; one step
        must match the fully-replicated step numerically."""
        from jax.sharding import PartitionSpec

        engine, unet_params, vae_params = tiny_engine
        mesh = make_mesh(num_data=8)
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

        step_repl = make_train_step(
            engine, tx, vae_params, num_context_views=2, mesh=mesh, donate=False
        )
        ref_state, ref_metrics = step_repl(fresh_state(), batch, rng)

        step_z1 = make_train_step(
            engine, tx, vae_params, num_context_views=2, mesh=mesh,
            donate=False, shard_optimizer_states=True,
            example_params=unet_params,
        )
        z1_state, z1_metrics = step_z1(fresh_state(), batch, rng)

        np.testing.assert_allclose(
            float(z1_metrics["loss/diffusion"]),
            float(ref_metrics["loss/diffusion"]),
            rtol=1e-5,
        )
        for a, b_ in zip(
            jax.tree_util.tree_leaves(ref_state.params),
            jax.tree_util.tree_leaves(z1_state.params),
        ):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=1e-5)

        # At least one optimizer-state leaf is actually sharded.
        specs = [
            getattr(l.sharding, "spec", PartitionSpec())
            for l in jax.tree_util.tree_leaves(z1_state.opt_state)
            if hasattr(l, "sharding")
        ]
        assert any(
            any(axis == "data" for axis in spec if axis is not None)
            for spec in specs
        ), f"no sharded opt leaves: {specs[:5]}"
        # Memory-level check: most optimizer-state BYTES live in addressable
        # shards strictly smaller than the global shape (a regression that
        # silently replicated moments would pass the loss check above but
        # fail this — the ZeRO-1 memory claim in BENCHMARKS.md).
        frac = sharded_bytes_fraction(z1_state.opt_state)
        assert frac > 0.9, f"only {frac:.2%} of opt-state bytes are sharded"


class TestFSDPSharding:
    @pytest.mark.slow
    def test_params_sharded_and_equivalent(self, tiny_engine):
        """FSDP (ZeRO-3 pattern): parameters AND optimizer moments sharded
        over the data axis; one step must match the replicated step. XLA
        derives the all-gather/reduce-scatter traffic from the shardings."""
        from jax.sharding import PartitionSpec

        engine, unet_params, vae_params = tiny_engine
        mesh = make_mesh(num_data=8)
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

        step_repl = make_train_step(
            engine, tx, vae_params, num_context_views=2, mesh=mesh, donate=False
        )
        ref_state, ref_metrics = step_repl(fresh_state(), batch, rng)

        step_fsdp = make_train_step(
            engine, tx, vae_params, num_context_views=2, mesh=mesh,
            donate=False, shard_optimizer_states=True, shard_params=True,
            example_params=unet_params,
        )
        f_state, f_metrics = step_fsdp(fresh_state(), batch, rng)

        np.testing.assert_allclose(
            float(f_metrics["loss/diffusion"]),
            float(ref_metrics["loss/diffusion"]),
            rtol=1e-5,
        )
        for a, b_ in zip(
            jax.tree_util.tree_leaves(ref_state.params),
            jax.tree_util.tree_leaves(f_state.params),
        ):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=1e-5)

        # Parameter leaves are actually distributed over the data axis.
        param_specs = [
            getattr(l.sharding, "spec", PartitionSpec())
            for l in jax.tree_util.tree_leaves(f_state.params)
            if hasattr(l, "sharding")
        ]
        assert any(
            any(axis == "data" for axis in spec if axis is not None)
            for spec in param_specs
        ), f"no sharded param leaves: {param_specs[:5]}"
        # Memory-level check: most parameter AND optimizer-state bytes have
        # addressable shards strictly smaller than the global shape (the
        # FSDP memory claim — loss parity alone would not catch silent
        # replication).
        pfrac = sharded_bytes_fraction(f_state.params)
        ofrac = sharded_bytes_fraction(f_state.opt_state)
        assert pfrac > 0.9, f"only {pfrac:.2%} of param bytes are sharded"
        assert ofrac > 0.9, f"only {ofrac:.2%} of opt-state bytes are sharded"


class TestCheckpoint:
    def test_roundtrip(self, tmp_path, tiny_engine):
        engine, unet_params, vae_params = tiny_engine
        mgr = CheckpointManager(tmp_path / "ckpts", save_top_k=2)
        state = {
            "params": jax.tree_util.tree_map(np.asarray, unet_params),
            "step": np.asarray(7),
        }
        mgr.save(7, state)
        assert mgr.latest_step() == 7
        restored = mgr.restore(7, state)
        np.testing.assert_array_equal(restored["step"], 7)
        a = jax.tree_util.tree_leaves(restored["params"])[0]
        b = jax.tree_util.tree_leaves(state["params"])[0]
        np.testing.assert_array_equal(a, b)

    def test_prune_keeps_top_k(self, tmp_path):
        mgr = CheckpointManager(tmp_path / "ckpts", save_top_k=1)
        for step in (1, 2, 3):
            mgr.save(step, {"x": np.asarray(step)})
        mgr.flush()  # commit + finalize the in-flight step-3 save
        assert mgr.all_steps() == [3]
        assert mgr.latest_step() == 3

    def test_stale_pointer_prefers_newer_committed_dir(self, tmp_path):
        """Crash between an async write's commit and its flush leaves
        last.json pointing one save back; resume must take the newest
        committed dir (the scan is authoritative), not lose up to
        checkpoint_every steps of work."""
        import json

        mgr = CheckpointManager(tmp_path / "ckpts", save_top_k=2)
        mgr.save(5, {"x": np.asarray(5)})
        mgr.flush()
        mgr.save(6, {"x": np.asarray(6)})
        mgr._ckpt.wait_until_finished()  # committed, but NOT finalized
        assert json.loads((tmp_path / "ckpts" / "last.json").read_text())[
            "step"
        ] == 5
        fresh = CheckpointManager(tmp_path / "ckpts")  # "new process"
        assert fresh.latest_step() == 6

    def test_torn_tmp_dir_does_not_break_resume(self, tmp_path):
        """A crash mid-write leaves an orbax tmp dir matching the step_*
        glob; all_steps/latest_step must skip it rather than crash on int
        parsing."""
        mgr = CheckpointManager(tmp_path / "ckpts")
        mgr.save(5, {"x": np.asarray(5)})
        mgr.flush()
        torn = tmp_path / "ckpts" / "step_000000006.orbax-checkpoint-tmp-123"
        torn.mkdir()
        assert mgr.all_steps() == [5]
        assert mgr.latest_step() == 5

    def test_async_save_defers_last_pointer(self, tmp_path):
        """Saves are async: the ``last.json`` pointer for a step must not be
        published until its write has committed (next save or flush), so a
        crash mid-write can never point auto-resume at a torn checkpoint."""
        import json

        mgr = CheckpointManager(tmp_path / "ckpts", save_top_k=2)
        last = tmp_path / "ckpts" / "last.json"
        mgr.save(1, {"x": np.asarray(1)})
        assert not last.exists()  # step-1 write not finalized yet
        mgr.save(2, {"x": np.asarray(2)})
        # Entering save(2) committed + finalized step 1.
        assert json.loads(last.read_text())["step"] == 1
        mgr.flush()
        assert json.loads(last.read_text())["step"] == 2
        restored = mgr.restore(2, {"x": np.asarray(0)})
        np.testing.assert_array_equal(restored["x"], 2)


class TestEMAWithAccumulation:
    @pytest.mark.slow
    def test_ema_frozen_between_applied_steps(self, tiny_engine):
        """With accumulate_grad_batches=2, the EMA must not decay on the
        non-applied micro-step (reference updates EMA once per optimizer
        step, diffusion_wrapper.py:152-154)."""
        opt_cfg = OptimizerCfg(name="AdamW", lr=1e-4, scale_lr=False)
        engine, unet_params, vae_params = tiny_engine
        tx = build_optimizer(
            opt_cfg, build_lr_schedule(1e-4, None),
            gradient_clip_val=0.1, accumulate_grad_batches=2,
        )
        step_fn = make_train_step(
            engine, tx, vae_params, num_context_views=2, donate=False
        )
        state = TrainState(
            params=unet_params,
            opt_state=tx.init(unet_params),
            ema_params=jax.tree_util.tree_map(jnp.copy, unet_params),
            step=jnp.asarray(0, jnp.int32),
        )
        batch = make_batch(jax.random.PRNGKey(0))
        s1, _ = step_fn(state, batch, jax.random.PRNGKey(1))
        unchanged = jax.tree_util.tree_map(
            lambda a, b: bool(jnp.all(a == b)), state.ema_params, s1.ema_params
        )
        assert all(jax.tree_util.tree_leaves(unchanged)), (
            "EMA moved on a non-applied accumulation micro-step"
        )
        s2, _ = step_fn(s1, batch, jax.random.PRNGKey(2))
        moved = jax.tree_util.tree_map(
            lambda a, b: bool(jnp.any(a != b)), s1.ema_params, s2.ema_params
        )
        assert any(jax.tree_util.tree_leaves(moved)), (
            "EMA did not move on the applied optimizer step"
        )
