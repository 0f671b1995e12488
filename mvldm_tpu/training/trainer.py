"""Training orchestration: sharded train step + host loop.

The TPU-native replacement for Lightning's ``Trainer.fit`` (reference
``src/main.py:119-139``): a jit-compiled, data-parallel train step over a
``jax.sharding.Mesh`` (gradient psum inserted by XLA — the DDP/NCCL
equivalent), an optax optimizer with clip/accumulation/EMA, orbax
checkpointing with auto-resume, a StepTracker feeding view-sampler warm-ups,
and JSONL/console logging instead of wandb (gated: wandb is not in the
image)."""

from __future__ import annotations

import json
import time
from dataclasses import dataclass
from pathlib import Path
from typing import Any, Callable, Dict, Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..data.loader import DataModule
from ..data.view_samplers import StepTracker
from ..diffusion.engine import Batch, DiffusionEngine
from ..parallel.distributed import is_main_process
from ..parallel.mesh import batch_sharding, make_mesh, replicated, zero1_shardings
from .checkpoint import CheckpointManager
from .optim import ema_update


@jax.tree_util.register_dataclass
@dataclass
class TrainState:
    params: Any
    opt_state: Any
    ema_params: Any  # None when EMA disabled
    step: jax.Array


def batch_from_arrays(context_img, target_img, context_extr, target_extr,
                      context_intr, target_intr,
                      context_latents=None, target_latents=None) -> Batch:
    """Concatenate context+target views into the engine's role-vector Batch.
    Pass ``*_latents`` (precomputed VAE posterior moments) instead of — or in
    addition to — images for the latent-cache training path."""
    images = None
    if context_img is not None:
        images = jnp.concatenate([context_img, target_img], axis=1)
    latents = None
    if context_latents is not None:
        latents = jnp.concatenate([context_latents, target_latents], axis=1)
    extr = jnp.concatenate([context_extr, target_extr], axis=1)
    intr = jnp.concatenate([context_intr, target_intr], axis=1)
    b, v_c = context_extr.shape[:2]
    v_t = target_extr.shape[1]
    is_target = jnp.concatenate(
        [jnp.zeros((b, v_c), bool), jnp.ones((b, v_t), bool)], axis=1
    )
    return Batch(images=images, extrinsics=extr, intrinsics=intr,
                 is_target=is_target, latent_moments=latents)


def make_train_step(
    engine: DiffusionEngine,
    tx: optax.GradientTransformation,
    vae_params,
    num_context_views: int,
    ema_decay: float = 0.995,
    mesh: Optional[Mesh] = None,
    donate: bool = True,
    shard_optimizer_states: bool = False,
    shard_params: bool = False,
    shard_model_axis: bool = False,
    example_params: Any = None,
) -> Callable:
    """Build the jitted train step. With a mesh, the batch is sharded over
    the ``data`` axis and state is replicated; XLA inserts the gradient
    all-reduce. ``shard_optimizer_states`` additionally distributes the
    optimizer moments over the data axis (ZeRO-1); ``shard_params`` also
    shards parameters/EMA (FSDP/ZeRO-3 — XLA derives the all-gather /
    reduce-scatter pattern from the shardings). ``shard_model_axis``
    tensor-parallelizes the joint cross-view attention over the mesh's
    ``model`` axis (Megatron param shardings + head-sharded attention, see
    ``parallel/tp.py``). Pass ``example_params`` (or abstract shapes) so
    the sharding trees can be derived."""

    def train_step(state: TrainState, batch: Batch, rng):
        def loss_fn(params):
            return engine.training_loss(
                params, vae_params, batch, rng, num_context_views
            )

        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        ema_params = state.ema_params
        if ema_params is not None:
            # Under optax.MultiSteps, params only change on every k-th
            # micro-step; decay the EMA only on those applied steps (the
            # reference updates EMA once per optimizer step,
            # diffusion_wrapper.py:152-154). mini_step wraps to 0 exactly
            # when the inner update was emitted.
            decayed = ema_update(ema_params, params, ema_decay)
            if hasattr(opt_state, "mini_step"):
                applied = opt_state.mini_step == 0
                ema_params = jax.tree_util.tree_map(
                    lambda e, d: jnp.where(applied, d, e), ema_params, decayed
                )
            else:
                ema_params = decayed
        new_state = TrainState(
            params=params,
            opt_state=opt_state,
            ema_params=ema_params,
            step=state.step + 1,
        )
        metrics = dict(metrics)
        metrics["grad_norm"] = optax.global_norm(grads)
        return new_state, metrics

    donate_argnums = (0,) if donate else ()
    if mesh is None:
        return jax.jit(train_step, donate_argnums=donate_argnums)

    repl = replicated(mesh)
    data = batch_sharding(mesh)
    # A single P("data") sharding broadcast over every Batch leaf (all are
    # batch-leading), so image-fed and latent-cache batches — whose optional
    # fields give different pytree structures — share one spec.
    batch_shardings = data

    opt_sharding: Any = repl
    if shard_optimizer_states or shard_params:
        assert example_params is not None, (
            "shard_optimizer_states/shard_params require example_params"
        )
        abstract_opt = jax.eval_shape(tx.init, example_params)
        opt_sharding = zero1_shardings(mesh, abstract_opt)

    param_sharding: Any = repl
    if shard_params:
        from ..parallel.mesh import fsdp_shardings

        param_sharding = fsdp_shardings(mesh, example_params)

    if shard_model_axis:
        assert example_params is not None, (
            "shard_model_axis requires example_params"
        )
        from ..parallel.mesh import tensor_parallel_shardings

        param_sharding = tensor_parallel_shardings(mesh, example_params)
        opt_sharding = tensor_parallel_shardings(
            mesh, jax.eval_shape(tx.init, example_params)
        )

    def state_shardings(ema: bool) -> TrainState:
        return TrainState(
            params=param_sharding,
            opt_state=opt_sharding,
            ema_params=param_sharding if ema else None,
            step=repl,
        )

    # Two pytree structures are possible for the state (with/without EMA);
    # build the sharding lazily per call-structure via a wrapper.
    jitted = {}

    from ..parallel.tp import trace_meshes

    def dispatch(state: TrainState, batch: Batch, rng):
        key = state.ema_params is not None
        if key not in jitted:
            sh = state_shardings(key)
            jitted[key] = jax.jit(
                train_step,
                in_shardings=(sh, batch_shardings, repl),
                out_shardings=(sh, repl),
                donate_argnums=donate_argnums,
            )
        # Publish the TP mesh (head sharding of the joint cross-view
        # attention, read at trace time in models/mv_attention.py) and the
        # active mesh (routes every Pallas-backed op through an explicit
        # shard_map — required for multi-device lowering of Mosaic kernels;
        # parallel/tp.run_manual) SCOPED around the call, so the step's
        # traces — first call and any retrace — see them but later traces
        # in the process (validation-hook sampling) do not.
        with trace_meshes(mesh, mesh if shard_model_axis else None):
            return jitted[key](state, batch, rng)

    # The Trainer needs the sharding plan outside the step (globalizing the
    # initial state on multi-host, building sharded restore targets).
    dispatch.state_shardings = state_shardings
    dispatch.batch_shardings = batch_shardings
    return dispatch


class Trainer:
    """Host loop (reference Lightning Trainer equivalent)."""

    def __init__(
        self,
        engine: DiffusionEngine,
        tx: optax.GradientTransformation,
        data_module: DataModule,
        run_dir: Path,
        *,
        vae_params,
        max_steps: int,
        num_context_views: int,
        checkpoint_every: int = 1000,
        save_top_k: int = 1,
        log_every: int = 50,
        use_ema: bool = False,
        step_tracker: Optional[StepTracker] = None,
        mesh: Optional[Mesh] = None,
        val_hook: Optional[Callable] = None,
        val_check_interval: Optional[int] = None,
        task_steps: Optional[int] = None,
        shard_optimizer_states: bool = False,
        shard_params: bool = False,
        shard_model_axis: bool = False,
        example_params: Any = None,
    ):
        self.engine = engine
        self.tx = tx
        self.data_module = data_module
        self.run_dir = Path(run_dir)
        self.vae_params = vae_params
        self.max_steps = max_steps
        self.num_context_views = num_context_views
        self.checkpoint_every = checkpoint_every
        self.log_every = log_every
        self.use_ema = use_ema
        self.step_tracker = step_tracker
        self.mesh = mesh
        self.val_hook = val_hook
        self.val_check_interval = val_check_interval
        self.task_steps = task_steps

        self.ckpt = CheckpointManager(self.run_dir / "checkpoints", save_top_k)
        self.metrics_log = self.run_dir / "metrics.jsonl"
        self._train_step = make_train_step(
            engine, tx, vae_params, num_context_views, mesh=mesh,
            shard_optimizer_states=shard_optimizer_states,
            shard_params=shard_params,
            shard_model_axis=shard_model_axis,
            example_params=example_params,
        )

    def init_state(self, unet_params, rng: Optional[jax.Array] = None) -> TrainState:
        opt_state = self.tx.init(unet_params)
        ema = jax.tree_util.tree_map(jnp.copy, unet_params) if self.use_ema else None
        return TrainState(
            params=unet_params,
            opt_state=opt_state,
            ema_params=ema,
            step=jnp.asarray(0, dtype=jnp.int32),
        )

    def maybe_restore(self, state: TrainState) -> TrainState:
        """Auto-resume from the last checkpoint (reference src/main.py:89-95).

        The restore target is abstract (shape/dtype/sharding), so a
        globally-sharded TrainState round-trips: each process restores its
        addressable shards, never materializing non-addressable arrays on
        the host."""
        latest = self.ckpt.latest_step()
        if latest is None:
            return state

        if is_main_process():
            print(f"Resuming from checkpoint at step {latest}")

        def abstract(x):
            if isinstance(x, jax.Array):
                return jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=x.sharding)
            return np.asarray(x)

        target = jax.tree_util.tree_map(abstract, state)
        return self.ckpt.restore(latest, target)

    def _log(self, step: int, metrics: Dict[str, Any]) -> None:
        if not is_main_process():
            return
        record = {"step": step, **{k: float(v) for k, v in metrics.items()}}
        with open(self.metrics_log, "a") as f:
            f.write(json.dumps(record) + "\n")

    def fit(self, state: TrainState, rng: jax.Array) -> TrainState:
        start_step = int(state.step)
        end_step = self.max_steps
        if self.task_steps is not None:
            end_step = min(end_step, start_step + self.task_steps)

        # Multi-host: lift the (identically-seeded, process-local) state onto
        # the global mesh before the first step — jit over a multi-process
        # mesh requires globally-addressable inputs. Built shard-by-shard
        # from the host value (every process holds the full tree), so no
        # cross-host device transfer is needed (unsupported on some
        # backends, e.g. CPU). Single-process keeps the lazy placement
        # (jit's in_shardings move the arrays).
        if self.mesh is not None and jax.process_count() > 1:
            shardings = self._train_step.state_shardings(
                state.ema_params is not None
            )

            def to_global(x, sharding):
                host = np.asarray(x)
                return jax.make_array_from_callback(
                    host.shape, sharding, lambda idx: host[idx]
                )

            def globalize(sub_sharding, subtree):
                return jax.tree_util.tree_map(
                    lambda x: to_global(x, sub_sharding), subtree
                )

            # shardings is a tree PREFIX of the state (a single sharding may
            # cover a whole subtree); map prefix-wise.
            state = jax.tree_util.tree_map(
                globalize, shardings, state,
                is_leaf=lambda n: isinstance(n, jax.sharding.Sharding),
            )

        loader = self.data_module.train_dataloader()
        try:
            return self._fit_loop(state, rng, loader, start_step, end_step)
        finally:
            # Commit + publish the final async checkpoint even on an
            # exception (first: it is the durable side effect), then retire
            # the prefetch + decode threads (the train loader is infinite;
            # the loop always exits via break). The teardown wait is
            # bounded: a decode thread wedged in blocking chunk I/O
            # (stalled NFS read) must not hold fit() hostage; daemon
            # threads die with the process.
            self.ckpt.flush()
            loader.close(timeout=60.0)

    def _fit_loop(
        self, state: TrainState, rng: jax.Array, loader, start_step: int,
        end_step: int,
    ) -> TrainState:
        t0 = time.perf_counter()
        window = 0
        # Optional profiler capture of a few warm steps (the reference has no
        # tracing at all, SURVEY.md §5; set MVLDM_PROFILE_DIR to enable).
        import os

        profile_dir = (
            os.environ.get("MVLDM_PROFILE_DIR") if is_main_process() else None
        )
        profile_window = (start_step + 10, start_step + 13)
        profiling = False

        # Multi-host: each process's loader yields its host-local stripe
        # (loader.py host striping); assemble the rows into one global
        # batch sharded over the data axis. Single-process: plain transfer.
        if self.mesh is not None and jax.process_count() > 1:
            data_sh = batch_sharding(self.mesh)

            def to_device(x):
                return jax.make_array_from_process_local_data(
                    data_sh, np.asarray(x)
                )
        else:
            to_device = jnp.asarray

        for batch_np in loader:
            step = int(state.step)
            if step >= end_step:
                break
            if profile_dir and step == profile_window[0] and not profiling:
                jax.profiler.start_trace(profile_dir)
                profiling = True
            if profile_dir and profiling and step == profile_window[1]:
                jax.profiler.stop_trace()
                profiling = False
                print(f"[profile] wrote train-step trace to {profile_dir}")
            if self.step_tracker is not None:
                self.step_tracker.set_step(step)

            ctx, tgt = batch_np["context"], batch_np["target"]
            has_latents = "latent_moments" in ctx
            batch = batch_from_arrays(
                to_device(ctx["image"]) if "image" in ctx else None,
                to_device(tgt["image"]) if "image" in tgt else None,
                to_device(ctx["extrinsics"]),
                to_device(tgt["extrinsics"]),
                to_device(ctx["intrinsics"]),
                to_device(tgt["intrinsics"]),
                to_device(ctx["latent_moments"]) if has_latents else None,
                to_device(tgt["latent_moments"]) if has_latents else None,
            )
            step_rng = jax.random.fold_in(rng, step)
            state, metrics = self._train_step(state, batch, step_rng)
            window += 1

            new_step = step + 1
            if new_step % self.log_every == 0 or new_step == end_step:
                jax.block_until_ready(metrics)
                dt = time.perf_counter() - t0
                sps = window / dt if dt > 0 else 0.0
                metrics = {k: float(v) for k, v in metrics.items()}
                metrics["steps_per_sec"] = sps
                self._log(new_step, metrics)
                if is_main_process():
                    print(
                        f"step {new_step}: loss={metrics['loss/diffusion']:.5f} "
                        f"({sps:.2f} it/s)"
                    )
                t0 = time.perf_counter()
                window = 0

            if new_step % self.checkpoint_every == 0 or new_step == end_step:
                # Collective: the (possibly globally sharded) state goes to
                # orbax directly — each process serializes its addressable
                # shards; the async save copies device->host before
                # returning, so the next step's buffer donation is safe.
                self.ckpt.save(new_step, state)

            if (
                self.val_hook is not None
                and self.val_check_interval
                and new_step % self.val_check_interval == 0
                # All processes enter (the multi-host replica fetch is
                # collective); only rank 0 renders/writes inside.
            ):
                self._run_val_hook(state, new_step)
        if profiling:
            jax.profiler.stop_trace()
        return state

    def _run_val_hook(self, state: TrainState, step: int) -> None:
        """Run the validation hook with process-local, addressable params.

        On multi-host the TrainState is globally sharded (ZeRO-1/FSDP leaves
        are non-addressable on any single process), so rank-0-local sampling
        on ``state.params`` would raise. Every process collectively reshards
        params (+EMA) to fully-replicated and pulls its now-complete local
        replica to host; only rank 0 then samples and writes — the reference's
        rank-zero ``validation_step`` semantics (``diffusion_wrapper.py:492``)
        made legal for a multi-controller runtime."""
        if self.mesh is not None and jax.process_count() > 1:
            repl = NamedSharding(self.mesh, P())

            def fetch(tree):
                if tree is None:
                    return None
                # Collective all-gather over the mesh (all processes call).
                tree = jax.jit(lambda p: p, out_shardings=repl)(tree)
                # Replicated arrays are addressable everywhere; hand the
                # hook ordinary process-local arrays so its jit traces as
                # plain local compute.
                return jax.tree_util.tree_map(
                    lambda x: jnp.asarray(np.asarray(x.addressable_data(0))),
                    tree,
                )

            state = TrainState(
                params=fetch(state.params),
                opt_state=None,  # hooks never touch optimizer moments
                ema_params=fetch(state.ema_params),
                step=jnp.asarray(step, jnp.int32),
            )
            if not is_main_process():
                return
        self.val_hook(state, step)
