"""Train / validate / test entry point.

CLI surface mirrors the reference (``src/main.py:34-149``):

    python -m mvldm_tpu.scripts.main +experiment=baseline mode=train \\
        dataset.root=<path> output_dir=outputs/run1

Modes: ``train`` (sharded train loop with auto-resume), ``val`` (one
validation sampling round, comparison grids written to disk), ``test``
(video sampling over the evaluation index, anchored/autoregressive, with
skip-existing idempotency and GIF/MP4 export — reference
``test_step:1057`` + ``on_test_end:1069``)."""

from __future__ import annotations

import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from ..builder import build_engine, load_pretrained
from ..config import RootCfg, compose, load_typed_root_config, set_cfg
from ..data.loader import DataModule
from ..data.view_samplers import StepTracker
from ..diffusion.video_sampling import SceneViews, VideoSampler
from ..parallel.mesh import make_mesh
from ..training.checkpoint import CheckpointManager
from ..training.optim import build_lr_schedule, build_optimizer
from ..training.trainer import Trainer, TrainState
from ..utils.image_io import load_image, save_gif, save_image, save_video
from ..visualization import add_label, hcat, vcat


def build_data_module(cfg: RootCfg, step_tracker: StepTracker) -> DataModule:
    return DataModule(
        cfg.dataset, cfg.dataset.view_sampler, cfg.data_loader, step_tracker
    )


def scene_views_from_batch(batch_np, role: str, i: int = 0) -> SceneViews:
    views = batch_np[role]
    return SceneViews(
        images=np.asarray(views["image"][i]),
        extrinsics=np.asarray(views["extrinsics"][i]),
        intrinsics=np.asarray(views["intrinsics"][i]),
        index=np.asarray(views["index"][i]),
    )


def run_train(cfg: RootCfg) -> None:
    rng = jax.random.PRNGKey(cfg.seed if cfg.seed is not None else 0)
    engine = build_engine(cfg)  # block-level remat via cfg.trainer.remat
    unet_params, vae_params = load_pretrained(cfg, engine, rng)

    step_tracker = StepTracker(cfg.train.step_offset)
    dm = build_data_module(cfg, step_tracker)

    base_lr = cfg.optimizer.lr
    if cfg.optimizer.scale_lr:
        # Effective-batch LR scaling (reference diffusion_wrapper.py:156-167).
        eff = (
            cfg.trainer.accumulate_grad_batches
            * jax.device_count()
            * cfg.data_loader.train.batch_size
        )
        base_lr = base_lr * eff
    tx = build_optimizer(
        cfg.optimizer,
        build_lr_schedule(base_lr, cfg.optimizer.scheduler),
        gradient_clip_val=cfg.trainer.gradient_clip_val,
        accumulate_grad_batches=cfg.trainer.accumulate_grad_batches,
    )
    # freeze.autoencoder is structural here (the VAE is never optimized and
    # its encode is stop-gradient'ed); freeze.denoiser zeroes all updates
    # (reference freeze() at diffusion_wrapper.py:133-134).
    if cfg.freeze.denoiser:
        import optax

        print("freeze.denoiser=true: denoiser updates disabled")
        tx = optax.set_to_zero()

    # strategy: "data_parallel" (DDP equivalent), "data_parallel_zero1"
    # (+ optimizer-state sharding over the data axis), "data_parallel_fsdp"
    # (+ parameter/EMA sharding, ZeRO-3 pattern), "data_model"
    # (+ tensor-parallel joint cross-view attention over a model axis of
    # trainer.num_model devices, parallel/tp.py), anything else = single
    # device.
    dp_strategies = (
        "data_parallel", "data_parallel_zero1", "data_parallel_fsdp",
        "data_model",
    )
    use_mesh = cfg.trainer.strategy in dp_strategies and jax.device_count() > 1
    use_model_axis = use_mesh and cfg.trainer.strategy == "data_model"
    mesh = (
        make_mesh(num_model=cfg.trainer.num_model if use_model_axis else 1)
        if use_mesh else None
    )
    use_fsdp = use_mesh and cfg.trainer.strategy == "data_parallel_fsdp"
    use_zero1 = use_fsdp or (
        use_mesh and cfg.trainer.strategy == "data_parallel_zero1"
    )
    run_dir = Path(cfg.output_dir)
    run_dir.mkdir(parents=True, exist_ok=True)

    val_hook = None
    if cfg.trainer.validate and cfg.trainer.val_check_interval:
        val_hook = make_val_hook(
            cfg, engine, vae_params, run_dir, jax.random.fold_in(rng, 2)
        )

    trainer = Trainer(
        engine,
        tx,
        dm,
        run_dir,
        vae_params=vae_params,
        max_steps=cfg.trainer.max_steps,
        num_context_views=cfg.dataset.view_sampler.num_context_views,
        checkpoint_every=cfg.checkpointing.every_n_train_steps,
        save_top_k=cfg.checkpointing.save_top_k,
        use_ema=cfg.model.ema,
        step_tracker=step_tracker,
        mesh=mesh,
        val_hook=val_hook,
        val_check_interval=cfg.trainer.val_check_interval,
        task_steps=cfg.trainer.task_steps,
        shard_optimizer_states=use_zero1,
        shard_params=use_fsdp,
        shard_model_axis=use_model_axis,
        example_params=(
            unet_params if (use_zero1 or use_model_axis) else None
        ),
    )
    state = trainer.init_state(unet_params)
    state = trainer.maybe_restore(state)
    trainer.fit(state, jax.random.fold_in(rng, 1))


def _render_val_batch(
    engine, unet_params, vae_params, batch_np, out_dir: Path, rng
) -> None:
    """Render one validation batch (reference ``validation_step:492-544``):
    camera frusta, context|GT|samples comparison grids, value histograms."""
    from ..visualization.validation_in_3d import render_cameras

    out_dir.mkdir(parents=True, exist_ok=True)
    cameras = hcat(*render_cameras(batch_np, 256))
    save_image(cameras, out_dir / "cameras.png")

    b = batch_np["context"]["image"].shape[0]
    all_samples = []
    all_targets = []
    for i in range(b):
        ctx = scene_views_from_batch(batch_np, "context", i)
        tgt = scene_views_from_batch(batch_np, "target", i)
        ctx1 = SceneViews(
            ctx.images[:1], ctx.extrinsics[:1], ctx.intrinsics[:1],
            ctx.index[:1],
        )
        extr = np.concatenate([ctx1.extrinsics, tgt.extrinsics], axis=0)
        intr = np.concatenate([ctx1.intrinsics, tgt.intrinsics], axis=0)
        out = engine.sample(
            unet_params,
            vae_params,
            jnp.asarray(ctx1.images)[None],
            jnp.asarray(extr)[None],
            jnp.asarray(intr)[None],
            num_target_views=len(tgt.index),
            rng=jax.random.fold_in(rng, i),
        )
        samples = np.asarray(out[0])
        grid = hcat(
            add_label(vcat(*list(ctx1.images)), "Context Views"),
            add_label(vcat(*list(tgt.images)), "Original Targets"),
            add_label(vcat(*list(samples)), "Sampled Targets"),
        )
        scene = batch_np["scene"][i]
        save_image(grid, out_dir / f"{scene}.png")
        print(f"Wrote {out_dir / f'{scene}.png'}")
        all_samples.append(samples)
        all_targets.append(tgt.images)

    # Value-distribution histograms (reference validation_step:534-544).
    from ..visualization.color_map import get_hist_image

    hist = hcat(
        get_hist_image(np.concatenate(all_targets), title="Target Distribution"),
        get_hist_image(np.concatenate(all_samples), title="Sampled Distribution"),
    )
    save_image(hist, out_dir / "distributions.png")


def run_val(cfg: RootCfg) -> None:
    """One validation sampling round (reference ``validation_step:492-544``):
    sample targets from one context view and write comparison grids."""
    rng = jax.random.PRNGKey(cfg.seed if cfg.seed is not None else 0)
    engine = build_engine(cfg)
    unet_params, vae_params = _load_eval_params(cfg, engine, rng)

    dm = build_data_module(cfg, StepTracker())
    out_dir = Path(cfg.output_dir) / "val"

    for batch_np in dm.val_dataloader():
        _render_val_batch(engine, unet_params, vae_params, batch_np, out_dir, rng)
        break  # one batch, like the reference's limited val


def make_val_hook(cfg: RootCfg, engine, vae_params, run_dir: Path, rng):
    """In-training validation callback (reference runs ``validation_step``
    every ``val_check_interval`` steps during fit,
    ``diffusion_wrapper.py:492-544``): sample one val batch with the current
    (EMA when configured) weights and write the grids under
    ``<run_dir>/val/step_<n>/``."""
    # A fresh DataModule so the val stream is independent of training's.
    dm = build_data_module(cfg, StepTracker())

    def val_hook(state, step: int) -> None:
        params = state.params
        if cfg.model.use_ema_sampling and state.ema_params is not None:
            params = state.ema_params
        for batch_np in dm.val_dataloader():
            _render_val_batch(
                engine,
                params,
                vae_params,
                batch_np,
                run_dir / "val" / f"step_{step}",
                jax.random.fold_in(rng, step),
            )
            break

    return val_hook


def _load_eval_params(cfg: RootCfg, engine, rng):
    """Params for val/test: torch .ckpt warm start or latest orbax state.
    With ``model.use_ema_sampling`` the EMA parameter tree is used when the
    checkpoint has one (reference ``sample():460-465``)."""
    unet_params, vae_params = load_pretrained(cfg, engine, rng)
    loaded_torch_ckpt = cfg.checkpointing.load is not None
    ckpt_dir = Path(cfg.output_dir) / "checkpoints"
    latest = None
    if ckpt_dir.exists():
        mgr = CheckpointManager(ckpt_dir)
        latest = mgr.latest_step()
        if latest is not None:
            print(f"Loading orbax checkpoint step {latest}")
            key = "params"
            target = {
                key: jax.tree_util.tree_map(np.asarray, unet_params),
            }
            if cfg.model.use_ema_sampling:
                target = {
                    "ema_params": jax.tree_util.tree_map(np.asarray, unet_params)
                }
                key = "ema_params"
            try:
                restored = mgr.restore_partial(latest, target)
            except Exception as e:
                # A failed restore silently emitting noise images looks like
                # a model bug; hard-fail unless explicitly overridden
                # (checkpointing.allow_init_weights=true).
                if not cfg.checkpointing.allow_init_weights:
                    raise RuntimeError(
                        f"Restoring checkpoint step {latest} from {ckpt_dir} "
                        f"failed: {e}. Pass "
                        "checkpointing.allow_init_weights=true to run with "
                        "freshly-initialized weights anyway."
                    ) from e
                print(f"Checkpoint restore failed ({e}); using init weights "
                      "(checkpointing.allow_init_weights=true)")
            else:
                unet_params = jax.tree_util.tree_map(jnp.asarray, restored[key])
                if key == "ema_params":
                    print("Using EMA weights for sampling")
    if latest is None and not loaded_torch_ckpt:
        print(
            "WARNING: no checkpoint found (no checkpointing.load and no orbax "
            f"state under {ckpt_dir}) — sampling with INIT weights; outputs "
            "will be noise."
        )
    return unet_params, vae_params


def _run_test_scene_batched(
    cfg: RootCfg, sampler, dm, output_dir: Path, rng, scene_batch: int, limit,
    mode: str,
) -> None:
    """Video sampling with ``cfg.test.scene_batch`` scenes stacked per
    dispatch and — when the batch divides the local device count — the scene
    axis sharded chip-per-scene over a data mesh
    (``VideoSampler.dispatch_anchored_many`` / ``_autoregressive_many``).
    Multi-chip evaluation scaling with zero cross-device communication; no
    reference counterpart (the reference distributes eval only
    process-per-GPU via Lightning DDP). Scenes bucket by target count so
    every dispatch is shape-uniform; ragged final buckets pad by repeating
    the last scene (padded rows dropped at export). At ``scene_batch=1``
    this IS the single-scene path: every scene flushes immediately and the
    pipeline is one scene deep (dispatch N, export N-1), matching the
    reference's sequential ``test_step`` -> save loop but overlapped."""
    n_dev = jax.local_device_count()
    mesh = (
        make_mesh(num_data=n_dev, devices=jax.local_devices())
        if n_dev > 1 and scene_batch % n_dev == 0
        else None
    )
    if mesh is not None:
        print(f"scene_batch={scene_batch} sharded over {n_dev} devices")

    def export_batch(entries, pending, size) -> None:
        results = VideoSampler.gather_many(pending, size)
        for (scene_dir, ctx), frames in zip(entries, results):
            for index, image in frames.items():
                save_image(image, scene_dir / "color" / f"{index:0>6}.png")
            for i, index in enumerate(ctx.index.tolist()):
                save_image(
                    ctx.images[i], scene_dir / "context" / f"{index:0>6}.png"
                )

    buckets: dict = {}  # target count -> [(scene_dir, ctx, tgt)]
    in_flight = None
    fold = 0

    dispatch_many = (
        sampler.dispatch_anchored_many
        if mode == "anchored"
        else sampler.dispatch_autoregressive_many
    )

    def flush(bucket) -> None:
        nonlocal in_flight, fold
        # Partial buckets (backlog relief, final drain) pad only to the next
        # power of two (rounded to the mesh's data-axis divisibility), not to
        # scene_batch: with many distinct target counts in flight (CO3D
        # without test.limit_frames) every flush is a small bucket, and
        # always padding to scene_batch would sample scene_batch-1 duplicate
        # scenes per dispatch in steady state. Power-of-two quantization
        # bounds the extra launch-shape compilations to log2(scene_batch).
        size = 1
        while size < len(bucket):
            size *= 2
        if mesh is not None:
            nd = mesh.shape["data"]
            size = ((size + nd - 1) // nd) * nd
        size = min(size, scene_batch)
        padded = bucket + [bucket[-1]] * (size - len(bucket))
        pending = dispatch_many(
            [(c, t) for _, c, t in padded],
            jax.random.fold_in(rng, fold),
            limit_frames=cfg.test.limit_frames,
            mesh=mesh,
        )
        fold += 1
        # One-batch-deep pipeline: PNG-export batch N-1 while N computes.
        if in_flight is not None:
            export_batch(*in_flight)
        in_flight = ([(sd, c) for sd, c, _ in bucket], pending, size)

    for n, batch_np in enumerate(dm.test_dataloader()):
        if limit is not None and n >= limit:
            break
        scene = batch_np["scene"][0]
        scene_dir = output_dir / scene
        if (scene_dir / "color").exists():
            print(f"Skipping {scene} (already sampled)")
            continue
        ctx = scene_views_from_batch(batch_np, "context")
        tgt = scene_views_from_batch(batch_np, "target")
        n_t = len(tgt.index)
        if cfg.test.limit_frames is not None:
            n_t = min(n_t, cfg.test.limit_frames)
        print(
            f"scene = {scene}; context = {ctx.index.tolist()}; "
            f"targets = {n_t} (scene batch)"
        )
        buckets.setdefault(n_t, []).append((scene_dir, ctx, tgt))
        if len(buckets[n_t]) == scene_batch:
            flush(buckets.pop(n_t))
        # Heterogeneous target counts (e.g. CO3D without test.limit_frames)
        # can open one bucket per n_t that never fills; bound the host
        # memory those undispatched full-resolution scenes pin by flushing
        # the fullest bucket (padded) once the backlog exceeds 4 batches.
        elif sum(len(b) for b in buckets.values()) >= 4 * scene_batch:
            fullest = max(buckets, key=lambda k: len(buckets[k]))
            flush(buckets.pop(fullest))
    for bucket in buckets.values():
        if bucket:
            flush(bucket)
    if in_flight is not None:
        export_batch(*in_flight)


def run_test(cfg: RootCfg) -> None:
    """Video sampling over the test set (reference ``test_step`` +
    ``on_test_end``)."""
    rng = jax.random.PRNGKey(cfg.seed if cfg.seed is not None else 0)
    engine = build_engine(cfg)
    unet_params, vae_params = _load_eval_params(cfg, engine, rng)

    dm = build_data_module(cfg, StepTracker())
    sampler = VideoSampler(
        engine,
        unet_params,
        vae_params,
        num_anchors_views=cfg.test.num_anchors_views,
        ar_latent_feedthrough=cfg.test.ar_latent_feedthrough,
    )
    test_dir = cfg.test.output_dir if str(cfg.test.output_dir) not in ("", ".") else None
    output_dir = Path(test_dir or cfg.output_dir) / "video"
    output_dir.mkdir(parents=True, exist_ok=True)
    mode = cfg.test.sampling_mode or "anchored"

    limit = cfg.trainer.limit_test_batches
    scene_batch = max(1, cfg.test.scene_batch)
    # scene_batch=1 degenerates to the one-scene-deep dispatch/export
    # pipeline (dispatch_*_many is documented bit-for-bit equal to the
    # single-scene dispatch at S=1), so both modes share one pipeline.
    _run_test_scene_batched(
        cfg, sampler, dm, output_dir, rng, scene_batch, limit, mode
    )

    # Export GIF/MP4 per scene (reference on_test_end:1069-1088).
    for scene_dir in sorted(output_dir.iterdir()):
        color = scene_dir / "color"
        if not color.is_dir():
            continue
        frames = [load_image(p) for p in sorted(color.glob("*.png"))]
        if not frames:
            continue
        save_gif(frames, scene_dir / "sampled.gif")
        save_video(frames, scene_dir / "sampled_fps_25.mp4", fps=25)
        save_video(frames, scene_dir / "sampled_fps_10.mp4", fps=10)


def main(argv=None) -> None:
    # Multi-host bring-up must precede first device use (no-op unless the
    # MVLDM_COORDINATOR / MVLDM_DISTRIBUTED env vars request it — see
    # parallel/distributed.py for the per-host launch recipe).
    from ..parallel.distributed import maybe_initialize_distributed

    if maybe_initialize_distributed():
        print(
            f"distributed: process {jax.process_index()}/"
            f"{jax.process_count()}, {jax.device_count()} devices total"
        )

    overrides = list(argv if argv is not None else sys.argv[1:])
    cfg_dict = compose(overrides)
    set_cfg(cfg_dict)
    cfg = load_typed_root_config(cfg_dict)

    if cfg.seed is not None:
        np.random.seed(cfg.seed)

    print(f"mode={cfg.mode} output_dir={cfg.output_dir}")
    if cfg.mode == "train":
        run_train(cfg)
    elif cfg.mode == "val":
        run_val(cfg)
    elif cfg.mode == "test":
        run_test(cfg)
    else:
        raise ValueError(f"Unknown mode: {cfg.mode}")


if __name__ == "__main__":
    main()
