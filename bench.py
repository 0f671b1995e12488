"""Headline benchmark: RE10K anchored video sampling throughput.

Measures generated frames/sec/chip for the BASELINE.json headline workload —
25-step DDIM anchored sampling of an 80-frame scene (4 anchors from one
context view, then fills in groups of 3 conditioned on [context, anchor]) —
on the flagship SD2.1-scale multi-view UNet in bf16, end to end: ray
encoding, batched-CFG UNet denoising under lax.scan, VAE decode.

The default mode measures the production evaluation pipeline
(``mode=test test.scene_batch=4``): 4 scenes stacked per dispatch,
next batch dispatched before the previous is gathered — the steady-state
configuration for sweeping the 1616-scene RE10K video protocol. The
per-scene-latency variant (one scene per dispatch, dispatch+gather
sequential — rounds 1-2's headline shape) is ``--single-scene``;
BENCHMARKS.md tracks both.

Weights are random (no checkpoint is downloadable in this environment);
throughput is weight-independent.

``vs_baseline``: the reference publishes no numbers (BASELINE.json
``published == {}``) and no GPU exists in this environment to measure it, so
the A100 reference throughput is estimated from a measurement of the
reference's own algorithm shape: running this framework with the reference's
exact execution structure (sequential per-group sampling, batch 1, two
sequential CFG forwards) measured 3.18 frames/s on one v5e chip. Scaling by
peak-FLOP ratio (A100 fp16 312 vs v5e bf16 197 TF/s = 1.58x) and derating
~40% for torch-eager per-step overhead at these small batch sizes gives an
A100 estimate of ~3.0 frames/s. The BASELINE target is 2x A100, i.e.
vs_baseline >= 2.0.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import jax

# Persistent compilation cache: repeat bench runs (and production sweeps)
# skip the multi-minute XLA compiles of the sampling graphs.
jax.config.update(
    "jax_compilation_cache_dir",
    str(Path(__file__).parent / ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

A100_REFERENCE_FPS = 3.0  # estimated; see module docstring


def _require_live_backend(deadline_s: float | None = None) -> None:
    """Fail loudly (rc 3) instead of hanging when the TPU tunnel is dead.

    The tunneled bench chip's client retries forever when the tunnel drops
    (observed mid-round-3 and mid-round-4): even ``jax.devices()`` never
    returns, so every bench entry point would hang indefinitely — including
    under the driver, which then records nothing. Probe with a tiny
    round-trip computation in a daemon thread under a deadline; a value
    cannot be transferred back unless the backend actually executed it.
    ``__graft_entry__.dryrun_multichip`` applies the same guard (there the
    fallback is a virtual-CPU relaunch; here there is nothing meaningful to
    measure without the chip, so abort with a clear message)."""
    import os
    import threading
    import traceback

    if deadline_s is None:
        # First-contact runtime bring-up on the tunneled chip is routinely
        # 2-10 minutes (measured round 5: the round-4 driver bench and a
        # whole first matrix pass died to a 150s deadline while the chip was
        # healthy). A real measurement beats a clean abort, so the default
        # waits out a long stall; override via BENCH_PROBE_DEADLINE_S.
        deadline_s = float(os.environ.get("BENCH_PROBE_DEADLINE_S", "900"))

    probed: list = []

    def _probe() -> None:
        try:
            probed.append(float(np.asarray(jnp.asarray(1.0) + 1.0)))
        except Exception as e:  # keep the real cause for the abort message
            probed.append(e)

    th = threading.Thread(target=_probe, daemon=True)
    th.start()
    th.join(timeout=deadline_s)
    if not probed or not isinstance(probed[0], float):
        if probed:
            # A raised exception is a diagnosable root cause (version skew,
            # misconfiguration) — distinct from a hang (dead tunnel).
            cause = f"backend probe raised: {probed[0]!r}"
            traceback.print_exception(probed[0], file=sys.stderr)
        else:
            cause = (
                f"backend probe timed out after {deadline_s:.0f}s "
                "(TPU tunnel unreachable; override deadline with "
                "BENCH_PROBE_DEADLINE_S)"
            )
        print(
            f"bench.py: {cause} — aborting instead of hanging; re-run when "
            "the chip is back",
            file=sys.stderr,
            flush=True,
        )
        # os._exit, not SystemExit: the stuck client thread's C++ teardown
        # aborts the interpreter during normal exit ("FATAL: exception not
        # rethrown"), clobbering the exit code. Skip teardown entirely.
        os._exit(3)

NUM_FRAMES = 80
NUM_STEPS = 25
IMAGE_HW = 256


def build_flagship(remat: bool = False, remat_policy: str | None = None):
    from mvldm_tpu.diffusion.engine import DiffusionEngine, ModelCfg, unet_in_channels
    from mvldm_tpu.diffusion.schedulers import DDIMScheduler, DDIMSchedulerKwargs
    from mvldm_tpu.models.mv_attention import SpatialTransformer3DCfg
    from mvldm_tpu.models.unet import MultiViewUNet, MultiViewUNetCfg
    from mvldm_tpu.models.vae import AutoencoderCfg, AutoencoderKL, AutoencoderKLCfg

    model_cfg = ModelCfg(
        denoiser=MultiViewUNetCfg(
            multi_view_attention=SpatialTransformer3DCfg(num_heads=8)
        ),
        autoencoder=AutoencoderCfg(kwargs=AutoencoderKLCfg()),
        use_cfg=True,
        cfg_scale=3.0,
        use_ray_encoding=False,  # live baseline: raw 3+3 ray channels
    )
    in_ch = unet_in_channels(model_cfg)
    assert in_ch == 11
    dtype = jnp.bfloat16
    unet = MultiViewUNet(model_cfg.denoiser, in_channels=in_ch, out_channels=4,
                         dtype=dtype, remat=remat, remat_policy=remat_policy)
    vae = AutoencoderKL(model_cfg.autoencoder.kwargs, dtype=dtype)
    scheduler = DDIMScheduler.create(
        DDIMSchedulerKwargs(clip_sample=False, prediction_type="epsilon"),
        num_inference_steps=NUM_STEPS,
    )
    engine = DiffusionEngine(model_cfg, unet, vae, scheduler, dtype=dtype)

    rng = jax.random.PRNGKey(0)
    x = jnp.zeros((1, 2, 32, 32, in_ch), dtype)
    t = jnp.zeros((1, 2), jnp.int32)
    unet_params = jax.jit(unet.init)(rng, x, t)["params"]
    img = jnp.zeros((1, IMAGE_HW, IMAGE_HW, 3), dtype)
    vae_params = jax.jit(vae.init)(rng, img, rng)["params"]
    return engine, unet_params, vae_params


def make_scene(n_frames: int):
    from mvldm_tpu.diffusion.video_sampling import SceneViews

    rng = np.random.default_rng(0)
    n = n_frames + 1
    images = rng.uniform(size=(n, IMAGE_HW, IMAGE_HW, 3)).astype(np.float32)
    extr = np.repeat(np.eye(4, dtype=np.float32)[None], n, axis=0)
    extr[:, 0, 3] = np.linspace(0, 2, n)
    extr[:, 2, 3] = np.linspace(0, 0.5, n)
    intr = np.repeat(np.eye(3, dtype=np.float32)[None], n, axis=0)
    intr[:, 0, 0] = 0.9
    intr[:, 1, 1] = 1.6
    intr[:, 0, 2] = intr[:, 1, 2] = 0.5
    ctx = SceneViews(images[:1], extr[:1], intr[:1], np.arange(1))
    tgt = SceneViews(images[1:], extr[1:], intr[1:], np.arange(1, n))
    return ctx, tgt


def make_train_batch(b: int, v: int = 5):
    """Synthetic flagship training batch (2 context + v-2 target views at
    256px, forward-translating cameras) — the single source of truth for
    the train-bench shape, shared with tools/bench_train_ablate.py so the
    headline bench and the ablation probes cannot desynchronize."""
    from mvldm_tpu.diffusion.engine import Batch

    rng = np.random.default_rng(0)
    images = jnp.asarray(
        rng.uniform(size=(b, v, IMAGE_HW, IMAGE_HW, 3)), jnp.float32
    )
    extr = np.repeat(
        np.repeat(np.eye(4, dtype=np.float32)[None], v, axis=0)[None], b,
        axis=0,
    )
    extr = jnp.asarray(extr).at[:, :, 0, 3].set(jnp.linspace(0, 1, v)[None])
    intr = np.repeat(
        np.repeat(np.eye(3, dtype=np.float32)[None], v, axis=0)[None], b,
        axis=0,
    )
    intr = jnp.asarray(intr).at[:, :, 0, 2].set(0.5).at[:, :, 1, 2].set(0.5)
    return Batch(
        images=images, extrinsics=extr, intrinsics=intr,
        is_target=jnp.asarray([[False, False] + [True] * (v - 2)] * b),
    )


def bench_train() -> None:
    """One labeled training-matrix cell: flagship single-chip training
    throughput (2 ctx + 3 tgt views at 256px; batch/moment-dtype/remat/
    input-path selected by the MVLDM_TRAIN_BENCH_* knobs below) reported as
    steps/s plus achieved model TF/s and MFU from the compiled step's own
    XLA flop count. Invoked by ``--train`` when any knob is set; the bare
    ``--train`` runs the default-vs-preset pairing instead
    (``bench_train_pair``)."""
    from mvldm_tpu.config import OptimizerCfg
    from mvldm_tpu.training.optim import build_lr_schedule, build_optimizer
    from mvldm_tpu.training.trainer import TrainState, make_train_step

    import os

    b = int(os.environ.get("MVLDM_TRAIN_BENCH_BATCH", "1"))
    # MVLDM_TRAIN_BENCH_LP=1: store BOTH AdamW moments in bf16 (stochastic-
    # rounding storage, training/optim.scale_by_adam_lp) — frees ~1.9 GB of
    # the 16 GB chip and trims the bandwidth-bound optimizer apply.
    lp = os.environ.get("MVLDM_TRAIN_BENCH_LP", "0") == "1"
    # MVLDM_TRAIN_BENCH_LATENTS=1: feed precomputed VAE posterior moments
    # (the dataset.latent_cache training path, data/latent_cache.py) instead
    # of pixels — drops the frozen-VAE encode from every step.
    latents = os.environ.get("MVLDM_TRAIN_BENCH_LATENTS", "0") == "1"
    # MVLDM_TRAIN_BENCH_NOREMAT=1: disable block rematerialization (no
    # recompute in the backward; only fits at small batch / latent inputs).
    noremat = os.environ.get("MVLDM_TRAIN_BENCH_NOREMAT", "0") == "1"
    # MVLDM_TRAIN_BENCH_REMAT_POLICY=dots: save matmul/conv outputs inside
    # remat blocks, recompute only elementwise work (trainer.remat_policy).
    remat_policy = os.environ.get("MVLDM_TRAIN_BENCH_REMAT_POLICY") or None
    # MVLDM_FLASH_BWD=0: force the XLA query-chunked attention backward
    # instead of the default Pallas flash backward (ops/attention.py) —
    # read at trace time by the attention op itself; surfaced here only
    # for honest labeling of non-default runs.
    xla_bwd = os.environ.get("MVLDM_FLASH_BWD", "1") != "1"
    # MVLDM_TRAIN_BENCH_F32=1: full-f32 AdamW moments — the parity-exact
    # baseline configuration (what the torch reference trains with).
    f32 = os.environ.get("MVLDM_TRAIN_BENCH_F32", "0") == "1"
    assert not (f32 and lp), "F32 and LP are mutually exclusive"
    kwargs = {} if f32 else {"mu_dtype": "bfloat16"}
    if lp:
        kwargs["nu_dtype"] = "bfloat16"
    engine, unet_params, vae_params = build_flagship(
        remat=not noremat, remat_policy=remat_policy
    )
    tx = build_optimizer(
        OptimizerCfg(name="AdamW", lr=2e-5, scale_lr=False, kwargs=kwargs),
        build_lr_schedule(2e-5, None),
        gradient_clip_val=0.1,
    )
    step_fn = make_train_step(engine, tx, vae_params, num_context_views=2)

    batch = make_train_batch(b)
    if latents:
        from mvldm_tpu.diffusion.engine import Batch
        from mvldm_tpu.models.vae import AutoencoderKL

        bb, v, h, w, _ = batch.images.shape
        flat = batch.images.reshape(bb * v, h, w, 3) * 2.0 - 1.0
        dist = engine.vae.apply(
            {"params": vae_params}, flat.astype(jnp.bfloat16),
            method=AutoencoderKL.encode,
        )
        moments = jnp.concatenate(
            [dist.mean, dist.logvar], axis=-1
        ).astype(jnp.float32)
        batch = Batch(
            images=None,
            extrinsics=batch.extrinsics,
            intrinsics=batch.intrinsics,
            is_target=batch.is_target,
            latent_moments=moments.reshape(bb, v, *moments.shape[1:]),
        )
    state = TrainState(
        params=unet_params,
        opt_state=tx.init(unet_params),
        ema_params=None,
        step=jnp.asarray(0, jnp.int32),
    )
    rng_step = jax.random.PRNGKey(1)

    # XLA's own flop count for the compiled train step (fwd + remat + bwd +
    # optimizer) for honest MFU accounting; not all backends report it.
    step_flops = None
    try:
        cost = step_fn.lower(state, batch, rng_step).compile().cost_analysis()
        if cost and cost.get("flops", 0) > 0:
            step_flops = float(cost["flops"])
    except Exception:
        pass

    # Warm-up/compile, then a timed dependent chain of steps. The state
    # threads through (serializing the chain), and the timing boundary is a
    # device->host SCALAR TRANSFER of the final step's loss — on the
    # tunneled bench chip block_until_ready acknowledges optimistically,
    # but a transferred value cannot exist before the chain has run.
    state, metrics = step_fn(state, batch, rng_step)
    float(np.asarray(metrics["loss/diffusion"]))
    n_steps = 8
    t0 = time.perf_counter()
    for i in range(n_steps):
        state, metrics = step_fn(state, batch, jax.random.fold_in(rng_step, i))
    float(np.asarray(metrics["loss/diffusion"]))
    dt = (time.perf_counter() - t0) / n_steps

    # Baseline: this framework's round-3 honest-boundary measurements of the
    # same configurations (BENCHMARKS.md training table) — tracked so
    # training throughput can no longer regress silently. The torch
    # reference cannot run this shape on a 16G chip at all (needs 40G).
    r3_steps_per_sec = {1: 4.18, 2: 3.67, 3: 3.05, 4: 0.58}
    record = {
        "metric": "train_steps_per_sec_per_chip",
        "value": round(1.0 / dt, 4),
        "unit": (
            f"steps/s (batch {b}, 5 views, 256px, "
            f"{'no remat' if noremat else 'block remat'}"
            f"{f' policy={remat_policy}' if remat_policy else ''}, "
            f"{'f32 moments' if f32 else 'bf16 mu+nu' if lp else 'bf16 mu'}, "
            "AdamW"
            f"{', latent-cache inputs' if latents else ''}"
            f"{', xla attn bwd' if xla_bwd else ''})"
        ),
    }
    if b in r3_steps_per_sec and not (
        latents or noremat or remat_policy or xla_bwd or lp or f32
    ):
        # Latent-cache runs skip the ratio: r3 measured the image path, and
        # mixing protocols in one ratio is how r3's Weak #5 happened.
        record["vs_baseline"] = round((1.0 / dt) / r3_steps_per_sec[b], 4)
    if step_flops is not None:
        achieved = step_flops / dt
        record["achieved_tflops"] = round(achieved / 1e12, 1)
        record["mfu_vs_197tf_peak"] = round(achieved / 197e12, 3)
    print(json.dumps(record))


_TRAIN_KNOBS = (
    "MVLDM_TRAIN_BENCH_BATCH", "MVLDM_TRAIN_BENCH_LP",
    "MVLDM_TRAIN_BENCH_LATENTS", "MVLDM_TRAIN_BENCH_NOREMAT",
    "MVLDM_TRAIN_BENCH_REMAT_POLICY", "MVLDM_TRAIN_BENCH_F32",
    "MVLDM_FLASH_BWD",
)


def bench_train_pair() -> None:
    """Bare ``python bench.py --train`` (no MVLDM_TRAIN_BENCH_* knobs):
    measure BOTH production-relevant configurations at batch 8 in one run —
    the parity-exact default (f32 AdamW moments, what the torch reference
    trains with) and the ``+experiment=tpu_fast`` production preset (bf16
    mu+nu storage with stochastic rounding) — and emit one JSON line pairing
    them. Each cell runs in a subprocess so the two steps never share chip
    memory. Set any knob to run a single labeled cell instead."""
    import os
    import subprocess

    cells = {
        "production_preset": {"MVLDM_TRAIN_BENCH_LP": "1"},
        "parity_default": {"MVLDM_TRAIN_BENCH_F32": "1"},
    }
    results = {}
    for name, env in cells.items():
        proc = subprocess.run(
            [sys.executable, __file__, "--train"],
            env={**os.environ, "MVLDM_TRAIN_BENCH_BATCH": "8", **env},
            capture_output=True, text=True,
        )
        lines = [l for l in proc.stdout.splitlines() if l.startswith("{")]
        if proc.returncode != 0 or not lines:
            results[name] = {
                "error": f"rc={proc.returncode}",
                "stderr_tail": proc.stderr[-300:],
            }
        else:
            results[name] = json.loads(lines[-1])
    prod = results["production_preset"]
    dflt = results["parity_default"]
    record = {
        "metric": "train_steps_per_sec_per_chip",
        "value": prod.get("value"),
        "unit": (prod.get("unit") or prod.get("error", ""))
        + " [tpu_fast production preset]",
        "parity_default_steps_per_sec": dflt.get("value"),
        "parity_default_unit": dflt.get("unit") or dflt.get("error"),
    }
    # A failed cell's stderr tail is the only diagnosable evidence (e.g.
    # rc=3 = backend probe abort when the tunnel flapped mid-pair).
    for name, r in results.items():
        if "error" in r and r.get("stderr_tail"):
            record[f"{name}_stderr_tail"] = r["stderr_tail"]
    for key in ("achieved_tflops", "mfu_vs_197tf_peak"):
        if key in prod:
            record[key] = prod[key]
    print(json.dumps(record))


def bench_scene_batch(n_scenes: int, mode: str = "anchored") -> None:
    """``python bench.py --scene-batch N [--autoregressive]``: steady-state
    sampling throughput with N scenes stacked per dispatch
    (``VideoSampler.dispatch_*_many``) and the batch N+1 dispatched before
    batch N is gathered — the ``mode=test test.scene_batch=N`` production
    pipeline. Scene batching fills the batch-1 launches (anchor phase /
    every autoregressive window) that dominate dead time at S=1; the
    anchored fill-phase chunk cap scales down so per-launch rows stay
    bounded."""
    from mvldm_tpu.diffusion.video_sampling import VideoSampler

    # --latent (autoregressive only): windows feed the previous window's
    # generated latent forward instead of re-encoding its decoded image
    # (test.ar_latent_feedthrough production option).
    latent = "--latent" in sys.argv[1:]
    engine, unet_params, vae_params = build_flagship()
    sampler = VideoSampler(
        engine, unet_params, vae_params, num_anchors_views=4,
        ar_latent_feedthrough=latent and mode == "autoregressive",
    )
    scenes = [make_scene(NUM_FRAMES) for _ in range(n_scenes)]
    dispatch = (
        sampler.dispatch_anchored_many
        if mode == "anchored"
        else sampler.dispatch_autoregressive_many
    )

    # Warm-up compiles every shape bucket at this scene count.
    VideoSampler.gather_many(
        dispatch(scenes, jax.random.PRNGKey(1)), n_scenes
    )

    n_batches = 3
    t0 = time.perf_counter()
    pending = None
    for i in range(n_batches):
        nxt = dispatch(scenes, jax.random.PRNGKey(2 + i))
        if pending is not None:
            VideoSampler.gather_many(pending, n_scenes)
        pending = nxt
    VideoSampler.gather_many(pending, n_scenes)
    dt = (time.perf_counter() - t0) / n_batches

    fps = n_scenes * NUM_FRAMES / dt
    print(
        json.dumps(
            {
                "metric": f"{mode}_sampling_frames_per_sec_per_chip",
                "value": round(fps, 4),
                "unit": (
                    f"frames/s ({n_scenes}x80-frame scenes per dispatch, "
                    "25-step DDIM, CFG 3.0, bf16"
                    + (", latent feedthrough"
                       if sampler.ar_latent_feedthrough else "")
                    + ")"
                ),
                "vs_baseline": round(fps / A100_REFERENCE_FPS, 4),
            }
        )
    )


def main(mode: str = "anchored") -> None:
    from mvldm_tpu.diffusion.video_sampling import VideoSampler

    engine, unet_params, vae_params = build_flagship()
    sampler = VideoSampler(engine, unet_params, vae_params, num_anchors_views=4)
    run = (
        sampler.sample_anchored if mode == "anchored"
        else sampler.sample_autoregressive
    )

    # Warm-up: one cold pass over the full scene compiles every shape bucket
    # (anchor call + the greedy fill buckets); the measured pass is the
    # steady-state per-scene throughput of an evaluation sweep.
    ctx, tgt = make_scene(NUM_FRAMES)
    run(ctx, tgt, jax.random.PRNGKey(1))

    # Median of three measured passes (run-to-run variance on the tunneled
    # chip is +-3%; the median is robust to a single slow outlier pass).
    times = []
    for i in (2, 3, 4):
        t0 = time.perf_counter()
        results = run(ctx, tgt, jax.random.PRNGKey(i))
        times.append(time.perf_counter() - t0)
        assert len(results) == NUM_FRAMES

    fps = NUM_FRAMES / sorted(times)[1]
    print(
        json.dumps(
            {
                "metric": f"{mode}_sampling_frames_per_sec_per_chip",
                "value": round(fps, 4),
                "unit": "frames/s (80-frame RE10K-format scene, 25-step DDIM, CFG 3.0, bf16)",
                "vs_baseline": round(fps / A100_REFERENCE_FPS, 4),
            }
        )
    )


if __name__ == "__main__":
    import sys

    _require_live_backend()
    ar = "--autoregressive" in sys.argv[1:]
    if "--train" in sys.argv[1:]:
        import os

        if any(k in os.environ for k in _TRAIN_KNOBS):
            bench_train()  # single labeled matrix cell
        else:
            bench_train_pair()  # default-vs-preset pairing at batch 8
    elif "--scene-batch" in sys.argv[1:]:
        bench_scene_batch(
            int(sys.argv[sys.argv.index("--scene-batch") + 1]),
            mode="autoregressive" if ar else "anchored",
        )
    elif "--single-scene" in sys.argv[1:]:
        main(mode="autoregressive" if ar else "anchored")
    elif ar:
        main(mode="autoregressive")
    else:
        # Headline: the scene-batched production eval pipeline (see
        # module docstring); per-scene latency via --single-scene.
        bench_scene_batch(4)
