"""One of two ``jax.distributed`` CPU processes for
``tests/test_multiprocess.py``: exercises the multi-host train loop
(fit -> collective orbax save -> resume) on a global 4-device mesh
(2 processes x 2 virtual CPU devices) against a shared run dir.

Usage (spawned by the test, one per process):
    python tests/multiprocess_worker.py <run_dir> <coordinator> <n_proc> <pid>

Verifies, per process:
* the global mesh train step runs (loss finite) with host-local batch
  stripes assembled via ``jax.make_array_from_process_local_data``;
* checkpoint save/restore round-trips the global TrainState collectively
  (resume sees step 3, continues to step 5);
* only rank 0 writes JSONL/console output (the line count over the shared
  filesystem would double if rank 1 also wrote — the reference's
  rank-guard semantics, ``src/main.py:67-69``).
"""

import os
import sys
from pathlib import Path

run_dir, coordinator, n_proc, pid = sys.argv[1:5]

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=2"
).strip()
os.environ["MVLDM_COORDINATOR"] = coordinator
os.environ["MVLDM_NUM_PROCESSES"] = n_proc
os.environ["MVLDM_PROCESS_ID"] = pid

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_platforms", "cpu")

from mvldm_tpu.parallel.distributed import (
    is_main_process,
    maybe_initialize_distributed,
)

assert maybe_initialize_distributed()
assert jax.process_count() == int(n_proc), jax.process_count()
assert jax.local_device_count() == 2
assert jax.device_count() == 2 * int(n_proc)

import jax.numpy as jnp
import numpy as np

from mvldm_tpu.config import OptimizerCfg
from mvldm_tpu.diffusion.engine import (
    DiffusionEngine,
    ModelCfg,
    unet_in_channels,
)
from mvldm_tpu.diffusion.schedulers import DDIMScheduler, DDIMSchedulerKwargs
from mvldm_tpu.models.mv_attention import SpatialTransformer3DCfg
from mvldm_tpu.models.unet import MultiViewUNet, MultiViewUNetCfg, UNetBackboneCfg
from mvldm_tpu.models.vae import AutoencoderCfg, AutoencoderKL, AutoencoderKLCfg
from mvldm_tpu.parallel.mesh import make_mesh
from mvldm_tpu.training.optim import build_lr_schedule, build_optimizer
from mvldm_tpu.training.trainer import Trainer
from mvldm_tpu.data.view_samplers import StepTracker

HW = 32  # image size -> 4x4 latents
B_LOCAL = 2  # per-process batch rows
V = 4  # 2 context + 2 target


def build_tiny():
    vae_kwargs = AutoencoderKLCfg(
        block_out_channels=(8, 8, 16, 16), layers_per_block=1,
        norm_num_groups=4,
    )
    model_cfg = ModelCfg(
        denoiser=MultiViewUNetCfg(
            autoencoder=UNetBackboneCfg(
                down_block_types=("CrossAttnDownBlock2D", "DownBlock2D"),
                up_block_types=("UpBlock2D", "CrossAttnUpBlock2D"),
                block_out_channels=(16, 32),
                layers_per_block=1,
                cross_attention_dim=16,
                num_attention_heads=(2, 4),
                norm_num_groups=8,
            ),
            multi_view_attention=SpatialTransformer3DCfg(num_heads=4),
        ),
        autoencoder=AutoencoderCfg(kwargs=vae_kwargs),
        use_cfg=True,
        cfg_scale=3.0,
        use_ray_encoding=False,
    )
    in_ch = unet_in_channels(model_cfg)
    unet = MultiViewUNet(model_cfg.denoiser, in_channels=in_ch, out_channels=4)
    vae = AutoencoderKL(vae_kwargs)
    scheduler = DDIMScheduler.create(
        DDIMSchedulerKwargs(clip_sample=False), num_inference_steps=4
    )
    engine = DiffusionEngine(model_cfg, unet, vae, scheduler)
    rng = jax.random.PRNGKey(0)  # same seed on every process
    vae_params = vae.init(rng, jnp.zeros((1, HW, HW, 3)), rng)["params"]
    unet_params = unet.init(
        rng, jnp.zeros((1, 2, HW // 8, HW // 8, in_ch)),
        jnp.zeros((1, 2), jnp.int32),
    )["params"]
    return engine, unet_params, vae_params


class StubLoader:
    """Infinite host-local batch stream with the loader dict layout."""

    def __iter__(self):
        rng = np.random.default_rng(100 + int(pid))  # distinct per process
        eye4 = np.eye(4, dtype=np.float32)
        eye3 = np.eye(3, dtype=np.float32)
        while True:
            extr = np.tile(eye4, (B_LOCAL, 2, 1, 1))
            extr[:, 1, 0, 3] = 1.0
            intr = np.tile(eye3, (B_LOCAL, 2, 1, 1))
            intr[:, :, 0, 2] = intr[:, :, 1, 2] = 0.5
            view = lambda: {
                "image": rng.uniform(
                    size=(B_LOCAL, 2, HW, HW, 3)
                ).astype(np.float32),
                "extrinsics": extr,
                "intrinsics": intr,
            }
            yield {"context": view(), "target": view()}

    def close(self, timeout=None):
        pass


class StubDataModule:
    def train_dataloader(self):
        return StubLoader()


def make_trainer(engine, vae_params, mesh, max_steps, subdir="", **kw):
    tx = build_optimizer(
        OptimizerCfg(name="AdamW", lr=1e-4, scale_lr=False),
        build_lr_schedule(1e-4, None),
        gradient_clip_val=0.1,
    )
    return Trainer(
        engine, tx, StubDataModule(), Path(run_dir) / subdir,
        vae_params=vae_params, max_steps=max_steps, num_context_views=2,
        checkpoint_every=3, log_every=1, mesh=mesh,
        step_tracker=StepTracker(), **kw,
    )


engine, unet_params, vae_params = build_tiny()
mesh = make_mesh(num_data=jax.device_count())

# Phase 1: fresh fit to step 3 (checkpoint_every=3 -> one collective save).
trainer = make_trainer(engine, vae_params, mesh, max_steps=3)
state = trainer.init_state(unet_params)
state = trainer.maybe_restore(state)
assert int(state.step) == 0
state = trainer.fit(state, jax.random.PRNGKey(42))
assert int(state.step) == 3

# Phase 2: resume from the collective checkpoint and continue to step 5.
trainer2 = make_trainer(engine, vae_params, mesh, max_steps=5)
state2 = trainer2.init_state(unet_params)
state2 = trainer2.maybe_restore(state2)
assert int(state2.step) == 3, f"resume saw step {int(state2.step)}"
# Restored params must match the saved ones bit-for-bit.
for a, b in zip(
    jax.tree_util.tree_leaves(state.params),
    jax.tree_util.tree_leaves(state2.params),
):
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
state2 = trainer2.fit(state2, jax.random.PRNGKey(42))
assert int(state2.step) == 5

# Phase 3: in-training validation on FSDP-sharded params. The TrainState's
# parameter leaves are partitioned across processes (non-addressable on any
# single one), the exact regime where a rank-0-local val hook would raise:
# all processes must enter Trainer._run_val_hook's collective replica fetch,
# and only rank 0 may execute the hook body (reference rank-zero
# validation_step, diffusion_wrapper.py:492).
val_calls: list = []


def val_hook(vstate, step: int) -> None:
    for leaf in jax.tree_util.tree_leaves(vstate.params):
        assert leaf.is_fully_addressable, "hook saw non-addressable params"
    eye4 = np.tile(np.eye(4, dtype=np.float32), (1, 2, 1, 1))
    eye4[:, 1, 0, 3] = 1.0
    intr = np.tile(np.eye(3, dtype=np.float32), (1, 2, 1, 1))
    intr[:, :, 0, 2] = intr[:, :, 1, 2] = 0.5
    out = engine.sample(
        vstate.params, vae_params,
        jnp.zeros((1, 1, HW, HW, 3)), jnp.asarray(eye4), jnp.asarray(intr),
        num_target_views=1, rng=jax.random.PRNGKey(7),
    )
    assert np.isfinite(np.asarray(out)).all()
    d = Path(run_dir) / "p3" / "val" / f"step_{step}"
    d.mkdir(parents=True, exist_ok=True)
    (d / "sample.npy").write_bytes(np.asarray(out).tobytes())
    val_calls.append(step)


trainer3 = make_trainer(
    engine, vae_params, mesh, max_steps=1, subdir="p3",
    val_hook=val_hook, val_check_interval=1,
    shard_params=True, example_params=unet_params,
)
state3 = trainer3.init_state(unet_params)
state3 = trainer3.fit(state3, jax.random.PRNGKey(43))
assert int(np.asarray(state3.step.addressable_data(0))) == 1

from mvldm_tpu.parallel.distributed import sync_processes

sync_processes("val_hook_check")
if is_main_process():
    assert val_calls == [1], val_calls
else:
    assert val_calls == [], "val hook body ran on a non-zero rank"
val_trees = sorted((Path(run_dir) / "p3" / "val").glob("step_*"))
assert [p.name for p in val_trees] == ["step_1"], val_trees
assert len(list(val_trees[0].iterdir())) == 1

# Rank-guard check over the SHARED filesystem: log_every=1 over 5 total
# steps -> exactly 5 JSONL lines; double that means rank 1 also wrote.
sync_processes("final_check")
lines = (Path(run_dir) / "metrics.jsonl").read_text().strip().splitlines()
assert len(lines) == 5, f"expected 5 rank-0 log lines, found {len(lines)}"

print(f"proc {jax.process_index()} OK (is_main={is_main_process()})")
