"""Scene-batched anchored sampling (``dispatch_anchored_many``): whole
scenes stacked along the batch axis of every launch and, with a mesh,
sharded over the ``data`` axis — TPU-native eval scaling with zero
cross-device communication (no reference counterpart; the reference
distributes eval only process-per-GPU via Lightning DDP). Runs on the
virtual 8-device CPU mesh from conftest."""

import jax
import numpy as np
import pytest

from mvldm_tpu.diffusion.video_sampling import SceneViews, VideoSampler
from mvldm_tpu.parallel.mesh import make_mesh

from test_engine import tiny_engine  # fixture

pytestmark = pytest.mark.slow  # multi-minute XLA compiles


def make_scene(seed: int, n_target=11, hw=32):
    rng = np.random.default_rng(seed)
    n = 1 + n_target
    images = rng.uniform(size=(n, hw, hw, 3)).astype(np.float32)
    extr = np.repeat(np.eye(4, dtype=np.float32)[None], n, axis=0)
    extr[:, 0, 3] = np.linspace(0, 1, n) + 0.05 * seed
    intr = np.repeat(np.eye(3, dtype=np.float32)[None], n, axis=0)
    intr[:, 0, 2] = intr[:, 1, 2] = 0.5
    ctx = SceneViews(images[:1], extr[:1], intr[:1], np.arange(1))
    tgt = SceneViews(images[1:], extr[1:], intr[1:], np.arange(1, n))
    return ctx, tgt


class TestSceneBatch:
    def test_batch_produces_every_frame_per_scene(self, tiny_engine):
        engine, unet_params, vae_params = tiny_engine
        sampler = VideoSampler(engine, unet_params, vae_params)
        scenes = [make_scene(0), make_scene(1)]
        results = sampler.sample_anchored_many(scenes, jax.random.PRNGKey(0))
        assert len(results) == 2
        for (ctx, tgt), frames in zip(scenes, results):
            assert sorted(frames.keys()) == tgt.index.tolist()
            for img in frames.values():
                assert img.shape == (32, 32, 3)
                assert img.dtype == np.uint8
        # Different scenes produce different images.
        a = np.stack([results[0][k] for k in sorted(results[0])])
        b = np.stack([results[1][k] for k in sorted(results[1])])
        assert not np.array_equal(a, b)

    def test_batch_is_deterministic(self, tiny_engine):
        engine, unet_params, vae_params = tiny_engine
        sampler = VideoSampler(engine, unet_params, vae_params)
        scenes = [make_scene(0), make_scene(1)]
        r1 = sampler.sample_anchored_many(scenes, jax.random.PRNGKey(3))
        r2 = sampler.sample_anchored_many(scenes, jax.random.PRNGKey(3))
        for d1, d2 in zip(r1, r2):
            for k in d1:
                np.testing.assert_array_equal(d1[k], d2[k])

    def test_unequal_target_counts_rejected(self, tiny_engine):
        engine, unet_params, vae_params = tiny_engine
        sampler = VideoSampler(engine, unet_params, vae_params)
        scenes = [make_scene(0, n_target=11), make_scene(1, n_target=9)]
        with pytest.raises(ValueError, match="equal target counts"):
            sampler.dispatch_anchored_many(scenes, jax.random.PRNGKey(0))

    def test_mesh_shards_scene_axis(self, tiny_engine):
        """With a mesh, launch outputs are actually distributed over the
        data axis (addressable shards smaller than the global array) and
        every scene still gets all frames."""
        engine, unet_params, vae_params = tiny_engine
        sampler = VideoSampler(engine, unet_params, vae_params)
        mesh = make_mesh(num_data=4, devices=jax.devices()[:4])
        scenes = [make_scene(i) for i in range(4)]
        pending = sampler.dispatch_anchored_many(
            scenes, jax.random.PRNGKey(0), mesh=mesh
        )
        sharded = [
            out for out, _ in pending
            if len(out.sharding.device_set) > 1
            and out.addressable_shards[0].data.shape[0] < out.shape[0]
        ]
        assert sharded, "no launch output was sharded over the mesh"
        results = VideoSampler.gather_many(pending, len(scenes))
        for (ctx, tgt), frames in zip(scenes, results):
            assert sorted(frames.keys()) == tgt.index.tolist()

    def test_mesh_indivisible_batch_rejected(self, tiny_engine):
        engine, unet_params, vae_params = tiny_engine
        sampler = VideoSampler(engine, unet_params, vae_params)
        mesh = make_mesh(num_data=4, devices=jax.devices()[:4])
        with pytest.raises(ValueError, match="does not divide"):
            sampler.dispatch_anchored_many(
                [make_scene(0)], jax.random.PRNGKey(0), mesh=mesh
            )

    def test_autoregressive_batch_produces_every_frame(self, tiny_engine):
        engine, unet_params, vae_params = tiny_engine
        sampler = VideoSampler(engine, unet_params, vae_params)
        scenes = [make_scene(0), make_scene(1)]
        results = sampler.sample_autoregressive_many(
            scenes, jax.random.PRNGKey(0)
        )
        assert len(results) == 2
        for (ctx, tgt), frames in zip(scenes, results):
            assert sorted(frames.keys()) == tgt.index.tolist()
        a = np.stack([results[0][k] for k in sorted(results[0])])
        b = np.stack([results[1][k] for k in sorted(results[1])])
        assert not np.array_equal(a, b)

    def test_autoregressive_latent_feedthrough(self, tiny_engine):
        """ar_latent_feedthrough=True: windows condition on the previous
        window's generated latent (no per-window VAE encode). Same frame
        coverage and determinism contract as the image-feed path; no VAE
        encode launch after the initial one-time context encode."""
        engine, unet_params, vae_params = tiny_engine
        sampler = VideoSampler(
            engine, unet_params, vae_params, ar_latent_feedthrough=True
        )
        encode_calls = []
        orig_encode = sampler._encode_ctx

        def spy_encode(vp, ctx_u8, rng):
            encode_calls.append(ctx_u8.shape)
            return orig_encode(vp, ctx_u8, rng)

        sampler._encode_ctx = spy_encode
        scenes = [make_scene(0), make_scene(1)]
        results = sampler.sample_autoregressive_many(
            scenes, jax.random.PRNGKey(0)
        )
        # The scene context is encoded exactly once for the whole chain:
        # one (S=2, v_c=1, h, w, 3) launch.
        h, w = scenes[0][0].images.shape[1:3]
        assert encode_calls == [(2, 1, h, w, 3)]
        for (ctx, tgt), frames in zip(scenes, results):
            assert sorted(frames.keys()) == tgt.index.tolist()
            for img in frames.values():
                assert img.dtype == np.uint8
        again = sampler.sample_autoregressive_many(
            scenes, jax.random.PRNGKey(0)
        )
        for r1, r2 in zip(results, again):
            for k in r1:
                assert np.array_equal(r1[k], r2[k])

    def test_autoregressive_batch_mesh_sharded(self, tiny_engine):
        engine, unet_params, vae_params = tiny_engine
        sampler = VideoSampler(engine, unet_params, vae_params)
        mesh = make_mesh(num_data=4, devices=jax.devices()[:4])
        scenes = [make_scene(i) for i in range(4)]
        pending = sampler.dispatch_autoregressive_many(
            scenes, jax.random.PRNGKey(0), mesh=mesh
        )
        assert any(len(out.sharding.device_set) > 1 for out, _ in pending)
        results = VideoSampler.gather_many(pending, 4)
        for (ctx, tgt), frames in zip(scenes, results):
            assert sorted(frames.keys()) == tgt.index.tolist()

    def test_run_test_scene_batched_cli(self, tmp_path_factory):
        """mode=test with test.scene_batch=2 batches both synthetic scenes
        into one dispatch and still exports every frame of each scene."""
        from synthetic_data import write_synthetic_dataset
        from mvldm_tpu.scripts import main as main_script

        data_root = write_synthetic_dataset(
            tmp_path_factory.mktemp("re10k"), frames_per_scene=24
        )
        run_dir = tmp_path_factory.mktemp("run")
        main_script.main(
            [
                "+experiment=tiny",
                "mode=test",
                f"dataset.root={data_root}",
                f"output_dir={run_dir}",
                "test.sampling_mode=anchored",
                "test.limit_frames=8",
                "test.scene_batch=2",
                "trainer.limit_test_batches=2",
                "dataset.view_sampler.max_distance_between_context_views=10",
                "dataset.image_shape=[32,32]",
                "checkpointing.allow_init_weights=true",
            ]
        )
        video_dir = run_dir / "video"
        scenes = sorted(p for p in video_dir.iterdir() if p.is_dir())
        assert len(scenes) == 2
        for scene_dir in scenes:
            colors = sorted((scene_dir / "color").glob("*.png"))
            assert len(colors) == 8
            assert len(list((scene_dir / "context").glob("*.png"))) >= 1

    def test_fill_chunk_cap_scales_with_scene_count(self, tiny_engine):
        """Per-launch group cap shrinks as scenes batch together so the
        per-device row count stays bounded by max_parallel_groups."""
        engine, unet_params, vae_params = tiny_engine
        sampler = VideoSampler(
            engine, unet_params, vae_params, max_parallel_groups=4
        )
        calls = []
        orig = sampler._sample_indexed_scenes

        def spy(*args, **kwargs):
            calls.append(args[3].shape)  # ctx_idx (S, g, 2)
            return orig(*args, **kwargs)

        sampler._sample_indexed_scenes = spy
        scenes = [make_scene(i) for i in range(2)]
        sampler.sample_anchored_many(scenes, jax.random.PRNGKey(0))
        # 11 targets -> 4 anchors at 2,4,6,8 -> 7 fill frames in 4 groups
        # ([0,1],[3],[5],[7,9,10] split by anchor): cap = 4//2 = 2 ->
        # chunks of (2, 2, 2) and a padded tail of 2? groups: assert the
        # per-launch group axis never exceeds the scaled cap.
        assert calls, "fill phase never launched"
        for shape in calls:
            assert shape[0] == 2
            assert shape[1] <= 2
