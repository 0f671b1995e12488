"""Precomputed VAE-latent training cache (data/latent_cache.py +
scripts/precompute_latents.py + the dataset/engine latent paths).

The cache's correctness contract is *exact semantic equality* with per-step
encoding (the VAE is frozen; reference ``diffusion_wrapper.py:356-359``):

- the dataset's latent path must pick the same frames, the same flip draw,
  the same pose shims, and the same crop-shim intrinsics fix-up as the image
  path run with the same RNG streams;
- cached moments must equal encoding the image path's crop-shimmed pixels
  (up to f16 storage quantization);
- ``DiffusionEngine.training_loss`` fed exact cached moments must reproduce
  the image path's loss bitwise (same posterior, same sample key).
"""

from dataclasses import replace
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from synthetic_data import write_synthetic_dataset
from test_engine import make_batch, tiny_engine  # noqa: F401 (fixture)

# The precompute fixture + bitwise-parity compiles dominate the default
# suite (~4 min on a single-core host); full coverage runs with -m "".
pytestmark = pytest.mark.slow

from mvldm_tpu.config import DatasetCfg
from mvldm_tpu.data.dataset_re10k import DatasetRE10k
from mvldm_tpu.data.latent_cache import LatentCacheReader
from mvldm_tpu.data.loader import collate
from mvldm_tpu.data.shims import crop_shim_intrinsics, rescale_and_crop
from mvldm_tpu.data.view_samplers import ViewSamplerBounded, ViewSamplerBoundedCfg
from mvldm_tpu.diffusion.engine import Batch, ModelCfg
from mvldm_tpu.models.vae import AutoencoderCfg, AutoencoderKL, AutoencoderKLCfg
from mvldm_tpu.scripts.precompute_latents import (
    PrecomputeLatentsCfg,
    build_encoder,
    run as precompute_run,
)

IMAGE_SHAPE = (64, 64)
TINY_VAE = AutoencoderKLCfg(
    block_out_channels=(8, 8, 16, 16), layers_per_block=1, norm_num_groups=4
)


def precompute_cfg(data_root: Path, out: Path) -> PrecomputeLatentsCfg:
    return PrecomputeLatentsCfg(
        dataset=DatasetCfg(root=data_root, image_shape=list(IMAGE_SHAPE)),
        model=ModelCfg(autoencoder=AutoencoderCfg(kwargs=TINY_VAE)),
        out=out,
        encode_batch=4,
        allow_init_vae=True,  # no checkpoint in this environment
    )


@pytest.fixture(scope="module")
def cache_setup(tmp_path_factory):
    data_root = write_synthetic_dataset(
        tmp_path_factory.mktemp("re10k"), frames_per_scene=10
    )
    out = tmp_path_factory.mktemp("latents")
    cfg = precompute_cfg(data_root, out)
    precompute_run(cfg)
    return data_root, out, cfg


def dataset_cfg(data_root, **kw) -> DatasetCfg:
    return DatasetCfg(
        root=data_root,
        image_shape=list(IMAGE_SHAPE),
        augment=True,
        **kw,
    )


def bounded_sampler(seed: int) -> ViewSamplerBounded:
    cfg = ViewSamplerBoundedCfg(
        num_context_views=2,
        num_target_views=3,
        min_distance_between_context_views=3,
        max_distance_between_context_views=8,
    )
    return ViewSamplerBounded(
        cfg, "train", False, False, None, rng=np.random.default_rng(seed)
    )


class TestCacheLayout:
    def test_one_npz_per_chunk_with_meta(self, cache_setup):
        _, out, _ = cache_setup
        files = sorted(p.name for p in (out / "train").iterdir())
        assert "meta.json" in files
        assert any(f.endswith(".npz") for f in files)

    def test_reader_rejects_shape_mismatch(self, cache_setup):
        _, out, _ = cache_setup
        with pytest.raises(ValueError, match="image_shape"):
            LatentCacheReader(out, "train", image_shape=(32, 32))

    def test_reader_requires_meta(self, tmp_path):
        (tmp_path / "train").mkdir()
        with pytest.raises(FileNotFoundError, match="meta.json"):
            LatentCacheReader(tmp_path, "train")

    def test_moments_shape_and_flip_variants(self, cache_setup):
        _, out, _ = cache_setup
        reader = LatentCacheReader(out, "train", image_shape=IMAGE_SHAPE)
        npz = next(p for p in (out / "train").iterdir() if p.suffix == ".npz")
        with np.load(npz) as chunk:
            scene = chunk.files[0]
            moments = chunk[scene]
        n, flips, h, w, c2 = moments.shape
        assert flips == 2 and (h, w) == (8, 8)  # 64/8
        assert c2 == 2 * TINY_VAE.latent_channels
        assert moments.dtype == np.float16
        # flipped-pixels latents differ from the originals
        assert not np.allclose(moments[:, 0], moments[:, 1])
        got = reader.lookup(npz.stem, scene, np.array([0, 2]), flip=True)
        np.testing.assert_array_equal(
            got, moments[[0, 2], 1].astype(np.float32)
        )


class TestDatasetLatentPath:
    def test_matches_image_path_end_to_end(self, cache_setup):
        """Same RNG streams => the latent-path dataset must reproduce the
        image path's frame choice, flip draw, extrinsics, intrinsics, bounds —
        and its moments must equal encoding the image path's pixels."""
        data_root, out, cfg = cache_setup
        moments_fn, _, _ = build_encoder(cfg)

        base = dataset_cfg(data_root)
        ds_img = DatasetRE10k(
            base, "train", bounded_sampler(5), rng=np.random.default_rng(7)
        )
        ds_lat = DatasetRE10k(
            replace(base, latent_cache=out),
            "train",
            bounded_sampler(5),
            rng=np.random.default_rng(7),
        )

        checked = 0
        for ex_img, ex_lat in zip(ds_img, ds_lat):
            assert ex_img.scene == ex_lat.scene
            for role in ("context", "target"):
                vi, vl = getattr(ex_img, role), getattr(ex_lat, role)
                np.testing.assert_array_equal(vi.index, vl.index)
                np.testing.assert_allclose(
                    vi.extrinsics, vl.extrinsics, atol=1e-6
                )
                np.testing.assert_allclose(
                    vi.intrinsics, vl.intrinsics, atol=1e-6
                )
                np.testing.assert_allclose(vi.near, vl.near, atol=1e-6)
                np.testing.assert_allclose(vi.far, vl.far, atol=1e-6)
                assert vl.image is None and vi.latent_moments is None
                # The cached moments come from the same (possibly flipped)
                # crop-shimmed pixels the image path yields; re-encode those
                # pixels and compare up to the cache's f16 quantization.
                want = np.asarray(moments_fn(jnp.asarray(vi.image)))
                np.testing.assert_allclose(
                    vl.latent_moments,
                    want.astype(np.float32),
                    rtol=2e-2,
                    atol=5e-3,
                )
            checked += 1
        # one bounded sample per scene per pass; 2 synthetic train scenes
        assert checked == 2

    def test_crop_shim_intrinsics_matches_pixel_shim(self):
        rng = np.random.default_rng(0)
        intr = np.repeat(np.eye(3, dtype=np.float32)[None], 3, axis=0)
        intr[:, 0, 0] = rng.uniform(0.8, 1.2, 3)
        intr[:, 1, 1] = rng.uniform(1.2, 1.8, 3)
        intr[:, 0, 2] = intr[:, 1, 2] = 0.5
        images = rng.uniform(size=(3, 360, 640, 3)).astype(np.float32)
        _, want = rescale_and_crop(images, intr, IMAGE_SHAPE)
        got = crop_shim_intrinsics(intr, (360, 640), IMAGE_SHAPE)
        np.testing.assert_allclose(got, want, rtol=1e-6)

    def test_re10kv2_latent_path(self, cache_setup):
        """The map-style dataset resolves the chunk stem through its
        scene->chunk index when serving cached latents."""
        from mvldm_tpu.data.dataset_re10kv2 import DatasetRE10kV2

        data_root, out, _ = cache_setup
        ds = DatasetRE10kV2(
            dataset_cfg(data_root, latent_cache=out),
            "train",
            bounded_sampler(2),
            rng=np.random.default_rng(2),
        )
        ex = ds[0]
        assert ex.context.image is None
        assert ex.context.latent_moments.shape[1:] == (
            8, 8, 2 * TINY_VAE.latent_channels,
        )

    def test_collate_latent_batches(self, cache_setup):
        data_root, out, _ = cache_setup
        ds = DatasetRE10k(
            dataset_cfg(data_root, latent_cache=out),
            "train",
            bounded_sampler(1),
            rng=np.random.default_rng(1),
        )
        it = iter(ds)
        batch = collate([next(it), next(it)])
        ctx = batch["context"]
        assert "image" not in ctx
        assert ctx["latent_moments"].shape == (
            2, 2, 8, 8, 2 * TINY_VAE.latent_channels,
        )
        assert batch["target"]["latent_moments"].shape[:2] == (2, 3)


class TestEngineLatentPath:
    def test_training_loss_bitwise_matches_image_path(self, tiny_engine):
        """Exact moments + the same sample key => the latent path draws the
        identical z as per-step encoding, so the loss must match bitwise."""
        engine, unet_params, vae_params = tiny_engine
        batch = make_batch(jax.random.PRNGKey(3))
        b, v, h, w, _ = batch.images.shape
        flat = batch.images.reshape(b * v, h, w, 3) * 2.0 - 1.0
        dist = engine.vae.apply(
            {"params": vae_params}, flat, method=AutoencoderKL.encode
        )
        moments = jnp.concatenate([dist.mean, dist.logvar], axis=-1)
        lat_batch = Batch(
            images=None,
            extrinsics=batch.extrinsics,
            intrinsics=batch.intrinsics,
            is_target=batch.is_target,
            latent_moments=moments.reshape(b, v, *moments.shape[1:]),
        )
        rng = jax.random.PRNGKey(11)
        loss_img, m_img = engine.training_loss(
            unet_params, vae_params, batch, rng, num_context_views=2
        )
        loss_lat, m_lat = engine.training_loss(
            unet_params, vae_params, lat_batch, rng, num_context_views=2
        )
        np.testing.assert_allclose(
            np.asarray(loss_img), np.asarray(loss_lat), rtol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(m_img["loss/diffusion"]),
            np.asarray(m_lat["loss/diffusion"]),
            rtol=1e-6,
        )

    def test_train_step_runs_on_latent_batch(self, tiny_engine):
        """make_train_step with a latent-moments batch (images=None) compiles
        and steps — the trainer path used with dataset.latent_cache."""
        import optax

        from mvldm_tpu.training.trainer import TrainState, make_train_step

        engine, unet_params, vae_params = tiny_engine
        batch = make_batch(jax.random.PRNGKey(5))
        b, v, h, w, _ = batch.images.shape
        flat = batch.images.reshape(b * v, h, w, 3) * 2.0 - 1.0
        dist = engine.vae.apply(
            {"params": vae_params}, flat, method=AutoencoderKL.encode
        )
        moments = jnp.concatenate([dist.mean, dist.logvar], axis=-1)
        lat_batch = Batch(
            images=None,
            extrinsics=batch.extrinsics,
            intrinsics=batch.intrinsics,
            is_target=batch.is_target,
            latent_moments=moments.reshape(b, v, *moments.shape[1:]),
        )
        tx = optax.adamw(1e-4)
        step = make_train_step(engine, tx, vae_params, num_context_views=2)
        state = TrainState(
            params=unet_params,
            opt_state=tx.init(unet_params),
            ema_params=None,
            step=jnp.asarray(0, jnp.int32),
        )
        state, metrics = step(state, lat_batch, jax.random.PRNGKey(6))
        assert np.isfinite(float(metrics["loss/diffusion"]))
        assert int(state.step) == 1
