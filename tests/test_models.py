import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mvldm_tpu.models.mv_attention import SpatialTransformer3D, SpatialTransformer3DCfg
from mvldm_tpu.models.unet import MultiViewUNet, MultiViewUNetCfg, UNetBackboneCfg
from mvldm_tpu.models.vae import AutoencoderKL, AutoencoderKLCfg


def tiny_unet_cfg(**overrides):
    backbone = UNetBackboneCfg(
        down_block_types=("CrossAttnDownBlock2D", "DownBlock2D"),
        up_block_types=("UpBlock2D", "CrossAttnUpBlock2D"),
        block_out_channels=(32, 64),
        layers_per_block=1,
        cross_attention_dim=32,
        num_attention_heads=(2, 4),
        norm_num_groups=8,
    )
    mv = SpatialTransformer3DCfg(num_heads=4)
    return MultiViewUNetCfg(
        autoencoder=backbone, multi_view_attention=mv, **overrides
    )


def init_unet(cfg=None, in_channels=11, out_channels=4, h=16, w=16, b=1, v=3):
    cfg = cfg or tiny_unet_cfg()
    model = MultiViewUNet(cfg, in_channels=in_channels, out_channels=out_channels)
    x = jax.random.normal(jax.random.PRNGKey(0), (b, v, h, w, in_channels))
    t = jnp.zeros((b, v), dtype=jnp.int32)
    params = model.init(jax.random.PRNGKey(1), x, t)
    return model, params, x, t


class TestMultiViewUNet:
    @pytest.mark.slow
    def test_forward_shape(self):
        model, params, x, t = init_unet()
        out = model.apply(params, x, t)
        assert out.shape == (1, 3, 16, 16, 4)
        assert bool(jnp.isfinite(out).all())

    @pytest.mark.slow
    def test_per_view_timesteps_differ(self):
        model, params, x, _ = init_unet()
        t_uniform = jnp.full((1, 3), 100, dtype=jnp.int32)
        t_mixed = jnp.asarray([[0, 100, 500]], dtype=jnp.int32)
        out_u = model.apply(params, x, t_uniform)
        out_m = model.apply(params, x, t_mixed)
        assert not np.allclose(np.asarray(out_u), np.asarray(out_m))

    @pytest.mark.slow
    def test_view_mask_makes_padding_exact(self):
        """A padded view excluded via view_mask must not change real views'
        outputs — the invariant behind single-launch batched CFG."""
        cfg = tiny_unet_cfg()
        model = MultiViewUNet(cfg, in_channels=11, out_channels=4)
        key = jax.random.PRNGKey(2)
        x = jax.random.normal(key, (1, 3, 16, 16, 11))
        t = jnp.asarray([[0, 200, 200]], dtype=jnp.int32)
        params = model.init(jax.random.PRNGKey(3), x, t)

        # Reference: forward only the first two views.
        out_small = model.apply(params, x[:, :2], t[:, :2])

        # Padded: add a garbage third view, masked out.
        x_pad = x.at[:, 2].set(jax.random.normal(jax.random.PRNGKey(4), (1, 16, 16, 11)))
        mask = jnp.asarray([[True, True, False]])
        out_pad = model.apply(params, x_pad, t, view_mask=mask)

        np.testing.assert_allclose(
            np.asarray(out_pad[:, :2]), np.asarray(out_small), atol=1e-5
        )

    @pytest.mark.slow
    def test_gradients_flow(self):
        model, params, x, t = init_unet()

        def loss(p):
            return jnp.mean(model.apply(p, x, t) ** 2)

        g = jax.grad(loss)(params)
        leaves = jax.tree_util.tree_leaves(g)
        assert all(bool(jnp.isfinite(l).all()) for l in leaves)
        # Most parameters should receive gradient (proj_out convs are
        # zero-init so their inputs still get gradient via residual).
        nonzero = sum(bool(jnp.any(l != 0)) for l in leaves)
        assert nonzero > len(leaves) * 0.5

    @pytest.mark.slow
    @pytest.mark.parametrize("policy", [None, "dots"])
    def test_remat_matches_no_remat(self, policy):
        """Block remat (either policy) is a memory/recompute trade only —
        forward outputs and gradients must match the plain model."""
        cfg = tiny_unet_cfg()
        model, params, x, t = init_unet(cfg)
        rematted = MultiViewUNet(
            cfg, in_channels=11, out_channels=4, remat=True,
            remat_policy=policy,
        )
        out = model.apply(params, x, t)
        out_r = rematted.apply(params, x, t)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(out_r), atol=1e-6
        )

        def loss(m):
            return lambda p: jnp.mean(m.apply(p, x, t) ** 2)

        g = jax.grad(loss(model))(params)
        g_r = jax.grad(loss(rematted))(params)
        for a, b in zip(
            jax.tree_util.tree_leaves(g), jax.tree_util.tree_leaves(g_r)
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=1e-6
            )

    def test_unknown_remat_policy_raises(self):
        cfg = tiny_unet_cfg()
        model = MultiViewUNet(
            cfg, in_channels=11, out_channels=4, remat=True,
            remat_policy="nope",
        )
        x = jnp.zeros((1, 2, 16, 16, 11))
        t = jnp.zeros((1, 2), dtype=jnp.int32)
        with pytest.raises(ValueError, match="remat_policy"):
            model.init(jax.random.PRNGKey(0), x, t)


class TestSpatialTransformer3D:
    def test_identity_at_init(self):
        """Zero-initialized proj_out makes the block an identity at init
        (reference mvdream/attention.py:90-96)."""
        cfg = SpatialTransformer3DCfg(num_heads=4)
        block = SpatialTransformer3D(cfg, groups=8)
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 3, 8, 8, 16))
        params = block.init(jax.random.PRNGKey(1), x)
        out = block.apply(params, x)
        np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-6)

    def test_views_interact(self):
        cfg = SpatialTransformer3DCfg(num_heads=4)
        block = SpatialTransformer3D(cfg, groups=8)
        x = jax.random.normal(jax.random.PRNGKey(0), (1, 3, 8, 8, 16))
        params = block.init(jax.random.PRNGKey(1), x)
        # Force proj_out nonzero so the block is not an identity.
        params = jax.tree_util.tree_map(
            lambda p: p + 0.05 * jnp.ones_like(p), params
        )
        out1 = block.apply(params, x)
        x2 = x.at[:, 2].add(1.0)
        out2 = block.apply(params, x2)
        # Changing view 2 must change view 0's output (joint attention).
        assert not np.allclose(np.asarray(out1[:, 0]), np.asarray(out2[:, 0]))


class TestVAE:
    @pytest.mark.slow
    def test_roundtrip_shapes(self):
        cfg = AutoencoderKLCfg(
            block_out_channels=(16, 32, 32, 32),
            layers_per_block=1,
            norm_num_groups=8,
        )
        vae = AutoencoderKL(cfg)
        x = jax.random.normal(jax.random.PRNGKey(0), (1, 64, 64, 3))
        params = vae.init(jax.random.PRNGKey(1), x, jax.random.PRNGKey(2))

        dist = vae.apply(params, x, method=AutoencoderKL.encode)
        assert dist.mean.shape == (1, 8, 8, 4)  # f8 downsampling
        z = dist.sample(jax.random.PRNGKey(3))
        out = vae.apply(params, z, method=AutoencoderKL.decode)
        assert out.shape == (1, 64, 64, 3)

    @pytest.mark.slow
    def test_encode_is_stochastic_but_seeded(self):
        cfg = AutoencoderKLCfg(
            block_out_channels=(16, 32, 32, 32),
            layers_per_block=1,
            norm_num_groups=8,
        )
        vae = AutoencoderKL(cfg)
        x = jax.random.normal(jax.random.PRNGKey(0), (1, 64, 64, 3))
        params = vae.init(jax.random.PRNGKey(1), x, jax.random.PRNGKey(2))
        dist = vae.apply(params, x, method=AutoencoderKL.encode)
        s1 = dist.sample(jax.random.PRNGKey(7))
        s2 = dist.sample(jax.random.PRNGKey(7))
        s3 = dist.sample(jax.random.PRNGKey(8))
        np.testing.assert_array_equal(np.asarray(s1), np.asarray(s2))
        assert not np.allclose(np.asarray(s1), np.asarray(s3))


class TestZeroContextShortcut:
    def test_transformer2d_none_context_equals_explicit_zeros(self):
        """The live model feeds all-zero text conditioning; the None-context
        shortcut (to_out-bias constant) must match the full attention over a
        zero token exactly, with an identical parameter tree."""
        import jax
        import jax.numpy as jnp

        from mvldm_tpu.models.layers import Transformer2D

        m = Transformer2D(num_heads=2, head_dim=8, context_dim=24, groups=4)
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 16))
        zeros_ctx = jnp.zeros((2, 64, 24))

        params_none = m.init(jax.random.PRNGKey(1), x, None)["params"]
        params_full = m.init(jax.random.PRNGKey(1), x, zeros_ctx)["params"]
        assert jax.tree_util.tree_structure(params_none) == (
            jax.tree_util.tree_structure(params_full)
        )
        for a, b in zip(
            jax.tree_util.tree_leaves(params_none),
            jax.tree_util.tree_leaves(params_full),
        ):
            assert a.shape == b.shape

        out_none = m.apply({"params": params_full}, x, None)
        out_full = m.apply({"params": params_full}, x, zeros_ctx)
        assert jnp.array_equal(out_none, out_full) or (
            jnp.max(jnp.abs(out_none - out_full)) < 1e-6
        )
