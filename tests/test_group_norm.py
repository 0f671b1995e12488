"""Fused GroupNorm kernel (ops/group_norm.py): parity with flax
nn.GroupNorm, the fused-SiLU variant, and the analytic backward."""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mvldm_tpu.ops.group_norm import (
    _gn_jnp,
    _gn_pallas,
    _group_matrix,
    group_norm,
)


def flax_gn(x, scale, bias, groups, eps):
    mod = nn.GroupNorm(num_groups=groups, epsilon=eps, dtype=jnp.float32,
                       param_dtype=jnp.float32)
    params = {"params": {"scale": scale, "bias": bias}}
    return mod.apply(params, x.astype(jnp.float32)).astype(x.dtype)


class TestGroupMatrix:
    def test_membership(self):
        m = np.asarray(_group_matrix(8, 4))
        assert m.shape == (8, 4)
        assert (m.sum(axis=1) == 1).all()
        assert (m[:2, 0] == 1).all() and (m[2:4, 1] == 1).all()


class TestFusedGroupNorm:
    @pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
    @pytest.mark.parametrize("shape,groups", [((3, 8, 8, 32), 8),
                                              ((2, 16, 16, 40), 4)])
    def test_matches_flax(self, dtype, shape, groups):
        rng = jax.random.PRNGKey(0)
        x = (jax.random.normal(rng, shape) * 2 + 0.5).astype(dtype)
        c = shape[-1]
        scale = jax.random.uniform(jax.random.PRNGKey(1), (c,)) + 0.5
        bias = jax.random.normal(jax.random.PRNGKey(2), (c,))
        ours = group_norm(x, scale, bias, groups, 1e-5)
        ref = flax_gn(x, scale, bias, groups, 1e-5)
        tol = 1e-5 if dtype == jnp.float32 else 2e-2
        np.testing.assert_allclose(
            np.asarray(ours, np.float32), np.asarray(ref, np.float32),
            atol=tol, rtol=tol,
        )

    def test_pallas_interpret_matches_jnp(self):
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 64, 32), jnp.float32)
        scale = jnp.ones((32,))
        bias = jnp.zeros((32,))
        got = _gn_pallas(x, scale, bias, groups=8, eps=1e-5, act="silu",
                         interpret=True)
        want = _gn_jnp(x, scale, bias, groups=8, eps=1e-5, act="silu")
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-5, rtol=1e-5)

    def test_fused_silu(self):
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 16))
        scale = jnp.full((16,), 1.3)
        bias = jnp.full((16,), -0.2)
        fused = group_norm(x, scale, bias, 4, 1e-5, act="silu")
        unfused = nn.silu(group_norm(x, scale, bias, 4, 1e-5))
        np.testing.assert_allclose(np.asarray(fused), np.asarray(unfused),
                                   atol=1e-6, rtol=1e-6)

    @pytest.mark.slow  # the op is off the live path (model uses XLA's GN)
    @pytest.mark.parametrize("act", [None, "silu"])
    def test_gradients_match_flax_autodiff(self, act):
        x = jax.random.normal(jax.random.PRNGKey(3), (2, 6, 6, 24))
        scale = jax.random.uniform(jax.random.PRNGKey(4), (24,)) + 0.5
        bias = jax.random.normal(jax.random.PRNGKey(5), (24,))

        def ours(x, scale, bias):
            return jnp.sum(jnp.sin(group_norm(x, scale, bias, 6, 1e-5, act)))

        def ref(x, scale, bias):
            y = flax_gn(x, scale, bias, 6, 1e-5)
            if act == "silu":
                y = nn.silu(y)
            return jnp.sum(jnp.sin(y))

        g_ours = jax.grad(ours, argnums=(0, 1, 2))(x, scale, bias)
        g_ref = jax.grad(ref, argnums=(0, 1, 2))(x, scale, bias)
        for a, b in zip(g_ours, g_ref):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-4, rtol=1e-4)

    def test_param_tree_unchanged(self):
        """Checkpoint-conversion contract: scale/bias live under
        <wrapper>/GroupNorm_0 exactly as with flax's module."""
        from mvldm_tpu.models.layers import GroupNorm

        m = GroupNorm(8, 1e-5)
        params = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 4, 4, 32)))
        inner = params["params"]["GroupNorm_0"]
        assert set(inner) == {"scale", "bias"}
        assert inner["scale"].shape == (32,)
