"""Fused LN->GEGLU-FF->residual kernel (ops/fused_ff.py): parity with the
decomposed module stack, interpret-mode kernel check, gradients, and the
parameter-tree contract."""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mvldm_tpu.models.layers import FeedForward
from mvldm_tpu.ops.fused_ff import (
    _ff_jnp,
    _ff_pallas,
    _token_tile,
    fused_ln_geglu_ff,
)


def decomposed(x, ln_scale, ln_bias, w1, b1, w2, b2, dtype):
    """The pre-fusion module stack: f32 LayerNorm + bf16/f32 Dense GEGLU."""
    ln = nn.LayerNorm(dtype=jnp.float32)
    h = ln.apply({"params": {"scale": ln_scale, "bias": ln_bias}},
                 x.astype(jnp.float32))
    ff = FeedForward(x.shape[-1], dtype=dtype)
    params = {
        "net_0": {"proj": {"kernel": w1, "bias": b1}},
        "net_2": {"kernel": w2, "bias": b2},
    }
    return x + ff.apply({"params": params}, h.astype(dtype))


def make_inputs(n=2, l=64, c=32, seed=0):
    keys = jax.random.split(jax.random.PRNGKey(seed), 8)
    x = jax.random.normal(keys[0], (n, l, c))
    ln_s = jax.random.uniform(keys[1], (c,)) + 0.5
    ln_b = jax.random.normal(keys[2], (c,)) * 0.1
    w1 = jax.random.normal(keys[3], (c, 8 * c)) * 0.05
    b1 = jax.random.normal(keys[4], (8 * c,)) * 0.01
    w2 = jax.random.normal(keys[5], (4 * c, c)) * 0.05
    b2 = jax.random.normal(keys[6], (c,)) * 0.01
    return x, ln_s, ln_b, w1, b1, w2, b2


class TestTokenTile:
    def test_divides_l(self):
        for l, c in ((1024, 320), (256, 640), (64, 1280), (80, 320)):
            t = _token_tile(l, c)
            assert l % t == 0 and t >= 1


class TestFusedFF:
    def test_jnp_matches_decomposed_modules(self):
        args = make_inputs()
        got = _ff_jnp(*args)
        want = decomposed(*args, dtype=jnp.float32)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-5, rtol=1e-5)

    def test_pallas_interpret_matches_jnp(self):
        args = make_inputs()
        got = _ff_pallas(*args, interpret=True)
        want = _ff_jnp(*args)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-4, rtol=1e-4)

    def test_bf16_close_to_f32_reference(self):
        x, *rest = make_inputs()
        got = fused_ln_geglu_ff(x.astype(jnp.bfloat16), *rest)
        want = _ff_jnp(x, *rest)
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(want), atol=5e-2, rtol=5e-2
        )

    def test_gradients_flow(self):
        args = make_inputs(l=16, c=8)

        def loss(*a):
            return jnp.sum(fused_ln_geglu_ff(*a) ** 2)

        grads = jax.grad(loss, argnums=tuple(range(7)))(*args)
        for g, a in zip(grads, args):
            assert g.shape == a.shape
            assert np.isfinite(np.asarray(g)).all()
            assert float(jnp.abs(g).max()) > 0

    def test_param_tree_contract(self):
        """TransformerBlock2D keeps norm3/ff param paths after fusion."""
        from mvldm_tpu.models.layers import TransformerBlock2D

        m = TransformerBlock2D(num_heads=2, head_dim=8, context_dim=24)
        params = m.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 16, 16)), None
        )["params"]
        assert set(params["norm3"]) == {"scale", "bias"}
        assert set(params["ff"]["net_0"]["proj"]) == {"kernel", "bias"}
        assert set(params["ff"]["net_2"]) == {"kernel", "bias"}
        assert params["ff"]["net_0"]["proj"]["kernel"].shape == (16, 128)
        assert params["ff"]["net_2"]["kernel"].shape == (64, 16)
