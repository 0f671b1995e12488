"""Fused LN->self-attention->proj->residual kernel (ops/fused_attn.py):
head-padding exactness, interpret-mode kernel parity, gradients, and the
module parameter-tree contract."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mvldm_tpu.ops.fused_attn import (
    LANE,
    _attn_jnp,
    _attn_pallas,
    fused_ln_self_attention,
    pad_heads,
)


def make_inputs(n=2, l=64, c=32, heads=4, d=8, seed=0):
    keys = jax.random.split(jax.random.PRNGKey(seed), 8)
    inner = heads * d
    x = jax.random.normal(keys[0], (n, l, c))
    ln_s = jax.random.uniform(keys[1], (c,)) + 0.5
    ln_b = jax.random.normal(keys[2], (c,)) * 0.1
    wq = jax.random.normal(keys[3], (c, inner)) * 0.1
    wk = jax.random.normal(keys[4], (c, inner)) * 0.1
    wv = jax.random.normal(keys[5], (c, inner)) * 0.1
    wo = jax.random.normal(keys[6], (inner, c)) * 0.1
    bo = jax.random.normal(keys[7], (c,)) * 0.01
    return x, ln_s, ln_b, wq, wk, wv, wo, bo


def decomposed_reference(x, ln_s, ln_b, wq, wk, wv, wo, bo, heads, d):
    """The pre-fusion stack on UNPADDED weights."""
    import flax.linen as nn

    from mvldm_tpu.ops.attention import mha_reference

    h = nn.LayerNorm(dtype=jnp.float32).apply(
        {"params": {"scale": ln_s, "bias": ln_b}}, x.astype(jnp.float32)
    ).astype(x.dtype)
    n, l, c = x.shape
    q = jnp.dot(h, wq).reshape(n, l, heads, d).transpose(0, 2, 1, 3)
    k = jnp.dot(h, wk).reshape(n, l, heads, d).transpose(0, 2, 1, 3)
    v = jnp.dot(h, wv).reshape(n, l, heads, d).transpose(0, 2, 1, 3)
    o = mha_reference(q, k, v).transpose(0, 2, 1, 3).reshape(n, l, heads * d)
    return x + jnp.dot(o, wo) + bo


class TestPadHeads:
    def test_layout(self):
        w = jnp.arange(2 * 8, dtype=jnp.float32).reshape(2, 8)  # 2 heads, d=4
        p = pad_heads(w, num_heads=2, head_dim=4, axis=1)
        assert p.shape == (2, 2 * LANE)
        np.testing.assert_array_equal(np.asarray(p[:, :4]), np.asarray(w[:, :4]))
        assert float(jnp.abs(p[:, 4:LANE]).max()) == 0
        np.testing.assert_array_equal(
            np.asarray(p[:, LANE:LANE + 4]), np.asarray(w[:, 4:])
        )

    def test_identity_at_128(self):
        w = jnp.ones((4, 2 * LANE))
        assert pad_heads(w, 2, LANE, axis=1) is w


class TestFusedSelfAttention:
    def test_matches_decomposed_reference(self):
        args = make_inputs()
        got = fused_ln_self_attention(*args, num_heads=4, head_dim=8)
        want = decomposed_reference(*args, heads=4, d=8)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-4, rtol=1e-4)

    def test_pallas_interpret_matches_jnp(self):
        x, ln_s, ln_b, wq, wk, wv, wo, bo = make_inputs(l=128)
        pq = pad_heads(wq, 4, 8, 1)
        pk = pad_heads(wk, 4, 8, 1)
        pv = pad_heads(wv, 4, 8, 1)
        po = pad_heads(wo, 4, 8, 0)
        got = _attn_pallas(x, ln_s, ln_b, pq, pk, pv, po, bo,
                           num_heads=4, head_dim=8, interpret=True)
        want = _attn_jnp(x, ln_s, ln_b, pq, pk, pv, po, bo,
                         num_heads=4, head_dim=8)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-4, rtol=1e-4)

    def test_gradients_flow(self):
        args = make_inputs(l=16, c=8, heads=2, d=4)

        def loss(*a):
            return jnp.sum(
                fused_ln_self_attention(*a, num_heads=2, head_dim=4) ** 2
            )

        grads = jax.grad(loss, argnums=tuple(range(8)))(*args)
        for g, a in zip(grads, args):
            assert g.shape == a.shape
            assert np.isfinite(np.asarray(g)).all()

    def test_module_param_tree_contract(self):
        """TransformerBlock2D keeps norm1/attn1 param paths; SelfAttention
        convention: bias-free to_q/k/v, biased to_out."""
        from mvldm_tpu.models.layers import TransformerBlock2D

        m = TransformerBlock2D(num_heads=2, head_dim=8, context_dim=24)
        params = m.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 16, 16)), None
        )["params"]
        assert set(params["norm1"]) == {"scale", "bias"}
        a1 = params["attn1"]
        assert set(a1) == {"to_q", "to_k", "to_v", "to_out"}
        assert set(a1["to_q"]) == {"kernel"}
        assert set(a1["to_out"]) == {"kernel", "bias"}
        assert a1["to_q"]["kernel"].shape == (16, 16)

    def test_block3d_equivalence_with_previous_stack(self):
        """BasicTransformerBlock3D's fused attn2 path must match the
        decomposed LayerNorm+SelfAttention it replaced, given the same
        params."""
        from mvldm_tpu.models.mv_attention import BasicTransformerBlock3D

        m = BasicTransformerBlock3D(num_heads=2, head_dim=8)
        x = jax.random.normal(jax.random.PRNGKey(0), (4, 16, 16))
        params = m.init(jax.random.PRNGKey(1), x, num_views=2)["params"]
        out = m.apply({"params": params}, x, num_views=2)
        assert out.shape == x.shape
        assert np.isfinite(np.asarray(out)).all()
        a2 = params["attn2"]
        assert set(a2) == {"to_q", "to_k", "to_v", "to_out"}
