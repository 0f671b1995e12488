import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mvldm_tpu.ops.attention import NEG_INF, attention, flash_attention, mha_reference


def make_qkv(key, b=2, h=4, lq=64, lk=64, d=64, dtype=jnp.float32):
    k1, k2, k3 = jax.random.split(key, 3)
    q = jax.random.normal(k1, (b, h, lq, d), dtype=dtype)
    k = jax.random.normal(k2, (b, h, lk, d), dtype=dtype)
    v = jax.random.normal(k3, (b, h, lk, d), dtype=dtype)
    return q, k, v


class TestReferenceAttention:
    def test_matches_torch_sdpa(self):
        """Ground-truth check against torch's scaled_dot_product_attention —
        the exact op the reference uses (transformer/attention.py:96)."""
        import torch

        q, k, v = make_qkv(jax.random.PRNGKey(0))
        out = mha_reference(q, k, v)
        tq, tk, tv = (torch.from_numpy(np.asarray(x)) for x in (q, k, v))
        expected = torch.nn.functional.scaled_dot_product_attention(tq, tk, tv)
        np.testing.assert_allclose(
            np.asarray(out), expected.numpy(), atol=2e-5, rtol=2e-5
        )

    def test_key_bias_masks_keys(self):
        q, k, v = make_qkv(jax.random.PRNGKey(1), lk=32)
        bias = jnp.zeros((2, 32)).at[:, 16:].set(NEG_INF)
        out = mha_reference(q, k, v, bias)
        expected = mha_reference(q, k[:, :, :16], v[:, :, :16])
        np.testing.assert_allclose(np.asarray(out), np.asarray(expected), atol=1e-5)


class TestFlashAttention:
    @pytest.mark.parametrize("lq,lk", [(64, 64), (128, 256), (100, 300), (1024, 1024)])
    def test_matches_reference(self, lq, lk):
        q, k, v = make_qkv(jax.random.PRNGKey(2), lq=lq, lk=lk)
        out = flash_attention(q, k, v, interpret=True, block_q=128, block_k=128)
        expected = mha_reference(q, k, v)
        np.testing.assert_allclose(np.asarray(out), np.asarray(expected), atol=2e-5)

    def test_with_bias(self):
        q, k, v = make_qkv(jax.random.PRNGKey(3), lq=128, lk=192)
        bias = jnp.where(
            jax.random.bernoulli(jax.random.PRNGKey(4), 0.3, (2, 192)), NEG_INF, 0.0
        ).astype(jnp.float32)
        out = flash_attention(q, k, v, bias, interpret=True, block_q=128, block_k=128)
        expected = mha_reference(q, k, v, bias)
        np.testing.assert_allclose(np.asarray(out), np.asarray(expected), atol=2e-5)

    def test_bfloat16(self):
        q, k, v = make_qkv(jax.random.PRNGKey(5), lq=256, lk=256, dtype=jnp.bfloat16)
        out = flash_attention(q, k, v, interpret=True)
        expected = mha_reference(q, k, v)
        np.testing.assert_allclose(
            np.asarray(out, dtype=np.float32),
            np.asarray(expected, dtype=np.float32),
            atol=3e-2,
        )


class TestFlashBackward:
    """Pallas FlashAttention-2 backward (interpret mode) vs autodiff of the
    jnp reference."""

    def _ref_grads(self, q, k, v, bias, g):
        if bias is None:
            _, vjp = jax.vjp(lambda a, b, c: mha_reference(a, b, c), q, k, v)
            return vjp(g) + (None,)
        _, vjp = jax.vjp(
            lambda a, b, c, d: mha_reference(a, b, c, d), q, k, v, bias
        )
        return vjp(g)

    @pytest.mark.parametrize("lq,lk,d", [(128, 128, 64), (100, 300, 40)])
    def test_grads_match_reference(self, lq, lk, d):
        import math

        from mvldm_tpu.ops.attention import flash_attention, flash_attention_bwd

        q, k, v = make_qkv(jax.random.PRNGKey(11), b=2, h=2, lq=lq, lk=lk, d=d)
        g = jax.random.normal(jax.random.PRNGKey(12), (2, 2, lq, d))
        out, lse = flash_attention(
            q, k, v, return_lse=True, interpret=True, block_q=128, block_k=128
        )
        dq, dk, dv, db = flash_attention_bwd(
            q, k, v, None, out, lse, g, 1.0 / math.sqrt(d),
            block_q=128, block_k=128, interpret=True,
        )
        assert db is None
        rdq, rdk, rdv, _ = self._ref_grads(q, k, v, None, g)
        np.testing.assert_allclose(np.asarray(dq), np.asarray(rdq), atol=1e-4)
        np.testing.assert_allclose(np.asarray(dk), np.asarray(rdk), atol=1e-4)
        np.testing.assert_allclose(np.asarray(dv), np.asarray(rdv), atol=1e-4)

    def test_grads_with_bias_and_dbias(self):
        import math

        from mvldm_tpu.ops.attention import flash_attention, flash_attention_bwd

        b, h, lq, lk, d = 2, 2, 100, 200, 40
        q, k, v = make_qkv(jax.random.PRNGKey(13), b=b, h=h, lq=lq, lk=lk, d=d)
        bias = jnp.where(
            jax.random.bernoulli(jax.random.PRNGKey(14), 0.3, (b, lk)),
            NEG_INF, 0.0,
        ).astype(jnp.float32)
        g = jax.random.normal(jax.random.PRNGKey(15), (b, h, lq, d))
        out, lse = flash_attention(
            q, k, v, bias, return_lse=True, interpret=True,
            block_q=128, block_k=128,
        )
        dq, dk, dv, db = flash_attention_bwd(
            q, k, v, bias, out, lse, g, 1.0 / math.sqrt(d),
            block_q=128, block_k=128, interpret=True,
        )
        rdq, rdk, rdv, rdb = self._ref_grads(q, k, v, bias, g)
        np.testing.assert_allclose(np.asarray(dq), np.asarray(rdq), atol=1e-4)
        np.testing.assert_allclose(np.asarray(dk), np.asarray(rdk), atol=1e-4)
        np.testing.assert_allclose(np.asarray(dv), np.asarray(rdv), atol=1e-4)
        np.testing.assert_allclose(
            np.asarray(db[:, 0, :, 0]), np.asarray(rdb), atol=1e-4
        )

    def test_dispatcher_end_to_end_interpret(self, monkeypatch):
        """MVLDM_FLASH_BWD=interpret routes attention()'s VJP through the
        Pallas forward+backward (interpreted on CPU); grads must match the
        jnp autodiff reference, including dbias."""
        monkeypatch.setenv("MVLDM_FLASH_BWD", "interpret")
        b, h, lq, lk, d = 1, 2, 130, 140, 32
        q, k, v = make_qkv(jax.random.PRNGKey(16), b=b, h=h, lq=lq, lk=lk, d=d)
        bias = jnp.zeros((b, lk)).at[:, 120:].set(NEG_INF)

        def loss_custom(q, k, v, bias):
            return jnp.sum(attention(q, k, v, bias) ** 2)

        def loss_ref(q, k, v, bias):
            return jnp.sum(mha_reference(q, k, v, bias) ** 2)

        g_custom = jax.grad(loss_custom, argnums=(0, 1, 2, 3))(q, k, v, bias)
        g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(q, k, v, bias)
        for gc, gr in zip(g_custom, g_ref):
            np.testing.assert_allclose(
                np.asarray(gc), np.asarray(gr), atol=1e-4
            )

    def test_wide_head_clamps_blocks(self):
        """d=160 (the c1280 attention stage) trips the d>128 VMEM-pressure
        block clamp in flash_attention_bwd when called with default block
        sizes; gradients must still match."""
        import math

        from mvldm_tpu.ops.attention import flash_attention, flash_attention_bwd

        b, h, lq, lk, d = 1, 2, 256, 256, 160
        q, k, v = make_qkv(jax.random.PRNGKey(18), b=b, h=h, lq=lq, lk=lk, d=d)
        g = jax.random.normal(jax.random.PRNGKey(19), (b, h, lq, d))
        out, lse = flash_attention(q, k, v, return_lse=True, interpret=True)
        dq, dk, dv, _ = flash_attention_bwd(
            q, k, v, None, out, lse, g, 1.0 / math.sqrt(d), interpret=True
        )
        rdq, rdk, rdv, _ = self._ref_grads(q, k, v, None, g)
        np.testing.assert_allclose(np.asarray(dq), np.asarray(rdq), atol=2e-4)
        np.testing.assert_allclose(np.asarray(dk), np.asarray(rdk), atol=2e-4)
        np.testing.assert_allclose(np.asarray(dv), np.asarray(rdv), atol=2e-4)

    def test_forward_lse_matches_reference(self):
        import math

        from mvldm_tpu.ops.attention import flash_attention

        q, k, v = make_qkv(jax.random.PRNGKey(17), lq=100, lk=300, d=40)
        out, lse = flash_attention(
            q, k, v, return_lse=True, interpret=True, block_q=128, block_k=128
        )
        scale = 1.0 / math.sqrt(40)
        s = jnp.einsum("bhqd,bhkd->bhqk", q, k) * scale
        ref_lse = jax.scipy.special.logsumexp(s, axis=-1)[..., None]
        np.testing.assert_allclose(np.asarray(lse), np.asarray(ref_lse),
                                   atol=1e-4)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(mha_reference(q, k, v)), atol=2e-5
        )


class TestAttentionDispatcher:
    def test_forward_cpu_path(self):
        q, k, v = make_qkv(jax.random.PRNGKey(6))
        out = attention(q, k, v)
        expected = mha_reference(q, k, v)
        np.testing.assert_allclose(np.asarray(out), np.asarray(expected), atol=1e-6)

    def test_gradients_match_jnp_autodiff(self):
        q, k, v = make_qkv(jax.random.PRNGKey(7), b=1, h=2, lq=16, lk=16, d=8)

        def loss_custom(q, k, v):
            return jnp.sum(attention(q, k, v) ** 2)

        def loss_ref(q, k, v):
            return jnp.sum(mha_reference(q, k, v) ** 2)

        g_custom = jax.grad(loss_custom, argnums=(0, 1, 2))(q, k, v)
        g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
        for gc, gr in zip(g_custom, g_ref):
            np.testing.assert_allclose(np.asarray(gc), np.asarray(gr), atol=1e-5)

    def test_gradients_chunked_backward(self, monkeypatch):
        """Lq > _BWD_CHUNK exercises the lax.scan query-chunked backward,
        including the zero-padded ragged final chunk."""
        import importlib

        attn_mod = importlib.import_module("mvldm_tpu.ops.attention")

        monkeypatch.setattr(attn_mod, "_BWD_CHUNK", 8)
        q, k, v = make_qkv(jax.random.PRNGKey(9), b=1, h=2, lq=21, lk=16, d=8)
        bias = jnp.zeros((1, 16)).at[:, 12:].set(NEG_INF)

        def loss_custom(q, k, v, bias):
            return jnp.sum(attention(q, k, v, bias) ** 2)

        def loss_ref(q, k, v, bias):
            return jnp.sum(mha_reference(q, k, v, bias) ** 2)

        g_custom = jax.grad(loss_custom, argnums=(0, 1, 2, 3))(q, k, v, bias)
        g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(q, k, v, bias)
        for gc, gr in zip(g_custom, g_ref):
            np.testing.assert_allclose(np.asarray(gc), np.asarray(gr), atol=1e-5)

    def test_gradients_with_bias(self):
        q, k, v = make_qkv(jax.random.PRNGKey(8), b=2, h=2, lq=8, lk=12, d=8)
        bias = jnp.zeros((2, 12)).at[:, 8:].set(NEG_INF)

        def loss_custom(q, k, v):
            return jnp.sum(attention(q, k, v, bias) ** 2)

        def loss_ref(q, k, v):
            return jnp.sum(mha_reference(q, k, v, bias) ** 2)

        g_custom = jax.grad(loss_custom, argnums=(0, 1, 2))(q, k, v)
        g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
        for gc, gr in zip(g_custom, g_ref):
            np.testing.assert_allclose(np.asarray(gc), np.asarray(gr), atol=1e-5)
