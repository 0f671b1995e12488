"""Explicit shard_map partitioning of the Pallas-backed ops
(``parallel/tp.run_manual``).

Mosaic kernels cannot be auto-partitioned by XLA's SPMD pass — a
multi-device jit that reaches one outside a shard_map fails to lower
("Please wrap the call in a shard_map", jax's tpu_custom_call) — so when a
mesh is published, ops/attention, ops/fused_attn and ops/fused_ff route
their forward through a shard_map over ALL mesh axes. These tests pin the
wrapper's semantics on the virtual CPU mesh (where the same wrapping
encloses the XLA fallback path): wrapped == direct, for every divisibility
case, values and gradients.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mvldm_tpu.ops.attention import attention
from mvldm_tpu.ops.fused_attn import fused_ln_self_attention
from mvldm_tpu.ops.fused_ff import fused_ln_geglu_ff
from mvldm_tpu.parallel.mesh import make_mesh
from mvldm_tpu.parallel import tp


@pytest.fixture
def mesh42():
    mesh = make_mesh(num_data=4, num_model=2)
    tp.set_active_mesh(mesh)
    yield mesh
    tp.set_active_mesh(None)


def rand(key, shape, dtype=jnp.float32):
    return jax.random.normal(jax.random.PRNGKey(key), shape, dtype)


class TestRunManualAttention:
    @pytest.mark.parametrize("b", [8, 16, 4, 3])
    def test_wrapped_matches_direct(self, mesh42, b):
        """b=8/16: shards over data*model; b=4: data only; b=3: fully
        replicated compute. All must equal the no-mesh result exactly."""
        q = rand(0, (b, 2, 16, 8))
        k = rand(1, (b, 2, 16, 8))
        v = rand(2, (b, 2, 16, 8))
        wrapped = jax.jit(attention)(q, k, v)
        tp.set_active_mesh(None)
        direct = jax.jit(attention)(q, k, v)
        np.testing.assert_allclose(
            np.asarray(wrapped), np.asarray(direct), rtol=1e-6, atol=1e-6
        )

    def test_wrapped_with_bias(self, mesh42):
        q = rand(0, (8, 2, 16, 8))
        k = rand(1, (8, 2, 16, 8))
        v = rand(2, (8, 2, 16, 8))
        bias = jnp.where(rand(3, (8, 16)) > 0, 0.0, -1e9)
        wrapped = jax.jit(attention)(q, k, v, bias)
        tp.set_active_mesh(None)
        direct = jax.jit(attention)(q, k, v, bias)
        np.testing.assert_allclose(
            np.asarray(wrapped), np.asarray(direct), rtol=1e-6, atol=1e-6
        )

    def test_gradients_match(self, mesh42):
        q = rand(0, (8, 2, 16, 8))
        k = rand(1, (8, 2, 16, 8))
        v = rand(2, (8, 2, 16, 8))

        def loss(q, k, v):
            return jnp.sum(attention(q, k, v) ** 2)

        gw = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))(q, k, v)
        tp.set_active_mesh(None)
        gd = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))(q, k, v)
        for a, b in zip(gw, gd):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5
            )

    def test_no_rewrap_inside_manual_region(self, mesh42):
        """head_sharded_attention's body calls attention() inside a
        manual_region — the prim must NOT wrap again (nested shard_map
        over the same mesh would fail)."""
        q = rand(0, (8, 2, 16, 8))
        k = rand(1, (8, 2, 16, 8))
        v = rand(2, (8, 2, 16, 8))
        out = tp.head_sharded_attention(mesh42, q, k, v)
        tp.set_active_mesh(None)
        direct = attention(q, k, v)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(direct), rtol=1e-6, atol=1e-6
        )


class TestRunManualFusedBlocks:
    @pytest.mark.parametrize("n", [8, 6])
    def test_fused_attn_wrapped_matches_direct(self, mesh42, n):
        c, heads, hd = 32, 2, 16
        x = rand(0, (n, 8, c))
        args = (
            rand(1, (c,)), rand(2, (c,)),
            rand(3, (c, heads * hd)) * 0.1, rand(4, (c, heads * hd)) * 0.1,
            rand(5, (c, heads * hd)) * 0.1, rand(6, (heads * hd, c)) * 0.1,
            rand(7, (c,)) * 0.1,
        )
        wrapped = fused_ln_self_attention(x, *args, num_heads=heads,
                                          head_dim=hd)
        tp.set_active_mesh(None)
        direct = fused_ln_self_attention(x, *args, num_heads=heads,
                                         head_dim=hd)
        np.testing.assert_allclose(
            np.asarray(wrapped), np.asarray(direct), rtol=1e-6, atol=1e-6
        )

    def test_fused_ff_wrapped_matches_direct_and_grads(self, mesh42):
        c = 32
        x = rand(0, (8, 8, c))
        args = (
            rand(1, (c,)), rand(2, (c,)),
            rand(3, (c, 8 * c)) * 0.1, rand(4, (8 * c,)) * 0.1,
            rand(5, (4 * c, c)) * 0.1, rand(6, (c,)) * 0.1,
        )

        def loss(x, *args):
            return jnp.sum(fused_ln_geglu_ff(x, *args) ** 2)

        out_w = fused_ln_geglu_ff(x, *args)
        g_w = jax.grad(loss)(x, *args)
        tp.set_active_mesh(None)
        out_d = fused_ln_geglu_ff(x, *args)
        g_d = jax.grad(loss)(x, *args)
        np.testing.assert_allclose(
            np.asarray(out_w), np.asarray(out_d), rtol=1e-6, atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(g_w), np.asarray(g_d), rtol=1e-5, atol=1e-5
        )
