"""Low-precision-moment AdamW (`training/optim.py scale_by_adam_lp`).

The reference trains with torch AdamW in full precision
(``diffusion_wrapper.py:1092-1112``); the LP variant is a TPU-side memory/
bandwidth optimization and must (a) be exactly optax when storage is f32,
(b) store the requested dtypes, (c) stay unbiased under bf16 storage —
round-to-nearest provably freezes the b2=0.999 second-moment EMA.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from mvldm_tpu.config import OptimizerCfg
from mvldm_tpu.training.optim import (
    adamw_lp,
    build_lr_schedule,
    build_optimizer,
    scale_by_adam_lp,
    stochastic_round,
)


def tree_close(a, b, **kw):
    jax.tree_util.tree_map(
        lambda x, y: np.testing.assert_allclose(
            np.asarray(x, np.float64), np.asarray(y, np.float64), **kw
        ),
        a,
        b,
    )


class TestStochasticRound:
    def test_exact_values_pass_through(self):
        # bf16-representable values round to themselves for every key.
        x = jnp.asarray([0.5, -2.0, 1.0, 0.0, 3.140625], jnp.float32)
        for seed in range(4):
            out = stochastic_round(x, jnp.bfloat16, jax.random.PRNGKey(seed))
            np.testing.assert_array_equal(
                np.asarray(out, np.float32), np.asarray(x)
            )

    def test_unbiased(self):
        # E[round(x)] == x to within Monte-Carlo error, including negatives.
        x = jnp.full((4096,), 1.0 + 1.0 / 512.0, jnp.float32)  # halfway point
        for val in (1.0 + 1.0 / 512.0, -0.3337, 1e-12):
            x = jnp.full((8192,), val, jnp.float32)
            rounded = stochastic_round(
                x, jnp.bfloat16, jax.random.PRNGKey(7)
            ).astype(jnp.float32)
            mean = float(jnp.mean(rounded.astype(jnp.float64)))
            assert mean == pytest.approx(val, rel=2e-3), val

    def test_ema_survives_bf16_storage(self):
        # The motivating property: nu = 0.999*nu + 0.001*g^2 with g=1 must
        # approach 1. Round-to-nearest bf16 freezes at ~0.25 (increment
        # below half-ULP); stochastic rounding tracks the true EMA.
        def run(sr: bool):
            nu = jnp.asarray(0.25, jnp.bfloat16)
            for i in range(2000):
                nu32 = 0.999 * nu.astype(jnp.float32) + 0.001
                if sr:
                    nu = stochastic_round(
                        nu32, jnp.bfloat16, jax.random.PRNGKey(i)
                    )
                else:
                    nu = nu32.astype(jnp.bfloat16)
            return float(nu)

        frozen = run(sr=False)
        tracked = run(sr=True)
        true = float(1 - (1 - 0.25) * 0.999**2000)  # ~0.899
        assert frozen == pytest.approx(0.25, abs=0.02)  # RN is stuck
        assert tracked == pytest.approx(true, rel=0.05)


class TestScaleByAdamLP:
    def _grads(self, key, shapes=((7,), (3, 5))):
        ks = jax.random.split(key, len(shapes))
        return {
            f"w{i}": jax.random.normal(k, s, jnp.float32)
            for i, (k, s) in enumerate(zip(ks, shapes))
        }

    def test_f32_matches_optax_exactly(self):
        params = self._grads(jax.random.PRNGKey(0))
        ours, ref = scale_by_adam_lp(), optax.scale_by_adam()
        s_ours, s_ref = ours.init(params), ref.init(params)
        for i in range(5):
            g = self._grads(jax.random.PRNGKey(10 + i))
            u_ours, s_ours = ours.update(g, s_ours)
            u_ref, s_ref = ref.update(g, s_ref)
            tree_close(u_ours, u_ref, rtol=1e-6)
        tree_close(s_ours.mu, s_ref.mu, rtol=1e-6)
        tree_close(s_ours.nu, s_ref.nu, rtol=1e-6)

    def test_adamw_lp_f32_matches_optax_adamw(self):
        params = self._grads(jax.random.PRNGKey(1))
        sched = build_lr_schedule(1e-3, None)
        ours = adamw_lp(sched, weight_decay=0.01)
        ref = optax.adamw(sched, weight_decay=0.01)
        s_ours, s_ref = ours.init(params), ref.init(params)
        p_ours = p_ref = params
        for i in range(4):
            g = self._grads(jax.random.PRNGKey(20 + i))
            u, s_ours = ours.update(g, s_ours, p_ours)
            p_ours = optax.apply_updates(p_ours, u)
            u, s_ref = ref.update(g, s_ref, p_ref)
            p_ref = optax.apply_updates(p_ref, u)
        tree_close(p_ours, p_ref, rtol=1e-6)

    def test_bf16_storage_dtypes_and_convergence(self):
        # Quadratic bowl: LP AdamW must land near the optimum like f32 AdamW.
        target = jnp.asarray([1.0, -2.0, 0.5], jnp.float32)
        params = {"w": jnp.zeros(3, jnp.float32)}
        tx = adamw_lp(
            build_lr_schedule(5e-2, None),
            mu_dtype=jnp.bfloat16,
            nu_dtype=jnp.bfloat16,
            weight_decay=0.0,
        )
        state = tx.init(params)
        assert state[0].mu["w"].dtype == jnp.bfloat16
        assert state[0].nu["w"].dtype == jnp.bfloat16

        @jax.jit
        def step(params, state):
            g = jax.grad(lambda p: jnp.sum((p["w"] - target) ** 2))(params)
            u, state = tx.update(g, state, params)
            return optax.apply_updates(params, u), state

        for _ in range(300):
            params, state = step(params, state)
        np.testing.assert_allclose(
            np.asarray(params["w"]), np.asarray(target), atol=0.05
        )

    def test_build_optimizer_nu_dtype_path(self):
        tx = build_optimizer(
            OptimizerCfg(
                name="AdamW",
                lr=1e-4,
                scale_lr=False,
                kwargs={"mu_dtype": "bfloat16", "nu_dtype": "bfloat16"},
            ),
            build_lr_schedule(1e-4, None),
            gradient_clip_val=0.1,
        )
        params = {"w": jnp.ones((4, 4), jnp.float32)}
        state = tx.init(params)
        lp = [
            s for s in jax.tree_util.tree_leaves(
                state, is_leaf=lambda x: hasattr(x, "nu")
            ) if hasattr(x := s, "nu")
        ]
        assert lp and lp[0].nu["w"].dtype == jnp.bfloat16
        g = {"w": jnp.full((4, 4), 0.1, jnp.float32)}
        u, _ = tx.update(g, state, params)
        assert jnp.all(jnp.isfinite(u["w"]))

    def test_build_optimizer_adafactor(self):
        tx = build_optimizer(
            OptimizerCfg(name="Adafactor", lr=1e-4, scale_lr=False),
            build_lr_schedule(1e-4, None),
            gradient_clip_val=0.1,
        )
        params = {"w": jnp.ones((256, 128), jnp.float32)}
        state = tx.init(params)
        # Factored: no full-shape second moment anywhere in the state.
        big = [
            l for l in jax.tree_util.tree_leaves(state)
            if getattr(l, "shape", ()) == (256, 128)
        ]
        assert not big
        g = {"w": jnp.full((256, 128), 0.1, jnp.float32)}
        u, _ = tx.update(g, state, params)
        assert jnp.all(jnp.isfinite(u["w"]))
