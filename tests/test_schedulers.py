import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mvldm_tpu.diffusion.schedulers import (
    DDIMScheduler,
    DDIMSchedulerKwargs,
    DDPMScheduler,
    DDPMSchedulerKwargs,
    SchedulerCfg,
    get_scheduler,
    leading_timesteps,
    make_betas,
)

# Live config: linear betas 1e-4 -> 0.02, 1000 steps, epsilon prediction,
# clip_sample False, set_alpha_to_one True (reference config/model/scheduler/ddim.yaml).
LIVE_KW = DDIMSchedulerKwargs(clip_sample=False, prediction_type="epsilon")


class TestBetasAndTimesteps:
    def test_linear_betas(self):
        betas = make_betas("linear", 1000, 1e-4, 0.02)
        assert betas.shape == (1000,)
        assert betas[0] == pytest.approx(1e-4)
        assert betas[-1] == pytest.approx(0.02)
        # Uniform spacing.
        np.testing.assert_allclose(np.diff(betas), np.diff(betas)[0], rtol=1e-10)

    def test_scaled_linear_betas(self):
        betas = make_betas("scaled_linear", 1000, 0.00085, 0.012)
        assert betas[0] == pytest.approx(0.00085)
        assert betas[-1] == pytest.approx(0.012)

    def test_leading_timesteps_25(self):
        ts = leading_timesteps(1000, 25)
        assert ts.shape == (25,)
        assert ts[0] == 960 and ts[-1] == 0
        np.testing.assert_array_equal(np.diff(ts), -40)

    def test_leading_timesteps_70(self):
        # 1000 // 70 = 14 -> descending multiples of 14.
        ts = leading_timesteps(1000, 70)
        assert ts[0] == 14 * 69 and ts[-1] == 0
        np.testing.assert_array_equal(ts, (np.arange(70) * 14)[::-1])


class TestDDIM:
    def test_alpha_tables(self):
        sch = DDIMScheduler.create(LIVE_KW, num_inference_steps=25)
        betas = make_betas("linear", 1000, 1e-4, 0.02)
        np.testing.assert_allclose(
            np.asarray(sch.alphas_cumprod), np.cumprod(1 - betas), rtol=1e-6
        )
        assert float(sch.final_alpha_cumprod) == 1.0

    def test_add_noise_formula(self):
        sch = DDIMScheduler.create(LIVE_KW)
        x0 = jnp.ones((2, 3, 4, 4))
        noise = jnp.full((2, 3, 4, 4), 0.5)
        t = jnp.asarray([100, 900])
        noisy = sch.add_noise(x0, noise, t)
        a = np.asarray(sch.alphas_cumprod)[np.asarray(t)]
        per_batch = np.sqrt(a) * 1.0 + np.sqrt(1 - a) * 0.5  # (2,)
        expected = np.broadcast_to(per_batch[:, None, None, None], (2, 3, 4, 4))
        np.testing.assert_allclose(np.asarray(noisy), expected, rtol=1e-5)

    def test_perfect_epsilon_recovers_x0(self):
        """DDIM with the true epsilon at every step must land exactly on x0."""
        sch = DDIMScheduler.create(LIVE_KW, num_inference_steps=25)
        rng = jax.random.PRNGKey(0)
        k1, k2 = jax.random.split(rng)
        x0 = jax.random.normal(k1, (1, 4, 8, 8))
        eps = jax.random.normal(k2, (1, 4, 8, 8))

        ts = sch.timesteps()
        x = sch.add_noise(x0, eps, jnp.asarray([ts[0]]))
        for t in ts:
            # The exact epsilon for x_t = sqrt(a)x0 + sqrt(1-a)eps is eps itself
            # only at the t where x was noised; re-derive per step instead:
            a = sch.alphas_cumprod[t]
            true_eps = (x - jnp.sqrt(a) * x0) / jnp.sqrt(1 - a)
            x = sch.step(true_eps, int(t), x)
        np.testing.assert_allclose(np.asarray(x), np.asarray(x0), atol=1e-4)

    def test_step_under_scan(self):
        """The whole DDIM loop must run inside lax.scan with traced timesteps."""
        sch = DDIMScheduler.create(LIVE_KW, num_inference_steps=10)
        x = jax.random.normal(jax.random.PRNGKey(0), (1, 4, 8, 8))
        ts = jnp.asarray(sch.timesteps())

        def body(x, t):
            return sch.step(jnp.zeros_like(x) + 0.1, t, x), None

        scanned, _ = jax.lax.scan(body, x, ts)
        looped = x
        for t in sch.timesteps():
            looped = sch.step(jnp.zeros_like(x) + 0.1, int(t), looped)
        np.testing.assert_allclose(np.asarray(scanned), np.asarray(looped), rtol=1e-5)

    def test_v_prediction_consistency(self):
        kw = DDIMSchedulerKwargs(clip_sample=False, prediction_type="v_prediction")
        sch = DDIMScheduler.create(kw, num_inference_steps=25)
        rng = jax.random.PRNGKey(1)
        k1, k2 = jax.random.split(rng)
        x0 = jax.random.normal(k1, (1, 4, 8, 8))
        eps = jax.random.normal(k2, (1, 4, 8, 8))
        ts = sch.timesteps()
        x = sch.add_noise(x0, eps, jnp.asarray([ts[0]]))
        for t in ts:
            a = sch.alphas_cumprod[t]
            true_eps = (x - jnp.sqrt(a) * x0) / jnp.sqrt(1 - a)
            v = sch.get_velocity(x0, true_eps, jnp.asarray([t]))
            x = sch.step(v, int(t), x)
        np.testing.assert_allclose(np.asarray(x), np.asarray(x0), atol=1e-4)

    def test_final_step_uses_alpha_one(self):
        sch = DDIMScheduler.create(LIVE_KW, num_inference_steps=25)
        x = jnp.ones((1, 4, 2, 2))
        eps = jnp.zeros_like(x)
        out = sch.step(eps, 0, x)
        # t=0, prev_t=-40 -> alpha_prev = 1; eps=0 -> out = x0 = x / sqrt(a_0).
        expected = np.asarray(x) / np.sqrt(np.asarray(sch.alphas_cumprod)[0])
        np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-5)


class TestDDPM:
    def test_perfect_epsilon_mean_path_recovers_x0(self):
        kw = DDPMSchedulerKwargs(clip_sample=False)
        sch = DDPMScheduler.create(kw, num_inference_steps=50)
        rng = jax.random.PRNGKey(2)
        k1, k2 = jax.random.split(rng)
        x0 = jax.random.normal(k1, (1, 4, 8, 8))
        eps = jax.random.normal(k2, (1, 4, 8, 8))
        ts = sch.timesteps()
        x = sch.add_noise(x0, eps, jnp.asarray([ts[0]]))
        for t in ts:
            a = sch.alphas_cumprod[t]
            true_eps = (x - jnp.sqrt(a) * x0) / jnp.sqrt(1 - a)
            x = sch.step(true_eps, int(t), x)  # mean path (no rng)
        np.testing.assert_allclose(np.asarray(x), np.asarray(x0), atol=1e-3)


class TestRegistry:
    def test_get_scheduler_ddim_from_dict_kwargs(self):
        cfg = SchedulerCfg(
            name="ddim",
            num_train_timesteps=1000,
            num_inference_steps=70,
            kwargs=dict(
                num_train_timesteps=1000,
                clip_sample=False,
                prediction_type="epsilon",
                beta_start=0.0001,
                beta_end=0.02,
                beta_schedule="linear",
                trained_betas=None,
                set_alpha_to_one=True,
                steps_offset=0,
            ),
        )
        sch = get_scheduler(cfg)
        assert isinstance(sch, DDIMScheduler)
        assert sch.num_inference_steps == 70
        assert not sch.clip_sample


class TestHardCodedGoldens:
    """Regression goldens with literal values derived INDEPENDENTLY of the
    implementation (float64 direct product loop over
    beta_t = 1e-4 + (0.02 - 1e-4) * t / 999, abar_t = prod_{i<=t}(1 - beta_i);
    DDIM step by the closed form of Song et al. eq. 12 with eta=0).
    Self-consistency tests cannot catch a formula edit that shifts the whole
    schedule; these literals can."""

    def test_alpha_bar_literals(self):
        sched = DDIMScheduler.create(LIVE_KW, num_inference_steps=25)
        abar = np.asarray(sched.alphas_cumprod, dtype=np.float64)
        # abar_0 = 1 - 1e-4
        np.testing.assert_allclose(abar[0], 0.9999, rtol=1e-6)
        # abar_1 = (1 - 1e-4) * (1 - (1e-4 + 0.0199/999))
        np.testing.assert_allclose(abar[1], 0.9997800920720721, rtol=1e-6)
        np.testing.assert_allclose(abar[500], 0.07779665836502386, rtol=1e-5)
        np.testing.assert_allclose(abar[999], 4.0358297653756754e-05, rtol=1e-4)
        # set_alpha_to_one: the final-step denominator is exactly 1.
        assert float(sched.final_alpha_cumprod) == 1.0

    def test_leading_timesteps_25_literal(self):
        # step_ratio = 1000 // 25 = 40: descending multiples of 40 from 960.
        sched = DDIMScheduler.create(LIVE_KW, num_inference_steps=25)
        expected = [
            960, 920, 880, 840, 800, 760, 720, 680, 640, 600, 560, 520,
            480, 440, 400, 360, 320, 280, 240, 200, 160, 120, 80, 40, 0,
        ]
        assert sched.timesteps().tolist() == expected

    def test_ddim_step_literal(self):
        """One epsilon-prediction step at t=960 (25-step schedule, prev=920)
        on pinned scalars x=1.0, model_output=0.5:
          x0   = (1 - sqrt(1-abar_960)*0.5) / sqrt(abar_960) = 53.48116255...
          prev = sqrt(abar_920)*x0 + sqrt(1-abar_920)*0.5    = 1.23133728...
        (abar_960 = 8.741305391e-05, abar_920 = 1.8702052817e-04)."""
        sched = DDIMScheduler.create(LIVE_KW, num_inference_steps=25)
        x = jnp.full((1, 2, 2, 1), 1.0)
        eps = jnp.full((1, 2, 2, 1), 0.5)
        prev = np.asarray(sched.step(eps, 960, x))
        np.testing.assert_allclose(prev, 1.2313372821957966, rtol=2e-4)

    def test_ddim_final_step_literal(self):
        """t=0 -> prev_t < 0 -> alpha_prev = 1 (set_alpha_to_one), so the
        output IS pred_x0 = (1 - sqrt(1-0.9999)*0.5)/sqrt(0.9999)."""
        sched = DDIMScheduler.create(LIVE_KW, num_inference_steps=25)
        x = jnp.full((3,), 1.0)
        eps = jnp.full((3,), 0.5)
        prev = np.asarray(sched.step(eps, 0, x))
        np.testing.assert_allclose(prev, 0.9950497537315612, rtol=1e-5)

    def test_add_noise_literal(self):
        """add_noise(1.0, 0.5, t=500) = sqrt(abar_500) + sqrt(1-abar_500)*0.5."""
        sched = DDIMScheduler.create(LIVE_KW, num_inference_steps=25)
        out = np.asarray(
            sched.add_noise(
                jnp.ones((1, 4)), jnp.full((1, 4), 0.5), jnp.asarray([500])
            )
        )
        np.testing.assert_allclose(out, 0.7590776178948713, rtol=1e-5)
