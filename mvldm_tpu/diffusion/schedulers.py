"""Diffusion noise schedulers in pure jnp.

Re-implements the scheduler math the reference delegates to diffusers
(``DDIMScheduler`` / ``DDPMScheduler``, built at reference
``src/model/scheduler/__init__.py:32-40`` with the live config
``config/model/scheduler/ddim.yaml``: 1000 train timesteps, linear betas
1e-4 -> 0.02, epsilon prediction, ``clip_sample=False``,
``set_alpha_to_one=True``, ``steps_offset=0``, "leading" timestep spacing).

Design for TPU: schedulers are immutable pytrees of precomputed tables; every
method is a pure function of (tables, traced timestep, traced tensors), so the
whole DDIM loop runs under one ``jax.lax.scan`` with gathered table entries —
no Python-level state, no recompiles across timesteps.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Literal, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax import Array


@dataclass
class DDIMSchedulerKwargs:
    """Mirrors the reference's DDIM kwargs dataclass (``scheduler/ddim.py:10-17``)."""

    num_train_timesteps: int = 1000
    beta_start: float = 0.0001
    beta_end: float = 0.02
    beta_schedule: str = "linear"
    trained_betas: Optional[Sequence[float]] = None
    clip_sample: bool = True
    clip_sample_range: float = 1.0
    set_alpha_to_one: bool = True
    steps_offset: int = 0
    prediction_type: str = "epsilon"
    timestep_spacing: str = "leading"


@dataclass
class DDPMSchedulerKwargs:
    """Mirrors the reference's DDPM kwargs dataclass (``scheduler/ddpm.py:10-25``)."""

    num_train_timesteps: int = 1000
    beta_start: float = 0.0001
    beta_end: float = 0.02
    beta_schedule: str = "linear"
    trained_betas: Optional[Sequence[float]] = None
    variance_type: str = "fixed_small"
    clip_sample: bool = True
    prediction_type: str = "epsilon"
    thresholding: bool = False
    dynamic_thresholding_ratio: float = 0.995
    clip_sample_range: float = 1.0
    sample_max_value: float = 1.0
    timestep_spacing: str = "leading"
    steps_offset: int = 0
    rescale_betas_zero_snr: bool = False


@dataclass
class SchedulerCfg:
    """Mirrors reference ``scheduler/__init__.py:11-17``."""

    name: Literal["ddim", "ddpm"]
    num_train_timesteps: int
    num_inference_steps: int
    pretrained_from: Optional[str] = None
    kwargs: Any = None


def make_betas(
    schedule: str,
    num_train_timesteps: int,
    beta_start: float,
    beta_end: float,
    trained_betas: Optional[Sequence[float]] = None,
) -> np.ndarray:
    if trained_betas is not None:
        return np.asarray(trained_betas, dtype=np.float64)
    if schedule == "linear":
        return np.linspace(beta_start, beta_end, num_train_timesteps, dtype=np.float64)
    if schedule == "scaled_linear":
        return (
            np.linspace(
                beta_start**0.5, beta_end**0.5, num_train_timesteps, dtype=np.float64
            )
            ** 2
        )
    if schedule == "squaredcos_cap_v2":
        # Glide cosine schedule.
        def alpha_bar(t):
            return np.cos((t + 0.008) / 1.008 * np.pi / 2) ** 2

        betas = []
        for i in range(num_train_timesteps):
            t1 = i / num_train_timesteps
            t2 = (i + 1) / num_train_timesteps
            betas.append(min(1 - alpha_bar(t2) / alpha_bar(t1), 0.999))
        return np.asarray(betas, dtype=np.float64)
    raise NotImplementedError(f"Unknown beta schedule: {schedule}")


def leading_timesteps(
    num_train_timesteps: int, num_inference_steps: int, steps_offset: int = 0
) -> np.ndarray:
    """The "leading" timestep spacing (the diffusers default used by the live
    config): descending multiples of ``num_train // num_inference``."""
    if num_inference_steps > num_train_timesteps:
        raise ValueError(
            f"num_inference_steps ({num_inference_steps}) > num_train_timesteps"
            f" ({num_train_timesteps})"
        )
    step_ratio = num_train_timesteps // num_inference_steps
    timesteps = (
        (np.arange(0, num_inference_steps) * step_ratio).round()[::-1].astype(np.int64)
    )
    return timesteps + steps_offset


def _predict_x0_and_eps(
    sample: Array,
    model_output: Array,
    alpha_prod_t: Array,
    prediction_type: str,
) -> tuple[Array, Array]:
    beta_prod_t = 1.0 - alpha_prod_t
    sqrt_a = jnp.sqrt(alpha_prod_t)
    sqrt_b = jnp.sqrt(beta_prod_t)
    if prediction_type == "epsilon":
        pred_x0 = (sample - sqrt_b * model_output) / sqrt_a
        pred_eps = model_output
    elif prediction_type == "sample":
        pred_x0 = model_output
        pred_eps = (sample - sqrt_a * pred_x0) / sqrt_b
    elif prediction_type == "v_prediction":
        pred_x0 = sqrt_a * sample - sqrt_b * model_output
        pred_eps = sqrt_a * model_output + sqrt_b * sample
    else:
        raise NotImplementedError(f"Unknown prediction type: {prediction_type}")
    return pred_x0, pred_eps


def _broadcast_gather(table: Array, timesteps: Array, ndim: int) -> Array:
    """Gather per-example table entries and reshape for broadcasting against a
    tensor with ``ndim`` dims whose leading dim matches ``timesteps``."""
    vals = table[timesteps]
    return vals.reshape(vals.shape + (1,) * (ndim - vals.ndim))


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class DDIMScheduler:
    """DDIM with diffusers-identical semantics, as an immutable pytree.

    Replaces the diffusers scheduler used at reference
    ``diffusion_wrapper.py:198,370,417,451,474``.
    """

    alphas_cumprod: Array
    final_alpha_cumprod: Array
    num_train_timesteps: int = field(metadata=dict(static=True))
    prediction_type: str = field(metadata=dict(static=True))
    clip_sample: bool = field(metadata=dict(static=True))
    clip_sample_range: float = field(metadata=dict(static=True))
    steps_offset: int = field(metadata=dict(static=True))
    num_inference_steps: int = field(metadata=dict(static=True))

    init_noise_sigma: float = field(default=1.0, metadata=dict(static=True))

    @classmethod
    def create(
        cls,
        kwargs: DDIMSchedulerKwargs | None = None,
        num_inference_steps: int = 50,
        dtype: jnp.dtype = jnp.float32,
    ) -> "DDIMScheduler":
        kw = kwargs or DDIMSchedulerKwargs()
        betas = make_betas(
            kw.beta_schedule,
            kw.num_train_timesteps,
            kw.beta_start,
            kw.beta_end,
            kw.trained_betas,
        )
        alphas_cumprod = np.cumprod(1.0 - betas)
        final = 1.0 if kw.set_alpha_to_one else alphas_cumprod[0]
        return cls(
            alphas_cumprod=jnp.asarray(alphas_cumprod, dtype=dtype),
            final_alpha_cumprod=jnp.asarray(final, dtype=dtype),
            num_train_timesteps=kw.num_train_timesteps,
            prediction_type=kw.prediction_type,
            clip_sample=kw.clip_sample,
            clip_sample_range=kw.clip_sample_range,
            steps_offset=kw.steps_offset,
            num_inference_steps=num_inference_steps,
        )

    def with_num_inference_steps(self, num: int) -> "DDIMScheduler":
        """Functional analogue of diffusers' ``set_timesteps``."""
        from dataclasses import replace

        return replace(self, num_inference_steps=num)

    def timesteps(self, num_inference_steps: int | None = None) -> np.ndarray:
        """Static (host-side) descending timestep sequence — feed to lax.scan."""
        num = num_inference_steps or self.num_inference_steps
        return leading_timesteps(self.num_train_timesteps, num, self.steps_offset)

    def scale_model_input(self, sample: Array, timestep: Array | int) -> Array:
        return sample  # DDIM does not scale inputs.

    def add_noise(self, original: Array, noise: Array, timesteps: Array) -> Array:
        a = _broadcast_gather(self.alphas_cumprod, timesteps, original.ndim)
        return jnp.sqrt(a) * original + jnp.sqrt(1.0 - a) * noise

    def get_velocity(self, sample: Array, noise: Array, timesteps: Array) -> Array:
        a = _broadcast_gather(self.alphas_cumprod, timesteps, sample.ndim)
        return jnp.sqrt(a) * noise - jnp.sqrt(1.0 - a) * sample

    def step(
        self,
        model_output: Array,
        timestep: Array | int,
        sample: Array,
        eta: float = 0.0,
        noise: Array | None = None,
    ) -> Array:
        """One reverse DDIM step; returns prev_sample.

        ``timestep`` may be a traced scalar so the whole sampling loop can run
        under ``lax.scan`` over the static timestep table.
        """
        t = jnp.asarray(timestep)
        prev_t = t - self.num_train_timesteps // self.num_inference_steps

        alpha_prod_t = self.alphas_cumprod[t]
        alpha_prod_t_prev = jnp.where(
            prev_t >= 0,
            self.alphas_cumprod[jnp.maximum(prev_t, 0)],
            self.final_alpha_cumprod,
        )

        pred_x0, pred_eps = _predict_x0_and_eps(
            sample, model_output, alpha_prod_t, self.prediction_type
        )
        if self.clip_sample:
            pred_x0 = jnp.clip(
                pred_x0, -self.clip_sample_range, self.clip_sample_range
            )

        if eta > 0.0:
            variance = (
                (1.0 - alpha_prod_t_prev)
                / (1.0 - alpha_prod_t)
                * (1.0 - alpha_prod_t / alpha_prod_t_prev)
            )
            std_dev_t = eta * jnp.sqrt(variance)
        else:
            std_dev_t = jnp.asarray(0.0, dtype=sample.dtype)

        pred_sample_direction = (
            jnp.sqrt(1.0 - alpha_prod_t_prev - std_dev_t**2) * pred_eps
        )
        prev_sample = jnp.sqrt(alpha_prod_t_prev) * pred_x0 + pred_sample_direction
        if eta > 0.0:
            if noise is None:
                raise ValueError("eta > 0 requires noise")
            prev_sample = prev_sample + std_dev_t * noise
        return prev_sample


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class DDPMScheduler:
    """DDPM (ancestral sampling) with diffusers-identical semantics."""

    alphas_cumprod: Array
    betas: Array
    alphas: Array
    final_alpha_cumprod: Array
    num_train_timesteps: int = field(metadata=dict(static=True))
    prediction_type: str = field(metadata=dict(static=True))
    clip_sample: bool = field(metadata=dict(static=True))
    clip_sample_range: float = field(metadata=dict(static=True))
    variance_type: str = field(metadata=dict(static=True))
    steps_offset: int = field(metadata=dict(static=True))
    num_inference_steps: int = field(metadata=dict(static=True))

    init_noise_sigma: float = field(default=1.0, metadata=dict(static=True))

    @classmethod
    def create(
        cls,
        kwargs: DDPMSchedulerKwargs | None = None,
        num_inference_steps: int = 1000,
        dtype: jnp.dtype = jnp.float32,
    ) -> "DDPMScheduler":
        kw = kwargs or DDPMSchedulerKwargs()
        betas = make_betas(
            kw.beta_schedule,
            kw.num_train_timesteps,
            kw.beta_start,
            kw.beta_end,
            kw.trained_betas,
        )
        alphas = 1.0 - betas
        alphas_cumprod = np.cumprod(alphas)
        return cls(
            alphas_cumprod=jnp.asarray(alphas_cumprod, dtype=dtype),
            betas=jnp.asarray(betas, dtype=dtype),
            alphas=jnp.asarray(alphas, dtype=dtype),
            final_alpha_cumprod=jnp.asarray(1.0, dtype=dtype),
            num_train_timesteps=kw.num_train_timesteps,
            prediction_type=kw.prediction_type,
            clip_sample=kw.clip_sample,
            clip_sample_range=kw.clip_sample_range,
            variance_type=kw.variance_type,
            steps_offset=kw.steps_offset,
            num_inference_steps=num_inference_steps,
        )

    def with_num_inference_steps(self, num: int) -> "DDPMScheduler":
        from dataclasses import replace

        return replace(self, num_inference_steps=num)

    def timesteps(self, num_inference_steps: int | None = None) -> np.ndarray:
        num = num_inference_steps or self.num_inference_steps
        return leading_timesteps(self.num_train_timesteps, num, self.steps_offset)

    def scale_model_input(self, sample: Array, timestep: Array | int) -> Array:
        return sample

    def add_noise(self, original: Array, noise: Array, timesteps: Array) -> Array:
        a = _broadcast_gather(self.alphas_cumprod, timesteps, original.ndim)
        return jnp.sqrt(a) * original + jnp.sqrt(1.0 - a) * noise

    def get_velocity(self, sample: Array, noise: Array, timesteps: Array) -> Array:
        a = _broadcast_gather(self.alphas_cumprod, timesteps, sample.ndim)
        return jnp.sqrt(a) * noise - jnp.sqrt(1.0 - a) * sample

    def step(
        self,
        model_output: Array,
        timestep: Array | int,
        sample: Array,
        rng: Array | None = None,
    ) -> Array:
        t = jnp.asarray(timestep)
        prev_t = t - self.num_train_timesteps // self.num_inference_steps

        alpha_prod_t = self.alphas_cumprod[t]
        alpha_prod_t_prev = jnp.where(
            prev_t >= 0,
            self.alphas_cumprod[jnp.maximum(prev_t, 0)],
            self.final_alpha_cumprod,
        )
        beta_prod_t = 1.0 - alpha_prod_t
        beta_prod_t_prev = 1.0 - alpha_prod_t_prev
        current_alpha_t = alpha_prod_t / alpha_prod_t_prev
        current_beta_t = 1.0 - current_alpha_t

        pred_x0, _ = _predict_x0_and_eps(
            sample, model_output, alpha_prod_t, self.prediction_type
        )
        if self.clip_sample:
            pred_x0 = jnp.clip(pred_x0, -self.clip_sample_range, self.clip_sample_range)

        pred_original_coeff = jnp.sqrt(alpha_prod_t_prev) * current_beta_t / beta_prod_t
        current_sample_coeff = jnp.sqrt(current_alpha_t) * beta_prod_t_prev / beta_prod_t
        prev_mean = pred_original_coeff * pred_x0 + current_sample_coeff * sample

        variance = beta_prod_t_prev / beta_prod_t * current_beta_t
        if self.variance_type == "fixed_small":
            variance = jnp.clip(variance, min=1e-20)
        elif self.variance_type == "fixed_small_log":
            variance = jnp.exp(0.5 * jnp.log(jnp.clip(variance, min=1e-20)))
        elif self.variance_type == "fixed_large":
            variance = current_beta_t
        else:
            raise NotImplementedError(f"variance_type {self.variance_type}")

        if rng is None:
            return prev_mean
        z = jax.random.normal(rng, sample.shape, dtype=sample.dtype)
        std = jnp.where(t > 0, jnp.sqrt(variance), 0.0)
        return prev_mean + std * z


def get_scheduler(cfg: SchedulerCfg) -> DDIMScheduler | DDPMScheduler:
    """Registry mirroring reference ``scheduler/__init__.py:19-40``.

    ``pretrained_from`` is intentionally ignored: the live config always builds
    from kwargs, and the SD2.1 scheduler config is reproduced by the kwargs in
    ``configs/model/scheduler/ddim.yaml``.
    """
    if cfg.name == "ddim":
        kw = cfg.kwargs if isinstance(cfg.kwargs, DDIMSchedulerKwargs) else (
            DDIMSchedulerKwargs(**cfg.kwargs) if cfg.kwargs else DDIMSchedulerKwargs()
        )
        return DDIMScheduler.create(kw, num_inference_steps=cfg.num_inference_steps)
    if cfg.name == "ddpm":
        kw = cfg.kwargs if isinstance(cfg.kwargs, DDPMSchedulerKwargs) else (
            DDPMSchedulerKwargs(**cfg.kwargs) if cfg.kwargs else DDPMSchedulerKwargs()
        )
        return DDPMScheduler.create(kw, num_inference_steps=cfg.num_inference_steps)
    raise ValueError(f"Unknown scheduler: {cfg.name}")
