"""Ray/positional encodings (pure functions; no parameters).

Ports the behavior of reference ``src/model/encodings/positional_encoding.py``
and the SRT encoder in ``src/model/srt/layers.py:1-58``. The live baseline
config uses neither (``use_ray_encoding=false`` -> raw 3+3 origin/direction
channels, reference ``diffusion_wrapper.py:124-125``) but both are part of the
config surface.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import Array


def positional_encoding(samples: Array, num_octaves: int) -> Array:
    """Sine/cosine octave encoding, interleaved as (dim, frequency, phase).

    Matches reference ``PositionalEncoding.forward``: frequencies are
    2*pi*2^k, phases (0, pi/2) so the two phase channels are sin and cos.
    Output feature size = samples_dim * num_octaves * 2, ordered
    ``(d f p)`` — per input dim, per octave, [sin, cos].
    """
    octaves = jnp.arange(num_octaves, dtype=samples.dtype)
    frequencies = 2.0 * jnp.pi * 2.0**octaves  # (f,)
    phases = jnp.asarray([0.0, 0.5 * jnp.pi], dtype=samples.dtype)  # (p,)
    # (..., d) -> (..., d, f, p)
    scaled = samples[..., None, None] * frequencies[None, :, None] + phases
    encoded = jnp.sin(scaled)
    return encoded.reshape(*samples.shape[:-1], -1)


def positional_encoding_d_out(dimensionality: int, num_octaves: int) -> int:
    return dimensionality * num_octaves * 2


def _srt_positional_encoding(
    coords: Array, num_octaves: int, start_octave: int = 0
) -> Array:
    """SRT-style encoding (reference ``srt/layers.py:9-32``): all sines for
    every (dim, octave), then all cosines — note the different channel order
    from :func:`positional_encoding`."""
    octaves = jnp.arange(
        start_octave, start_octave + num_octaves, dtype=coords.dtype
    )
    multipliers = 2.0**octaves * jnp.pi
    scaled = coords[..., None] * multipliers  # (..., d, f)
    sines = jnp.sin(scaled).reshape(*coords.shape[:-1], -1)
    cosines = jnp.cos(scaled).reshape(*coords.shape[:-1], -1)
    return jnp.concatenate([sines, cosines], axis=-1)


def srt_ray_encode(
    pos: Array, rays: Array, pos_octaves: int = 8, ray_octaves: int = 4
) -> Array:
    """SRT RayEncoder (reference ``srt/layers.py:35-58``), point-list branch:
    encode origins and directions separately and concatenate."""
    pos_enc = _srt_positional_encoding(pos, pos_octaves)
    ray_enc = _srt_positional_encoding(rays, ray_octaves)
    return jnp.concatenate([pos_enc, ray_enc], axis=-1)
