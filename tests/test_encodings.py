import jax.numpy as jnp
import numpy as np

from mvldm_tpu.models.encodings import (
    positional_encoding,
    positional_encoding_d_out,
    srt_ray_encode,
)


class TestPositionalEncoding:
    def test_output_shape(self):
        x = jnp.zeros((2, 5, 3))
        out = positional_encoding(x, num_octaves=10)
        assert out.shape == (2, 5, positional_encoding_d_out(3, 10))
        assert out.shape[-1] == 60

    def test_sin_cos_interleaving(self):
        # Phase 0 -> sin, phase pi/2 -> cos; layout is (dim, octave, phase).
        x = jnp.asarray([[0.25]])
        out = np.asarray(positional_encoding(x, num_octaves=2))
        # Octave 0: freq 2*pi -> angle pi/2: sin=1, cos=0.
        np.testing.assert_allclose(out[0, :2], [1.0, 0.0], atol=1e-6)
        # Octave 1: freq 4*pi -> angle pi: sin=0, cos=-1.
        np.testing.assert_allclose(out[0, 2:4], [0.0, -1.0], atol=1e-6)

    def test_zero_input(self):
        x = jnp.zeros((1, 3))
        out = np.asarray(positional_encoding(x, num_octaves=4))
        # sin(0)=0, cos(0)=1 alternating.
        np.testing.assert_allclose(out[0, 0::2], 0.0, atol=1e-7)
        np.testing.assert_allclose(out[0, 1::2], 1.0, atol=1e-7)


class TestSrtRayEncode:
    def test_shape(self):
        pos = jnp.zeros((2, 7, 3))
        rays = jnp.zeros((2, 7, 3))
        out = srt_ray_encode(pos, rays, pos_octaves=10, ray_octaves=8)
        # pos: 3*10 sines + 3*10 cosines = 60; rays: 3*8*2 = 48.
        assert out.shape == (2, 7, 108)

    def test_sines_then_cosines(self):
        pos = jnp.zeros((1, 1, 3))
        rays = jnp.zeros((1, 1, 3))
        out = np.asarray(srt_ray_encode(pos, rays, pos_octaves=2, ray_octaves=2))
        # First half of each encoding is sines (0), second half cosines (1).
        np.testing.assert_allclose(out[0, 0, :6], 0.0, atol=1e-7)  # pos sines
        np.testing.assert_allclose(out[0, 0, 6:12], 1.0, atol=1e-7)  # pos cosines
        np.testing.assert_allclose(out[0, 0, 12:18], 0.0, atol=1e-7)  # ray sines
        np.testing.assert_allclose(out[0, 0, 18:24], 1.0, atol=1e-7)  # ray cosines
