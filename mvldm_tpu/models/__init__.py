from .encodings import positional_encoding, positional_encoding_d_out, srt_ray_encode

__all__ = [
    "positional_encoding",
    "positional_encoding_d_out",
    "srt_ray_encode",
]
