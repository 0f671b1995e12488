"""InceptionV3 feature extractor in the FID convention.

The reference computes FID with torchmetrics' FrechetInceptionDistance
(``src/evaluation/metric_computer.py:22``) and cleanfid
(``src/scripts/compute_fid.py:43-50``); both run the TF-Inception-2015 port
(pytorch-fid's ``pt_inception-2015-12-05`` weights) — the torchvision
``inception_v3`` topology with the FID modifications:

* every in-block 3x3/stride-1 average pool uses ``count_include_pad=False``
  (FIDInceptionA / FIDInceptionC / FIDInceptionE_1);
* the LAST Inception-E block (``Mixed_7c``) pools its branch with MAX
  instead of average (FIDInceptionE_2);
* features are the 2048-d global average pool ("pool3"), inputs resized to
  299x299 bilinear (no antialias, half-pixel centers) and scaled to [-1, 1].

This module re-creates that network in pure jnp from a converted weights
file (``assets/inception_fid.npz``, see ``utils/inception_convert.py`` — the
conversion needs network access once, elsewhere). The architecture is driven
by the declarative :data:`CONV_DEFS` table, which also generates the exact
torch ``state_dict`` key census (:func:`expected_state_keys`) used by the
converter and the synthesized-weights golden test.
"""

from __future__ import annotations

from pathlib import Path
from typing import Callable, Dict, Optional, Tuple

import numpy as np

BN_EPS = 1e-3
DEFAULT_WEIGHTS = Path("assets/inception_fid.npz")

# path -> (in_ch, out_ch, (kh, kw), (sh, sw), (ph, pw)); torchvision module
# paths so converted torch state_dict keys map 1:1.
ConvDef = Tuple[int, int, Tuple[int, int], Tuple[int, int], Tuple[int, int]]


def _conv_defs() -> Dict[str, ConvDef]:
    d: Dict[str, ConvDef] = {}

    def add(path, cin, cout, k, s=1, p=0):
        to2 = lambda v: (v, v) if isinstance(v, int) else tuple(v)
        d[path] = (cin, cout, to2(k), to2(s), to2(p))

    # Stem (torchvision inception_v3).
    add("Conv2d_1a_3x3", 3, 32, 3, 2)
    add("Conv2d_2a_3x3", 32, 32, 3)
    add("Conv2d_2b_3x3", 32, 64, 3, 1, 1)
    add("Conv2d_3b_1x1", 64, 80, 1)
    add("Conv2d_4a_3x3", 80, 192, 3)
    # Inception-A x3.
    for name, cin, pool in (
        ("Mixed_5b", 192, 32), ("Mixed_5c", 256, 64), ("Mixed_5d", 288, 64)
    ):
        add(f"{name}.branch1x1", cin, 64, 1)
        add(f"{name}.branch5x5_1", cin, 48, 1)
        add(f"{name}.branch5x5_2", 48, 64, 5, 1, 2)
        add(f"{name}.branch3x3dbl_1", cin, 64, 1)
        add(f"{name}.branch3x3dbl_2", 64, 96, 3, 1, 1)
        add(f"{name}.branch3x3dbl_3", 96, 96, 3, 1, 1)
        add(f"{name}.branch_pool", cin, pool, 1)
    # Inception-B (grid reduction 35 -> 17).
    add("Mixed_6a.branch3x3", 288, 384, 3, 2)
    add("Mixed_6a.branch3x3dbl_1", 288, 64, 1)
    add("Mixed_6a.branch3x3dbl_2", 64, 96, 3, 1, 1)
    add("Mixed_6a.branch3x3dbl_3", 96, 96, 3, 2)
    # Inception-C x4 (factorized 7x7).
    for name, c7 in (
        ("Mixed_6b", 128), ("Mixed_6c", 160), ("Mixed_6d", 160),
        ("Mixed_6e", 192),
    ):
        add(f"{name}.branch1x1", 768, 192, 1)
        add(f"{name}.branch7x7_1", 768, c7, 1)
        add(f"{name}.branch7x7_2", c7, c7, (1, 7), 1, (0, 3))
        add(f"{name}.branch7x7_3", c7, 192, (7, 1), 1, (3, 0))
        add(f"{name}.branch7x7dbl_1", 768, c7, 1)
        add(f"{name}.branch7x7dbl_2", c7, c7, (7, 1), 1, (3, 0))
        add(f"{name}.branch7x7dbl_3", c7, c7, (1, 7), 1, (0, 3))
        add(f"{name}.branch7x7dbl_4", c7, c7, (7, 1), 1, (3, 0))
        add(f"{name}.branch7x7dbl_5", c7, 192, (1, 7), 1, (0, 3))
        add(f"{name}.branch_pool", 768, 192, 1)
    # Inception-D (grid reduction 17 -> 8).
    add("Mixed_7a.branch3x3_1", 768, 192, 1)
    add("Mixed_7a.branch3x3_2", 192, 320, 3, 2)
    add("Mixed_7a.branch7x7x3_1", 768, 192, 1)
    add("Mixed_7a.branch7x7x3_2", 192, 192, (1, 7), 1, (0, 3))
    add("Mixed_7a.branch7x7x3_3", 192, 192, (7, 1), 1, (3, 0))
    add("Mixed_7a.branch7x7x3_4", 192, 192, 3, 2)
    # Inception-E x2 (Mixed_7c is FIDInceptionE_2: max branch pool).
    for name, cin in (("Mixed_7b", 1280), ("Mixed_7c", 2048)):
        add(f"{name}.branch1x1", cin, 320, 1)
        add(f"{name}.branch3x3_1", cin, 384, 1)
        add(f"{name}.branch3x3_2a", 384, 384, (1, 3), 1, (0, 1))
        add(f"{name}.branch3x3_2b", 384, 384, (3, 1), 1, (1, 0))
        add(f"{name}.branch3x3dbl_1", cin, 448, 1)
        add(f"{name}.branch3x3dbl_2", 448, 384, 3, 1, 1)
        add(f"{name}.branch3x3dbl_3a", 384, 384, (1, 3), 1, (0, 1))
        add(f"{name}.branch3x3dbl_3b", 384, 384, (3, 1), 1, (1, 0))
        add(f"{name}.branch_pool", cin, 192, 1)
    return d


CONV_DEFS: Dict[str, ConvDef] = _conv_defs()


def expected_state_keys() -> Dict[str, Tuple[int, ...]]:
    """Exact torch ``state_dict`` key -> shape census for every tensor the
    extractor consumes (conv OIHW weight + BN affine/running stats per
    BasicConv2d). The converter validates against this; the synthesized
    golden test generates from it."""
    census: Dict[str, Tuple[int, ...]] = {}
    for path, (cin, cout, (kh, kw), _, _) in CONV_DEFS.items():
        census[f"{path}.conv.weight"] = (cout, cin, kh, kw)
        for stat in ("weight", "bias", "running_mean", "running_var"):
            census[f"{path}.bn.{stat}"] = (cout,)
    return census


class InceptionV3Features:
    """Pure-jnp FID InceptionV3 pool3 extractor from a converted npz.

    The npz holds the torch state_dict tensors verbatim (OIHW convs, raw BN
    stats); at load the BN is folded into a per-channel (scale, shift) after
    the conv — inference-equivalent to torch's eval-mode batch_norm at
    eps=1e-3."""

    def __init__(self, state: Dict[str, np.ndarray]):
        import jax.numpy as jnp

        missing = [k for k in expected_state_keys() if k not in state]
        if missing:
            raise KeyError(
                f"inception weights missing {len(missing)} tensors, e.g. "
                f"{missing[:3]} — re-run utils/inception_convert.py"
            )
        self.folded = {}
        for path, (cin, cout, k, s, p) in CONV_DEFS.items():
            w = np.asarray(state[f"{path}.conv.weight"], np.float32)
            gamma = np.asarray(state[f"{path}.bn.weight"], np.float32)
            beta = np.asarray(state[f"{path}.bn.bias"], np.float32)
            mean = np.asarray(state[f"{path}.bn.running_mean"], np.float32)
            var = np.asarray(state[f"{path}.bn.running_var"], np.float32)
            if w.shape != (cout, cin) + k:
                raise ValueError(f"{path}: conv shape {w.shape}")
            scale = gamma / np.sqrt(var + BN_EPS)
            shift = beta - mean * scale
            self.folded[path] = (
                jnp.asarray(w.transpose(2, 3, 1, 0)),  # OIHW -> HWIO
                jnp.asarray(scale),
                jnp.asarray(shift),
            )
        self._jitted = None

    # --- ops -------------------------------------------------------------
    def _bc(self, path, x):
        """BasicConv2d: conv (no bias) + folded BN + relu."""
        import jax
        import jax.numpy as jnp

        kernel, scale, shift = self.folded[path]
        _, _, _, (sh, sw), (ph, pw) = CONV_DEFS[path]
        y = jax.lax.conv_general_dilated(
            x, kernel, (sh, sw), [(ph, ph), (pw, pw)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return jax.nn.relu(y * scale + shift)

    @staticmethod
    def _max_pool(x, stride=2, padding=0):
        import jax
        import jax.numpy as jnp

        pad = [(0, 0), (padding, padding), (padding, padding), (0, 0)]
        return jax.lax.reduce_window(
            x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, stride, stride, 1),
            pad,
        )

    @staticmethod
    def _avg_pool_ex(x):
        """3x3 / stride 1 / pad 1 average pool with count_include_pad=False
        (the FID block modification: edge windows divide by the number of
        VALID taps, not 9)."""
        import jax
        import jax.numpy as jnp

        pad = [(0, 0), (1, 1), (1, 1), (0, 0)]
        s = jax.lax.reduce_window(
            x, 0.0, jax.lax.add, (1, 3, 3, 1), (1, 1, 1, 1), pad
        )
        cnt = jax.lax.reduce_window(
            jnp.ones(x.shape[:3] + (1,), x.dtype), 0.0, jax.lax.add,
            (1, 3, 3, 1), (1, 1, 1, 1), pad,
        )
        return s / cnt

    # --- blocks (torchvision forward order; concat on channels) -----------
    def _block_a(self, name, x):
        import jax.numpy as jnp

        b1 = self._bc(f"{name}.branch1x1", x)
        b5 = self._bc(f"{name}.branch5x5_2", self._bc(f"{name}.branch5x5_1", x))
        b3 = self._bc(f"{name}.branch3x3dbl_1", x)
        b3 = self._bc(f"{name}.branch3x3dbl_2", b3)
        b3 = self._bc(f"{name}.branch3x3dbl_3", b3)
        bp = self._bc(f"{name}.branch_pool", self._avg_pool_ex(x))
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)

    def _block_b(self, name, x):
        import jax.numpy as jnp

        b3 = self._bc(f"{name}.branch3x3", x)
        bd = self._bc(f"{name}.branch3x3dbl_1", x)
        bd = self._bc(f"{name}.branch3x3dbl_2", bd)
        bd = self._bc(f"{name}.branch3x3dbl_3", bd)
        bp = self._max_pool(x)
        return jnp.concatenate([b3, bd, bp], axis=-1)

    def _block_c(self, name, x):
        import jax.numpy as jnp

        b1 = self._bc(f"{name}.branch1x1", x)
        b7 = self._bc(f"{name}.branch7x7_1", x)
        b7 = self._bc(f"{name}.branch7x7_2", b7)
        b7 = self._bc(f"{name}.branch7x7_3", b7)
        bd = self._bc(f"{name}.branch7x7dbl_1", x)
        for i in (2, 3, 4, 5):
            bd = self._bc(f"{name}.branch7x7dbl_{i}", bd)
        bp = self._bc(f"{name}.branch_pool", self._avg_pool_ex(x))
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)

    def _block_d(self, name, x):
        import jax.numpy as jnp

        b3 = self._bc(f"{name}.branch3x3_2", self._bc(f"{name}.branch3x3_1", x))
        b7 = self._bc(f"{name}.branch7x7x3_1", x)
        for i in (2, 3, 4):
            b7 = self._bc(f"{name}.branch7x7x3_{i}", b7)
        bp = self._max_pool(x)
        return jnp.concatenate([b3, b7, bp], axis=-1)

    def _block_e(self, name, x, pool):
        import jax.numpy as jnp

        b1 = self._bc(f"{name}.branch1x1", x)
        b3 = self._bc(f"{name}.branch3x3_1", x)
        b3 = jnp.concatenate(
            [self._bc(f"{name}.branch3x3_2a", b3),
             self._bc(f"{name}.branch3x3_2b", b3)], axis=-1,
        )
        bd = self._bc(f"{name}.branch3x3dbl_2", self._bc(f"{name}.branch3x3dbl_1", x))
        bd = jnp.concatenate(
            [self._bc(f"{name}.branch3x3dbl_3a", bd),
             self._bc(f"{name}.branch3x3dbl_3b", bd)], axis=-1,
        )
        pooled = (
            self._max_pool(x, stride=1, padding=1) if pool == "max"
            else self._avg_pool_ex(x)
        )
        bp = self._bc(f"{name}.branch_pool", pooled)
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)

    # --- forward -----------------------------------------------------------
    def features(self, x):
        """x: (b, 299, 299, 3) already in [-1, 1] -> (b, 2048) pool3."""
        h = self._bc("Conv2d_1a_3x3", x)
        h = self._bc("Conv2d_2a_3x3", h)
        h = self._bc("Conv2d_2b_3x3", h)
        h = self._max_pool(h)
        h = self._bc("Conv2d_3b_1x1", h)
        h = self._bc("Conv2d_4a_3x3", h)
        h = self._max_pool(h)
        for name in ("Mixed_5b", "Mixed_5c", "Mixed_5d"):
            h = self._block_a(name, h)
        h = self._block_b("Mixed_6a", h)
        for name in ("Mixed_6b", "Mixed_6c", "Mixed_6d", "Mixed_6e"):
            h = self._block_c(name, h)
        h = self._block_d("Mixed_7a", h)
        h = self._block_e("Mixed_7b", h, pool="avg")
        h = self._block_e("Mixed_7c", h, pool="max")  # FIDInceptionE_2
        return h.mean(axis=(1, 2))

    def __call__(self, images: np.ndarray, batch_size: int = 32) -> np.ndarray:
        """images: (n, h, w, 3) in [0, 1] -> (n, 2048) float32 features.

        FID preprocessing (pytorch-fid ``InceptionV3.forward``): bilinear
        resize to 299 (align_corners=False = half-pixel, NO antialias) then
        scale to [-1, 1]."""
        import jax
        import jax.numpy as jnp

        if self._jitted is None:
            def fwd(x01):
                x = jax.image.resize(
                    x01, x01.shape[:1] + (299, 299, 3), method="bilinear",
                    antialias=False,
                )
                return self.features(x * 2.0 - 1.0)

            self._jitted = jax.jit(fwd)
        feats = []
        for i in range(0, len(images), batch_size):
            x = jnp.asarray(images[i : i + batch_size], jnp.float32)
            feats.append(np.asarray(self._jitted(x)))
        return np.concatenate(feats)


def inception_feature_extractor(
    weights_path: Optional[Path] = None,
) -> Optional[Callable[[np.ndarray], np.ndarray]]:
    """FID-convention InceptionV3 extractor, or None when no converted
    weights file exists (this environment has no network; convert once with
    ``utils/inception_convert.py`` elsewhere). With it, ``compute_fid``
    produces standard, Inception-comparable FID/KID."""
    path = Path(weights_path or DEFAULT_WEIGHTS)
    if not path.exists():
        return None
    state = dict(np.load(path))
    return InceptionV3Features(state)
