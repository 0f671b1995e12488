"""Pallas 3x3 conv (ops/conv3x3.py): interpret-mode kernel parity against
the XLA lowering, the shape gate, gradients through the custom VJP, the
param-compatible ResnetBlock swap, and mesh partitioning via run_manual."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mvldm_tpu.ops.conv3x3 import (
    _conv3x3_pallas,
    _conv3x3_xla,
    _pick_band,
    conv3x3,
    supported,
)


def make_inputs(n, h, w, cin, cout, dtype=jnp.float32, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal((n, h, w, cin)) * 0.1, dtype)
    wt = jnp.asarray(rng.standard_normal((3, 3, cin, cout)) * 0.05, dtype)
    b = jnp.asarray(rng.standard_normal(cout) * 0.1, dtype)
    return x, wt, b


class TestKernelParity:
    @pytest.mark.parametrize(
        "n,h,w,cin,cout",
        [
            (2, 16, 16, 128, 128),   # square, symmetric channels
            (1, 32, 16, 256, 128),   # contraction > output
            (2, 8, 24, 128, 256),    # expansion, non-square spatial
            (1, 24, 8, 128, 128),    # H not a multiple of 16 (band=8)
        ],
    )
    def test_matches_xla(self, n, h, w, cin, cout):
        x, wt, b = make_inputs(n, h, w, cin, cout)
        got = _conv3x3_pallas(x, wt, b, interpret=True)
        want = _conv3x3_xla(x, wt, b)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=2e-5
        )

    def test_band_selection(self):
        # 256x256x128: the largest band that divides H and fits VMEM.
        bh = _pick_band(256, 256, 128, 128, 2)
        assert bh >= 8 and 256 % bh == 0
        # 128-spatial, 512 channels: weights alone are 4.7 MB; still >= 2.
        assert _pick_band(128, 128, 512, 512, 2) >= 2

    def test_shape_gate(self):
        assert supported((4, 256, 256, 128), 128, 128, jnp.bfloat16)
        assert supported((4, 128, 128, 512), 512, 256, jnp.bfloat16)
        assert not supported((4, 256, 256, 3), 3, 128, jnp.bfloat16)  # RGB stem
        assert not supported((4, 256, 256, 128), 128, 3, jnp.bfloat16)
        assert not supported((4, 4, 4, 128), 128, 128, jnp.bfloat16)  # tiny

    def test_dispatcher_on_cpu_is_xla(self):
        # On the CPU test backend conv3x3 must take the XLA path and agree
        # with lax.conv exactly.
        x, wt, b = make_inputs(2, 16, 16, 128, 128)
        np.testing.assert_allclose(
            np.asarray(conv3x3(x, wt, b)),
            np.asarray(_conv3x3_xla(x, wt, b)),
            atol=0,
        )


class TestGradients:
    def test_custom_vjp_matches_xla_grads(self):
        x, wt, b = make_inputs(1, 8, 8, 128, 128)

        def loss_custom(x, w, b):
            return jnp.sum(conv3x3(x, w, b) ** 2)

        def loss_ref(x, w, b):
            return jnp.sum(_conv3x3_xla(x, w, b) ** 2)

        gc = jax.grad(loss_custom, argnums=(0, 1, 2))(x, wt, b)
        gr = jax.grad(loss_ref, argnums=(0, 1, 2))(x, wt, b)
        for a, c in zip(gc, gr):
            np.testing.assert_allclose(np.asarray(a), np.asarray(c), atol=1e-5)


class TestResnetBlockSwap:
    def test_param_tree_and_output_compatible(self):
        """pallas_conv=True must produce the identical param tree (names,
        shapes) and — on CPU, where both paths lower to XLA — the same
        output as the nn.Conv path."""
        from mvldm_tpu.models.layers import ResnetBlock

        x = jnp.asarray(
            np.random.default_rng(0).standard_normal((2, 8, 8, 128)) * 0.1,
            jnp.float32,
        )
        ref = ResnetBlock(out_channels=128, use_time_emb=False, groups=32,
                          eps=1e-6)
        swp = ResnetBlock(out_channels=128, use_time_emb=False, groups=32,
                          eps=1e-6, pallas_conv=True)
        pr = ref.init(jax.random.PRNGKey(0), x)["params"]
        ps = swp.init(jax.random.PRNGKey(0), x)["params"]
        assert jax.tree_util.tree_structure(pr) == jax.tree_util.tree_structure(ps)
        for a, c in zip(jax.tree_util.tree_leaves(pr), jax.tree_util.tree_leaves(ps)):
            assert a.shape == c.shape and a.dtype == c.dtype
            np.testing.assert_array_equal(np.asarray(a), np.asarray(c))
        out_r = ref.apply({"params": pr}, x)
        out_s = swp.apply({"params": pr}, x)
        np.testing.assert_allclose(
            np.asarray(out_r), np.asarray(out_s), atol=1e-5
        )

    def test_vae_init_unchanged(self):
        """The VAE's param tree (used by checkpoint conversion) is unchanged
        by the pallas_conv swap — golden structure smoke check."""
        from mvldm_tpu.models.vae import AutoencoderKL, AutoencoderKLCfg

        cfg = AutoencoderKLCfg(block_out_channels=(128, 256), layers_per_block=1)
        vae = AutoencoderKL(cfg=cfg)
        x = jnp.zeros((1, 32, 32, 3))
        params = vae.init(
            {"params": jax.random.PRNGKey(0)}, x, jax.random.PRNGKey(1)
        )["params"]
        names = sorted(jax.tree_util.keystr(k) for k, _ in
                       jax.tree_util.tree_leaves_with_path(params))
        assert any("down_0_res_0" in n and "conv1" in n and "kernel" in n
                   for n in names), names[:8]


class TestMesh:
    def test_runs_under_published_mesh(self):
        """Under an 8-device mesh the op must partition itself (run_manual)
        and still match the XLA result."""
        from jax.sharding import Mesh
        from mvldm_tpu.parallel.tp import published_mesh

        mesh = Mesh(np.array(jax.devices()).reshape(8, 1), ("data", "model"))
        x, wt, b = make_inputs(8, 8, 8, 128, 128)
        with published_mesh(mesh):
            with mesh:
                got = jax.jit(conv3x3)(x, wt, b)
        want = _conv3x3_xla(x, wt, b)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


class TestQualificationHarness:
    @pytest.mark.slow
    def test_tool_contract_interpret(self):
        """tools/qualify_pallas_conv.py end to end on CPU (interpret-mode
        Pallas): must print one JSON line with the fields bench.py's
        maybe_enable_pallas_conv parses, and pass parity — "enable" is then
        purely the speed verdict (never asserted here; interpret mode is
        slower by construction)."""
        import json
        import subprocess
        import sys
        from pathlib import Path

        tool = (
            Path(__file__).resolve().parent.parent
            / "tools" / "qualify_pallas_conv.py"
        )
        proc = subprocess.run(
            [sys.executable, str(tool), "--interpret", "--tiny",
             "--hw", "64", "--chain", "1"],
            capture_output=True, text=True, timeout=900,
        )
        assert proc.returncode == 0, proc.stderr[-2000:]
        verdict = json.loads(proc.stdout.strip().splitlines()[-1])
        assert verdict["ok"], verdict
        # Parity must hold on CPU (interpret == same math): the kernel's
        # deviation from the f32 ground truth stays at the bf16 XLA noise
        # floor.
        assert verdict["max_err"] <= max(
            2.0 * verdict["noise_floor"], 1e-6
        ), verdict
        assert {"enable", "xla_s", "pallas_s", "speedup"} <= set(verdict)

    def test_bench_skips_on_cpu(self, monkeypatch):
        """bench.qualify_pallas_conv must not probe on the CPU backend and
        must honor the MVLDM_PALLAS_CONV override without a subprocess."""
        import sys
        from pathlib import Path

        sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
        try:
            import bench
        finally:
            sys.path.pop(0)
        monkeypatch.delenv("MVLDM_PALLAS_CONV", raising=False)
        assert bench.qualify_pallas_conv() is False  # cpu backend
        monkeypatch.setenv("MVLDM_PALLAS_CONV", "1")
        assert bench.qualify_pallas_conv() is True
        monkeypatch.setenv("MVLDM_PALLAS_CONV", "0")
        assert bench.qualify_pallas_conv() is False
