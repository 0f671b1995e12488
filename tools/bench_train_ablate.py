"""Decompose the single-chip train-step cost by ablation.

The full step (bench.py --train) runs at ~10-15% MFU; this probe times the
pieces to find where the time goes: forward loss only, forward+backward
(value_and_grad), the optimizer apply alone, and forward+backward without
block remat. A single TPU executes launches in queue order, so enqueueing N
independent calls and fetching the LAST result's scalar bounds the total
honestly even on the optimistically-acknowledging tunnel (earlier launches
must drain first).

Each probe runs in its own subprocess (``--all`` orchestrates): the 0.93B
f32 param tree plus grads, optimizer state and compiled executables exceed
the 16G chip if the variants accumulate in one process, and an OOM in one
variant (e.g. no-remat backward) must not kill the rest.

Usage: python tools/bench_train_ablate.py --all [--batch N]
       python tools/bench_train_ablate.py --probe fwd_remat [--batch N]
"""

from __future__ import annotations

import subprocess
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

PROBES = (
    "fwd_remat",
    "fwd_bwd_remat",
    "fwd_noremat",
    "fwd_bwd_noremat",
    "opt_apply",
    "opt_apply_lp",  # both moments bf16 (stochastic-rounding storage)
    "vae_encode",
)


def _setup_jax():
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        str(Path(__file__).parent.parent / ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return jax


def make_batch(b: int, v: int = 5):
    # Single source of truth for the flagship train-bench shape lives in
    # bench.py; the probes must measure exactly what the headline measures.
    import bench

    return bench.make_train_batch(b, v)


def timed(fn, *args, n=8) -> float:
    """Chain timing: warm once, enqueue n calls, fetch the last scalar.
    Single-device queue order serializes the launches, so the scalar
    transfer bounds the whole chain even on the optimistic tunnel."""
    import jax
    import numpy as np

    out = fn(*args, jax.random.PRNGKey(0))
    float(np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
    t0 = time.perf_counter()
    for i in range(n):
        out = fn(*args, jax.random.fold_in(jax.random.PRNGKey(1), i))
    float(np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
    return (time.perf_counter() - t0) / n


def run_probe(probe: str, b: int) -> float:
    jax = _setup_jax()
    import jax.numpy as jnp

    import bench
    from mvldm_tpu.config import OptimizerCfg
    from mvldm_tpu.training.optim import build_lr_schedule, build_optimizer

    remat = probe.endswith("_remat")
    engine, unet_params, vae_params = bench.build_flagship(remat=remat)

    if probe.startswith("opt_apply"):
        # AdamW + clip on a fixed grad tree; donate state+params so the
        # chain updates in place (two extra 5.5G trees would OOM the chip).
        kwargs = {"mu_dtype": "bfloat16"}
        if probe == "opt_apply_lp":
            kwargs["nu_dtype"] = "bfloat16"
        tx = build_optimizer(
            OptimizerCfg(name="AdamW", lr=2e-5, scale_lr=False,
                         kwargs=kwargs),
            build_lr_schedule(2e-5, None),
            gradient_clip_val=0.1,
        )
        opt_state = tx.init(unet_params)
        grads = jax.tree_util.tree_map(jnp.zeros_like, unet_params)

        def _apply(opt_state, grads, params, rng):
            updates, new_state = tx.update(grads, opt_state, params)
            new_params = jax.tree_util.tree_map(
                lambda p, u: p + u, params, updates
            )
            return new_state, new_params

        apply_only = jax.jit(_apply, donate_argnums=(0, 2))
        import numpy as np

        state, params = apply_only(opt_state, grads, unet_params,
                                   jax.random.PRNGKey(0))
        float(np.asarray(jax.tree_util.tree_leaves(params)[0]).ravel()[0])
        t0 = time.perf_counter()
        for i in range(8):
            state, params = apply_only(state, grads, params,
                                       jax.random.PRNGKey(i))
        float(np.asarray(jax.tree_util.tree_leaves(params)[0]).ravel()[0])
        return (time.perf_counter() - t0) / 8

    batch = make_batch(b)

    if probe == "vae_encode":
        # The frozen-VAE image->latent encode inside training_loss
        # (engine.training_loss -> encode_images); isolates its share of
        # the forward probe.
        def enc(images, rng):
            z = engine.encode_images(vae_params, images, rng)
            return jnp.sum(z)

        return timed(jax.jit(enc), batch.images)

    def loss_fn(params, batch, rng):
        return engine.training_loss(
            params, vae_params, batch, num_context_views=2, rng=rng
        )[0]

    if probe.startswith("fwd_bwd"):
        # Reduce grads to one scalar on device: keeping the 3.7G grad tree
        # as the chain output would hold two copies across iterations.
        def fn(params, batch, rng):
            loss, g = jax.value_and_grad(loss_fn)(params, batch, rng)
            gsum = sum(
                jnp.sum(jnp.abs(x)) for x in jax.tree_util.tree_leaves(g)
            )
            return loss + 0.0 * gsum

        return timed(jax.jit(fn), unet_params, batch)
    return timed(jax.jit(loss_fn), unet_params, batch)


def main() -> None:
    b = 1
    if "--batch" in sys.argv:
        b = int(sys.argv[sys.argv.index("--batch") + 1])

    if "--probe" in sys.argv:
        probe = sys.argv[sys.argv.index("--probe") + 1]
        dt = run_probe(probe, b)
        print(f"RESULT {probe} {dt * 1e3:.1f} ms")
        return

    results = {}
    for probe in PROBES:
        proc = subprocess.run(
            [sys.executable, __file__, "--probe", probe, "--batch", str(b)],
            capture_output=True, text=True, timeout=1800,
        )
        line = [
            ln for ln in proc.stdout.splitlines() if ln.startswith("RESULT")
        ]
        if line:
            results[probe] = line[-1].split()[2]
        else:
            results[probe] = "FAILED"
            tail = (proc.stderr or proc.stdout).strip().splitlines()[-3:]
            print(f"--- {probe} failed:\n" + "\n".join(tail))
    print(f"\nbatch={b}")
    for k, v in results.items():
        print(f"{k:>18}: {v:>10} ms")


if __name__ == "__main__":
    main()
