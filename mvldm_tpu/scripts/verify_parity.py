"""Real-checkpoint parity harness (SURVEY.md §7 hard part 1).

One command that converts a reference Lightning checkpoint, runs a
fixed-seed 25-step DDIM sample, and diffs latents/pixels against fixtures
dumped from the torch reference:

    python -m mvldm_tpu.scripts.verify_parity ckpt=<path/to/1679000.ckpt> \\
        fixtures=<path/to/fixture.npz> [steps=25] [out=outputs/parity]

Fixture npz layout (produced on a torch-capable machine by
``tools/make_parity_fixture_torch.py`` against the reference repo):

    context_latents  (1, v_c, hl, wl, 4)  scaled latents (x0.18215)
    initial_noise    (1, v_t, hl, wl, 4)  the N(0,1) draw torch used
    extrinsics       (1, v_c+v_t, 4, 4)   c2w, already relative
    intrinsics       (1, v_c+v_t, 3, 3)   normalized
    latents_final    (1, v_t, hl, wl, 4)  torch DDIM output (scaled)
    images_out       (1, v_t, H, W, 3)    torch decoded frames in [0, 1]

Injecting the torch context latents and initial noise removes both RNG
boundaries (VAE posterior sample + x_T draw), so any disagreement is purely
conversion/numerics (reference ``sample():455-490``).

Without ``fixtures=`` the command runs in smoke mode: it samples a
synthetic scene at fixed seed and dumps ``<out>/jax_fixture.npz`` — a
JAX-side golden usable for regression testing and, on a machine with the
real checkpoint, for producing the torch-side comparison.
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np


def _parse_kv(argv):
    kv = {}
    passthrough = []
    for a in argv:
        key, _, val = a.partition("=")
        if key in ("ckpt", "fixtures", "steps", "out", "scene"):
            kv[key] = val
        else:
            passthrough.append(a)
    return kv, passthrough


def _diff(name: str, ours: np.ndarray, theirs: np.ndarray) -> dict:
    ours = np.asarray(ours, np.float32)
    theirs = np.asarray(theirs, np.float32)
    if ours.shape != theirs.shape:
        print(f"  {name}: SHAPE MISMATCH ours={ours.shape} torch={theirs.shape}")
        return {"name": name, "shape_mismatch": True}
    d = np.abs(ours - theirs)
    rel = d.max() / (np.abs(theirs).max() + 1e-12)
    stats = {
        "name": name,
        "max_abs": float(d.max()),
        "rms": float(np.sqrt((d ** 2).mean())),
        "rel_max": float(rel),
    }
    print(
        f"  {name}: max|d|={stats['max_abs']:.3e} rms={stats['rms']:.3e} "
        f"rel={stats['rel_max']:.3e}"
    )
    return stats


def main(argv=None) -> None:
    import jax
    import jax.numpy as jnp

    from ..builder import build_engine, load_pretrained
    from ..config import compose, load_typed_root_config, set_cfg

    kv, passthrough = _parse_kv(list(argv if argv is not None else sys.argv[1:]))
    steps = int(kv.get("steps", 25))
    out_dir = Path(kv.get("out", "outputs/parity"))
    out_dir.mkdir(parents=True, exist_ok=True)

    overrides = ["+experiment=baseline", *passthrough]
    overrides.append(f"model.scheduler.num_inference_steps={steps}")
    if "ckpt" in kv:
        overrides.append(f"checkpointing.load={kv['ckpt']}")
    cfg_dict = compose(overrides)
    set_cfg(cfg_dict)
    cfg = load_typed_root_config(cfg_dict)

    # fp32 end to end: parity tolerances are about conversion correctness,
    # not bf16 rounding.
    engine = build_engine(cfg, dtype=jnp.float32)
    rng = jax.random.PRNGKey(cfg.seed if cfg.seed is not None else 0)
    unet_params, vae_params = load_pretrained(cfg, engine, rng)

    if "fixtures" in kv:
        fx = np.load(kv["fixtures"])
        ctx_latents = jnp.asarray(fx["context_latents"])
        noise = jnp.asarray(fx["initial_noise"])
        extr = jnp.asarray(fx["extrinsics"])
        intr = jnp.asarray(fx["intrinsics"])
        v_t = noise.shape[1]

        latents = jax.jit(
            engine.sample_latents, static_argnames=("num_target_views",)
        )(
            unet_params,
            ctx_latents,
            extr,
            intr,
            num_target_views=v_t,
            rng=rng,  # unused: noise injected
            initial_noise=noise,
        )
        images = engine.decode_latents(vae_params, latents)

        print(f"Parity vs {kv['fixtures']} ({steps} DDIM steps):")
        results = [
            _diff("latents_final", np.asarray(latents), fx["latents_final"]),
            _diff("images_out", np.asarray(images), fx["images_out"]),
        ]
        np.savez(
            out_dir / "jax_outputs.npz",
            latents_final=np.asarray(latents),
            images_out=np.asarray(images),
        )
        worst = max(r.get("rel_max", np.inf) for r in results)
        verdict = "PASS" if worst < 2e-2 else "FAIL"
        print(f"Parity {verdict} (worst rel_max {worst:.3e}, threshold 2e-2)")
        print(f"JAX outputs dumped to {out_dir / 'jax_outputs.npz'}")
        return

    # --- smoke mode: fixed-seed sample on a synthetic scene; dump a JAX
    # golden that the torch-side fixture script mirrors.
    print("No fixtures= given: smoke mode (random/converted weights, "
          "synthetic scene, fixed seed).")
    h, w = cfg.dataset.image_shape
    hl, wl = h // 8, w // 8
    v_c, v_t = 2, 3
    key = jax.random.PRNGKey(0)
    images = jax.random.uniform(key, (1, v_c, h, w, 3))
    extr = jnp.broadcast_to(jnp.eye(4), (1, v_c + v_t, 4, 4))
    extr = extr.at[:, :, 0, 3].set(jnp.linspace(0.0, 1.0, v_c + v_t)[None])
    intr = jnp.broadcast_to(jnp.eye(3), (1, v_c + v_t, 3, 3))
    intr = intr.at[:, :, 0, 2].set(0.5).at[:, :, 1, 2].set(0.5)

    k_enc, k_noise = jax.random.split(jax.random.PRNGKey(1))
    ctx_latents = engine.encode_images(vae_params, images, k_enc)
    noise = jax.random.normal(k_noise, (1, v_t, hl, wl, 4), jnp.float32)
    latents = jax.jit(
        engine.sample_latents, static_argnames=("num_target_views",)
    )(
        unet_params,
        ctx_latents,
        extr,
        intr,
        num_target_views=v_t,
        rng=k_noise,
        initial_noise=noise,
    )
    out_images = engine.decode_latents(vae_params, latents)
    path = out_dir / "jax_fixture.npz"
    np.savez(
        path,
        context_images=np.asarray(images),
        context_latents=np.asarray(ctx_latents),
        initial_noise=np.asarray(noise),
        extrinsics=np.asarray(extr),
        intrinsics=np.asarray(intr),
        latents_final=np.asarray(latents),
        images_out=np.asarray(out_images),
        num_inference_steps=steps,
    )
    assert np.isfinite(np.asarray(latents)).all()
    print(f"Smoke OK: dumped {path} "
          f"(latents {tuple(latents.shape)}, images {tuple(out_images.shape)})")


if __name__ == "__main__":
    main()
