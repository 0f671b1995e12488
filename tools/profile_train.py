"""Per-op device-time profile of the flagship train step.

VERDICT r3 item #4 asks for ">=25% MFU ... or a per-op profile proving the
remainder is structurally bandwidth-bound". The tunneled bench chip's
optimistic completion acknowledgment makes host-side per-op timing
meaningless, but `jax.profiler.trace` records the DEVICE timeline (XLA op
start/stop on the TensorCore), which is immune to that: this tool runs a few
train steps under a trace, parses the Chrome-trace JSON the profiler writes,
and aggregates device-lane op durations into categories (convolution /
matmul / Pallas attention custom-calls / elementwise fusions / copies /
optimizer) so step time can be attributed against the known per-category
ceilings measured in BENCHMARKS.md (conv 127-178 TF/s, attention at the
padded-MXU ceiling, elementwise ~645 GB/s).

Reference counterpart: none — the reference has no profiling at all
(SURVEY.md §5); Lightning's fit loop (src/main.py:119-139) is the surface
being characterized.

Usage (same env knobs as `bench.py --train`):

    MVLDM_TRAIN_BENCH_BATCH=4 MVLDM_TRAIN_BENCH_LATENTS=1 \
        python tools/profile_train.py

Prints a per-category table, the top-N ops, and one JSON summary line.
"""

from __future__ import annotations

import gzip
import json
import os
import re
import sys
import tempfile
from collections import defaultdict
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

N_TRACED_STEPS = int(os.environ.get("MVLDM_PROFILE_STEPS", "6"))
TOP_N = int(os.environ.get("MVLDM_PROFILE_TOP", "25"))


def categorize(name: str, hlo_category: str) -> str:
    """Map an XLA-op event to a cost category.

    Prefers the profiler's own ``hlo_category`` arg (e.g. "convolution
    fusion", "loop fusion", "custom-call"); falls back to name substrings.
    """
    c = hlo_category.lower()
    n = name.lower()
    if "custom-call" in c or "tpu_custom_call" in n or "mosaic" in n:
        return "pallas_attention"  # the only custom-calls in this model
    if "convolution" in c or "convolution" in n:
        return "convolution"
    if re.search(r"\bdot\b|gemm|matmul|einsum", c + " " + n):
        return "matmul"
    if re.search(r"all-reduce|all-gather|reduce-scatter", c + " " + n):
        return "collective"
    if re.search(r"copy|transpose|bitcast|reshape", c + " " + n):
        return "copy/layout"
    if re.search(r"dynamic-update-slice|dynamic-slice|\bslice\b", c + " " + n):
        return "slice/update"
    if re.search(r"scatter|gather", c + " " + n):
        return "gather/scatter"
    if re.search(r"infeed|outfeed|send|recv", c + " " + n):
        return "host_io"
    if "fusion" in c or "fusion" in n:
        return "fusion(elementwise)"
    if "reduce" in c or "reduce" in n:
        return "reduce"
    return "other"


def load_trace_events(trace_dir: Path):
    """Yield (thread_name, event) for complete events in the newest trace."""
    traces = sorted(trace_dir.rglob("*.trace.json.gz"))
    if not traces:
        raise SystemExit(f"no .trace.json.gz under {trace_dir}")
    with gzip.open(traces[-1], "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    # Metadata passes: process names (devices) and thread names (lanes).
    proc_names: dict = {}
    thread_names: dict = {}
    for ev in events:
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            proc_names[ev["pid"]] = ev["args"].get("name", "")
        elif ev.get("ph") == "M" and ev.get("name") == "thread_name":
            thread_names[(ev["pid"], ev.get("tid"))] = ev["args"].get(
                "name", ""
            )
    for ev in events:
        if ev.get("ph") != "X" or "dur" not in ev:
            continue
        tname = thread_names.get((ev.get("pid"), ev.get("tid")), "")
        pname = proc_names.get(ev.get("pid"), "")
        yield pname, tname, ev


def aggregate(trace_dir: Path):
    """Aggregate device-lane ops by name and category.

    Returns dicts keyed by op name / category with value
    ``[duration_us, model_flops, bytes_accessed]`` (flops/bytes come from the
    profiler's per-event args and are 0 for opaque custom-calls), plus the
    set of device lanes seen.
    """
    by_name: dict = defaultdict(lambda: [0.0, 0.0, 0.0])
    name_cat: dict = {}
    lanes_seen = set()
    for pname, tname, ev in load_trace_events(trace_dir):
        # The device op timeline lives on "XLA Ops" threads of the device
        # process ("/device:TPU:0 ..." on TPU, host process on CPU). Steps /
        # TF-op / framework lanes double-count the same time; skip them.
        if "xla ops" not in tname.lower():
            continue
        lanes_seen.add((pname, tname))
        args = ev.get("args", {})
        rec = by_name[ev["name"]]
        rec[0] += float(ev["dur"])
        rec[1] += float(args.get("model_flops", 0) or 0)
        rec[2] += float(args.get("bytes_accessed", 0) or 0)
        if ev["name"] not in name_cat:
            name_cat[ev["name"]] = categorize(
                ev["name"], str(args.get("hlo_category", ""))
            )
    if not by_name:
        raise SystemExit(
            "no 'XLA Ops' lane found in trace (lanes present: "
            + ", ".join(sorted({t for _, t, _ in load_trace_events(trace_dir)}))[
                :2000
            ]
        )
    by_cat: dict = defaultdict(lambda: [0.0, 0.0, 0.0])
    for name, (us, fl, by) in by_name.items():
        cat = by_cat[name_cat[name]]
        cat[0] += us
        cat[1] += fl
        cat[2] += by
    return by_name, by_cat, name_cat, lanes_seen


def main() -> None:
    import bench  # repo-root bench.py: single source of truth for shapes
    import jax
    import jax.numpy as jnp
    import numpy as np

    from mvldm_tpu.config import OptimizerCfg
    from mvldm_tpu.training.optim import build_lr_schedule, build_optimizer
    from mvldm_tpu.training.trainer import TrainState, make_train_step

    b = int(os.environ.get("MVLDM_TRAIN_BENCH_BATCH", "4"))
    lp = os.environ.get("MVLDM_TRAIN_BENCH_LP", "0") == "1"
    latents = os.environ.get("MVLDM_TRAIN_BENCH_LATENTS", "0") == "1"
    noremat = os.environ.get("MVLDM_TRAIN_BENCH_NOREMAT", "0") == "1"
    remat_policy = os.environ.get("MVLDM_TRAIN_BENCH_REMAT_POLICY") or None

    kwargs = {"mu_dtype": "bfloat16"}
    if lp:
        kwargs["nu_dtype"] = "bfloat16"
    engine, unet_params, vae_params = bench.build_flagship(
        remat=not noremat, remat_policy=remat_policy
    )
    tx = build_optimizer(
        OptimizerCfg(name="AdamW", lr=2e-5, scale_lr=False, kwargs=kwargs),
        build_lr_schedule(2e-5, None),
        gradient_clip_val=0.1,
    )
    step_fn = make_train_step(engine, tx, vae_params, num_context_views=2)
    batch = bench.make_train_batch(b)
    if latents:
        from mvldm_tpu.diffusion.engine import Batch
        from mvldm_tpu.models.vae import AutoencoderKL

        bb, v, h, w, _ = batch.images.shape
        flat = batch.images.reshape(bb * v, h, w, 3) * 2.0 - 1.0
        dist = engine.vae.apply(
            {"params": vae_params}, flat.astype(jnp.bfloat16),
            method=AutoencoderKL.encode,
        )
        moments = jnp.concatenate([dist.mean, dist.logvar], axis=-1).astype(
            jnp.float32
        )
        batch = Batch(
            images=None, extrinsics=batch.extrinsics,
            intrinsics=batch.intrinsics, is_target=batch.is_target,
            latent_moments=moments.reshape(bb, v, *moments.shape[1:]),
        )
    state = TrainState(
        params=unet_params, opt_state=tx.init(unet_params),
        ema_params=None, step=jnp.asarray(0, jnp.int32),
    )
    rng = jax.random.PRNGKey(1)

    # Compile + settle outside the trace.
    state, metrics = step_fn(state, batch, rng)
    float(np.asarray(metrics["loss/diffusion"]))

    trace_dir = Path(
        os.environ.get("MVLDM_PROFILE_DIR", tempfile.mkdtemp(prefix="prof_"))
    )
    with jax.profiler.trace(str(trace_dir)):
        for i in range(N_TRACED_STEPS):
            state, metrics = step_fn(state, batch, jax.random.fold_in(rng, i))
        float(np.asarray(metrics["loss/diffusion"]))

    by_name, by_cat, name_cat, lanes = aggregate(trace_dir)
    total_us = sum(v[0] for v in by_cat.values())
    per_step_ms = total_us / 1e3 / N_TRACED_STEPS

    def rates(us: float, fl: float, byts: float) -> str:
        tf = fl / (us * 1e-6) / 1e12 if us > 0 else 0.0
        gb = byts / (us * 1e-6) / 1e9 if us > 0 else 0.0
        return f"{tf:>7.1f} TF/s {gb:>7.1f} GB/s"

    cfg_desc = (
        f"batch {b}, {'latent' if latents else 'image'} inputs, "
        f"{'no remat' if noremat else 'block remat'}"
        f"{f' policy={remat_policy}' if remat_policy else ''}, "
        f"{'bf16 mu+nu' if lp else 'bf16 mu'}"
    )
    print(f"# per-op device profile — {cfg_desc}")
    print(f"# lanes: {sorted(lanes)}; traced steps: {N_TRACED_STEPS}")
    print("# flops/bytes are the profiler's own per-op counts (0 for opaque")
    print("# Pallas custom-calls — their physical rate is characterized in")
    print("# BENCHMARKS.md); rates = counted work / measured device time.")
    print(f"# device-busy: {per_step_ms:.1f} ms/step\n")
    print(f"{'category':<22} {'ms/step':>9} {'%':>6}  {'achieved':>28}")
    for cat, (us, fl, byts) in sorted(by_cat.items(), key=lambda kv: -kv[1][0]):
        print(
            f"{cat:<22} {us / 1e3 / N_TRACED_STEPS:>9.2f} "
            f"{100 * us / total_us:>5.1f}%  {rates(us, fl, byts)}"
        )
    print(f"\n# top {TOP_N} ops")
    for name, (us, fl, byts) in sorted(
        by_name.items(), key=lambda kv: -kv[1][0]
    )[:TOP_N]:
        print(
            f"{us / 1e3 / N_TRACED_STEPS:>9.2f} ms  "
            f"{100 * us / total_us:>5.1f}%  {rates(us, fl, byts)}  "
            f"[{name_cat[name]}] {name[:80]}"
        )
    print()
    print(json.dumps({
        "metric": "train_step_device_profile",
        "config": cfg_desc,
        "device_busy_ms_per_step": round(per_step_ms, 2),
        "categories": {
            k: {
                "ms_per_step": round(v[0] / 1e3 / N_TRACED_STEPS, 2),
                "pct": round(100 * v[0] / total_us, 1),
                "tflops_per_s": round(v[1] / (v[0] * 1e-6) / 1e12, 1)
                if v[0] > 0 else 0.0,
                "gbytes_per_s": round(v[2] / (v[0] * 1e-6) / 1e9, 1)
                if v[0] > 0 else 0.0,
            }
            for k, v in sorted(by_cat.items(), key=lambda kv: -kv[1][0])
        },
    }))


if __name__ == "__main__":
    main()
