"""Device-mesh construction and sharding rules.

The TPU-native replacement for the reference's distributed layer (Lightning
DDP + NCCL, reference ``src/config.py:30``, ``src/main.py:133``; see
SURVEY.md §2.4): a ``jax.sharding.Mesh`` over ICI with a ``data`` axis, batch
arrays sharded along it, parameters replicated. Gradient reduction is the
XLA-inserted ``psum`` from jit-compiling a data-sharded loss — the NCCL
all-reduce equivalent, riding ICI.

The ``model`` axis carries tensor parallelism for the joint cross-view
attention (``trainer.strategy=data_model``): Megatron-pattern projection
shardings here (:func:`tensor_parallel_shardings`) + head-sharded attention
under ``shard_map`` (``parallel/tp.py``). The reference requires only DP
for parity. Multi-host: each process feeds its host-local shard of the
batch; DCN handles cross-host collectives automatically.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    num_data: Optional[int] = None,
    num_model: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a (data, model) mesh. Defaults to all devices on the data axis."""
    devices = list(devices if devices is not None else jax.devices())
    if num_data is None:
        num_data = len(devices) // num_model
    if num_data * num_model != len(devices):
        raise ValueError(
            f"Requested a {num_data}(data) x {num_model}(model) mesh but only "
            f"{len(devices)} JAX device(s) are visible "
            f"({[d.platform for d in devices]}). On a host without that many "
            "real chips, force virtual CPU devices before jax initializes: "
            "set JAX_PLATFORMS=cpu and append "
            f"--xla_force_host_platform_device_count={num_data * num_model} "
            "to XLA_FLAGS (see tests/conftest.py)."
        )
    arr = np.asarray(devices).reshape(num_data, num_model)
    return Mesh(arr, axis_names=("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) dim over the data axis."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def fsdp_shardings(mesh: Mesh, tree):
    """FSDP/ZeRO-3-style shardings for a PARAMETER pytree: each array leaf
    is sharded over the ``data`` axis along its largest divisible dimension
    (replicated when none divides). With the batch also data-sharded, XLA's
    SPMD partitioner turns the weight reads into just-in-time all-gathers
    and the gradient all-reduce into a reduce-scatter onto the shards — the
    full ZeRO-3 communication pattern, derived from sharding annotations
    alone (no hand-written collectives). Cuts parameter + gradient + EMA
    memory by ~N on top of zero1's optimizer-state cut."""
    return zero1_shardings(mesh, tree)


def tensor_parallel_shardings(mesh: Mesh, tree):
    """Megatron-pattern shardings over the ``model`` axis for the joint
    cross-view attention parameters (the only weights TP'd — see
    ``parallel/tp.py``): to_q/to_k/to_v kernels (C, H*D) column-sharded so
    each model rank holds its heads' projections, to_out (H*D, C)
    row-sharded so the output contraction ends in one XLA-inserted
    all-reduce. Everything else replicated over ``model``. Apply on top of
    a data-axis plan by merging specs (the two plans touch disjoint dims
    of disjoint leaves)."""
    nm = mesh.shape["model"]

    def leaf_sharding(path, leaf):
        names = [getattr(p, "key", str(p)) for p in path]
        joined = "/".join(names)
        shape = getattr(leaf, "shape", ())
        if "cross_view" in joined and "attn1" in joined and len(shape) == 2:
            if names[-1] == "kernel" and any(
                n in ("to_q", "to_k", "to_v") for n in names
            ) and shape[1] % nm == 0:
                return NamedSharding(mesh, P(None, "model"))
            if names[-1] == "kernel" and "to_out" in names \
                    and shape[0] % nm == 0:
                return NamedSharding(mesh, P("model", None))
        return replicated(mesh)

    return jax.tree_util.tree_map_with_path(leaf_sharding, tree)


def zero1_shardings(mesh: Mesh, tree):
    """ZeRO-1-style shardings for an optimizer-state pytree: each array leaf
    is sharded over the ``data`` axis along its largest divisible dimension
    (replicated when none divides). With N chips this cuts the AdamW moment
    memory by ~N — the difference between the 0.93B-param UNet fitting on a
    v5e pod slice or not (a single chip OOMs at 23.9G vs 15.75G HBM; the
    reference needs 40GB GPUs for the same reason, README.md:73)."""
    n = mesh.shape["data"]

    def leaf_sharding(leaf):
        shape = getattr(leaf, "shape", ())
        if not shape:
            return replicated(mesh)
        sizes = [(dim, i) for i, dim in enumerate(shape) if dim % n == 0 and dim >= n]
        if not sizes:
            return replicated(mesh)
        _, axis = max(sizes)
        spec = [None] * len(shape)
        spec[axis] = "data"
        return NamedSharding(mesh, P(*spec))

    return jax.tree_util.tree_map(leaf_sharding, tree)
