"""Tensor parallelism over the ``model`` mesh axis.

The SURVEY §2.4 "TPU-native mapping" extension with no reference
counterpart: the joint cross-view attention — the only part of the model
whose working set grows with the number of views (L = v * h * w tokens,
scores O(L^2)) — shards over attention HEADS across the ``model`` axis.
Heads are embarrassingly parallel inside attention, so the kernel runs on
its local head slice under ``shard_map`` with no collectives; the
surrounding projections are partitioned by XLA's SPMD from the Megatron
pattern of parameter shardings (:func:`tensor_parallel_shardings` in
``mesh.py``): to_q/to_k/to_v column-sharded, to_out row-sharded, one
all-reduce per block inserted automatically.

Activation: ``trainer.strategy=data_model`` + ``trainer.num_model=K``. The
trainer publishes the mesh here (trace-time context); the joint attention
in ``models/mv_attention.py`` consults it. Single-chip and pure-DP runs
never enter this path.
"""

from __future__ import annotations

from typing import Optional

import jax
from jax import Array
from jax.sharding import Mesh, PartitionSpec as P

_MODEL_MESH: Optional[Mesh] = None


def set_model_mesh(mesh: Optional[Mesh]) -> None:
    """Publish (or clear, with None) the mesh whose ``model`` axis the joint
    cross-view attention should shard heads over. Trace-time state: set it
    before the train step is first compiled and leave it fixed for the
    process (changing it does NOT retrigger jit tracing)."""
    global _MODEL_MESH
    if mesh is not None and "model" not in mesh.axis_names:
        raise ValueError(f"mesh has no 'model' axis: {mesh.axis_names}")
    _MODEL_MESH = mesh


def get_model_mesh() -> Optional[Mesh]:
    mesh = _MODEL_MESH
    if mesh is None or mesh.shape["model"] <= 1:
        return None
    return mesh


def head_sharded_attention(
    mesh: Mesh,
    q: Array,
    k: Array,
    v: Array,
    bias: Optional[Array] = None,
    scale: Optional[float] = None,
) -> Array:
    """Joint attention with heads sharded over the ``model`` axis and batch
    over ``data``: each device runs the normal attention op on its local
    (B/data, H/model, L, D) slice. q/k/v: (B, H, L, D); bias: (B, Lk).

    Requires B % data == 0 and H % model == 0 (callers fall back to the
    unsharded op otherwise)."""
    from ..ops.attention import attention

    try:
        from jax import shard_map as _sm

        def smap(fn, in_specs, out_specs):
            return _sm(fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs)
    except ImportError:  # older jax: experimental API with check_rep
        from jax.experimental.shard_map import shard_map as _sm_old

        def smap(fn, in_specs, out_specs):
            return _sm_old(fn, mesh=mesh, in_specs=in_specs,
                           out_specs=out_specs, check_rep=False)

    qspec = P("data", "model", None, None)

    if bias is None:
        f = smap(
            lambda q_, k_, v_: attention(q_, k_, v_, None, scale),
            in_specs=(qspec, qspec, qspec),
            out_specs=qspec,
        )
        return f(q, k, v)
    f = smap(
        lambda q_, k_, v_, b_: attention(q_, k_, v_, b_, scale),
        in_specs=(qspec, qspec, qspec, P("data", None)),
        out_specs=qspec,
    )
    return f(q, k, v, bias)


def use_head_sharding(q_shape, mesh: Optional[Mesh]) -> bool:
    """True when the (B, H, L, D) shape divides the published mesh."""
    if mesh is None:
        return False
    b, h = q_shape[0], q_shape[1]
    return b % mesh.shape["data"] == 0 and h % mesh.shape["model"] == 0
