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

from contextlib import contextmanager
from typing import Optional, Sequence, Tuple

import jax
from jax import Array
from jax.sharding import Mesh, PartitionSpec as P

_MODEL_MESH: Optional[Mesh] = None
_ACTIVE_MESH: Optional[Mesh] = None
_IN_MANUAL: bool = False


def _smap(mesh: Mesh, fn, in_specs, out_specs):
    """shard_map across jax versions (new top-level API vs experimental).
    Replication checking is off: bodies may hold Pallas custom calls whose
    varying-axes inference is opaque, and fully-replicated fallback specs
    (see :func:`run_manual`) produce outputs the checker cannot prove
    replicated."""
    try:
        from jax import shard_map as _sm

        return _sm(fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                   check_vma=False)
    except ImportError:  # older jax: experimental API with check_rep
        from jax.experimental.shard_map import shard_map as _sm_old

        return _sm_old(fn, mesh=mesh, in_specs=in_specs,
                       out_specs=out_specs, check_rep=False)


def set_active_mesh(mesh: Optional[Mesh]) -> None:
    """Publish (or clear, with None) the mesh every Pallas-backed op must
    partition itself over. Mosaic custom calls CANNOT be auto-partitioned
    by XLA's SPMD pass — a multi-device jit that reaches one outside a
    shard_map fails to lower ("Please wrap the call in a shard_map",
    jax tpu_custom_call.py) — so whenever a computation is jitted over a
    mesh, the mesh is published here and the op prims in ``ops/*`` route
    their forward through :func:`run_manual`. Trace-time state, like
    :func:`set_model_mesh`."""
    global _ACTIVE_MESH
    _ACTIVE_MESH = mesh


def get_active_mesh() -> Optional[Mesh]:
    mesh = _ACTIVE_MESH
    if mesh is None or mesh.size <= 1:
        return None
    return mesh


@contextmanager
def published_mesh(mesh: Optional[Mesh]):
    """Scoped :func:`set_active_mesh`: publish ``mesh`` (no-op when None)
    for the duration of a dispatch whose jits trace inside, restoring the
    previous publication after. Lets the eval sampler shard its launches
    without clobbering a trainer-published mesh in the same process."""
    global _ACTIVE_MESH
    prev = _ACTIVE_MESH
    if mesh is not None:
        _ACTIVE_MESH = mesh
    try:
        yield
    finally:
        _ACTIVE_MESH = prev


@contextmanager
def trace_meshes(active: Optional[Mesh], model: Optional[Mesh]):
    """Scoped publication of BOTH trace-time meshes (the Pallas shard_map
    mesh and the joint-attention head-sharding mesh) around a jitted call
    whose traces must see them. Restoring on exit keeps the globals from
    leaking into later traces in the same process — e.g. the in-training
    validation hook's sampling jits, which must NOT inherit the train
    step's mesh (they publish their own via :func:`published_mesh`)."""
    global _ACTIVE_MESH, _MODEL_MESH
    prev_active, prev_model = _ACTIVE_MESH, _MODEL_MESH
    _ACTIVE_MESH, _MODEL_MESH = active, model
    try:
        yield
    finally:
        _ACTIVE_MESH, _MODEL_MESH = prev_active, prev_model


@contextmanager
def manual_region():
    """Marks a shard_map body trace: ops called inside must NOT re-wrap
    themselves (nested shard_map over the same mesh is illegal). Tracing is
    synchronous, so a plain module flag is correct."""
    global _IN_MANUAL
    prev = _IN_MANUAL
    _IN_MANUAL = True
    try:
        yield
    finally:
        _IN_MANUAL = prev


def _batch_axes(n: int, mesh: Mesh) -> Tuple[str, ...]:
    """Finest mesh-axis tuple that evenly shards a leading batch dim of n:
    all axes, the data axis alone, or none (fully replicated compute —
    still legal, every device runs the whole op)."""
    if n % mesh.size == 0:
        return tuple(mesh.axis_names)
    if "data" in mesh.axis_names and n % mesh.shape["data"] == 0:
        return ("data",)
    return ()


def run_manual(fn, batched: Sequence[Array], replicated: Sequence[Array] = ()):
    """Execute ``fn(*batched, *replicated)`` under a shard_map over ALL axes
    of the active mesh, sharding each batched operand's LEADING axis as
    finely as divisibility allows and replicating the rest.

    This is the legality shim for Pallas kernels under multi-device jit
    (see :func:`set_active_mesh`) and simultaneously the tensor-parallel
    execution path for the per-frame fused blocks: with
    ``trainer.strategy=data_model`` the (b*v) per-frame batch shards over
    data AND model — view parallelism — so the model axis scales the
    per-frame attention/FF compute, not just the joint attention's heads.

    No-op (direct call) when no mesh is active, the mesh has one device, or
    we are already inside a shard_map body. The ops' per-example math has
    no cross-batch reductions, so sharding choice never changes numerics."""
    mesh = get_active_mesh()
    if mesh is None or _IN_MANUAL:
        return fn(*batched, *replicated)
    axes = _batch_axes(batched[0].shape[0], mesh)
    lead = axes if axes else None
    in_specs = tuple(
        P(lead, *([None] * (x.ndim - 1))) for x in batched
    ) + tuple(P() for _ in replicated)
    out_specs = P(lead, *([None] * (batched[0].ndim - 1)))

    def body(*args):
        with manual_region():
            return fn(*args)

    return _smap(mesh, body, in_specs, out_specs)(*batched, *replicated)


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

    qspec = P("data", "model", None, None)

    if bias is None:

        def body3(q_, k_, v_):
            with manual_region():
                return attention(q_, k_, v_, None, scale)

        return _smap(
            mesh, body3, in_specs=(qspec, qspec, qspec), out_specs=qspec
        )(q, k, v)

    def body4(q_, k_, v_, b_):
        with manual_region():
            return attention(q_, k_, v_, b_, scale)

    return _smap(
        mesh, body4,
        in_specs=(qspec, qspec, qspec, P("data", None)),
        out_specs=qspec,
    )(q, k, v, bias)


def use_head_sharding(q_shape, mesh: Optional[Mesh]) -> bool:
    """True when the (B, H, L, D) shape divides the published mesh."""
    if mesh is None:
        return False
    b, h = q_shape[0], q_shape[1]
    return b % mesh.shape["data"] == 0 and h % mesh.shape["model"] == 0
