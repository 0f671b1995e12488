"""Multi-host bootstrap.

The reference is multi-node-aware through Lightning (``num_nodes`` consumed
in LR scaling, reference ``src/model/diffusion_wrapper.py:160-163``; DDP
spawn in ``src/main.py:123-133``) but delegates process bring-up to the
launcher. The JAX equivalent is an explicit ``jax.distributed.initialize``
before first device use; after it, ``jax.device_count()`` spans all hosts
(so the existing LR scaling is already multi-host correct),
``jax.process_index()/process_count()`` drive the loader's host-local
striping (``data/loader.py``), and the ``psum``-carrying train step rides
ICI within a slice and DCN across hosts with no further code.

Launch recipe (one command per host):

    MVLDM_COORDINATOR=host0:8476 MVLDM_NUM_PROCESSES=4 MVLDM_PROCESS_ID=0 \\
        python -m mvldm_tpu.scripts.main +experiment=baseline mode=train ...
    MVLDM_COORDINATOR=host0:8476 MVLDM_NUM_PROCESSES=4 MVLDM_PROCESS_ID=1 \\
        ... (and so on per host)

On Cloud TPU pods, plain ``jax.distributed.initialize()`` auto-discovers
everything from the TPU metadata server — set ``MVLDM_DISTRIBUTED=1`` to
request that without the explicit triplet.
"""

from __future__ import annotations

import os

_initialized = False


def is_main_process() -> bool:
    """True on the process that owns host-side output (rank 0).

    The JAX equivalent of the reference's rank guards
    (``rank_zero_only`` at ``diffusion_wrapper.py:492``, ``global_rank == 0``
    at ``:665,925``, ``wandb.run is None`` on nonzero ranks at
    ``src/main.py:67-69``): console/JSONL logging, validation rendering and
    checkpoint-pointer publication run once per job, not once per host."""
    import jax

    return jax.process_index() == 0


def sync_processes(name: str) -> None:
    """Barrier across processes (no-op single-process). Used around
    filesystem operations that only rank 0 performs but later ranks depend
    on (checkpoint directory pre-delete before a collective orbax save)."""
    import jax

    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(name)


def maybe_initialize_distributed(env=os.environ) -> bool:
    """Initialize ``jax.distributed`` when the environment requests it.

    Returns True when initialization ran. No-ops (returning False) when no
    multi-host variables are set, so single-host usage never pays the
    coordinator handshake; raises if only part of the explicit triplet
    (coordinator/num-processes/process-id) is present.
    """
    global _initialized
    if _initialized:
        return True

    coordinator = env.get("MVLDM_COORDINATOR")
    num_processes = env.get("MVLDM_NUM_PROCESSES")
    process_id = env.get("MVLDM_PROCESS_ID")
    auto = env.get("MVLDM_DISTRIBUTED", "").lower() in ("1", "true", "yes")

    explicit = (coordinator, num_processes, process_id)
    if any(v is not None for v in explicit) and not all(
        v is not None for v in explicit
    ):
        raise ValueError(
            "Partial multi-host configuration: set all of MVLDM_COORDINATOR, "
            f"MVLDM_NUM_PROCESSES, MVLDM_PROCESS_ID (got {explicit})."
        )
    if not auto and coordinator is None:
        return False

    import jax

    if coordinator is not None:
        jax.distributed.initialize(
            coordinator_address=coordinator,
            num_processes=int(num_processes),
            process_id=int(process_id),
        )
    else:
        jax.distributed.initialize()
    _initialized = True
    return True
