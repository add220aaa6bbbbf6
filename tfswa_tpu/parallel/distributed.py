"""Multi-host (multi-process) entry point: DCN-spanning meshes.

The reference is strictly single-process (SURVEY.md section 2.7: no
torch.distributed anywhere); SURVEY section 5.8 scopes DCN-spanning meshes
for multi-host as this framework's own design territory.  The pieces:

  - :func:`initialize_distributed` — one call before any JAX backend use;
    after it, ``jax.devices()`` is the GLOBAL device list, so
    ``parallel.mesh.create_mesh`` builds DCN-spanning meshes unchanged
    (device order groups by process, so the 'data' axis maps process-major:
    each host owns a contiguous batch slice).
  - :func:`process_info` — (process_index, process_count) for data sharding.
  - :func:`make_global_batch` — assemble a global jax.Array from each
    process's LOCAL slice of the batch (the multi-host replacement for
    ``jax.device_put(full_array, sharding)``, which would need every
    process to materialize the full batch).

Data flows per-process: ``data.pipeline.DataLoader(num_shards=P,
shard_index=p)`` loads only this host's slice of every global batch (same
shuffle order everywhere — the loader's RNG is seeded identically), and
``prefetch_to_device`` assembles the global array.

Checkpointing note: with pure data parallelism the params/opt_state are
replicated (fully addressable on every host), so the Trainer's host-gather
checkpoint path works unchanged; process 0 should own the write
(``jax.process_index() == 0``).  Tensor-parallel sharding across hosts
would need orbax multi-process checkpointing — not wired yet.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Initialize JAX's multi-process runtime; returns True when distributed.

    Single-process (no coordinator and no cluster env) is a no-op returning
    False, so the same training script runs unchanged on one host.
    Idempotent: a second call after successful initialization is a no-op.

    On TPU pods, ``jax.distributed.initialize()`` auto-detects the cluster
    from the TPU environment; pass explicit args only off-pod (e.g. GPU/CPU
    clusters or tests).
    """
    if jax.process_count() > 1:
        return True  # already initialized
    explicit = coordinator_address is not None
    if not explicit and num_processes in (None, 1):
        # no cluster requested/available: stay single-process
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return jax.process_count() > 1


def process_info() -> Tuple[int, int]:
    """(process_index, process_count) — the data-sharding coordinates."""
    return jax.process_index(), jax.process_count()


def make_global_batch(local_batch, sharding):
    """Global jax.Array from this process's local slice of the batch.

    ``local_batch`` pytree leaves hold only the rows this process owns
    (global_batch / process_count, contiguous — matching the process-major
    'data' axis order of create_mesh).  Works single-process too, where it
    is equivalent to ``jax.device_put(x, sharding)``.
    """
    return jax.tree_util.tree_map(
        lambda x: jax.make_array_from_process_local_data(sharding, x),
        local_batch,
    )
