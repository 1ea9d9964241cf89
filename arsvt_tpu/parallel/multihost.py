"""Multi-host (multi-process) SPMD wiring.

The reference is single-GPU with no distributed backend at all
(/root/reference/train.py:1392, SURVEY.md §2); single-host multi-chip is
covered by `parallel/mesh.py` + `jax.sharding`. This module adds the
multi-HOST layer for pod slices larger than one VM:

  * `initialize_multihost()` — guarded `jax.distributed.initialize()`.
    On TPU pods every argument auto-discovers from the TPU metadata; on
    CPU/GPU clusters pass coordinator_address/num_processes/process_id.
    Safe to call unconditionally: it is a no-op when already initialized
    or when the environment carries no multi-process signal.
  * `local_batch` / `global_batch_from_local` — each process feeds its
    own stride-shard of the data (data/pipeline.py `process_index`/
    `process_count`) at `global_batch // process_count` rows;
    `global_batch_from_local` assembles the per-host arrays into one
    global `jax.Array` over the mesh (`make_array_from_process_local_data`)
    so the SAME jitted train step runs unchanged — XLA's collectives ride
    ICI within a host and DCN across hosts.

The train CLI activates this under `ARSVT_MULTIHOST=1` (every process
runs the identical command line). Gradient math is unchanged: the loss
mean over the global batch implies the same pmean the single-host mesh
already lowers.
"""

from __future__ import annotations

import jax

_INITIALIZED = False


def initialize_multihost(coordinator_address: str | None = None,
                         num_processes: int | None = None,
                         process_id: int | None = None) -> bool:
    """Initialize the JAX distributed runtime once; returns True when the
    runtime spans more than one process afterwards."""
    global _INITIALIZED
    # A launcher (or another library) may have initialized the runtime
    # before us — that is success, not failure. jax.distributed raises
    # RuntimeError("distributed.initialize should only be called once.")
    # on re-entry, so probe first instead of string-matching the error.
    if not _INITIALIZED and jax.distributed.is_initialized():
        _INITIALIZED = True
    if not _INITIALIZED:
        try:
            jax.distributed.initialize(
                coordinator_address=coordinator_address,
                num_processes=num_processes,
                process_id=process_id,
            )
            _INITIALIZED = True
        except (RuntimeError, ValueError) as e:
            # re-entry raced between the probe and the call: fine; a
            # single-process environment with no coordinator info raises —
            # treat as single-host rather than crashing local runs
            if ("should only be called once" in str(e)
                    or "already initialized" in str(e).lower()):
                _INITIALIZED = True
            else:
                return False
    return jax.process_count() > 1


def local_batch(global_batch_size: int) -> int:
    """Rows this process must feed per step (global batch // processes)."""
    n = jax.process_count()
    if global_batch_size % n:
        raise ValueError(
            f"global batch {global_batch_size} must divide over "
            f"{n} processes"
        )
    return global_batch_size // n


def global_batch_from_local(local, mesh) -> dict:
    """Per-process host arrays -> one global jax.Array batch on the mesh.

    `local` is this process's batch pytree with leading dim
    `global_batch // process_count`; the result has the full global
    leading dim, sharded over the mesh's data axis, ready for the jitted
    step. Single-process: equivalent to `shard_batch`.
    """
    import numpy as np

    from arsvt_tpu.parallel.sharding import DATA_AXIS, shard_batch

    if jax.process_count() == 1:
        return shard_batch(local, mesh)

    from jax.sharding import NamedSharding, PartitionSpec as P

    def place(x):
        x = np.asarray(x)
        sharding = NamedSharding(
            mesh, P(DATA_AXIS, *([None] * (x.ndim - 1)))
        )
        global_shape = (x.shape[0] * jax.process_count(),) + x.shape[1:]
        return jax.make_array_from_process_local_data(
            sharding, x, global_shape
        )

    return jax.tree_util.tree_map(place, local)
