"""Multi-host bring-up helpers.

The reference has no multi-node anything (SURVEY.md §2.3); this is the TPU
build's SPMD launch layer: every host runs the same program,
``jax.distributed.initialize`` wires up the cluster, and the mesh from
parallel/mesh.py then spans all hosts' devices (bands within a slice ride
ICI; cross-host traffic rides DCN).  Failure recovery is restart-from-
checkpoint of params + frame counters (io/checkpoint.py) - resuming is
deterministic because the RNG is a pure function of (pixel, frame).
"""

from __future__ import annotations

import os
from typing import Optional

import jax


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Initialize multi-host JAX if configured; returns True when running
    distributed.  No-ops on a single host (or when already initialized)."""
    coordinator_address = coordinator_address or os.environ.get("CPT_COORDINATOR")
    if num_processes is None:
        num_processes = int(os.environ.get("CPT_NUM_PROCESSES", "0")) or None
    if process_id is None:
        pid = os.environ.get("CPT_PROCESS_ID")
        process_id = int(pid) if pid is not None else None
    if not coordinator_address or not num_processes or num_processes <= 1:
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return True


def run_with_checkpoint_recovery(
    work,
    checkpoint_dir: str,
    *,
    max_restarts: int = 3,
    on_restart=None,
):
    """Failure-recovery harness: run ``work(state_dict) -> final_state`` with
    restart-from-checkpoint on transient device failures.

    The reference's failure story is surface-reconfigure-or-exit
    (event_loop.rs:51-67); the multi-host TPU analog (SURVEY.md §5) is
    restart-from-checkpoint: ``work`` receives the last checkpoint state
    (empty dict on a fresh start) and is expected to call
    io.checkpoint.save_checkpoint(checkpoint_dir, ...) at its own cadence.
    Deterministic resume is guaranteed by the counter RNG: re-rendering from
    the stored frame counters reproduces the exact sample sequence.
    """
    from ..io.checkpoint import load_checkpoint

    attempts = 0
    while True:
        state = {}
        try:
            state = load_checkpoint(checkpoint_dir)
        except Exception:
            pass
        try:
            return work(state)
        except jax.errors.JaxRuntimeError:
            attempts += 1
            if attempts > max_restarts:
                raise
            if on_restart is not None:
                on_restart(attempts)


def local_device_info() -> dict:
    """Topology summary for logging / perf accounting."""
    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_devices": len(jax.local_devices()),
        "global_devices": len(jax.devices()),
        "platform": jax.devices()[0].platform,
    }
