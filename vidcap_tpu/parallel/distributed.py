"""Multi-host initialization (SURVEY.md §2.3 "Comm backend" row).

One call before any jax use on multi-host TPU slices; the global mesh in
parallel/mesh.py then spans all hosts' devices and XLA lowers DP's psum over
ICI within a slice / DCN across slices. No custom comm layer — by design.
"""
from __future__ import annotations

import os
from typing import Optional

import jax


def initialize_multihost(coordinator: Optional[str] = None,
                         num_processes: Optional[int] = None,
                         process_id: Optional[int] = None) -> bool:
    """Initialize jax.distributed when running under a multi-host launcher.

    No-ops (returns False) in single-process runs so every entry point can call
    it unconditionally. TPU pods auto-detect via the TPU metadata env; explicit
    args (or JAX_COORDINATOR_ADDRESS etc.) override."""
    multi = (coordinator or os.environ.get("JAX_COORDINATOR_ADDRESS")
             or os.environ.get("MEGASCALE_COORDINATOR_ADDRESS")
             or os.environ.get("TPU_WORKER_HOSTNAMES", "").count(",") > 0)
    if not multi:
        return False
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=process_id)
    return True
