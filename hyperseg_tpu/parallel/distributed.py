"""Multi-host (multi-process) runtime initialization.

Single-host multi-chip needs nothing: the ('data', 'spatial') mesh covers all
local devices over ICI. For multi-host pods, call `initialize()` once per
process before any jax op — the same SPMD program then spans hosts, with data
parallelism riding DCN between hosts and ICI within them. This replaces the
reference's (nonexistent) torch.distributed setup; its only distributed
artifact was a dormant confusion-matrix all_reduce (seg_utils.py:38-44),
covered here by psum inside the jitted steps.
"""

from __future__ import annotations

import os
from typing import Optional

import jax


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None):
    """jax.distributed.initialize with env-var fallbacks
    (COORDINATOR_ADDRESS / NUM_PROCESSES / PROCESS_ID); no-op when
    single-process."""
    coordinator_address = coordinator_address or os.environ.get("COORDINATOR_ADDRESS")
    if coordinator_address is None:
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=int(num_processes or os.environ.get("NUM_PROCESSES", 1)),
        process_id=int(process_id or os.environ.get("PROCESS_ID", 0)))
    return True


def global_mesh(n_spatial: int = 1):
    """Mesh over *all* processes' devices (jax.devices() is global after
    initialize())."""
    from hyperseg_tpu.parallel.mesh import make_mesh
    return make_mesh(n_spatial=n_spatial)


def is_main_process() -> bool:
    return jax.process_index() == 0
