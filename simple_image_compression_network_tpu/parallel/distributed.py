"""Multi-host orchestration (SURVEY.md §5: distributed backend, DCN side).

Single-host pods need nothing; multi-host slices call
``initialize_multihost()`` once per process before device use.  Failure
detection is heartbeat-by-construction: ``jax.distributed`` barriers fail
fast when a host dies, and the idempotent per-image work units in the codec
(one bitstream per image) make coordinator-level retry safe.
"""

from __future__ import annotations

import os
from typing import Optional

import jax


def initialize_multihost(coordinator: Optional[str] = None,
                         num_processes: Optional[int] = None,
                         process_id: Optional[int] = None) -> bool:
    """Initialize jax.distributed from args or env (JAX_COORDINATOR_ADDRESS,
    JAX_NUM_PROCESSES, JAX_PROCESS_ID).  Returns True if multi-host."""
    coordinator = coordinator or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if not coordinator:
        return False
    num_processes = num_processes or int(os.environ.get("JAX_NUM_PROCESSES",
                                                        "1"))
    process_id = process_id if process_id is not None else int(
        os.environ.get("JAX_PROCESS_ID", "0"))
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=process_id)
    return True


def is_primary() -> bool:
    return jax.process_index() == 0


def global_mesh_devices():
    """All devices across hosts, ordered for a global mesh."""
    return jax.devices()
