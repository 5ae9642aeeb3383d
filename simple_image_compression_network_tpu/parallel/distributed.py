"""Multi-host orchestration (SURVEY.md §5: distributed backend, DCN side).

Single-host pods need nothing; multi-host slices call
``initialize_multihost()`` once per process before device use.

Failure story (tested in ``tests/test_distributed.py`` with real
processes over loopback DCN):
* detection — ``initialize_multihost`` bounds coordinator rendezvous with
  ``init_timeout``; a dead/missing host raises instead of hanging, and
  ``barrier`` gives the same bounded-wait guarantee at sync points
  mid-run.
* recovery — codec work units are idempotent (one image -> one bitstream,
  no cross-image state), so ``run_with_retry`` can re-run a failed unit
  (on a respawned worker or the surviving hosts' new mesh) without
  corrupting anything.
"""

from __future__ import annotations

import os
import time
from typing import Callable, Optional, TypeVar

import jax

T = TypeVar("T")


def initialize_multihost(coordinator: Optional[str] = None,
                         num_processes: Optional[int] = None,
                         process_id: Optional[int] = None,
                         init_timeout: Optional[int] = None) -> bool:
    """Initialize jax.distributed from args or env (JAX_COORDINATOR_ADDRESS,
    JAX_NUM_PROCESSES, JAX_PROCESS_ID).  Returns True if multi-host.

    ``init_timeout`` (seconds) bounds the coordinator rendezvous: if any
    expected host never shows up, this raises instead of hanging — the
    cluster-bringup half of failure detection."""
    coordinator = coordinator or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if not coordinator:
        return False
    num_processes = num_processes or int(os.environ.get("JAX_NUM_PROCESSES",
                                                        "1"))
    process_id = process_id if process_id is not None else int(
        os.environ.get("JAX_PROCESS_ID", "0"))
    kwargs = {}
    if init_timeout is not None:
        kwargs["initialization_timeout"] = init_timeout
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=process_id, **kwargs)
    return True


def is_primary() -> bool:
    return jax.process_index() == 0


def global_mesh_devices():
    """All devices across hosts, ordered for a global mesh."""
    return jax.devices()


def barrier(name: str, timeout_s: float = 60.0) -> None:
    """Cross-host sync point with bounded wait.

    Raises if any host fails to arrive within ``timeout_s`` — the
    steady-state half of failure detection (a dead host is noticed at the
    next barrier, not never)."""
    client = jax._src.distributed.global_state.client
    if client is None:
        return  # single process
    client.wait_at_barrier(name, timeout_in_ms=int(timeout_s * 1000))


def run_with_retry(fn: Callable[[], T], max_retries: int = 2,
                   backoff_s: float = 0.5,
                   retry_on: tuple = (Exception,)) -> T:
    """Run an IDEMPOTENT work unit, retrying on transient failure.

    The codec's units (one image -> one bitstream; one bitstream -> one
    reconstruction) are stateless and repeatable, so re-running after an
    RPC/device failure is always safe."""
    err: Optional[BaseException] = None
    for attempt in range(max_retries + 1):
        try:
            return fn()
        except retry_on as e:  # noqa: PERF203
            err = e
            if attempt < max_retries:
                time.sleep(backoff_s * (2 ** attempt))
    raise err  # type: ignore[misc]
