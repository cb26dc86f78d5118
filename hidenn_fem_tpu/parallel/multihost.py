"""Multi-host (multi-process) initialization helpers.

Single-host multi-chip needs nothing: ``device_mesh()`` sees all local
devices.  Multi-host TPU slices (or CPU/GPU clusters) coordinate through
``jax.distributed.initialize`` over DCN; afterwards ``jax.devices()``
returns the *global* device list and the same element-sharding code works
unchanged (GSPMD inserts ICI collectives within a slice and DCN
collectives across hosts).

The reference has no distributed support of any kind (SURVEY.md §2).
"""

from __future__ import annotations

from typing import Optional

import jax

__all__ = ["initialize_multihost", "is_multihost", "process_summary"]


def initialize_multihost(coordinator_address: Optional[str] = None,
                         num_processes: Optional[int] = None,
                         process_id: Optional[int] = None) -> None:
    """Join the multi-process JAX runtime.

    On TPU pods all arguments are auto-detected from the environment; on
    other platforms pass them explicitly.  Call once, before any other
    JAX operation, on every process.
    """
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def is_multihost() -> bool:
    return jax.process_count() > 1


def process_summary() -> dict:
    """Diagnostic snapshot of the process topology."""
    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_devices": len(jax.local_devices()),
        "global_devices": len(jax.devices()),
    }
