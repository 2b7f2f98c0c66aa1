"""Multi-host initialization (SURVEY §5.8 — new scope vs the single-GPU
reference, which has no communication backend at all).

On a multi-host TPU slice, call ``initialize()`` once per process before
any jax usage; the mesh from ``tpuslam.parallel.mesh.make_mesh`` then
spans every chip in the slice and the sharded registration entry points
(``icp_register_sharded`` / ``cpd_register_sharded`` /
``nicp_register_sharded``) issue their ``psum``/``pmin`` collectives over
ICI within hosts and DCN between them — XLA handles the hierarchy; no
NCCL/MPI analog exists or is needed.

Single-host (or single-chip) runs need no initialization; ``make_mesh``
over ``jax.devices()`` just works.
"""

from __future__ import annotations

from typing import Optional


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """``jax.distributed.initialize`` passthrough; arguments default to
    TPU-pod auto-detection (the usual case — no args on Cloud TPU)."""
    import jax

    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def is_multi_process() -> bool:
    import jax

    return jax.process_count() > 1
