"""tpuslam — a TPU-native point-set registration framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the CUDA/C++
reference ``Sliwson/cuda-slam`` (see SURVEY.md): three rigid registration
algorithms (ICP, non-iterative CP, Coherent Point Drift) behind one
registration API, the reference's JSON config contract, cloud synthesis
pipeline, benchmark harness and CSV output — built TPU-first:

* one algorithm implementation per method (no CPU/GPU twins) that runs on
  CPU jax for tests and on TPU for production,
* the O(N*M) hot loops (NN correspondence argmin, CPD responsibility
  accumulation) as blocked MXU-friendly Pallas kernels,
* multi-chip scaling by sharding the target cloud over a device mesh and
  reducing argmins / moment sums with XLA collectives.
"""

__version__ = "0.1.0"

from tpuslam.core.types import RigidTransform, Cloud, pad_cloud, unpad  # noqa: F401
from tpuslam.config.configuration import (  # noqa: F401
    Configuration,
    ComputationMethod,
    ExecutionPolicy,
    ApproximationType,
)


def register(before, after, config=None, **overrides):
    """One-call registration: host ``f32[N,3]`` arrays in, (rotation,
    translation, iterations, error) out — the reference's ``SlamFunc``
    contract (``testrunner.h:8``) as a library call.

    ``config`` defaults to an ICP ``Configuration``; keyword overrides are
    applied on top (e.g. ``register(a, b, computation_method=
    ComputationMethod.Cpd, cpd_weight=0.1)``)."""
    from dataclasses import replace

    from tpuslam.algorithms.registry import run_with_configuration

    if config is None:
        config = Configuration()
    if overrides:
        config = replace(config, **overrides)
    return run_with_configuration(before, after, config)
