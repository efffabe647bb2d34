"""TPU-lane test config: run on the REAL chip (axon platform), unlike
tests/ which forces an 8-virtual-device CPU mesh.

Run with ``make test-tpu``.  Keep this lane small: first compile of
each distinct op/shape costs 10-40 s through the tunnel, and the
timeout budget is per-file.  TPU-safe dtypes only (bool/int8/int32/
uint32/f32 — s64 dot_general and complex kernels fail on the axon
compiler; those sweeps live in the CPU suite).
"""

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(7)


@pytest.fixture(scope="session", autouse=True)
def _require_tpu():
    import jax
    if jax.default_backend() in ("cpu",):
        pytest.skip("TPU lane requires a TPU/axon backend",
                    allow_module_level=True)
