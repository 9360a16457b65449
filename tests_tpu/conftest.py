"""TPU-mode test tier: compiled Mosaic kernels vs interpret mode, on chip.

tests/conftest.py forces a CPU fake backend, so the CI suite never runs a
COMPILED Mosaic kernel — Mosaic-only regressions (lowering failures,
compiled-vs-interpret divergence) would otherwise only surface in
benchmarks. This tier (`make test-tpu`) runs each production kernel
compiled on the real chip and asserts parity against its interpret-mode
execution of the same inputs. Skipped entirely off-TPU.
"""

import pytest


def pytest_collection_modifyitems(config, items):
    import jax

    if jax.default_backend() == "tpu":
        return
    skip = pytest.mark.skip(reason="TPU tier: requires a real TPU backend")
    for item in items:
        item.add_marker(skip)
