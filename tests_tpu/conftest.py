"""Hardware-parity test harness.

Unlike ``tests/`` (which pins the CPU backend + virtual mesh), this suite
runs on whatever accelerator is attached and skips itself entirely off-TPU —
it exists to catch Mosaic lowering regressions that interpret-mode tests
cannot see (ADVICE r1 #4).  Run with: ``python -m pytest tests_tpu/``.
"""

import jax
import pytest


def pytest_collection_modifyitems(config, items):
    if jax.default_backend() in ("tpu", "axon"):
        return
    skip = pytest.mark.skip(reason="Pallas hardware parity needs a real TPU")
    for item in items:
        item.add_marker(skip)
