"""Test harness configuration.

Tests run on CPU with a virtual 8-device mesh so that every sharding/collective
path is exercised without TPU hardware (mirrors the driver's multichip dry-run).
Must set env vars BEFORE jax is imported anywhere.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The machine's sitecustomize may import jax and pin jax_platforms before this
# file runs; override via the config API as well (works as long as no backend
# has been initialized yet).
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.default_backend() == "cpu", "tests must run on the virtual CPU mesh"
assert len(jax.devices()) == 8, "expected 8 virtual CPU devices"

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_addoption(parser):
    parser.addoption(
        "--runslow", action="store_true", default=False,
        help="also run tests marked slow (the full CI-style suite)",
    )


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: heavy parity/e2e test (>~8s); excluded from the default "
        "selection so `pytest tests/ -q` stays under ~5 min — run the full "
        "suite with `pytest tests/ --runslow` (VERDICT r3 next #7)",
    )


def pytest_collection_modifyitems(config, items):
    if config.getoption("--runslow"):
        return
    skip_slow = pytest.mark.skip(reason="slow test: pass --runslow to include")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip_slow)


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def make_cloud(n: int, rng: np.random.Generator, scale: float = 1.0) -> np.ndarray:
    """Random cloud on a wavy surface — gives meaningful normals/curvature."""
    xy = rng.uniform(-scale, scale, size=(n, 2))
    z = 0.3 * np.sin(2.0 * xy[:, 0]) * np.cos(1.5 * xy[:, 1])
    pts = np.column_stack([xy, z])
    pts += rng.normal(scale=0.005 * scale, size=pts.shape)
    return pts.astype(np.float64)


@pytest.fixture
def surface_cloud(rng):
    return make_cloud(500, rng)
