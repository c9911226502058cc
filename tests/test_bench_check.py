"""The bench's in-process Pallas hardware check must itself be correct.

``bench.py::_pallas_hardware_check`` is what stamps ``pallas_on_device`` into
every round's driver-captured artifact (VERDICT r3 next #8).  Validate its
logic here through the Pallas interpreter so a bug in the check can't
misreport hardware status.
"""

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


@pytest.mark.slow
def test_pallas_hardware_check_logic():
    from bench import _pallas_hardware_check

    # smaller shapes than the bench's compiled run: interpret-mode Pallas
    # cost scales with element count (the full 4096-point check was 137 s of
    # the slow suite for the same logic coverage)
    assert _pallas_hardware_check(
        lambda m: None, interpret=True, n_points=2048, n_q=64
    ) == "passed"
