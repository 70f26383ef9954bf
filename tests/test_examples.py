"""CI guard for the examples.

The reference's `__main__` demo blocks are its entire test surface
(SURVEY.md §4); here the equivalent sweep lives in examples/ and this test
runs every module at reduced sizes so a regression in any example breaks
CI instead of shipping silently. The full-size sweep remains
`python examples/run_all.py`.
"""

import importlib
import os
import sys

import pytest

_EXAMPLES_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "examples")

# per-example size overrides (keyword args to main())
SMALL = {
    "matvec": dict(n=8),
    "residual_norm": dict(n=8),
    "jacobi": dict(n=5),
    "chebyshev": dict(n=8),
    "power_method": dict(n=8, n_iters=10),
    "soc_interp": dict(n=8),
    "vcycle": dict(n=10, n_cycles=3),
    "multigrid_pcg": dict(n=16),
    "train_jacobi": {},       # example configs are already demo-sized
    "train_diffusion": {},
    "band_layout": dict(n=10),
    "unstructured_ell": dict(n=64, k=4),
    "distributed": dict(n=16),
}


def test_sweep_list_in_sync():
    """run_all.py must cover exactly the examples this test covers."""
    sys.path.insert(0, _EXAMPLES_DIR)
    try:
        run_all = importlib.import_module("run_all")
    finally:
        sys.path.remove(_EXAMPLES_DIR)
    assert set(run_all.MODULES) == set(SMALL)


@pytest.mark.parametrize("name", sorted(SMALL))
def test_example_runs(name):
    sys.path.insert(0, _EXAMPLES_DIR)
    try:
        mod = importlib.import_module(name)
        mod.main(**SMALL[name])
    finally:
        sys.path.remove(_EXAMPLES_DIR)
