"""Opt-in real-chip tier (VERDICT r02 next #1): one forward (+backward
where applicable) per model family on the actual TPU plugin — the
complex64 front-ends, complex-valued SSE models, Pallas kernels in
compiled (non-interpret) mode, streaming step loops and the approx-topk
search have CPU-only coverage otherwise.

Run with:  APS_TPU_TEST=1 python -m pytest tests/tpu -q
(the parent conftest skips its CPU forcing when APS_TPU_TEST=1).
The default `pytest tests/` run collects these tests but skips them."""

import os

import pytest

_HERE = os.path.dirname(os.path.abspath(__file__))


def pytest_collection_modifyitems(config, items):
    """Skip the real-chip tests unless APS_TPU_TEST=1. NOTE: pytest calls
    this hook with the WHOLE session's items, so filter to this dir."""
    if os.environ.get("APS_TPU_TEST") == "1":
        return
    skip = pytest.mark.skip(reason="real-chip tier: set APS_TPU_TEST=1")
    for item in items:
        if str(item.fspath).startswith(_HERE):
            item.add_marker(skip)
            item.add_marker(pytest.mark.tpu)
