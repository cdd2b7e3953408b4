"""Test helpers (reference robogym/utils/testing.py:4-19)."""

import numpy as np


def assert_dict_match(a: dict, b: dict, eps: float = 1e-8):
    """Recursively assert two (possibly nested) dicts of arrays/scalars
    match: same key sets, numeric leaves within eps, others equal."""
    assert set(a.keys()) == set(b.keys()), (
        f"key mismatch: {sorted(a)} vs {sorted(b)}"
    )
    for k in a:
        va, vb = a[k], b[k]
        if isinstance(va, dict):
            assert_dict_match(va, vb, eps)
        elif isinstance(va, (int, float, np.ndarray)) or hasattr(va, "shape"):
            assert np.allclose(np.asarray(va), np.asarray(vb), atol=eps), (
                f"value mismatch for key {k!r}: {va} vs {vb}"
            )
        else:
            assert va == vb, f"value mismatch for key {k!r}: {va} vs {vb}"
