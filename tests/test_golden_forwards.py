"""Module-level golden forwards (VERDICT r2 #7): fixed-seed tiny models
(the __graft_entry__ TSM config, PointPillars, SECOND) must reproduce
their committed eval-forward outputs within tolerance. A kernel
refactor, BN-config drift, or fusion-order change that shifts numerics
now FAILS the suite instead of slipping through finiteness checks.

Regenerate intentionally with: python tools/gen_golden_forwards.py
(CPU backend; say so in the commit).
"""
import pathlib

import numpy as np
import pytest

from tests.golden_forwards_common import ALL_CASES

GOLDEN_DIR = pathlib.Path(__file__).resolve().parent / "goldens"

pytestmark = pytest.mark.slow


@pytest.mark.parametrize("case", ALL_CASES, ids=lambda c: c.__name__)
def test_golden_forward(case):
    name, outputs = case()
    path = GOLDEN_DIR / f"{name}_forward.npz"
    assert path.exists(), (
        f"missing golden {path} — generate with "
        f"tools/gen_golden_forwards.py"
    )
    golden = np.load(path)
    assert set(golden.files) == set(outputs)
    for key in golden.files:
        got, want = outputs[key], golden[key]
        assert got.shape == want.shape, (name, key, got.shape, want.shape)
        # scale-aware tolerance: box coords are O(10), logits O(1)
        scale = max(1.0, float(np.abs(want).max()))
        np.testing.assert_allclose(
            got, want, atol=1e-3 * scale, rtol=1e-3,
            err_msg=f"{name}/{key} drifted from committed golden "
                    f"(intentional? regenerate via "
                    f"tools/gen_golden_forwards.py and say so)",
        )
