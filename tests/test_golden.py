r"""Golden-trajectory regression: the fused scan's output over a recorded
fixture must stay bit-stable (within float noise) across refactors.

Regenerate the fixture with ``python tests/make_golden.py`` only after an
*intentional* semantic change, and explain the change in the commit.
"""

import os

import numpy as np
import pytest

GOLDEN = os.path.join(os.path.dirname(__file__), "golden_trajectory.npz")


@pytest.mark.skipif(not os.path.exists(GOLDEN),
                    reason="golden fixture not generated")
def test_matches_golden_trajectory():
    from make_golden import build
    pose, tran = build()
    ref = np.load(GOLDEN)
    np.testing.assert_allclose(pose, ref["pose"], atol=5e-4)
    np.testing.assert_allclose(tran, ref["tran"], atol=5e-4)
