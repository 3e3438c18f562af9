"""Native C++ LAP solver vs scipy on random square/rectangular problems."""

import numpy as np
import pytest
from scipy.optimize import linear_sum_assignment


def test_native_lap_matches_scipy():
    from gomatching_tpu.ops import hungarian

    lib = hungarian._load_native()
    if lib is None:
        pytest.skip("no C++ toolchain available")
    rng = np.random.RandomState(0)
    for trial in range(30):
        n = rng.randint(1, 40)
        m = rng.randint(1, 40)
        cost = rng.randn(n, m) * 10
        r1, c1 = hungarian.solve(cost)
        r2, c2 = linear_sum_assignment(cost)
        # optimal assignments may differ; optimal COST must match
        assert len(r1) == len(r2) == min(n, m)
        assert len(set(c1)) == len(c1)  # valid one-to-one
        np.testing.assert_allclose(
            cost[r1, c1].sum(), cost[r2, c2].sum(), rtol=1e-9, atol=1e-9
        )


def test_native_lap_with_inf_padding():
    from gomatching_tpu.ops import hungarian

    cost = np.asarray([[0.1, np.inf], [np.inf, 0.2], [5.0, 5.0]])
    r, c = hungarian.solve(cost)
    pairs = dict(zip(r.tolist(), c.tolist()))
    assert pairs[0] == 0 and pairs[1] == 1
