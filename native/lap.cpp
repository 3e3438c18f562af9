// Dense linear assignment (Hungarian algorithm with potentials, O(n^2 m)).
//
// Native replacement for the per-frame scipy.optimize.linear_sum_assignment
// calls on the tracking hot path (reference: gom_lstmatcher.py:447,:549 and
// matcher.py:94,:153,:197 all solve on the host CPU). Exposed as a plain C ABI
// consumed through ctypes — no pybind11 dependency.
//
// Build: g++ -O3 -shared -fPIC -o liblap.so lap.cpp   (see ops/hungarian.py)

#include <cstddef>
#include <cstdint>
#include <limits>
#include <vector>

using std::size_t;

namespace {

constexpr double kInf = std::numeric_limits<double>::infinity();

// Kuhn-Munkres with row/col potentials ("e-maxx" formulation), 1-indexed
// internally. Requires n <= m; cost is row-major (n x m).
void solve_rect(const double* cost, int n, int m, int* row_to_col) {
  std::vector<double> u(n + 1, 0.0), v(m + 1, 0.0);
  std::vector<int> p(m + 1, 0), way(m + 1, 0);
  for (int i = 1; i <= n; ++i) {
    p[0] = i;
    int j0 = 0;
    std::vector<double> minv(m + 1, kInf);
    std::vector<char> used(m + 1, 0);
    do {
      used[j0] = 1;
      int i0 = p[j0], j1 = -1;
      double delta = kInf;
      for (int j = 1; j <= m; ++j) {
        if (used[j]) continue;
        double cur = cost[(i0 - 1) * m + (j - 1)] - u[i0] - v[j];
        if (cur < minv[j]) {
          minv[j] = cur;
          way[j] = j0;
        }
        if (minv[j] < delta) {
          delta = minv[j];
          j1 = j;
        }
      }
      for (int j = 0; j <= m; ++j) {
        if (used[j]) {
          u[p[j]] += delta;
          v[j] -= delta;
        } else {
          minv[j] -= delta;
        }
      }
      j0 = j1;
    } while (p[j0] != 0);
    do {
      int j1 = way[j0];
      p[j0] = p[j1];
      j0 = j1;
    } while (j0);
  }
  for (int i = 0; i < n; ++i) row_to_col[i] = -1;
  for (int j = 1; j <= m; ++j) {
    if (p[j] > 0) row_to_col[p[j] - 1] = j - 1;
  }
}

}  // namespace

extern "C" {

// Minimum-cost assignment of an (n_rows x n_cols) row-major cost matrix.
// Writes row_to_col[i] = assigned column of row i, or -1 when n_rows > n_cols
// leaves the row unassigned. Returns 0 on success.
int lap_solve(const double* cost, int n_rows, int n_cols, int* row_to_col) {
  if (n_rows <= 0 || n_cols <= 0) return 0;
  if (n_rows <= n_cols) {
    solve_rect(cost, n_rows, n_cols, row_to_col);
    return 0;
  }
  // transpose so rows <= cols, then invert the mapping
  std::vector<double> t(static_cast<size_t>(n_rows) * n_cols);
  for (int i = 0; i < n_rows; ++i)
    for (int j = 0; j < n_cols; ++j) t[static_cast<size_t>(j) * n_rows + i] = cost[static_cast<size_t>(i) * n_cols + j];
  std::vector<int> col_to_row(n_cols, -1);
  solve_rect(t.data(), n_cols, n_rows, col_to_row.data());
  for (int i = 0; i < n_rows; ++i) row_to_col[i] = -1;
  for (int j = 0; j < n_cols; ++j) {
    if (col_to_row[j] >= 0) row_to_col[col_to_row[j]] = j;
  }
  return 0;
}

}  // extern "C"
