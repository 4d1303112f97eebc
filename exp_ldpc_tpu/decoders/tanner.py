"""Padded-ELL Tanner-graph device representation.

The core data structure the batched BP kernels consume (SURVEY.md §7 layer 3).
A sparse check matrix H (r x n) is compiled to two dual static-index layouts:

  * check-major: for each check, its incident edge ids / variable ids, padded
    to the max check degree Dc;
  * variable-major: for each variable, its incident edge ids / check ids,
    padded to the max variable degree Dv.

Messages live in edge-major arrays with ONE extra padding slot at index E;
padded index entries point at that slot, so gathers read a neutral element
(+inf for min-trees, 0 for sums) and scatters harmlessly overwrite it.  All
shapes are static — no data-dependent control flow reaches XLA.
"""
from __future__ import annotations

from dataclasses import dataclass

import numpy as np
from scipy import sparse

__all__ = ["TannerELL"]


@dataclass(frozen=True, eq=False)  # identity hash: instances are jit static args
class TannerELL:
    num_checks: int
    num_vars: int
    num_edges: int
    # check-major (C, Dc)
    chk_edges: np.ndarray  # edge id, padded with num_edges
    chk_vars: np.ndarray  # variable id, padded with 0
    chk_mask: np.ndarray  # bool
    # variable-major (V, Dv)
    var_edges: np.ndarray
    var_checks: np.ndarray
    var_mask: np.ndarray

    @classmethod
    def from_check_matrix(cls, H) -> "TannerELL":
        H = sparse.csr_matrix(H)
        H = H.copy()
        H.data = H.data % 2
        H.eliminate_zeros()
        H.sort_indices()
        r, n = H.shape
        coo = H.tocoo()
        # edge order: by (check, variable) — CSR order
        checks = coo.row.astype(np.int32)
        variables = coo.col.astype(np.int32)
        E = checks.shape[0]

        chk_deg = np.bincount(checks, minlength=r)
        var_deg = np.bincount(variables, minlength=n)
        Dc = int(chk_deg.max(initial=1))
        Dv = int(var_deg.max(initial=1))

        chk_edges = np.full((r, Dc), E, dtype=np.int32)
        chk_vars = np.zeros((r, Dc), dtype=np.int32)
        chk_mask = np.zeros((r, Dc), dtype=bool)
        slot = np.zeros(r, dtype=np.int64)
        for e in range(E):
            c = checks[e]
            s = slot[c]
            chk_edges[c, s] = e
            chk_vars[c, s] = variables[e]
            chk_mask[c, s] = True
            slot[c] += 1

        var_edges = np.full((n, Dv), E, dtype=np.int32)
        var_checks = np.zeros((n, Dv), dtype=np.int32)
        var_mask = np.zeros((n, Dv), dtype=bool)
        slot = np.zeros(n, dtype=np.int64)
        for e in range(E):
            v = variables[e]
            s = slot[v]
            var_edges[v, s] = e
            var_checks[v, s] = checks[e]
            var_mask[v, s] = True
            slot[v] += 1

        return cls(
            num_checks=r,
            num_vars=n,
            num_edges=E,
            chk_edges=chk_edges,
            chk_vars=chk_vars,
            chk_mask=chk_mask,
            var_edges=var_edges,
            var_checks=var_checks,
            var_mask=var_mask,
        )

    @property
    def max_check_degree(self) -> int:
        return self.chk_edges.shape[1]

    @property
    def max_var_degree(self) -> int:
        return self.var_edges.shape[1]
