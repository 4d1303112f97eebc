"""Hardware permutation routing by swap networks.

Behavioral parity with ``/root/reference/python/qldpc/swap_route.py``:

  * :func:`product_permutation_route` — congestion-free routing on a product
    graph G x H via edge coloring of the column multigraph
    (M. Baumslag and F. Annexstein, Math. Systems Theory 24, 233-251 (1991));
  * :func:`grid_permutation_route` — grid realization through three stages of
    even/odd-transposition sorting networks, returning parallel swap layers.
"""
from __future__ import annotations

from collections import deque
from typing import Deque, List, Tuple

import numpy as np

from .graphs import edge_color_bipartite

__all__ = ["product_permutation_route", "grid_permutation_route"]

Swap = Tuple[Tuple[int, int], Tuple[int, int]]


def product_permutation_route(R: np.ndarray) -> np.ndarray:
    """Routing rows for a permutation on G x H.

    R[g0, h0] = (g1, h1) is the destination of (g0, h0).  Returns A with
    A[g0, h0] = g meaning: route (g0,h0) -> (g,h0) -> (g,h1) -> (g1,h1).
    The intermediate rows come from an optimal edge coloring of the bipartite
    column multigraph (one edge (h0 -> h1) per element), which decomposes it
    into perfect matchings — one routing row per color.
    """
    G_size, H_size = R.shape[0], R.shape[1]
    assert R.shape == (G_size, H_size, 2)
    assert np.all((0 <= R[:, :, 0]) & (R[:, :, 0] < G_size))
    assert np.all((0 <= R[:, :, 1]) & (R[:, :, 1] < H_size))
    flat = {(int(R[i, j, 0]), int(R[i, j, 1])) for i in range(G_size) for j in range(H_size)}
    assert len(flat) == G_size * H_size, "destinations must form a permutation"

    # column multigraph: edge h0 -> destination column for every element
    edges = []
    edge_owner = []  # g0 of each edge
    for g0 in range(G_size):
        for h0 in range(H_size):
            edges.append((h0, int(R[g0, h0, 1])))
            edge_owner.append(g0)
    colors = edge_color_bipartite(H_size, H_size, edges)

    A = np.zeros((G_size, H_size), dtype=np.int64)
    for eid, c in enumerate(colors):
        h0 = edges[eid][0]
        A[edge_owner[eid], h0] = c
    return A


def _even_odd_sort(interval: int, compare, swap) -> Deque[Deque[Swap]]:
    """Even/odd nearest-neighbour transposition sort; returns per-timestep swaps."""
    swap_list: Deque[Deque[Swap]] = deque()
    for n in range(interval):
        timestep: Deque[Swap] = deque()
        index_set = range(0, interval - 1, 2) if n % 2 == 0 else range(1, interval - 1, 2)
        for i in index_set:
            if not compare(i, i + 1):
                timestep.append(swap(i, i + 1))
        swap_list.append(timestep)
    return swap_list


def _collate(row_swaps: List[Deque[Deque[Swap]]]) -> Deque[Deque[Swap]]:
    """Merge per-row timestep lists into combined parallel timesteps."""
    combined: Deque[Deque[Swap]] = deque()
    if not row_swaps:
        return combined
    assert len({len(r) for r in row_swaps}) == 1
    while len(row_swaps[0]) > 0:
        timestep: Deque[Swap] = deque()
        for row in row_swaps:
            timestep.extend(row.popleft())
        combined.append(timestep)
    return combined


def grid_permutation_route(R: np.ndarray) -> List[Deque[Swap]]:
    """Nearest-neighbour swap schedule realizing a grid permutation.

    Three stages: sort each column by routing row, each row by destination
    column, each column by destination row.  All swaps within a returned
    timestep are disjoint.
    """
    G_size, H_size = R.shape[0], R.shape[1]
    routing_row = np.reshape(product_permutation_route(R), (G_size, H_size, 1))
    route = np.concatenate([R, routing_row], axis=2)
    swaps: List[Deque[Swap]] = []

    def route_stage(along_columns: bool, key: int):
        A = route.transpose((1, 0, 2)) if along_columns else route.view()
        stage_swaps = []
        for i in range(A.shape[0]):
            def compare(j0, j1, i=i):
                return A[i, j0, key] <= A[i, j1, key]

            def swap(j0, j1, i=i):
                A[i, [j1, j0], :] = A[i, [j0, j1], :]
                return ((j0, i), (j1, i)) if along_columns else ((i, j0), (i, j1))

            stage_swaps.append(_even_odd_sort(A.shape[1], compare, swap))
        swaps.extend(_collate(stage_swaps))

    route_stage(True, 2)   # columns -> routing row
    route_stage(False, 1)  # rows -> destination column
    route_stage(True, 0)   # columns -> destination row
    return swaps
