import numpy as np
import pytest

from exp_ldpc_tpu.codes.graphs import (
    BipartiteGraph,
    edge_color_bipartite,
    random_biregular_graph,
    remove_short_cycles,
    search_cycle,
)

seeds = [0x59824C5A, 0x9DCA707A, 0xE0218AA8, 0x81DA8035, 0x63B16DEB, 0x7DC89245]

graph_cases = (
    [(27, 3, 4, s) for s in seeds]
    + [(10, 5, 6, s) for s in seeds]
    + [(21, 7, 8, s) for s in seeds]
)


def check_biregular(g: BipartiteGraph, data_degree, check_degree):
    assert np.all(g.left_degrees() == data_degree)
    assert np.all(g.right_degrees() == check_degree)


@pytest.mark.parametrize("left_vertices,right_deg,left_deg,seed", graph_cases)
def test_random_biregular_graph(left_vertices, right_deg, left_deg, seed):
    right_vertices = left_vertices * left_deg // right_deg
    # reference arg convention: (num_checks, num_data, data_degree, check_degree)
    g = random_biregular_graph(left_vertices, right_vertices, right_deg, left_deg, seed=seed)
    check_biregular(g, right_deg, left_deg)
    # simple graph: edge count equals sum of degrees
    assert g.num_edges == right_vertices * right_deg


@pytest.mark.parametrize("seed", seeds)
def test_remove_short_cycles(seed):
    left_deg, right_deg = 4, 3
    left_vertices = 102
    right_vertices = left_vertices * left_deg // right_deg
    g = random_biregular_graph(left_vertices, right_vertices, right_deg, left_deg, seed=seed)
    girth_bound = 4
    remove_short_cycles(g, girth_bound, seed=seed - 42, patience=10000)
    for v in range(g.n_left):
        assert search_cycle(g, v, (girth_bound + 1) // 2) is None
    check_biregular(g, right_deg, left_deg)


def test_search_cycle_on_even_cycle():
    # 6-cycle as bipartite graph: left {0,1,2}, right {0,1,2}
    g = BipartiteGraph.from_edges(3, 3, [(0, 0), (1, 0), (1, 1), (2, 1), (2, 2), (0, 2)])
    assert search_cycle(g, 0, 2) is None
    found = search_cycle(g, 0, 3)
    assert found is not None and found[0] == 6


def _check_coloring(n_left, n_right, edges, colors):
    degrees = np.zeros(n_left + n_right, dtype=int)
    for u, v in edges:
        degrees[u] += 1
        degrees[n_left + v] += 1
    delta = degrees.max(initial=0)
    assert colors.max(initial=-1) < delta
    # no color repeats at any vertex
    seen_left = [set() for _ in range(n_left)]
    seen_right = [set() for _ in range(n_right)]
    for (u, v), c in zip(edges, colors):
        assert c >= 0
        assert c not in seen_left[u]
        assert c not in seen_right[v]
        seen_left[u].add(c)
        seen_right[v].add(c)


@pytest.mark.parametrize("trial", range(50))
def test_edge_coloring_random_simple(trial):
    rng = np.random.default_rng(trial)
    n, m = rng.integers(5, 40, size=2)
    p = min(1.0, rng.integers(2, 10) / np.sqrt(n * m))
    mask = rng.random((n, m)) < p
    edges = [(int(i), int(j)) for i, j in zip(*np.nonzero(mask))]
    colors = edge_color_bipartite(n, m, edges)
    _check_coloring(n, m, edges, colors)


@pytest.mark.parametrize("trial", range(25))
def test_edge_coloring_multigraph(trial):
    rng = np.random.default_rng(1000 + trial)
    n, m = rng.integers(3, 15, size=2)
    num_edges = int(rng.integers(5, 60))
    edges = [(int(rng.integers(n)), int(rng.integers(m))) for _ in range(num_edges)]
    colors = edge_color_bipartite(n, m, edges)
    _check_coloring(n, m, edges, colors)
