import numpy as np
import pytest

from exp_ldpc_tpu.codes.routing import grid_permutation_route, product_permutation_route


def _random_permutation(G_size, H_size, seed=30):
    permutation = np.array([(i, j) for i in range(G_size) for j in range(H_size)])
    rng = np.random.default_rng(seed=seed)
    rng.shuffle(permutation)
    return np.reshape(permutation, (G_size, H_size, 2))


HG_sizes = [(11, 7), (10, 5), (6, 8), (6, 9)]


@pytest.mark.parametrize("G_size,H_size", HG_sizes)
def test_product_permutation_route_congestion_free(G_size, H_size):
    for trial in range(20):
        permutation = _random_permutation(G_size, H_size, seed=trial)
        routing_row = np.reshape(product_permutation_route(permutation), (G_size, H_size, 1))
        route = np.concatenate([permutation, routing_row], axis=2)

        # stage 1: each column routes to the assigned routing rows (must be unique per column)
        for j in range(H_size):
            col = [tuple(route[i, j, :]) for i in range(G_size)]
            col.sort(key=lambda x: x[2])
            for i in range(G_size):
                route[i, j, :] = col[i]
        # stage 2: each row routes to destination column (unique per row)
        for i in range(G_size):
            row = [tuple(route[i, j, :]) for j in range(H_size)]
            row.sort(key=lambda x: x[1])
            for j in range(H_size):
                route[i, j, :] = row[j]
        # stage 3: each column routes to destination row
        for j in range(H_size):
            col = [tuple(route[i, j, :]) for i in range(G_size)]
            col.sort(key=lambda x: x[0])
            for i in range(G_size):
                route[i, j, :] = col[i]

        for i in range(G_size):
            for j in range(H_size):
                assert tuple(route[i, j, :2]) == (i, j)


@pytest.mark.parametrize("G_size,H_size", HG_sizes)
def test_grid_permutation_route(G_size, H_size):
    for trial in range(20):
        permutation = _random_permutation(G_size, H_size, seed=100 + trial)
        schedule = grid_permutation_route(np.copy(permutation))
        # swaps within a timestep are disjoint
        for timestep in schedule:
            seen = set()
            for swap_op in timestep:
                for target in swap_op:
                    assert target not in seen
                    seen.add(target)
        # executing the swaps realizes the permutation
        for timestep in schedule:
            for (a, b) in timestep:
                t = np.copy(permutation[a[0], a[1], :])
                permutation[a[0], a[1], :] = permutation[b[0], b[1], :]
                permutation[b[0], b[1], :] = t
        for i in range(G_size):
            for j in range(H_size):
                assert np.all(permutation[i, j, :] == [i, j])
