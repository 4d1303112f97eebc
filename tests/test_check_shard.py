"""Check-partition (model-parallel) sharded BP vs the single-device decoder.

Runs on the 8-virtual-CPU-device mesh from conftest; exercises model-only,
data-only and combined 2D meshes.
"""
import numpy as np
import pytest

from exp_ldpc_tpu.decoders.bp import BPDecoder
from exp_ldpc_tpu.parallel.check_shard import ShardedBPDecoder, ShardedTanner
from exp_ldpc_tpu.parallel.mesh import make_mesh


def random_ldpc(rng, r, n, row_w=4):
    H = np.zeros((r, n), dtype=np.uint8)
    for i in range(r):
        H[i, rng.choice(n, size=row_w, replace=False)] = 1
    for j in range(n):
        if not H[:, j].any():
            H[rng.integers(r), j] = 1
    return H


def test_sharded_tanner_partition():
    rng = np.random.default_rng(0)
    H = random_ldpc(rng, 10, 24)
    t = ShardedTanner.from_check_matrix(H, 4)
    assert t.num_shards == 4
    assert t.checks_per_shard == 3  # ceil(10/4)
    # every H entry appears exactly once across shards
    seen = np.zeros_like(H)
    for d in range(4):
        for cl in range(t.checks_per_shard):
            c = d * t.checks_per_shard + cl
            if c >= 10:
                assert not t.chk_mask[d, cl].any()
                continue
            for i in range(t.max_check_degree):
                if t.chk_mask[d, cl, i]:
                    seen[c, t.chk_vars[d, cl, i]] += 1
    assert np.array_equal(seen, H)
    # vm_local points back at the right slots
    for d in range(4):
        for v in range(24):
            for idx in t.vm_local[d, v]:
                if idx == t.checks_per_shard * t.max_check_degree:
                    continue
                cl, i = divmod(idx, t.max_check_degree)
                assert t.chk_mask[d, cl, i]
                assert t.chk_vars[d, cl, i] == v


@pytest.mark.parametrize("mesh_shape", [(1, 8), (8, 1), (2, 4)])
@pytest.mark.parametrize("method", ["ps", "ms"])
def test_sharded_matches_single_device(mesh_shape, method):
    n_data, n_model = mesh_shape
    mesh = make_mesh(8, model_parallel=n_model)
    rng = np.random.default_rng(5)
    H = random_ldpc(rng, 24, 48)
    errs = (rng.random((32, 48)) < 0.03).astype(np.uint8)
    synds = (errs @ H.T) % 2
    kw = dict(error_rate=0.03, bp_method=method, max_iter=40)
    ref = BPDecoder.from_check_matrix(H, formulation="gather", **kw)
    sh = ShardedBPDecoder.from_check_matrix(H, mesh, **kw)
    hr, _pr, cr, _ = ref.decode_batch(synds)
    hs, _ps, cs = sh.decode_batch(synds)
    hr, cr = np.asarray(hr), np.asarray(cr)
    # converged shards must satisfy the syndrome exactly
    for i in np.nonzero(cs)[0]:
        assert np.array_equal((hs[i] @ H.T) % 2, synds[i])
    # near-identical behaviour to the single-device decoder (f32 partial-sum
    # ordering may flip non-converged shots)
    assert (cr == cs).mean() >= 0.95
    assert (hr == hs).mean() >= 0.99


def test_sharded_fixed_iteration():
    mesh = make_mesh(8, model_parallel=2)
    rng = np.random.default_rng(9)
    H = random_ldpc(rng, 16, 40)
    errs = (rng.random((16, 40)) < 0.02).astype(np.uint8)
    synds = (errs @ H.T) % 2
    sh = ShardedBPDecoder.from_check_matrix(
        H, mesh, error_rate=0.02, bp_method="ms", ms_scaling_factor=0.625,
        max_iter=30, early_stop=False)
    hs, _ps, cs = sh.decode_batch(synds)
    for i in np.nonzero(cs)[0]:
        assert np.array_equal((hs[i] @ H.T) % 2, synds[i])
    assert cs.mean() > 0.5
