import numpy as np
import pytest

from exp_ldpc_tpu.utils import gf2


def brute_rank(a):
    """O(n^3) byte-wise elimination oracle."""
    a = (np.array(a) % 2).astype(np.uint8)
    r = 0
    for c in range(a.shape[1]):
        rows = np.nonzero(a[r:, c])[0]
        if rows.size == 0:
            continue
        piv = r + rows[0]
        a[[r, piv]] = a[[piv, r]]
        for i in range(a.shape[0]):
            if i != r and a[i, c]:
                a[i] ^= a[r]
        r += 1
        if r == a.shape[0]:
            break
    return r


def test_pack_roundtrip():
    rng = np.random.default_rng(0)
    for shape in [(1, 1), (3, 63), (5, 64), (7, 65), (10, 200)]:
        a = rng.integers(0, 2, size=shape, dtype=np.uint8)
        assert np.array_equal(gf2.unpack_rows(gf2.pack_rows(a), shape[1]), a)


@pytest.mark.parametrize("seed", range(20))
def test_rank_matches_bruteforce(seed):
    rng = np.random.default_rng(seed)
    rows, cols = rng.integers(1, 40, size=2)
    a = (rng.random((rows, cols)) < 0.3).astype(np.uint8)
    assert gf2.rank(a) == brute_rank(a)


@pytest.mark.parametrize("seed", range(20))
def test_row_reduce_is_rref(seed):
    rng = np.random.default_rng(100 + seed)
    a = (rng.random((17, 29)) < 0.4).astype(np.uint8)
    rref, pivots = gf2.row_reduce(a)
    # pivot structure: each pivot column has exactly one 1, in the pivot row
    for r, c in enumerate(pivots):
        col = rref[:, c]
        assert col[r] == 1 and col.sum() == 1
    # row space preserved: rank of stacked matrix unchanged
    assert brute_rank(np.vstack([a, rref])) == brute_rank(a)
    assert gf2.get_pivots(rref).tolist() == pivots.tolist()


@pytest.mark.parametrize("seed", range(20))
def test_null_space(seed):
    rng = np.random.default_rng(200 + seed)
    rows, cols = rng.integers(2, 35, size=2)
    a = (rng.random((rows, cols)) < 0.3).astype(np.uint8)
    ns = gf2.null_space(a)
    assert ns.shape[0] == cols - brute_rank(a)
    if ns.shape[0]:
        assert np.all((a @ ns.T) % 2 == 0)
        assert brute_rank(ns) == ns.shape[0]


def test_column_space():
    rng = np.random.default_rng(7)
    a = (rng.random((20, 12)) < 0.4).astype(np.uint8)
    cs = gf2.column_space(a)
    assert cs.shape[0] == brute_rank(a)
    # every column of a is in the span of cs
    assert brute_rank(np.vstack([cs, a.T])) == cs.shape[0]


def test_matmul_gf2():
    rng = np.random.default_rng(9)
    a = (rng.random((13, 21)) < 0.5).astype(np.uint8)
    b = (rng.random((21, 17)) < 0.5).astype(np.uint8)
    assert np.array_equal(gf2.matmul_gf2(a, b), (a.astype(int) @ b.astype(int)) % 2)


def test_row_reduce_partial_cols():
    # elimination restricted to the first k columns (augmented-matrix style)
    rng = np.random.default_rng(11)
    k = 8
    left = (rng.random((8, k)) < 0.5).astype(np.uint8)
    aug = np.hstack([left, np.eye(8, dtype=np.uint8)])
    rref, pivots = gf2.row_reduce(aug, ncols=k)
    assert all(p < k for p in pivots)
    # the left block must be in RREF
    lref, lp = gf2.row_reduce(left)
    assert np.array_equal(rref[:, :k], lref)
