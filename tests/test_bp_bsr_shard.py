"""Check-partition sharded BSR decoding (decoders/bp_bsr_shard.py).

Validation contract (VERDICT r3 item 1): sharded == unsharded decisions and
convergence flags on every tested configuration; posteriors agree up to f32
association (the cross-shard partial-total sum groups differently than the
unsharded incremental fold).
"""
import numpy as np
import pytest

from exp_ldpc_tpu.codes.hgp import biregular_hgp
from exp_ldpc_tpu.decoders.bp_bsr import BSRBPDecoder, BSRSchedule
from exp_ldpc_tpu.decoders.bp_bsr_shard import ShardedBSR, ShardedBSRDecoder
from exp_ldpc_tpu.decoders.tanner import TannerELL
from exp_ldpc_tpu.parallel.mesh import MODEL_AXIS, make_mesh


@pytest.fixture(scope="module")
def code_n625():
    return biregular_hgp(20, 3, 4, seed=1, compute_logicals=False)


@pytest.fixture(scope="module")
def case(code_n625):
    H = code_n625.checks.z
    rng = np.random.default_rng(0)
    S = 128
    err = (rng.random((S, H.shape[1])) < 0.01).astype(np.uint8)
    synd = (err @ H.toarray().T % 2).astype(np.uint8)
    return H, synd


def _decode(H, synd, D, mesh=None, method="ms", max_iter=24):
    dec = ShardedBSRDecoder.from_check_matrix(
        H, D, mesh=mesh, error_rate=0.01, max_iter=max_iter,
        bp_method=method, interpret=True)
    return dec.decode_batch(synd)


def test_schedule_build_uniform_shapes(case):
    H, _ = case
    sb = ShardedBSR.from_check_matrix(H, 2)
    assert sb.num_shards == 2
    assert all(s.c_pad == sb.c_pad_loc for s in sb.shards)
    assert all(s.v_pad == sb.shards[0].v_pad for s in sb.shards)
    assert len({s.dc for s in sb.shards}) == 1
    # every check lands in exactly one shard with its full row
    total_edges = sum(int(np.count_nonzero(m)) for m in sb.chk_mask)
    assert total_edges == H.nnz


def test_emulated_sharding_matches_single(case):
    H, synd = case
    h1, p1, c1 = _decode(H, synd, 1)
    # after few iterations the cross-shard association difference is pure
    # f32 rounding; over many min-sum iterations near-tie min choices can
    # amplify single ULPs, so the 24-iter contract is decisions+flags only
    h1s, p1s, _c = _decode(H, synd, 1, max_iter=4)
    for D in (2, 3):
        hD, pD, cD = _decode(H, synd, D)
        assert np.array_equal(h1, hD)
        assert np.array_equal(c1, cD)
        _hDs, pDs, _cs = _decode(H, synd, D, max_iter=4)
        assert np.allclose(p1s, pDs, rtol=1e-5, atol=1e-3)
    # converged shots must satisfy their syndromes
    Ht = H.toarray()
    assert (((h1 @ Ht.T) % 2 == synd).all(axis=1)[c1]).all()
    assert c1.mean() > 0.9


def test_shard_map_matches_emulated(case):
    H, synd = case
    mesh = make_mesh(8, model_parallel=2)
    hm, pm, cm = _decode(H, synd, 2, mesh=mesh)
    he, pe, ce = _decode(H, synd, 2)
    assert np.array_equal(hm, he)
    assert np.array_equal(cm, ce)
    assert np.allclose(pm, pe, rtol=1e-4, atol=1e-2)


def test_shard_map_data_and_model_axes(case):
    H, synd = case
    mesh = make_mesh(8, model_parallel=4)  # data=2 x model=4
    assert mesh.shape[MODEL_AXIS] == 4
    hm, pm, cm = _decode(H, synd, 4, mesh=mesh)
    h1, _p1, c1 = _decode(H, synd, 1)
    assert np.array_equal(hm, h1)
    assert np.array_equal(cm, c1)


def test_matches_unsharded_bsr_kernel(case):
    """Decisions/flags identical to the production fixed-iteration BSR
    kernel (the formulation the single-chip path ships)."""
    H, synd = case
    h1, p1, c1 = _decode(H, synd, 2)
    t = TannerELL.from_check_matrix(H)
    prior = ShardedBSRDecoder.from_check_matrix(
        H, 1, error_rate=0.01, interpret=True).prior_llr
    ub = BSRBPDecoder(sched=BSRSchedule.from_tanner(t), prior_llr=prior,
                      method="ms", max_iter=24, early_stop=False,
                      interpret=True)
    hu, pu, cu, _iters = ub.decode_batch(synd)
    assert np.array_equal(h1, np.asarray(hu))
    assert np.array_equal(c1, np.asarray(cu))


def test_sum_product_method(case):
    H, synd = case
    h1, _p, c1 = _decode(H, synd, 1, method="ps", max_iter=16)
    h2, _p2, c2 = _decode(H, synd, 2, method="ps", max_iter=16)
    assert np.array_equal(h1, h2)
    assert np.array_equal(c1, c2)
    Ht = H.toarray()
    assert (((h1 @ Ht.T) % 2 == synd).all(axis=1)[c1]).all()


def test_low_weight_errors_corrected(code_n625):
    """Decode capability: weight-1 data errors are corrected exactly."""
    H = code_n625.checks.z
    n = H.shape[1]
    rng = np.random.default_rng(3)
    sites = rng.choice(n, size=32, replace=False)
    err = np.zeros((32, n), np.uint8)
    err[np.arange(32), sites] = 1
    synd = (err @ H.toarray().T % 2).astype(np.uint8)
    h, _p, c = _decode(H, synd, 2, max_iter=24)
    assert c.all()
    assert np.array_equal(h, err)


def test_auto_num_shards(code_n625):
    from scipy import sparse

    from exp_ldpc_tpu.decoders.bp_bsr_shard import auto_num_shards

    # small codes fit unsharded; the 40k-qubit capacity-demo scale needs 8
    # (hardware-calibrated, scripts/demo_capacity_shard.py)
    assert auto_num_shards(code_n625.checks.z) == 1
    H = code_n625.checks.z
    big = sparse.block_diag([H] * 64, format="csr")  # n = 40k, C ~ 19k
    assert auto_num_shards(big) >= 8
    with pytest.raises(ValueError, match="reduce"):
        auto_num_shards(sparse.block_diag([H] * 512, format="csr"),
                        shot_block=1024, max_shards=2)
