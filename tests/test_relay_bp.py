"""Relay (disordered-memory) BP ensemble decoder tests."""
import numpy as np
import pytest

from exp_ldpc_tpu.codes.hgp import biregular_hgp
from exp_ldpc_tpu.decoders.bp import BPDecoder
from exp_ldpc_tpu.decoders.relay_bp import RelayBPDecoder


@pytest.fixture(scope="module")
def hgp_code():
    return biregular_hgp(6, 2, 3, seed=1, compute_logicals=True)


def _syndromes(H, p, shots, seed):
    rng = np.random.default_rng(seed)
    errs = (rng.random((shots, H.shape[1])) < p).astype(np.uint8)
    return errs, (errs @ H.T.toarray()) % 2


def test_converged_relay_solutions_satisfy_syndrome(hgp_code):
    H = hgp_code.checks.z
    _errs, synds = _syndromes(H, 0.05, 64, seed=3)
    dec = RelayBPDecoder.from_check_matrix(
        H, error_rate=0.05, num_legs=6, iters_per_leg=20, seed=1)
    hard, _post, conv, leg = dec.decode_batch(synds)
    hard, conv, leg = np.asarray(hard), np.asarray(conv), np.asarray(leg)
    assert conv.any()
    Hd = H.toarray()
    for i in np.nonzero(conv)[0]:
        assert np.array_equal((hard[i] @ Hd.T) % 2, synds[i])
        assert leg[i] < 6
    assert (leg[~conv] == 6).all()


def test_relay_beats_plain_bp_convergence(hgp_code):
    """At matched iteration budget, the relay ensemble converges on at least
    as many shots as plain min-sum BP (its leg-0 is memory-BP; later legs
    rescue trapped-set shots)."""
    H = hgp_code.checks.z
    p = 0.06
    _errs, synds = _syndromes(H, p, 256, seed=5)
    budget = 120
    plain = BPDecoder.from_check_matrix(
        H, error_rate=p, bp_method="ms", ms_scaling_factor=0.9,
        max_iter=budget)
    relay = RelayBPDecoder.from_check_matrix(
        H, error_rate=p, num_legs=budget // 20, iters_per_leg=20, seed=2)
    _h1, _p1, conv_plain, _ = plain.decode_batch(synds)
    _h2, _p2, conv_relay, _ = relay.decode_batch(synds)
    n_plain = int(np.asarray(conv_plain).sum())
    n_relay = int(np.asarray(conv_relay).sum())
    assert n_relay >= n_plain
    assert n_relay > 0


def _logical_failures(hard, conv, errs, Lz):
    residual = (np.asarray(hard) ^ errs) % 2
    conv = np.asarray(conv)
    fails = 0
    for i in range(errs.shape[0]):
        if not conv[i] or ((residual[i] @ Lz.T) % 2).any():
            fails += 1
    return fails


def test_relay_logical_accuracy_not_worse_than_plain(hgp_code):
    """On identical syndromes, the relay ensemble's logical failure count is
    <= plain min-sum BP's (the arXiv:2507.00254 claim, loose form)."""
    H = hgp_code.checks.z
    Lz = np.asarray(hgp_code.logicals.z)
    p = 0.02
    errs, synds = _syndromes(H, p, 256, seed=7)
    relay = RelayBPDecoder.from_check_matrix(
        H, error_rate=p, num_legs=8, iters_per_leg=25, seed=3)
    plain = BPDecoder.from_check_matrix(
        H, error_rate=p, bp_method="ms", ms_scaling_factor=0.9, max_iter=200)
    hr, _pr, cr, _ = relay.decode_batch(synds)
    hp, _pp, cp, _ = plain.decode_batch(synds)
    f_relay = _logical_failures(hr, cr, errs, Lz)
    f_plain = _logical_failures(hp, cp, errs, Lz)
    assert f_relay <= f_plain
    assert f_relay < errs.shape[0] // 2


def test_relay_deterministic_given_seed(hgp_code):
    H = hgp_code.checks.z
    _errs, synds = _syndromes(H, 0.04, 32, seed=11)
    d1 = RelayBPDecoder.from_check_matrix(H, error_rate=0.04, seed=9,
                                          num_legs=4, iters_per_leg=15)
    d2 = RelayBPDecoder.from_check_matrix(H, error_rate=0.04, seed=9,
                                          num_legs=4, iters_per_leg=15)
    h1, _, c1, l1 = d1.decode_batch(synds)
    h2, _, c2, l2 = d2.decode_batch(synds)
    assert np.array_equal(np.asarray(h1), np.asarray(h2))
    assert np.array_equal(np.asarray(c1), np.asarray(c2))
    assert np.array_equal(np.asarray(l1), np.asarray(l2))
