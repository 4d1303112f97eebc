"""Flip / small-set-flip decoder tests: oracle parity, correction power,
syndrome-validity invariants (decoders/flip.py)."""
import numpy as np
import pytest
from scipy import sparse

from exp_ldpc_tpu.codes.hgp import biregular_hgp
from exp_ldpc_tpu.decoders.flip import (
    FlipDecoder,
    SmallSetFlipDecoder,
    flip_decode_numpy,
    ssf_decode_numpy,
)


def ring_repetition_H(n):
    rows, cols = [], []
    for c in range(n):
        rows += [c, c]
        cols += [c, (c + 1) % n]
    return sparse.csr_matrix(
        (np.ones(len(rows), np.uint8), (rows, cols)), shape=(n, n)
    )


@pytest.fixture(scope="module")
def hgp_code():
    return biregular_hgp(12, 3, 4, seed=7, compute_logicals=True)


def test_flip_corrects_single_errors_repetition():
    n = 31
    H = ring_repetition_H(n)
    errs = np.eye(n, dtype=np.uint8)
    synd = (errs @ H.T.toarray()) % 2
    dec = FlipDecoder.from_check_matrix(H)
    hard, conv, iters = dec.decode_batch(synd)
    assert conv.all()
    assert (hard == errs).all()
    assert (iters == 1).all()


def test_flip_zero_syndrome_is_identity():
    H = ring_repetition_H(16)
    hard, conv, iters = FlipDecoder.from_check_matrix(H).decode_batch(
        np.zeros((4, 16), np.uint8)
    )
    assert conv.all() and (hard == 0).all() and (iters == 0).all()


def test_flip_device_matches_numpy_oracle():
    rng = np.random.default_rng(3)
    H = ring_repetition_H(24)
    errs = (rng.random((64, 24)) < 0.08).astype(np.uint8)
    synd = (errs @ H.T.toarray()) % 2
    hard, conv, iters = FlipDecoder.from_check_matrix(H, max_iter=20).decode_batch(synd)
    ohard, oconv, oiters = flip_decode_numpy(H, synd, max_iter=20)
    np.testing.assert_array_equal(hard, ohard)
    np.testing.assert_array_equal(conv, oconv)
    np.testing.assert_array_equal(iters, oiters)
    # convergence claim == syndrome validity
    ok = ((hard @ H.T.toarray()) % 2 == synd).all(axis=1)
    assert (ok | ~conv).all()


def test_ssf_corrects_weight_one_errors(hgp_code):
    Hz = hgp_code.checks.z
    Hx = hgp_code.checks.x
    Lz = hgp_code.logicals.z
    n = Hz.shape[1]
    dec = SmallSetFlipDecoder.from_css(Hz, Hx, max_iter=32)
    errs = np.eye(n, dtype=np.uint8)
    synd = (errs @ Hz.T.toarray()) % 2
    hard, conv, _iters = dec.decode_batch(synd)
    assert conv.all()
    resid = (hard ^ errs).astype(np.int64)
    # residual must be syndrome-free AND logically trivial
    assert ((resid @ Hz.T.toarray()) % 2 == 0).all()
    assert ((resid @ np.asarray(Lz).T) % 2 == 0).all()


def test_ssf_device_matches_numpy_oracle(hgp_code):
    Hz = hgp_code.checks.z
    Hx = hgp_code.checks.x
    rng = np.random.default_rng(11)
    errs = (rng.random((48, Hz.shape[1])) < 0.01).astype(np.uint8)
    synd = (errs @ Hz.T.toarray()) % 2
    dec = SmallSetFlipDecoder.from_css(Hz, Hx, max_iter=48)
    hard, conv, iters = dec.decode_batch(synd)
    ohard, oconv, oiters = ssf_decode_numpy(Hz, Hx, synd, max_iter=48)
    np.testing.assert_array_equal(hard, ohard)
    np.testing.assert_array_equal(conv, oconv)
    np.testing.assert_array_equal(iters, oiters)
    ok = ((hard @ Hz.T.toarray()) % 2 == synd).all(axis=1)
    assert (ok == conv).all()


def test_ssf_statistical_success_at_low_p(hgp_code):
    Hz = hgp_code.checks.z
    Hx = hgp_code.checks.x
    Lz = np.asarray(hgp_code.logicals.z)
    rng = np.random.default_rng(5)
    S = 256
    errs = (rng.random((S, Hz.shape[1])) < 0.005).astype(np.uint8)
    synd = (errs @ Hz.T.toarray()) % 2
    dec = SmallSetFlipDecoder.from_css(Hz, Hx, max_iter=64)
    hard, conv, _ = dec.decode_batch(synd)
    resid = (hard ^ errs).astype(np.int64)
    logical_fail = (((resid @ Lz.T) % 2) != 0).any(axis=1)
    success = conv & ~logical_fail
    assert success.mean() > 0.9


def test_ssf_single_shot_mode(hgp_code):
    from exp_ldpc_tpu.circuits.noise import depolarizing_noise
    from exp_ldpc_tpu.decoders.drivers import run_simulation

    p = 0.0005
    fails = run_simulation(
        samples=48, code=hgp_code,
        meas_prior=lambda xs, zs: 2 / 3 * p, data_prior=lambda xs, zs: 2 / 3 * p,
        noise_model=depolarizing_noise, noise_model_args={"p": p, "pm": p},
        bp_osd_options={}, rounds=2, decoder_mode="ssf_single_shot", seed=4,
        use_device_sampler=False,
    )
    assert len(fails) == 48
    assert sum(fails) <= 6  # low physical rate -> few logical failures


def test_ssf_rejects_mismatched_shapes(hgp_code):
    Hz = hgp_code.checks.z
    with pytest.raises(ValueError):
        SmallSetFlipDecoder.from_css(Hz, Hz[:, :-1])
    with pytest.raises(ValueError):
        SmallSetFlipDecoder.from_css(Hz, hgp_code.checks.x, max_subset_weight=3)
