"""Sliding-window streaming decoder tests (feature the reference stubbed,
``spacetime_code.py:95-96``)."""
import numpy as np
import pytest

from exp_ldpc_tpu.codes.hgp import biregular_hgp
from exp_ldpc_tpu.decoders.sliding_window import SlidingWindowDecoder, window_check_matrix
from exp_ldpc_tpu.decoders.spacetime import SpacetimeCode


@pytest.fixture(scope="module")
def code():
    return biregular_hgp(6, 2, 3, seed=1, compute_logicals=True)


def _simulate_pheno(H, rounds, p_data, p_meas, S, seed):
    """Phenomenological channel: per-round fresh data errors + measurement
    flips; returns (history (S, rounds, r), readout (S, n), cumulative error)."""
    rng = np.random.default_rng(seed)
    r, n = H.shape
    Hd = H.toarray().astype(np.int64)
    cum = np.zeros((S, n), dtype=np.int64)
    history = np.zeros((S, rounds, r), dtype=np.int64)
    for t in range(rounds):
        cum ^= (rng.random((S, n)) < p_data).astype(np.int64)
        m = (rng.random((S, r)) < p_meas).astype(np.int64)
        history[:, t] = ((cum @ Hd.T) + m) % 2
    return history, cum.copy(), cum


def test_window_matrix_shape(code):
    H = code.checks.z
    r, n = H.shape
    for w in (1, 2, 4):
        Hw = window_check_matrix(H, w)
        assert Hw.shape == (w * r, w * n + w * r)


def test_window_covering_everything_equals_full_decode(code):
    """window >= rounds: the sliding decoder IS the full spacetime decode."""
    H = code.checks.z
    rounds, S = 3, 24
    history, readout, _cum = _simulate_pheno(H, rounds, 0.01, 0.01, S, seed=3)
    opts = dict(bp_method="ms", ms_scaling_factor=0.625, max_iter=30,
                osd_method="osd0", osd_order=0)

    sw = SlidingWindowDecoder(H, 0.01, 0.01, window=8, bp_options=opts)
    corr_sw = sw.decode_batch(history, readout)

    st = SpacetimeCode(H, rounds)
    from exp_ldpc_tpu.decoders.bposd import BPOSDDecoder
    prior = np.concatenate([np.full((rounds + 1) * H.shape[1], 0.01),
                            np.full(rounds * H.shape[0], 0.01)])
    full = BPOSDDecoder.from_check_matrix(
        st.spacetime_check_matrix, channel_probs=prior, **opts)
    synd = st.syndrome_from_history_batch(history, readout)
    corr_full = st.final_correction(full.decode_batch(synd))
    assert np.array_equal(corr_sw, corr_full)


def test_streaming_decode_quality(code):
    """w=3/c=1 streaming over 8 rounds: residual error rate comparable to the
    full spacetime decode (within a loose factor) and far better than no
    decoding."""
    H = code.checks.z
    Lz = np.asarray(code.logicals.z)
    rounds, S, p = 8, 128, 0.008
    history, readout, cum = _simulate_pheno(H, rounds, p, p, S, seed=5)
    opts = dict(bp_method="ms", ms_scaling_factor=0.625, max_iter=40,
                osd_method="osd0", osd_order=0)

    sw = SlidingWindowDecoder(H, p, p, window=3, commit=1, bp_options=opts)
    corr_sw = sw.decode_batch(history, readout)

    st = SpacetimeCode(H, rounds)
    from exp_ldpc_tpu.decoders.bposd import BPOSDDecoder
    prior = np.concatenate([np.full((rounds + 1) * H.shape[1], p),
                            np.full(rounds * H.shape[0], p)])
    full = BPOSDDecoder.from_check_matrix(
        st.spacetime_check_matrix, channel_probs=prior, **opts)
    synd = st.syndrome_from_history_batch(history, readout)
    corr_full = st.final_correction(full.decode_batch(synd))

    def logical_fails(corr):
        resid = (cum + corr) % 2
        return int((((resid @ Lz.T) % 2) != 0).any(axis=1).sum())

    f_sw = logical_fails(corr_sw)
    f_full = logical_fails(corr_full)
    f_none = logical_fails(np.zeros_like(corr_sw))
    assert f_sw <= f_full + max(8, f_full)  # same ballpark as full decode
    assert f_sw < f_none  # decoding helps
    # corrected readout satisfies the code's checks for most shots
    Hd = H.toarray().astype(np.int64)
    clean = (((readout + corr_sw) % 2 @ Hd.T) % 2 == 0).all(axis=1)
    assert clean.mean() > 0.9


def test_noiseless_stream_gives_zero_correction(code):
    H = code.checks.z
    rounds, S = 6, 8
    r, n = H.shape
    history = np.zeros((S, rounds, r), dtype=np.int64)
    readout = np.zeros((S, n), dtype=np.int64)
    sw = SlidingWindowDecoder(
        H, 0.01, 0.01, window=2, commit=1,
        bp_options=dict(bp_method="ms", ms_scaling_factor=0.625, max_iter=10,
                        osd_method="osd0", osd_order=0))
    corr = sw.decode_batch(history, readout)
    assert not corr.any()
