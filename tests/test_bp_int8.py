"""int8 fixed-point min-sum BP: oracle parity + accuracy sanity.

Per the repo's decoder-change bar (CLAUDE.md): numpy-oracle parity
(bit-exact — integer math permits it), syndrome validity on converged
shots, and a statistical accuracy bound against the f32 kernel.
"""
import numpy as np
import pytest
from scipy import sparse

from exp_ldpc_tpu.codes.hgp import biregular_hgp
from exp_ldpc_tpu.decoders.bp import BPDecoder
from exp_ldpc_tpu.decoders.bp_int8 import (
    Int8BPDecoder, int8_bp_oracle, quantize_priors,
)
from exp_ldpc_tpu.decoders.bp import priors_to_llr


def _random_ldpc(r, n, row_w, seed):
    rng = np.random.default_rng(seed)
    H = np.zeros((r, n), dtype=np.uint8)
    for i in range(r):
        H[i, rng.choice(n, size=row_w, replace=False)] = 1
    return sparse.csr_matrix(H)


def test_quantize_priors_scale():
    llr = priors_to_llr(np.array([1e-3, 5e-3, 1e-2]))
    q, delta = quantize_priors(llr, prior_quanta=24)
    assert q.max() == 24
    assert np.allclose(q * delta, llr, atol=delta / 2 + 1e-6)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_kernel_matches_numpy_oracle_bitexact(seed):
    H = _random_ldpc(24, 48, 6, seed)
    rng = np.random.default_rng(100 + seed)
    synd = rng.integers(0, 2, size=(24, 17)).astype(np.uint8)

    dec = Int8BPDecoder.from_check_matrix(
        H, error_rate=2e-3, max_iter=8, early_stop=False)
    hard_d, post_d, conv_d, _ = dec.decode_batch(synd.T)

    hard_o, post_o, conv_o = int8_bp_oracle(
        H, dec.prior_q, synd, max_iter=8, alpha_num=dec.alpha_num)

    np.testing.assert_array_equal(np.asarray(hard_d).T, hard_o)
    # device posterior is returned in LLR units = quanta * delta
    np.testing.assert_allclose(
        np.asarray(post_d).T, post_o.astype(np.float64) * dec.delta,
        rtol=0, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(conv_d), conv_o)


def test_converged_shots_satisfy_syndrome():
    code = biregular_hgp(12, 3, 4, seed=42, compute_logicals=False)
    H = code.checks.z
    rng = np.random.default_rng(7)
    p = 3e-3
    errors = (rng.random((256, H.shape[1])) < p).astype(np.uint8)
    synd = (errors @ H.T.toarray()) % 2

    dec = Int8BPDecoder.from_check_matrix(H, error_rate=p, max_iter=32)
    hard, _post, conv, iters = dec.decode_batch(synd)
    hard = np.asarray(hard)
    conv = np.asarray(conv)
    assert conv.mean() > 0.95
    resid = (hard @ H.T.toarray()) % 2
    np.testing.assert_array_equal(resid[conv], synd[conv])
    assert np.asarray(iters)[conv].max() <= 32


def test_accuracy_tracks_f32_minsum():
    """Quantization must not measurably hurt decode success at working p."""
    code = biregular_hgp(12, 3, 4, seed=42, compute_logicals=False)
    H = code.checks.z
    rng = np.random.default_rng(11)
    p = 2e-3
    shots = 512
    errors = (rng.random((shots, H.shape[1])) < p).astype(np.uint8)
    synd = (errors @ H.T.toarray()) % 2

    f32 = BPDecoder.from_check_matrix(
        H, error_rate=p, max_iter=32, bp_method="ms", ms_scaling_factor=0.625)
    q8 = Int8BPDecoder.from_check_matrix(
        H, error_rate=p, max_iter=32, ms_scaling_factor=0.625)
    _h32, _p32, conv32, _ = f32.decode_batch(synd)
    h8, _p8, conv8, _ = q8.decode_batch(synd)

    c32 = float(np.asarray(conv32).mean())
    c8 = float(np.asarray(conv8).mean())
    # binomial 3-sigma slack on 512 shots at ~99% convergence
    assert c8 >= c32 - 3 * np.sqrt(max(c32 * (1 - c32), 1e-4) / shots)

    # converged int8 corrections are valid corrections (residual error is a
    # stabilizer or logical, same as any BP decode); here just revalidate
    resid = (np.asarray(h8) @ H.T.toarray()) % 2
    ok = np.asarray(conv8)
    np.testing.assert_array_equal(resid[ok], synd[ok])


def test_early_stop_freezes_first_convergence():
    H = _random_ldpc(16, 32, 4, 3)
    rng = np.random.default_rng(5)
    errors = (rng.random((64, 32)) < 0.01).astype(np.uint8)
    synd = (errors @ H.toarray().T) % 2
    dec = Int8BPDecoder.from_check_matrix(H, error_rate=0.01, max_iter=40)
    _h, _p, conv, iters = dec.decode_batch(synd)
    iters = np.asarray(iters)
    conv = np.asarray(conv)
    # zero-syndrome shots converge on the first check
    zero = synd.sum(axis=1) == 0
    assert conv[zero].all()
    assert (iters[zero] == 1).all()
