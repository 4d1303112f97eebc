"""External decode-accuracy anchors (VERDICT r1 'what's missing' #2).

Every other LER test is internal (device-vs-oracle, sharded-vs-unsharded);
these pin the decode chain to ground truth that no shared convention bug can
satisfy:

  * analytic: repetition-code block error rate has a closed form — the
    measured BP(+OSD) failure rate must sit inside its binomial interval;
  * exact ML: on the 18-qubit toric code the degeneracy-aware ML decoder
    (decoders/ml.py) is information-theoretically optimal — BP+OSD must be
    no better, and within a small factor at low p;
  * scaling: the d=3 toric code's ML logical error must scale ~ p^2.
"""
import numpy as np
import pytest
from scipy import sparse
from scipy.stats import binom

from exp_ldpc_tpu.codes.surface import repetition_code_checks, toric_code
from exp_ldpc_tpu.decoders.bposd import BPOSDDecoder
from exp_ldpc_tpu.decoders.ml import MLDecoder, enumerate_cosets


def test_repetition_code_analytic_anchor():
    """Majority-vote truth: an [n,1] repetition code under iid flips fails
    with probability P(weight > n/2) exactly (ML = majority vote; BP+OSD
    achieves ML on a cycle-free graph).  20k shots must land inside the
    central 99.9% binomial interval of the analytic rate."""
    n, p, shots = 11, 0.2, 20000
    H = repetition_code_checks(n)  # (n-1, n) chain
    L = np.ones((1, n), dtype=np.uint8)  # parity of all bits
    dec = BPOSDDecoder.from_check_matrix(
        H, error_rate=p, max_iter=60, bp_method="ps", osd_method="osd_e",
        osd_order=4)
    rng = np.random.default_rng(12)
    errs = (rng.random((shots, n)) < p).astype(np.uint8)
    synd = errs @ H.T.toarray() % 2
    corr = dec.decode_batch(synd)
    resid = (errs + corr) % 2
    fails = int((resid @ L.T % 2).any(axis=1).sum())
    # analytic block-error rate: ML fails iff weight >= ceil(n/2) (n odd)
    k = np.arange(6, n + 1)
    p_fail = float((binom.pmf(k, n, p)).sum())
    lo, hi = binom.ppf(0.0005, shots, p_fail), binom.ppf(0.9995, shots, p_fail)
    assert lo <= fails <= hi, (fails, p_fail * shots)


@pytest.fixture(scope="module")
def toric3():
    return toric_code(3)


def test_ml_decoder_is_syndrome_consistent(toric3):
    Hz = toric3.checks.z
    Lz = toric3.logicals.z
    ml = MLDecoder(Hz, Lz, p=0.05)
    rng = np.random.default_rng(0)
    errs = (rng.random((256, 18)) < 0.05).astype(np.uint8)
    synd = errs @ Hz.T.toarray() % 2
    corr = ml.decode_batch(synd)
    np.testing.assert_array_equal(corr @ Hz.T.toarray() % 2, synd)


def test_ml_beats_or_matches_minimum_weight(toric3):
    """Degeneracy-aware ML is at least as good as any decoder; in particular
    its LER at p=0.05 must not exceed BP+OSD's."""
    Hz, Lz = toric3.checks.z, toric3.logicals.z
    p, shots = 0.05, 20000
    ml = MLDecoder(Hz, Lz, p=p)
    ler_ml = ml.logical_error_rate(shots, seed=5)
    bposd = BPOSDDecoder.from_check_matrix(
        Hz, error_rate=p, max_iter=40, bp_method="ps", osd_method="osd_e",
        osd_order=6)
    ler_bposd = ml.logical_error_rate(shots, seed=5, decoder=bposd.decode_batch)
    sigma = np.sqrt(ler_ml * (1 - ler_ml) / shots)
    # optimality: BP+OSD can tie (same decisions) but not beat ML
    assert ler_bposd >= ler_ml - 3 * sigma
    # accuracy anchor: BP+OSD within 1.5x of the optimum at this p
    assert ler_bposd <= 1.5 * ler_ml + 3 * sigma, (ler_bposd, ler_ml)


def test_toric_ml_quadratic_scaling(toric3):
    """d=3: ML logical error ~ C p^2 at low p — the fitted log-log slope
    between p=0.01 and p=0.04 must be ~2 (a convention bug that misapplies
    corrections turns this into slope ~1 or a constant)."""
    Hz, Lz = toric3.checks.z, toric3.logicals.z
    lers = []
    for p in (0.01, 0.04):
        ml = MLDecoder(Hz, Lz, p=p)
        lers.append(max(ml.logical_error_rate(200000, seed=9), 1e-6))
    slope = np.log(lers[1] / lers[0]) / np.log(4.0)
    assert 1.6 < slope < 2.4, (lers, slope)


def test_enumerate_cosets_partition(toric3):
    """Coset enumeration covers all 2^n errors and syndrome ids are
    consistent with H."""
    Hz, Lz = toric3.checks.z, toric3.logicals.z
    synd_of, cls_of, weight = enumerate_cosets(Hz, Lz)
    assert synd_of.shape == (1 << 18,)
    assert weight.max() == 18 and weight.min() == 0
    # 2^(n-r-k) errors per (syndrome, class): toric Hz has rank 8, k=2
    counts = np.bincount(synd_of * 4 + cls_of)
    counts = counts[counts > 0]
    assert (counts == 1 << (18 - 8 - 2)).all()
    with pytest.raises(ValueError):
        enumerate_cosets(sparse.eye(30, dtype=np.uint8).tocsr(),
                         np.zeros((1, 30), np.uint8))
