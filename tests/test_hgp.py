import numpy as np
import pytest

from exp_ldpc_tpu.codes.hgp import biregular_hgp, random_test_hgp
from exp_ldpc_tpu.utils import gf2


def test_hgp_225_anchor():
    # BASELINE.md anchor: (3,4) HGP from nv=12 -> 225 qubits, 108+108 checks, 9 logicals
    code = biregular_hgp(12, 3, 4, seed=0, compute_logicals=True, check_complex=True)
    assert code.num_qubits == 225
    assert code.checks.x.shape[0] == 108
    assert code.checks.z.shape[0] == 108
    assert code.num_logicals == 9


def test_hgp_2025_invariants():
    code = random_test_hgp()
    checks, logicals = code.checks, code.logicals
    assert code.num_qubits == 36**2 + 27**2  # 2025

    # CSS commutation
    assert np.all((checks.x @ checks.z.transpose()).toarray() % 2 == 0)
    # logicals commute with opposite checks
    assert np.all((checks.x @ logicals.z.transpose()) % 2 == 0)
    assert np.all((checks.z @ logicals.x.transpose()) % 2 == 0)
    # logicals independent
    assert gf2.rank(logicals.x) == logicals.x.shape[0]
    assert gf2.rank(logicals.z) == logicals.z.shape[0]
    # symplectic pairing
    assert np.array_equal(
        (logicals.z.astype(np.int64) @ logicals.x.astype(np.int64).T) % 2,
        np.identity(logicals.z.shape[0]),
    )
    # logicals nontrivial (not in the span of checks)
    xd = checks.x.toarray()
    zd = checks.z.toarray()
    assert gf2.rank(np.vstack([xd, logicals.x])) == gf2.rank(xd) + logicals.x.shape[0]
    assert gf2.rank(np.vstack([zd, logicals.z])) == gf2.rank(zd) + logicals.z.shape[0]
