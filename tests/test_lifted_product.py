"""Lifted-product family tests pinned to the reference anchors (BASELINE.md)."""
import warnings

import numpy as np
import pytest

from exp_ldpc_tpu.codes import matrix_lifted as mlp
from exp_ldpc_tpu.codes.lifted import (
    Zqm,
    dfs_generators,
    get_psl2,
    lifted_product_code_cyclic,
    lifted_product_code_pgl2,
    morgenstern_generators,
    random_abelian_generators,
)
from exp_ldpc_tpu.codes.qc_lifted import qc_lifted_product_code

warnings.filterwarnings("ignore", message="lifted-product construction is an experimental surface")


def test_random_abelian_generators():
    q, m, k = 3, 4, 5
    generators = random_abelian_generators(q, m, k, seed=42)
    group = dfs_generators(generators[0].identity(), generators)
    assert len(group) == q**m


def test_morgenstern_generators():
    l, i = 1, 2
    generators = morgenstern_generators(l, i)
    assert len(generators) == 2**l + 1
    group = dfs_generators(generators[0].identity(), generators)
    q = (2**l) ** i
    assert len(group) == (q - 1) * q * (q + 1)


def test_morgenstern_B_generators():
    l, i = 1, 2
    generators = morgenstern_generators(l, i, use_B_generators=True, symmetric=True)
    a_len = 2**l + 1
    assert len(generators) == a_len * (a_len - 1)
    group = dfs_generators(generators[0].identity(), generators)
    q = (2**l) ** i
    assert len(group) == (q - 1) * q * (q + 1)


@pytest.mark.parametrize("q", [2, 3, 4, 5])
def test_get_psl2(q):
    n = len(get_psl2(q))
    order = (q - 1) * q * (q + 1)
    assert n == (order if q % 2 == 0 else order // 2)


def test_lifted_product_code_cyclic_double_cover():
    # Higgott & Breuckmann parameters (reference test anchor: n = 6512)
    w, r, q, m = 14, 5, 22, 1
    G = q**m
    code = lifted_product_code_cyclic(
        q=q, m=m, w=w, r=r, double_cover=True, compute_logicals=True, seed=42, check_complex=True
    )
    assert code.checks.num_qubits == (w**2 + 4 * r**2) * G
    assert code.logicals.x.shape[0] >= code.checks.num_qubits - 2 * (2 * w * r * G)


def test_lifted_product_code_cyclic_bouquet():
    w, r, q, m = 7, 5, 22, 1
    G = q**m
    code = lifted_product_code_cyclic(
        q=q, m=m, w=w, r=r, double_cover=False, compute_logicals=True, seed=42, check_complex=True
    )
    assert code.checks.num_qubits == ((w * 2) ** 2 // 4 + r**2) * G
    assert code.logicals.x.shape[0] >= code.checks.num_qubits - (w * 2) * r * G


@pytest.mark.parametrize("double_cover", [True, False])
def test_lifted_product_code_pgl2(double_cover):
    code = lifted_product_code_pgl2(
        1, 2, 5, compute_logicals=True, seed=42, check_complex=True, double_cover=double_cover
    )
    assert code.num_qubits > 0
    # CSS commutation holds (also verified internally by check_complex)
    assert np.all((code.checks.x @ code.checks.z.transpose()).toarray() % 2 == 0)


def test_qc_lifted_product_code():
    # PK'20 arXiv:2012.04068 anchor
    shift_matrix = np.array([[1, 2, 4, 8, 16], [5, 10, 20, 9, 18], [25, 19, 7, 14, 28]])
    code = qc_lifted_product_code(shift_matrix, l=31, check_complex=True, compute_logicals=True)
    assert code.num_qubits == 1054
    assert code.num_logicals == 140


def test_matrix_lifted_product_code_Z31():
    Z31 = [Zqm(31, 1, [a]) for a in range(31)]
    shifts = [[1, 2, 4, 8, 16], [5, 10, 20, 9, 18], [25, 19, 7, 14, 28]]
    base = np.array([[mlp.group_algebra_monomial(1, Z31[a]) for a in row] for row in shifts])
    code = mlp.matrix_lifted_product_code(Z31, base, check_complex=True, compute_logicals=True)
    assert code.num_qubits == 1054
    assert code.num_logicals == 140


def test_matrix_lifted_product_code_B3():
    # PK'19 arXiv:1904.02703 B3 anchor
    Z127 = [Zqm(127, 1, [a]) for a in range(127)]
    sh = lambda i: mlp.group_algebra_monomial(1, Z127[i])
    zero = mlp.group_algebra_zero()
    A = np.array(
        [
            [sh(0), zero, sh(51), sh(52), zero],
            [zero, sh(0), zero, sh(111), sh(20)],
            [sh(0), zero, sh(98), zero, sh(122)],
            [sh(0), sh(80), zero, sh(119), zero],
            [zero, sh(0), sh(5), zero, sh(106)],
        ]
    )
    B = np.array([[sh(0) + sh(1) + sh(7)]])
    code = mlp.matrix_lifted_product_code(Z127, A, B, check_complex=True, compute_logicals=True)
    assert code.num_qubits == 1270
    assert code.num_logicals == 28


def test_psl_lift():
    group = list(get_psl2(5))
    els = np.array([[32, 56, 9, 4, 55, 6], [31, 13, 45, 13, 2, 10], [32, 5, 51, 49, 18, 26]])
    base = np.vectorize(lambda i: mlp.group_algebra_monomial(1, group[i]))(els)
    code = mlp.matrix_lifted_product_code(
        group, base_matrix_A=base, check_complex=True, compute_logicals=True
    )
    assert code.num_qubits == 2700
    assert code.num_logicals == 560


def test_regular_rep_multiplication_table():
    group = list(get_psl2(5))
    rep = mlp.RegularRep(group)
    table = {}
    for g in group[:12]:
        m = rep.get_rep(g)
        assert np.all(np.count_nonzero(m, axis=0) == 1)
        assert np.all(np.count_nonzero(m, axis=1) == 1)
        table[g] = m
    for g in group[:8]:
        for h in group[:8]:
            assert np.array_equal(table.setdefault(g @ h, rep.get_rep(g @ h)),
                                  (table[g].astype(int) @ table[h].astype(int)) % 2)


def test_zqm_eq_fixed():
    """Regression for SURVEY.md §2.5.4: cross-group comparison must be False."""
    assert Zqm(5, 1, [2]) != Zqm(7, 1, [2])
    assert Zqm(5, 1, [2]) == Zqm(5, 1, [2])
