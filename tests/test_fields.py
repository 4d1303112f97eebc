import numpy as np
import pytest

from exp_ldpc_tpu.utils.fields import GF


@pytest.mark.parametrize("q", [2, 3, 4, 5, 7, 8, 9, 16, 25, 27])
def test_field_axioms(q):
    F = GF(q)
    els = list(F.elements)
    assert len(els) == q
    # additive/multiplicative identities
    for a in els:
        assert int(F.add(a, 0)) == a
        assert int(F.mul(a, 1)) == a
        assert int(F.add(a, F.neg(a))) == 0
        if a != 0:
            assert int(F.mul(a, F.inv(a))) == 1
    # associativity + distributivity spot checks
    rng = np.random.default_rng(q)
    for _ in range(50):
        a, b, c = rng.integers(0, q, size=3)
        assert int(F.mul(a, F.mul(b, c))) == int(F.mul(F.mul(a, b), c))
        assert int(F.mul(a, F.add(b, c))) == int(F.add(F.mul(a, b), F.mul(a, c)))


@pytest.mark.parametrize("q", [4, 8, 9, 16])
def test_multiplicative_group_cyclic(q):
    F = GF(q)
    g = F.primitive_element
    seen = set()
    x = 1
    for _ in range(q - 1):
        seen.add(int(x))
        x = F.mul(x, g)
    assert len(seen) == q - 1


def test_subfield():
    F16 = GF(16)
    sub = F16.subfield_elements(4)
    assert len(sub) == 4
    # closed under add/mul
    for a in sub:
        for b in sub:
            assert int(F16.add(a, b)) in sub
            assert int(F16.mul(a, b)) in sub


def test_mat2_ops():
    F = GF(9)
    rng = np.random.default_rng(1)
    for _ in range(50):
        m = tuple(tuple(int(x) for x in row) for row in rng.integers(0, 9, size=(2, 2)))
        if F.mat2_det(m) == 0:
            continue
        mi = F.mat2_inv(m)
        prod = F.mat2_mul(m, mi)
        assert prod == ((1, 0), (0, 1))
