"""Code file I/O round-trip, random-code, and public-API surface tests."""
from io import StringIO

import numpy as np
import pytest

import exp_ldpc_tpu
from exp_ldpc_tpu import read_quantum_code, write_quantum_code
from exp_ldpc_tpu.code_examples import random_test_hgp
from exp_ldpc_tpu.codes.random_code import random_check_matrix
from exp_ldpc_tpu.utils import gf2


def test_check_io_roundtrip():
    code = random_test_hgp()
    buf = StringIO()
    write_quantum_code(buf, code)
    buf.seek(0)
    new_code = read_quantum_code(buf, validate_stabilizer_code=True)
    assert (new_code.checks.x != code.checks.x).nnz == 0
    assert (new_code.checks.z != code.checks.z).nnz == 0
    assert new_code.num_qubits == code.checks.num_qubits
    assert np.all(new_code.logicals.x == code.logicals.x)
    assert np.all(new_code.logicals.z == code.logicals.z)


def test_io_rejects_bad_headers():
    with pytest.raises(RuntimeError):
        read_quantum_code(StringIO("not a header\n"))
    # overconstrained
    with pytest.raises(RuntimeError):
        read_quantum_code(StringIO("qecc 2 2 2 0\n0 X\n1 X\n0 Z\n1 Z\n"))


def test_io_validates_commutation():
    # X and Z checks overlapping on one qubit anticommute
    bad = "qecc 3 1 1 0\n0 1 X\n1 Z\n"
    with pytest.raises(RuntimeError, match="abelian"):
        read_quantum_code(StringIO(bad))


def test_random_check_matrix():
    H = random_check_matrix(20, 40, seed=42)
    assert H.shape == (20, 40)
    for i in range(50):
        H = random_check_matrix(2, 5, seed=i, full_rank=True)
        assert gf2.rank(H) == 2


def test_public_api_surface():
    """Every name from the reference's public surface (SURVEY.md §2.2) resolves."""
    for name in [
        "GF2",
        "build_storage_simulation", "edge_color_bipartite", "biregular_hgp",
        "random_biregular_graph", "remove_short_cycles", "qc_lifted_product_code",
        "lifted_product_code_pgl2", "lifted_product_code_cyclic", "read_quantum_code",
        "write_quantum_code", "grid_permutation_route", "product_permutation_route",
        "QuantumCode", "QuantumCodeChecks", "QuantumCodeLogicals", "CircuitTargets",
        "StorageSim", "SpacetimeCode", "SpacetimeCodeSingleShot", "DetectorSpacetimeCode",
        "noise_model", "code_examples", "lifted_product_code", "matrix_lifted_product_code",
        # extensions beyond the reference surface
        "toric_code", "surface_code", "repetition_code_checks",
        "bivariate_bicycle_code", "gross_code",
    ]:
        assert hasattr(exp_ldpc_tpu, name), name
    from exp_ldpc_tpu.misc import p_sweep_main  # noqa: F401


def test_gf2_array_type():
    """GF2 dense arrays reduce mod 2 (parity with galois.GF(2) usage patterns:
    reference qecc_util.py:10, misc/_experiment.py:209)."""
    from exp_ldpc_tpu import GF2

    a = GF2([[1, 0, 1], [0, 1, 1]])
    assert a.dtype == np.uint8
    # construction reduces mod 2
    assert (GF2([2, 3, 4]) == np.array([0, 1, 0])).all()
    # + / - are XOR, * is AND
    b = GF2([[1, 1, 0], [0, 1, 0]])
    assert ((a + b) == np.array([[0, 1, 1], [0, 0, 1]])).all()
    assert ((a - b) == (a + b)).all()
    assert ((a * b) == np.array([[1, 0, 0], [0, 1, 0]])).all()
    # matmul reduces mod 2 and never overflows uint8
    L = GF2(np.ones((1, 300), dtype=np.uint8))
    x = GF2(np.ones(300, dtype=np.uint8))
    assert (L @ x)[0] == 0  # 300 mod 2
    assert ((np.ones(300, dtype=np.uint8) @ L.T) == (L @ x)).all()
    # the reference's logical-failure idiom
    readout = np.array([1, 0, 1, 1], dtype=np.uint8)
    logicals = GF2([[1, 1, 0, 0], [0, 0, 1, 1]])
    assert bool(np.any(logicals @ GF2(readout) != 0))
    with pytest.raises(TypeError):
        GF2(np.array([0.5, 1.0]))


def test_gf2_ufunc_protocol():
    """Ring ufuncs reduce mod 2 through numpy's machinery (+=, np.add,
    np.matmul, np.add.reduce); non-ring ufuncs degrade to plain ndarrays."""
    from exp_ldpc_tpu import GF2

    a = GF2([1, 1, 0])
    a += GF2([1, 0, 0])
    assert isinstance(a, GF2) and (np.asarray(a) == [0, 1, 0]).all()
    s = np.add(GF2([1, 1, 1]), GF2([1, 1, 0]))
    assert isinstance(s, GF2) and (np.asarray(s) == [0, 0, 1]).all()
    m = np.matmul(GF2(np.ones((1, 300), dtype=np.uint8)), GF2(np.ones(300, dtype=np.uint8)))
    assert isinstance(m, GF2) and m[0] == 0  # 300 mod 2, no uint8 overflow
    red = np.add.reduce(GF2([1, 1, 1]))
    assert int(red) == 1  # parity, not integer sum
    eq = GF2([1, 0]) == GF2([1, 1])
    assert eq.dtype == np.bool_ and not isinstance(eq, GF2)
    ex = np.exp(GF2([1, 0]))
    assert not isinstance(ex, GF2)  # non-ring result is a plain ndarray
