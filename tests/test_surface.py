"""Toric / surface code constructors: parameters, CSS invariants, brute-force
distance on small instances, and decodability (codes/surface.py)."""
import itertools

import numpy as np
import pytest

from exp_ldpc_tpu.codes.surface import (
    repetition_code_checks,
    surface_code,
    toric_code,
)
from exp_ldpc_tpu.decoders.bposd import BPOSDDecoder


def brute_force_distance(Hz, Lz):
    """Min weight of a Z-syndrome-free vector with nontrivial logical action."""
    Hz = np.asarray(Hz.todense()) % 2
    Lz = np.asarray(Lz) % 2
    n = Hz.shape[1]
    best = n + 1
    for w in range(1, best):
        for support in itertools.combinations(range(n), w):
            v = np.zeros(n, np.uint8)
            v[list(support)] = 1
            if (Hz @ v % 2 == 0).all() and (Lz @ v % 2 != 0).any():
                return w
    return best


@pytest.mark.parametrize("L,k", [(2, 2), (3, 2)])
def test_toric_parameters(L, k):
    code = toric_code(L)
    assert code.num_qubits == 2 * L * L
    assert code.num_logicals == k
    # CSS commutation
    comm = (code.checks.x @ code.checks.z.T).toarray() % 2
    assert (comm == 0).all()


@pytest.mark.parametrize("L,n", [(2, 5), (3, 13)])
def test_surface_parameters(L, n):
    code = surface_code(L)
    assert code.num_qubits == n
    assert code.num_logicals == 1
    comm = (code.checks.x @ code.checks.z.T).toarray() % 2
    assert (comm == 0).all()


@pytest.mark.parametrize("builder,L", [(toric_code, 2), (toric_code, 3),
                                       (surface_code, 2), (surface_code, 3)])
def test_distance_is_L(builder, L):
    code = builder(L)
    assert brute_force_distance(code.checks.z, code.logicals.z) == L
    assert brute_force_distance(code.checks.x, code.logicals.x) == L


def test_repetition_checks_shapes():
    Hp = repetition_code_checks(5, periodic=False)
    Hr = repetition_code_checks(5, periodic=True)
    assert Hp.shape == (4, 5) and Hr.shape == (5, 5)
    assert (np.asarray(Hp.sum(axis=0)).ravel() <= 2).all()
    with pytest.raises(ValueError):
        repetition_code_checks(1)


def test_surface_code_decodes_single_errors():
    code = surface_code(5)
    Hz = code.checks.z
    n = code.num_qubits
    errs = np.eye(n, dtype=np.uint8)
    synd = (errs @ Hz.T.toarray()) % 2
    dec = BPOSDDecoder.from_check_matrix(Hz, error_rate=0.01, max_iter=30,
                                         bp_method="ms", ms_scaling_factor=0.625)
    hard = dec.decode_batch(synd)
    resid = (hard ^ errs).astype(np.int64)
    Lz = np.asarray(code.logicals.z)
    assert ((resid @ Hz.T.toarray()) % 2 == 0).all()
    assert ((resid @ Lz.T) % 2 == 0).all()
