"""Homological products of 2-complexes and logical-operator extraction.

Behavioral parity with ``/root/reference/python/qldpc/
homological_product_code.py`` but the dense GF(2) homology runs on the
bit-packed word-parallel kernels in :mod:`exp_ldpc_tpu.utils.gf2` instead of
galois/numba — the O(n^3) homology (the reference's acknowledged scaling
wall, ``scripts/generate_hgp_code.py:19``) becomes O(n^3/64) word ops.
"""
from __future__ import annotations

from typing import Optional

import numpy as np
import scipy.sparse as sparse

from ..core import QuantumCode, QuantumCodeChecks, QuantumCodeLogicals
from ..utils import gf2

__all__ = [
    "homological_product",
    "get_logicals",
    "compute_homology_reps",
    "compute_logical_pairs",
]


def compute_homology_reps(partial_2: np.ndarray, partial_1: np.ndarray) -> np.ndarray:
    """Representatives of H = ker(partial_1) / im(partial_2).

    Same basis-extension construction as the reference
    (``homological_product_code.py:6-21``): row-reduce [image_basis^T |
    kernel_basis^T]; the pivot columns landing beyond the image block index
    kernel vectors completing the image to a basis of the kernel.
    """
    kernel = gf2.null_space(partial_1)  # rows span ker
    image = gf2.column_space(partial_2)  # rows span im, already row reduced
    if kernel.shape[0] == 0:
        return kernel
    aug = np.hstack([image.T, kernel.T]) if image.shape[0] else kernel.T
    reduced, _ = gf2.row_reduce(aug)
    pivot_cols = gf2.get_pivots(reduced)
    generator_indices = pivot_cols[image.shape[0]:] - image.shape[0]
    return kernel[generator_indices, :]


def compute_logical_pairs(z_logicals: np.ndarray, x_logicals: np.ndarray) -> np.ndarray:
    """Re-basis Z logicals so that L_z @ L_x^T = I (symplectic pairing).

    Row-reduces the augmented matrix (L_z L_x^T | L_z) over the pairing block
    only — parity with ``homological_product_code.py:23-35``.
    """
    # f32 BLAS matmul: exact for sums < 2^24, ~100x numpy's integer matmul
    inner = (
        (z_logicals.astype(np.float32) @ x_logicals.astype(np.float32).T) % 2
    ).astype(np.uint8)
    num_pairs = inner.shape[1]
    aug = np.hstack([inner.astype(np.uint8), z_logicals.astype(np.uint8)])
    reduced, _ = gf2.row_reduce(aug, ncols=num_pairs)
    return reduced[:, num_pairs:]


def get_logicals(checks: QuantumCodeChecks, compute_logicals: bool, check_complex: bool) -> QuantumCodeLogicals:
    """X/Z logical operators of a CSS code (``homological_product_code.py:37-60``)."""
    partial_2 = checks.x.T
    partial_1 = checks.z

    x_logicals = np.zeros((0, partial_1.shape[1]), dtype=np.uint32)
    z_logicals = np.zeros((0, partial_1.shape[1]), dtype=np.uint32)
    if compute_logicals:
        d1 = (partial_1.toarray() % 2).astype(np.uint8)
        d2 = (partial_2.toarray() % 2).astype(np.uint8)
        x_logicals = compute_homology_reps(d2, d1)
        z_logicals = compute_homology_reps(d1.T, d2.T)
        z_logicals = compute_logical_pairs(z_logicals, x_logicals)

        if check_complex:
            for l in x_logicals:
                assert np.all((partial_1 @ l) % 2 == 0)
            for l in z_logicals:
                assert np.all((partial_2.T @ l) % 2 == 0)
            assert (
                len(x_logicals) + gf2.rank(d1) + gf2.rank(d2) == partial_1.shape[1]
            )
    return QuantumCodeLogicals(
        np.ascontiguousarray(x_logicals, dtype=np.uint32),
        np.ascontiguousarray(z_logicals, dtype=np.uint32),
    )


def homological_product(
    partial_A: sparse.spmatrix,
    partial_B: sparse.spmatrix,
    check_complex: Optional[bool] = None,
    compute_logicals: Optional[bool] = None,
) -> QuantumCode:
    """Product of two 2-complexes given by their boundary maps.

    Same sparse-Kronecker construction as ``homological_product_code.py:64-103``:
      partial_2 = [A ⊗ I ; I ⊗ B],  partial_1 = [I ⊗ B | A ⊗ I]
    with X checks = partial_2^T and Z checks = partial_1.
    """
    if check_complex is None:
        check_complex = False
    if compute_logicals is None:
        compute_logicals = False

    partial_A = sparse.csr_matrix(partial_A)
    partial_B = sparse.csr_matrix(partial_B)

    partial_2 = sparse.vstack(
        [
            sparse.kron(partial_A, sparse.identity(partial_B.shape[1], dtype=np.int8)),
            sparse.kron(sparse.identity(partial_A.shape[1], dtype=np.int8), partial_B),
        ]
    ).astype(np.int8)
    partial_1 = sparse.hstack(
        [
            sparse.kron(sparse.identity(partial_A.shape[0], dtype=np.int8), partial_B),
            sparse.kron(partial_A, sparse.identity(partial_B.shape[0], dtype=np.int8)),
        ]
    ).astype(np.int8)

    # entries may exceed 1 only via duplicate sums; reduce mod 2 for safety
    partial_2 = partial_2.tocsr()
    partial_1 = partial_1.tocsr()
    partial_2.data = partial_2.data % 2
    partial_1.data = partial_1.data % 2
    partial_2.eliminate_zeros()
    partial_1.eliminate_zeros()

    if check_complex:
        assert np.all((partial_1 @ partial_2).data % 2 == 0)

    checks = QuantumCodeChecks(
        partial_2.tocsc().transpose().astype(np.uint32), partial_1.astype(np.uint32)
    )
    logicals = get_logicals(checks, compute_logicals, check_complex)

    assert partial_2.shape[1] == partial_A.shape[1] * partial_B.shape[1]
    assert partial_1.shape[1] == (
        partial_A.shape[0] * partial_B.shape[1] + partial_A.shape[1] * partial_B.shape[0]
    )
    assert partial_1.shape[1] == partial_2.shape[0]
    assert partial_1.shape[0] == partial_A.shape[0] * partial_B.shape[0]
    assert logicals.x.shape[0] == logicals.z.shape[0]
    return QuantumCode(checks, logicals)
