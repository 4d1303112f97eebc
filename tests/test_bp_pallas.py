"""Pallas VMEM-resident BP kernel vs the XLA core (interpret mode on CPU).

On real TPU hardware the kernel was verified to match `_bp_core`
hard-decisions 100% on the HGP-225 benchmark; these tests pin the same
agreement in interpreter mode so CI (CPU) covers the kernel logic.
"""
import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from exp_ldpc_tpu.decoders.bp import _bp_core, priors_to_llr  # noqa: E402
from exp_ldpc_tpu.decoders.bp_pallas import bp_pallas_fixed, fits_pallas  # noqa: E402
from exp_ldpc_tpu.decoders.tanner import TannerELL  # noqa: E402


def random_ldpc(rng, r, n, row_w=4):
    H = np.zeros((r, n), dtype=np.uint8)
    for i in range(r):
        H[i, rng.choice(n, size=row_w, replace=False)] = 1
    for j in range(n):
        if not H[:, j].any():
            H[rng.integers(r), j] = 1
    return H


@pytest.mark.parametrize("method,msf", [("ms", 0.625), ("ms", 0.0), ("ps", 0.0)])
def test_pallas_matches_xla_fixed_iter(method, msf):
    rng = np.random.default_rng(0)
    H = random_ldpc(rng, 12, 24)
    tanner = TannerELL.from_check_matrix(H)
    prior = jnp.asarray(priors_to_llr(np.full(24, 0.02)))
    errs = (rng.random((32, 24)) < 0.03).astype(np.uint8)
    synds = jnp.asarray(((errs @ H.T) % 2).astype(np.uint8).T)  # (C, S)

    h_x, p_x, c_x, i_x = _bp_core(tanner, prior, synds, method, 10,
                                  jnp.float32(msf), False, "matmul")
    h_p, p_p, c_p, i_p = bp_pallas_fixed(tanner, prior, synds, method, 10,
                                         msf, shot_block=32, interpret=True)
    assert np.array_equal(np.asarray(h_x), np.asarray(h_p))
    assert np.array_equal(np.asarray(c_x), np.asarray(c_p))
    assert np.array_equal(np.asarray(i_p), np.full(32, 10))
    # ps: the phi-clamp plateaus amplify sub-ulp ordering differences into
    # visible (but hard-decision-irrelevant) posterior deltas
    atol = 0.5 if method == "ps" else 1e-3
    assert np.allclose(np.asarray(p_x), np.asarray(p_p), rtol=1e-3, atol=atol)


def test_pallas_shot_padding():
    """Shot counts that do not divide the block are padded and cropped."""
    rng = np.random.default_rng(1)
    H = random_ldpc(rng, 10, 20)
    tanner = TannerELL.from_check_matrix(H)
    prior = jnp.asarray(priors_to_llr(np.full(20, 0.02)))
    errs = (rng.random((7, 20)) < 0.05).astype(np.uint8)
    synds = jnp.asarray(((errs @ H.T) % 2).astype(np.uint8).T)
    h, p, c, i = bp_pallas_fixed(tanner, prior, synds, "ms", 8, 0.625,
                                 shot_block=16, interpret=True)
    assert h.shape == (20, 7)
    assert c.shape == (7,)
    Hd = H.astype(np.int64)
    hn, cn = np.asarray(h), np.asarray(c)
    for s in np.nonzero(cn)[0]:
        assert np.array_equal((Hd @ hn[:, s]) % 2, (Hd @ errs[s]) % 2)


def test_fits_pallas_budget():
    rng = np.random.default_rng(2)
    small = TannerELL.from_check_matrix(random_ldpc(rng, 10, 20))
    assert fits_pallas(small)
    assert not fits_pallas(small, vmem_budget_bytes=1024)
