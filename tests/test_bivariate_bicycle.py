"""Bivariate bicycle codes: published parameters as oracles (arXiv:2308.07915)
plus end-to-end decode through the storage-circuit + BP stack."""
import numpy as np
import pytest

from exp_ldpc_tpu.codes.bivariate_bicycle import BB_CODES, bivariate_bicycle_code, gross_code
from exp_ldpc_tpu.utils import gf2


@pytest.mark.parametrize("name", sorted(BB_CODES))
def test_published_parameters(name):
    l, m, a, b, (n, k, _d) = BB_CODES[name]
    code = bivariate_bicycle_code(l, m, a, b, compute_logicals=True)
    assert code.num_qubits == n
    assert code.num_logicals == k
    hx = (code.checks.x.toarray() % 2).astype(np.uint8)
    hz = (code.checks.z.toarray() % 2).astype(np.uint8)
    # CSS commutation and weight-6 checks
    assert not ((hx @ hz.T) % 2).any()
    assert (hx.sum(axis=1) == 6).all() and (hz.sum(axis=1) == 6).all()
    # logicals commute with checks and pair symplectically
    lx, lz = code.logicals.x, code.logicals.z
    assert not ((hz @ lx.T) % 2).any()
    assert not ((hx @ lz.T) % 2).any()
    assert np.array_equal((lz @ lx.T) % 2, np.eye(k, dtype=np.uint64) % 2)
    # logicals independent of the stabilizers
    assert gf2.rank(np.vstack([hx, lz.astype(np.uint8)])) == gf2.rank(hx) + k


def test_gross_code_decodes_end_to_end():
    """Gross code through the full stack: storage circuit, device sampler,
    batched BP decode — low-p shots mostly decode without logical failure."""
    import exp_ldpc_tpu as qldpc
    from exp_ldpc_tpu.misc import run_simulation

    code = gross_code(compute_logicals=True)
    fails = run_simulation(
        samples=64, code=code, rounds=1,
        noise_model=qldpc.noise_model.depolarizing_noise,
        noise_model_args=dict(p=1e-3, pm=1e-3),
        meas_prior=lambda xs, zs: 2e-3 / 3, data_prior=lambda xs, zs: 2e-3 / 3,
        bp_osd_options=dict(bp_method="ms", ms_scaling_factor=0.625, max_iter=30,
                            osd_method="osd0", osd_order=0),
        decoder_mode="bposd", seed=0)
    assert sum(fails) <= 6  # p=1e-3, d=12: failures must be rare
