"""Streamed spacetime BSR kernel (decoders/bp_bsr_spacetime.py): parity
with the dense structured spacetime BP (interpret mode on CPU), honest
convergence flags, early-exit semantics, BPOSD composition, and selection
routing."""
import numpy as np
import pytest

jax = pytest.importorskip("jax")

from exp_ldpc_tpu.codes.hgp import biregular_hgp  # noqa: E402
from exp_ldpc_tpu.decoders.bp_bsr_spacetime import (  # noqa: E402
    SpacetimeBSRDecoder, fits_stbsr)
from exp_ldpc_tpu.decoders.spacetime import SpacetimeCode  # noqa: E402
from exp_ldpc_tpu.decoders.spacetime_bp import SpacetimeBPDecoder  # noqa: E402
from exp_ldpc_tpu.decoders.tanner import TannerELL  # noqa: E402


@pytest.fixture(scope="module")
def hgp225():
    return biregular_hgp(12, 3, 4, seed=0, compute_logicals=False)


def _spacetime_setup(H, rounds, p, S, seed, meas_scale=1.0):
    st = SpacetimeCode(H, rounds)
    Hst = st.spacetime_check_matrix.tocsr().toarray().astype(np.int64)
    rng = np.random.default_rng(seed)
    err = (rng.random((S, Hst.shape[1])) < p).astype(np.uint8)
    synd = (err @ Hst.T) % 2
    r, n = H.shape
    prior = np.concatenate([
        np.full((rounds + 1) * n, p), np.full(rounds * r, p * meas_scale)])
    return Hst, synd, prior


@pytest.mark.parametrize("rounds,method,msf", [
    (1, "ms", 0.625),   # minimum round count (single measurement layer)
    (3, "ms", 0.0),     # adaptive min-sum scaling
    (3, "ps", 0.0),     # sum-product
])
def test_stbsr_matches_dense_spacetime(hgp225, rounds, method, msf):
    """Hard decisions agree with the f32 dense spacetime decoder on
    (nearly) all shots; convergence flags are exact syndrome checks."""
    H = hgp225.checks.z
    Hst, synd, prior = _spacetime_setup(H, rounds, 0.015, 40, rounds)

    dec_b = SpacetimeBSRDecoder.from_check_matrix(
        H, rounds, channel_probs=prior, max_iter=12, bp_method=method,
        ms_scaling_factor=msf, early_stop=False, interpret=True)
    h_b, p_b, c_b, i_b = dec_b.decode_batch(synd)
    dec_x = SpacetimeBPDecoder.from_check_matrix(
        H, rounds, channel_probs=prior, max_iter=12, bp_method=method,
        ms_scaling_factor=msf, early_stop=False)
    h_x, _p, c_x, _i = dec_x.decode_batch(synd)

    assert (h_b == h_x).mean() >= 0.99
    # bf16 messages: convergence may flip near fixed-point boundaries
    # (same bound as the flat BSR kernel's parity test)
    assert (c_b == np.asarray(c_x)).mean() >= 0.9
    assert np.asarray(i_b).tolist() == [12] * 40
    # convergence flags are honest spacetime syndrome checks
    ok = ((h_b.astype(np.int64) @ Hst.T) % 2 == synd).all(axis=1)
    np.testing.assert_array_equal(ok, c_b)


def test_stbsr_heterogeneous_priors(hgp225):
    """Per-column priors (data != measurement) flow through the per-block
    tables; converged decisions satisfy their spacetime syndromes."""
    H = hgp225.checks.z
    Hst, synd, prior = _spacetime_setup(H, 4, 0.01, 24, 9, meas_scale=0.25)
    dec = SpacetimeBSRDecoder.from_check_matrix(
        H, 4, channel_probs=prior, max_iter=16, bp_method="ms",
        ms_scaling_factor=0.625, early_stop=False, interpret=True)
    h, _p, c, _i = dec.decode_batch(synd)
    ok = ((h.astype(np.int64) @ Hst.T) % 2 == synd).all(axis=1)
    np.testing.assert_array_equal(ok, c)
    assert c.sum() >= 20  # most shots converge at this p


def test_stbsr_early_exit(hgp225):
    """Global early exit: iteration count stops at all-shots convergence,
    decisions still satisfy the syndromes."""
    H = hgp225.checks.z
    Hst, synd, _ = _spacetime_setup(H, 3, 0.001, 32, 5)
    dec = SpacetimeBSRDecoder.from_check_matrix(
        H, 3, error_rate=0.001, max_iter=200, bp_method="ms",
        ms_scaling_factor=0.625, early_stop=True, interpret=True)
    h, _p, conv, iters = dec.decode_batch(synd)
    assert conv.all()
    assert (iters < 200).all()
    assert (iters == iters[0]).all()  # global exit
    ok = ((h.astype(np.int64) @ Hst.T) % 2 == synd).all(axis=1)
    assert ok.all()


@pytest.mark.parametrize("method", ["ms", "ps"])
def test_stbsr_dynamic_matches_unrolled(hgp225, method):
    """The rolled dynamic-loop kernel is bit-identical to the unrolled
    straight-line kernel (same math, same accumulation order)."""
    H = hgp225.checks.z
    Hst, synd, prior = _spacetime_setup(H, 3, 0.01, 24, 21)
    kw = dict(channel_probs=prior, max_iter=8, bp_method=method,
              ms_scaling_factor=0.625 if method == "ms" else 0.0,
              early_stop=False, interpret=True)
    h_u, p_u, c_u, _ = SpacetimeBSRDecoder.from_check_matrix(
        H, 3, loop_mode="unrolled", **kw).decode_batch(synd)
    h_d, p_d, c_d, _ = SpacetimeBSRDecoder.from_check_matrix(
        H, 3, loop_mode="dynamic", **kw).decode_batch(synd)
    np.testing.assert_array_equal(h_u, h_d)
    np.testing.assert_array_equal(c_u, c_d)
    np.testing.assert_allclose(p_u, p_d, rtol=0, atol=0)


def test_stbsr_option_validation(hgp225):
    H = hgp225.checks.z
    with pytest.raises(ValueError, match="num_rounds"):
        SpacetimeBSRDecoder.from_check_matrix(H, 0, error_rate=1e-3)
    with pytest.raises(ValueError, match="channel_probs"):
        SpacetimeBSRDecoder.from_check_matrix(
            H, 2, channel_probs=np.full(7, 1e-3))
    with pytest.raises(ValueError, match="unknown bp method"):
        SpacetimeBSRDecoder.from_check_matrix(
            H, 2, error_rate=1e-3, bp_method="zzz")
    with pytest.raises(ValueError, match="error_rate or channel_probs"):
        SpacetimeBSRDecoder.from_check_matrix(H, 2)


def test_stbsr_fits(hgp225):
    """Feasibility is independent of the round count (streamed design)."""
    tanner = TannerELL.from_check_matrix(hgp225.checks.z)
    assert fits_stbsr(tanner, 1) == fits_stbsr(tanner, 64)
    assert fits_stbsr(tanner, 8)
    assert not fits_stbsr(tanner, 8, vmem_budget_bytes=2**20)


def test_stbsr_in_bposd(hgp225):
    """Drop-in as the BP stage of BPOSDDecoder on the spacetime matrix:
    OSD redecodes exactly the unconverged shots and every output satisfies
    its syndrome."""
    from exp_ldpc_tpu.decoders.bposd import BPOSDDecoder

    H = hgp225.checks.z
    rounds = 2
    Hst_sp = SpacetimeCode(H, rounds).spacetime_check_matrix.tocsr()
    Hst = Hst_sp.toarray().astype(np.int64)
    rng = np.random.default_rng(11)
    err = (rng.random((24, Hst.shape[1])) < 0.02).astype(np.uint8)
    synd = (err @ Hst.T) % 2

    bp = SpacetimeBSRDecoder.from_check_matrix(
        H, rounds, error_rate=0.02, max_iter=8, bp_method="ms",
        ms_scaling_factor=0.625, interpret=True)
    dec = BPOSDDecoder(bp=bp, H=Hst_sp, osd_method="osd0", osd_order=0)
    out = dec.decode_batch(synd)
    par = (out.astype(np.int64) @ Hst.T) % 2
    np.testing.assert_array_equal(par, synd)  # OSD guarantees validity


def test_pipeline_stbsr_backend(hgp225):
    """The production pipeline runs its spacetime stage on the streamed
    kernel (bp_backend='stbsr'), counts matching the XLA core on the same
    sampled records."""
    import jax

    from exp_ldpc_tpu.circuits.noise import depolarizing_noise
    from exp_ldpc_tpu.parallel.pipeline import StorageDecodePipeline

    p = 3e-3
    kw = dict(code=hgp225, rounds=2, noise_model=depolarizing_noise(p, p),
              data_prior=2 / 3 * p, meas_prior=2 / 3 * p,
              shots_per_device=128, max_iter=16, bp_method="ms",
              ms_scaling_factor=0.625)
    key = jax.random.PRNGKey(7)
    f_x, s_x, u_x = StorageDecodePipeline(**kw).run(key)
    f_b, s_b, u_b = StorageDecodePipeline(
        **kw, bp_backend="stbsr", stbsr_interpret=True).run(key)
    assert s_x == s_b == 128
    # same records; bf16 messages may flip convergence knife-edges
    assert abs(f_x - f_b) <= max(2, 0.1 * max(f_x, f_b))
    assert abs(u_x - u_b) <= max(2, 0.1 * max(u_x, u_b))

    with pytest.raises(ValueError, match="bposd"):
        StorageDecodePipeline(**{**kw, "mode": "bposd_hybrid"},
                              bp_backend="stbsr")
    with pytest.raises(ValueError, match="early_stop"):
        StorageDecodePipeline(**kw, bp_backend="stbsr", early_stop=True)


def test_make_spacetime_decoder_routing(hgp225, monkeypatch):
    """Selection: dense below the operand threshold, streamed BSR above it
    (on TPU); both produce the SpacetimeBPDecoder API."""
    from exp_ldpc_tpu.decoders import select

    H = hgp225.checks.z
    dec = select.make_spacetime_bp_decoder(H, 3, error_rate=1e-3)
    assert isinstance(dec, SpacetimeBPDecoder)  # small code or CPU backend

    monkeypatch.setattr(select, "_BSR_MIN_OPS_BYTES", 0)
    monkeypatch.setattr(select, "_stbsr_usable", lambda tanner: True)
    dec = select.make_spacetime_bp_decoder(
        H, 3, error_rate=1e-3, interpret=True)
    assert isinstance(dec, SpacetimeBSRDecoder)
