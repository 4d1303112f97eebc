"""Statistical parity tests between the decode paths.

The reference has NO end-to-end decoder tests at all (SURVEY.md §4:
"the decoder drivers in misc/ have no tests"); this file adds what the TPU
build needs most — agreement between the fully-fused on-device pipeline
(device sampler + batched device BP) and the host oracle chain (CPU
Pauli-frame sampler + driver decode), within binomial error bars, plus
check-partition sharded decoding of a multi-round spacetime matrix.
"""
import numpy as np
import pytest

from exp_ldpc_tpu.circuits.noise import depolarizing_noise
from exp_ldpc_tpu.codes.hgp import biregular_hgp
from exp_ldpc_tpu.decoders.drivers import run_simulation
from exp_ldpc_tpu.parallel.mesh import make_mesh
from exp_ldpc_tpu.parallel.pipeline import StorageDecodePipeline


@pytest.fixture(scope="module")
def small_code():
    # 52-qubit (2,3) HGP: big enough for nontrivial failure rates, small
    # enough for fast CPU compiles
    return biregular_hgp(6, 2, 3, seed=1, compute_logicals=True)


def _binomial_sigma_gap(f1, n1, f2, n2, k=2):
    """|rate1 - rate2| minus k x the pooled binomial sigma (negative = agree)."""
    r1, r2 = f1 / n1, f2 / n2
    pool = (f1 + f2) / (n1 + n2)
    sigma = np.sqrt(pool * (1 - pool) * (1 / n1 + 1 / n2))
    return abs(r1 - r2) - k * sigma


def _binomial_2sigma_gap(f1, n1, f2, n2):
    return _binomial_sigma_gap(f1, n1, f2, n2, 2)


def test_device_sampler_matches_oracle_sampler_ler(small_code):
    """Identical decode program fed by the device sampler vs the CPU oracle
    sampler: LERs must agree within 2 sigma (isolates the samplers)."""
    import jax

    p = 0.02
    rounds = 2
    shots = 512

    pipe = StorageDecodePipeline(
        code=small_code, rounds=rounds, noise_model=depolarizing_noise(p, p),
        data_prior=2 / 3 * p, meas_prior=2 / 3 * p,
        shots_per_device=shots, max_iter=24, bp_method="ms",
        ms_scaling_factor=0.625)
    fail_dev, n_dev, _unconv = pipe.run(jax.random.PRNGKey(7))
    fail_host, n_host, _u = pipe.run_host_sampled(seed=11)

    assert fail_dev > 0 and fail_host > 0  # p chosen to produce failures
    gap = _binomial_2sigma_gap(fail_dev, n_dev, fail_host, n_host)
    assert gap < 0, (fail_dev, n_dev, fail_host, n_host, gap)


def test_pipeline_vs_driver_host_chain(small_code):
    """Same decode CONTRACT on both paths (BP + OSD on BP failures): the
    fused device pipeline with OSD fallback and the independent host chain
    (CPU sampler + bposd driver) must agree two-sided within 3 pooled sigma.
    A chain that silently decodes nothing (0 failures) fails this band, as
    does one that is uniformly wrong (VERDICT r1 'what's weak' #3)."""
    import jax

    p = 0.02
    rounds = 2
    shots = 1024

    pipe = StorageDecodePipeline(
        code=small_code, rounds=rounds, noise_model=depolarizing_noise(p, p),
        data_prior=2 / 3 * p, meas_prior=2 / 3 * p,
        shots_per_device=shots, max_iter=24, bp_method="ms",
        ms_scaling_factor=0.625, osd_fallback_cap=shots,
        osd_options=dict(osd_method="osd0", osd_order=0))
    fail_dev, n_dev, _osd = pipe.run_bposd(jax.random.PRNGKey(7))

    fails = run_simulation(
        samples=shots, code=small_code, rounds=rounds,
        noise_model=depolarizing_noise,
        noise_model_args=dict(p=p, pm=p),
        meas_prior=lambda xs, zs: 2 / 3 * p,
        data_prior=lambda xs, zs: 2 / 3 * p,
        bp_osd_options=dict(bp_method="ms", ms_scaling_factor=0.625,
                            max_iter=24, osd_method="osd0", osd_order=0),
        decoder_mode="bposd", seed=11, use_device_sampler=False)
    fail_host = int(np.asarray(fails).sum())

    assert fail_dev > 0 and fail_host > 0
    gap = _binomial_sigma_gap(fail_dev, n_dev, fail_host, shots, 3)
    assert gap < 0, (fail_dev, n_dev, fail_host, shots, gap)


def test_flagship_fixed_seed_regression(small_code):
    """Fixed-seed LER regression: the pipeline's failure count for this
    exact (code, p, key) is deterministic on the CPU backend; accuracy
    drift anywhere in the chain (sampler, BP, correction application) moves
    it far outside the pinned band and fails CI (VERDICT r1 item 9)."""
    import jax

    p = 0.02
    pipe = StorageDecodePipeline(
        code=small_code, rounds=2, noise_model=depolarizing_noise(p, p),
        data_prior=2 / 3 * p, meas_prior=2 / 3 * p,
        shots_per_device=2048, max_iter=24, bp_method="ms",
        ms_scaling_factor=0.625)
    failures, shots, unconv = pipe.run(jax.random.PRNGKey(42))
    assert shots == 2048
    # measured 2026-08 (CPU backend, threefry PRNG): failures=1583,
    # unconverged=1810; the band allows formulation-level reordering
    # (+-4 sqrt) but not accuracy drift.  Re-pinned from 1376 when the
    # round-4 homological rewrite changed the (equally valid) logical
    # representative basis: at this stress point 1810/2048 shots are
    # BP-unconverged and hard-decisioned, and "any logical flipped" on a
    # non-codeword residual is basis-dependent.  unconverged stayed 1810
    # (sampler + decode chain untouched).
    EXPECTED_F = 1583
    EXPECTED_UNCONV = 1810
    assert abs(failures - EXPECTED_F) <= 4 * np.sqrt(EXPECTED_F), (
        failures, unconv)
    assert abs(unconv - EXPECTED_UNCONV) <= 4 * np.sqrt(EXPECTED_UNCONV), (
        failures, unconv)


def test_sharded_bp_decodes_spacetime_matrix(small_code):
    """Check-partition sharding handles the block-structured multi-round
    spacetime matrix (the '1-D halo' rounds-axis layout, SURVEY.md §5)."""
    from exp_ldpc_tpu.decoders.bp import BPDecoder
    from exp_ldpc_tpu.decoders.spacetime import SpacetimeCode
    from exp_ldpc_tpu.parallel.check_shard import ShardedBPDecoder

    rounds = 3
    st = SpacetimeCode(small_code.checks.z, rounds)
    H = st.spacetime_check_matrix
    C, V = H.shape
    prior = np.full(V, 0.01)

    rng = np.random.default_rng(2)
    errs = (rng.random((32, V)) < 0.01).astype(np.uint8)
    synds = (errs @ H.T.toarray()) % 2

    mesh = make_mesh(8, model_parallel=4)  # rounds axis splits over 4 shards
    sh = ShardedBPDecoder.from_check_matrix(
        H, mesh, channel_probs=prior, bp_method="ms",
        ms_scaling_factor=0.625, max_iter=40)
    ref = BPDecoder.from_check_matrix(
        H, channel_probs=prior, bp_method="ms", ms_scaling_factor=0.625,
        max_iter=40, formulation="gather")

    hs, _ps, cs = sh.decode_batch(synds)
    hr, _pr, cr, _ = ref.decode_batch(synds)
    for i in np.nonzero(cs)[0]:
        assert np.array_equal((hs[i] @ H.T.toarray()) % 2, synds[i])
    assert (np.asarray(cr) == cs).mean() >= 0.9
    assert (np.asarray(hr) == hs).mean() >= 0.99


def test_x_basis_ler_matches_z_basis_on_self_dual_code():
    """X-basis memory decodes end-to-end (VERDICT r2 item 7): on the toric
    code (self-dual: X/Z sectors isomorphic) under symmetric depolarizing
    noise, the X-basis LER must statistically match the Z-basis LER."""
    from exp_ldpc_tpu.codes.surface import toric_code

    code = toric_code(4, compute_logicals=True)
    p = 0.04
    rounds = 2
    shots = 1500
    kwargs = dict(
        code=code,
        meas_prior=lambda xs, zs: 2 / 3 * p,
        data_prior=lambda xs, zs: 2 / 3 * p,
        noise_model=depolarizing_noise,
        noise_model_args={"p": p, "pm": p},
        bp_osd_options=dict(max_iter=24, bp_method="ms", ms_scaling_factor=0.625,
                            osd_method="osd0", osd_order=0),
        rounds=rounds,
        decoder_mode="bposd",
        use_device_sampler=False,
    )
    fz = sum(run_simulation(shots, seed=3, use_x_logicals=False, **kwargs))
    fx = sum(run_simulation(shots, seed=4, use_x_logicals=True, **kwargs))
    assert fz > 0 and fx > 0
    gap = _binomial_sigma_gap(fz, shots, fx, shots, k=3)
    assert gap < 0, (fz, fx, gap)


def test_x_basis_pipeline_matches_host_driver():
    """The fused pipeline with use_x_logicals=True must agree with the host
    X-basis driver chain within binomial bounds."""
    import jax

    from exp_ldpc_tpu.codes.surface import toric_code

    code = toric_code(4, compute_logicals=True)
    p = 0.04
    rounds = 2
    shots = 1500
    pipe = StorageDecodePipeline(
        code=code, rounds=rounds, noise_model=depolarizing_noise(p, p),
        data_prior=2 / 3 * p, meas_prior=2 / 3 * p,
        shots_per_device=shots, max_iter=24, bp_method="ms",
        ms_scaling_factor=0.625, osd_fallback_cap=shots,
        osd_options=dict(osd_method="osd0", osd_order=0),
        use_x_logicals=True)
    f_dev, n_dev, _ = pipe.run_bposd(jax.random.PRNGKey(9))
    f_host = sum(run_simulation(
        shots,
        code=code,
        meas_prior=lambda xs, zs: 2 / 3 * p,
        data_prior=lambda xs, zs: 2 / 3 * p,
        noise_model=depolarizing_noise,
        noise_model_args={"p": p, "pm": p},
        bp_osd_options=dict(max_iter=24, bp_method="ms", ms_scaling_factor=0.625,
                            osd_method="osd0", osd_order=0),
        rounds=rounds,
        decoder_mode="bposd",
        seed=5,
        use_device_sampler=False,
        use_x_logicals=True,
    ))
    assert f_dev > 0 and f_host > 0
    gap = _binomial_sigma_gap(f_dev, n_dev, f_host, shots, k=3)
    assert gap < 0, (f_dev, f_host, gap)


@pytest.mark.parametrize("mode", ["bposd_single_shot", "bposd_hybrid"])
def test_fused_pipeline_modes_match_host_drivers(small_code, mode):
    """The on-device fused single-shot/hybrid pipelines (VERDICT r2 item 6)
    must statistically match the host driver chain of the same mode."""
    import jax

    from exp_ldpc_tpu.decoders.drivers import run_simulation

    p = 0.02
    rounds = 3
    shots = 1024
    pipe = StorageDecodePipeline(
        code=small_code, rounds=rounds, noise_model=depolarizing_noise(p, p),
        data_prior=2 / 3 * p, meas_prior=2 / 3 * p,
        shots_per_device=shots, max_iter=24, bp_method="ms",
        ms_scaling_factor=0.625, osd_fallback_cap=shots,
        osd_options=dict(osd_method="osd0", osd_order=0),
        mode=mode)
    f_dev, n_dev, n_osd = pipe.run_bposd(jax.random.PRNGKey(3))
    f_host = sum(run_simulation(
        shots,
        code=small_code,
        meas_prior=lambda xs, zs: 2 / 3 * p,
        data_prior=lambda xs, zs: 2 / 3 * p,
        noise_model=depolarizing_noise,
        noise_model_args={"p": p, "pm": p},
        bp_osd_options=dict(max_iter=24, bp_method="ms", ms_scaling_factor=0.625,
                            osd_method="osd0", osd_order=0),
        rounds=rounds,
        decoder_mode=mode,
        seed=6,
        use_device_sampler=False,
    ))
    assert f_dev > 0 and f_host > 0
    gap = _binomial_sigma_gap(f_dev, n_dev, f_host, shots, k=3)
    assert gap < 0, (mode, f_dev, f_host, n_osd, gap)


@pytest.mark.parametrize("mode", ["bposd_single_shot", "bposd_hybrid"])
def test_fused_pipeline_modes_on_mesh(small_code, mode):
    """The fused single-shot/hybrid programs must also compile and agree
    when sharded over a multi-device mesh."""
    import jax

    p = 0.02
    rounds = 2
    shots = 256
    mesh = make_mesh(4)
    pipe = StorageDecodePipeline(
        code=small_code, rounds=rounds, noise_model=depolarizing_noise(p, p),
        data_prior=2 / 3 * p, meas_prior=2 / 3 * p,
        shots_per_device=shots, max_iter=16, bp_method="ms",
        ms_scaling_factor=0.625, osd_fallback_cap=shots,
        osd_options=dict(osd_method="osd0", osd_order=0),
        mesh=mesh, mode=mode)
    f, n, n_osd = pipe.run_bposd(jax.random.PRNGKey(1))
    assert n == 4 * shots
    # unsharded run at the same total shots must agree within 3 sigma
    pipe1 = StorageDecodePipeline(
        code=small_code, rounds=rounds, noise_model=depolarizing_noise(p, p),
        data_prior=2 / 3 * p, meas_prior=2 / 3 * p,
        shots_per_device=4 * shots, max_iter=16, bp_method="ms",
        ms_scaling_factor=0.625, osd_fallback_cap=4 * shots,
        osd_options=dict(osd_method="osd0", osd_order=0),
        mode=mode)
    f1, n1, _ = pipe1.run_bposd(jax.random.PRNGKey(2))
    assert f > 0 and f1 > 0
    gap = _binomial_sigma_gap(f, n, f1, n1, k=3)
    assert gap < 0, (mode, f, f1, gap)


def test_bposd_fixed_seed_regression(small_code):
    """Fixed-seed regression for the FULL bposd chain (device-sampler +
    fixed-iteration BP + host OSD redecode of unconverged shots): pins the
    failure and OSD-shipped counts for one (code, p, key) on the CPU
    backend.  Accuracy drift anywhere — sampler, BP, shipping logic, OSD —
    moves the counts outside the band."""
    import jax

    p = 0.01
    pipe = StorageDecodePipeline(
        code=small_code, rounds=2, noise_model=depolarizing_noise(p, p),
        data_prior=2 / 3 * p, meas_prior=2 / 3 * p,
        shots_per_device=1024, max_iter=24, bp_method="ms",
        ms_scaling_factor=0.625, osd_fallback_cap=1024)
    failures, shots, osd_shipped = pipe.run(jax.random.PRNGKey(7))
    assert shots == 1024
    # measured 2026-08 (CPU backend, threefry PRNG, r4 logical basis):
    # bposd failures=445, osd_shipped=669; plain BP on the same key gives
    # 564 failures — the OSD redecode must keep its ~20% margin
    assert abs(failures - 445) <= 4 * np.sqrt(445), (failures, osd_shipped)
    assert abs(osd_shipped - 669) <= 4 * np.sqrt(669), (failures, osd_shipped)
    assert failures < 564 - 2 * np.sqrt(564)
