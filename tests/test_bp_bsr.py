"""BSR-routed Pallas BP kernel for large codes (decoders/bp_bsr.py):
schedule construction, parity with the generic BP core (interpret mode on
CPU), permutation handling, early-exit semantics."""
import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from exp_ldpc_tpu.decoders.bp import BPDecoder, _bp_core, priors_to_llr  # noqa: E402
from exp_ldpc_tpu.decoders.bp_bsr import (  # noqa: E402
    BSRBPDecoder, BSRSchedule, bsr_bp_decode, fits_bsr)
from exp_ldpc_tpu.decoders.tanner import TannerELL  # noqa: E402


def random_ldpc(rng, r, n, row_w=6):
    H = np.zeros((r, n), dtype=np.uint8)
    for i in range(r):
        H[i, rng.choice(n, size=row_w, replace=False)] = 1
    for j in range(n):
        if not H[:, j].any():
            H[rng.integers(r), j] = 1
    return H


@pytest.fixture(scope="module")
def code300():
    rng = np.random.default_rng(7)
    return random_ldpc(rng, 150, 300)


def test_schedule_reconstructs_matrix(code300):
    """The tile tables exactly encode H: rebuild it and compare."""
    tanner = TannerELL.from_check_matrix(code300)
    sched = BSRSchedule.from_tanner(tanner)
    C_pad, Dc = sched.c_pad, sched.dc
    H2 = np.zeros((sched.num_checks, sched.num_vars), np.uint8)
    for vt, pairs in enumerate(sched.sched_m):
        for et, t in pairs:
            for p in range(128):
                q = sched.idx[t, p]
                if q < 0:
                    continue
                erow = et * 128 + p
                s, c = erow // C_pad, erow % C_pad
                v = vt * 128 + q
                assert s < Dc and c < sched.num_checks
                H2[c, v] ^= 1
    np.testing.assert_array_equal(H2, np.asarray(code300) % 2)
    # G schedule is the same tile set grouped by edge tile
    g_tiles = sorted((t, vt) for et, prs in enumerate(sched.sched_g)
                     for vt, t in prs)
    m_tiles = sorted((t, vt) for vt, prs in enumerate(sched.sched_m)
                     for et, t in prs)
    assert g_tiles == m_tiles
    # padding rows are masked +BIG, real edge rows are 0
    n_masked = (sched.mask_t > 1).sum()
    E = (np.asarray(code300) % 2).sum()
    assert n_masked == sched.mask_t.size - E


@pytest.mark.parametrize("method,msf", [("ms", 0.625), ("ms", 0.0), ("ps", 0.0)])
def test_bsr_matches_xla_fixed_iter(code300, method, msf):
    """bf16 messages: hard decisions and convergence flags agree with the
    f32 XLA core on (nearly) all shots; converged shots satisfy their
    syndromes exactly."""
    H = code300
    tanner = TannerELL.from_check_matrix(H)
    sched = BSRSchedule.from_tanner(tanner)
    prior = priors_to_llr(np.full(300, 0.02))
    rng = np.random.default_rng(3)
    errs = (rng.random((64, 300)) < 0.02).astype(np.uint8)
    synd = ((errs @ H.T) % 2).astype(np.uint8)

    h_b, p_b, c_b, i_b = bsr_bp_decode(
        sched, jnp.asarray(prior), jnp.asarray(synd.T), method, 16, msf,
        early_stop=False, shot_block=64, interpret=True)
    h_x, p_x, c_x, _ = _bp_core(
        tanner, jnp.asarray(prior), jnp.asarray(synd.T), method, 16,
        jnp.float32(msf), False, "matmul")
    h_b, c_b, h_x, c_x = map(np.asarray, (h_b, c_b, h_x, c_x))
    assert (h_b == h_x).mean() >= 0.99
    assert (c_b == c_x).mean() >= 0.9
    assert np.asarray(i_b).tolist() == [16] * 64
    # convergence flags are honest syndrome checks
    ok = ((h_b.T @ H.T) % 2 == synd).all(axis=1)
    np.testing.assert_array_equal(ok, c_b)


def test_bsr_early_exit(code300):
    """With early_stop, iteration count stops at global convergence and
    converged flags still hold."""
    H = code300
    dec = BSRBPDecoder.from_check_matrix(
        H, error_rate=0.002, max_iter=200, bp_method="ms",
        ms_scaling_factor=0.625, shot_block=64, interpret=True)
    rng = np.random.default_rng(4)
    # weight-1 errors on well-connected variables (min-sum cannot flip a
    # degree-1 variable): BP converges every shot, the global exit must fire
    good = np.nonzero(np.asarray(H).sum(axis=0) >= 3)[0]
    errs = np.zeros((32, 300), np.uint8)
    errs[np.arange(32), rng.choice(good, size=32)] = 1
    synd = ((errs @ H.T) % 2).astype(np.uint8)
    hard, _post, conv, iters = dec.decode_batch(synd)
    hard, conv, iters = map(np.asarray, (hard, conv, iters))
    assert conv.all()
    assert (iters < 200).all()
    assert (iters == iters[0]).all()  # global early exit
    ok = ((hard @ H.T) % 2 == synd).all(axis=1)
    assert ok.all()


def test_bsr_decoder_perms_and_shapes(code300):
    """check_perm/var_perm round-trip: outputs in original column order."""
    H = code300
    rng = np.random.default_rng(5)
    cp = rng.permutation(H.shape[0])
    vp = rng.permutation(H.shape[1])
    errs = (rng.random((16, 300)) < 0.02).astype(np.uint8)
    synd = ((errs @ H.T) % 2).astype(np.uint8)
    kw = dict(error_rate=0.02, max_iter=24, bp_method="ms",
              ms_scaling_factor=0.625, shot_block=32, interpret=True)
    d0 = BSRBPDecoder.from_check_matrix(H, **kw)
    d1 = BSRBPDecoder.from_check_matrix(H, check_perm=cp, var_perm=vp, **kw)
    h0, _p0, c0, _ = map(np.asarray, d0.decode_batch(synd))
    h1, _p1, c1, _ = map(np.asarray, d1.decode_batch(synd))
    np.testing.assert_array_equal(c0, c1)
    # same Tanner graph, different accumulation order: converged shots agree
    np.testing.assert_array_equal(h0[c0], h1[c0])
    ok = ((h1 @ H.T) % 2 == synd).all(axis=1)
    np.testing.assert_array_equal(ok, c1)


def test_bsr_on_cyclic_lp():
    """The target family: an abelian lifted product decodes through the BSR
    kernel with syndrome-valid converged shots."""
    import warnings
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        from exp_ldpc_tpu.codes.lifted import lifted_product_code_cyclic
        code = lifted_product_code_cyclic(q=6, m=1, w=4, r=2, seed=3,
                                          compute_logicals=False)
    Hz = code.checks.z
    Hd = Hz.toarray() % 2
    rng = np.random.default_rng(0)
    errs = (rng.random((32, Hz.shape[1])) < 0.02).astype(np.uint8)
    synd = (errs @ Hd.T) % 2
    dec = BSRBPDecoder.from_check_matrix(
        Hz, error_rate=0.02, max_iter=32, bp_method="ms",
        ms_scaling_factor=0.625, shot_block=32, interpret=True)
    hard, _post, conv, _ = map(np.asarray, dec.decode_batch(synd))
    assert conv.mean() > 0.8
    ok = ((hard @ Hd.T) % 2 == synd).all(axis=1)
    np.testing.assert_array_equal(ok, conv)
    # and the generic decoder agrees on convergence statistics
    ref = BPDecoder.from_check_matrix(Hz, error_rate=0.02, max_iter=32,
                                      bp_method="ms", ms_scaling_factor=0.625,
                                      early_stop=False)
    _rh, _rp, rc, _ = map(np.asarray, ref.decode_batch(synd))
    assert abs(rc.mean() - conv.mean()) < 0.2


def test_fits_bsr():
    rng = np.random.default_rng(9)
    small = TannerELL.from_check_matrix(random_ldpc(rng, 60, 120))
    assert fits_bsr(small)
    # a deliberately huge graph exceeds the VMEM budget
    assert not fits_bsr(small, shot_block=65536)


def test_bsr_option_validation(code300):
    with pytest.raises(ValueError):
        BSRBPDecoder.from_check_matrix(code300)
    with pytest.raises(ValueError):
        BSRBPDecoder.from_check_matrix(code300, error_rate=0.1, bp_method="xx")
    with pytest.raises(ValueError):
        BSRBPDecoder.from_check_matrix(code300, channel_probs=np.full(3, 0.1))


def test_make_bp_decoder_bsr_routing(code300, monkeypatch):
    """Large non-QC codes route to BSR when a TPU is present (monkeypatched
    here), and fall back to the generic decoder on CPU backends."""
    from exp_ldpc_tpu.decoders import select
    from scipy import sparse

    big = sparse.block_diag([code300] * 40).tocsr()  # 12000 vars: 'large'
    dec = select.make_bp_decoder(big, error_rate=0.01)
    assert isinstance(dec, BPDecoder)  # CPU backend: no Mosaic lowering
    monkeypatch.setattr(select, "_bsr_usable", lambda t: True)
    dec = select.make_bp_decoder(big, error_rate=0.01)
    assert isinstance(dec, BSRBPDecoder)


def test_bsr_int8_bitexact_vs_xla_int8(code300):
    """Fixed-iteration int8 BSR == the XLA int8 kernel, exactly (integer
    math is order-independent, so the two backends must agree bit-for-bit
    on posterior quanta, hard decisions, and convergence flags)."""
    from exp_ldpc_tpu.decoders.bp_int8 import Int8BPDecoder, _int8_bp_core, _int8_dense_ops
    from exp_ldpc_tpu.decoders.tanner import TannerELL

    H = code300
    rng = np.random.default_rng(21)
    synd = rng.integers(0, 2, size=(64, 150)).astype(np.uint8)

    xla = Int8BPDecoder.from_check_matrix(
        H, error_rate=3e-3, max_iter=6, early_stop=False)
    h_x, p_x, c_x, _ = xla.decode_batch(synd)

    bsr = BSRBPDecoder.from_check_matrix(
        H, error_rate=3e-3, max_iter=6, bp_method="ms",
        ms_scaling_factor=0.625, early_stop=False, shot_block=64,
        interpret=True, msg_dtype="int8")
    assert bsr._delta == xla.delta
    h_b, p_b, c_b, _ = bsr.decode_batch(synd)

    np.testing.assert_array_equal(np.asarray(h_b), np.asarray(h_x))
    np.testing.assert_allclose(np.asarray(p_b), np.asarray(p_x), atol=1e-4)
    np.testing.assert_array_equal(np.asarray(c_b), np.asarray(c_x))


def test_bsr_int8_early_exit_and_validity(code300):
    """Early-stop int8 BSR: converged shots satisfy their syndromes and the
    zero syndrome exits on iteration 1."""
    H = code300
    rng = np.random.default_rng(5)
    errors = (rng.random((32, 300)) < 5e-3).astype(np.uint8)
    synd = (errors @ H.T) % 2
    synd[0] = 0
    dec = BSRBPDecoder.from_check_matrix(
        H, error_rate=5e-3, max_iter=30, bp_method="ms",
        ms_scaling_factor=0.625, shot_block=32, interpret=True,
        msg_dtype="int8")
    hard, _post, conv, iters = dec.decode_batch(synd)
    hard, conv = np.asarray(hard), np.asarray(conv)
    assert conv[0]
    assert conv.mean() > 0.8
    resid = (hard @ H.T) % 2
    np.testing.assert_array_equal(resid[conv], synd[conv])


def test_bsr_int8_option_validation(code300):
    with pytest.raises(ValueError, match="min-sum only"):
        BSRBPDecoder.from_check_matrix(
            code300, error_rate=1e-3, bp_method="ps", msg_dtype="int8")
    with pytest.raises(ValueError, match="scaling factor"):
        BSRBPDecoder.from_check_matrix(
            code300, error_rate=1e-3, bp_method="ms",
            ms_scaling_factor=0.0, msg_dtype="int8")
    with pytest.raises(ValueError, match="msg_dtype"):
        BSRBPDecoder.from_check_matrix(
            code300, error_rate=1e-3, msg_dtype="fp8")


def test_bsr_onehot_vmem_bitexact(code300):
    """Materialized-in-VMEM one-hot tiles are a pure scheduling change:
    bit-exact against the rebuild-per-use path for bf16 and int8 kernels
    (multi-grid-step shot blocks exercise the build-once guard)."""
    from exp_ldpc_tpu.decoders.bp_bsr import bsr_bp_decode_int8
    from exp_ldpc_tpu.decoders.bp_int8 import quantize_priors

    H = code300
    tanner = TannerELL.from_check_matrix(H)
    sched = BSRSchedule.from_tanner(tanner)
    prior = priors_to_llr(np.full(300, 0.02))
    rng = np.random.default_rng(11)
    errs = (rng.random((96, 300)) < 0.02).astype(np.uint8)
    synd = jnp.asarray((((errs @ H.T) % 2).astype(np.uint8)).T)

    a = bsr_bp_decode(sched, jnp.asarray(prior), synd, "ms", 12, 0.625,
                      False, 32, True, "", False)
    b = bsr_bp_decode(sched, jnp.asarray(prior), synd, "ms", 12, 0.625,
                      False, 32, True, "", True)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))

    pq, _ = quantize_priors(priors_to_llr(np.full(300, 0.02)))
    ai = bsr_bp_decode_int8(sched, jnp.asarray(pq), synd, 12, 160,
                            False, 32, True, False)
    bi = bsr_bp_decode_int8(sched, jnp.asarray(pq), synd, 12, 160,
                            False, 32, True, True)
    for x, y in zip(ai, bi):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


@pytest.mark.parametrize("msf", [0.625, 1.0])
def test_bsr_int8_degree_one_chunk_bitexact(msf):
    """Regression (round-2 advisor finding): in a 128-check chunk whose max
    live degree is 1, the second-min seed must act as the skipped padded
    planes (+_SAT) would have — seeding with _SAT+1 diverges from the XLA
    int8 kernel and, at ms_scaling_factor=1.0, wraps (128*256)>>8 = 128 to
    -128 on the int8 cast, flipping message signs."""
    from exp_ldpc_tpu.decoders.bp_int8 import Int8BPDecoder

    rng = np.random.default_rng(5)
    n = 256
    # chunk 0 (checks 0..127): degree 3 — sets the global Dc, so padded
    # slot planes exist; chunk 1 (checks 128..191): degree 1 — its padded
    # planes are the ones the live-slot skip removes from the second-min.
    H = np.zeros((192, n), dtype=np.uint8)
    for i in range(128):
        H[i, rng.choice(n, size=3, replace=False)] = 1
    H[128 + np.arange(64), rng.choice(n, size=64, replace=False)] = 1
    for j in range(n):
        if not H[:, j].any():
            H[rng.integers(128), j] = 1

    synd = rng.integers(0, 2, size=(32, 192)).astype(np.uint8)
    xla = Int8BPDecoder.from_check_matrix(
        H, error_rate=3e-3, max_iter=4, ms_scaling_factor=msf, early_stop=False)
    h_x, p_x, c_x, _ = xla.decode_batch(synd)

    bsr = BSRBPDecoder.from_check_matrix(
        H, error_rate=3e-3, max_iter=4, bp_method="ms",
        ms_scaling_factor=msf, early_stop=False, shot_block=32,
        interpret=True, msg_dtype="int8")
    h_b, p_b, c_b, _ = bsr.decode_batch(synd)

    np.testing.assert_array_equal(np.asarray(h_b), np.asarray(h_x))
    np.testing.assert_allclose(np.asarray(p_b), np.asarray(p_x), atol=1e-4)


@pytest.mark.parametrize("method,msf,early", [
    ("ms", 0.625, False), ("ms", 0.0, False), ("ps", 0.0, False),
    ("ms", 0.625, True), ("ps", 0.0, True),
])
def test_bsr_dynamic_bitexact_vs_unrolled(code300, method, msf, early):
    """The dynamic-loop kernel replays the unrolled kernel's accumulation
    order exactly: every output is bit-identical, in fixed-iteration and
    early-exit mode, for both BP methods."""
    H = code300
    sched = BSRSchedule.from_tanner(TannerELL.from_check_matrix(H))
    prior = jnp.asarray(priors_to_llr(np.full(300, 0.02)))
    rng = np.random.default_rng(11)
    errs = (rng.random((48, 300)) < 0.02).astype(np.uint8)
    synd = jnp.asarray(((errs @ H.T) % 2).astype(np.uint8).T)
    a = bsr_bp_decode(sched, prior, synd, method, 12, msf, early, 64,
                      True, "", None, "unrolled")
    b = bsr_bp_decode(sched, prior, synd, method, 12, msf, early, 64,
                      True, "", None, "dynamic")
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_bsr_loop_mode_resolution(code300):
    """auto mode picks unrolled below the tile threshold, dynamic above;
    explicit modes and bad names are honored/rejected."""
    from exp_ldpc_tpu.decoders.bp_bsr import (
        _DYN_MIN_TILES, _resolve_loop_mode)
    sched = BSRSchedule.from_tanner(TannerELL.from_check_matrix(code300))
    expect = "dynamic" if sched.num_tiles >= _DYN_MIN_TILES else "unrolled"
    assert _resolve_loop_mode(sched, "auto", "") == expect
    assert _resolve_loop_mode(sched, "dynamic", "") == "dynamic"
    assert _resolve_loop_mode(sched, "unrolled", "") == "unrolled"
    # ablation hooks exist only in the unrolled kernel
    assert _resolve_loop_mode(sched, "auto", "no_check") == "unrolled"
    with pytest.raises(ValueError):
        _resolve_loop_mode(sched, "bogus", "")


def test_bsr_schedule_dyn_metadata(code300):
    """The flat dyn segment tables encode exactly the sched_m/sched_g pair
    lists, in the same order (the bit-exactness precondition)."""
    sched = BSRSchedule.from_tanner(TannerELL.from_check_matrix(code300))
    d = sched.dyn
    for vt, pairs in enumerate(sched.sched_m):
        lo, hi = d["m_start"][vt], d["m_start"][vt + 1]
        assert [(int(e), int(t)) for e, t in
                zip(d["m_et"][lo:hi], d["m_t"][lo:hi])] == list(pairs)
    live = []
    for et, pairs in enumerate(sched.sched_g):
        lo, hi = d["g_start"][et], d["g_start"][et + 1]
        assert [(int(v), int(t)) for v, t in
                zip(d["g_vt"][lo:hi], d["g_t"][lo:hi])] == list(pairs)
        if pairs:
            live.append(et)
    assert d["live_et"].tolist() == live
    assert d["live_slots"].tolist() == list(sched.live_slots)


def test_bsr_auto_shot_block():
    """Auto shot_block: 256 where the VMEM estimate safely allows, 128 for
    schedules near the scoped cap (the n=10000-scale regime).  A 512 tier
    was evaluated on hardware and rejected (variance-suite median below
    256's — see _auto_shot_block docstring)."""
    from exp_ldpc_tpu.decoders.bp_bsr import _auto_shot_block
    rng = np.random.default_rng(2)
    small = BSRSchedule.from_tanner(
        TannerELL.from_check_matrix(random_ldpc(rng, 150, 300)))
    assert _auto_shot_block(small) == 256
    big = BSRSchedule.from_tanner(
        TannerELL.from_check_matrix(random_ldpc(rng, 4800, 10000, row_w=7)))
    assert _auto_shot_block(big) == 128
    dec = BSRBPDecoder.from_check_matrix(
        random_ldpc(rng, 150, 300), error_rate=1e-3, interpret=True)
    assert dec.shot_block == 256
    dec = BSRBPDecoder.from_check_matrix(
        random_ldpc(rng, 150, 300), error_rate=1e-3, shot_block=64,
        interpret=True)
    assert dec.shot_block == 64


def test_make_bp_decoder_bsr_takes_over_above_1mib(code300, monkeypatch):
    """With a TPU present (monkeypatched), the fused BSR kernel is selected
    from ~1 MiB of dense routing operands up (HGP-225-scale), while tiny
    codes (gross-scale, < 1 MiB) keep the dense matmul formulation."""
    from exp_ldpc_tpu.codes.bivariate_bicycle import gross_code
    from exp_ldpc_tpu.codes.hgp import biregular_hgp
    from exp_ldpc_tpu.decoders import select

    monkeypatch.setattr(select, "_bsr_usable", lambda t: True)
    hgp = biregular_hgp(12, 3, 4, seed=0, compute_logicals=False).checks.z
    assert isinstance(
        select.make_bp_decoder(hgp, error_rate=1e-3), BSRBPDecoder)
    gross = gross_code(compute_logicals=False).checks.z
    assert isinstance(
        select.make_bp_decoder(gross, error_rate=1e-3), BPDecoder)
