"""Two-tier adaptive decode (pipeline tier1_iters, VERDICT r4 item 2):
fixed-shape stage-1 + compacted redecode must reproduce the single-tier
statistics."""
import numpy as np
import pytest

jax = pytest.importorskip("jax")

from exp_ldpc_tpu.circuits.noise import depolarizing_noise  # noqa: E402
from exp_ldpc_tpu.codes.hgp import biregular_hgp  # noqa: E402
from exp_ldpc_tpu.parallel.pipeline import StorageDecodePipeline  # noqa: E402


@pytest.fixture(scope="module")
def code():
    return biregular_hgp(6, 2, 3, seed=1, compute_logicals=True)


def _pipe(code, **over):
    p = 0.01
    kw = dict(
        code=code, rounds=2, noise_model=depolarizing_noise(p, p),
        data_prior=2 / 3 * p, meas_prior=2 / 3 * p,
        shots_per_device=256, max_iter=24, bp_method="ms",
        ms_scaling_factor=0.625)
    kw.update(over)
    return StorageDecodePipeline(**kw)


def test_two_tier_degenerate_equals_single_tier(code):
    """tier1_iters == max_iter: stage 2 redecodes unconverged shots with
    the same program, so counts are identical to the single-tier run."""
    key = jax.random.PRNGKey(3)
    f1, s1, u1 = _pipe(code).run(key)
    f2, s2, u2 = _pipe(code, tier1_iters=24, tier2_cap=256).run(key)
    assert (f1, s1, u1) == (f2, s2, u2)


def test_two_tier_statistics_match_full_budget(code):
    """Short stage 1 + redecode: failure counts match the single-tier full
    budget closely (every stage-1 failure gets the full budget; converged
    shots sit at BP fixed points)."""
    key = jax.random.PRNGKey(4)
    f1, s1, u1 = _pipe(code).run(key)
    f2, s2, u2 = _pipe(code, tier1_iters=6, tier2_cap=256).run(key)
    assert s1 == s2 == 256
    # same sampled records (same key): identical up to convergence
    # knife-edges between a t=24 decode and a t=6-then-24 redecode
    assert abs(f1 - f2) <= max(3, 0.1 * max(f1, f2))
    assert abs(u1 - u2) <= max(3, 0.1 * max(u1, u2))


def test_two_tier_cap_overflow_reports_unconverged(code):
    """A tiny tier2_cap leaves overflow shots unconverged (they keep the
    stage-1 result) — never silently dropped."""
    key = jax.random.PRNGKey(5)
    _f1, _s, u_full = _pipe(code, tier1_iters=6, tier2_cap=256).run(key)
    _f2, _s2, u_capped = _pipe(code, tier1_iters=6, tier2_cap=128).run(key)
    assert u_capped >= u_full  # overflow can only add unconverged shots


def test_two_tier_validation(code):
    with pytest.raises(ValueError, match="bposd"):
        _pipe(code, tier1_iters=4, mode="bposd_hybrid")
    with pytest.raises(ValueError, match="early_stop"):
        _pipe(code, tier1_iters=4, early_stop=True)


def test_two_tier_with_osd_fallback(code):
    """run_bposd composes: OSD touches exactly the post-tier-2 unconverged
    shots."""
    key = jax.random.PRNGKey(6)
    pipe = _pipe(code, tier1_iters=6, tier2_cap=256, osd_fallback_cap=256,
                 osd_options=dict(osd_method="osd0", osd_order=0))
    f, s, osd_n = pipe.run(key)
    assert s == 256 and 0 <= osd_n <= 256 and 0 <= f <= s
