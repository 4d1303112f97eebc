"""Multi-device sharding tests on the virtual 8-device CPU mesh."""
import jax
import numpy as np
import pytest

from exp_ldpc_tpu.circuits.noise import depolarizing_noise
from exp_ldpc_tpu.codes.hgp import biregular_hgp
from exp_ldpc_tpu.parallel.mesh import make_mesh
from exp_ldpc_tpu.parallel.pipeline import StorageDecodePipeline


@pytest.fixture(scope="module")
def small_code():
    return biregular_hgp(12, 3, 4, seed=0, compute_logicals=True)


def test_mesh_shapes():
    mesh = make_mesh(8)
    assert mesh.shape["data"] == 8 and mesh.shape["model"] == 1
    mesh2 = make_mesh(8, model_parallel=2)
    assert mesh2.shape["data"] == 4 and mesh2.shape["model"] == 2
    with pytest.raises(ValueError):
        make_mesh(6, model_parallel=4)


def test_sharded_pipeline_runs(small_code):
    p = 0.01
    pipe = StorageDecodePipeline(
        code=small_code, rounds=1, noise_model=depolarizing_noise(p, p),
        data_prior=2 / 3 * p, meas_prior=2 / 3 * p,
        shots_per_device=32, max_iter=25, mesh=make_mesh(8),
    )
    failures, shots, unconverged = pipe.run(jax.random.PRNGKey(0))
    assert shots == 8 * 32
    assert 0 <= failures <= shots
    assert 0 <= unconverged <= shots


def test_sharded_matches_unsharded_statistics(small_code):
    """Failure rates of the sharded and single-device pipelines agree."""
    p = 0.02
    kw = dict(
        code=small_code, rounds=1, noise_model=depolarizing_noise(p, p),
        data_prior=2 / 3 * p, meas_prior=2 / 3 * p, max_iter=30,
    )
    sharded = StorageDecodePipeline(shots_per_device=64, mesh=make_mesh(8), **kw)
    single = StorageDecodePipeline(shots_per_device=512, **kw)
    f_sh, s_sh, _ = sharded.run(jax.random.PRNGKey(1))
    f_si, s_si, _ = single.run(jax.random.PRNGKey(2))
    r_sh, r_si = f_sh / s_sh, f_si / s_si
    sigma = np.sqrt(max(r_si * (1 - r_si), 1e-4) / s_si) * 2
    assert abs(r_sh - r_si) < 5 * sigma + 0.02


def test_pipeline_osd_fallback(small_code):
    """run_bposd: device BP + host OSD on the BP failures.  OSD can only
    help, so failures <= plain-BP failures, and both modes agree on shot
    accounting; sharded and single-device fallback agree statistically."""
    p = 0.03
    kw = dict(
        code=small_code, rounds=1, noise_model=depolarizing_noise(p, p),
        data_prior=2 / 3 * p, meas_prior=2 / 3 * p, max_iter=20,
    )
    plain = StorageDecodePipeline(shots_per_device=256, **kw)
    fb = StorageDecodePipeline(shots_per_device=256, osd_fallback_cap=256, **kw)
    key = jax.random.PRNGKey(3)
    f_plain, s_plain, unconv = plain.run(key)
    f_fb, s_fb, osd_count = fb.run_bposd(key)
    assert s_plain == s_fb == 256
    assert osd_count == unconv  # same key -> same sampled shots
    assert f_fb <= f_plain
    # sharded fallback: same statistics
    fb_mesh = StorageDecodePipeline(
        shots_per_device=32, osd_fallback_cap=32, mesh=make_mesh(8), **kw)
    f_m, s_m, osd_m = fb_mesh.run_bposd(jax.random.PRNGKey(4))
    assert s_m == 256
    assert 0 <= f_m <= s_m and 0 <= osd_m <= s_m


def test_pipeline_osd_fallback_validation(small_code):
    p = 0.01
    kw = dict(
        code=small_code, rounds=1, noise_model=depolarizing_noise(p, p),
        data_prior=2 / 3 * p, meas_prior=2 / 3 * p, max_iter=10,
    )
    with pytest.raises(ValueError):
        StorageDecodePipeline(shots_per_device=32, osd_fallback_cap=64, **kw)
    plain = StorageDecodePipeline(shots_per_device=32, **kw)
    with pytest.raises(ValueError):
        plain.run_bposd(jax.random.PRNGKey(0))
