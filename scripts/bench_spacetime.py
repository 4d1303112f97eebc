"""Structured vs generic spacetime BP throughput on the real chip.

Fixed-32-iteration min-sum on the 4-round HGP-225 spacetime program,
batch 1024: distinct batches scanned on device, slope-fit over two repeat
counts (same methodology as bench.py)."""
import time

import numpy as np
import jax
import jax.numpy as jnp

from exp_ldpc_tpu.codes.hgp import biregular_hgp
from exp_ldpc_tpu.decoders.bp import _bp_core, dense_ops_device, priors_to_llr
from exp_ldpc_tpu.decoders.spacetime import SpacetimeCode
from exp_ldpc_tpu.decoders.spacetime_bp import _stbp_core
from exp_ldpc_tpu.decoders.tanner import TannerELL

import os
SHOTS, ITERS, P, ROUNDS = 1024, 32, 1e-3, int(os.environ.get("ST_ROUNDS", 4))


def slope_time(fn, lo, hi, n_lo, n_hi):
    fn(lo).block_until_ready()
    fn(hi).block_until_ready()
    tl = min(
        (lambda t0: (fn(lo).block_until_ready(), time.perf_counter() - t0)[1])(time.perf_counter())
        for _ in range(3)
    )
    th = min(
        (lambda t0: (fn(hi).block_until_ready(), time.perf_counter() - t0)[1])(time.perf_counter())
        for _ in range(3)
    )
    return (th - tl) / (n_hi - n_lo)


def main():
    code = biregular_hgp(12, 3, 4, seed=0, compute_logicals=False)
    H = code.checks.z
    r, n = H.shape
    st = SpacetimeCode(H, ROUNDS)
    Hst = st.spacetime_check_matrix
    prior = np.concatenate(
        [np.full((ROUNDS + 1) * n, P), np.full(ROUNDS * r, P)]
    )
    prior_llr = jnp.asarray(priors_to_llr(prior))

    rng = np.random.default_rng(0)

    def make(n_batches):
        errs = (rng.random((n_batches, SHOTS, Hst.shape[1])) < P).astype(np.uint8)
        return jnp.asarray(((errs @ Hst.T.toarray()) % 2).astype(np.uint8).transpose(0, 2, 1))

    n_lo, n_hi = 2, 10
    lo, hi = jax.device_put(make(n_lo)), jax.device_put(make(n_hi))

    tanner_st = TannerELL.from_check_matrix(Hst)
    gen_ops = dense_ops_device(tanner_st)

    @jax.jit
    def run_generic(synds):
        def one(carry, synd):
            hard, _p, _c, _i = _bp_core(
                tanner_st, prior_llr, synd, "ms", ITERS, jnp.float32(0.625), False,
                "auto", gen_ops,
            )
            return carry + hard.sum(), None
        tot, _ = jax.lax.scan(one, jnp.int32(0), synds)
        return tot

    tanner = TannerELL.from_check_matrix(H)
    st_ops = dense_ops_device(tanner)

    @jax.jit
    def run_structured(synds):
        def one(carry, synd):
            hard, _p, _c, _i = _stbp_core(
                tanner, ROUNDS, prior_llr, synd, "ms", ITERS, jnp.float32(0.625), False,
                "auto", st_ops,
            )
            return carry + hard.sum(), None
        tot, _ = jax.lax.scan(one, jnp.int32(0), synds)
        return tot

    for name, fn in (("generic", run_generic), ("structured", run_structured)):
        per_batch = slope_time(fn, lo, hi, n_lo, n_hi)
        rate = ITERS * SHOTS / per_batch
        print(f"{name:11s} {rate/1e6:7.1f}M iter*shots/s   ({per_batch*1e3:.1f} ms/batch)")


if __name__ == "__main__":
    main()
