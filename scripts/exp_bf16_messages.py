"""Experiment: message dtype (f32 vs bf16) in the structured spacetime BP.

Drives the PRODUCTION kernel (`_stbp_core(msg_dtype=...)`) — the spacetime
check update is HBM-bandwidth-bound, so bf16 messages halve the streamed
bytes (~1.4x measured).  Fixed-32-iteration min-sum, distinct batches scanned
on device, slope-fit timing (bench.py methodology).

  ST_ROUNDS=16 python scripts/exp_bf16_messages.py
"""
import os
import time

import numpy as np
import jax
import jax.numpy as jnp

from exp_ldpc_tpu.codes.hgp import biregular_hgp
from exp_ldpc_tpu.decoders.bp import dense_ops_device, priors_to_llr
from exp_ldpc_tpu.decoders.spacetime import SpacetimeCode
from exp_ldpc_tpu.decoders.spacetime_bp import _stbp_core
from exp_ldpc_tpu.decoders.tanner import TannerELL

SHOTS, ITERS, P = 1024, 32, 1e-3
ROUNDS = int(os.environ.get("ST_ROUNDS", 4))


def main():
    code = biregular_hgp(12, 3, 4, seed=0, compute_logicals=False)
    H = code.checks.z
    r, n = H.shape
    st = SpacetimeCode(H, ROUNDS)
    Hst = st.spacetime_check_matrix
    tanner = TannerELL.from_check_matrix(H)
    ops = dense_ops_device(tanner)
    prior = np.concatenate([np.full((ROUNDS + 1) * n, P), np.full(ROUNDS * r, P)])
    prior_llr = jnp.asarray(priors_to_llr(prior))
    rng = np.random.default_rng(0)

    def make(k):
        errs = (rng.random((k, SHOTS, Hst.shape[1])) < P).astype(np.uint8)
        return jnp.asarray(((errs @ Hst.T.toarray()) % 2).astype(np.uint8).transpose(0, 2, 1))

    n_lo, n_hi = 2, 10
    lo, hi = jax.device_put(make(n_lo)), jax.device_put(make(n_hi))

    for msg_dtype in ("float32", "bfloat16"):

        @jax.jit
        def run_many(synds, md=msg_dtype):
            def one(carry, synd):
                hard, _p, _c, _i = _stbp_core(
                    tanner, ROUNDS, prior_llr, synd, "ms", ITERS,
                    jnp.float32(0.625), False, "auto", ops, md,
                )
                return carry + hard.sum(), None

            tot, _ = jax.lax.scan(one, jnp.int32(0), synds)
            return tot

        run_many(lo).block_until_ready()
        run_many(hi).block_until_ready()

        def timed(x):
            best = np.inf
            for _ in range(3):
                t0 = time.perf_counter()
                run_many(x).block_until_ready()
                best = min(best, time.perf_counter() - t0)
            return best

        per_batch = (timed(hi) - timed(lo)) / (n_hi - n_lo)
        print(
            f"R={ROUNDS} {msg_dtype:9s} {ITERS*SHOTS/per_batch/1e6:7.1f}M iter*shots/s "
            f"({per_batch*1e3:.1f} ms/batch)"
        )


if __name__ == "__main__":
    main()
