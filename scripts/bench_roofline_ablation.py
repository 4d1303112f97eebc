#!/usr/bin/env python
"""Roofline ablation for the flagship HGP-225 BP iteration.

Separates the iteration into its two cost centers and times each alone,
with the usual distinct-batch / slope-fit methodology:

  full     — production fixed-iteration min-sum step (2 routing matmuls +
             elementwise check update);
  mm_only  — the two routing matmuls with the check update replaced by a
             negation (keeps the loop-carried dependency, no min/sign trees);
  vpu_only — the check update with the matmuls replaced by a reshape-sum
             (keeps shapes, removes MXU work).

Also times the full step across batch sizes to expose any bandwidth floor.
The numbers feed docs/DESIGN.md's roofline section.
"""
import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from exp_ldpc_tpu.codes.hgp import biregular_hgp
    from exp_ldpc_tpu.decoders.bp import (
        _build_dense_ops, _check_update_cm, dense_ops_device, priors_to_llr,
    )
    from exp_ldpc_tpu.decoders.tanner import TannerELL

    iters = 32
    p = 1e-3

    code = biregular_hgp(12, 3, 4, seed=0, compute_logicals=False)
    Hz = code.checks.z
    tanner = TannerELL.from_check_matrix(Hz)
    C, V, Dc = tanner.num_checks, tanner.num_vars, tanner.max_check_degree
    prior = jnp.asarray(priors_to_llr(np.full(V, p)))
    M, G, Hd = dense_ops_device(tanner)
    mask3 = jnp.asarray(_build_dense_ops(tanner)[3])[:, :, None]
    Hz_dense = Hz.T.toarray()
    rng = np.random.default_rng(0)

    def make(R, S):
        errors = (rng.random((R, S, V)) < p).astype(np.uint8)
        st = (errors @ Hz_dense) % 2
        return jnp.asarray(st.astype(np.uint8).transpose(0, 2, 1))

    def step_full(v2c, synd_sign, S):
        c2v = _check_update_cm(v2c, synd_sign, "ms", 0.625)
        totals = jnp.dot(M, c2v.reshape(C * Dc, S),
                         preferred_element_type=jnp.float32)
        posterior = prior[:, None] + totals
        back = jnp.dot(G, posterior, preferred_element_type=jnp.float32)
        return jnp.where(mask3, back.reshape(C, Dc, S) - c2v, 1e30), posterior

    def step_mm(v2c, synd_sign, S):
        c2v = -v2c * synd_sign[:, None, :]  # elementwise stand-in
        totals = jnp.dot(M, c2v.reshape(C * Dc, S),
                         preferred_element_type=jnp.float32)
        posterior = prior[:, None] + totals
        back = jnp.dot(G, posterior, preferred_element_type=jnp.float32)
        return jnp.where(mask3, back.reshape(C, Dc, S) - c2v, 1e30), posterior

    def step_vpu(v2c, synd_sign, S):
        c2v = _check_update_cm(v2c, synd_sign, "ms", 0.625)
        # shape-preserving non-MXU substitute for the routing (pad C -> V)
        posterior = prior[:, None] + jnp.pad(c2v.sum(axis=1), ((0, V - C), (0, 0)))
        return jnp.where(mask3, -c2v, 1e30), posterior

    variants = {"full": step_full, "mm_only": step_mm, "vpu_only": step_vpu}

    def build_runner(stepfn, S):
        @jax.jit
        def run_many(ss):
            def outer(carry, synd):
                synd_sign = 1.0 - 2.0 * synd.astype(jnp.float32)
                edge_prior = prior[np.asarray(tanner.chk_vars)]
                edge_prior = jnp.where(jnp.asarray(tanner.chk_mask),
                                       edge_prior, 1e30)
                v2c0 = jnp.broadcast_to(edge_prior[:, :, None], (C, Dc, S))
                post0 = jnp.broadcast_to(prior[:, None], (V, S))

                def fbody(_it, st):
                    v2c, _ = st
                    return stepfn(v2c, synd_sign, S)

                _v, post = jax.lax.fori_loop(0, iters, fbody, (v2c0, post0))
                return carry + (post <= 0).sum(), None

            tot, _ = jax.lax.scan(outer, jnp.int32(0), ss)
            return tot
        return run_many

    def timed(run_many, xs):
        best = np.inf
        for x in xs:
            t0 = time.perf_counter()
            run_many(x).block_until_ready()
            best = min(best, time.perf_counter() - t0)
        return best

    S = 1024
    lo = [jax.device_put(make(8, S)) for _ in range(3)]
    hi = [jax.device_put(make(64, S)) for _ in range(3)]
    for name, fn in variants.items():
        r = build_runner(fn, S)
        r(lo[0]).block_until_ready()
        r(hi[0]).block_until_ready()
        per = (timed(r, hi) - timed(r, lo)) / (64 - 8)
        print(json.dumps({
            "variant": name, "shots": S, "iters": iters,
            "us_per_iter_batch": per / iters * 1e6,
            "iter_shots_per_s": iters * S / per,
        }))

    # batch-size scan of the full step
    for S in (256, 1024, 4096):
        lo = [jax.device_put(make(8, S)) for _ in range(3)]
        hi = [jax.device_put(make(32, S)) for _ in range(3)]
        r = build_runner(step_full, S)
        r(lo[0]).block_until_ready()
        r(hi[0]).block_until_ready()
        per = (timed(r, hi) - timed(r, lo)) / (32 - 8)
        print(json.dumps({
            "variant": "full", "shots": S, "iters": iters,
            "us_per_iter_batch": per / iters * 1e6,
            "iter_shots_per_s": iters * S / per,
        }))


if __name__ == "__main__":
    main()
