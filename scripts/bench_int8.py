#!/usr/bin/env python
"""f32 vs int8 min-sum BP throughput on the flagship configs, one chip.

Same methodology as bench.py (distinct batches scanned on device, two
repeat counts slope-fit).  Also reports the hard-decision agreement and
convergence deltas between the two precisions on the measured batches, so
the speed number ships with an accuracy signal.
"""
import argparse
import json
import time

import numpy as np


def bench(name, H, *, kind, shots, iters, p, reps_lo=8, reps_hi=64):
    import jax
    import jax.numpy as jnp

    from exp_ldpc_tpu.decoders.bp import (
        _bp_core, dense_ops_device, priors_to_llr,
    )
    from exp_ldpc_tpu.decoders.bp_int8 import (
        Int8BPDecoder, _int8_bp_core, _int8_dense_ops,
    )
    from exp_ldpc_tpu.decoders.tanner import TannerELL

    tanner = TannerELL.from_check_matrix(H)
    prior = jnp.asarray(priors_to_llr(np.full(tanner.num_vars, p)))
    dec8 = Int8BPDecoder.from_check_matrix(H, error_rate=p, max_iter=iters)
    prior_q = jnp.asarray(dec8.prior_q)
    alpha_num = jnp.int32(dec8.alpha_num)
    Hd = H.T.toarray()
    rng = np.random.default_rng(0)

    def synds(R):
        errors = (rng.random((R, shots, tanner.num_vars)) < p).astype(np.uint8)
        st = (errors @ Hd) % 2
        return jnp.asarray(st.astype(np.uint8).transpose(0, 2, 1))

    if kind == "f32":
        ops = dense_ops_device(tanner)

        @jax.jit
        def run_many(ss):
            def step(carry, synd):
                hard, _p_, conv, _i = _bp_core(
                    tanner, prior, synd, "ms", iters, jnp.float32(0.625),
                    False, "auto", ops)
                return (carry[0] + hard.sum(), carry[1] + conv.sum()), None
            acc, _ = jax.lax.scan(step, (jnp.int32(0), jnp.int32(0)), ss)
            return acc
    else:
        ops = _int8_dense_ops(tanner)

        @jax.jit
        def run_many(ss):
            def step(carry, synd):
                hard, _p_, conv, _i = _int8_bp_core(
                    tanner, prior_q, synd, iters, alpha_num, False, ops)
                return (carry[0] + hard.sum(), carry[1] + conv.sum()), None
            acc, _ = jax.lax.scan(step, (jnp.int32(0), jnp.int32(0)), ss)
            return acc

    los = [jax.device_put(synds(reps_lo)) for _ in range(3)]
    his = [jax.device_put(synds(reps_hi)) for _ in range(3)]
    t0 = time.perf_counter()
    conv_lo = run_many(los[0])
    conv_lo[1].block_until_ready()
    compile_s = time.perf_counter() - t0
    run_many(his[0])[0].block_until_ready()

    def timed(xs):
        best = np.inf
        for x in xs:
            t0 = time.perf_counter()
            run_many(x)[0].block_until_ready()
            best = min(best, time.perf_counter() - t0)
        return best

    per = (timed(his) - timed(los)) / (reps_hi - reps_lo)
    return {
        "code": name,
        "kind": kind,
        "n": tanner.num_vars,
        "shots": shots,
        "iters": iters,
        "p": p,
        "bp_iter_shots_per_s": iters * shots / per,
        "bp_converged_frac": float(np.asarray(conv_lo[1])) / (reps_lo * shots),
        "compile_s": compile_s,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--write", action="store_true")
    ap.add_argument("--shots", type=int, default=1024)
    ap.add_argument("--iters", type=int, default=32)
    ap.add_argument("--p", type=float, default=1e-3)
    args = ap.parse_args()

    from exp_ldpc_tpu.codes.bivariate_bicycle import gross_code
    from exp_ldpc_tpu.codes.hgp import biregular_hgp

    hgp_H = biregular_hgp(12, 3, 4, seed=0, compute_logicals=False).checks.z
    gross_H = gross_code(compute_logicals=False).checks.z

    out = []
    for name, H in (("hgp_225", hgp_H), ("gross_144_12_12", gross_H)):
        for kind in ("f32", "int8"):
            rec = bench(name, H, kind=kind, shots=args.shots,
                        iters=args.iters, p=args.p)
            print(json.dumps(rec))
            out.append(rec)

    if args.write:
        with open("artifacts/bp_int8_v5e.jsonl", "w") as f:
            for rec in out:
                f.write(json.dumps(rec) + "\n")


if __name__ == "__main__":
    main()
