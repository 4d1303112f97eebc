#!/usr/bin/env python
"""A/B the BSR kernel variants on the n=4862 cyclic LP, one chip.

Axes: one-hot tiles rebuilt per use (iota-compare, VPU) vs materialized once
in VMEM scratch; shot_block 128 vs 256; bf16 vs int8 messages.  Methodology:
distinct input batches, slope fit over two repeat counts (CLAUDE.md).
"""
import argparse
import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from exp_ldpc_tpu.codes.lifted import lifted_product_code_cyclic
    from exp_ldpc_tpu.decoders.bp import priors_to_llr
    from exp_ldpc_tpu.decoders.bp_bsr import (
        BSRSchedule, bsr_bp_decode, bsr_bp_decode_int8,
    )
    from exp_ldpc_tpu.decoders.bp_int8 import quantize_priors
    from exp_ldpc_tpu.decoders.tanner import TannerELL

    ap = argparse.ArgumentParser()
    ap.add_argument("--shots", type=int, default=1024)
    ap.add_argument("--iters", type=int, default=32)
    ap.add_argument("--p", type=float, default=1e-3)
    args = ap.parse_args()
    shots, iters, p = args.shots, args.iters, args.p

    code = lifted_product_code_cyclic(q=22, m=1, w=14, r=5, seed=42,
                                      compute_logicals=False)
    H = code.checks.z
    meta = code.qc_meta
    if meta.z_check_perm is not None:
        H = H[meta.z_check_perm]
    H = H[:, meta.qubit_perm]
    tanner = TannerELL.from_check_matrix(H)
    sched = BSRSchedule.from_tanner(tanner)
    prior = jnp.asarray(priors_to_llr(np.full(tanner.num_vars, p)))
    prior_q, _ = quantize_priors(priors_to_llr(np.full(tanner.num_vars, p)))
    prior_q = jnp.asarray(prior_q)
    Hd = H.T.toarray()
    rng = np.random.default_rng(0)

    def synds(R):
        errors = (rng.random((R, shots, tanner.num_vars)) < p).astype(np.uint8)
        st = (errors @ Hd) % 2
        return jnp.asarray(st.astype(np.uint8).transpose(0, 2, 1))

    def build(kind, oh, sb):
        @jax.jit
        def run_many(ss):
            def step(carry, synd):
                if kind == "int8":
                    hard, _post, conv, _it = bsr_bp_decode_int8(
                        sched, prior_q, synd, iters, 160, False, sb, False, oh)
                else:
                    hard, _post, conv, _it = bsr_bp_decode(
                        sched, prior, synd, "ms", iters, 0.625, False, sb,
                        False, "", oh)
                return (carry[0] + hard.sum(), carry[1] + conv.sum()), None
            (tot, conv), _ = jax.lax.scan(
                step, (jnp.int32(0), jnp.int32(0)), ss)
            return tot, conv
        return run_many

    reps_lo, reps_hi = 4, 16
    los = [jax.device_put(synds(reps_lo)) for _ in range(3)]
    his = [jax.device_put(synds(reps_hi)) for _ in range(3)]

    def timed(r, xs):
        best = np.inf
        for x in xs:
            t0 = time.perf_counter()
            r(x)[0].block_until_ready()
            best = min(best, time.perf_counter() - t0)
        return best

    cases = [
        ("bf16", False, 128),
        ("bf16", True, 128),
        ("bf16", True, 256),
        ("int8", False, 128),
        ("int8", True, 128),
        ("int8", True, 256),
    ]
    for kind, oh, sb in cases:
        r = build(kind, oh, sb)
        t0 = time.perf_counter()
        _, conv = r(los[0])
        conv.block_until_ready()
        compile_s = time.perf_counter() - t0
        r(his[0])[0].block_until_ready()
        per = (timed(r, his) - timed(r, los)) / (reps_hi - reps_lo)
        print(json.dumps({
            "kind": kind, "onehot_vmem": oh, "shot_block": sb,
            "tiles": sched.num_tiles,
            "iter_shots_per_s": iters * shots / per,
            "converged_frac": float(np.asarray(conv)) / (reps_lo * shots),
            "compile_s": compile_s,
        }), flush=True)


if __name__ == "__main__":
    main()
