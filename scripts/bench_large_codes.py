#!/usr/bin/env python
"""BP decode throughput across code families / formulations on one chip.

Covers the code-scale axis from the gross code [[144,12,12]] (where the
dense one-hot matmul formulation still wins) through an HGP ladder
(n = 225 / 400 / 625 / 1600 / 2025), QC-LP [[1054,140]], the n=4862
cyclic LP, and a n=10000 HGP — each measured on the formulations that
apply (matmul / qc-roll / BSR tile kernel / int8 ablation).  These rows
are the evidence base for the `decoders/select.py` crossovers and the
DESIGN.md §12 roofline table.

Methodology matches bench.py (CLAUDE.md): fixed-iteration min-sum, DISTINCT
syndrome batches scanned on device, two repeat counts slope-fit to exclude
the single dispatch.  Writes one JSON line per code to
artifacts/bp_families_v5e.jsonl (with --write).
"""
import argparse
import json
import time

import numpy as np


def bench_code(name, H, *, shots, iters, p, reps_lo, reps_hi, qc_dims=None,
               qc_perms=None, bsr=False, bsr_int8=False, shot_block=128,
               loop_mode="auto"):
    import jax
    import jax.numpy as jnp

    from exp_ldpc_tpu.decoders.bp import (
        _bp_core, dense_ops_device, priors_to_llr, resolve_use_matmul,
    )
    from exp_ldpc_tpu.decoders.bp_bsr import (
        BSRSchedule, bsr_bp_decode, bsr_bp_decode_int8,
    )
    from exp_ldpc_tpu.decoders.bp_int8 import quantize_priors
    from exp_ldpc_tpu.decoders.qc_bp import QCStructure, _qc_bp_core
    from exp_ldpc_tpu.decoders.tanner import TannerELL

    if qc_perms is not None:
        # throughput is permutation-invariant (same Tanner graph); bring the
        # matrix into block-circulant order up front, as QCBPDecoder does
        check_perm, var_perm = qc_perms
        H = H[check_perm][:, var_perm] if check_perm is not None else H[:, var_perm]
    tanner = TannerELL.from_check_matrix(H)
    sched = None
    prior_q = None
    if bsr or bsr_int8:
        struct = None
        sched = BSRSchedule.from_tanner(tanner)
        suffix = ",dyn" if (not bsr_int8 and loop_mode == "dynamic") else ""
        formulation = (f"bsr-int8[{sched.num_tiles} tiles]" if bsr_int8
                       else f"bsr[{sched.num_tiles} tiles{suffix}]")
        if bsr_int8:
            prior_q, _delta = quantize_priors(
                priors_to_llr(np.full(tanner.num_vars, p)))
            prior_q = jnp.asarray(prior_q)
    elif qc_dims is not None:
        struct = QCStructure.from_check_matrix(H, qc_dims)
        formulation = f"qc-roll{qc_dims}"
    else:
        struct = None
        formulation = "matmul" if resolve_use_matmul(tanner, "auto") else "gather"
    use_matmul = resolve_use_matmul(tanner, "auto")
    prior = jnp.asarray(priors_to_llr(np.full(tanner.num_vars, p)))
    dense_ops = (dense_ops_device(tanner)
                 if (use_matmul and struct is None and sched is None) else None)
    from scipy import sparse as _sp
    Hs = _sp.csr_matrix(H)

    rng = np.random.default_rng(0)

    def synds(R):
        # sparse product: a dense (R*shots, n) @ (n, r) uint8 matmul costs
        # minutes of host time at n ~ 5k-10k
        errors = (rng.random((R * shots, tanner.num_vars)) < p).astype(np.uint8)
        st = (Hs @ errors.T % 2).astype(np.uint8)
        return jnp.asarray(
            st.reshape(tanner.num_checks, R, shots).transpose(1, 0, 2))

    @jax.jit
    def run_many(ss):
        def step(carry, synd):
            if sched is not None and bsr_int8:
                hard, _post, conv, _it = bsr_bp_decode_int8(
                    sched, prior_q, synd, iters, 160, False, shot_block
                )
            elif sched is not None:
                hard, _post, conv, _it = bsr_bp_decode(
                    sched, prior, synd, "ms", iters, 0.625, False, shot_block,
                    False, "", None, loop_mode
                )
            elif struct is not None:
                hard, _post, conv, _it = _qc_bp_core(
                    struct, prior, synd, "ms", iters, jnp.float32(0.625), False
                )
            else:
                hard, _post, conv, _it = _bp_core(
                    tanner, prior, synd, "ms", iters, jnp.float32(0.625), False,
                    "auto", dense_ops,
                )
            return (carry[0] + hard.sum(), carry[1] + conv.sum()), None

        (tot, conv), _ = jax.lax.scan(step, (jnp.int32(0), jnp.int32(0)), ss)
        return tot, conv

    # remote backends can deduplicate IDENTICAL dispatches (CLAUDE.md: a
    # repeated-call timing loop once measured a bogus 31B iter*shots/s), so
    # every timing sample gets its own distinct input batch
    los = [jax.device_put(synds(reps_lo)) for _ in range(3)]
    his = [jax.device_put(synds(reps_hi)) for _ in range(3)]
    t0 = time.perf_counter()
    _, conv = run_many(los[0])
    conv.block_until_ready()
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
    rate = iters * shots / per
    return {
        "code": name,
        "n": tanner.num_vars,
        "checks": tanner.num_checks,
        "formulation": formulation,
        "iters": iters,
        "shots": shots,
        "p": p,
        "bp_iter_shots_per_s": rate,
        "bp_converged_frac": float(np.asarray(conv)) / (reps_lo * shots),
        "compile_s": compile_s,
        "shot_block": shot_block if (bsr or bsr_int8) else None,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--write", action="store_true",
                    help="append results to artifacts/bp_families_v5e.jsonl")
    ap.add_argument("--shots", type=int, default=1024)
    ap.add_argument("--iters", type=int, default=32)
    ap.add_argument("--p", type=float, default=1e-3)
    ap.add_argument("--only", default=None,
                    help="substring filter on 'name/formulation-flags' "
                         "(e.g. 'bsr', 'cyclic', 'qclp/int8')")
    ap.add_argument("--shot_block", type=int, default=128,
                    help="BSR kernel shot block (grid tile width)")
    ap.add_argument("--loop_mode", default="auto",
                    help="BSR kernel loop mode: auto|unrolled|dynamic")
    args = ap.parse_args()

    from functools import lru_cache

    from exp_ldpc_tpu.codes.bivariate_bicycle import gross_code
    from exp_ldpc_tpu.codes.hgp import biregular_hgp
    from exp_ldpc_tpu.codes.lifted import lifted_product_code_cyclic
    from exp_ldpc_tpu.codes.qc_lifted import qc_lifted_product_code

    # constructors are LAZY (and cached) so a --only filtered run does not
    # pay minutes of host-side construction for unrelated codes
    @lru_cache(maxsize=None)
    def gross_H():
        return gross_code(compute_logicals=False).checks.z

    @lru_cache(maxsize=None)
    def qclp_H():
        shifts = [[1, 2, 4, 8, 16], [5, 10, 20, 9, 18], [25, 19, 7, 14, 28]]
        return qc_lifted_product_code(
            shifts, 31, compute_logicals=False).checks.z

    @lru_cache(maxsize=None)
    def cyclic():
        return lifted_product_code_cyclic(
            q=22, m=1, w=14, r=5, seed=42, compute_logicals=False)

    def cyclic_H():
        return cyclic().checks.z

    def cyc_perms():
        meta = cyclic().qc_meta
        return (meta.z_check_perm, meta.qubit_perm)

    @lru_cache(maxsize=None)
    def hgp_H(nv, seed):
        return biregular_hgp(nv, 3, 4, seed=seed,
                             compute_logicals=False).checks.z

    # (name, H(), qc_dims, qc_perms(), bsr, bsr_int8)
    none = lambda: None  # noqa: E731
    cases = [
        ("gross_144_12_12", gross_H, None, none, False, False),
        ("gross_144_12_12", gross_H, None, none, True, False),
        ("gross_144_12_12", gross_H, (12, 6), none, False, False),
    ] + [
        (f"hgp_{nv * nv + (nv * 3 // 4) ** 2}",
         (lambda nv=nv: hgp_H(nv, 42)), None, none, bsr, False)
        for nv in (12, 16, 20, 32, 36) for bsr in (False, True)
    ] + [
        ("qclp_1054_140", qclp_H, None, none, False, False),
        ("qclp_1054_140", qclp_H, (31,), none, False, False),
        ("qclp_1054_140", qclp_H, None, none, True, False),
        ("qclp_1054_140", qclp_H, None, none, False, True),
        ("cyclic_lp_4862", cyclic_H, None, none, False, False),
        # the 1332-monomial abelian LP exceeds the roll kernel's unroll
        # limit; its fast path is the BSR tile kernel (QC ordering improves
        # tile locality: 548 vs 692 tiles)
        ("cyclic_lp_4862", cyclic_H, None, cyc_perms, True, False),
        ("cyclic_lp_4862", cyclic_H, None, cyc_perms, False, True),
        # >=10k-qubit scale: (3,4)-HGP with nv=80 classical bits ->
        # n = 80^2 + 60^2 = 10000, 4800 Z checks, E = 33600.  The natural
        # HGP grid ordering is already tile-local; no extra permutation.
        ("hgp_10000", (lambda: hgp_H(80, 7)), None, none, True, False),
    ]

    from exp_ldpc_tpu.decoders.select import _QC_MAX_MONOMIALS

    out = []
    for name, make_H, qc_dims, make_perms, bsr, bsr_int8 in cases:
        tag = (f"{name}/" + ("bsr-int8" if bsr_int8 else "bsr" if bsr
                             else "qc" if qc_dims is not None else "base"))
        if args.only and args.only not in tag:
            continue
        H = make_H()
        if qc_dims is not None and (
                H.nnz // int(np.prod(qc_dims)) > _QC_MAX_MONOMIALS):
            continue
        rec = bench_code(
            name, H, shots=args.shots, iters=args.iters, p=args.p,
            reps_lo=4, reps_hi=16, qc_dims=qc_dims, qc_perms=make_perms(),
            bsr=bsr, bsr_int8=bsr_int8, shot_block=args.shot_block,
            loop_mode=args.loop_mode,
        )
        print(json.dumps(rec))
        out.append(rec)

    if args.write:
        path = "artifacts/bp_families_v5e.jsonl"
        # merge by (code, formulation-prefix): a filtered run refreshes its
        # own rows without discarding the rest of the artifact
        try:
            with open(path) as f:
                old = [json.loads(ln) for ln in f if ln.strip()]
        except FileNotFoundError:
            old = []

        def key(r):
            return (r["code"], r["formulation"].split("[")[0])

        new_keys = {key(r) for r in out}
        merged = [r for r in old if key(r) not in new_keys] + out
        with open(path, "w") as f:
            for rec in merged:
                f.write(json.dumps(rec) + "\n")


if __name__ == "__main__":
    main()
