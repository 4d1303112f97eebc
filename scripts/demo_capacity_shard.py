#!/usr/bin/env python
"""Capacity demonstration: decode a code NO single-kernel BSR path can run.

A (3,4)-HGP with nv=160 classical bits gives n = 160^2 + 120^2 = 40,000
qubits, 19,200 Z checks, ~134k edges, ~3.3k BSR tiles.  At that tile count
the fused kernel's materialized one-hot scratch alone (~108 MiB bf16)
exceeds the VMEM budget (`fits_bsr` rejects it), and the dynamic-loop
hatch allocates the same scratch unconditionally, so it cannot run either.
Check-partition sharding is the ONLY BSR-family path: each shard's tiles,
messages and one-hots fit VMEM, while the replicated (V_pad, S) posterior
streams per call.

This script builds the D-shard decoder, decodes a batch on the real chip
(single-device emulation mode — the same kernels a real D-chip mesh would
run), validates converged decisions against the host H matrix and exact
weight-1 corrections, times the per-iteration cost, and appends a row to
``artifacts/bsr_shard_capacity_v5e.jsonl``.

  python scripts/demo_capacity_shard.py --shards 8 --shots 128
"""
import argparse
import json
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nv", type=int, default=160)
    ap.add_argument("--shards", type=int, default=0,
                    help="0 = auto (decoders.bp_bsr_shard.auto_num_shards)")
    ap.add_argument("--shots", type=int, default=128)
    ap.add_argument("--iters", type=int, default=32)
    ap.add_argument("--p", type=float, default=5e-4)
    ap.add_argument("--write", action="store_true")
    args = ap.parse_args()

    from scipy import sparse

    from exp_ldpc_tpu.codes.hgp import biregular_hgp
    from exp_ldpc_tpu.decoders.bp_bsr import fits_bsr
    from exp_ldpc_tpu.decoders.bp_bsr_shard import (
        ShardedBSR, ShardedBSRDecoder, auto_num_shards)
    from exp_ldpc_tpu.decoders.tanner import TannerELL

    t0 = time.time()
    code = biregular_hgp(args.nv, 3, 4, seed=11, compute_logicals=False)
    H = sparse.csr_matrix(code.checks.z)
    C, V = H.shape
    build_code_s = time.time() - t0
    if not args.shards:
        args.shards = auto_num_shards(H)
        print(f"auto shard count: {args.shards}", flush=True)

    tanner = TannerELL.from_check_matrix(H)
    single_kernel_ok = fits_bsr(tanner)

    t0 = time.time()
    sb = ShardedBSR.from_check_matrix(H, args.shards)
    build_sched_s = time.time() - t0
    tiles = [s.num_tiles for s in sb.shards]
    print(f"n={V} C={C} E={H.nnz} tiles/shard={tiles} "
          f"(total {sum(tiles)}), fused fits_bsr={single_kernel_ok}",
          flush=True)

    from exp_ldpc_tpu.decoders.bp import priors_to_llr

    dec = ShardedBSRDecoder(
        sharded=sb, prior_llr=priors_to_llr(np.full(V, args.p)),
        method="ms", max_iter=args.iters)

    rng = np.random.default_rng(3)
    S = args.shots
    err = (rng.random((S, V)) < args.p).astype(np.uint8)
    synd = np.asarray((H @ err.T % 2).astype(np.uint8).T)

    t0 = time.time()
    hard, _post, conv = dec.decode_batch(synd)
    compile_and_first_s = time.time() - t0

    # ---- validation on host ----
    ok = np.asarray((H @ hard.T % 2).astype(np.uint8).T == synd).all(axis=1)
    conv = np.asarray(conv)
    assert (ok[conv]).all(), "converged shot violates its syndrome"
    exact = (hard == err).all(axis=1)
    print(f"converged {int(conv.sum())}/{S}, exact recovery "
          f"{int(exact.sum())}/{S}", flush=True)

    # weight-1 errors decode exactly
    sites = rng.choice(V, size=32, replace=False)
    e1 = np.zeros((32, V), np.uint8)
    e1[np.arange(32), sites] = 1
    s1 = np.asarray((H @ e1.T % 2).astype(np.uint8).T)
    # pad to the decoder's batch shape to reuse the compiled program
    s1p = np.zeros_like(synd)
    s1p[:32] = s1
    h1, _p1, c1 = dec.decode_batch(s1p)
    assert np.asarray(c1)[:32].all() and (np.asarray(h1)[:32] == e1).all(), \
        "weight-1 errors must decode exactly"
    print("weight-1 exact: 32/32", flush=True)

    # ---- per-iteration slope (distinct batches, warm program) ----
    def batch():
        e = (rng.random((S, V)) < args.p).astype(np.uint8)
        return np.asarray((H @ e.T % 2).astype(np.uint8).T)

    def timed(n_iter, xs):
        b = np.inf
        for x in xs:
            t0 = time.perf_counter()
            dec.decode_batch(x, max_iter=n_iter)
            b = min(b, time.perf_counter() - t0)
        return b

    los = [batch() for _ in range(3)]
    his = [batch() for _ in range(3)]
    timed(4, los[0:1]); timed(64, his[0:1])  # warm both... same program
    per_iter = (timed(64, his) - timed(4, los)) / 60
    rec = {
        "n": V, "checks": C, "edges": int(H.nnz), "shards": args.shards,
        "tiles_per_shard": tiles, "shots": S,
        "fused_fits": bool(single_kernel_ok),
        "per_iter_s_all_shards": per_iter,
        "iter_shots_per_s_equiv": S / per_iter if per_iter > 0 else None,
        "converged_frac": float(conv.mean()),
        "build_code_s": build_code_s, "build_sched_s": build_sched_s,
        "compile_and_first_decode_s": compile_and_first_s,
    }
    print(json.dumps(rec), flush=True)
    if args.write:
        with open("artifacts/bsr_shard_capacity_v5e.jsonl", "a") as f:
            f.write(json.dumps(rec) + "\n")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
