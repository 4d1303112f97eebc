#!/usr/bin/env python
"""Check-partition sharded BSR measurement on one real chip.

For a large code, measures the per-iteration wall time of:

  * the unsharded FUSED BSR kernel (the single-chip production path) —
    the reference line;
  * the sharded per-iteration split program (decoders/bp_bsr_shard.py) in
    single-device EMULATION mode for D in {1, 2, 4}: all D shard kernels
    run sequentially on the one chip, psum replaced by an in-order sum.
    This measures the complete multi-chip COMPUTE path (split kernels,
    HBM message round-trips, posterior/partials traffic, XLA glue) —
    everything except the ICI psum, whose byte count is deterministic and
    reported alongside.

Projection model (stated, not hidden): a D-chip decode's per-iteration
time is emulated_slope(D)/D + psum_bytes/BW_allreduce.  psum_bytes per
chip per iteration for a (V_pad, S) f32 ring all-reduce is
2*(D-1)/D * 4*V_pad*S.  Rates are reported at BW = 100 GB/s effective
(conservative; v5e ICI is 2x400G links per axis) and the raw numbers are
in the artifact so any other BW can be substituted.

Timing follows CLAUDE.md: distinct input batches per repeat, two
iteration counts, slope fit to cancel dispatch overhead and transfers.

  python scripts/bench_bsr_shard.py --code hgp625 --shards 1,2
  python scripts/bench_bsr_shard.py --code cyclic4862 --shards 1,2,4 --write
"""
import argparse
import json
import time

import numpy as np


def build_code(name):
    from exp_ldpc_tpu.codes.hgp import biregular_hgp
    from exp_ldpc_tpu.codes.lifted import lifted_product_code_cyclic

    if name == "hgp625":
        H = biregular_hgp(20, 3, 4, seed=1, compute_logicals=False).checks.z
        return H, None
    if name == "hgp10000":
        H = biregular_hgp(80, 3, 4, seed=7, compute_logicals=False).checks.z
        return H, None
    if name == "cyclic4862":
        code = lifted_product_code_cyclic(
            q=22, m=1, w=14, r=5, seed=42, compute_logicals=False)
        meta = code.qc_meta
        H = code.checks.z
        # QC ordering improves tile locality (548 vs 692 tiles)
        H = H[meta.z_check_perm][:, meta.qubit_perm]
        return H, None
    raise ValueError(name)


def slope_time(run_many, make_batch, reps_lo, reps_hi, nrep=3):
    """Per-decode slope over on-device repeat counts (bench_large_codes
    methodology): `run_many(ss)` scans the leading axis of ``ss`` on device
    in ONE dispatch, so the fixed tunnel overhead (~30-100 ms/call) cancels
    in (T_hi - T_lo)/(reps_hi - reps_lo).  Distinct inputs per sample —
    the remote backend deduplicates identical dispatches (CLAUDE.md)."""
    import jax

    los = [jax.device_put(make_batch(reps_lo)) for _ in range(nrep)]
    his = [jax.device_put(make_batch(reps_hi)) for _ in range(nrep)]
    t0 = time.perf_counter()
    run_many(los[0])
    compile_s = time.perf_counter() - t0
    run_many(his[0])

    def best(xs):
        b = np.inf
        for x in xs:
            t0 = time.perf_counter()
            run_many(x)
            b = min(b, time.perf_counter() - t0)
        return b

    t_lo, t_hi = best(los), best(his)
    return (t_hi - t_lo) / (reps_hi - reps_lo), compile_s


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--code", default="hgp625")
    ap.add_argument("--shards", default="1,2")
    ap.add_argument("--shots", type=int, default=1024)
    ap.add_argument("--iters", type=int, default=32)
    ap.add_argument("--reps-lo", type=int, default=4)
    ap.add_argument("--reps-hi", type=int, default=16)
    ap.add_argument("--p", type=float, default=1e-3)
    ap.add_argument("--skip-fused", action="store_true")
    ap.add_argument("--write", action="store_true",
                    help="append to artifacts/bsr_shard_v5e.jsonl")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from scipy import sparse

    from exp_ldpc_tpu.decoders.bp import priors_to_llr
    from exp_ldpc_tpu.decoders.bp_bsr import (
        BSRSchedule, bsr_bp_decode, _auto_shot_block)
    from exp_ldpc_tpu.decoders.bp_bsr_shard import (
        ShardedBSR, ShardedBSRDecoder, _auto_shot_block_shard)
    from exp_ldpc_tpu.decoders.tanner import TannerELL

    H, _ = build_code(args.code)
    Hs = sparse.csr_matrix(H)
    C, V = Hs.shape
    rng = np.random.default_rng(0)
    S = args.shots
    iters = args.iters

    def synds(R, shape_fn):
        err = (rng.random((R * S, V)) < args.p).astype(np.uint8)
        st = (Hs @ err.T % 2).astype(np.uint8)  # (C, R*S)
        return shape_fn(st.reshape(C, R, S))

    recs = []

    # ---- unsharded fused reference ----
    if not args.skip_fused:
        tanner = TannerELL.from_check_matrix(Hs)
        sched = BSRSchedule.from_tanner(tanner)
        prior = jnp.asarray(priors_to_llr(np.full(V, args.p)))
        sblk = _auto_shot_block(sched)

        @jax.jit
        def run_fused_many(ss):  # (R, C, S)
            def step(carry, synd):
                _h, _p, c, _i = bsr_bp_decode(
                    sched, prior, synd, "ms", iters, 0.625, False, sblk)
                return carry + c.sum(), None
            tot, _ = jax.lax.scan(step, jnp.int32(0), ss)
            return tot

        per_decode, compile_s = slope_time(
            lambda ss: np.asarray(run_fused_many(ss)),
            lambda R: synds(R, lambda st: st.transpose(1, 0, 2)),
            args.reps_lo, args.reps_hi)
        rec = {
            "code": args.code, "n": V, "checks": C, "config": "fused",
            "tiles": sched.num_tiles, "shots": S, "iters": iters,
            "shot_block": sblk,
            "per_iter_s": per_decode / iters,
            "iter_shots_per_s": iters * S / per_decode,
            "compile_s": compile_s,
        }
        print(json.dumps(rec), flush=True)
        recs.append(rec)

    # ---- sharded emulation ----
    for D in [int(x) for x in args.shards.split(",")]:
        sb = ShardedBSR.from_check_matrix(Hs, D)
        if sb.num_shards != D or sb.c_pad_loc * D < C:
            print(json.dumps({"code": args.code, "config": f"shard{D}",
                              "skipped": "not enough check chunks"}))
            continue
        prior_llr = priors_to_llr(np.full(V, args.p))
        sblk = _auto_shot_block_shard(sb, S)
        dec = ShardedBSRDecoder(
            sharded=sb, prior_llr=prior_llr, method="ms",
            max_iter=iters, shot_block=sblk)
        run1 = dec._build_emulated(S)

        @jax.jit
        def run_shard_many(ss, run1=run1):  # (R, D, c_pad_loc, S)
            def step(carry, synd):
                _h, _p, conv = run1(synd, jnp.int32(iters))
                return carry + conv.sum(), None
            tot, _ = jax.lax.scan(step, jnp.int32(0), ss)
            return tot

        def to_shard_layout(st, sb=sb):  # (C, R, S) -> (R, D, c_pad_loc, S)
            R = st.shape[1]
            flat = np.zeros((sb.num_shards * sb.c_pad_loc, R, S), np.uint8)
            flat[:C] = st
            return flat.reshape(sb.num_shards, sb.c_pad_loc, R, S
                                ).transpose(2, 0, 1, 3)

        per_decode, compile_s = slope_time(
            lambda ss: np.asarray(run_shard_many(ss)),
            lambda R: synds(R, to_shard_layout),
            args.reps_lo, args.reps_hi)
        per_iter = per_decode / iters
        v_pad = sb.v_pad
        psum_bytes = 2 * (D - 1) / D * 4 * v_pad * S
        bw = 100e9
        t_chip = per_iter / D + psum_bytes / bw
        rec = {
            "code": args.code, "n": V, "checks": C, "config": f"shard{D}",
            "tiles_per_shard": [s.num_tiles for s in sb.shards],
            "shots": S, "iters": iters, "shot_block": sblk,
            "per_iter_s_all_shards": per_iter,
            "per_iter_s_per_shard": per_iter / D,
            "iter_shots_per_s_equiv": iters * S * 1.0 / per_decode,
            "psum_bytes_per_chip_per_iter": psum_bytes,
            "projected_aggregate_iter_shots_per_s_at_100GBs": S / t_chip,
            "projected_per_chip_iter_shots_per_s_at_100GBs": S / t_chip / D,
            "compile_s": compile_s,
        }
        print(json.dumps(rec), flush=True)
        recs.append(rec)

    if args.write:
        with open("artifacts/bsr_shard_v5e.jsonl", "a") as f:
            for r in recs:
                f.write(json.dumps(r) + "\n")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
