#!/usr/bin/env python
"""Measure the streamed spacetime BSR kernel on real hardware.

The round-5 composition (decoders/bp_bsr_spacetime.py): multi-round
spacetime decoding of LARGE codes on TPU — the workload the reference
handles only through serial Cython BP on the assembled spacetime matrix
(``misc/_experiment.py:62-83``) and that previously had no device kernel
here (r4 verdict missing item 1).

Timing protocol (CLAUDE.md): distinct syndromes per repeat, dispatch all,
one block_until_ready; TWO iteration budgets with a slope fit to separate
fixed dispatch/ramp cost from per-iteration cost.  Reports
spacetime-iteration*shots/s (one iteration = a full pass over all
rounds+1 blocks) and decoded shots/s at the standard 32-iteration budget.

  python scripts/bench_stbsr.py --only cyclic_lp_4862 --out artifacts/stbsr_v5e.jsonl
  python scripts/bench_stbsr.py --ler --out artifacts/stbsr_ler_v5e.jsonl
"""
import argparse
import json
import time
from functools import lru_cache

import numpy as np


@lru_cache(maxsize=None)
def _cyclic(logicals=False):
    from exp_ldpc_tpu.codes.lifted import lifted_product_code_cyclic

    return lifted_product_code_cyclic(
        q=22, m=1, w=14, r=5, seed=42, compute_logicals=logicals)


@lru_cache(maxsize=None)
def _hgp10000():
    from exp_ldpc_tpu.codes.hgp import biregular_hgp

    return biregular_hgp(80, 3, 4, seed=7, compute_logicals=False)


def bench_decode(name, H, rounds, shots, iters_lo, iters_hi, out):
    import jax
    import jax.numpy as jnp

    from exp_ldpc_tpu.decoders.bp_bsr_spacetime import SpacetimeBSRDecoder
    from exp_ldpc_tpu.decoders.spacetime import SpacetimeCode

    r, n = H.shape
    st = SpacetimeCode(H, rounds)
    Hst = st.spacetime_check_matrix.tocsr()
    n_st = Hst.shape[1]
    p = 1e-3

    def synd_batch(seed):
        # sparse spacetime matvec: the dense (n_st x rows) operator is
        # ~11 GB at n=10000 and would dominate the bench on the host
        rng = np.random.default_rng(seed)
        err = (rng.random((shots, n_st)) < p).astype(np.int64)
        return np.asarray((Hst @ err.T).T % 2).astype(np.uint8)

    dec = {}
    compile_s = {}
    for it in (iters_lo, iters_hi):
        dec[it] = SpacetimeBSRDecoder.from_check_matrix(
            H, rounds, error_rate=p, max_iter=it, bp_method="ms",
            ms_scaling_factor=0.625, early_stop=False)
        t0 = time.perf_counter()
        dec[it].decode_batch(synd_batch(999))  # compile + run once
        compile_s[it] = time.perf_counter() - t0

    # validity on the warmup batch of the hi-iters decoder
    sb = synd_batch(999)
    hard, _post, conv, _i = dec[iters_hi].decode_batch(sb)
    par = np.asarray((Hst @ hard.astype(np.int64).T).T % 2)
    ok = (par == sb).all(axis=1)
    assert (ok == conv).all(), "convergence flags are not honest"
    conv_frac = float(conv.mean())

    # timed repeats: distinct inputs, one device sync at the end
    reps = 6
    times = {}
    for it in (iters_lo, iters_hi):
        batches = [jnp.asarray(synd_batch(100 + k).T) for k in range(reps)]
        # decode_batch converts internally; call the jitted core directly
        d = dec[it]
        from exp_ldpc_tpu.decoders.bp_bsr_spacetime import stbsr_decode

        args = (d.sched, d.num_rounds, jnp.asarray(d.edge_prior),
                jnp.asarray(d.prior_t), jnp.asarray(d.mprior))
        kw = dict(method=d.method, max_iter=it,
                  ms_scaling_factor=float(d.ms_scaling_factor),
                  early_stop=False, shot_block=d.shot_block)
        stbsr_decode(*args, batches[0], **kw)[0].block_until_ready()  # warm
        t0 = time.perf_counter()
        outs = [stbsr_decode(*args, b, **kw) for b in batches]
        for o in outs:
            o[0].block_until_ready()
        times[it] = (time.perf_counter() - t0) / reps

    d_iters = iters_hi - iters_lo
    per_iter_s = (times[iters_hi] - times[iters_lo]) / d_iters
    iter_shots_s = shots / per_iter_s
    shots_s_32 = shots / (times[iters_lo] + per_iter_s * (32 - iters_lo))

    rec = {
        "bench": "stbsr", "code": name, "n": n, "r": r, "rounds": rounds,
        "n_spacetime": n_st, "shots": shots,
        "tiles": dec[iters_hi].sched.num_tiles,
        "shot_block": dec[iters_hi].shot_block,
        "iters_lo": iters_lo, "iters_hi": iters_hi,
        "t_lo_s": times[iters_lo], "t_hi_s": times[iters_hi],
        "per_iter_ms": per_iter_s * 1e3,
        "iter_shots_per_s": iter_shots_s,
        "decoded_shots_per_s_at32": shots_s_32,
        "compile_s_lo": compile_s[iters_lo], "compile_s_hi": compile_s[iters_hi],
        "conv_frac_warmup": conv_frac, "p": p,
    }
    print(json.dumps(rec), flush=True)
    if out:
        with open(out, "a") as f:
            f.write(json.dumps(rec) + "\n")


def ler_sanity(out, shots=2048, rounds=8):
    """Small pheno LER curve on the n=4862 code through the full composed
    device chain: device Pauli-frame sampler -> differenced spacetime
    syndromes -> streamed spacetime BSR decode -> final correction ->
    logical test.  Plain-BP decisions (unconverged counted and reported);
    asserts LER monotone in p."""
    import jax
    import numpy as np

    from exp_ldpc_tpu.circuits.noise import depolarizing_noise
    from exp_ldpc_tpu.circuits.storage_sim import build_storage_simulation
    from exp_ldpc_tpu.decoders.bp_bsr_spacetime import SpacetimeBSRDecoder
    from exp_ldpc_tpu.decoders.spacetime import SpacetimeCode
    from exp_ldpc_tpu.sampler.device import DeviceSampler

    code = _cyclic(logicals=True)
    Hz = code.checks.z
    r, n = Hz.shape
    st = SpacetimeCode(Hz, rounds)
    Lz = np.asarray(code.logicals.z, dtype=np.int64)
    x_count = code.checks.x.shape[0]
    mpr = x_count + r

    lers = []
    for i, p in enumerate([3e-4, 6e-4, 1.2e-3]):
        sim = build_storage_simulation(
            rounds, depolarizing_noise(p, p), code)
        sampler = DeviceSampler(sim.circuit, shots=shots)
        rec_b = np.asarray(sampler.sample(jax.random.PRNGKey(10 + i)))
        hist = rec_b[:, : mpr * rounds].reshape(shots, rounds, mpr)[
            :, :, x_count:].astype(np.int64)
        readout = rec_b[:, mpr * rounds: mpr * rounds + n].astype(np.int64)
        synd = st.syndrome_from_history_batch(hist, readout)
        dec = SpacetimeBSRDecoder.from_check_matrix(
            Hz, rounds, channel_probs=np.concatenate([
                np.full((rounds + 1) * n, 2 / 3 * p),
                np.full(rounds * r, 2 / 3 * p)]),
            max_iter=64, bp_method="ms", ms_scaling_factor=0.625,
            early_stop=True)
        t0 = time.perf_counter()
        hard, _post, conv, iters = dec.decode_batch(synd)
        dt = time.perf_counter() - t0
        corr = st.final_correction(hard)
        corrected = (readout + corr) % 2
        fails = int((((corrected @ Lz.T) % 2) != 0).any(axis=1).sum())
        rec_out = {
            "bench": "stbsr_ler", "code": "cyclic_lp_4862", "rounds": rounds,
            "p": p, "shots": shots, "failures": fails, "ler": fails / shots,
            "bp_unconverged": int((~conv).sum()), "iters": int(iters[0]),
            "decode_walltime_s": dt,
        }
        lers.append(fails / shots)
        print(json.dumps(rec_out), flush=True)
        if out:
            with open(out, "a") as f:
                f.write(json.dumps(rec_out) + "\n")
    assert lers == sorted(lers), f"LER not monotone: {lers}"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", type=str, default=None)
    ap.add_argument("--rounds", type=int, default=8)
    ap.add_argument("--shots", type=int, default=128)
    ap.add_argument("--iters", type=str, default="8,32",
                    help="lo,hi iteration budgets for the slope fit")
    ap.add_argument("--ler", action="store_true",
                    help="run the LER sanity chain instead of throughput")
    ap.add_argument("--ler-shots", type=int, default=2048)
    ap.add_argument("--out", type=str, default=None)
    args = ap.parse_args()

    if args.ler:
        ler_sanity(args.out, shots=args.ler_shots, rounds=args.rounds)
        return

    lo, hi = (int(x) for x in args.iters.split(","))
    cases = {
        "cyclic_lp_4862": lambda: _cyclic().checks.z,
        "hgp_10000": lambda: _hgp10000().checks.z,
    }
    for name, getH in cases.items():
        if args.only and args.only != name:
            continue
        bench_decode(name, getH(), args.rounds, args.shots, lo, hi, args.out)


if __name__ == "__main__":
    main()
