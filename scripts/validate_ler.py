#!/usr/bin/env python
"""Logical-error-rate validation sweep on real hardware.

Runs the fused on-device Monte-Carlo pipeline (device Pauli-frame sampler +
batched spacetime BP) for the flagship HGP-225 code across a p grid, and
cross-checks grid points against independent host chains within binomial
error bars.

Decode modes (reference default is bposd, ``misc/p_sweep.py:63``):

  --decode bp     plain spacetime min-sum BP; unconverged shots are
                  hard-decisioned.  Cross-check: CPU oracle sampler through
                  the SAME decode program (isolates the samplers).
  --decode bposd  device BP + host OSD redecode of every BP-unconverged
                  shot (the reference's OSD-only-on-BP-failures contract,
                  ``misc/_experiment.py:62-83``).  Cross-check: CPU oracle
                  sampler through the INDEPENDENT host driver chain
                  (``decoders/drivers.py`` BPOSDCorrect — host BP+OSD on
                  every shot), so it exercises sampler AND decoder.

Writes one JSON line per point; use --out to append JSONL records.

  python scripts/validate_ler.py --samples 100000 --decode bposd
"""
import argparse
import json
import sys
import time

import numpy as np


def wilson_interval(k, n, z=2.0):
    if n == 0:
        return (0.0, 1.0)
    p = k / n
    denom = 1 + z * z / n
    center = (p + z * z / (2 * n)) / denom
    half = z * np.sqrt(p * (1 - p) / n + z * z / (4 * n * n)) / denom
    return (max(0.0, center - half), min(1.0, center + half))


def split_record(pipe, record):
    """(S, M) sampler record -> (history (S, rounds, r), readout (S, n)),
    mirroring the device pipeline's record layout (per round
    [x_checks..., z_checks...], then the transversal data readout)."""
    S = record.shape[0]
    mpr = pipe.x_count + pipe.z_count
    blk = 0 if pipe.use_x_logicals else pipe.x_count
    r = pipe.x_count if pipe.use_x_logicals else pipe.z_count
    rounds = pipe.rounds
    readout = record[:, mpr * rounds: mpr * rounds + pipe.num_data]
    if rounds > 0:
        per_round = record[:, : mpr * rounds].reshape(S, rounds, mpr)
        history = per_round[:, :, blk: blk + r]
    else:
        history = np.zeros((S, 0, r), dtype=record.dtype)
    return history.astype(np.int64), readout.astype(np.int64)


def host_driver_failures(pipe, seed, shots):
    """Fully-independent host chain: CPU oracle sampler -> host BP+OSD
    driver (BPOSDCorrect) on EVERY shot -> logical-failure count."""
    from exp_ldpc_tpu.sampler.reference import FrameSampler

    fs = FrameSampler(pipe.storage_sim.circuit, seed=seed)
    record = fs.sample(shots)
    history, readout = split_record(pipe, np.asarray(record))
    corrector = pipe._osd if pipe._osd is not None else pipe._build_osd_corrector()
    corr = np.asarray(corrector.readout_correction_batch(history, readout),
                      dtype=np.int64)
    corrected = (readout + corr) % 2
    flips = (corrected @ np.asarray(pipe._Lz, dtype=np.int64).T) % 2
    return int(np.any(flips != 0, axis=1).sum()), shots


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--samples", type=int, default=20000)
    ap.add_argument("--batch-shots", type=int, default=0,
                    help="shots per fused device call (0 = all of --samples "
                         "in one call); large campaigns loop the one "
                         "compiled program over ceil(samples/batch) "
                         "independent PRNG keys")
    ap.add_argument("--rounds", type=int, default=4)
    ap.add_argument("--p-grid", type=str, default="(1e-3,8e-3,5)")
    ap.add_argument("--max-iter", type=int, default=48)
    ap.add_argument("--tier1-iters", type=int, default=0,
                    help="two-tier adaptive decode: stage-1 iteration "
                         "budget for every shot; unconverged shots "
                         "redecode at --max-iter (0 = single fixed tier)")
    ap.add_argument("--decode", choices=("bp", "bposd"), default="bp")
    ap.add_argument("--osd-cap", type=int, default=0,
                    help="per-device cap on shots shipped to the host OSD "
                         "redecode (0 = auto: 1/4 of the device batch)")
    ap.add_argument("--crosscheck-samples", type=int, default=2000)
    ap.add_argument("--crosscheck-points", type=int, default=1,
                    help="cross-check the top-N grid points against the "
                         "host oracle sampler")
    ap.add_argument("--skip-crosscheck", action="store_true")
    ap.add_argument("--noise", choices=("pheno", "circuit"), default="pheno",
                    help="pheno = depolarizing data noise + measurement "
                         "flips; circuit = DEPOLARIZE2 after 2q gates + "
                         "idle DEPOLARIZE1 + measurement flips")
    ap.add_argument("--out", type=str, default=None,
                    help="append JSONL records to this file")
    args = ap.parse_args()

    import jax

    from exp_ldpc_tpu.circuits.noise import circuit_noise, depolarizing_noise
    from exp_ldpc_tpu.codes.hgp import biregular_hgp
    from exp_ldpc_tpu.experiments.p_sweep import parse_sweep_spec
    from exp_ldpc_tpu.parallel.pipeline import StorageDecodePipeline

    make_noise = circuit_noise if args.noise == "circuit" else depolarizing_noise

    lo, hi, pts = parse_sweep_spec(args.p_grid)
    p_grid = np.geomspace(lo, hi, pts)

    code = biregular_hgp(12, 3, 4, seed=0, compute_logicals=True)
    if args.noise == "circuit":
        # depth-aware data prior: every data qubit sees ~(x_steps + z_steps)
        # 2q-gate slots per round, each a DEPOLARIZE2 fault location
        steps = max(int(code.checks.x.sum(axis=0).max()),
                    int(code.checks.x.sum(axis=1).max())) + max(
                        int(code.checks.z.sum(axis=0).max()),
                        int(code.checks.z.sum(axis=1).max()))
        priors = lambda p: (p * steps, p)  # noqa: E731
    else:
        priors = lambda p: (2 / 3 * p, 2 / 3 * p)  # noqa: E731
    batch = args.batch_shots or args.samples
    n_calls = -(-args.samples // batch)
    osd_cap = 0
    if args.decode == "bposd":
        osd_cap = args.osd_cap or max(256, batch // 4)
        osd_cap = min(osd_cap, batch)
    results = []
    pipe = None
    for i, p in enumerate(p_grid):
        dp, mp = priors(p)
        if pipe is None:
            pipe = StorageDecodePipeline(
                code=code, rounds=args.rounds, noise_model=make_noise(p, p),
                data_prior=dp, meas_prior=mp,
                shots_per_device=batch, max_iter=args.max_iter,
                bp_method="ms", ms_scaling_factor=0.625,
                osd_fallback_cap=osd_cap, tier1_iters=args.tier1_iters)
        else:
            # one compile serves the whole grid: only probability values change
            pipe.rebind_noise(make_noise(p, p), dp, mp)
        t0 = time.perf_counter()
        fails = shots = unconv = 0
        for j in range(n_calls):
            # fold_in keeps per-call keys collision-free for any n_calls
            # (a fixed stride would wrap between adjacent grid points)
            key = jax.random.fold_in(jax.random.PRNGKey(100 + i), j)
            f, s, u = pipe.run(key)
            fails, shots, unconv = fails + f, shots + s, unconv + u
        dt = time.perf_counter() - t0
        low, high = wilson_interval(fails, shots)
        rec = {
            "noise": args.noise, "decode": args.decode,
            "p_ph": float(p), "failures": fails, "samples": shots,
            "ler": fails / shots, "ler_ci_low": low, "ler_ci_high": high,
            ("osd_decoded" if args.decode == "bposd" else "bp_unconverged"):
                unconv,
            "walltime": dt,
        }
        results.append(rec)
        print(json.dumps(rec, default=float), flush=True)

    # monotonicity sanity: LER should rise with p (within CI overlap)
    lers = [r["ler"] for r in results]
    if not all(lers[i] <= results[i + 1]["ler_ci_high"] + 1e-12
               for i in range(len(lers) - 1)):
        print("WARNING: LER not monotone within CI", file=sys.stderr)

    checks = []
    if not args.skip_crosscheck:
        for k in range(min(args.crosscheck_points, len(p_grid))):
            idx = len(p_grid) - 1 - k
            p = float(p_grid[idx])
            n = args.crosscheck_samples
            dp, mp = priors(p)
            pipe.rebind_noise(make_noise(p, p), dp, mp)
            if args.decode == "bposd":
                # independent chain: CPU sampler + host BP+OSD driver
                fails_host, n = host_driver_failures(pipe, seed=999 + k,
                                                     shots=n)
                chain = "host-sampler+BPOSDCorrect"
            else:
                # identical decode program, records from the independent CPU
                # oracle sampler: a statistical gap isolates to the samplers
                fails_host, n, _u = pipe.run_host_sampled(seed=999 + k, shots=n)
                chain = "host-sampler+device-decode"
            dev = results[idx]
            # pooled two-proportion z-test at 2 sigma
            f1, n1 = dev["failures"], dev["samples"]
            pool = (f1 + fails_host) / (n1 + n)
            sigma = np.sqrt(pool * (1 - pool) * (1 / n1 + 1 / n))
            gap = abs(f1 / n1 - fails_host / n)
            rec = {"noise": args.noise, "decode": args.decode,
                   "crosscheck_p": p, "crosscheck_chain": chain,
                   "host_failures": fails_host, "host_samples": n,
                   "device_ler": f1 / n1, "host_ler": fails_host / n,
                   "gap": gap, "two_sigma": 2 * sigma,
                   "agree": bool(gap <= 2 * sigma)}
            checks.append(rec)
            print(json.dumps(rec, default=float), flush=True)

    if args.out:
        with open(args.out, "a") as f:
            for r in results + checks:
                f.write(json.dumps(r, default=float) + "\n")
    return 0 if all(c["agree"] for c in checks) else 1


if __name__ == "__main__":
    sys.exit(main())
