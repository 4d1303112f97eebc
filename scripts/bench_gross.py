#!/usr/bin/env python
"""Gross-code [[144,12,12]] memory benchmark on one chip.

The standard production-scale BB-code benchmark (arXiv:2308.07915 memory
experiment): N rounds of syndrome extraction on the gross code, fused
sample+decode on device (structured spacetime BP, bf16 messages), sweeping
the physical error rate.  Writes one JSON line per point.

  python scripts/bench_gross.py --samples 20000 --rounds 12
"""
import argparse
import json
import sys
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--samples", type=int, default=20000)
    ap.add_argument("--rounds", type=int, default=12)
    ap.add_argument("--p-grid", type=str, default="(1e-3,5e-3,4)")
    ap.add_argument("--max-iter", type=int, default=60)
    ap.add_argument("--msg-dtype", type=str, default="bfloat16")
    args = ap.parse_args()

    import jax

    from exp_ldpc_tpu.circuits.noise import depolarizing_noise
    from exp_ldpc_tpu.codes.bivariate_bicycle import gross_code
    from exp_ldpc_tpu.experiments.p_sweep import parse_sweep_spec
    from exp_ldpc_tpu.parallel.pipeline import StorageDecodePipeline

    lo, hi, pts = parse_sweep_spec(args.p_grid)
    p_grid = np.geomspace(lo, hi, pts)

    code = gross_code(compute_logicals=True)
    pipe = None
    for i, p in enumerate(p_grid):
        p = float(p)
        if pipe is None:
            pipe = StorageDecodePipeline(
                code=code, rounds=args.rounds, noise_model=depolarizing_noise(p, p),
                data_prior=2 / 3 * p, meas_prior=2 / 3 * p,
                shots_per_device=args.samples, max_iter=args.max_iter,
                bp_method="ms", ms_scaling_factor=0.625, msg_dtype=args.msg_dtype)
            pipe.run(jax.random.PRNGKey(0))  # compile once for the whole grid
        else:
            pipe.rebind_noise(depolarizing_noise(p, p), 2 / 3 * p, 2 / 3 * p)
        t0 = time.perf_counter()
        fails, shots, unconv = pipe.run(jax.random.PRNGKey(500 + i))
        dt = time.perf_counter() - t0
        print(json.dumps({
            "code": "gross_144_12_12", "rounds": args.rounds, "p_ph": p,
            "failures": fails, "samples": shots, "ler": fails / shots,
            "ler_per_round": 1 - (1 - fails / shots) ** (1 / args.rounds),
            "bp_unconverged": unconv, "walltime": dt,
            "shots_per_s": shots / dt,
        }, default=float), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
