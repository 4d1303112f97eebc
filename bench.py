"""Benchmark: BP decode throughput on the (3,4) HGP-225 code, one chip.

Prints ONE JSON line:
  {"metric": "bp_iter_shots_per_s_per_chip", "value": N, "unit": "iter*shots/s",
   "vs_baseline": N / 1e7}

The baseline denominator is the BASELINE.json north-star target of >= 10M BP
iterations*shots/s/chip (the reference publishes no numbers of its own —
BASELINE.md).  Measured as a fixed-32-iteration min-sum batched decode
(batch 1024, p = 1e-3 syndromes) with warmup, averaged over repeats.

Methodology notes: each repeat decodes a DISTINCT syndrome batch (identical
repeated calls can be deduplicated by remote-execution backends and would
overstate throughput); all repeats are dispatched before a single
block_until_ready so per-call host->device round-trip latency amortizes the
way it does in a real Monte-Carlo sweep.
"""
import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from exp_ldpc_tpu.codes.hgp import biregular_hgp
    from exp_ldpc_tpu.decoders.bp import _bp_core, priors_to_llr
    from exp_ldpc_tpu.decoders.tanner import TannerELL

    shots = 1024
    iters = 32
    p = 1e-3
    reps = 32

    code = biregular_hgp(12, 3, 4, seed=0, compute_logicals=False)
    Hz = code.checks.z
    tanner = TannerELL.from_check_matrix(Hz)
    prior = jnp.asarray(priors_to_llr(np.full(Hz.shape[1], p)))
    Hz_dense = Hz.T.toarray()

    rng = np.random.default_rng(0)

    def make_syndromes():
        errors = (rng.random((shots, Hz.shape[1])) < p).astype(np.uint8)
        return jnp.asarray(((errors @ Hz_dense) % 2).astype(np.uint8).T)  # (C, S)

    @jax.jit
    def run(synd):
        hard, _post, _conv, _it = _bp_core(
            tanner, prior, synd, "ms", iters, jnp.float32(0.625), False
        )
        return hard.sum()  # tiny device->host transfer per call

    synds = [jax.device_put(make_syndromes()) for _ in range(reps)]

    # warmup/compile
    run(synds[0]).block_until_ready()

    t0 = time.perf_counter()
    outs = [run(s) for s in synds]
    jax.block_until_ready(outs)
    dt = (time.perf_counter() - t0) / reps

    value = iters * shots / dt
    print(
        json.dumps(
            {
                "metric": "bp_iter_shots_per_s_per_chip",
                "value": value,
                "unit": "iter*shots/s",
                "vs_baseline": value / 1e7,
            }
        )
    )


if __name__ == "__main__":
    main()
