#!/usr/bin/env python
"""Time breakdown of the BSR kernel on the n=4862 cyclic LP, one chip.

Runs the fixed-iteration bf16 BSR kernel full, without the check update
("no_check" -> isolates the routing dots + onehot builds), and without the
routing ("no_route" -> isolates the VPU check update), with the
distinct-input slope-fit methodology.  Feeds the DESIGN.md roofline notes
and decides which cost center to attack for the >=5M iter*shots/s target.
"""
import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from exp_ldpc_tpu.codes.lifted import lifted_product_code_cyclic
    from exp_ldpc_tpu.decoders.bp import priors_to_llr
    from exp_ldpc_tpu.decoders.bp_bsr import BSRSchedule, bsr_bp_decode
    from exp_ldpc_tpu.decoders.tanner import TannerELL

    shots, iters, p = 1024, 32, 1e-3
    code = lifted_product_code_cyclic(q=22, m=1, w=14, r=5, seed=42,
                                      compute_logicals=False)
    from scipy import sparse as _sp
    H = _sp.csr_matrix(code.checks.z)
    meta = code.qc_meta
    if meta.z_check_perm is not None:
        H = H[np.asarray(meta.z_check_perm)]
    H = H[:, np.asarray(meta.qubit_perm)]
    tanner = TannerELL.from_check_matrix(H)
    sched = BSRSchedule.from_tanner(tanner)
    prior = jnp.asarray(priors_to_llr(np.full(tanner.num_vars, p)))
    rng = np.random.default_rng(0)

    def synds(R):
        # sparse product: the dense (R*shots, n) @ (n, r) uint8 matmul costs
        # minutes of host time at these sizes
        errors = (rng.random((R * shots, tanner.num_vars)) < p).astype(np.uint8)
        st = (H @ errors.T % 2).astype(np.uint8)
        return jnp.asarray(
            st.reshape(tanner.num_checks, R, shots).transpose(1, 0, 2))

    def build(ablate):
        @jax.jit
        def run_many(ss):
            def step(carry, synd):
                hard, _post, _conv, _it = bsr_bp_decode(
                    sched, prior, synd, "ms", iters, 0.625, False,
                    128, False, ablate)
                return carry + hard.sum(), None
            tot, _ = jax.lax.scan(step, jnp.int32(0), ss)
            return tot
        return run_many

    reps_lo, reps_hi = 4, 16
    los = [jax.device_put(synds(reps_lo)) for _ in range(3)]
    his = [jax.device_put(synds(reps_hi)) for _ in range(3)]

    def timed(r, xs):
        best = np.inf
        for x in xs:
            t0 = time.perf_counter()
            r(x).block_until_ready()
            best = min(best, time.perf_counter() - t0)
        return best

    for ablate in ("", "no_check", "no_route"):
        r = build(ablate)
        t0 = time.perf_counter()
        r(los[0]).block_until_ready()
        compile_s = time.perf_counter() - t0
        r(his[0]).block_until_ready()
        per = (timed(r, his) - timed(r, los)) / (reps_hi - reps_lo)
        print(json.dumps({
            "ablate": ablate or "full", "tiles": sched.num_tiles,
            "us_per_iter_128shots": per / iters / (shots // 128) * 1e6,
            "iter_shots_per_s": iters * shots / per,
            "compile_s": compile_s,
        }), flush=True)


if __name__ == "__main__":
    main()
