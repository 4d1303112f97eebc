"""One-off experiment: f32 vs bf16 one-hot routing operands in the BP matmul
formulation, on the real chip.  Times a fixed-32-iteration min-sum loop over
scanned distinct batches (same methodology as bench.py) for (a) HGP-225 and
(b) its 4-round spacetime matrix."""
import time

import numpy as np
import jax
import jax.numpy as jnp

from exp_ldpc_tpu.codes.hgp import biregular_hgp
from exp_ldpc_tpu.decoders.bp import _build_dense_ops, _check_update_cm, priors_to_llr
from exp_ldpc_tpu.decoders.spacetime import SpacetimeCode
from exp_ldpc_tpu.decoders.tanner import TannerELL


def bench_case(name, H, shots=1024, iters=32, p=1e-3):
    H = H.tocsr()
    tanner = TannerELL.from_check_matrix(H)
    C, V, Dc = tanner.num_checks, tanner.num_vars, tanner.max_check_degree
    M, G, Hd, mask = _build_dense_ops(tanner)
    prior = jnp.asarray(priors_to_llr(np.full(V, p)))
    mask3 = jnp.asarray(mask)[:, :, None]
    rng = np.random.default_rng(0)

    def make(n_batches):
        errors = (rng.random((n_batches, shots, V)) < p).astype(np.uint8)
        return jnp.asarray(((errors @ H.toarray().T) % 2).astype(np.uint8).transpose(0, 2, 1))

    def build(dtype):
        Md = jax.device_put(M.astype(dtype))
        Gd = jax.device_put(G.astype(dtype))

        @jax.jit
        def run_many(synds):
            def one(carry, synd):
                synd_sign = 1.0 - 2.0 * synd.astype(jnp.float32)
                edge_prior = prior[np.asarray(tanner.chk_vars)]
                edge_prior = jnp.where(jnp.asarray(tanner.chk_mask), edge_prior, 1e9)
                v2c = jnp.broadcast_to(edge_prior[:, :, None], (C, Dc, shots))

                def step(it, v2c):
                    c2v = _check_update_cm(v2c, synd_sign, "ms", jnp.float32(0.625))
                    flat = c2v.reshape(C * Dc, shots).astype(dtype)
                    totals = jnp.dot(Md, flat, preferred_element_type=jnp.float32)
                    posterior = prior[:, None] + totals
                    back = jnp.dot(Gd, posterior.astype(dtype),
                                   preferred_element_type=jnp.float32)
                    return jnp.where(mask3, back.reshape(C, Dc, shots) - c2v, 1e9)

                v2c = jax.lax.fori_loop(0, iters, step, v2c)
                return carry + (v2c[0, 0] <= 0).sum(), None

            tot, _ = jax.lax.scan(one, jnp.int32(0), synds)
            return tot

        return run_many

    lo, hi = jax.device_put(make(4)), jax.device_put(make(20))
    for dtype in (jnp.float32, jnp.bfloat16):
        f = build(dtype)
        f(lo).block_until_ready(); f(hi).block_until_ready()
        tl = min(
            (lambda: (lambda t0: (f(lo).block_until_ready(), time.perf_counter() - t0)[1])(time.perf_counter()))()
            for _ in range(3)
        )
        th = min(
            (lambda: (lambda t0: (f(hi).block_until_ready(), time.perf_counter() - t0)[1])(time.perf_counter()))()
            for _ in range(3)
        )
        per_batch = (th - tl) / 16
        rate = iters * shots / per_batch
        flops = 2 * 2 * V * C * Dc * shots * iters / per_batch
        print(f"{name:26s} {np.dtype(dtype).name if dtype==jnp.float32 else 'bfloat16':9s} "
              f"{rate/1e6:8.1f}M iter*shots/s  {flops/1e12:6.1f} TFLOPS")


if __name__ == "__main__":
    code = biregular_hgp(12, 3, 4, seed=0, compute_logicals=False)
    Hz = code.checks.z
    bench_case("hgp225", Hz)
    st = SpacetimeCode(Hz, 4)
    bench_case("hgp225-spacetime-4r", st.spacetime_check_matrix)
