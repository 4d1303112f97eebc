"""Experiment: message dtype (f32 vs bf16) in the structured spacetime BP.

The spacetime check update is HBM-bandwidth-bound (elementwise passes over
the (B, r, Dc+2, S) message tensor dominate; the per-round matmuls are small)
— bf16 messages halve the streamed bytes.  Accumulations stay f32
(preferred_element_type).  Fixed-32-iteration min-sum, slope-fit timing."""
import os
import time

import numpy as np
import jax
import jax.numpy as jnp

from exp_ldpc_tpu.codes.hgp import biregular_hgp
from exp_ldpc_tpu.decoders.bp import _build_dense_ops, priors_to_llr
from exp_ldpc_tpu.decoders.spacetime import SpacetimeCode
from exp_ldpc_tpu.decoders.tanner import TannerELL

SHOTS, ITERS, P = 1024, 32, 1e-3
ROUNDS = int(os.environ.get("ST_ROUNDS", 4))
_BIG = 1e30


def build(tanner, R, prior_llr_st, dtype):
    B = R + 1
    r, n, Dc = tanner.num_checks, tanner.num_vars, tanner.max_check_degree
    M, G, Hd, mask = _build_dense_ops(tanner)
    M = jax.device_put(M.astype(dtype))
    G = jax.device_put(G.astype(dtype))
    mask4 = jnp.asarray(mask)[None, :, :, None]
    chk_vars = np.asarray(tanner.chk_vars)
    data_llr = prior_llr_st[: B * n].reshape(B, n).astype(dtype)
    meas_llr = prior_llr_st[B * n :].reshape(R, r).astype(dtype)

    @jax.jit
    def run_many(synds):  # (Rb, B*r, S)
        def one(carry, synd):
            S = synd.shape[1]
            synd_sign = (1.0 - 2.0 * synd.astype(jnp.float32)).astype(dtype).reshape(B, r, S)
            edge_prior = data_llr[:, chk_vars]
            edge_prior = jnp.where(jnp.asarray(tanner.chk_mask)[None], edge_prior, dtype(_BIG))
            v2c_data = jnp.broadcast_to(edge_prior[..., None], (B, r, Dc, SHOTS)).astype(dtype)
            v2c_mlo = jnp.broadcast_to(meas_llr[..., None], (R, r, SHOTS)).astype(dtype)
            v2c_mhi = v2c_mlo
            big_slot = jnp.full((1, r, SHOTS), _BIG, dtype)

            def step(it, msgs):
                v2c_data, v2c_mlo, v2c_mhi = msgs
                slot_prev = jnp.concatenate([big_slot, v2c_mhi], axis=0)
                slot_next = jnp.concatenate([v2c_mlo, big_slot], axis=0)
                ext = jnp.concatenate(
                    [v2c_data, slot_prev[:, :, None, :], slot_next[:, :, None, :]], axis=2
                )
                sign = jnp.where(ext < 0, dtype(-1.0), dtype(1.0))
                mag = jnp.abs(ext)
                total_sign = jnp.prod(sign, axis=2, keepdims=True) * synd_sign[:, :, None, :]
                ext_sign = total_sign * sign
                min1 = jnp.min(mag, axis=2, keepdims=True)
                is_min = (mag == min1) & (jnp.cumsum((mag == min1), axis=2) == 1)
                mag2 = jnp.where(is_min, dtype(_BIG), mag)
                min2 = jnp.min(mag2, axis=2, keepdims=True)
                extv = jnp.where(is_min, min2, min1)
                c2v_ext = ext_sign * extv * dtype(0.625)
                c2v_data = c2v_ext[:, :, :Dc, :]
                flat = c2v_data.reshape(B, r * Dc, SHOTS)
                totals = jnp.einsum("vk,bks->bvs", M, flat, preferred_element_type=jnp.float32)
                posterior_d = data_llr[:, :, None].astype(jnp.float32) + totals
                back = jnp.einsum(
                    "kv,bvs->bks", G, posterior_d.astype(dtype),
                    preferred_element_type=jnp.float32,
                )
                v2c_data_new = jnp.where(
                    mask4, back.astype(dtype).reshape(B, r, Dc, SHOTS) - c2v_data, dtype(_BIG)
                )
                c2m_lo = c2v_ext[:R, :, Dc + 1, :]
                c2m_hi = c2v_ext[1:, :, Dc, :]
                posterior_m = meas_llr[:, :, None] + c2m_lo + c2m_hi
                return (v2c_data_new, posterior_m - c2m_lo, posterior_m - c2m_hi)

            v2c_data, _, _ = jax.lax.fori_loop(0, ITERS, step, (v2c_data, v2c_mlo, v2c_mhi))
            return carry + (v2c_data[0, 0, 0] <= 0).sum(), None

        tot, _ = jax.lax.scan(one, jnp.int32(0), synds)
        return tot

    return run_many


def main():
    code = biregular_hgp(12, 3, 4, seed=0, compute_logicals=False)
    H = code.checks.z
    r, n = H.shape
    st = SpacetimeCode(H, ROUNDS)
    Hst = st.spacetime_check_matrix
    tanner = TannerELL.from_check_matrix(H)
    prior = np.concatenate([np.full((ROUNDS + 1) * n, P), np.full(ROUNDS * r, P)])
    prior_llr = jnp.asarray(priors_to_llr(prior))
    rng = np.random.default_rng(0)

    def make(k):
        errs = (rng.random((k, SHOTS, Hst.shape[1])) < P).astype(np.uint8)
        return jnp.asarray(((errs @ Hst.T.toarray()) % 2).astype(np.uint8).transpose(0, 2, 1))

    n_lo, n_hi = 2, 10
    lo, hi = jax.device_put(make(n_lo)), jax.device_put(make(n_hi))

    for dtype in (jnp.float32, jnp.bfloat16):
        f = build(tanner, ROUNDS, prior_llr, dtype)
        f(lo).block_until_ready(); f(hi).block_until_ready()
        tl = min(
            (lambda t0: (f(lo).block_until_ready(), time.perf_counter() - t0)[1])(time.perf_counter())
            for _ in range(3)
        )
        th = min(
            (lambda t0: (f(hi).block_until_ready(), time.perf_counter() - t0)[1])(time.perf_counter())
            for _ in range(3)
        )
        per_batch = (th - tl) / (n_hi - n_lo)
        print(f"R={ROUNDS} {jnp.dtype(dtype).name:9s} {ITERS*SHOTS/per_batch/1e6:7.1f}M iter*shots/s "
              f"({per_batch*1e3:.1f} ms/batch)")


if __name__ == "__main__":
    main()
