"""VMEM-resident Pallas kernel for the STRUCTURED spacetime BP.

The XLA structured core (:mod:`.spacetime_bp`) streams the (B, r, Dc+2, S)
message tensors through HBM every iteration and is bandwidth-bound (docs/
DESIGN.md §4).  This kernel keeps the ENTIRE multi-round decode state in VMEM
for all iterations — per-iteration HBM traffic drops to zero:

  * message planes live in a ((Dc+2)·B·C_pad, S) scratch, plane-major with
    the round block inside the plane (plane i = rows [i·B·C_pad, (i+1)·B·C_pad));
    the check update is the usual unrolled sign/min1-min2 plane reduction on
    (B·C_pad, S) vector tiles — ONE pass over VMEM, no HBM;
  * the data-variable update is B·Dc small MXU matmuls against the BASE
    code's one-hot operands (M_i = M[:, i·C_pad:(i+1)·C_pad] per plane) —
    O(rounds) FLOPs, never the O(rounds²) stacked-matrix operands;
  * measurement variables (degree 2) update in closed form via static row
    slices of the two measurement planes (plane Dc ← m_{b-1}, plane Dc+1 ←
    m_b); boundary slots stay +BIG from initialization.

Fixed-iteration flooding only (the production pipeline's mode).  Same
contract as ``_stbp_core(..., early_stop=False)``; hard decisions agree with
the XLA core up to matmul accumulation order (tests pin 100% agreement on
the benchmark configs).  Kernel-loop bodies use only static slices and dots
(no concat/reshape — Mosaic compile-time hazard, CLAUDE.md).
"""
from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .bp_pallas import _round_up, build_operands
from .tanner import TannerELL

__all__ = ["stbp_pallas_fixed", "fits_stbp_pallas"]

_BIG = 1e30
_PHI_CLAMP_LO = 1e-7
_PHI_CLAMP_HI = 30.0


def fits_stbp_pallas(tanner: TannerELL, num_rounds: int, shot_block: int = 128,
                     vmem_budget_bytes: int = 14 * 2**20) -> bool:
    """VMEM feasibility: operands + state + inputs must fit on-core."""
    B = num_rounds + 1
    C_pad = _round_up(tanner.num_checks, 8)
    V_pad = _round_up(tanner.num_vars, 128)
    Dc = tanner.max_check_degree
    E_pad = Dc * C_pad
    P = Dc + 2
    operands = 4 * (2 * V_pad * E_pad + C_pad * V_pad)
    state = 4 * shot_block * (2 * P * B * C_pad + B * V_pad + B * C_pad)
    inputs = 4 * shot_block * (B * C_pad + B * V_pad + B * C_pad + E_pad)
    return operands + state + inputs < vmem_budget_bytes


def _phi(x):
    x = jnp.clip(x, _PHI_CLAMP_LO, _PHI_CLAMP_HI)
    return -jnp.log(jnp.tanh(x * 0.5))


def _kernel(synd_ref, pvec_ref, maskE_ref, mprior_ref,
            M_ref, G_ref, H_ref,
            postd_ref, postm_ref, conv_ref,
            v2c_ref, c2v_ref,
            *, Dc: int, B: int, C_pad: int, V_pad: int, method: str,
            max_iter: int, alpha0: float, adaptive: bool):
    """One shot-block, all iterations, state in VMEM.

    synd_ref (B*C_pad, S) f32 {0,1} block-major; pvec_ref (B*V_pad, S) data
    priors; maskE_ref (Dc*C_pad, S) f32 data-slot mask (plane layout, same
    for every block); mprior_ref (B*C_pad, S) measurement priors (last block
    unused); M/G/H base-code one-hot operands (plane layout,
    bp_pallas.build_operands).  Outputs: postd (B*V_pad, S), postm
    (B*C_pad, S), conv (8, S) row 0.  Scratch: v2c/c2v ((Dc+2)*B*C_pad, S).
    v2c is initialized IN-KERNEL: the per-edge data prior is exactly
    G_i @ pvec_b (one-hot broadcast), so no (Dc+2)·B·C_pad prior input is
    needed — the largest VMEM consumer in the previous formulation.
    """
    BC = B * C_pad
    P = Dc + 2
    R = B - 1
    synd_sign = 1.0 - 2.0 * synd_ref[:]

    def plane(ref, i):
        return ref[i * BC:(i + 1) * BC, :]

    def blk(ref, i, b, rows):
        return ref[i * BC + b * rows:i * BC + (b + 1) * rows, :]

    # ---- in-kernel init
    for b in range(B):
        pv = pvec_ref[b * V_pad:(b + 1) * V_pad, :]
        for i in range(Dc):
            Gi = G_ref[i * C_pad:(i + 1) * C_pad, :]
            ep = jnp.dot(Gi, pv, preferred_element_type=jnp.float32)
            rows = slice(i * BC + b * C_pad, i * BC + (b + 1) * C_pad)
            v2c_ref[rows, :] = jnp.where(
                maskE_ref[i * C_pad:(i + 1) * C_pad, :] > 0, ep, _BIG)
    # measurement planes: plane Dc of block b <- m_{b-1}, plane Dc+1 <- m_b;
    # boundary slots (plane Dc at b=0, plane Dc+1 at b=B-1) stay +BIG
    v2c_ref[Dc * BC:Dc * BC + C_pad, :] = jnp.full_like(synd_sign[:C_pad, :], _BIG)
    if R:
        v2c_ref[Dc * BC + C_pad:(Dc + 1) * BC, :] = mprior_ref[: R * C_pad, :]
        v2c_ref[(Dc + 1) * BC:(Dc + 1) * BC + R * C_pad, :] = mprior_ref[: R * C_pad, :]
    v2c_ref[(Dc + 1) * BC + R * C_pad:P * BC, :] = jnp.full_like(
        synd_sign[:C_pad, :], _BIG)

    def body(it, _):
        # ---- check update: unrolled plane reduction on (B*C_pad, S) tiles
        planes = [plane(v2c_ref, i) for i in range(P)]
        signs = [jnp.where(p < 0, -1.0, 1.0) for p in planes]
        mags = [jnp.abs(p) for p in planes]
        total_sign = synd_sign
        for s in signs:
            total_sign = total_sign * s

        if method == "ps":
            phs = [_phi(m) for m in mags]
            total = phs[0]
            for ph in phs[1:]:
                total = total + ph
            for i in range(P):
                c2v_ref[i * BC:(i + 1) * BC, :] = (
                    total_sign * signs[i] * _phi(total - phs[i]))
        else:
            min1 = mags[0]
            min2 = jnp.full_like(min1, _BIG)
            arg = jnp.zeros_like(min1)
            for i in range(1, P):
                m = mags[i]
                lt = m < min1
                min2 = jnp.where(lt, min1, jnp.minimum(min2, m))
                arg = jnp.where(lt, float(i), arg)
                min1 = jnp.where(lt, m, min1)
            if adaptive:
                alpha = 1.0 - 2.0 ** (-(it + 1).astype(jnp.float32))
            else:
                alpha = alpha0
            for i in range(P):
                c2v_ref[i * BC:(i + 1) * BC, :] = (
                    total_sign * signs[i]
                    * jnp.where(arg == float(i), min2, min1) * alpha)

        # ---- data-variable update: B x Dc base-code matmuls
        for b in range(B):
            tot = pvec_ref[b * V_pad:(b + 1) * V_pad, :]
            for i in range(Dc):
                Mi = M_ref[:, i * C_pad:(i + 1) * C_pad]
                tot = tot + jnp.dot(Mi, blk(c2v_ref, i, b, C_pad),
                                    preferred_element_type=jnp.float32)
            postd_ref[b * V_pad:(b + 1) * V_pad, :] = tot
            for i in range(Dc):
                Gi = G_ref[i * C_pad:(i + 1) * C_pad, :]
                back = jnp.dot(Gi, tot, preferred_element_type=jnp.float32)
                rows = slice(i * BC + b * C_pad, i * BC + (b + 1) * C_pad)
                v2c_ref[rows, :] = jnp.where(
                    maskE_ref[i * C_pad:(i + 1) * C_pad, :] > 0,
                    back - c2v_ref[rows, :], _BIG)

        # ---- measurement-variable update (degree 2, closed form):
        # m_b couples check block b (its plane-(Dc+1) slot) with block b+1
        # (its plane-Dc slot); boundary slots keep their +BIG initialization
        for b in range(R):
            lo = slice((Dc + 1) * BC + b * C_pad, (Dc + 1) * BC + (b + 1) * C_pad)
            hi = slice(Dc * BC + (b + 1) * C_pad, Dc * BC + (b + 2) * C_pad)
            c_lo = c2v_ref[lo, :]
            c_hi = c2v_ref[hi, :]
            pm = mprior_ref[b * C_pad:(b + 1) * C_pad, :] + c_lo + c_hi
            postm_ref[b * C_pad:(b + 1) * C_pad, :] = pm
            v2c_ref[lo, :] = pm - c_lo
            v2c_ref[hi, :] = pm - c_hi
        return 0

    jax.lax.fori_loop(0, max_iter, body, 0)

    # ---- in-kernel spacetime syndrome check
    bad = jnp.zeros_like(conv_ref[0:1, :])
    for b in range(B):
        hard_b = (postd_ref[b * V_pad:(b + 1) * V_pad, :] <= 0.0).astype(jnp.float32)
        counts = jnp.dot(H_ref[:], hard_b, preferred_element_type=jnp.float32)
        if b > 0:
            counts = counts + (postm_ref[(b - 1) * C_pad:b * C_pad, :] <= 0.0)
        if b < R:
            counts = counts + (postm_ref[b * C_pad:(b + 1) * C_pad, :] <= 0.0)
        par = counts - 2.0 * jnp.floor(counts * 0.5)
        bad = bad + jnp.sum(
            jnp.abs(par - synd_ref[b * C_pad:(b + 1) * C_pad, :]),
            axis=0, keepdims=True)
    conv_ref[:] = jnp.broadcast_to((bad < 0.5).astype(jnp.float32), conv_ref.shape)


@lru_cache(maxsize=16)
def _plane_metadata(tanner: TannerELL):
    ops = build_operands(tanner)
    return ops, np.asarray(ops["mask_plane"]), np.asarray(ops["vars_plane"])


@partial(jax.jit, static_argnames=("tanner", "num_rounds", "method", "max_iter",
                                   "ms_scaling_factor", "shot_block", "interpret"))
def stbp_pallas_fixed(tanner: TannerELL, num_rounds: int, prior_llr_st,
                      syndromes, method: str, max_iter: int,
                      ms_scaling_factor, shot_block: int = 128,
                      interpret: bool = False):
    """Fixed-iteration structured spacetime BP, VMEM-resident.

    Same interface as ``_stbp_core(..., early_stop=False)``: prior_llr_st
    (B·n + R·r,) in SpacetimeCode column order, syndromes (B·r, S) in row
    order; returns (hard (Vst, S) uint8, posterior (Vst, S) f32, converged
    (S,) bool, iters (S,) int32).
    """
    R = num_rounds
    B = R + 1
    C, V, Dc = tanner.num_checks, tanner.num_vars, tanner.max_check_degree
    ops, mask_plane, vars_plane = _plane_metadata(tanner)
    C_pad, V_pad = ops["C_pad"], ops["V_pad"]
    BC = B * C_pad
    P = Dc + 2

    Cst, S = syndromes.shape
    assert Cst == B * C
    S_pad = _round_up(S, shot_block)

    prior = jnp.asarray(prior_llr_st, jnp.float32)
    data_llr = prior[: B * V].reshape(B, V)
    meas_llr = prior[B * V:].reshape(R, C) if R else jnp.zeros((0, C), jnp.float32)

    # block-major padded syndromes (B*C_pad, S_pad)
    synd = jnp.zeros((B, C_pad, S_pad), jnp.float32)
    synd = synd.at[:, :C, :S].set(syndromes.reshape(B, C, S).astype(jnp.float32))
    synd = synd.reshape(BC, S_pad)

    # data priors (B*V_pad, shot_block) — constant over shot blocks
    pvec = jnp.zeros((B, V_pad), jnp.float32).at[:, :V].set(data_llr)
    pvec = jnp.broadcast_to(pvec.reshape(B * V_pad, 1), (B * V_pad, shot_block))

    # measurement priors (B*C_pad, shot_block), last block unused
    mp = jnp.zeros((B, C_pad), jnp.float32)
    if R:
        mp = mp.at[:R, :C].set(meas_llr)
    mprior = jnp.broadcast_to(mp.reshape(BC, 1), (BC, shot_block))

    # data-slot mask (Dc*C_pad, shot_block), plane layout, block-invariant
    E_pad = Dc * C_pad
    maskE = jnp.broadcast_to(
        jnp.asarray(mask_plane, jnp.float32).reshape(E_pad, 1), (E_pad, shot_block))

    adaptive = float(ms_scaling_factor) == 0.0
    kernel = partial(_kernel, Dc=Dc, B=B, C_pad=C_pad, V_pad=V_pad,
                     method=method, max_iter=max_iter,
                     alpha0=float(ms_scaling_factor), adaptive=adaptive)

    grid = (S_pad // shot_block,)
    blk = lambda r: pl.BlockSpec(  # noqa: E731 — blocked over shots
        (r, shot_block), lambda s: (0, s), memory_space=pltpu.VMEM)
    const = lambda r: pl.BlockSpec(  # noqa: E731 — same block every step
        (r, shot_block), lambda s: (0, 0), memory_space=pltpu.VMEM)
    full = lambda shape: pl.BlockSpec(  # noqa: E731 — unblocked operand
        shape, lambda s: tuple(0 for _ in shape), memory_space=pltpu.VMEM)

    E_pad = Dc * C_pad
    postd, postm, conv = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            blk(BC),              # syndromes
            const(B * V_pad),     # data priors
            const(E_pad),         # data-slot mask
            const(BC),            # measurement priors
            full((V_pad, E_pad)),  # M
            full((E_pad, V_pad)),  # G
            full((C_pad, V_pad)),  # H
        ],
        out_specs=[blk(B * V_pad), blk(BC), blk(8)],
        out_shape=[
            jax.ShapeDtypeStruct((B * V_pad, S_pad), jnp.float32),
            jax.ShapeDtypeStruct((BC, S_pad), jnp.float32),
            jax.ShapeDtypeStruct((8, S_pad), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((P * BC, shot_block), jnp.float32),  # v2c
            pltpu.VMEM((P * BC, shot_block), jnp.float32),  # c2v
        ],
        interpret=interpret,
    )(synd, pvec, maskE, mprior, jnp.asarray(ops["M"]),
      jnp.asarray(ops["G"]), jnp.asarray(ops["H"]))

    post_d = postd.reshape(B, V_pad, S_pad)[:, :V, :S].reshape(B * V, S)
    if R:
        post_m = postm.reshape(B, C_pad, S_pad)[:R, :C, :S].reshape(R * C, S)
        posterior = jnp.concatenate([post_d, post_m], axis=0)
    else:
        posterior = post_d
    hard = (posterior <= 0).astype(jnp.uint8)
    conv_out = conv[0, :S] > 0.5
    iters = jnp.full((S,), max_iter, jnp.int32)
    return hard, posterior, conv_out, iters
