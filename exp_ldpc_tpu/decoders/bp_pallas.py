"""VMEM-resident Pallas BP kernel for small/medium Tanner graphs.

TPU-native replacement for the hot path of the Cython ``ldpc`` package's
``bp_decoder`` (reference: ``/root/reference/python/qldpc/misc/
_experiment.py:2,199-209`` decodes shot-by-shot in Python).  The XLA
formulation in :mod:`.bp` streams (C, Dc, S) message arrays through HBM every
iteration; this kernel keeps ALL decode state in VMEM scratch for the entire
fixed-iteration flooding schedule:

  * v2c/c2v messages live in (Dc*C_pad, S) VMEM scratch in "plane" order
    (plane i holds slot i of every check) — the check-node reductions (sign
    product, min1/min2 with first-occurrence ties) unroll over the small Dc
    axis as elementwise (C_pad, S) vector ops on static row slices;
  * the variable-node update needs only per-variable TOTALS, computed as one
    MXU matmul ``M @ c2v`` with a 0/1 segment-sum matrix (V_pad, Dc*C_pad),
    and routed back edge-wise by a second one-hot matmul ``G @ posterior``;
    ``v2c = G@posterior - c2v``.  No gathers, no scatters;
  * the final hard decision is syndrome-checked in-kernel with a third
    matmul against the dense 0/1 check matrix (mod 2 on the f32 counts).

The kernel is fixed-iteration (flooding); per-shot early stopping does not
pay on TPU because the batch proceeds in lockstep anyway.  Grid is over shot
blocks.  Dense one-hot operands make this O(E * V) per shot-block, so it is
gated on a VMEM budget (:func:`fits_pallas`); larger codes (e.g. many-round
spacetime matrices) use the scatter-free formulations in :mod:`.bp`.

Bit-exact against ``_bp_core(..., formulation="matmul", early_stop=False)``
up to matmul accumulation order (verified 100% hard-decision agreement on
the HGP-225 benchmark).  On current Mosaic/v5e the XLA matmul formulation
schedules these sizes slightly better; this kernel is kept as an optional
backend (``BPDecoder`` stays on XLA by default) and as the substrate for
future fusions XLA cannot do (e.g. on-chip ensemble relay legs).
"""
from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .tanner import TannerELL

__all__ = ["bp_pallas_fixed", "fits_pallas", "build_operands"]

_BIG = 1e30
_PHI_CLAMP_LO = 1e-7
_PHI_CLAMP_HI = 30.0


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@lru_cache(maxsize=16)
def build_operands(tanner: TannerELL):
    """Dense one-hot operands (padded to MXU-friendly shapes), as numpy.

    Returns dict with:
      M  (V_pad, Dc*C_pad)  segment-sum: variable totals from edge values
      G  (Dc*C_pad, V_pad)  edge-wise broadcast of per-variable values
      H  (C_pad, V_pad)     dense 0/1 check matrix (for in-kernel syndrome)
      mask_plane, vars_plane  (Dc, C_pad) plane-layout slot metadata
    """
    C, V, Dc = tanner.num_checks, tanner.num_vars, tanner.max_check_degree
    C_pad = _round_up(C, 8)
    V_pad = _round_up(V, 128)
    E_pad = Dc * C_pad

    chk_vars = np.asarray(tanner.chk_vars)
    chk_mask = np.asarray(tanner.chk_mask)

    M = np.zeros((V_pad, E_pad), dtype=np.float32)
    G = np.zeros((E_pad, V_pad), dtype=np.float32)
    H = np.zeros((C_pad, V_pad), dtype=np.float32)
    for c in range(C):
        for i in range(Dc):
            if not chk_mask[c, i]:
                continue
            v = chk_vars[c, i]
            e = i * C_pad + c  # plane layout: plane i, row c
            M[v, e] = 1.0
            G[e, v] = 1.0
            H[c, v] = 1.0

    mask_plane = np.zeros((Dc, C_pad), dtype=np.float32)
    vars_plane = np.zeros((Dc, C_pad), dtype=np.int32)
    for c in range(C):
        for i in range(Dc):
            mask_plane[i, c] = 1.0 if chk_mask[c, i] else 0.0
            vars_plane[i, c] = chk_vars[c, i] if chk_mask[c, i] else 0
    return {
        "M": M,
        "G": G,
        "H": H,
        "mask_plane": mask_plane,
        "vars_plane": vars_plane,
        "C_pad": C_pad,
        "V_pad": V_pad,
    }


def fits_pallas(tanner: TannerELL, shot_block: int = 1024,
                vmem_budget_bytes: int = 64 * 2**20) -> bool:
    """Rough VMEM feasibility check for the dense-operand kernel."""
    C_pad = _round_up(tanner.num_checks, 8)
    V_pad = _round_up(tanner.num_vars, 128)
    Dc = tanner.max_check_degree
    E_pad = Dc * C_pad
    operands = 4 * (2 * V_pad * E_pad + C_pad * V_pad)
    # scratch: v2c + c2v + posterior + ~3 live temporaries + inputs
    state = 4 * shot_block * (4 * E_pad + 2 * V_pad + 2 * C_pad)
    return operands + state < vmem_budget_bytes


def _phi(x):
    x = jnp.clip(x, _PHI_CLAMP_LO, _PHI_CLAMP_HI)
    return -jnp.log(jnp.tanh(x * 0.5))


def _kernel(synd_ref, pvec_ref, prior_pl_ref, mask_ref, M_ref, G_ref, H_ref,
            hard_ref, post_out_ref, conv_ref, v2c_ref, c2v_ref, post_ref,
            *, Dc: int, C_pad: int, method: str, max_iter: int,
            alpha0: float, adaptive: bool):
    """One shot-block fixed-iteration BP decode, state in VMEM scratch.

    synd_ref (C_pad, S) f32 {0,1}; pvec_ref (V_pad, S) prior broadcast;
    prior_pl_ref/mask_ref (Dc*C_pad, S) initial v2c planes / slot mask;
    M/G/H as in :func:`build_operands`; outputs hard/posterior (V_pad, S),
    conv (8, S) with row 0 meaningful; scratch v2c/c2v (Dc*C_pad, S) and
    post (V_pad, S).
    """
    synd_sign = 1.0 - 2.0 * synd_ref[:]
    v2c_ref[:] = prior_pl_ref[:]

    def plane(ref, i):
        return ref[i * C_pad:(i + 1) * C_pad, :]

    def body(it, _):
        planes = [plane(v2c_ref, i) for i in range(Dc)]
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
            for i in range(Dc):
                c2v_ref[i * C_pad:(i + 1) * C_pad, :] = (
                    total_sign * signs[i] * _phi(total - phs[i]))
        else:
            # running (min1, min2, argmin plane); ties keep the first plane
            min1 = mags[0]
            min2 = jnp.full_like(min1, _BIG)
            arg = jnp.zeros_like(min1)
            for i in range(1, Dc):
                m = mags[i]
                lt = m < min1
                min2 = jnp.where(lt, min1, jnp.minimum(min2, m))
                arg = jnp.where(lt, float(i), arg)
                min1 = jnp.where(lt, m, min1)
            if adaptive:
                alpha = 1.0 - 2.0 ** (-(it + 1).astype(jnp.float32))
            else:
                alpha = alpha0
            for i in range(Dc):
                c2v_ref[i * C_pad:(i + 1) * C_pad, :] = (
                    total_sign * signs[i]
                    * jnp.where(arg == float(i), min2, min1) * alpha)

        tot = pvec_ref[:] + jnp.dot(M_ref[:], c2v_ref[:],
                                    preferred_element_type=jnp.float32)
        post_ref[:] = tot
        back = jnp.dot(G_ref[:], tot, preferred_element_type=jnp.float32)
        # masked slots revert to +BIG so they stay neutral in the reductions
        v2c_ref[:] = jnp.where(mask_ref[:] > 0, back - c2v_ref[:], _BIG)
        return 0

    jax.lax.fori_loop(0, max_iter, body, 0)
    hard = (post_ref[:] <= 0.0).astype(jnp.float32)
    hard_ref[:] = hard
    post_out_ref[:] = post_ref[:]
    # in-kernel syndrome check (mod 2 on integer-valued f32 counts)
    counts = jnp.dot(H_ref[:], hard, preferred_element_type=jnp.float32)
    par = counts - 2.0 * jnp.floor(counts * 0.5)
    ok = jnp.sum(jnp.abs(par - synd_ref[:]), axis=0, keepdims=True)
    conv_ref[:] = jnp.broadcast_to((ok < 0.5).astype(jnp.float32),
                                   conv_ref.shape)


@partial(jax.jit, static_argnames=("tanner", "method", "max_iter",
                                   "ms_scaling_factor", "shot_block",
                                   "interpret"))
def bp_pallas_fixed(tanner: TannerELL, prior_llr, syndromes, method: str,
                    max_iter: int, ms_scaling_factor, shot_block: int = 1024,
                    interpret: bool = False):
    """Fixed-iteration batched BP, VMEM-resident Pallas kernel.

    syndromes: (C, S) uint8.  Returns (hard (V,S) uint8, posterior (V,S) f32,
    converged (S,) bool, iters (S,) int32) — same contract as ``_bp_core``
    with ``early_stop=False``.
    """
    ops = build_operands(tanner)
    C, V = tanner.num_checks, tanner.num_vars
    Dc = tanner.max_check_degree
    C_pad, V_pad = ops["C_pad"], ops["V_pad"]
    E_pad = Dc * C_pad
    Cn, S = syndromes.shape
    assert Cn == C
    S_pad = _round_up(S, shot_block)

    synd = jnp.zeros((C_pad, S_pad), jnp.float32)
    synd = synd.at[:C, :S].set(syndromes.astype(jnp.float32))

    prior_np = jnp.asarray(prior_llr, jnp.float32)
    pvec = jnp.zeros((V_pad,), jnp.float32).at[:V].set(prior_np)
    pvec = jnp.broadcast_to(pvec[:, None], (V_pad, S_pad))
    mask_plane = jnp.asarray(ops["mask_plane"])  # (Dc, C_pad)
    init_plane = jnp.where(mask_plane > 0,
                           prior_np[jnp.asarray(ops["vars_plane"])], _BIG)
    prior_pl = jnp.broadcast_to(init_plane.reshape(E_pad, 1), (E_pad, S_pad))
    maskE = jnp.broadcast_to(mask_plane.reshape(E_pad, 1), (E_pad, S_pad))

    adaptive = float(ms_scaling_factor) == 0.0
    kernel = partial(_kernel, Dc=Dc, C_pad=C_pad, method=method,
                     max_iter=max_iter, alpha0=float(ms_scaling_factor),
                     adaptive=adaptive)

    grid = (S_pad // shot_block,)
    blk = lambda r: pl.BlockSpec(  # noqa: E731 — operand block over shots
        (r, shot_block), lambda s: (0, s), memory_space=pltpu.VMEM)
    full = lambda shape: pl.BlockSpec(  # noqa: E731 — unblocked operand
        shape, lambda s: tuple(0 for _ in shape), memory_space=pltpu.VMEM)

    hard, post, conv = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            blk(C_pad),                 # syndromes
            blk(V_pad),                 # prior vector
            blk(E_pad),                 # prior planes
            blk(E_pad),                 # slot mask
            full((V_pad, E_pad)),       # M
            full((E_pad, V_pad)),       # G
            full((C_pad, V_pad)),       # H
        ],
        out_specs=[blk(V_pad), blk(V_pad), blk(8)],
        out_shape=[
            jax.ShapeDtypeStruct((V_pad, S_pad), jnp.float32),
            jax.ShapeDtypeStruct((V_pad, S_pad), jnp.float32),
            jax.ShapeDtypeStruct((8, S_pad), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((E_pad, shot_block), jnp.float32),  # v2c
            pltpu.VMEM((E_pad, shot_block), jnp.float32),  # c2v
            pltpu.VMEM((V_pad, shot_block), jnp.float32),  # posterior
        ],
        interpret=interpret,
    )(synd, pvec, prior_pl, maskE, jnp.asarray(ops["M"]),
      jnp.asarray(ops["G"]), jnp.asarray(ops["H"]))

    hard_out = hard[:V, :S].astype(jnp.uint8)
    post_out = post[:V, :S]
    conv_out = conv[0, :S] > 0.5
    iters_out = jnp.full((S,), max_iter, jnp.int32)
    return hard_out, post_out, conv_out, iters_out
