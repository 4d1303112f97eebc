"""VMEM-resident BP for LARGE codes: block-sparse one-hot (BSR) routing.

The generic formulations in :mod:`.bp` cover two regimes: dense one-hot MXU
matmuls (operands O(V*C*Dc) — only small codes) and per-edge XLA row gathers
(collapses on TPU: 97k iter*shots/s on the n=4862 cyclic lifted product,
``artifacts/bp_families_v5e.jsonl``).  The reference has no such cliff only
because it delegates every decode to serial Cython on CPU
(``/root/reference/python/qldpc/misc/_experiment.py:51-59``); a TPU-native
framework needs a formulation whose cost scales with the EDGE count.

This kernel tiles the two routing operators into 128x128 ONE-HOT blocks and
runs only the nonzero blocks on the MXU:

  * messages live in VMEM scratch in plane-major layout ((Dc*C_pad, S_blk),
    plane s row-block = slot s of every check) for the entire decode — zero
    per-iteration HBM traffic;
  * the check update is the unrolled sign/min1-min2 (or phi) plane reduction
    over 128-check chunks, in place;
  * variable totals: for each 128-variable tile, sum over its nonzero
    routing tiles of ``onehot(idx) @ msg[edge_tile]`` — the one-hot is BUILT
    IN-KERNEL from an int32 index row (broadcasted-iota compare), so the
    operand store is O(E) indices, not O(E*128) dense floats;
  * the edge-wise broadcast back is the same tiles transposed
    (``dot_general`` contracting the variable axis) — one index table serves
    both directions;
  * the per-iteration syndrome check rides the broadcast pass for free (the
    routed posterior IS the per-edge hard decision), giving a global early
    exit (all shots converged) at VPU cost.

Messages are bfloat16 (accuracy-neutral for min-sum — CLAUDE.md; all
reductions accumulate in f32 on the MXU), halving VMEM so a whole
(E ~ 37k) x (128-shot) message plane fits on-core.  Block sparsity for
product codes is high: the n=4862 cyclic LP needs 548 tiles vs 11856 dense
— 21x fewer MXU FLOPs than the dense formulation would need, with none of
the gather path's serialization.

Semantics vs :class:`~exp_ldpc_tpu.decoders.bp.BPDecoder`: fixed-point
flooding with a GLOBAL early exit — no per-shot freezing (a converged
shot's outputs keep updating until every shot converges; BP fixed points
make this unobservable in practice).  ``converged`` is the honest final
syndrome check per shot, ``iters`` the global iteration count.
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import lru_cache, partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from scipy import sparse

from .bp import priors_to_llr
from .tanner import TannerELL
from ..utils.compile_cache import enable_compilation_cache

__all__ = ["BSRSchedule", "bsr_bp_decode", "bsr_bp_decode_int8", "fits_bsr",
           "BSRBPDecoder"]

_BIG = 1e30
_PHI_CLAMP_LO = 1e-7
_PHI_CLAMP_HI = 30.0
_TILE = 128
# scoped-VMEM cap requested from Mosaic.  v5e/v6e have 128 MiB physical
# VMEM; 116 MiB leaves room for the compiler's own reservations while
# admitting the n=10000 HGP at shot_block 256 (107.6 MiB scoped)
_VMEM_LIMIT = 116 * 2**20


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@dataclass(frozen=True, eq=False)  # identity hash: jit static arg
class BSRSchedule:
    """Static tile schedule for the BSR routing kernel.

    ``idx[t, p] = q`` means routing tile ``t`` (a (var_tile, edge_tile)
    pair) maps edge position ``p`` of its edge tile to variable position
    ``q`` of its variable tile (-1: no edge).  ``sched_m[vt]`` lists
    ``(edge_tile, t)`` for the variable-totals pass; ``sched_g[et]`` lists
    ``(var_tile, t)`` for the edge-broadcast pass.  ``mask_t[p, et]`` is
    +BIG on edge rows with no variable anywhere (padding slots), 0 else.
    """

    num_checks: int
    num_vars: int
    c_pad: int
    v_pad: int
    dc: int
    idx: np.ndarray          # (T_pad, 128) int32
    mask_t: np.ndarray       # (128, n_edge_tiles) float32
    sched_m: Tuple[Tuple[Tuple[int, int], ...], ...]
    sched_g: Tuple[Tuple[Tuple[int, int], ...], ...]
    # per 128-check chunk: number of live slot planes (max check degree in
    # the chunk).  Slots >= live_slots[cc] have no edges anywhere in the
    # chunk (TannerELL packs each check's edges into a slot prefix), so the
    # min-sum check update and the routing passes can skip them exactly.
    live_slots: Tuple[int, ...] = ()
    # flat tile metadata for the dynamic-loop kernel (int32 arrays, read
    # from SMEM): the same tiles as sched_m/sched_g, as contiguous segments
    # so the kernel can loop over them with runtime bounds instead of
    # unrolling per tile (keeps Mosaic compile time independent of the tile
    # count).  m_*: grouped by variable tile (m_start has n_vt+1 bounds);
    # g_*: grouped by edge tile; live_et lists edge tiles with >= 1 tile.
    dyn: Optional[dict] = None

    @property
    def num_tiles(self) -> int:
        return sum(len(s) for s in self.sched_m)

    @property
    def e_pad(self) -> int:
        return self.dc * self.c_pad

    @classmethod
    def from_tanner(cls, tanner: TannerELL) -> "BSRSchedule":
        return _build_schedule(tanner)


@lru_cache(maxsize=16)
def _build_schedule(tanner: TannerELL) -> BSRSchedule:
    C, V, Dc = tanner.num_checks, tanner.num_vars, tanner.max_check_degree
    C_pad = _round_up(C, _TILE)
    V_pad = _round_up(V, _TILE)
    n_et = Dc * C_pad // _TILE
    n_vt = V_pad // _TILE

    chk_vars = np.asarray(tanner.chk_vars)
    chk_mask = np.asarray(tanner.chk_mask)
    c_idx, s_idx = np.nonzero(chk_mask)
    v = chk_vars[c_idx, s_idx].astype(np.int64)
    erow = s_idx.astype(np.int64) * C_pad + c_idx
    et, ep = erow // _TILE, erow % _TILE
    vt, vp = v // _TILE, v % _TILE

    key = vt * n_et + et
    uniq, tile_of_edge = np.unique(key, return_inverse=True)
    T = uniq.shape[0]
    T_pad = _round_up(max(T, 8), 8)
    idx = np.full((T_pad, _TILE), -1, dtype=np.int32)
    idx[tile_of_edge, ep] = vp.astype(np.int32)

    tile_vt = (uniq // n_et).astype(np.int64)
    tile_et = (uniq % n_et).astype(np.int64)
    sched_m = tuple(
        tuple(
            (int(tile_et[t]), int(t))
            for t in np.nonzero(tile_vt == j)[0]
        )
        for j in range(n_vt)
    )
    sched_g = tuple(
        tuple(
            (int(tile_vt[t]), int(t))
            for t in np.nonzero(tile_et == i)[0]
        )
        for i in range(n_et)
    )

    mask_t = np.full((_TILE, n_et), _BIG, dtype=np.float32)
    mask_t[ep, et] = 0.0

    n_cc = C_pad // _TILE
    deg = chk_mask.sum(axis=1).astype(np.int64)
    deg_pad = np.zeros(C_pad, np.int64)
    deg_pad[:C] = deg
    live_slots = tuple(
        int(deg_pad[i * _TILE:(i + 1) * _TILE].max()) for i in range(n_cc)
    )

    # flat segment metadata mirroring sched_m/sched_g (tile ids t are sorted
    # by (vt, et), so the m-grouping is the identity order and both segment
    # orders match the unrolled pair order exactly -> bit-identical
    # accumulation)
    m_start = np.searchsorted(tile_vt, np.arange(n_vt + 1)).astype(np.int32)
    order_g = np.lexsort((tile_vt, tile_et))
    g_start = np.searchsorted(
        tile_et[order_g], np.arange(n_et + 1)).astype(np.int32)
    dyn = {
        "m_start": m_start,
        "m_et": tile_et.astype(np.int32),
        "m_t": np.arange(T, dtype=np.int32),
        "g_start": g_start,
        "g_vt": tile_vt[order_g].astype(np.int32),
        "g_t": order_g.astype(np.int32),
        "live_et": np.nonzero(np.diff(g_start))[0].astype(np.int32),
        "live_slots": np.asarray(live_slots, dtype=np.int32),
    }

    return BSRSchedule(
        num_checks=C, num_vars=V, c_pad=C_pad, v_pad=V_pad, dc=Dc,
        idx=idx, mask_t=mask_t, sched_m=sched_m, sched_g=sched_g,
        live_slots=live_slots, dyn=dyn,
    )


def fits_bsr(tanner: TannerELL, shot_block: int = 128,
             vmem_budget_bytes: int = 64 * 2**20) -> bool:
    """VMEM feasibility: bf16 messages + f32 posterior/parity + fused-scan
    state + materialized one-hot tiles + tables.  v5e/v6e have 128 MiB VMEM
    per core and the kernel runs with a ``_VMEM_LIMIT`` (116 MiB) scoped
    limit; the 64 MiB default budget leaves headroom for the compiler's
    double-buffered operand streaming (Mosaic's measured stack demand runs
    ~1.6x the naive operand estimate, see :func:`_auto_shot_block`)."""
    sched = BSRSchedule.from_tanner(tanner)
    msg = 2 * sched.e_pad * shot_block
    state = 4 * shot_block * (sched.v_pad + 2 * sched.c_pad)  # post/par/synd
    # min-sum fused check-scan scratch: (sign, min1, min2, argmin) f32
    state += 16 * sched.c_pad * shot_block
    onehots = sched.num_tiles * _TILE * _TILE * 2
    # index tables are O(E) int32; live temporaries ~8 (128, S) chunks
    tables = 4 * (sched.e_pad + 2 * sched.e_pad // _TILE * _TILE)
    temps = 4 * 8 * _TILE * shot_block
    return msg + state + onehots + tables + temps < vmem_budget_bytes


def _phi(x):
    x = jnp.clip(x, _PHI_CLAMP_LO, _PHI_CLAMP_HI)
    return -jnp.log(jnp.tanh(x * 0.5))


def _kernel(synd_ref, prior_t_ref, mask_t_ref, idx_ref,
            post_ref, conv_ref, iters_ref,
            msg_ref, par_ref, done_ref, oh_ref=None, st_ref=None,
            *, sched: BSRSchedule, method: str, max_iter: int,
            alpha0: float, adaptive: bool, early_stop: bool,
            ablate: str = ""):
    """One shot block, all iterations, messages resident in VMEM.

    ``ablate`` is a profiling hook (scripts/bench_bsr_ablation.py) that
    disables one cost center to expose the kernel's time breakdown:
    "no_check" skips the check update, "no_route" replaces both routing
    passes with a copy.  Production callers leave it empty.

    With ``oh_ref`` given, the 128x128 one-hot routing tiles are MATERIALIZED
    into VMEM scratch once (first grid step; scratch persists across the
    sequential TPU grid) and re-read by every dot — the iota-compare build
    otherwise costs ~128^2 VPU ops per tile per pass per ITERATION, which at
    ~550 tiles rivals the MXU budget itself.

    With ``st_ref`` given (min-sum production path), the check update's
    min/sign SCAN is fused into the edge-broadcast pass: as each v2c
    message is produced there, the per-chunk (sign, min1, min2, argmin)
    state for the NEXT iteration's check output accumulates in registers
    and lands in ``st_ref`` — deleting one full read+scan pass over the
    message planes per iteration (the old pass 1).  Bit-exact vs the
    two-pass form: the scan visits slots in the same order on the same
    bf16-rounded values, and the output's alpha pre-multiply commutes
    exactly because the sign factor is ±1.
    """
    C_pad, V_pad, Dc = sched.c_pad, sched.v_pad, sched.dc
    n_cc = C_pad // _TILE
    S = synd_ref.shape[1]
    f32 = jnp.float32
    # min-sum can skip dead planes/tiles exactly: +BIG planes never win the
    # min and are never rewritten, so they stay +BIG without the broadcast
    # pass restoring them.  Sum-product totals include _phi(+BIG) != 0, so
    # "ps" keeps the full loops (bit-exactness over ~1e-13 savings).
    skip_dead = method == "ms" and ablate == ""
    fused = skip_dead and st_ref is not None

    def st_rows(q, cc):
        return slice(q * C_pad + cc * _TILE, q * C_pad + (cc + 1) * _TILE)

    def min_scan_step(s, v, carry):
        """One slot of the min-sum check scan (slot order fixed -> exact)."""
        tsign, min1, min2, arg = carry
        tsign = tsign * jnp.where(v < 0, -1.0, 1.0)
        if s == 0:
            return tsign, jnp.abs(v), jnp.full_like(v, _BIG), jnp.zeros_like(v)
        m = jnp.abs(v)
        lt = m < min1
        min2 = jnp.where(lt, min1, jnp.minimum(min2, m))
        arg = jnp.where(lt, float(s), arg)
        min1 = jnp.where(lt, m, min1)
        return tsign, min1, min2, arg

    def chunk_slots(cc):
        return sched.live_slots[cc] if skip_dead else Dc

    def bcast_tiles():
        for et, pairs in enumerate(sched.sched_g):
            if skip_dead and not pairs:
                continue
            yield et, pairs

    if oh_ref is not None:
        @pl.when(pl.program_id(0) == 0)
        def _build_onehots():
            rows = jax.lax.broadcasted_iota(jnp.int32, (_TILE, _TILE), 0)
            for t in range(sched.num_tiles):
                oh_ref[t * _TILE:(t + 1) * _TILE, :] = (
                    rows == idx_ref[t:t + 1, :]).astype(jnp.bfloat16)

        def onehot(t):
            return oh_ref[t * _TILE:(t + 1) * _TILE, :]
    else:
        def onehot(t):
            rows = jax.lax.broadcasted_iota(jnp.int32, (_TILE, _TILE), 0)
            return (rows == idx_ref[t:t + 1, :]).astype(jnp.bfloat16)

    def etile(i):
        return msg_ref[i * _TILE:(i + 1) * _TILE, :]

    # ---- init: v2c = prior at each edge's variable (+BIG on padding rows)
    for et, pairs in enumerate(sched.sched_g):
        col = mask_t_ref[:, et:et + 1]
        for vt, t in pairs:
            pcol = prior_t_ref[:, vt:vt + 1].astype(jnp.bfloat16)
            col = col + jax.lax.dot_general(
                onehot(t), pcol, (((0,), (0,)), ((), ())),
                preferred_element_type=f32)
        msg_ref[et * _TILE:(et + 1) * _TILE, :] = jnp.broadcast_to(
            col, (_TILE, S)).astype(jnp.bfloat16)

    if fused:
        # seed the scan state from the init messages (the role of the old
        # pass 1 on iteration 0); later iterations refresh it in-flight
        # during the broadcast pass
        for cc in range(n_cc):
            n_s = sched.live_slots[cc]
            if n_s == 0:
                continue
            crows = slice(cc * _TILE, (cc + 1) * _TILE)
            carry = (1.0 - 2.0 * synd_ref[crows, :].astype(f32),) + (None,) * 3
            for s in range(n_s):
                v = msg_ref[s * C_pad + cc * _TILE:
                            s * C_pad + (cc + 1) * _TILE, :].astype(f32)
                carry = min_scan_step(s, v, carry)
            for q in range(4):
                st_ref[st_rows(q, cc), :] = carry[q]

    done_ref[0] = 0
    done_ref[1] = max_iter

    def body(it, _):
        def active():
            # ---- check update, in place, over 128-check chunks
            if adaptive:
                alpha = 1.0 - 2.0 ** (-(it + 1).astype(f32))
            else:
                alpha = alpha0
            # two streaming passes keep only O(1) (128, S) registers live
            # (holding all Dc planes at once overflows the VMEM stack)
            for cc in range(n_cc) if ablate != "no_check" else ():
                rows = slice(cc * _TILE, (cc + 1) * _TILE)
                synd_sign = 1.0 - 2.0 * synd_ref[rows, :].astype(f32)

                def plane(s):
                    return msg_ref[s * C_pad + cc * _TILE:
                                   s * C_pad + (cc + 1) * _TILE, :].astype(f32)

                if method == "ps":
                    total_sign = synd_sign
                    total = jnp.zeros_like(synd_sign)
                    for s in range(Dc):
                        p = plane(s)
                        total_sign = total_sign * jnp.where(p < 0, -1.0, 1.0)
                        total = total + _phi(jnp.abs(p))
                    for s in range(Dc):
                        p = plane(s)
                        out = (total_sign * jnp.where(p < 0, -1.0, 1.0)
                               * _phi(total - _phi(jnp.abs(p))))
                        msg_ref[s * C_pad + cc * _TILE:
                                s * C_pad + (cc + 1) * _TILE, :] = (
                            out.astype(jnp.bfloat16))
                elif fused:
                    n_s = chunk_slots(cc)
                    if n_s == 0:
                        continue
                    total_sign = st_ref[st_rows(0, cc), :]
                    min1a = st_ref[st_rows(1, cc), :] * alpha
                    min2a = st_ref[st_rows(2, cc), :] * alpha
                    arg = st_ref[st_rows(3, cc), :]
                    for s in range(n_s):
                        p = plane(s)
                        out = (total_sign * jnp.where(p < 0, -1.0, 1.0)
                               * jnp.where(arg == float(s), min2a, min1a))
                        msg_ref[s * C_pad + cc * _TILE:
                                s * C_pad + (cc + 1) * _TILE, :] = (
                            out.astype(jnp.bfloat16))
                else:
                    n_s = chunk_slots(cc)
                    if n_s == 0:
                        continue
                    total_sign = synd_sign
                    p = plane(0)
                    total_sign = total_sign * jnp.where(p < 0, -1.0, 1.0)
                    min1 = jnp.abs(p)
                    min2 = jnp.full_like(min1, _BIG)
                    arg = jnp.zeros_like(min1)
                    for s in range(1, n_s):
                        p = plane(s)
                        total_sign = total_sign * jnp.where(p < 0, -1.0, 1.0)
                        m = jnp.abs(p)
                        lt = m < min1
                        min2 = jnp.where(lt, min1, jnp.minimum(min2, m))
                        arg = jnp.where(lt, float(s), arg)
                        min1 = jnp.where(lt, m, min1)
                    for s in range(n_s):
                        p = plane(s)
                        out = (total_sign * jnp.where(p < 0, -1.0, 1.0)
                               * jnp.where(arg == float(s), min2, min1) * alpha)
                        msg_ref[s * C_pad + cc * _TILE:
                                s * C_pad + (cc + 1) * _TILE, :] = (
                            out.astype(jnp.bfloat16))

            # ---- variable totals: BSR tiles onto the MXU
            if ablate == "no_route":
                # copy-through stand-in keeping the loop-carried dependency
                for vt in range(V_pad // _TILE):
                    post_ref[vt * _TILE:(vt + 1) * _TILE, :] = (
                        jnp.broadcast_to(prior_t_ref[:, vt:vt + 1],
                                         (_TILE, S)))
                par_ref[:] = jnp.zeros((C_pad, S), jnp.bfloat16)
                for et in range(sched.e_pad // _TILE):
                    rows = slice(et * _TILE, (et + 1) * _TILE)
                    msg_ref[rows, :] = (-msg_ref[rows, :].astype(f32)).astype(
                        jnp.bfloat16)
                route_pairs = ()
            else:
                route_pairs = tuple(enumerate(sched.sched_m))
            for vt, pairs in route_pairs:
                tot = jnp.broadcast_to(prior_t_ref[:, vt:vt + 1], (_TILE, S))
                for et, t in pairs:
                    tot = tot + jnp.dot(onehot(t), etile(et),
                                        preferred_element_type=f32)
                post_ref[vt * _TILE:(vt + 1) * _TILE, :] = tot

            # ---- edge broadcast (transposed tiles) + in-flight parity
            # (parity rides the pass only when early_stop needs it per
            # iteration; fixed-iteration mode computes it once after the loop)
            if route_pairs and early_stop:
                par_ref[:] = jnp.zeros((C_pad, S), jnp.bfloat16)

            def routed_acc(et, pairs):
                acc = jnp.broadcast_to(mask_t_ref[:, et:et + 1], (_TILE, S))
                for vt, t in pairs:
                    pb = post_ref[vt * _TILE:(vt + 1) * _TILE, :].astype(
                        jnp.bfloat16)
                    acc = acc + jax.lax.dot_general(
                        onehot(t), pb, (((0,), (0,)), ((), ())),
                        preferred_element_type=f32)
                return acc

            if fused and route_pairs:
                # chunk-major order: each chunk's v2c messages stream
                # through the min/sign scan as they are produced, so the
                # next iteration's check output needs no separate pass.
                # A plane (s, cc) is live exactly when s < live_slots[cc]
                # (slot s has an edge iff some check in the chunk has
                # degree > s), so this covers precisely bcast_tiles().
                for cc in range(n_cc):
                    n_s = sched.live_slots[cc]
                    if n_s == 0:
                        continue
                    crows = slice(cc * _TILE, (cc + 1) * _TILE)
                    carry = (1.0 - 2.0 * synd_ref[crows, :].astype(f32),
                             ) + (None,) * 3
                    for s in range(n_s):
                        et = s * n_cc + cc
                        acc = routed_acc(et, sched.sched_g[et])
                        if early_stop:
                            # bf16 parity counts are exact up to Dc <= 256
                            par_ref[crows, :] = (
                                par_ref[crows, :]
                                + (acc <= 0.0).astype(jnp.bfloat16))
                        rows = slice(et * _TILE, (et + 1) * _TILE)
                        vb = (acc - msg_ref[rows, :].astype(f32)).astype(
                            jnp.bfloat16)
                        msg_ref[rows, :] = vb
                        carry = min_scan_step(s, vb.astype(f32), carry)
                    for q in range(4):
                        st_ref[st_rows(q, cc), :] = carry[q]
            else:
                for et, pairs in (bcast_tiles() if route_pairs else ()):
                    acc = routed_acc(et, pairs)
                    if early_stop:
                        coff = (et * _TILE) % C_pad
                        # bf16 parity counts are exact up to Dc <= 256
                        par_ref[coff:coff + _TILE, :] = (
                            par_ref[coff:coff + _TILE, :]
                            + (acc <= 0.0).astype(jnp.bfloat16))
                    rows = slice(et * _TILE, (et + 1) * _TILE)
                    msg_ref[rows, :] = (
                        acc - msg_ref[rows, :].astype(f32)).astype(jnp.bfloat16)

            if early_stop:
                bad = jnp.zeros((1, S), f32)
                for cc in range(n_cc):
                    rows = slice(cc * _TILE, (cc + 1) * _TILE)
                    p = par_ref[rows, :].astype(f32)
                    par2 = p - 2.0 * jnp.floor(p * 0.5)
                    bad = bad + jnp.sum(
                        jnp.abs(par2 - synd_ref[rows, :].astype(f32)),
                        axis=0, keepdims=True)

                @pl.when(jnp.max(bad) < 0.5)
                def _():
                    done_ref[0] = 1
                    done_ref[1] = it + 1

        if early_stop:
            pl.when(done_ref[0] == 0)(active)
        else:
            active()
        return 0

    jax.lax.fori_loop(0, max_iter, body, 0)

    if not early_stop and ablate != "no_route":
        # fixed-iteration mode skipped the per-iteration parity; one routed
        # pass over the final posterior produces it (same math the in-loop
        # accumulation would have run on the last iteration)
        par_ref[:] = jnp.zeros((C_pad, S), par_ref.dtype)
        for et, pairs in bcast_tiles():
            acc = jnp.broadcast_to(mask_t_ref[:, et:et + 1], (_TILE, S))
            for vt, t in pairs:
                pb = post_ref[vt * _TILE:(vt + 1) * _TILE, :].astype(
                    jnp.bfloat16)
                acc = acc + jax.lax.dot_general(
                    onehot(t), pb, (((0,), (0,)), ((), ())),
                    preferred_element_type=f32)
            coff = (et * _TILE) % C_pad
            par_ref[coff:coff + _TILE, :] = (
                par_ref[coff:coff + _TILE, :]
                + (acc <= 0.0).astype(jnp.bfloat16))

    # ---- final convergence flags from the parity accumulator
    bad = jnp.zeros((1, S), f32)
    for cc in range(n_cc):
        rows = slice(cc * _TILE, (cc + 1) * _TILE)
        p = par_ref[rows, :].astype(f32)
        par2 = p - 2.0 * jnp.floor(p * 0.5)
        bad = bad + jnp.sum(
            jnp.abs(par2 - synd_ref[rows, :].astype(f32)),
            axis=0, keepdims=True)
    conv_ref[:] = jnp.broadcast_to((bad < 0.5).astype(f32), conv_ref.shape)
    iters_ref[:] = jnp.full(iters_ref.shape, 1.0, f32) * done_ref[1].astype(f32)


def _kernel_dyn(synd_ref, prior_r_ref, mask_r_ref, idx_ref,
                m_start_ref, m_et_ref, m_t_ref,
                g_start_ref, g_vt_ref, g_t_ref,
                live_et_ref, live_slots_ref,
                post_ref, conv_ref, iters_ref,
                msg_ref, par_ref, done_ref, oh_ref,
                *, sched: BSRSchedule, method: str, max_iter: int,
                alpha0: float, adaptive: bool, early_stop: bool):
    """Dynamic-loop variant of :func:`_kernel`: identical math and
    accumulation order, but the per-tile / per-plane loops are rolled
    ``fori_loop``s over SMEM segment tables instead of Python-unrolled
    straight-line code.  Mosaic compile time is therefore O(1) in the tile
    count (the unrolled kernel pays ~53 s at 548 tiles, this one ~2 s),
    at a modest per-tile loop overhead.  Bit-exact against :func:`_kernel`
    in fixed-iteration mode (``tests/test_bp_bsr.py``).

    One-hot routing tiles are always materialized in VMEM scratch here (a
    dynamic tile id cannot index unrolled rebuild code).  The prior and the
    padding-row mask arrive in ROW-major (v_pad, 1)/(e_pad, 1) layouts:
    Mosaic only allows dynamic offsets on the sublane dimension, so the
    column-table layouts the unrolled kernel indexes statically are
    unreachable from a loop.
    """
    C_pad, V_pad, Dc = sched.c_pad, sched.v_pad, sched.dc
    n_cc = C_pad // _TILE
    n_et = sched.e_pad // _TILE
    n_vt = V_pad // _TILE
    S = synd_ref.shape[1]
    f32 = jnp.float32
    ms = method == "ms"
    # min-sum skips dead planes/tiles exactly (see _kernel); sum-product
    # keeps the full loops for bit-exactness with the generic core
    n_loop_et = int(sched.dyn["live_et"].shape[0]) if ms else n_et

    def rows128(start):
        return pl.ds(pl.multiple_of(start, _TILE), _TILE)

    @pl.when(pl.program_id(0) == 0)
    def _build_onehots():
        rows = jax.lax.broadcasted_iota(jnp.int32, (_TILE, _TILE), 0)

        def bo(t, _):
            oh_ref[rows128(t * _TILE), :] = (
                rows == idx_ref[pl.ds(t, 1), :]).astype(jnp.bfloat16)
            return 0

        jax.lax.fori_loop(0, sched.num_tiles, bo, 0)

    def oh(t):
        return oh_ref[rows128(t * _TILE), :]

    def loop_et(k):
        return live_et_ref[k] if ms else k

    def bcast_et(et, with_prior: bool):
        """mask column + sum of routed tiles for edge tile ``et`` — the
        shared shape of the init pass (routes the prior column) and the
        broadcast pass (routes the posterior block)."""
        col = mask_r_ref[rows128(et * _TILE), :]
        if with_prior:
            def inner(j, col):
                pcol = prior_r_ref[rows128(g_vt_ref[j] * _TILE), :].astype(
                    jnp.bfloat16)
                return col + jax.lax.dot_general(
                    oh(g_t_ref[j]), pcol, (((0,), (0,)), ((), ())),
                    preferred_element_type=f32)
        else:
            col = jnp.broadcast_to(col, (_TILE, S))

            def inner(j, acc):
                pb = post_ref[rows128(g_vt_ref[j] * _TILE), :].astype(
                    jnp.bfloat16)
                return acc + jax.lax.dot_general(
                    oh(g_t_ref[j]), pb, (((0,), (0,)), ((), ())),
                    preferred_element_type=f32)
        return jax.lax.fori_loop(
            g_start_ref[et], g_start_ref[et + 1], inner, col)

    # ---- init: v2c = prior at each edge's variable (+BIG on padding rows)
    def initf(et, _):
        msg_ref[rows128(et * _TILE), :] = jnp.broadcast_to(
            bcast_et(et, True), (_TILE, S)).astype(jnp.bfloat16)
        return 0

    jax.lax.fori_loop(0, n_et, initf, 0)

    done_ref[0] = 0
    done_ref[1] = max_iter

    def accum_parity(et, acc):
        coff = rows128((et % n_cc) * _TILE)
        par_ref[coff, :] = (par_ref[coff, :]
                            + (acc <= 0.0).astype(jnp.bfloat16))

    def body(it, _):
        def active():
            if adaptive:
                alpha = 1.0 - 2.0 ** (-(it + 1).astype(f32))
            else:
                alpha = alpha0

            # ---- check update, in place, over 128-check chunks
            def cc_body(cc, _):
                crow = rows128(cc * _TILE)
                synd_sign = 1.0 - 2.0 * synd_ref[crow, :].astype(f32)

                def prow(s):
                    return rows128(s * C_pad + cc * _TILE)

                if method == "ps":
                    def p1(s, carry):
                        tsign, tot = carry
                        p = msg_ref[prow(s), :].astype(f32)
                        return (tsign * jnp.where(p < 0, -1.0, 1.0),
                                tot + _phi(jnp.abs(p)))

                    tsign, tot = jax.lax.fori_loop(
                        0, Dc, p1, (synd_sign, jnp.zeros_like(synd_sign)))

                    def p2(s, _):
                        p = msg_ref[prow(s), :].astype(f32)
                        out = (tsign * jnp.where(p < 0, -1.0, 1.0)
                               * _phi(tot - _phi(jnp.abs(p))))
                        msg_ref[prow(s), :] = out.astype(jnp.bfloat16)
                        return 0

                    jax.lax.fori_loop(0, Dc, p2, 0)
                else:
                    n_s = live_slots_ref[cc]

                    @pl.when(n_s > 0)
                    def _chunk():
                        p = msg_ref[prow(0), :].astype(f32)
                        init = (synd_sign * jnp.where(p < 0, -1.0, 1.0),
                                jnp.abs(p),
                                jnp.full((_TILE, S), _BIG, f32),
                                jnp.zeros((_TILE, S), f32))

                        def p1(s, carry):
                            tsign, min1, min2, arg = carry
                            p = msg_ref[prow(s), :].astype(f32)
                            tsign = tsign * jnp.where(p < 0, -1.0, 1.0)
                            m = jnp.abs(p)
                            lt = m < min1
                            min2 = jnp.where(lt, min1, jnp.minimum(min2, m))
                            arg = jnp.where(lt, s.astype(f32), arg)
                            min1 = jnp.where(lt, m, min1)
                            return tsign, min1, min2, arg

                        tsign, min1, min2, arg = jax.lax.fori_loop(
                            1, n_s, p1, init)

                        def p2(s, _):
                            p = msg_ref[prow(s), :].astype(f32)
                            out = (tsign * jnp.where(p < 0, -1.0, 1.0)
                                   * jnp.where(arg == s.astype(f32),
                                               min2, min1) * alpha)
                            msg_ref[prow(s), :] = out.astype(jnp.bfloat16)
                            return 0

                        jax.lax.fori_loop(0, n_s, p2, 0)
                return 0

            jax.lax.fori_loop(0, n_cc, cc_body, 0)

            # ---- variable totals: segment loop over routed tiles
            def vt_body(vt, _):
                tot = jnp.broadcast_to(
                    prior_r_ref[rows128(vt * _TILE), :], (_TILE, S))

                def inner(k, tot):
                    return tot + jnp.dot(
                        oh(m_t_ref[k]), msg_ref[rows128(m_et_ref[k] * _TILE), :],
                        preferred_element_type=f32)

                tot = jax.lax.fori_loop(
                    m_start_ref[vt], m_start_ref[vt + 1], inner, tot)
                post_ref[rows128(vt * _TILE), :] = tot
                return 0

            jax.lax.fori_loop(0, n_vt, vt_body, 0)

            # ---- edge broadcast (transposed tiles) + in-flight parity
            if early_stop:
                par_ref[:] = jnp.zeros((C_pad, S), jnp.bfloat16)

            def et_body(k, _):
                et = loop_et(k)
                acc = bcast_et(et, False)
                if early_stop:
                    accum_parity(et, acc)
                erow = rows128(et * _TILE)
                msg_ref[erow, :] = (
                    acc - msg_ref[erow, :].astype(f32)).astype(jnp.bfloat16)
                return 0

            jax.lax.fori_loop(0, n_loop_et, et_body, 0)

            if early_stop:
                def bb(cc, bad):
                    crow = rows128(cc * _TILE)
                    p = par_ref[crow, :].astype(f32)
                    par2 = p - 2.0 * jnp.floor(p * 0.5)
                    return bad + jnp.sum(
                        jnp.abs(par2 - synd_ref[crow, :].astype(f32)),
                        axis=0, keepdims=True)

                bad = jax.lax.fori_loop(0, n_cc, bb, jnp.zeros((1, S), f32))

                @pl.when(jnp.max(bad) < 0.5)
                def _():
                    done_ref[0] = 1
                    done_ref[1] = it + 1

        if early_stop:
            pl.when(done_ref[0] == 0)(active)
        else:
            active()
        return 0

    jax.lax.fori_loop(0, max_iter, body, 0)

    if not early_stop:
        # fixed-iteration mode skipped the per-iteration parity; one routed
        # pass over the final posterior produces it
        par_ref[:] = jnp.zeros((C_pad, S), par_ref.dtype)

        def fp(k, _):
            et = loop_et(k)
            accum_parity(et, bcast_et(et, False))
            return 0

        jax.lax.fori_loop(0, n_loop_et, fp, 0)

    # ---- final convergence flags from the parity accumulator
    def fb(cc, bad):
        crow = rows128(cc * _TILE)
        p = par_ref[crow, :].astype(f32)
        par2 = p - 2.0 * jnp.floor(p * 0.5)
        return bad + jnp.sum(
            jnp.abs(par2 - synd_ref[crow, :].astype(f32)),
            axis=0, keepdims=True)

    bad = jax.lax.fori_loop(0, n_cc, fb, jnp.zeros((1, S), f32))
    conv_ref[:] = jnp.broadcast_to((bad < 0.5).astype(f32), conv_ref.shape)
    iters_ref[:] = jnp.full(iters_ref.shape, 1.0, f32) * done_ref[1].astype(f32)


_SAT = 127           # int8 message saturation magnitude
_ALPHA_SHIFT = 8     # min-sum scaling as alpha_num / 2^8, exact in ints
_DEAD = 2 * _SAT     # dead-edge-row routed value: stays +_SAT after exclusion


def _kernel_int8(synd_ref, prior_t_ref, prior8_t_ref, maski_t_ref, idx_ref,
                 post_ref, conv_ref, iters_ref,
                 msg_ref, par_ref, done_ref, oh_ref=None,
                 *, sched: BSRSchedule, max_iter: int, alpha_num: int,
                 early_stop: bool):
    """int8 fixed-point min-sum variant of :func:`_kernel`.

    Integer math identical to :func:`~exp_ldpc_tpu.decoders.bp_int8.
    _int8_bp_core` (saturating posteriors, exact rational scaling), so the
    two kernels are BIT-EXACT against each other in fixed-iteration mode —
    the strongest cross-backend check available.  Messages are int8 (half
    the bf16 kernel's VMEM/bandwidth) and the routing dots are NATIVE
    int8 x int8 -> int32 MXU ops — v5e's int8 systolic path has 2x the
    bf16 peak, and staying integer end-to-end also deletes the per-tile
    int8->bf16 VPU casts the first version of this kernel paid for.
    """
    C_pad, V_pad, Dc = sched.c_pad, sched.v_pad, sched.dc
    n_cc = C_pad // _TILE
    S = synd_ref.shape[1]
    f32, i32 = jnp.float32, jnp.int32

    if oh_ref is not None:
        @pl.when(pl.program_id(0) == 0)
        def _build_onehots():
            rows = jax.lax.broadcasted_iota(jnp.int32, (_TILE, _TILE), 0)
            for t in range(sched.num_tiles):
                oh_ref[t * _TILE:(t + 1) * _TILE, :] = (
                    rows == idx_ref[t:t + 1, :]).astype(jnp.int8)

        def onehot(t):
            return oh_ref[t * _TILE:(t + 1) * _TILE, :]
    else:
        def onehot(t):
            rows = jax.lax.broadcasted_iota(jnp.int32, (_TILE, _TILE), 0)
            return (rows == idx_ref[t:t + 1, :]).astype(jnp.int8)

    def etile(i):
        return msg_ref[i * _TILE:(i + 1) * _TILE, :]

    # ---- init: v2c = saturated prior at each edge's variable, +SAT on pads
    for et, pairs in enumerate(sched.sched_g):
        col = maski_t_ref[:, et:et + 1]  # _DEAD on dead rows
        for vt, t in pairs:
            pcol = prior8_t_ref[:, vt:vt + 1].astype(jnp.int8)
            col = col + jax.lax.dot_general(
                onehot(t), pcol, (((0,), (0,)), ((), ())),
                preferred_element_type=i32)
        col = jnp.clip(col, -_SAT, _SAT)
        msg_ref[et * _TILE:(et + 1) * _TILE, :] = jnp.broadcast_to(
            col, (_TILE, S)).astype(jnp.int8)

    done_ref[0] = 0
    done_ref[1] = max_iter

    def live_tiles():
        # dead (slot, chunk) cells stay at +_SAT from init (the masked
        # _DEAD value is clipped to _SAT before storing): min-sum never
        # selects them and the skipped passes never rewrite them — exact
        for et, pairs in enumerate(sched.sched_g):
            if pairs:
                yield et, pairs

    def body(it, _):
        def active():
            # ---- integer min-sum check update, streaming over planes
            for cc in range(n_cc):
                n_s = sched.live_slots[cc]
                if n_s == 0:
                    continue
                rows = slice(cc * _TILE, (cc + 1) * _TILE)
                synd_i = synd_ref[rows, :].astype(i32)

                def plane(s):
                    return msg_ref[s * C_pad + cc * _TILE:
                                   s * C_pad + (cc + 1) * _TILE, :].astype(i32)

                p = plane(0)
                neg_tot = synd_i + (p < 0).astype(i32)
                min1 = jnp.abs(p)
                # When padded planes were skipped (n_s < Dc), they would
                # have clamped the second-min at +_SAT; seed min2 there so
                # a degree-1 chunk cannot produce _SAT+1 (which wraps to
                # -128 after alpha scaling at alpha_num=256).
                min2 = jnp.full_like(min1, _SAT if n_s < Dc else _SAT + 1)
                arg = jnp.zeros_like(min1)
                for s in range(1, n_s):
                    p = plane(s)
                    neg_tot = neg_tot + (p < 0).astype(i32)
                    m = jnp.abs(p)
                    lt = m < min1
                    min2 = jnp.where(lt, min1, jnp.minimum(min2, m))
                    arg = jnp.where(lt, s, arg)
                    min1 = jnp.where(lt, m, min1)
                for s in range(n_s):
                    p = plane(s)
                    ext = jnp.where(arg == s, min2, min1)
                    scaled = (ext * alpha_num) >> _ALPHA_SHIFT
                    ext_neg = (neg_tot + (p < 0).astype(i32)) % 2 == 1
                    out = jnp.where(ext_neg, -scaled, scaled)
                    msg_ref[s * C_pad + cc * _TILE:
                            s * C_pad + (cc + 1) * _TILE, :] = (
                        out.astype(jnp.int8))

            # ---- variable totals: native int8 MXU dots, int32 accumulation
            for vt, pairs in enumerate(sched.sched_m):
                tot = jnp.zeros((_TILE, S), i32)
                for et, t in pairs:
                    tot = tot + jnp.dot(onehot(t), etile(et),
                                        preferred_element_type=i32)
                post_ref[vt * _TILE:(vt + 1) * _TILE, :] = (
                    prior_t_ref[:, vt:vt + 1] + tot)

            # ---- edge broadcast of the saturated posterior (+ parity only
            # when the early exit consumes it each iteration)
            if early_stop:
                par_ref[:] = jnp.zeros((C_pad, S), i32)
            for et, pairs in live_tiles():
                acc = jnp.broadcast_to(
                    maski_t_ref[:, et:et + 1], (_TILE, S))
                for vt, t in pairs:
                    pb = jnp.clip(post_ref[vt * _TILE:(vt + 1) * _TILE, :],
                                  -_SAT, _SAT).astype(jnp.int8)
                    acc = acc + jax.lax.dot_general(
                        onehot(t), pb, (((0,), (0,)), ((), ())),
                        preferred_element_type=i32)
                acc_i = acc  # post8[var(e)], or _DEAD on pads
                if early_stop:
                    coff = (et * _TILE) % C_pad
                    par_ref[coff:coff + _TILE, :] = (
                        par_ref[coff:coff + _TILE, :]
                        + (acc_i <= 0).astype(i32))
                rows = slice(et * _TILE, (et + 1) * _TILE)
                v2c = jnp.clip(acc_i - msg_ref[rows, :].astype(i32),
                               -_SAT, _SAT)
                msg_ref[rows, :] = v2c.astype(jnp.int8)

            if early_stop:
                bad = jnp.zeros((1, S), i32)
                for cc in range(n_cc):
                    rows = slice(cc * _TILE, (cc + 1) * _TILE)
                    par2 = par_ref[rows, :] % 2
                    bad = bad + jnp.sum(
                        jnp.abs(par2 - synd_ref[rows, :].astype(i32)),
                        axis=0, keepdims=True)

                @pl.when(jnp.max(bad) < 1)
                def _():
                    done_ref[0] = 1
                    done_ref[1] = it + 1

        if early_stop:
            pl.when(done_ref[0] == 0)(active)
        else:
            active()
        return 0

    jax.lax.fori_loop(0, max_iter, body, 0)

    if not early_stop:
        # fixed-iteration mode: one routed parity pass over the final
        # posterior replaces the skipped per-iteration accumulation
        par_ref[:] = jnp.zeros((C_pad, S), i32)
        for et, pairs in live_tiles():
            acc = jnp.broadcast_to(maski_t_ref[:, et:et + 1], (_TILE, S))
            for vt, t in pairs:
                pb = jnp.clip(post_ref[vt * _TILE:(vt + 1) * _TILE, :],
                              -_SAT, _SAT).astype(jnp.int8)
                acc = acc + jax.lax.dot_general(
                    onehot(t), pb, (((0,), (0,)), ((), ())),
                    preferred_element_type=i32)
            coff = (et * _TILE) % C_pad
            par_ref[coff:coff + _TILE, :] = (
                par_ref[coff:coff + _TILE, :] + (acc <= 0).astype(i32))

    bad = jnp.zeros((1, S), i32)
    for cc in range(n_cc):
        rows = slice(cc * _TILE, (cc + 1) * _TILE)
        par2 = par_ref[rows, :] % 2
        bad = bad + jnp.sum(
            jnp.abs(par2 - synd_ref[rows, :].astype(i32)),
            axis=0, keepdims=True)
    conv_ref[:] = jnp.broadcast_to((bad < 1).astype(f32), conv_ref.shape)
    iters_ref[:] = jnp.full(iters_ref.shape, 1.0, f32) * done_ref[1].astype(f32)


# tile count at which the dynamic-loop kernel takes over from the unrolled
# one under loop_mode="auto".  Mosaic does not software-pipeline dots whose
# operands are loop-dependent dynamic slices, so the dynamic kernel runs
# ~7x slower than unrolled straight-line code (0.41M vs 2.97M iter*shots/s
# on the 548-tile cyclic LP) while compiling in ~2 s vs ~53 s.  With the
# persistent compilation cache (utils/compile_cache.py) the unrolled
# compile is a once-per-machine cost, so auto keeps the fast kernel up to
# very large schedules and uses dynamic only where an uncached first
# compile would take many minutes.
#
# NOTE: the dynamic hatch is DIRECT-CALL-ONLY.  make_bp_decoder can never
# reach it: at >= 3000 tiles the always-materialized one-hot scratch alone
# (~98 MiB bf16) exceeds fits_bsr's 64 MiB budget, so selection rejects
# BSR before loop_mode is consulted; a direct bsr_bp_decode caller at that
# scale must also keep shot_block small enough that messages + the
# unconditional oh_ref scratch fit the 116 MiB scoped cap.
_DYN_MIN_TILES = 3000


def _resolve_loop_mode(sched: BSRSchedule, loop_mode: str, ablate: str) -> str:
    if ablate:
        return "unrolled"  # the ablation hooks live in the unrolled kernel
    if loop_mode == "auto":
        return "dynamic" if sched.num_tiles >= _DYN_MIN_TILES else "unrolled"
    if loop_mode not in ("unrolled", "dynamic"):
        raise ValueError(f"unknown loop_mode {loop_mode!r}")
    return loop_mode


def _auto_shot_block(sched: BSRSchedule) -> int:
    """256-shot blocks measured ~8% faster than 128 on the pre-fusion
    kernel (cyclic LP n=4862: 3.31M vs 3.06M iter*shots/s) and no slower
    since the check-scan fusion (3.48M vs 3.49M), but Mosaic's scoped-VMEM
    stack demand runs ~1.6x the naive operand estimate and the n=10000 HGP
    at 256 already overflows the 116 MiB cap.  Auto picks 256 only when
    the estimate stays comfortably inside that calibration margin.

    A 512 tier for small schedules was evaluated and REJECTED: a single
    probe read +15% on HGP-225 (153.8M), but a 5-run fresh-process
    variance suite put the 512 median at 133.4M vs the 256 median 138.6M
    — tunnel timing noise includes occasional 50%+ outliers
    (``artifacts/bench_variance_v5e.jsonl``), so the probe was noise."""
    sb = 256
    msg = 2 * sched.e_pad * sb
    state = 4 * sb * (sched.v_pad + 2 * sched.c_pad)
    state += 16 * sched.c_pad * sb  # min-sum fused check-scan scratch
    onehots = sched.num_tiles * _TILE * _TILE * 2
    temps = 4 * 8 * _TILE * sb
    return sb if msg + state + onehots + temps < 56 * 2**20 else 128


def _resolve_onehot_vmem(sched: BSRSchedule, shot_block: int, msg_bytes: int,
                         onehot_vmem) -> bool:
    """Auto: materialize one-hot tiles in VMEM when total residency fits the
    scoped limit (with slack for posterior/parity/temporaries)."""
    if onehot_vmem is not None:
        return bool(onehot_vmem)
    oh = sched.num_tiles * _TILE * _TILE * 2
    state = 4 * shot_block * (sched.v_pad + 2 * sched.c_pad)
    return oh + msg_bytes + state < 80 * 2**20


@partial(jax.jit, static_argnames=("sched", "max_iter", "alpha_num",
                                   "early_stop", "shot_block", "interpret",
                                   "onehot_vmem"))
def bsr_bp_decode_int8(sched: BSRSchedule, prior_q, syndromes,
                       max_iter: int, alpha_num: int,
                       early_stop: bool = True, shot_block: int = 128,
                       interpret: bool = False,
                       onehot_vmem: Optional[bool] = None):
    """int8 BSR decode.  ``prior_q`` are int32 LLR quanta
    (:func:`~exp_ldpc_tpu.decoders.bp_int8.quantize_priors`); the returned
    posterior is in quanta (int32) — scale by delta for LLR units."""
    # runs at trace time, i.e. exactly once before each fresh compile —
    # large-tile-count kernels pay ~1 min Mosaic compiles; the persistent
    # cache makes them a once-per-machine cost instead of once-per-process
    enable_compilation_cache()
    C, V = sched.num_checks, sched.num_vars
    C_pad, V_pad = sched.c_pad, sched.v_pad
    Cs, S = syndromes.shape
    assert Cs == C
    shot_block = min(shot_block, _round_up(S, _TILE))  # see bsr_bp_decode
    S_pad = _round_up(S, shot_block)

    synd = jnp.zeros((C_pad, S_pad), jnp.int8)
    synd = synd.at[:C, :S].set(syndromes.astype(jnp.int8))

    n_vt = V_pad // _TILE
    prior_pad = jnp.pad(jnp.asarray(prior_q, jnp.int32), (0, V_pad - V))
    prior_t = prior_pad.reshape(n_vt, _TILE).T
    prior8_t = jnp.clip(prior_t, -_SAT, _SAT)

    maski_t = np.where(sched.mask_t > 0, _DEAD, 0).astype(np.int32)

    use_oh = _resolve_onehot_vmem(
        sched, shot_block, sched.e_pad * shot_block, onehot_vmem)
    kernel = partial(_kernel_int8, sched=sched, max_iter=max_iter,
                     alpha_num=int(alpha_num), early_stop=early_stop)

    grid = (S_pad // shot_block,)
    blk = lambda r: pl.BlockSpec(  # noqa: E731
        (r, shot_block), lambda s: (0, s), memory_space=pltpu.VMEM)
    full = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, lambda s: tuple(0 for _ in shape), memory_space=pltpu.VMEM)

    scratch = [
        pltpu.VMEM((sched.e_pad, shot_block), jnp.int8),   # messages
        pltpu.VMEM((C_pad, shot_block), jnp.int32),        # parity
        pltpu.SMEM((2,), jnp.int32),                       # done, iter
    ]
    if use_oh:
        scratch.append(
            pltpu.VMEM((sched.num_tiles * _TILE, _TILE), jnp.int8))

    post, conv, iters = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            blk(C_pad),
            full(prior_t.shape),
            full(prior8_t.shape),
            full(maski_t.shape),
            full(sched.idx.shape),
        ],
        out_specs=[blk(V_pad), blk(8), blk(8)],
        out_shape=[
            jax.ShapeDtypeStruct((V_pad, S_pad), jnp.int32),
            jax.ShapeDtypeStruct((8, S_pad), jnp.float32),
            jax.ShapeDtypeStruct((8, S_pad), jnp.float32),
        ],
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT) if not interpret else None,
        interpret=interpret,
    )(synd, prior_t, prior8_t, jnp.asarray(maski_t), jnp.asarray(sched.idx))

    posterior = post[:V, :S]
    hard = (posterior <= 0).astype(jnp.uint8)
    return hard, posterior, conv[0, :S] > 0.5, iters[0, :S].astype(jnp.int32)


@partial(jax.jit, static_argnames=("sched", "method", "max_iter",
                                   "ms_scaling_factor", "early_stop",
                                   "shot_block", "interpret", "ablate",
                                   "onehot_vmem", "loop_mode"))
def bsr_bp_decode(sched: BSRSchedule, prior_llr, syndromes, method: str,
                  max_iter: int, ms_scaling_factor, early_stop: bool = True,
                  shot_block: int = 128, interpret: bool = False,
                  ablate: str = "", onehot_vmem: Optional[bool] = None,
                  loop_mode: str = "auto"):
    """syndromes (C, S) uint8 -> (hard (V,S) uint8, posterior (V,S) f32,
    converged (S,) bool, iters (S,) int32) — the ``_bp_core`` contract
    (global early exit, see module docstring)."""
    # trace-time side effect: persistent compile cache on before compiling
    enable_compilation_cache()
    C, V = sched.num_checks, sched.num_vars
    C_pad, V_pad = sched.c_pad, sched.v_pad
    Cs, S = syndromes.shape
    assert Cs == C
    # don't pad a small batch up to a large block (the auto block can be
    # 256); the clamp is trace-time static, so it recompiles only when the
    # batch shape itself changes — which already forces a recompile
    shot_block = min(shot_block, _round_up(S, _TILE))
    S_pad = _round_up(S, shot_block)

    synd = jnp.zeros((C_pad, S_pad), jnp.bfloat16)
    synd = synd.at[:C, :S].set(syndromes.astype(jnp.bfloat16))

    prior_t = jnp.zeros((_TILE, V_pad // _TILE), jnp.float32)
    prior_t = prior_t.at[:, :].set(
        jnp.pad(jnp.asarray(prior_llr, jnp.float32), (0, V_pad - V))
        .reshape(V_pad // _TILE, _TILE).T)

    mode = _resolve_loop_mode(sched, loop_mode, ablate)
    grid = (S_pad // shot_block,)
    blk = lambda r: pl.BlockSpec(  # noqa: E731
        (r, shot_block), lambda s: (0, s), memory_space=pltpu.VMEM)
    full = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, lambda s: tuple(0 for _ in shape), memory_space=pltpu.VMEM)
    smem = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, lambda s: tuple(0 for _ in shape), memory_space=pltpu.SMEM)

    scratch = [
        pltpu.VMEM((sched.e_pad, shot_block), jnp.bfloat16),  # messages
        pltpu.VMEM((C_pad, shot_block), jnp.bfloat16),        # parity
        pltpu.SMEM((2,), jnp.int32),                          # done, iter
    ]
    base_specs = [
        blk(C_pad),                      # syndromes
        full(prior_t.shape),             # priors, (128, n_vt)
        full(sched.mask_t.shape),        # padding-row mask, (128, n_et)
        full(sched.idx.shape),           # tile index table
    ]
    base_args = (synd, prior_t, jnp.asarray(sched.mask_t),
                 jnp.asarray(sched.idx))

    if mode == "dynamic":
        kernel = partial(_kernel_dyn, sched=sched, method=method,
                         max_iter=max_iter, alpha0=float(ms_scaling_factor),
                         adaptive=float(ms_scaling_factor) == 0.0,
                         early_stop=early_stop)
        # row-major prior/mask: dynamic offsets must land on sublanes
        prior_r = jnp.pad(jnp.asarray(prior_llr, jnp.float32),
                          (0, V_pad - V)).reshape(-1, 1)
        mask_r = jnp.asarray(sched.mask_t.T.reshape(-1, 1))
        base_specs[1] = full(prior_r.shape)
        base_specs[2] = full(mask_r.shape)
        base_args = (synd, prior_r, mask_r, base_args[3])
        dyn = sched.dyn
        dyn_names = ("m_start", "m_et", "m_t", "g_start", "g_vt", "g_t",
                     "live_et", "live_slots")
        in_specs = base_specs + [smem(dyn[k].shape) for k in dyn_names]
        args = base_args + tuple(jnp.asarray(dyn[k]) for k in dyn_names)
        scratch.append(
            pltpu.VMEM((sched.num_tiles * _TILE, _TILE), jnp.bfloat16))
    else:
        use_oh = _resolve_onehot_vmem(
            sched, shot_block, 2 * sched.e_pad * shot_block, onehot_vmem)
        kernel0 = partial(_kernel, sched=sched, method=method,
                          max_iter=max_iter, alpha0=float(ms_scaling_factor),
                          adaptive=float(ms_scaling_factor) == 0.0,
                          early_stop=early_stop, ablate=ablate)
        in_specs = base_specs
        args = base_args
        extra_names = []
        if use_oh:
            scratch.append(
                pltpu.VMEM((sched.num_tiles * _TILE, _TILE), jnp.bfloat16))
            extra_names.append("oh_ref")
        if method == "ms" and ablate == "":
            # fused min/sign scan state: (sign, min1, min2, argmin) per check
            scratch.append(pltpu.VMEM((4 * C_pad, shot_block), jnp.float32))
            extra_names.append("st_ref")

        def kernel(*refs):
            return kernel0(*refs[:10],
                           **dict(zip(extra_names, refs[10:])))

    post, conv, iters = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=[blk(V_pad), blk(8), blk(8)],
        out_shape=[
            jax.ShapeDtypeStruct((V_pad, S_pad), jnp.float32),
            jax.ShapeDtypeStruct((8, S_pad), jnp.float32),
            jax.ShapeDtypeStruct((8, S_pad), jnp.float32),
        ],
        scratch_shapes=scratch,
        # the default 16 MiB scoped-VMEM cap is conservative; the long
        # unrolled tile schedule needs stack room beyond the resident state
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT) if not interpret else None,
        interpret=interpret,
    )(*args)

    posterior = post[:V, :S]
    hard = (posterior <= 0).astype(jnp.uint8)
    return hard, posterior, conv[0, :S] > 0.5, iters[0, :S].astype(jnp.int32)


@dataclass
class BSRBPDecoder:
    """Batched BP for large codes via the BSR routing kernel; drop-in for
    :class:`~exp_ldpc_tpu.decoders.bp.BPDecoder` (same ``decode_batch``
    contract, global-early-exit semantics).  ``check_perm``/``var_perm``
    (new->old) pre-permute H for tile locality (e.g. the QC layouts of
    ``codes/qc_meta.py``); outputs return in ORIGINAL column order."""

    sched: BSRSchedule
    prior_llr: np.ndarray
    method: str = "ps"
    max_iter: int = 0
    ms_scaling_factor: float = 0.0
    early_stop: bool = True
    # None -> auto (_auto_shot_block): 256 where the VMEM budget safely
    # allows, 128 otherwise
    shot_block: Optional[int] = None
    interpret: bool = False
    check_perm: Optional[np.ndarray] = None
    inv_var_perm: Optional[np.ndarray] = None  # old -> new
    # "bfloat16" (default, any method) or "int8" (fixed-point min-sum,
    # bit-exact vs decoders.bp_int8).  int8 is ABLATION-ONLY: despite half
    # the VMEM/bandwidth it measured SLOWER than bf16 on v5e (2.55M vs
    # 3.45M iter*shots/s on the n=4862 cyclic LP at shot_block 256; 21.9M
    # vs 32.9M on QC-LP [[1054,140]] — artifacts/bp_families_v5e.jsonl):
    # the integer VPU min/sign reduction costs more, and the int8 MXU dot
    # is only 1.3x bf16 at this shape (artifacts/mxu_dtypes_v5e.jsonl).
    # make_bp_decoder never selects it; request it only for ablations.
    msg_dtype: str = "bfloat16"
    prior_quanta: int = 24
    # one-hot routing tiles in VMEM scratch (None = auto by VMEM budget);
    # pure scheduling choice, bit-exact either way
    onehot_vmem: Optional[bool] = None
    # "auto" (default: dynamic above _DYN_MIN_TILES), "unrolled", "dynamic";
    # pure compile-time/scheduling choice, bit-exact either way
    loop_mode: str = "auto"

    def __post_init__(self):
        method = {"ps": "ps", "psl": "ps", "ms": "ms", "msl": "ms"}.get(self.method)
        if method is None:
            raise ValueError(f"unknown bp method {self.method!r}")
        object.__setattr__(self, "method", method)
        if self.max_iter <= 0:
            object.__setattr__(self, "max_iter", self.sched.num_vars)
        if self.msg_dtype not in ("bfloat16", "int8"):
            raise ValueError(f"unknown msg_dtype {self.msg_dtype!r}")
        if self.shot_block is None:
            object.__setattr__(self, "shot_block", _auto_shot_block(self.sched))
        if self.msg_dtype == "int8":
            if self.method != "ms":
                raise ValueError("int8 BSR supports min-sum only")
            if not 0 < self.ms_scaling_factor <= 1:
                raise ValueError(
                    "int8 BSR needs a fixed scaling factor in (0, 1]")
            from .bp_int8 import quantize_priors
            q, delta = quantize_priors(self.prior_llr, self.prior_quanta)
            object.__setattr__(self, "_prior_q", q)
            object.__setattr__(self, "_delta", delta)

    @classmethod
    def from_check_matrix(
        cls,
        H,
        *,
        error_rate: Optional[float] = None,
        channel_probs: Optional[np.ndarray] = None,
        max_iter: int = 0,
        bp_method: str = "ps",
        ms_scaling_factor: float = 0.0,
        early_stop: bool = True,
        shot_block: Optional[int] = None,
        interpret: bool = False,
        check_perm: Optional[np.ndarray] = None,
        var_perm: Optional[np.ndarray] = None,
        msg_dtype: str = "bfloat16",
        prior_quanta: int = 24,
        onehot_vmem: Optional[bool] = None,
        loop_mode: str = "auto",
        **_ignored,
    ) -> "BSRBPDecoder":
        H = sparse.csr_matrix(H)
        if check_perm is not None:
            check_perm = np.asarray(check_perm, dtype=np.int64)
            H = H[check_perm]
        if var_perm is not None:
            var_perm = np.asarray(var_perm, dtype=np.int64)
            H = H[:, var_perm]
        sched = BSRSchedule.from_tanner(TannerELL.from_check_matrix(H))
        if channel_probs is not None:
            prior = np.asarray(channel_probs, dtype=np.float64)
        elif error_rate is not None:
            prior = np.full(sched.num_vars, error_rate, dtype=np.float64)
        else:
            raise ValueError("must supply error_rate or channel_probs")
        if prior.shape[0] != sched.num_vars:
            raise ValueError(f"channel_probs must have {sched.num_vars} entries")
        if var_perm is not None:
            prior = prior[var_perm]
        inv_var_perm = None
        if var_perm is not None:
            inv_var_perm = np.empty_like(var_perm)
            inv_var_perm[var_perm] = np.arange(var_perm.shape[0])
        return cls(
            sched=sched,
            prior_llr=priors_to_llr(prior),
            method=bp_method,
            max_iter=max_iter,
            ms_scaling_factor=float(ms_scaling_factor),
            early_stop=early_stop,
            shot_block=shot_block,
            interpret=interpret,
            check_perm=check_perm,
            inv_var_perm=inv_var_perm,
            msg_dtype=msg_dtype,
            prior_quanta=prior_quanta,
            onehot_vmem=onehot_vmem,
            loop_mode=loop_mode,
        )

    def decode_batch(self, syndromes: np.ndarray):
        syndromes = np.asarray(syndromes, dtype=np.uint8)
        if self.check_perm is not None:
            syndromes = syndromes[:, self.check_perm]
        if self.msg_dtype == "int8":
            alpha_num = int(round(self.ms_scaling_factor * 256))
            hard, post, conv, iters = bsr_bp_decode_int8(
                self.sched,
                jnp.asarray(self._prior_q),
                jnp.asarray(syndromes).T,
                self.max_iter,
                alpha_num,
                self.early_stop,
                self.shot_block,
                self.interpret,
                self.onehot_vmem,
            )
            post = post.astype(jnp.float32) * self._delta
        else:
            hard, post, conv, iters = bsr_bp_decode(
                self.sched,
                jnp.asarray(self.prior_llr),
                jnp.asarray(syndromes).T,
                self.method,
                self.max_iter,
                float(self.ms_scaling_factor),
                self.early_stop,
                self.shot_block,
                self.interpret,
                "",
                self.onehot_vmem,
                self.loop_mode,
            )
        hard, post = hard.T, post.T
        if self.inv_var_perm is not None:
            hard = jnp.asarray(hard)[:, self.inv_var_perm]
            post = jnp.asarray(post)[:, self.inv_var_perm]
        return hard, post, conv, iters

    def decode(self, syndrome: np.ndarray):
        hard, _post, _conv, _it = self.decode_batch(np.asarray(syndrome)[None, :])
        return np.asarray(hard[0])
