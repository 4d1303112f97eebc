#!/usr/bin/env python
"""Microbenchmark the candidate primitives for a K-scalable QC BP kernel.

Question: for a block-circulant code with K monomial planes of shape (L, S),
what does each candidate data-movement/reduction primitive cost per pass on
the real chip?  Candidates:

  A. row gather, edge granularity   — x (E+1, S) f32,  idx (E,)      [current
     generic-gather path; suspected per-row overhead bound]
  B. row gather, plane granularity  — x (K+1, L*S) f32, idx (K,)
  C. one-hot segment matmul         — (nb, K) @ (K, L*S), f32 and bf16
  D. bit-decomposed masked roll     — 5 passes of roll+select on (K, L, S)
  E. shift-grouped static rolls     — <=L contiguous-group rolls (K, L, S)
  F. check-update-like elementwise  — sign/min tree on (mb, Dc, L, S)

Methodology per CLAUDE.md: distinct inputs per repeat scanned on device,
two repeat counts, slope fit.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

# cyclic LP n=4862 scale
K, L, S = 980, 22, 1024
E = K * L
mb, nb, Dc = 70, 221, 14

rng = np.random.default_rng(0)


def slope_time(fn, make_input, reps_lo=4, reps_hi=16):
    """Scan fn over distinct inputs on device; return per-call seconds."""
    lo = jnp.stack([make_input(i) for i in range(reps_lo)])
    hi = jnp.stack([make_input(100 + i) for i in range(reps_hi)])

    @jax.jit
    def run(xs):
        def step(carry, x):
            return carry + fn(x).sum(), None
        out, _ = jax.lax.scan(step, jnp.float32(0), xs)
        return out

    run(lo).block_until_ready()
    run(hi).block_until_ready()

    def timed(x):
        best = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            run(x).block_until_ready()
            best = min(best, time.perf_counter() - t0)
        return best

    return (timed(hi) - timed(lo)) / (reps_hi - reps_lo)


def report(name, sec, bytes_moved=None, flops=None):
    msg = f"{name:42s} {sec*1e6:9.1f} us"
    if bytes_moved:
        msg += f"  {bytes_moved/sec/1e9:8.1f} GB/s"
    if flops:
        msg += f"  {flops/sec/1e12:6.2f} Tf/s"
    print(msg, flush=True)


# A. edge-granularity gather
idxA = jnp.asarray(rng.permutation(E).astype(np.int32))
xA = lambda i: jnp.asarray(rng.standard_normal((E + 1, S)).astype(np.float32))
tA = slope_time(lambda x: x[idxA], xA)
report("A gather E rows x (S f32)", tA, bytes_moved=2 * E * S * 4)

# B. plane-granularity gather
idxB = jnp.asarray(rng.permutation(K).astype(np.int32))
xB = lambda i: jnp.asarray(rng.standard_normal((K + 1, L * S)).astype(np.float32))
tB = slope_time(lambda x: x[idxB], xB)
report("B gather K rows x (L*S f32)", tB, bytes_moved=2 * K * L * S * 4)

# C. one-hot segment matmul
A_mat = np.zeros((nb, K), np.float32)
A_mat[rng.integers(0, nb, K), np.arange(K)] = 1.0
Aj = jnp.asarray(A_mat)
xC = lambda i: jnp.asarray(rng.standard_normal((K, L * S)).astype(np.float32))
tC = slope_time(lambda x: Aj @ x, xC)
report("C one-hot matmul (nb,K)@(K,L*S) f32", tC, flops=2 * nb * K * L * S)

Ab = Aj.astype(jnp.bfloat16)
xCb = lambda i: jnp.asarray(rng.standard_normal((K, L * S)).astype(np.float32)).astype(jnp.bfloat16)
tCb = slope_time(lambda x: jnp.dot(Ab, x, preferred_element_type=jnp.float32), xCb)
report("C one-hot matmul bf16", tCb, flops=2 * nb * K * L * S)

# also the back-matmul (K, nb) @ (nb, L*S)
G_mat = jnp.asarray(A_mat.T.copy())
xC2 = lambda i: jnp.asarray(rng.standard_normal((nb, L * S)).astype(np.float32))
tC2 = slope_time(lambda x: G_mat @ x, xC2)
report("C back matmul (K,nb)@(nb,L*S) f32", tC2, flops=2 * nb * K * L * S)

# D. bit-decomposed masked roll (5 passes)
shifts = rng.integers(0, L, K)
bits = [jnp.asarray(((shifts >> b) & 1).astype(np.float32))[:, None, None] for b in range(5)]

def bitroll(x):
    x = x.reshape(K, L, S)
    for b in range(5):
        x = bits[b] * jnp.roll(x, 1 << b, axis=1) + (1 - bits[b]) * x
    return x

xD = lambda i: jnp.asarray(rng.standard_normal((K, L, S)).astype(np.float32))
tD = slope_time(bitroll, xD)
report("D bit-decomposed roll 5-pass f32", tD, bytes_moved=2 * 5 * K * L * S * 4)

# E. shift-grouped static rolls (planes sorted by shift: contiguous groups)
order = np.argsort(shifts)
gshifts = shifts[order]
bounds = [0] + [int(np.searchsorted(gshifts, s + 1)) for s in range(L)]

def grouproll(x):
    x = x.reshape(K, L, S)
    parts = []
    for s in range(L):
        a, b = bounds[s], bounds[s + 1]
        if a == b:
            continue
        parts.append(jnp.roll(x[a:b], s, axis=1) if s else x[a:b])
    return jnp.concatenate(parts, axis=0)

tE = slope_time(grouproll, xD)
report("E shift-grouped rolls f32", tE, bytes_moved=2 * K * L * S * 4)

# F. check-update-like elementwise chain
def chk(x):
    x = x.reshape(mb * L, Dc, S)
    sign = jnp.where(x < 0, -1.0, 1.0)
    mag = jnp.abs(x)
    tot = jnp.prod(sign, axis=1, keepdims=True)
    m1 = jnp.min(mag, axis=1, keepdims=True)
    is_min = (mag == m1) & (jnp.cumsum(mag == m1, axis=1) == 1)
    m2 = jnp.min(jnp.where(is_min, 1e30, mag), axis=1, keepdims=True)
    return tot * sign * jnp.where(is_min, m2, m1)

xF = lambda i: jnp.asarray(rng.standard_normal((mb * L, Dc, S)).astype(np.float32))
tF = slope_time(chk, xF)
report("F check update (mb*L,Dc,S) f32", tF, bytes_moved=2 * mb * L * Dc * S * 4)
