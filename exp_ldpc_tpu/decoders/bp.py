"""Batched belief-propagation decoding on JAX/XLA.

TPU-native replacement for the Cython ``ldpc`` package's ``bp_decoder``
(consumed by the reference at ``/root/reference/python/qldpc/misc/
_experiment.py:2,213-229``): flooding-schedule BP over a padded-ELL Tanner
graph with the SHOT DIMENSION fully vectorized — the reference decodes one
shot at a time in a Python loop (``misc/_experiment.py:199-209``, its
throughput bottleneck); here a whole Monte-Carlo batch decodes in one fused
XLA program.

Methods (matching the ldpc option surface, ``misc/_experiment.py:216-217``):
  * ``ps``  — product-sum (sum-product) in the numerically stable
    sign/phi-magnitude form, phi(x) = -log tanh(x/2);
  * ``ms``  — min-sum with scaling factor alpha; ``ms_scaling_factor = 0``
    selects the adaptive schedule alpha_t = 1 - 2^-t;
  * ``msl``/``psl`` — log-domain aliases of the same math.

Per-column channel priors are supported (data vs measurement-error columns
get different priors in every reference decode mode,
``misc/_experiment.py:33-35,74-76,106-108``).

Layout: messages are (E+1, S) f32 edge-major arrays (S = shots on the lane
axis); one BP iteration is two gather/compute/scatter passes (check-major and
variable-major).  Per-shot early stopping is emulated by freezing each shot's
result at its first convergence; the iteration loop is a ``lax.while_loop``
that exits when every shot has converged (or max_iter).
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .tanner import TannerELL

__all__ = ["BPDecoder", "bp_decode_batch", "priors_to_llr"]

_BIG = 1e30
_PHI_CLAMP_LO = 1e-7
_PHI_CLAMP_HI = 30.0


def priors_to_llr(priors: np.ndarray) -> np.ndarray:
    """Per-column error probabilities -> LLR log((1-p)/p)."""
    p = np.clip(np.asarray(priors, dtype=np.float64), 1e-12, 1 - 1e-12)
    return np.log((1 - p) / p).astype(np.float32)


def _phi(x):
    """phi(x) = -log(tanh(x/2)), self-inverse on (0, inf)."""
    x = jnp.clip(x, _PHI_CLAMP_LO, _PHI_CLAMP_HI)
    return -jnp.log(jnp.tanh(x * 0.5))


def _check_update(v2c, tanner: TannerELL, synd_sign, method: str, alpha):
    """Check-node update: returns new c2v edge-major array (E+1, S)."""
    E = tanner.num_edges
    m = v2c[tanner.chk_edges]  # (C, Dc, S); padded slots read +BIG
    sign = jnp.where(m < 0, -1.0, 1.0)
    mag = jnp.abs(m)
    total_sign = jnp.prod(sign, axis=1, keepdims=True) * synd_sign[:, None, :]
    ext_sign = total_sign * sign  # product of signs excluding self

    if method == "ps":
        ph = _phi(mag)  # padded: phi(BIG) ~ clamped -> ~4e-14? clamp hi=30 -> tiny
        total = jnp.sum(ph, axis=1, keepdims=True)
        ext = _phi(total - ph)
        out = ext_sign * ext
    else:  # min-sum
        min1 = jnp.min(mag, axis=1, keepdims=True)
        # second minimum: mask out one occurrence of the min
        is_min = (mag == min1) & (jnp.cumsum((mag == min1), axis=1) == 1)
        mag2 = jnp.where(is_min, _BIG, mag)
        min2 = jnp.min(mag2, axis=1, keepdims=True)
        ext = jnp.where(is_min, min2, min1)
        out = ext_sign * ext * alpha

    c2v = jnp.zeros_like(v2c)
    c2v = c2v.at[tanner.chk_edges].set(out)
    c2v = c2v.at[E].set(0.0)  # neutral for the variable-side sum
    return c2v


def _var_update(c2v, tanner: TannerELL, prior_llr):
    """Variable-node update: returns (v2c (E+1,S), posterior (V,S))."""
    E = tanner.num_edges
    m = c2v[tanner.var_edges]  # (V, Dv, S); padded slots read 0
    total = jnp.sum(m, axis=1)  # (V, S)
    posterior = prior_llr[:, None] + total
    out = posterior[:, None, :] - m  # exclude self
    v2c = jnp.zeros_like(c2v)
    v2c = v2c.at[tanner.var_edges].set(out)
    v2c = v2c.at[E].set(_BIG)  # neutral for the check-side min/phi-sum
    return v2c, posterior


def _syndrome_of(hard, tanner: TannerELL):
    """H @ hard mod 2 as (C, S) int32, via the check-major var gather."""
    bits = hard[tanner.chk_vars]  # (C, Dc, S)
    bits = jnp.where(tanner.chk_mask[:, :, None], bits, 0).astype(jnp.int32)
    return jnp.sum(bits, axis=1) % 2


@partial(jax.jit, static_argnames=("tanner", "method", "max_iter", "early_stop"))
def _bp_core(tanner: TannerELL, prior_llr, syndromes, method: str, max_iter: int, ms_scaling_factor, early_stop: bool = True):
    """syndromes: (C, S) uint8.  Returns (hard (V,S) uint8, posterior (V,S),
    converged (S,) bool, iters (S,) int32)."""
    C, S = syndromes.shape
    E = tanner.num_edges
    synd_sign = 1.0 - 2.0 * syndromes.astype(jnp.float32)  # (C, S)

    v2c0 = jnp.zeros((E + 1, S), dtype=jnp.float32)
    # init v2c with priors per edge
    edge_prior = prior_llr[np.asarray(tanner.chk_vars)]  # (C, Dc) static gather
    v2c0 = v2c0.at[tanner.chk_edges].set(
        jnp.broadcast_to(jnp.asarray(edge_prior)[:, :, None], (C, tanner.chk_edges.shape[1], S))
    )
    v2c0 = v2c0.at[E].set(_BIG)

    hard0 = jnp.zeros((tanner.num_vars, S), dtype=jnp.uint8)
    posterior0 = jnp.broadcast_to(prior_llr[:, None], (tanner.num_vars, S))
    converged0 = jnp.zeros((S,), dtype=bool)
    iters0 = jnp.zeros((S,), dtype=jnp.int32)

    adaptive = ms_scaling_factor == 0.0

    def cond(state):
        it, _v2c, _hard, _post, conv, _iters = state
        if early_stop:
            return (it < max_iter) & ~jnp.all(conv)
        return it < max_iter

    def body(state):
        it, v2c, hard, post, conv, iters = state
        alpha = jnp.where(adaptive, 1.0 - 2.0 ** (-(it + 1).astype(jnp.float32)), ms_scaling_factor)
        c2v = _check_update(v2c, tanner, synd_sign, method, alpha)
        v2c_new, posterior = _var_update(c2v, tanner, prior_llr)
        hard_new = (posterior <= 0).astype(jnp.uint8)
        ok = jnp.all(_syndrome_of(hard_new, tanner) == syndromes, axis=0)  # (S,)
        if early_stop:
            # freeze each shot's outputs at its first convergence (ldpc semantics)
            hard = jnp.where(conv[None, :], hard, hard_new)
            post = jnp.where(conv[None, :], post, posterior)
            iters = jnp.where(conv, iters, it + 1)
            conv = conv | ok
        else:
            hard, post, iters = hard_new, posterior, iters + 1
            conv = ok
        return (it + 1, v2c_new, hard, post, conv, iters)

    state = (jnp.int32(0), v2c0, hard0, posterior0, converged0, iters0)
    _, _, hard, post, conv, iters = jax.lax.while_loop(cond, body, state)
    return hard, post, conv, iters


@dataclass
class BPDecoder:
    """Batched BP decoder for a fixed check matrix and channel prior.

    ``decode_batch`` takes (S, C) syndromes and returns (S, V) hard
    decisions, (S, V) posterior LLRs, (S,) convergence flags, (S,) iteration
    counts.
    """

    tanner: TannerELL
    prior_llr: np.ndarray
    method: str = "ps"
    max_iter: int = 0
    ms_scaling_factor: float = 0.0
    early_stop: bool = True

    def __post_init__(self):
        method = {"ps": "ps", "psl": "ps", "ms": "ms", "msl": "ms"}.get(self.method)
        if method is None:
            raise ValueError(f"unknown bp method {self.method!r}")
        object.__setattr__(self, "method", method)
        if self.max_iter <= 0:
            object.__setattr__(self, "max_iter", self.tanner.num_vars)

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
        **_ignored,
    ) -> "BPDecoder":
        """Constructor mirroring the ldpc option surface
        (``misc/_experiment.py:213-229``)."""
        tanner = TannerELL.from_check_matrix(H)
        if channel_probs is not None:
            prior = np.asarray(channel_probs, dtype=np.float64)
        elif error_rate is not None:
            prior = np.full(tanner.num_vars, error_rate, dtype=np.float64)
        else:
            raise ValueError("must supply error_rate or channel_probs")
        return cls(
            tanner=tanner,
            prior_llr=priors_to_llr(prior),
            method=bp_method,
            max_iter=max_iter,
            ms_scaling_factor=float(ms_scaling_factor),
            early_stop=early_stop,
        )

    def decode_batch(self, syndromes: np.ndarray):
        syndromes = jnp.asarray(syndromes, dtype=jnp.uint8).T  # (C, S)
        hard, post, conv, iters = _bp_core(
            self.tanner,
            jnp.asarray(self.prior_llr),
            syndromes,
            self.method,
            self.max_iter,
            jnp.float32(self.ms_scaling_factor),
            self.early_stop,
        )
        return hard.T, post.T, conv, iters

    def decode(self, syndrome: np.ndarray):
        """Single-shot convenience wrapper (oracle/compat path)."""
        hard, _post, _conv, _it = self.decode_batch(np.asarray(syndrome)[None, :])
        return np.asarray(hard[0])


def bp_decode_batch(H, syndromes, **kw):
    return BPDecoder.from_check_matrix(H, **kw).decode_batch(syndromes)
