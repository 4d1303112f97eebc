#!/usr/bin/env python
"""MXU precision microbenchmark for the BP routing matmuls.

The HGP-225 BP iteration is two routing matmuls, M (V, C*Dc) @ c2v (C*Dc, S)
and G (C*Dc, V) @ posterior (V, S), plus O(E) VPU math.  This measures the
achievable matmul rate at exactly those shapes for:
  f32 (current default), bf16 in / f32 out (single-pass MXU),
  int8 in / int32 out (quantized-inference MXU path).

Methodology per CLAUDE.md: distinct inputs per repeat, scanned on device,
slope-fit between two repeat counts.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np


def bench_dot(name, a_np, b_np, preferred, reps_lo=64, reps_hi=256):
    a = jnp.asarray(a_np)

    def make(R):
        rng = np.random.default_rng(1)
        arr = rng.integers(-100, 100, size=(R,) + b_np.shape)
        return jnp.asarray(arr.astype(b_np.dtype))

    @jax.jit
    def run_many(bs):
        def step(acc, b):
            out = jnp.dot(a, b, preferred_element_type=preferred)
            return acc + out.astype(jnp.float32).sum(), None

        acc, _ = jax.lax.scan(step, jnp.float32(0), bs)
        return acc

    lo, hi = make(reps_lo), make(reps_hi)
    run_many(lo).block_until_ready()
    run_many(hi).block_until_ready()

    def timed(x):
        best = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            run_many(x).block_until_ready()
            best = min(best, time.perf_counter() - t0)
        return best

    per = (timed(hi) - timed(lo)) / (reps_hi - reps_lo)
    flops = 2 * a_np.shape[0] * a_np.shape[1] * b_np.shape[1]
    print(f"{name:>28}: {per*1e6:8.1f} us/matmul  {flops/per/1e12:7.2f} TOP/s")
    return flops / per


def main():
    print(f"devices: {jax.devices()}")
    V, CD, S = 225, 756, 1024
    rng = np.random.default_rng(0)
    M = (rng.random((V, CD)) < 0.01).astype(np.float32)

    for S_ in (1024, 4096):
        print(f"-- M (V={V}, C*Dc={CD}) @ c2v ({CD}, S={S_})")
        c2v = rng.standard_normal((CD, S_)).astype(np.float32)
        bench_dot("f32/f32", M, c2v, jnp.float32)
        bench_dot("bf16/f32", M.astype(jnp.bfloat16),
                  c2v.astype(jnp.bfloat16), jnp.float32)
        bench_dot("int8/int32", M.astype(np.int8),
                  (c2v * 10).astype(np.int8), jnp.int32)

    # MXU-saturating control shape
    print("-- control (1024,1024)@(1024,1024)")
    A = rng.standard_normal((1024, 1024)).astype(np.float32)
    B = rng.standard_normal((1024, 1024)).astype(np.float32)
    bench_dot("f32/f32", A, B, jnp.float32)
    bench_dot("bf16/f32", A.astype(jnp.bfloat16), B.astype(jnp.bfloat16),
              jnp.float32)
    bench_dot("int8/int32", (A * 10).astype(np.int8), (B * 10).astype(np.int8),
              jnp.int32)


if __name__ == "__main__":
    main()
