#!/usr/bin/env python
"""Microbench: Mosaic MXU dot throughput by operand dtype on one chip.

Times a VMEM-resident Pallas kernel doing a long chain of 128x128 @ 128xS
dots (the BSR routing shape) with bf16, f32, and int8 operands, to learn
whether native int8 MXU lowering is available/profitable before rewriting
the BSR routing passes.

Methodology: the chain cycles through 64 x 8 = 512 DISTINCT (a, b) slice
pairs feeding 8 rotating accumulators (defeats CSE/strength-reduction and
value-dedup on the remote backend), and the per-dot cost is the wall-time
difference between a long and a short chain of the SAME kernel shape
(subtracts compile-independent dispatch/tunnel overhead).
"""
import json
import time

import numpy as np

CHAIN_LO = 16384
CHAIN_HI = 131072
S = 128


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rng = np.random.default_rng(0)

    def make(chain, dtype, acc_dtype):
        def kern(a_ref, b_ref, o_ref):
            def body(i, accs):
                out = []
                for j in range(8):  # static accumulator index, 8 dots/step
                    a = a_ref[pl.dslice(j * 128, 128), :]
                    b = b_ref[pl.dslice(((i + j * 8) % 64) * 128, 128), :]
                    d = jnp.dot(a, b, preferred_element_type=acc_dtype
                                ).astype(jnp.float32)
                    out.append(accs[j] + d)
                return tuple(out)
            accs = jax.lax.fori_loop(
                0, chain // 8, body,
                tuple(jnp.zeros((128, S), jnp.float32) for _ in range(8)))
            tot = accs[0]
            for k in range(1, 8):
                tot = tot + accs[k]
            o_ref[:, :] = tot
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((128, S), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )

    def run_case(name, dtype, acc_dtype):
        def operands():
            # DISTINCT inputs per timed call: the remote backend dedups
            # repeated (executable, value) pairs (CLAUDE.md)
            if dtype == jnp.int8:
                a = rng.integers(-4, 5, (1024, 128), dtype=np.int8)
                b = rng.integers(-4, 5, (64 * 128, S), dtype=np.int8)
            else:
                a = rng.standard_normal((1024, 128)).astype(dtype)
                b = rng.standard_normal((64 * 128, S)).astype(dtype)
            return jnp.asarray(a), jnp.asarray(b)

        f_lo = jax.jit(make(CHAIN_LO, dtype, acc_dtype))
        f_hi = jax.jit(make(CHAIN_HI, dtype, acc_dtype))

        def best(f, n=5):
            np.asarray(f(*operands()))  # compile + warm
            ts = []
            for _ in range(n):
                a, b = operands()
                t0 = time.perf_counter()
                np.asarray(f(a, b))  # host fetch forces full sync
                ts.append(time.perf_counter() - t0)
            return min(ts)

        t_lo, t_hi = best(f_lo), best(f_hi)
        per_dot = (t_hi - t_lo) / (CHAIN_HI - CHAIN_LO)
        flops = 2 * 128 * 128 * S
        print(json.dumps({
            "dtype": name, "s": S,
            "tflops": flops / per_dot / 1e12,
            "ns_per_dot": per_dot * 1e9,
            "chain_lo": CHAIN_LO, "chain_hi": CHAIN_HI,
            "t_hi_s": t_hi, "t_lo_s": t_lo,
        }), flush=True)

    run_case("bf16", jnp.bfloat16, jnp.float32)
    run_case("f32", jnp.float32, jnp.float32)
    try:
        run_case("int8", jnp.int8, jnp.int32)
    except Exception as e:  # noqa: BLE001 — probing backend support
        print(json.dumps({"dtype": "int8", "error": repr(e)[:200]}), flush=True)


if __name__ == "__main__":
    main()
