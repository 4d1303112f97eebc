#!/usr/bin/env python
"""Microbench: Mosaic MXU dot throughput by operand dtype on one chip.

Times a VMEM-resident Pallas kernel doing a long chain of 128x128 @ 128xS
dots (the BSR routing shape) with bf16, f32, and int8 operands, to learn
whether native int8 MXU lowering is available/profitable before rewriting
the BSR routing passes.  Distinct-input slope-fit methodology.
"""
import json
import time
from functools import partial

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    S = 128
    CHAIN = 512         # dots per kernel call
    REPS_LO, REPS_HI = 64, 512

    def make_kernel(dtype, acc_dtype):
        def kern(a_ref, b_ref, o_ref):
            def body(i, acc):
                # vary the slice so dots are not trivially CSE'd
                a = a_ref[pl.dslice((i % 8) * 128, 128), :]
                return acc + jnp.dot(
                    a, b_ref[:, :].astype(dtype),
                    preferred_element_type=acc_dtype).astype(jnp.float32)
            acc = jax.lax.fori_loop(
                0, CHAIN, body, jnp.zeros((128, S), jnp.float32))
            o_ref[:, :] = acc
        return kern

    rng = np.random.default_rng(0)

    def run_case(name, dtype, acc_dtype):
        kern = make_kernel(dtype, acc_dtype)
        f = pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((128, S), jnp.float32),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )

        @jax.jit
        def many(aa, bb):
            def step(c, ab):
                a, b = ab
                return c + f(a, b).sum(), None
            tot, _ = jax.lax.scan(step, jnp.float32(0), (aa, bb))
            return tot

        def batch(R):
            if dtype == jnp.int8:
                a = rng.integers(-4, 5, (R, 1024, 128), dtype=np.int8)
                b = rng.integers(-4, 5, (R, 128, S), dtype=np.int8)
            else:
                a = rng.standard_normal((R, 1024, 128)).astype(dtype)
                b = rng.standard_normal((R, 128, S)).astype(dtype)
            return jax.device_put(jnp.asarray(a)), jax.device_put(jnp.asarray(b))

        los = [batch(REPS_LO) for _ in range(3)]
        his = [batch(REPS_HI) for _ in range(3)]
        t0 = time.perf_counter()
        many(*los[0]).block_until_ready()
        compile_s = time.perf_counter() - t0
        many(*his[0]).block_until_ready()

        def timed(xs):
            best = np.inf
            for ab in xs:
                t0 = time.perf_counter()
                many(*ab).block_until_ready()
                best = min(best, time.perf_counter() - t0)
            return best

        per = (timed(his) - timed(los)) / (REPS_HI - REPS_LO)
        flops = 2 * CHAIN * 128 * 128 * S
        print(json.dumps({
            "dtype": name, "chain": CHAIN, "s": S,
            "tflops": flops / per / 1e12,
            "us_per_call": per * 1e6,
            "compile_s": compile_s,
        }), flush=True)

    run_case("bf16", jnp.bfloat16, jnp.float32)
    run_case("f32", jnp.float32, jnp.float32)
    try:
        run_case("int8", jnp.int8, jnp.int32)
    except Exception as e:  # noqa: BLE001 — probing backend support
        print(json.dumps({"dtype": "int8", "error": repr(e)[:200]}), flush=True)


if __name__ == "__main__":
    main()
