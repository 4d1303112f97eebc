"""Persistent XLA/Mosaic compilation cache for expensive kernels.

The BSR tile kernel's Mosaic compile time grows with the unrolled tile
count (measured 53 s at 548 tiles on the n=4862 cyclic LP, 80 s for the
int8 variant — ``artifacts/bp_families_v5e.jsonl``); nothing in the
compiled program depends on the process, so the executable is cached on
disk and reused across processes and sweeps.  JAX keys entries on the
serialized computation + compile options + backend/runtime version, which
subsumes "keyed on the schedule hash": the schedule's index tables are
embedded operands of the traced program, so any schedule change misses the
cache and recompiles.  Verified effective through this environment's
remote-compile backend (the compiled artifact is what gets cached, not the
remote session).

Enabled automatically when a BSR decode entry point first traces (i.e.
right before the expensive compile — never from pure feasibility probes
like ``fits_bsr``); opt out with ``EXP_LDPC_TPU_NO_COMPILE_CACHE=1``, or
pre-set ``jax_compilation_cache_dir`` / ``JAX_COMPILATION_CACHE_DIR`` or
``jax_persistent_cache_min_compile_time_secs`` yourself (existing settings
are always respected).
"""
from __future__ import annotations

import os

__all__ = ["enable_compilation_cache"]

_DEFAULT_DIR = os.path.join(
    os.path.expanduser("~"), ".cache", "exp_ldpc_tpu", "jax")
_done = False


def enable_compilation_cache(cache_dir: str | None = None) -> None:
    """Idempotently point JAX's persistent compilation cache at
    ``cache_dir`` (default ``~/.cache/exp_ldpc_tpu/jax``) unless the user
    already configured one or opted out."""
    global _done
    if _done:
        return
    _done = True
    if os.environ.get("EXP_LDPC_TPU_NO_COMPILE_CACHE"):
        return
    import jax

    if jax.config.jax_compilation_cache_dir:
        return  # user already chose a cache location
    target = cache_dir or _DEFAULT_DIR
    os.makedirs(target, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", target)
    # jax's default jax_persistent_cache_min_compile_time_secs is 1.0 s,
    # which already caches every kernel we care about (the cheapest BSR
    # compiles are ~2 s) — leave it alone so a user-set value is respected
