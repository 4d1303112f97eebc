"""Noise models as Stim-text circuit rewriting passes.

Behavioral parity (line-by-line, including golden-test output) with
``/root/reference/python/qldpc/noise_model.py``.  Circuits are lists of
Stim-format text lines; a noise model is a :class:`NoiseRewriter` holding a
``rewrite(targets, lines) -> lines`` pass.  The text representation is kept
deliberately: it is the interchange format with the reference ecosystem and
the golden tests pin it.  The TPU sampler consumes the rewritten text via its
own structured parser (:mod:`exp_ldpc_tpu.circuits.ir`).
"""
from __future__ import annotations

import re
import warnings
from functools import partial
from typing import Callable, Iterable, List, Tuple

from ..core import CircuitTargets, NoiseRewriter

__all__ = [
    "trivial_noise",
    "depolarizing_noise",
    "circuit_noise",
    "apply_noise_pred",
    "circuit_ticks",
    "tokenize_line",
    "get_two_qubit_targets",
]

_MEASUREMENT_GATES = ["M", "MZ", "MX", "MY", "MPP", "MR", "MRZ", "MRX", "MRY"]
_MEASUREMENT_LINE = re.compile(
    f'^(?:\\s*)({"|".join(_MEASUREMENT_GATES)})((?:\\s*\\d+\\s*)+)$'
)

_TWO_QUBIT_GATES = frozenset(
    [
        "CNOT", "CX", "CY", "CZ",
        "ISWAP", "ISWAP_DAG",
        "SQRT_XX", "SQRT_XX_DAG", "SQRT_YY", "SQRT_YY_DAG", "SQRT_ZZ", "SQRT_ZZ_DAG",
        "SWAP",
        "XCX", "XCY", "XCZ", "YCX", "YCY", "YCZ", "ZCX", "ZCY", "ZCZ",
    ]
)


def tokenize_line(line: str) -> List[str]:
    """Split a Stim line into upper-cased tokens, dropping comments
    (``noise_model.py:99-101``)."""
    return [s.upper() for s in line.split("#")[0].split() if s != ""]


def get_two_qubit_targets(line: str) -> List[Tuple[int, int]]:
    """Target pairs of any two-qubit gate on the line (``noise_model.py:103-112``)."""
    tokens = tokenize_line(line)
    if len(tokens) > 1 and tokens[0] in _TWO_QUBIT_GATES:
        targets = [int(t) for t in tokens[1:]]
        if len(targets) % 2 == 1:
            raise ValueError(
                f"two-qubit gate line has an odd target count: {line!r}"
            )
        return list(zip(targets[::2], targets[1::2]))
    return []


def circuit_ticks(circuit: Iterable[str]) -> List[List[str]]:
    """Group lines into timesteps; each TICK starts a new group with the TICK
    line first (``noise_model.py:30-67``).

    Emits the malformed-control-flow warning the reference intended (its
    version had a dead flag, SURVEY.md §2.5.3): a ``REPEAT``/``}`` line not
    at the start of a timestep means tick detection may be wrong.
    """
    groups: List[List[str]] = [[]]
    at_tick_boundary = True
    for line in circuit:
        tokens = tokenize_line(line)
        if tokens:
            if tokens[0] in ("REPEAT", "}") and not at_tick_boundary:
                warnings.warn(
                    "This circuit has control flow not aligned to TICK boundaries; "
                    "timestep detection may be incorrect. Put REPEAT blocks in the form "
                    "TICK / REPEAT n { ... TICK / } or flatten the circuit first."
                )
            if tokens[0] == "TICK":
                groups.append([])
                at_tick_boundary = True
            else:
                at_tick_boundary = False
        groups[-1].append(line)
    return groups


def _rewrite_measurement_noise(_targets, circuit_line: str, p: float = None) -> str:
    """M/MX/MRX... -> M(p)/MX(p)/MRX(p)... (``noise_model.py:154-161``)."""
    m = _MEASUREMENT_LINE.search(circuit_line)
    if m is None:
        return circuit_line
    meas_type, targets = m.group(1, 2)
    return f"{meas_type}({p}){targets}"


def _has_measurement(timestep: Iterable[str]) -> bool:
    return any(_MEASUREMENT_LINE.search(line) is not None for line in timestep)


def apply_noise_pred(
    predicate: Callable[[CircuitTargets, Iterable[str]], bool],
    noise_before: Callable[[CircuitTargets], List[str]] = None,
    noise_after: Callable[[CircuitTargets], List[str]] = None,
    line_rewriter: Callable[[CircuitTargets, str], str] = None,
) -> NoiseRewriter:
    """Per-timestep predicate-driven rewriter combinator (``noise_model.py:15-28``)."""

    def _impl(targets: CircuitTargets, circuit: Iterable[str]) -> List[str]:
        nb = noise_before or (lambda *_: [])
        na = noise_after or (lambda *_: [])
        lr = line_rewriter or (lambda _, x: x)

        out: List[str] = []
        for timestep in circuit_ticks(circuit):
            if timestep and predicate(targets, timestep):
                body = timestep
                if tokenize_line(timestep[0])[:1] == ["TICK"]:
                    out.append(timestep[0])
                    body = timestep[1:]
                out.extend(nb(targets))
                out.extend(lr(targets, line) for line in body)
                out.extend(na(targets))
            else:
                out.extend(timestep)
        return out

    return NoiseRewriter(_impl)


def trivial_noise() -> NoiseRewriter:
    """No-op noise model (``noise_model.py:11-13``)."""
    return apply_noise_pred(lambda *_: False)


def depolarizing_noise(p: float, pm: float) -> NoiseRewriter:
    """Phenomenological noise: DEPOLARIZE1(p) on data before any timestep
    containing measurements, plus measurement flips with probability pm
    (``noise_model.py:117-123``)."""
    noise_before = lambda targets: [
        f'DEPOLARIZE1({p}) {" ".join(str(i) for i in targets.data)}'
    ]
    return apply_noise_pred(
        predicate=lambda _targets, step: _has_measurement(step),
        noise_before=noise_before,
        line_rewriter=partial(_rewrite_measurement_noise, p=pm),
    )


def circuit_noise(p: float, pm: float = None) -> NoiseRewriter:
    """Circuit-level noise: DEPOLARIZE2 after two-qubit gates, DEPOLARIZE1 on
    every other circuit qubit each timestep, measurement flips pm (default p)
    (``noise_model.py:125-151``)."""
    if pm is None:
        pm = p

    def _impl(targets: CircuitTargets, circuit: Iterable[str]) -> List[str]:
        circuit_supp = frozenset(targets.data) | frozenset(targets.ancillas)
        out: List[str] = []
        for timestep in circuit_ticks(circuit):
            two_qubit_targets: List[Tuple[int, int]] = []
            for line in timestep:
                two_qubit_targets.extend(get_two_qubit_targets(line))
            touched = frozenset(q for pair in two_qubit_targets for q in pair)
            one_qubit_targets = sorted(circuit_supp - touched)

            out.extend(_rewrite_measurement_noise(None, line, p=pm) for line in timestep)
            if two_qubit_targets:
                out.append(
                    f"DEPOLARIZE2({p}) " + " ".join(f"{a} {b}" for a, b in two_qubit_targets)
                )
            out.append(f"DEPOLARIZE1({p}) " + " ".join(str(a) for a in one_qubit_targets))
        return out

    return NoiseRewriter(_impl)
