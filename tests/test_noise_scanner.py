"""Noise-pass scanner/engine edge cases (circuits/noise.py, rewritten in
round 5 as a table-driven single-pass engine): timestep grouping, the
control-flow warning the reference's version could never emit (SURVEY.md
§2.5.3), combinator extension point, passthrough fidelity."""
import warnings

import pytest

from exp_ldpc_tpu.circuits.noise import (
    apply_noise_pred,
    circuit_ticks,
    depolarizing_noise,
    get_two_qubit_targets,
    tokenize_line,
    trivial_noise,
)
from exp_ldpc_tpu.core import CircuitTargets


def test_circuit_ticks_grouping():
    """TICK starts a new group and leads it; comments and blanks stay in
    place; a leading TICK leaves an empty first group."""
    circuit = ["TICK", "X 0", "# comment", "", "TICK", "Y 1"]
    groups = circuit_ticks(circuit)
    assert groups == [[], ["TICK", "X 0", "# comment", ""], ["TICK", "Y 1"]]


def test_circuit_ticks_trailing_tick():
    assert circuit_ticks(["X 0", "TICK"]) == [["X 0"], ["TICK"]]


def test_control_flow_warning_fires():
    """REPEAT not at a tick boundary warns (the reference's dead-flag bug
    meant its warning could never fire)."""
    with pytest.warns(UserWarning, match="control flow not aligned"):
        circuit_ticks(["X 0", "REPEAT 3 {"])
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        # at a tick boundary: no warning
        circuit_ticks(["TICK", "REPEAT 3 {", "X 0", "TICK", "}"])


def test_trivial_noise_is_exact_passthrough():
    circuit = ["RX 0 1", "TICK", "MX 0", "TICK", "# c", "MRZ 1"]
    out = trivial_noise().rewrite(CircuitTargets([0], [1], []), circuit)
    assert list(out) == circuit


def test_apply_noise_pred_custom_pieces():
    """The combinator remains the user extension point: predicate gating,
    before/after insertion, line rewriting — with TICK kept first."""
    targets = CircuitTargets([0], [1], [])
    rewriter = apply_noise_pred(
        predicate=lambda _t, step: any("X" in l for l in step),
        noise_before=lambda t: [f"BEFORE {t.data[0]}"],
        noise_after=lambda _t: ["AFTER"],
        line_rewriter=lambda _t, line: line.replace("X 0", "X 9"),
    )
    out = rewriter.rewrite(targets, ["TICK", "X 0", "TICK", "Z 1"])
    assert list(out) == ["TICK", "BEFORE 0", "X 9", "AFTER", "TICK", "Z 1"]


def test_measurement_flip_preserves_spacing():
    """The rewrite keeps the original target spacing byte-for-byte."""
    targets = CircuitTargets([1], [0, 2], [])
    out = depolarizing_noise(0.1, 0.25).rewrite(targets, ["MX  0   2"])
    assert list(out) == ["DEPOLARIZE1(0.1) 1", "MX(0.25)  0   2"]


def test_two_qubit_targets_odd_count_raises():
    with pytest.raises(ValueError, match="odd target count"):
        get_two_qubit_targets("CX 0 1 2")
    assert get_two_qubit_targets("cx 0 1 # comment") == [(0, 1)]
    assert tokenize_line("  cz 0 1  # note") == ["CZ", "0", "1"]
