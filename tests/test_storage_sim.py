"""Circuit-generation tests.

Golden tests replicate the reference's pinned rewriter outputs
(`/root/reference/tests/test_storage_sim.py:13-77` semantics); the
circuit-vs-code cross-validation mirrors `:79-105`.
"""
from collections import deque
from itertools import chain

import numpy as np
import pytest

from exp_ldpc_tpu.circuits.noise import circuit_noise, depolarizing_noise
from exp_ldpc_tpu.circuits.storage_sim import build_perfect_circuit, build_storage_simulation
from exp_ldpc_tpu.codes.hgp import random_test_hgp
from exp_ldpc_tpu.core import CircuitTargets


def test_noise_rewrite_pheno_golden():
    circuit = ["RX 0 1 2", "TICK", "CZ 0 1", "TICK", "MX 0 2", "TICK", "TICK", "MX 0"]
    targets = CircuitTargets([1], [0, 2], [])
    rewritten = depolarizing_noise(0.1, 0.2).rewrite(targets, circuit)
    golden = [
        "RX 0 1 2",
        "TICK",
        "CZ 0 1",
        "TICK",
        "DEPOLARIZE1(0.1) 1",
        "MX(0.2) 0 2",
        "TICK",
        "TICK",
        "DEPOLARIZE1(0.1) 1",
        "MX(0.2) 0",
    ]
    assert list(rewritten) == golden


def test_noise_rewrite_circuit_noise_golden():
    circuit = ["RX 0 1 2", "TICK", "CZ 0 1", "TICK", "MX 0 2", "TICK", "TICK", "MX 0"]
    targets = CircuitTargets([1], [0, 2], [])
    rewritten = circuit_noise(0.1, 0.2).rewrite(targets, circuit)
    golden = [
        "RX 0 1 2",
        "DEPOLARIZE1(0.1) 0 1 2",
        "TICK",
        "CZ 0 1",
        "DEPOLARIZE2(0.1) 0 1",
        "DEPOLARIZE1(0.1) 2",
        "TICK",
        "MX(0.2) 0 2",
        "DEPOLARIZE1(0.1) 0 1 2",
        "TICK",
        "DEPOLARIZE1(0.1) 0 1 2",
        "TICK",
        "MX(0.2) 0",
        "DEPOLARIZE1(0.1) 0 1 2",
    ]
    assert list(rewritten) == golden


@pytest.fixture(scope="module")
def test_code():
    return random_test_hgp(compute_logicals=True)


def test_ancilla_targets(test_code):
    """Reconstruct check supports from the emitted circuit; must match the code."""
    code = test_code
    targets, circuit = build_perfect_circuit(code)

    x_ancilla_idx = frozenset(targets.x_checks)
    measurement_order = deque(
        int(x)
        for x in chain(*[s.split()[1:] for s in circuit if s.startswith(("MX", "MRX"))])
    )

    cx_targets = {i: set() for i in targets.x_checks}
    cz_targets = {i: set() for i in targets.z_checks}
    for s in circuit:
        if s.startswith("CX"):
            _, control, target = s.split()
            cx_targets[int(control)].add(int(target))
        if s.startswith("CZ"):
            _, control, target = s.split()
            cz_targets[int(control)].add(int(target))

    assert len(measurement_order) == code.checks.x.shape[0] + code.checks.z.shape[0]
    for i, m in enumerate(measurement_order):
        if m in x_ancilla_idx:
            assert cx_targets[m] == set(code.checks.x[[i], :].nonzero()[1])
        else:
            assert cz_targets[m] == set(
                code.checks.z[[i - code.checks.x.shape[0]], :].nonzero()[1]
            )


def test_circuit_depth_optimal(test_code):
    """The CX schedule must use exactly Delta layers (edge-coloring optimality)."""
    code = test_code
    _, circuit = build_perfect_circuit(code)
    deg = max(
        int(code.checks.x.sum(axis=1).max()),
        int(np.asarray(code.checks.x.sum(axis=0)).max()),
    )
    # count CX layers: TICK-separated groups containing CX
    layers = 0
    current_has_cx = False
    for line in circuit:
        if line == "TICK":
            layers += 1 if current_has_cx else 0
            current_has_cx = False
        elif line.startswith("CX"):
            current_has_cx = True
    layers += 1 if current_has_cx else 0
    assert layers == deg


@pytest.mark.parametrize("use_x_logicals,rounds", [(False, 0), (False, 3), (True, 0), (True, 3)])
def test_storage_sim_views(test_code, use_x_logicals, rounds):
    code = test_code
    sim = build_storage_simulation(rounds, depolarizing_noise(0.1, 0), code, use_x_logicals)

    x_count = code.checks.x.shape[0]
    z_count = code.checks.z.shape[0]
    total_meas = (x_count + z_count) * rounds + code.num_qubits
    sample = np.zeros(total_meas, dtype=np.int32)

    for r in range(rounds):
        for get_x in [True, False]:
            view = sim.measurement_view(r, get_x, sample)
            assert view.shape[0] == (x_count if get_x else z_count)
            view[:] = 1
            assert np.all(sim.measurement_view(r, get_x, sample) == 1)
        sample[:] = 0
    data = sim.data_view(sample)
    assert data.shape[0] == code.num_qubits
    data[:] = 1
    assert np.all(sim.data_view(sample) == 1)


def test_observable_supports_correct(test_code):
    """Regression for reference bug SURVEY.md §2.5.8: OBSERVABLE_INCLUDE must
    reference the logical support columns, not rec[-n] repeated."""
    code = test_code
    sim = build_storage_simulation(1, depolarizing_noise(0.1, 0), code, use_x_logicals=False)
    obs_lines = [l for l in sim.circuit if l.startswith("OBSERVABLE_INCLUDE")]
    assert len(obs_lines) == code.num_logicals
    n = code.num_qubits
    for i, line in enumerate(obs_lines):
        recs = [int(tok[4:-1]) for tok in line.split()[1:]]
        support = np.asarray(recs) + n  # rec[v - n] encoding
        expected = np.nonzero(code.logicals.z[i])[0]
        assert sorted(support.tolist()) == expected.tolist()


def test_repeat_count_colliding_with_ancilla_index():
    """Regression: the race-check verifier must skip control-flow lines.

    The reference's verifier parses ``REPEAT n {`` as a gate line and
    collects ``n`` as a qubit target (reference ``storage_sim.py:100-107``);
    with rounds chosen so that ``rounds - 1`` equals an ancilla index in the
    same TICK chunk, that false-asserts.  Here the (3,4) HGP on nv=12 has
    225 data qubits and X ancillas 225..332, so rounds=226 puts
    ``REPEAT 225 {`` in the same chunk as ``RX 225 ...``.
    """
    from exp_ldpc_tpu.circuits.noise import trivial_noise
    from exp_ldpc_tpu.codes.hgp import biregular_hgp

    code = biregular_hgp(12, 3, 4, seed=0, compute_logicals=True)
    assert code.num_qubits == 225
    sim = build_storage_simulation(226, trivial_noise(), code, use_x_logicals=False)
    assert any(l.startswith("REPEAT 225 {") for l in sim.circuit)
