"""Pauli-frame sampler tests: analytic invariants, hand cases, CPU<->device parity."""
import jax
import numpy as np
import pytest

from exp_ldpc_tpu.circuits.ir import parse_circuit
from exp_ldpc_tpu.circuits.noise import depolarizing_noise, trivial_noise
from exp_ldpc_tpu.circuits.storage_sim import build_storage_simulation
from exp_ldpc_tpu.codes.hgp import biregular_hgp
from exp_ldpc_tpu.sampler.device import DeviceSampler
from exp_ldpc_tpu.sampler.reference import FrameSampler


@pytest.fixture(scope="module")
def small_code():
    return biregular_hgp(12, 3, 4, seed=0, compute_logicals=True)


def test_hand_case_deterministic_flip():
    # X error with p=1 before MZ flips the outcome; MX unaffected by X error
    c = parse_circuit(["RZ 0", "X_ERROR(1) 0", "MZ 0"])
    rec = FrameSampler(c, seed=0).sample(16)
    assert np.all(rec == 1)
    c2 = parse_circuit(["RX 0", "X_ERROR(1) 0", "MX 0"])
    rec2 = FrameSampler(c2, seed=0).sample(16)
    assert np.all(rec2 == 0)
    # Z error flips MX
    c3 = parse_circuit(["RX 0", "Z_ERROR(1) 0", "MX 0"])
    assert np.all(FrameSampler(c3, seed=0).sample(16) == 1)


def test_hand_case_cx_propagation():
    # X on control propagates to target through CX
    c = parse_circuit(["RZ 0 1", "X_ERROR(1) 0", "CX 0 1", "MZ 0 1"])
    rec = FrameSampler(c, seed=0).sample(8)
    assert np.all(rec == 1)
    # Z on a |+> target makes it |->; CX phase kickback flips the control
    c2 = parse_circuit(["RX 0", "RX 1", "Z_ERROR(1) 1", "CX 0 1", "MX 0"])
    rec2 = FrameSampler(c2, seed=0).sample(8)
    assert np.all(rec2 == 1)
    # and Z on a |0> target is unobservable: no kickback
    c3 = parse_circuit(["RX 0", "RZ 1", "Z_ERROR(1) 1", "CX 0 1", "MX 0"])
    rec3 = FrameSampler(c3, seed=1).sample(512)
    # CX entangles |+>|0> into a Bell pair; MX of the control is uniformly random
    assert 0.4 < rec3.mean() < 0.6



def test_measurement_randomization():
    # measuring |0> in the X basis gives a uniformly random but repeatable bit?
    # no: consecutive MX of the same qubit agree (state collapsed)
    c = parse_circuit(["RZ 0", "MX 0", "MX 0"])
    rec = FrameSampler(c, seed=1).sample(2000)
    assert np.all(rec[:, 0] == rec[:, 1])  # collapse consistency
    assert 0.4 < rec[:, 0].mean() < 0.6  # uniformly random outcome


def test_noiseless_storage_sim_all_detectors_zero(small_code):
    sim = build_storage_simulation(3, trivial_noise(), small_code, use_x_logicals=False)
    fs = FrameSampler(sim.circuit, seed=3)
    det = fs.sample_detectors(256, append_observables=True)
    assert not det.any()
    # X basis variant too
    sim_x = build_storage_simulation(2, trivial_noise(), small_code, use_x_logicals=True)
    det_x = FrameSampler(sim_x.circuit, seed=4).sample_detectors(128, append_observables=True)
    assert not det_x.any()


def test_record_layout_contract(small_code):
    rounds = 2
    sim = build_storage_simulation(rounds, trivial_noise(), small_code, use_x_logicals=False)
    c = parse_circuit(sim.circuit)
    x_count = small_code.checks.x.shape[0]
    z_count = small_code.checks.z.shape[0]
    assert c.num_measurements == rounds * (x_count + z_count) + small_code.num_qubits
    rec = FrameSampler(c, seed=5).sample(4)
    # view closures index into the record consistently
    view = sim.measurement_view(0, False, rec[0])
    assert view.shape[0] == z_count
    assert sim.data_view(rec[0]).shape[0] == small_code.num_qubits


def test_first_round_z_checks_deterministic(small_code):
    """Z-memory: first-round Z syndromes are 0 noiselessly, X syndromes random."""
    sim = build_storage_simulation(1, trivial_noise(), small_code, use_x_logicals=False)
    rec = FrameSampler(sim.circuit, seed=6).sample(512)
    z_first = np.stack([sim.measurement_view(0, False, r) for r in rec])
    x_first = np.stack([sim.measurement_view(0, True, r) for r in rec])
    assert not z_first.any()
    assert 0.3 < x_first.mean() < 0.7


def test_readout_syndrome_consistency(small_code):
    """H_z @ data_readout must equal the last-round z syndrome (noiseless)."""
    sim = build_storage_simulation(2, trivial_noise(), small_code, use_x_logicals=False)
    rec = FrameSampler(sim.circuit, seed=7).sample(64)
    Hz = small_code.checks.z.toarray()
    Lz = small_code.logicals.z
    for r in rec[:8]:
        readout = sim.data_view(r)
        assert not ((Hz @ readout) % 2).any()
        assert not ((Lz @ readout) % 2).any()


def test_device_sampler_matches_cpu_invariants(small_code):
    sim = build_storage_simulation(3, trivial_noise(), small_code, use_x_logicals=False)
    ds = DeviceSampler(sim.circuit, shots=64)
    det = np.asarray(ds.sample_detectors(jax.random.PRNGKey(0), append_observables=True))
    assert not det.any()


def test_device_sampler_statistical_parity(small_code):
    sim = build_storage_simulation(2, depolarizing_noise(0.02, 0.01), small_code)
    shots = 4000
    r_cpu = FrameSampler(sim.circuit, seed=8).sample_detectors(shots).mean(axis=0)
    ds = DeviceSampler(sim.circuit, shots=shots)
    r_dev = np.asarray(ds.sample_detectors(jax.random.PRNGKey(2))).mean(axis=0)
    # per-detector binomial 5-sigma bound
    sigma = np.sqrt(np.maximum(r_cpu * (1 - r_cpu), 1e-4) / shots) * np.sqrt(2)
    assert np.all(np.abs(r_cpu - r_dev) < 5 * sigma + 1e-3)
