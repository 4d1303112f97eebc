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


# ---------- PAULI_CHANNEL_1 / PAULI_CHANNEL_2 (round-3: full vocabulary) ----------


def test_pauli_channel_1_hand_cases():
    # px=1: always X -> flips MZ, not MX
    c = parse_circuit(["RZ 0", "PAULI_CHANNEL_1(1,0,0) 0", "MZ 0"])
    assert np.all(FrameSampler(c, seed=0).sample(16) == 1)
    # py=1: Y flips both bases
    cy = parse_circuit(["RZ 0", "PAULI_CHANNEL_1(0,1,0) 0", "MZ 0"])
    assert np.all(FrameSampler(cy, seed=0).sample(16) == 1)
    cyx = parse_circuit(["RX 0", "PAULI_CHANNEL_1(0,1,0) 0", "MX 0"])
    assert np.all(FrameSampler(cyx, seed=0).sample(16) == 1)
    # pz=1: Z leaves MZ alone, flips MX
    cz = parse_circuit(["RZ 0", "PAULI_CHANNEL_1(0,0,1) 0", "MZ 0"])
    assert np.all(FrameSampler(cz, seed=0).sample(16) == 0)
    czx = parse_circuit(["RX 0", "PAULI_CHANNEL_1(0,0,1) 0", "MX 0"])
    assert np.all(FrameSampler(czx, seed=0).sample(16) == 1)


def test_pauli_channel_1_marginals():
    px, py, pz = 0.05, 0.1, 0.2
    c = parse_circuit([f"RZ 0", f"PAULI_CHANNEL_1({px},{py},{pz}) 0", "MZ 0"])
    shots = 40000
    rate = FrameSampler(c, seed=1).sample(shots).mean()
    want = px + py  # X or Y flips an MZ outcome
    assert abs(rate - want) < 5 * np.sqrt(want * (1 - want) / shots)


def test_pauli_channel_2_hand_cases():
    # parameter #5 (1-based) has Pauli code 4*A+B = 5 -> XX: both MZ flip
    args = ",".join("1" if k == 5 else "0" for k in range(1, 16))
    c = parse_circuit(["RZ 0 1", f"PAULI_CHANNEL_2({args}) 0 1", "MZ 0 1"])
    assert np.all(FrameSampler(c, seed=0).sample(16) == 1)
    # parameter #3 -> code 3 = IZ: Z on the SECOND qubit only
    args = ",".join("1" if k == 3 else "0" for k in range(1, 16))
    c2 = parse_circuit(["RX 0 1", f"PAULI_CHANNEL_2({args}) 0 1", "MX 0 1"])
    rec = FrameSampler(c2, seed=0).sample(16)
    assert np.all(rec[:, 0] == 0) and np.all(rec[:, 1] == 1)
    # parameter #8 -> code 8 = YI: Y on the FIRST qubit only
    args = ",".join("1" if k == 8 else "0" for k in range(1, 16))
    c3 = parse_circuit(["RZ 0 1", f"PAULI_CHANNEL_2({args}) 0 1", "MZ 0 1"])
    rec3 = FrameSampler(c3, seed=0).sample(16)
    assert np.all(rec3[:, 0] == 1) and np.all(rec3[:, 1] == 0)


def test_pauli_channel_device_oracle_parity(small_code):
    """Device sampler must match the CPU oracle statistically on a circuit
    mixing both multi-parameter channels with the standard ones."""
    from exp_ldpc_tpu.circuits.noise import apply_noise_pred
    from exp_ldpc_tpu.core import NoiseRewriter

    sim = build_storage_simulation(2, trivial_noise(), small_code)
    # inject PAULI_CHANNEL_1 on data after every measurement layer
    lines = []
    for line in sim.circuit:
        lines.append(line)
        if line.startswith(("MRX", "MRZ")):
            data = " ".join(str(q) for q in range(small_code.num_qubits))
            lines.append(f"PAULI_CHANNEL_1(0.004,0.002,0.006) {data}")
            lines.append(f"PAULI_CHANNEL_2({','.join(['0.002'] * 15)}) 0 1 2 3")
    c = parse_circuit(lines)
    shots = 4000
    r_cpu = FrameSampler(c, seed=11).sample_detectors(shots).mean(axis=0)
    ds = DeviceSampler(c, shots=shots)
    r_dev = np.asarray(ds.sample_detectors(jax.random.PRNGKey(5))).mean(axis=0)
    sigma = np.sqrt(np.maximum(r_cpu * (1 - r_cpu), 1e-4) / shots) * np.sqrt(2)
    assert np.all(np.abs(r_cpu - r_dev) < 5 * sigma + 1e-3)


def test_pauli_channel_dem_faults():
    from exp_ldpc_tpu.decoders.dem import detector_error_model

    c = parse_circuit([
        "RZ 0",
        "PAULI_CHANNEL_1(0.01,0.02,0.03) 0",
        "MZ 0",
        "DETECTOR rec[-1]",
    ])
    dem = detector_error_model(c)
    # X and Y (p=.01+.02 merged by identical signature) flip the detector; Z never does
    assert dem.num_faults == 1
    p1, p2 = 0.01, 0.02
    assert abs(dem.priors[0] - (p1 * (1 - p2) + p2 * (1 - p1))) < 1e-7

    args = ",".join("0.01" if k in (3, 5) else "0" for k in range(1, 16))
    c2 = parse_circuit([
        "RZ 0 1",
        f"PAULI_CHANNEL_2({args}) 0 1",
        "MZ 0 1",
        "DETECTOR rec[-2]",
        "DETECTOR rec[-1]",
    ])
    dem2 = detector_error_model(c2)
    # IZ (code 3) is unobservable in MZ; XX (code 5) fires BOTH detectors
    assert dem2.num_faults == 1
    assert abs(dem2.priors[0] - 0.01) < 1e-7
    assert dem2.fault_detectors.toarray()[:, 0].tolist() == [1, 1]


# ---------- CORRELATED_ERROR / ELSE_CORRELATED_ERROR (round-4) ----------


def test_correlated_error_hand_cases():
    # p=1: the whole Pauli product fires — X flips MZ0, Y flips MZ1, Z doesn't
    c = parse_circuit(["RZ 0 1 2", "CORRELATED_ERROR(1) X0 Y1 Z2", "MZ 0 1 2"])
    rec = FrameSampler(c, seed=0).sample(16)
    assert np.all(rec[:, 0] == 1) and np.all(rec[:, 1] == 1)
    assert np.all(rec[:, 2] == 0)
    # Z component observable in the X basis; E alias accepted
    cz = parse_circuit(["RX 2", "E(1) Z2", "MX 2"])
    assert np.all(FrameSampler(cz, seed=0).sample(16) == 1)
    # ELSE after a fired chain never applies...
    c2 = parse_circuit([
        "RZ 0 1", "CORRELATED_ERROR(1) X0",
        "ELSE_CORRELATED_ERROR(1) X1", "MZ 0 1"])
    rec2 = FrameSampler(c2, seed=0).sample(16)
    assert np.all(rec2[:, 0] == 1) and np.all(rec2[:, 1] == 0)
    # ...and always applies when the chain did not fire
    c3 = parse_circuit([
        "RZ 0 1", "CORRELATED_ERROR(0) X0",
        "ELSE_CORRELATED_ERROR(1) X1", "MZ 0 1"])
    rec3 = FrameSampler(c3, seed=0).sample(16)
    assert np.all(rec3[:, 0] == 0) and np.all(rec3[:, 1] == 1)
    # a new CORRELATED_ERROR resets the chain
    c4 = parse_circuit([
        "RZ 0 1 2", "CORRELATED_ERROR(1) X0",
        "CORRELATED_ERROR(0) X1",
        "ELSE_CORRELATED_ERROR(1) X2", "MZ 0 1 2"])
    rec4 = FrameSampler(c4, seed=0).sample(16)
    assert np.all(rec4 == [[1, 0, 1]] * 16)


def test_correlated_error_chain_marginals():
    # P(1st)=p1, P(2nd)=(1-p1)p2, P(3rd)=(1-p1)(1-p2)p3
    p1, p2, p3 = 0.3, 0.5, 1.0
    c = parse_circuit([
        "RZ 0 1 2",
        f"CORRELATED_ERROR({p1}) X0",
        f"ELSE_CORRELATED_ERROR({p2}) X1",
        f"ELSE_CORRELATED_ERROR({p3}) X2",
        "MZ 0 1 2"])
    shots = 40000
    rates = FrameSampler(c, seed=2).sample(shots).mean(axis=0)
    want = np.array([p1, (1 - p1) * p2, (1 - p1) * (1 - p2) * p3])
    sigma = np.sqrt(want * (1 - want) / shots)
    assert np.all(np.abs(rates - want) < 5 * sigma + 1e-3)
    # members are mutually exclusive per shot: at most one fires
    rec = FrameSampler(c, seed=3).sample(4000)
    assert np.all(rec.sum(axis=1) == 1)  # p3=1 -> exactly one always fires


def test_correlated_error_device_oracle_parity():
    lines = [
        "RZ 0 1 2 3",
        "CORRELATED_ERROR(0.2) X0 Y1",
        "ELSE_CORRELATED_ERROR(0.4) X2 Z0",
        "ELSE_CORRELATED_ERROR(0.3) Y3",
        "TICK",
        "CORRELATED_ERROR(0.1) Z2 X3",
        "MZ 0 1 2 3",
        "DETECTOR rec[-4]", "DETECTOR rec[-3]",
        "DETECTOR rec[-2]", "DETECTOR rec[-1]",
    ]
    c = parse_circuit(lines)
    shots = 8000
    r_cpu = FrameSampler(c, seed=7).sample_detectors(shots).mean(axis=0)
    ds = DeviceSampler(c, shots=shots)
    r_dev = np.asarray(ds.sample_detectors(jax.random.PRNGKey(9))).mean(axis=0)
    sigma = np.sqrt(np.maximum(r_cpu * (1 - r_cpu), 1e-4) / shots) * np.sqrt(2)
    assert np.all(np.abs(r_cpu - r_dev) < 5 * sigma + 1e-3)


def test_correlated_error_in_repeat_block():
    # chains inside a REPEAT body lower through the device sampler's scan
    lines = [
        "RZ 0 1",
        "REPEAT 3 {",
        "CORRELATED_ERROR(0.25) X0 X1",
        "ELSE_CORRELATED_ERROR(0.5) X0",
        "MRZ 0 1",
        "}",
    ]
    c = parse_circuit(lines)
    shots = 6000
    r_cpu = FrameSampler(c, seed=12).sample(shots).mean(axis=0)
    r_dev = np.asarray(DeviceSampler(c, shots=shots)
                       .sample(jax.random.PRNGKey(13))).mean(axis=0)
    sigma = np.sqrt(np.maximum(r_cpu * (1 - r_cpu), 1e-4) / shots) * np.sqrt(2)
    assert np.all(np.abs(r_cpu - r_dev) < 5 * sigma + 1e-3)


def test_correlated_error_dem_chain_priors():
    from exp_ldpc_tpu.decoders.dem import detector_error_model

    p1, p2 = 0.1, 0.25
    c = parse_circuit([
        "RZ 0 1",
        f"CORRELATED_ERROR({p1}) X0 X1",
        f"ELSE_CORRELATED_ERROR({p2}) X1",
        "MZ 0 1",
        "DETECTOR rec[-2]", "DETECTOR rec[-1]",
    ])
    dem = detector_error_model(c)
    assert dem.num_faults == 2
    sigs = {tuple(dem.fault_detectors.toarray()[:, f]): dem.priors[f]
            for f in range(2)}
    assert abs(sigs[(1, 1)] - p1) < 1e-9  # the full product
    assert abs(sigs[(0, 1)] - (1 - p1) * p2) < 1e-9  # chain-converted ELSE


def test_correlated_error_parse_validation():
    with pytest.raises(ValueError, match="must immediately follow"):
        parse_circuit(["RZ 0", "ELSE_CORRELATED_ERROR(0.1) X0", "MZ 0"])
    with pytest.raises(ValueError, match="must immediately follow"):
        # a TICK breaks the chain
        parse_circuit(["RZ 0", "CORRELATED_ERROR(0.1) X0", "TICK",
                       "ELSE_CORRELATED_ERROR(0.1) X0", "MZ 0"])
    with pytest.raises(ValueError, match="Pauli targets"):
        parse_circuit(["CORRELATED_ERROR(0.1) 0 1"])
    with pytest.raises(ValueError, match="duplicate qubit"):
        parse_circuit(["CORRELATED_ERROR(0.1) X0 Z0"])
    with pytest.raises(ValueError, match="requires a probability"):
        parse_circuit(["CORRELATED_ERROR X0"])


def test_correlated_error_parametric_rebind():
    def make(p):
        return parse_circuit([
            "RZ 0 1", f"CORRELATED_ERROR({p}) X0 X1", "MZ 0 1"])

    c1, c2 = make(0.4), make(0.01)
    assert c1.structure_signature() == c2.structure_signature()
    # different Pauli products must NOT share an executable
    c3 = parse_circuit(["RZ 0 1", "CORRELATED_ERROR(0.4) X0 Z1", "MZ 0 1"])
    assert c3.structure_signature() != c1.structure_signature()
    shots = 4096
    d1, d2 = DeviceSampler(c1, shots=shots), DeviceSampler(c2, shots=shots)
    assert d1._sample_parametric is d2._sample_parametric
    r1 = np.asarray(d1.sample(jax.random.PRNGKey(0))).mean()
    r2 = np.asarray(d2.sample(jax.random.PRNGKey(0))).mean()
    assert r1 > 0.3 and r2 < 0.05


def test_pauli_channel_arity_validated():
    with pytest.raises(ValueError, match="exactly 3"):
        parse_circuit(["PAULI_CHANNEL_1(0.1,0.2) 0"])
    with pytest.raises(ValueError, match="exactly 15"):
        parse_circuit(["PAULI_CHANNEL_2(0.1) 0 1"])


def test_pauli_channel_parametric_rebind(small_code):
    """Two circuits differing only in channel probabilities share one
    compiled parametric sampler (structure_signature equality)."""
    def make(px):
        lines = ["RZ 0 1", f"PAULI_CHANNEL_1({px},0.001,0.002) 0 1", "MZ 0 1"]
        return parse_circuit(lines)

    c1, c2 = make(0.3), make(0.001)
    assert c1.structure_signature() == c2.structure_signature()
    shots = 4096
    d1 = DeviceSampler(c1, shots=shots)
    d2 = DeviceSampler(c2, shots=shots)
    assert d1._sample_parametric is d2._sample_parametric  # shared executable
    r1 = np.asarray(d1.sample(jax.random.PRNGKey(0))).mean()
    r2 = np.asarray(d2.sample(jax.random.PRNGKey(0))).mean()
    assert r1 > 0.2 and r2 < 0.05  # probabilities rebound at runtime


def test_correlated_error_user_noise_rewriter(small_code):
    """A user NoiseRewriter emitting CORRELATED_ERROR chains flows through
    build_storage_simulation into BOTH samplers (the combinator API's
    advertised vocabulary is honest end-to-end)."""
    from exp_ldpc_tpu.core import NoiseRewriter

    def rewrite(targets, lines):
        out = []
        for line in lines:
            out.append(line)
            if line.startswith(("MRZ", "MRX")):
                d = targets.data[:3]
                out.append(f"CORRELATED_ERROR(0.02) X{d[0]} X{d[1]}")
                out.append(f"ELSE_CORRELATED_ERROR(0.05) Z{d[2]}")
        return out

    sim = build_storage_simulation(
        2, NoiseRewriter(rewrite), small_code, use_x_logicals=False)
    c = parse_circuit(sim.circuit)
    shots = 4000
    r_cpu = FrameSampler(c, seed=21).sample_detectors(shots).mean(axis=0)
    ds = DeviceSampler(c, shots=shots)
    r_dev = np.asarray(ds.sample_detectors(jax.random.PRNGKey(22))).mean(axis=0)
    assert r_cpu.sum() > 0  # the injected noise is actually observable
    sigma = np.sqrt(np.maximum(r_cpu * (1 - r_cpu), 1e-4) / shots) * np.sqrt(2)
    assert np.all(np.abs(r_cpu - r_dev) < 5 * sigma + 1e-3)
