"""Tests: readout characterization, entangled states, ripple-carry adder."""
import networkx as nx
import numpy as np
import pytest

from forest_benchmarking_tpu.circuits import Circuit, X, H, CNOT
from forest_benchmarking_tpu.sim import QVM
from forest_benchmarking_tpu.readout import (
    get_flipped_circuit, estimate_confusion_matrix,
    estimate_joint_confusion_in_set, marginalize_confusion_matrix,
    estimate_joint_reset_confusion)
from forest_benchmarking_tpu.entangled_states import (
    create_ghz_program, ghz_state_statistics, create_graph_state,
    measure_graph_state, compiled_parametric_graph_state)
from forest_benchmarking_tpu.classical_logic import (
    CNOT_X_basis, CCNOT_X_basis, majority_gate, unmajority_add_gate,
    unmajority_add_parallel_gate, adder, get_qubit_registers_for_adder,
    assign_registers_to_line_or_cycle, get_n_bit_adder_results,
    get_success_probabilities_from_results,
    get_error_hamming_distributions_from_results)
from forest_benchmarking_tpu.sim.statevector import run_statevector


# ------------------------------- readout ------------------------------------

def test_confusion_matrix_ideal():
    qvm = QVM(seed=1)
    cm = estimate_confusion_matrix(qvm, 0, num_shots=2000)
    assert np.allclose(cm, np.eye(2), atol=0.01)


def test_confusion_matrix_noisy():
    qvm = QVM(seed=2)

    class NoisyQVM(QVM):
        def run(self, circuit, qubits, num_shots):
            noisy = circuit.copy()
            noisy.define_noisy_readout(0, p00=0.9, p11=0.8)
            return super().run(noisy, qubits, num_shots)

    cm = estimate_confusion_matrix(NoisyQVM(seed=2), 0, num_shots=30000)
    assert abs(cm[0, 0] - 0.9) < 0.01
    assert abs(cm[1, 1] - 0.8) < 0.01


def test_joint_confusion_and_marginalization():
    qvm = QVM(seed=3)
    cms = estimate_joint_confusion_in_set(qvm, qubits=[0, 1], num_shots=500,
                                          joint_group_size=2)
    assert set(cms.keys()) == {(0, 1)}
    joint = cms[(0, 1)]
    assert joint.shape == (4, 4)
    assert np.allclose(joint, np.eye(4), atol=0.05)
    # marginal onto qubit 0 should be ~ the 2x2 identity
    marg = marginalize_confusion_matrix(joint, [0, 1], (0,))
    assert np.allclose(marg, np.eye(2), atol=0.05)
    # single-qubit groups
    cms1 = estimate_joint_confusion_in_set(qvm, qubits=[0, 1], num_shots=500,
                                           joint_group_size=1)
    assert set(cms1.keys()) == {(0,), (1,)}


def test_reset_confusion_ideal():
    qvm = QVM(seed=4)
    cms = estimate_joint_reset_confusion(qvm, qubits=[0], num_trials=5)
    # ideal reset: first column all ones
    assert np.allclose(cms[(0,)][:, 0], 1.0)


def test_get_flipped_circuit():
    c = Circuit([H(0)])
    flipped = get_flipped_circuit(c, [0, 1])
    assert len(flipped.gates) == 3


# --------------------------- entangled states --------------------------------

def test_ghz_program_statistics():
    qvm = QVM(seed=5)
    tree = nx.from_edgelist([(0, 1), (1, 2)], create_using=nx.DiGraph)
    program, nodes = create_ghz_program(tree)
    bits = qvm.run(program, nodes, 2000)
    stats = ghz_state_statistics(bits)
    assert stats["total"] == 2000
    assert stats["bell"] / stats["total"] > 0.99


def test_ghz_requires_tree():
    cyclic = nx.from_edgelist([(0, 1), (1, 2), (2, 0)], create_using=nx.DiGraph)
    with pytest.raises(AssertionError):
        create_ghz_program(cyclic)


def test_graph_state_stabilizers():
    # graph state on a path 0-1: stabilizers X0 Z1 and Z0 X1 have expectation 1
    qvm = QVM(seed=6)
    from forest_benchmarking_tpu.paulis import str_to_pauli_term
    graph = nx.path_graph(2)
    program = create_graph_state(graph)
    for s in ["XZ", "ZX"]:
        val = qvm.expectation(program, [0, 1], str_to_pauli_term(s, [0, 1]))
        assert np.isclose(val, 1.0, atol=1e-10), s


def test_measure_graph_state():
    graph = nx.path_graph(3)
    prog, meas = measure_graph_state(graph, focal_node=1, theta=0.5)
    assert meas == [1, 0, 2]
    full, meas2 = compiled_parametric_graph_state(graph, 1, theta=0.5)
    assert meas2 == meas
    for g in full.gates:
        assert g.name in ("RX", "RZ", "CZ", "XY", "I")


# --------------------------- classical logic ---------------------------------

def test_x_basis_gates_equal_z_basis_conjugated():
    from forest_benchmarking_tpu.compilation import match_global_phase

    def unitary_of(circuit, qubits):
        n = len(qubits)
        cols = []
        for i in range(2 ** n):
            prep = Circuit([X(qubits[j]) for j in range(n)
                            if (i >> (n - 1 - j)) & 1])
            cols.append(np.asarray(run_statevector(prep + circuit, qubits)))
        return np.stack(cols, axis=1)

    # CNOT_X = (H x H?) no: H on both control and target? verify via identity:
    # H_c H_t CNOTX H_c H_t should equal CNOT? Simplest: check CNOTX|++> = |++>
    # and CNOTX |-+> = |--> (control in X basis flips target X-basis parity)
    u = unitary_of(CNOT_X_basis(0, 1), [0, 1])
    plus = np.array([1, 1]) / np.sqrt(2)
    minus = np.array([1, -1]) / np.sqrt(2)
    pp = np.kron(plus, plus)
    mp = np.kron(minus, plus)
    mm = np.kron(minus, minus)
    assert np.allclose(np.abs(u @ pp), np.abs(pp), atol=1e-10)
    assert np.allclose(np.abs((u @ mp).conj() @ mm), 1.0, atol=1e-10)


def test_assign_registers_line():
    graph = nx.path_graph(6)
    reg_a, reg_b, carry, z = assign_registers_to_line_or_cycle(0, graph, 2)
    assert carry == 0
    assert reg_b == [1, 3] and reg_a == [2, 4]
    assert z == 5


def test_assign_registers_too_small():
    with pytest.raises(ValueError):
        assign_registers_to_line_or_cycle(0, nx.path_graph(3), 2)


def test_get_qubit_registers_for_adder():
    topology = nx.path_graph(8)
    regs = get_qubit_registers_for_adder(topology, 3)
    reg_a, reg_b, carry, z = regs
    assert len(reg_a) == 3 and len(reg_b) == 3


def test_adder_all_2bit_sums():
    qvm = QVM(seed=7)
    results = get_n_bit_adder_results(qvm, 2, num_shots=20)
    probs = get_success_probabilities_from_results(results)
    assert len(probs) == 16
    assert np.allclose(probs, 1.0), probs  # noiseless adder is exact
    distrs = get_error_hamming_distributions_from_results(results)
    for d in distrs:
        assert np.isclose(d[0], 1.0)


def test_adder_x_basis():
    qvm = QVM(seed=8)
    registers = ([2, 4], [1, 3], 0, 5)
    prog, meas = adder([0, 1], [0, 1], *registers, in_x_basis=True)
    bits = qvm.run(prog, meas, 50)
    # 1 + 1 = 2 -> bits [0,1,0] (MSB first, 3 bits)
    assert np.all(bits == [0, 1, 0])


def test_adder_mismatched_lengths():
    with pytest.raises(ValueError):
        adder([0], [0, 1], [0], [1], 2, 3)
