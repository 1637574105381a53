"""Clifford engine: tableau correctness vs dense matrices, group sizes, RB seqs."""
import numpy as np
import pytest

from forest_benchmarking_tpu.circuits import (
    Circuit, Gate, H, S, X, Y, Z, CZ, CNOT, SWAP, RX, RY, RZ)
from forest_benchmarking_tpu.paulis import (
    PauliTerm, sX, sY, sZ, str_to_pauli_term, pauli_term_to_matrix)
from forest_benchmarking_tpu.clifford import (
    CliffordTableau, clifford_circuit_to_tableau, apply_clifford_to_pauli,
    clifford_group, random_clifford_circuits, generate_rb_sequence,
    CLIFFORD_GROUP_SIZES, pauli_to_bits, bits_to_pauli)
from forest_benchmarking_tpu.sim.statevector import run_statevector


def circuit_unitary(circuit, qubits):
    from forest_benchmarking_tpu.circuits import Circuit as C, X as XG
    n = len(qubits)
    cols = []
    for i in range(2 ** n):
        prep = C([XG(qubits[j]) for j in range(n) if (i >> (n - 1 - j)) & 1])
        cols.append(np.asarray(run_statevector(prep + circuit, qubits)))
    return np.stack(cols, axis=1)


def dense_conjugate(circuit, pauli, qubits):
    u = circuit_unitary(circuit, qubits)
    p = pauli_term_to_matrix(pauli, qubits)
    return u @ p @ u.conj().T


PAULIS_2Q = ["XI", "IX", "YI", "IY", "ZI", "IZ", "XX", "YZ", "ZY", "XZ", "YY"]


@pytest.mark.parametrize("circuit,qubits", [
    (Circuit([H(0)]), [0]),
    (Circuit([S(0)]), [0]),
    (Circuit([S(0).dag()]), [0]),
    (Circuit([X(0)]), [0]),
    (Circuit([Y(0)]), [0]),
    (Circuit([Z(0)]), [0]),
    (Circuit([RX(np.pi / 2, 0)]), [0]),
    (Circuit([RX(-np.pi / 2, 0)]), [0]),
    (Circuit([RY(np.pi / 2, 0)]), [0]),
    (Circuit([RY(-np.pi / 2, 0)]), [0]),
    (Circuit([RZ(np.pi / 2, 0)]), [0]),
    (Circuit([RZ(-np.pi / 2, 0)]), [0]),
    (Circuit([RZ(np.pi, 0)]), [0]),
    (Circuit([H(0), S(0), H(0), S(0).dag()]), [0]),
    (Circuit([CZ(0, 1)]), [0, 1]),
    (Circuit([CNOT(0, 1)]), [0, 1]),
    (Circuit([CNOT(1, 0)]), [0, 1]),
    (Circuit([SWAP(0, 1)]), [0, 1]),
    (Circuit([H(0), CNOT(0, 1), S(1), CZ(0, 1), H(1)]), [0, 1]),
])
def test_conjugation_matches_dense(circuit, qubits):
    """Tableau conjugation must equal dense U P U^dag for every Pauli."""
    paulis = (["X", "Y", "Z"] if len(qubits) == 1 else PAULIS_2Q)
    for ps in paulis:
        pauli = str_to_pauli_term(ps, qubits)
        result = apply_clifford_to_pauli(circuit, pauli, qubits)
        expected = dense_conjugate(circuit, pauli, qubits)
        got = pauli_term_to_matrix(result, qubits)
        assert np.allclose(got, expected, atol=1e-10), \
            f"{circuit} on {ps}: got {result}"


def test_pauli_bits_round_trip():
    for ps in PAULIS_2Q:
        term = str_to_pauli_term(ps, [0, 1])
        pb = pauli_to_bits(term, [0, 1])
        back = bits_to_pauli(pb, [0, 1])
        assert back == term
    # with sign
    term = str_to_pauli_term("XY", [0, 1]) * -1
    assert bits_to_pauli(pauli_to_bits(term, [0, 1]), [0, 1]) == term


@pytest.mark.parametrize("n", [1, 2])
def test_clifford_group_sizes(n):
    elements, words, index = clifford_group(n)
    assert len(elements) == CLIFFORD_GROUP_SIZES[n]
    assert len(index) == len(elements)


def test_group_words_reproduce_elements():
    elements, words, index = clifford_group(1)
    for i in (0, 5, 17, 23):
        circ = Circuit([Gate(nm, (), (0,)) if nm != "SDG"
                        else Gate("S", (), (0,), dagger=True)
                        for nm, pos in words[i]])
        assert clifford_circuit_to_tableau(circ, [0]) == elements[i]


def test_random_cliffords_cover_group():
    rng = np.random.RandomState(0)
    circs, tabs = random_clifford_circuits([0], 500, rng)
    keys = {t.key() for t in tabs}
    assert len(keys) == 24  # all 24 elements appear in 500 draws (w.h.p.)


def test_rb_sequence_composes_to_identity():
    rng = np.random.RandomState(1)
    for qubits in ([0], [0, 1]):
        for depth in (2, 5, 10):
            seq = generate_rb_sequence(qubits, depth, rng=rng,
                                       use_basic_compile=False)
            assert len(seq) == depth
            total = Circuit()
            for c in seq:
                total += c
            u = circuit_unitary(total, qubits)
            phase = u[0, 0] / abs(u[0, 0])
            assert np.allclose(u / phase, np.eye(2 ** len(qubits)), atol=1e-9)


def test_rb_sequence_native_gates():
    rng = np.random.RandomState(2)
    seq = generate_rb_sequence([0, 1], 4, rng=rng, use_basic_compile=True)
    for circ in seq:
        for g in circ.gates:
            assert g.name in ("RX", "RZ", "CZ", "XY", "I")


def test_interleaved_rb_sequence():
    rng = np.random.RandomState(3)
    gate = Circuit([CZ(0, 1)])
    depth = 4
    seq = generate_rb_sequence([0, 1], depth, interleaved_gate=gate, rng=rng,
                               use_basic_compile=False)
    # depth-1 random + depth-1 interleaved + 1 inverse
    assert len(seq) == 2 * (depth - 1) + 1
    total = Circuit()
    for c in seq:
        total += c
    u = circuit_unitary(total, [0, 1])
    phase = u[0, 0] / abs(u[0, 0])
    assert np.allclose(u / phase, np.eye(4), atol=1e-9)


def test_rb_depth_too_small_raises():
    with pytest.raises(ValueError):
        generate_rb_sequence([0], 1)


def test_apply_clifford_preserves_coefficient():
    # H X H^dag = Z; with coefficient -2: -2*Z
    out = apply_clifford_to_pauli(Circuit([H(0)]), sX(0) * -2.0, [0])
    assert out == sZ(0) * -2.0


def test_known_conjugations():
    assert apply_clifford_to_pauli(Circuit([H(0)]), sX(0), [0]) == sZ(0)
    assert apply_clifford_to_pauli(Circuit([H(0)]), sZ(0), [0]) == sX(0)
    assert apply_clifford_to_pauli(Circuit([H(0)]), sY(0), [0]) == sY(0) * -1
    assert apply_clifford_to_pauli(Circuit([S(0)]), sX(0), [0]) == sY(0)
    # CNOT: X_c -> X_c X_t
    out = apply_clifford_to_pauli(Circuit([CNOT(0, 1)]), sX(0), [0, 1])
    assert out == sX(0) * sX(1)


# ------------------------- general-n synthesis & sampling --------------------

def test_synthesis_round_trip_1q_2q_groups():
    from forest_benchmarking_tpu.clifford import synthesize_circuit
    for n in (1, 2):
        elements, words, _ = clifford_group(n)
        rng = np.random.RandomState(n)
        idxs = rng.randint(len(elements), size=40)
        for i in idxs:
            circ = synthesize_circuit(elements[i], list(range(n)))
            assert clifford_circuit_to_tableau(circ, list(range(n))) == elements[i]


def test_synthesis_round_trip_3q_random_products():
    from forest_benchmarking_tpu.clifford import synthesize_circuit
    rng = np.random.RandomState(0)
    gates = ["H", "S", "CZ", "CNOT", "SWAP", "X", "Z"]
    for trial in range(20):
        c = Circuit()
        for _ in range(12):
            name = gates[rng.randint(len(gates))]
            if name in ("H", "S", "X", "Z"):
                c += Gate(name, (), (int(rng.randint(3)),))
            else:
                a, b = rng.choice(3, size=2, replace=False)
                c += Gate(name, (), (int(a), int(b)))
        tab = clifford_circuit_to_tableau(c, [0, 1, 2])
        circ = synthesize_circuit(tab, [0, 1, 2])
        assert clifford_circuit_to_tableau(circ, [0, 1, 2]) == tab, trial


def test_random_clifford_tableau_valid_and_uniformish():
    from forest_benchmarking_tpu.clifford import (random_clifford_tableau,
                                                  _symplectic_product)
    rng = np.random.RandomState(1)
    # validity: images preserve the symplectic form
    for n in (1, 2, 3, 4):
        t = random_clifford_tableau(n, rng)
        for i in range(n):
            for j in range(n):
                xi, zj = t.images[i], t.images[n + j]
                assert _symplectic_product(xi, zj) == (1 if i == j else 0)
                assert _symplectic_product(t.images[i], t.images[j]) == 0
                assert _symplectic_product(t.images[n + i], t.images[n + j]) == 0
    # uniformity on n=1: all 24 elements appear with ~equal frequency
    counts = {}
    for _ in range(2400):
        t = random_clifford_tableau(1, rng)
        counts[t.key()] = counts.get(t.key(), 0) + 1
    assert len(counts) == 24
    freqs = np.array(list(counts.values()))
    assert freqs.min() > 50  # expected 100 each; loose 5-sigma-ish bound


def test_random_clifford_2q_covers_group():
    from forest_benchmarking_tpu.clifford import random_clifford_tableau
    elements, _, index = clifford_group(2)
    rng = np.random.RandomState(2)
    seen = set()
    for _ in range(300):
        t = random_clifford_tableau(2, rng)
        assert t.key() in index  # every sample is a genuine group element
        seen.add(t.key())
    assert len(seen) > 290  # 11520 elements: collisions unlikely


def test_3q_rb_sequence_composes_to_identity():
    rng = np.random.RandomState(3)
    qubits = [0, 1, 2]
    for depth in (2, 4):
        seq = generate_rb_sequence(qubits, depth, rng=rng,
                                   use_basic_compile=False)
        assert len(seq) == depth
        total = Circuit()
        for c in seq:
            total += c
        u = circuit_unitary(total, qubits)
        phase = u[0, 0] / abs(u[0, 0])
        assert np.allclose(u / phase, np.eye(8), atol=1e-9)


def test_three_qubit_rb_sequence_compiles_and_inverts():
    """3+ qubit RB goes through synthesize_circuit, whose sign fixes emit Z
    gates; basic_compile must accept them (it used to raise), and the
    compiled sequence must still compose to the identity."""
    from forest_benchmarking_tpu.clifford import generate_rb_sequence
    from forest_benchmarking_tpu.randomized_benchmarking import (
        circuit_unitary_np)
    from forest_benchmarking_tpu.compilation import match_global_phase
    qubits = [0, 1, 2]
    seqs = generate_rb_sequence(qubits, 3, rng=np.random.RandomState(0))
    u = np.eye(8, dtype=complex)
    for c in seqs:
        u = circuit_unitary_np(c, qubits) @ u
    a1, a2 = match_global_phase(u, np.eye(8, dtype=complex))
    assert np.abs(np.asarray(a1) - np.asarray(a2)).max() < 1e-9


def test_clifford_rotation_angles_wrap_mod_2pi():
    """RZ(3*pi/2) is the same Clifford as RZ(-pi/2) up to global phase; the
    tableau conversion must accept any 2*pi-equivalent angle."""
    from forest_benchmarking_tpu.clifford import apply_clifford_to_pauli
    from forest_benchmarking_tpu.circuits import Circuit, RZ
    from forest_benchmarking_tpu.paulis import sX
    for theta in (3 * np.pi / 2, -np.pi / 2, 7 * np.pi / 2):
        out = apply_clifford_to_pauli(Circuit([RZ(theta, 0)]), sX(0), [0])
        assert str(out) == "(-1+0j)*Y0", (theta, out)
    # near-2pi from below is the identity
    out = apply_clifford_to_pauli(Circuit([RZ(2 * np.pi - 1e-12, 0)]),
                                  sX(0), [0])
    assert str(out) == str(sX(0))
