"""Randomized property tests (fixed seeds, small trial counts).

Round-3 additions distilled from a wider fuzz campaign: each test encodes an
invariant that must hold for ANY input, complementing the fixed-value and
closed-loop tests elsewhere in the suite. The diamond-norm input-factor bug
(fixed in round 3) was caught exactly this way — transpose-covariant test
channels alone could not see it.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from forest_benchmarking_tpu.ops import rand_map_with_BCSZ_dist
from forest_benchmarking_tpu.ops.superoperator_transformations import (
    choi2kraus, choi2superop, choi2pauli_liouville, choi2chi, superop2choi,
    pauli_liouville2choi, chi2choi, kraus2choi, kraus2superop, vec, unvec)
from forest_benchmarking_tpu.ops.apply_superoperator import (
    apply_kraus_ops_2_state, apply_choi_matrix_2_state)
from forest_benchmarking_tpu.ops.compose_superoperators import (
    compose_channel_kraus)
from forest_benchmarking_tpu.ops.random_operators import ginibre_state_matrix


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_representation_roundtrips_close(seed):
    """superop/PL/chi/kraus -> choi must invert choi2* for random channels."""
    key = jax.random.PRNGKey(seed)
    d = [2, 4][seed % 2]
    choi = rand_map_with_BCSZ_dist(key, d, kraus_rank=d, dtype=jnp.complex128)
    c0 = np.asarray(choi)
    for there, back in [(choi2superop, superop2choi),
                        (choi2pauli_liouville, pauli_liouville2choi),
                        (choi2chi, chi2choi),
                        (choi2kraus, kraus2choi)]:
        np.testing.assert_allclose(np.asarray(back(there(choi))), c0,
                                   atol=1e-10)


@pytest.mark.parametrize("seed", [0, 1, 2, 3, 4, 5])
def test_channel_application_paths_agree(seed):
    """Applying a random channel via kraus, choi, and superop representations
    must produce the same output state, and preserve the trace."""
    k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
    d = [2, 4][seed % 2]
    choi = rand_map_with_BCSZ_dist(k1, d, kraus_rank=d, dtype=jnp.complex128)
    rho = ginibre_state_matrix(k2, d, d)
    out_k = np.asarray(apply_kraus_ops_2_state(choi2kraus(choi), rho))
    out_c = np.asarray(apply_choi_matrix_2_state(choi, rho))
    out_s = np.asarray(unvec(choi2superop(choi) @ vec(rho)))
    np.testing.assert_allclose(out_k, out_c, atol=1e-9)
    np.testing.assert_allclose(out_k, out_s, atol=1e-9)
    assert np.isclose(np.trace(out_k), np.trace(np.asarray(rho)), atol=1e-9)


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_kraus_composition_matches_superop_product(seed):
    """compose_channel_kraus(B, A) must equal the superoperator product
    S_B @ S_A for random channel pairs."""
    k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
    d = [2, 4][seed % 2]
    ca = rand_map_with_BCSZ_dist(k1, d, kraus_rank=d, dtype=jnp.complex128)
    cb = rand_map_with_BCSZ_dist(k2, d, kraus_rank=2, dtype=jnp.complex128)
    comp = compose_channel_kraus(choi2kraus(cb), choi2kraus(ca))
    np.testing.assert_allclose(
        np.asarray(kraus2superop(comp)),
        np.asarray(choi2superop(cb) @ choi2superop(ca)), atol=1e-8)


@pytest.mark.parametrize("trial", [0, 1, 2])
def test_router_random_topology_preserves_distribution(trial):
    """SWAP routing onto a random connected topology (with spare qubits) must
    reproduce the unrouted model circuit's output distribution and leave the
    spares in |0>."""
    from forest_benchmarking_tpu.quantum_volume import (
        topology_restricted_program_generator, generate_abstract_qv_circuit,
        abstract_circuit_to_circuit)
    from forest_benchmarking_tpu.sim.statevector import run_statevector

    rng = np.random.RandomState(100 + trial)
    depth = int(rng.randint(2, 5))
    labels = [int(q) for q in rng.permutation(10)[:depth + int(rng.randint(0, 3))]]
    reg = labels[:depth]
    perm = list(rng.permutation(labels))
    edges = [(perm[i], perm[int(rng.randint(0, i))]) for i in range(1, len(perm))]

    permutations, gates = generate_abstract_qv_circuit(depth, rng)
    routed = topology_restricted_program_generator(edges)(
        None, reg, permutations, gates)

    eset = {tuple(sorted(e)) for e in edges}
    for g in routed.gates:
        if len(g.qubits) == 2:
            assert tuple(sorted(g.qubits)) in eset, g

    touched = sorted({q for g in routed.gates for q in g.qubits} | set(reg))
    spare = [q for q in touched if q not in reg]
    p = np.abs(np.asarray(run_statevector(routed, reg + spare))) ** 2
    p = p.reshape(2 ** depth, -1)
    p_ideal = np.abs(np.asarray(run_statevector(
        abstract_circuit_to_circuit(reg, permutations, gates), reg))) ** 2
    np.testing.assert_allclose(p[:, 0], p_ideal, atol=1e-9)
    assert p[:, 1:].sum() < 1e-12


@pytest.mark.parametrize("trial", [0, 1, 2, 3])
def test_clifford_synthesis_roundtrip_and_conjugation(trial):
    """synthesize_circuit(tableau) must reproduce the tableau exactly, and
    conjugating a Pauli through the circuit must preserve expectation values
    on |0...0>."""
    from forest_benchmarking_tpu.clifford import (
        random_clifford_tableau, synthesize_circuit,
        clifford_circuit_to_tableau, apply_clifford_to_pauli)
    from forest_benchmarking_tpu.paulis import PauliTerm
    from forest_benchmarking_tpu.sim.statevector import run_statevector
    from forest_benchmarking_tpu.utils import I_MAT, X_MAT, Y_MAT, Z_MAT

    def pauli_mat(term, qubits):
        ops = dict((q, o) for q, o in term.operations_as_set())
        mats = {"X": X_MAT, "Y": Y_MAT, "Z": Z_MAT}
        out = np.array([[1.0 + 0j]])
        for q in qubits:
            out = np.kron(out, mats.get(ops.get(q, "I"), I_MAT))
        return complex(term.coefficient) * out

    rng = np.random.RandomState(200 + trial)
    n = int(rng.randint(1, 4))
    qubits = list(range(n))
    tab = random_clifford_tableau(n, rng)
    circ = synthesize_circuit(tab, qubits)
    assert clifford_circuit_to_tableau(circ, qubits).key() == tab.key()

    pauli = PauliTerm.from_list(
        [(str(rng.choice(["X", "Y", "Z"])), q) for q in qubits])
    image = apply_clifford_to_pauli(circ, pauli, qubits)
    psi = np.asarray(run_statevector(circ, qubits))
    e0 = np.zeros(2 ** n, dtype=complex)
    e0[0] = 1
    lhs = np.vdot(psi, pauli_mat(image, qubits) @ psi)
    rhs = np.vdot(e0, pauli_mat(pauli, qubits) @ e0)
    assert abs(lhs - rhs) < 1e-9


@pytest.mark.parametrize("trial", [0, 1, 2])
def test_tpb_grouping_valid_and_complete(trial):
    """Both grouping methods must keep every observable exactly once and only
    group mutually TPB-compatible settings."""
    from forest_benchmarking_tpu.observable_estimation import (
        ExperimentSetting, ObservablesExperiment, group_settings, zeros_state)
    from forest_benchmarking_tpu.paulis import PauliTerm
    from forest_benchmarking_tpu.circuits import Circuit

    rng = np.random.RandomState(300 + trial)
    nq = int(rng.randint(2, 6))
    paulis = []
    for _ in range(10):
        ops = [(str(rng.choice(["I", "X", "Y", "Z"])), q) for q in range(nq)]
        ops = [(o, q) for o, q in ops if o != "I"]
        if ops:
            paulis.append(PauliTerm.from_list(ops))
    settings = [ExperimentSetting(zeros_state(range(nq)), p) for p in paulis]
    expt = ObservablesExperiment([[s] for s in settings], program=Circuit())

    def compatible(p1, p2):
        o1 = dict((q, o) for q, o in p1.operations_as_set())
        o2 = dict((q, o) for q, o in p2.operations_as_set())
        return all(o1[q] == o2[q] for q in set(o1) & set(o2))

    for method in ("greedy", "clique-removal"):
        grouped = group_settings(expt, method=method)
        got = [s.observable for grp in grouped for s in grp]
        assert sorted(map(str, got)) == sorted(map(str, paulis)), method
        for grp in grouped:
            obs = [s.observable for s in grp]
            for i in range(len(obs)):
                for j in range(i + 1, len(obs)):
                    assert compatible(obs[i], obs[j]), (method, obs[i], obs[j])
