"""Quantum volume tests: ideal heavy-output probabilities, batched == looped."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from forest_benchmarking_tpu.sim import QVM
from forest_benchmarking_tpu.quantum_volume import (
    generate_abstract_qv_circuit, collect_heavy_outputs,
    abstract_circuit_to_circuit, sample_rand_circuits_for_heavy_out,
    sample_heavy_outputs_batched, _simulate_qv_circuit, _sample_perms,
    calculate_prob_est_and_err, measure_quantum_volume,
    measure_quantum_volume_batched, count_heavy_hitters_sampled,
    get_prob_sample_heavy_by_depth, extract_quantum_volume_from_results)

IDEAL_ASYMPTOTE = (1 + np.log(2)) / 2  # ~ 0.8466 [QVol]


def test_abstract_circuit_shapes():
    rng = np.random.RandomState(0)
    perms, gates = generate_abstract_qv_circuit(4, rng)
    assert len(perms) == 4 and all(len(p) == 4 for p in perms)
    assert gates.shape == (4, 2, 4, 4)
    # gates are unitary
    for layer in gates:
        for g in layer:
            assert np.allclose(g @ g.conj().T, np.eye(4), atol=1e-10)


def test_collect_heavy_outputs_median_split():
    rng = np.random.RandomState(1)
    perms, gates = generate_abstract_qv_circuit(3, rng)
    hh = collect_heavy_outputs(3, perms, gates)
    # strictly-greater-than-median: at most half the 8 outcomes
    assert 0 < len(hh) <= 4


def test_ideal_sampling_matches_heavy_sets():
    # sampling from the ideal distribution: heavy prob should be near the
    # ideal asymptote (within a loose tolerance for small depth/samples)
    qvm = QVM(seed=2)
    rng = np.random.RandomState(2)
    num_circuits, num_shots = 30, 300
    num_heavy = sample_rand_circuits_for_heavy_out(
        qvm, list(range(3)), 3, None, num_circuits, num_shots, rng=rng)
    prob = num_heavy / (num_circuits * num_shots)
    assert 0.7 < prob < 0.95


def test_batched_simulation_matches_host_sim():
    # the jit bit-permutation path must equal the per-circuit host path
    rng = np.random.RandomState(3)
    depth = 4
    perms, gates = generate_abstract_qv_circuit(depth, rng)
    probs_batched = np.asarray(_simulate_qv_circuit(
        jnp.asarray(np.stack(perms)), jnp.asarray(gates, jnp.complex128), depth))
    hh_host = set(collect_heavy_outputs(depth, perms, gates))
    med = np.median(probs_batched)
    hh_batched = {i for i, p in enumerate(probs_batched) if p > med}
    assert hh_host == hh_batched


def test_sample_heavy_outputs_batched_runs():
    key = jax.random.PRNGKey(0)
    num_heavy = int(sample_heavy_outputs_batched(key, depth=3, num_circuits=50,
                                                 num_shots=200,
                                                 dtype=jnp.float64))
    prob = num_heavy / (50 * 200)
    assert 0.7 < prob < 0.95


@pytest.mark.slow
def test_measure_quantum_volume_batched_to_5():
    results = measure_quantum_volume_batched(jax.random.PRNGKey(1), max_depth=5,
                                             num_circuits=120, num_shots=300,
                                             dtype=jnp.float64)
    # ideal device: every depth achieved, probabilities near the asymptote
    for depth, (prob, conf) in results.items():
        assert conf > 2 / 3, results
        assert 0.75 < prob < 0.95
    assert extract_quantum_volume_from_results(results) == 2 ** 5


def test_calculate_prob_est_and_err():
    prob, conf = calculate_prob_est_and_err(700, 100, 10)
    assert np.isclose(prob, 0.7)
    assert conf < prob


def test_count_heavy_hitters_sampled():
    results = [np.array([[0, 0], [0, 1], [1, 1]])]
    hh = [[0, 3]]  # ints for 00 and 11
    counts = list(count_heavy_hitters_sampled(results, hh))
    assert counts == [2]


def test_get_prob_sample_heavy_by_depth():
    out = get_prob_sample_heavy_by_depth([2, 2, 3], [80, 90, 70],
                                         [100, 100, 100])
    assert set(out.keys()) == {2, 3}
    prob2, _ = out[2]
    assert np.isclose(prob2, (80 + 90) / 200)


def test_extract_quantum_volume():
    results = {2: (0.9, 0.8), 3: (0.85, 0.7), 4: (0.6, 0.5)}
    assert extract_quantum_volume_from_results(results) == 2 ** 3
    assert extract_quantum_volume_from_results({2: (0.5, 0.4)}) == 2


def test_measure_quantum_volume_noisy_fails_early():
    # a QVM with heavy depolarizing noise on the QV gates should fail at depth 2
    from forest_benchmarking_tpu.sim.noise import depolarizing_kraus_map

    class NoisyQVM(QVM):
        def run(self, circuit, qubits, num_shots):
            noisy = circuit.copy()
            # attach strong 1q depolarizing noise to every QVGATE application
            ks = depolarizing_kraus_map(0.9)
            two_q = [np.kron(a, b) for a in ks for b in ks]
            noisy.define_noisy_gate("QVGATE", None, two_q)
            return super().run(noisy, qubits, num_shots)

    qvm = NoisyQVM(seed=4)
    rng = np.random.RandomState(5)
    with pytest.warns(UserWarning):  # num_circuits < 100
        results = measure_quantum_volume(qvm, qubits=[0, 1, 2],
                                         num_circuits=20, num_shots=100,
                                         rng=rng)
    assert extract_quantum_volume_from_results(results) == 2 ** 1


def test_batched_noisy_density_matches_qvm_density_path():
    """The batched noisy QV kernel's output distribution equals the
    per-circuit density-matrix path (define_noisy_gate semantics) on the
    same abstract circuit."""
    from forest_benchmarking_tpu.quantum_volume import (
        _simulate_qv_circuit_density)
    from forest_benchmarking_tpu.sim.density import run_density_matrix
    from forest_benchmarking_tpu.sim.noise import depolarizing_kraus_map

    depth = 3
    rng = np.random.RandomState(7)
    permutations, gates = generate_abstract_qv_circuit(depth, rng)
    ks = depolarizing_kraus_map(0.2)
    two_q = np.stack([np.kron(a, b) for a in ks for b in ks])

    # per-circuit QVM path
    circ = abstract_circuit_to_circuit(list(range(depth)), permutations, gates)
    circ.define_noisy_gate("QVGATE", None, two_q)
    rho = np.asarray(run_density_matrix(circ, list(range(depth))))
    want = np.real(np.diag(rho))

    # batched kernel on the same perms/gates
    perms = jnp.asarray(np.stack(permutations))
    got = np.asarray(_simulate_qv_circuit_density(
        perms, jnp.asarray(gates, jnp.complex128),
        jnp.asarray(two_q, jnp.complex128), depth))
    np.testing.assert_allclose(got, want, atol=1e-10)


@pytest.mark.slow
def test_batched_noisy_qv_fails_early_ideal_passes():
    """Strong depolarizing noise drives the batched heavy-output probability
    to ~0.5 (failing the 2/3 bar) while the ideal batched path passes."""
    from forest_benchmarking_tpu.quantum_volume import (
        measure_quantum_volume_batched)
    from forest_benchmarking_tpu.sim.noise import depolarizing_kraus_map

    ks = depolarizing_kraus_map(0.9)
    two_q = np.stack([np.kron(a, b) for a in ks for b in ks])
    noisy = measure_quantum_volume_batched(jax.random.PRNGKey(2), max_depth=3,
                                           num_circuits=60, num_shots=300,
                                           dtype=jnp.float64, kraus=two_q)
    assert extract_quantum_volume_from_results(noisy) == 2 ** 1
    assert abs(noisy[2][0] - 0.5) < 0.1
    ideal = measure_quantum_volume_batched(jax.random.PRNGKey(2), max_depth=3,
                                           num_circuits=60, num_shots=300,
                                           dtype=jnp.float64)
    assert extract_quantum_volume_from_results(ideal) == 2 ** 3


def test_topology_restricted_generator_matches_ideal_distribution():
    """SWAP routing onto a line topology preserves the model circuit's output
    distribution (checked against the unrouted circuit's statevector)."""
    from forest_benchmarking_tpu.quantum_volume import (
        topology_restricted_program_generator)
    from forest_benchmarking_tpu.sim.statevector import run_statevector

    depth = 4
    rng = np.random.RandomState(11)
    permutations, gates = generate_abstract_qv_circuit(depth, rng)
    qubits = list(range(depth))

    line = topology_restricted_program_generator(
        [(0, 1), (1, 2), (2, 3)])
    routed = line(None, qubits, permutations, gates)
    # every 2q gate respects line adjacency
    for g in routed.gates:
        if len(g.qubits) == 2:
            assert abs(g.qubits[0] - g.qubits[1]) == 1
    # routing preserved the computation
    unrouted = abstract_circuit_to_circuit(qubits, permutations, gates)
    p_routed = np.abs(np.asarray(run_statevector(routed, qubits))) ** 2
    p_ideal = np.abs(np.asarray(run_statevector(unrouted, qubits))) ** 2
    np.testing.assert_allclose(p_routed, p_ideal, atol=1e-10)
    # all-to-all topology inserts no SWAPs
    full = topology_restricted_program_generator(
        [(i, j) for i in qubits for j in qubits if i < j])
    direct = full(None, qubits, permutations, gates)
    assert all(g.name != "SWAP" for g in direct.gates)


def test_qv_on_line_topology_with_noisy_swaps_fails_earlier():
    """Noisy SWAPs on a line topology degrade QV relative to all-to-all with
    the same gate noise (connectivity study enabled by the router)."""
    from forest_benchmarking_tpu.quantum_volume import (
        topology_restricted_program_generator)
    from forest_benchmarking_tpu.sim.noise import depolarizing_kraus_map

    ks = depolarizing_kraus_map(0.5)
    two_q = [np.kron(a, b) for a in ks for b in ks]

    class SwapNoisyQVM(QVM):
        def run(self, circuit, qubits, num_shots):
            noisy = circuit.copy()
            noisy.define_noisy_gate("SWAP", None, two_q)
            return super().run(noisy, qubits, num_shots)

    depth = 3
    rng = np.random.RandomState(12)
    gen = topology_restricted_program_generator([(0, 1), (1, 2)])
    qvm = SwapNoisyQVM(seed=3)
    with pytest.warns(UserWarning):
        line_res = measure_quantum_volume(qvm, qubits=[0, 1, 2],
                                          program_generator=gen,
                                          num_circuits=15, num_shots=60,
                                          depths=np.array([depth]), rng=rng)
    rng = np.random.RandomState(12)
    with pytest.warns(UserWarning):
        full_res = measure_quantum_volume(SwapNoisyQVM(seed=3),
                                          qubits=[0, 1, 2],
                                          num_circuits=15, num_shots=60,
                                          depths=np.array([depth]), rng=rng)
    # all-to-all path never emits SWAP, so its heavy-output prob is higher
    assert full_res[depth][0] > line_res[depth][0]


def test_lifted_density_form_matches_tensor_form():
    """The lifted-matrix noisy-QV evolution (used at depth >= 6) matches the
    tensor-contraction form and the QVM density path."""
    from forest_benchmarking_tpu.quantum_volume import (
        _simulate_qv_circuit_density, _simulate_qv_circuit_density_lifted,
        _lift_2q)
    from forest_benchmarking_tpu.sim.noise import depolarizing_kraus_map

    depth = 3
    rng = np.random.RandomState(21)
    permutations, gates = generate_abstract_qv_circuit(depth, rng)
    ks = depolarizing_kraus_map(0.15)
    two_q = jnp.asarray(np.stack([np.kron(a, b) for a in ks for b in ks]),
                        jnp.complex128)
    perms = jnp.asarray(np.stack(permutations))
    g = jnp.asarray(gates, jnp.complex128)
    tensor_form = np.asarray(_simulate_qv_circuit_density(perms, g, two_q,
                                                          depth))
    lifts = tuple(jax.vmap(lambda m, jj=j: _lift_2q(m, jj, depth))(two_q)
                  for j in range(depth // 2))
    lifted_form = np.asarray(_simulate_qv_circuit_density_lifted(perms, g,
                                                                 lifts, depth))
    np.testing.assert_allclose(lifted_form, tensor_form, atol=1e-12)
