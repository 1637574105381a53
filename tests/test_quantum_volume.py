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


def _total(*args, **kwargs):
    """Host-side sum of the per-circuit heavy counts array."""
    return np.asarray(sample_heavy_outputs_batched(*args, **kwargs)).sum()

def test_sample_heavy_outputs_batched_runs():
    key = jax.random.PRNGKey(0)
    num_heavy = int(_total(key, depth=3, num_circuits=50,
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


def test_trajectory_unraveling_matches_density_kernel():
    """The Kraus-trajectory statevector kernel's trajectory-averaged output
    distribution converges to the exact density-matrix kernel's distribution
    (same circuit, same channel placement) within Monte-Carlo error."""
    from forest_benchmarking_tpu.quantum_volume import (
        _sample_perms, _simulate_qv_circuit_density, _simulate_qv_circuit_traj)
    from forest_benchmarking_tpu.ops.random_operators import haar_rand_unitary
    from forest_benchmarking_tpu.sim.noise import depolarizing_kraus_map

    depth = 4
    ks = depolarizing_kraus_map(0.08)
    kraus = jnp.asarray(np.stack([np.kron(a, b) for a in ks for b in ks]),
                        jnp.complex64)
    m_ops = jnp.einsum("kba,kbc->kac", jnp.conj(kraus), kraus)
    perms = _sample_perms(jax.random.PRNGKey(1), 1, depth)[0]
    gates = haar_rand_unitary(jax.random.PRNGKey(2), 4,
                              batch=(depth, depth // 2),
                              dtype=jnp.float32).astype(jnp.complex64)
    p_dens = np.asarray(_simulate_qv_circuit_density(perms, gates, kraus,
                                                     depth))
    n_traj = 20000
    u = jax.random.uniform(jax.random.PRNGKey(3), (depth, depth // 2, n_traj),
                           dtype=jnp.float32)
    per_traj = np.asarray(_simulate_qv_circuit_traj(perms, gates, kraus,
                                                    m_ops, u, depth))
    assert per_traj.shape == (2 ** depth, n_traj)
    # each column is a normalized distribution
    np.testing.assert_allclose(per_traj.sum(axis=0), 1.0, atol=1e-5)
    # the trajectory mean estimates p_dens with std ~ sqrt(p/T) < 2.5e-3
    p_traj = per_traj.mean(axis=1)
    assert np.max(np.abs(p_traj - p_dens)) < 4 / np.sqrt(n_traj)


def test_pallas_traj_kernel_matches_xla_kernel_interpret():
    """The fused Pallas trajectory kernel (interpret mode) reproduces the XLA
    trajectory kernel trajectory-for-trajectory: same uniforms -> same branch
    choices -> same per-trajectory distributions (up to f32 roundoff)."""
    from forest_benchmarking_tpu.quantum_volume import (
        _sample_perms, _simulate_qv_circuit_traj)
    from forest_benchmarking_tpu.ops.random_operators import haar_rand_unitary
    from forest_benchmarking_tpu.ops.pallas_traj import traj_probs_pallas
    from forest_benchmarking_tpu.sim.noise import depolarizing_kraus_map

    depth, circuits, n_traj = 7, 2, 128
    ks = depolarizing_kraus_map(0.06)
    kraus = jnp.asarray(np.stack([np.kron(a, b) for a in ks for b in ks]),
                        jnp.complex64)
    m_ops = jnp.einsum("kba,kbc->kac", jnp.conj(kraus), kraus)
    perms = _sample_perms(jax.random.PRNGKey(1), circuits, depth)
    gates = haar_rand_unitary(jax.random.PRNGKey(2), 4,
                              batch=(circuits, depth, depth // 2),
                              dtype=jnp.float32).astype(jnp.complex64)
    u = jax.random.uniform(jax.random.PRNGKey(3),
                           (circuits, depth, depth // 2, n_traj),
                           dtype=jnp.float32)
    xla = np.asarray(jax.vmap(
        lambda p, g, uu: _simulate_qv_circuit_traj(p, g, kraus, m_ops, uu,
                                                   depth))(perms, gates, u))
    gates_ri = jnp.stack([jnp.real(gates), jnp.imag(gates)]).astype(jnp.float32)
    kraus_ri = jnp.stack([jnp.real(kraus), jnp.imag(kraus)]).astype(jnp.float32)
    pal = np.asarray(traj_probs_pallas(perms, gates_ri, kraus_ri, u, depth,
                                       interpret=True))
    # identical branch decisions except measure-zero boundary flips
    col_diff = np.abs(xla - pal).max(axis=1)
    assert (col_diff < 1e-4).mean() > 0.97
    np.testing.assert_allclose(pal.sum(axis=1), 1.0, atol=1e-5)


def test_trajectory_heavy_counts_match_density_path():
    """sample_heavy_outputs_batched agrees between the exact-density and
    trajectory noisy kernels within binomial sampling error, for both
    1-shot-per-trajectory and shots-split-across-trajectories configs."""
    from forest_benchmarking_tpu.quantum_volume import (
        sample_heavy_outputs_batched)
    from forest_benchmarking_tpu.sim.noise import depolarizing_kraus_map

    ks = depolarizing_kraus_map(0.15)
    two_q = np.stack([np.kron(a, b) for a in ks for b in ks])
    depth, circuits, shots = 4, 40, 200
    total = circuits * shots
    key = jax.random.PRNGKey(9)
    n_dens = int(_total(
        key, depth=depth, num_circuits=circuits, num_shots=shots,
        kraus=two_q, noisy_method="density"))
    n_traj = int(_total(
        key, depth=depth, num_circuits=circuits, num_shots=shots,
        kraus=two_q, noisy_method="trajectory"))
    n_traj_split = int(_total(
        key, depth=depth, num_circuits=circuits, num_shots=shots,
        kraus=two_q, noisy_method="trajectory", num_trajectories=50))
    # p ~ 0.7-0.8; 4-sigma binomial window on the difference
    sigma = np.sqrt(2 * 0.25 * total)
    assert abs(n_dens - n_traj) < 4 * sigma
    assert abs(n_dens - n_traj_split) < 4 * sigma
    with pytest.raises(ValueError, match="must divide"):
        sample_heavy_outputs_batched(
            key, depth=depth, num_circuits=circuits, num_shots=shots,
            kraus=two_q, noisy_method="trajectory", num_trajectories=33)


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


def test_topology_router_through_spare_qubit():
    """Register qubits connected only via an out-of-register node route through
    it (regression: this raised KeyError on the spare qubit)."""
    from forest_benchmarking_tpu.quantum_volume import (
        topology_restricted_program_generator)
    from forest_benchmarking_tpu.sim.statevector import run_statevector

    depth = 3
    rng = np.random.RandomState(5)
    permutations, gates = generate_abstract_qv_circuit(depth, rng)
    # qubits 0 and 1 talk only through spare qubit 9
    gen = topology_restricted_program_generator([(0, 9), (9, 1), (1, 2)])
    routed = gen(None, [0, 1, 2], permutations, gates)
    for g in routed.gates:
        if len(g.qubits) == 2:
            assert tuple(sorted(g.qubits)) in {(0, 9), (1, 9), (1, 2)}
    # undoing the swaps returns the spare to |0>, so the distribution over
    # [0,1,2] (with 9 as the least significant, always-0 bit) matches ideal
    unrouted = abstract_circuit_to_circuit([0, 1, 2], permutations, gates)
    p4 = np.abs(np.asarray(run_statevector(routed, [0, 1, 2, 9]))) ** 2
    p_ideal = np.abs(np.asarray(run_statevector(unrouted, [0, 1, 2]))) ** 2
    np.testing.assert_allclose(p4[0::2], p_ideal, atol=1e-10)
    np.testing.assert_allclose(p4[1::2], 0.0, atol=1e-12)


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


def test_ideal_probs_pallas_matches_xla_sim_interpret():
    """The noiseless fused kernel (interpret mode) reproduces the XLA ideal
    statevector simulator's output distribution (it replaces that simulator
    for the heavy-set computation in the noisy trajectory path)."""
    from forest_benchmarking_tpu.quantum_volume import (_sample_perms,
                                                        _simulate_qv_circuit)
    from forest_benchmarking_tpu.ops.random_operators import haar_rand_unitary
    from forest_benchmarking_tpu.ops.pallas_traj import ideal_probs_pallas

    depth, circuits = 7, 3
    perms = _sample_perms(jax.random.PRNGKey(4), circuits, depth)
    gates = haar_rand_unitary(jax.random.PRNGKey(5), 4,
                              batch=(circuits, depth, depth // 2),
                              dtype=jnp.float32).astype(jnp.complex64)
    xla = np.asarray(jax.vmap(
        lambda p, g: _simulate_qv_circuit(p, g, depth))(perms, gates))
    gates_ri = jnp.stack([jnp.real(gates), jnp.imag(gates)]).astype(jnp.float32)
    pal = np.asarray(ideal_probs_pallas(perms, gates_ri, depth,
                                        interpret=True))
    np.testing.assert_allclose(pal, xla, atol=2e-6)
    np.testing.assert_allclose(pal.sum(axis=1), 1.0, atol=1e-5)
    # the 3-term bf16 split permute (the on-chip default, measured bit-exact
    # on the TPU as well) reconstructs the 6-pass HIGHEST form exactly
    pal6 = np.asarray(ideal_probs_pallas(perms, gates_ri, depth,
                                         interpret=True, perm_split3=False))
    np.testing.assert_array_equal(pal, pal6)


def test_pallas_qv_routing():
    """The ideal path (kraus=None) rides the fused noiseless kernel on
    accelerator backends at fused-capable depths (round-5 wiring); the
    trajectory kernel keeps its round-4 conditions; CPU and shallow depths
    stay on XLA."""
    from forest_benchmarking_tpu.quantum_volume import _pallas_qv_routing

    # ideal path, fused-capable depth, accelerator -> ideal kernel only
    assert _pallas_qv_routing(8, False, "auto", "tpu") == (True, False)
    assert _pallas_qv_routing(7, False, "auto", "axon") == (True, False)
    # ideal path on cpu or below depth 7 -> XLA
    assert _pallas_qv_routing(8, False, "auto", "cpu") == (False, False)
    assert _pallas_qv_routing(6, False, "auto", "tpu") == (False, False)
    # noisy trajectory path -> both (heavy sets via the ideal kernel)
    assert _pallas_qv_routing(8, True, "auto", "tpu") == (True, True)
    assert _pallas_qv_routing(7, True, "trajectory", "tpu") == (True, True)
    # noisy density path computes exact probabilities itself -> neither
    assert _pallas_qv_routing(8, True, "density", "tpu") == (False, False)
    assert _pallas_qv_routing(6, True, "auto", "tpu") == (False, False)
