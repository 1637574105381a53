"""RB closed-loop tests: inject Pauli noise, recover the expected decay."""
import numpy as np
import pytest

from forest_benchmarking_tpu.circuits import Circuit, Gate, CZ
from forest_benchmarking_tpu.sim import QVM
from forest_benchmarking_tpu.sim.noise import pauli_kraus_map
from forest_benchmarking_tpu.randomized_benchmarking import (
    generate_rb_experiment_sequences, group_sequences_into_parallel_experiments,
    generate_rb_experiments, generate_unitarity_experiments, acquire_rb_data,
    get_stats_by_qubit_group, fit_rb_results, fit_unitarity_results,
    z_obs_stats_to_survival_statistics, covariances_of_all_iz_obs,
    estimate_purity, estimate_purity_err, unitarity_to_rb_decay,
    coherence_angle, gamma, interleaved_gate_fidelity_bounds,
    gate_error_to_irb_decay, irb_decay_to_gate_error,
    average_gate_error_to_rb_decay, rb_decay_to_gate_error,
    get_rb_gateset, do_rb)


def add_noise_to_sequences(sequences, qubits, kraus_ops):
    """Append a no-op noise gate per Clifford with the Kraus channel attached."""
    eye = np.eye(2 ** len(qubits), dtype=complex)
    noise_gate = Gate("seqnoise", (), tuple(qubits),
                      matrix=tuple(map(tuple, eye)))
    for seq in sequences:
        for circ in seq:
            circ.gates.append(noise_gate)
            circ.define_noisy_gate("seqnoise", qubits, kraus_ops)


def test_1q_general_pauli_noise():
    expected_decay = .85
    probs = [expected_decay + .15 / 4, .06, .04, .0125]
    kraus_ops = pauli_kraus_map(probs)

    num_sequences_per_depth = 10
    num_shots = 60
    depths = [d for d in [2, 8, 10, 16, 25] for _ in range(num_sequences_per_depth)]
    qubits = (0,)

    sequences = generate_rb_experiment_sequences(qubits, depths, random_seed=1)
    add_noise_to_sequences(sequences, qubits, kraus_ops)
    expts = group_sequences_into_parallel_experiments([sequences], [qubits])

    qvm = QVM(seed=1)
    results = acquire_rb_data(qvm, expts, num_shots)
    stats = get_stats_by_qubit_group([qubits], results)[qubits]
    fit = fit_rb_results(depths, stats["expectation"], stats["std_err"])

    observed = fit.params["decay"].value
    err = fit.params["decay"].stderr
    np.testing.assert_allclose(expected_decay, observed, atol=2.5 * max(err, 1e-3))


@pytest.mark.slow
def test_2q_general_pauli_noise():
    # NOTE: the reference test (test_randomized_benchmarking.py:57-59) uses the
    # 1Q relation p_I = f + (1-f)/4 here; for 2 qubits the Pauli-twirled decay
    # of a Pauli channel is f = (16 p_I - 1)/15. With p_I = 0.85 that is 0.84.
    probs = [.85, .06] + [0] * 12 + [.04, .05]
    expected_decay = (16 * probs[0] - 1) / 15
    kraus_ops = pauli_kraus_map(probs)

    num_sequences_per_depth = 5
    num_shots = 50
    depths = [d for d in [2, 10, 12, 25] for _ in range(num_sequences_per_depth)]
    qubits = (0, 1)

    sequences = generate_rb_experiment_sequences(qubits, depths, random_seed=2)
    add_noise_to_sequences(sequences, qubits, kraus_ops)
    expts = group_sequences_into_parallel_experiments([sequences], [qubits])

    qvm = QVM(seed=2)
    results = acquire_rb_data(qvm, expts, num_shots)
    stats = get_stats_by_qubit_group([qubits], results)[qubits]
    fit = fit_rb_results(depths, stats["expectation"], stats["std_err"], num_shots)

    observed = fit.params["decay"].value
    err = fit.params["decay"].stderr
    np.testing.assert_allclose(expected_decay, observed, atol=3 * max(err, 5e-3))


def test_noiseless_rb_survival_is_one():
    qubits = (0,)
    depths = [2, 5, 9]
    expts = generate_rb_experiments([qubits], depths, random_seed=3)
    qvm = QVM(seed=3)
    results = acquire_rb_data(qvm, expts, num_shots=100)
    for res_group in results:
        for res in res_group:
            assert np.isclose(res.expectation, 1.0), res


def test_unitarity_of_depolarizing_noise():
    # unitarity of a depolarizing channel with decay f is f^2
    expected_decay = 0.9
    probs = [expected_decay + 0.1 / 4] + [0.1 / 4] * 3
    kraus_ops = pauli_kraus_map(probs)
    qubits = (0,)
    num_sequences_per_depth = 8
    depths = [d for d in [1, 4, 7, 10] for _ in range(num_sequences_per_depth)]

    sequences = [
        generate_rb_experiment_sequences(qubits, [d], random_seed=10 + i,
                                         use_self_inv_seqs=False)[0]
        for i, d in enumerate(depths)]
    add_noise_to_sequences(sequences, qubits, kraus_ops)
    expts = group_sequences_into_parallel_experiments(
        [[seq] for seq in sequences] if False else [sequences], [qubits],
        is_unitarity_expt=True)

    qvm = QVM(seed=4)
    results = acquire_rb_data(qvm, expts, num_shots=300)
    stats = get_stats_by_qubit_group([qubits], results)[qubits]
    fit = fit_unitarity_results(depths, stats["expectation"], stats["std_err"])
    observed_unitarity = fit.params["decay"].value
    # depolarizing: unitarity = decay^2
    np.testing.assert_allclose(observed_unitarity, expected_decay ** 2,
                               atol=0.02)
    # and the inferred rb decay bound should be ~ the depolarizing decay
    np.testing.assert_allclose(unitarity_to_rb_decay(observed_unitarity, 2),
                               expected_decay, atol=0.02)


def test_survival_statistics():
    # single qubit, perfect zeros: expectation of Z = 1
    p, v = z_obs_stats_to_survival_statistics([1.0], [0.0])
    assert p == 1.0 and v == 0.0
    p, v = z_obs_stats_to_survival_statistics([0.0], [0.1])
    assert p == 0.5
    # 2 qubits requires num_shots for covariance
    with pytest.raises(ValueError):
        z_obs_stats_to_survival_statistics([0.5, 0.5, 0.5], [0.1] * 3)
    p, v = z_obs_stats_to_survival_statistics([1, 1, 1], [0] * 3, num_shots=100)
    assert np.isclose(p, 1.0)


def test_covariances_of_all_iz_obs():
    # perfect zeros state: all expectations 1; covariance contribution:
    # 2*3 - (sum_{i!=j} 1) = 6 - 6 = 0
    assert np.isclose(covariances_of_all_iz_obs([1, 1, 1], 100), 0.0)


def test_purity_estimates():
    # pure state: sum of squared expectations over full pauli basis = dim
    dim = 2
    op_expect = np.array([1.0, 0, 0, 1.0])  # X=1 (plus state), I=1
    assert np.isclose(estimate_purity(dim, op_expect), 1.0)
    mixed = np.array([0, 0, 0, 1.0])
    assert np.isclose(estimate_purity(dim, mixed), 0.0)  # renormalized
    err = estimate_purity_err(dim, op_expect, np.array([0.01] * 4))
    assert err > 0


def test_irb_algebra_round_trips():
    dim = 2
    rb_decay = 0.95
    gate_error = 0.02
    irb = gate_error_to_irb_decay(gate_error, rb_decay, dim)
    assert np.isclose(irb_decay_to_gate_error(irb, rb_decay, dim), gate_error)
    decay = average_gate_error_to_rb_decay(gate_error, dim)
    assert np.isclose(rb_decay_to_gate_error(decay, dim), gate_error)
    # bounds contain the point estimate
    lo, hi = interleaved_gate_fidelity_bounds(irb, rb_decay, dim)
    assert lo <= 1 - gate_error <= hi
    # with unitarity, bounds are tighter (stochastic noise: u = decay^2)
    lo_u, hi_u = interleaved_gate_fidelity_bounds(irb, rb_decay, dim,
                                                  unitarity=rb_decay ** 2)
    assert hi_u - lo_u <= hi - lo
    assert np.isclose(gamma(irb, rb_decay ** 2), irb / rb_decay)
    assert coherence_angle(rb_decay, 1.0) >= 0


def test_get_rb_gateset():
    gs1 = get_rb_gateset([0])
    assert len(gs1) == 8
    gs2 = get_rb_gateset([0, 1])
    assert len(gs2) == 17
    with pytest.raises(ValueError):
        get_rb_gateset([0, 1, 2])


def test_do_rb_end_to_end():
    qvm = QVM(seed=5)
    depths = [d for d in [2, 6, 10] for _ in range(4)]
    decays, expts, results = do_rb(qvm, [(0,)], depths, num_shots=100,
                                   random_seed=7)
    # noiseless simulator: survivals are ~1 so amplitude ~ 0 and decay is only
    # weakly identified (it stays near the guess); just require a high decay
    assert decays[(0,)] >= 0.9
    for res_group in results:
        for res in res_group:
            assert res.expectation > 0.9


def test_batched_rb_simulator_noiseless_and_noisy():
    """PTM-composition RB simulator: exact survivals + recovered decay."""
    import jax
    import jax.numpy as jnp
    from forest_benchmarking_tpu.randomized_benchmarking import (
        sequences_to_ptm_stack, simulate_rb_survival_batched, unitary_to_ptm_np,
        circuit_unitary_np, generate_rb_experiment_sequences, fit_rb_results)

    qubits = (0,)
    depths = [d for d in [2, 6, 10, 16] for _ in range(6)]
    sequences = generate_rb_experiment_sequences(qubits, depths, random_seed=11)
    ptms, lengths = sequences_to_ptm_stack(sequences, qubits)

    # noiseless: every sequence composes to the identity -> survival 1
    surv = np.asarray(simulate_rb_survival_batched(ptms, lengths=lengths))
    assert np.allclose(surv, 1.0, atol=1e-10)

    # exact (shot-free) survivals decay exactly as (1-p)^depth (+ baseline)
    p = 0.1
    noise_ptm = np.diag([1.0, 1 - p, 1 - p, 1 - p])
    surv_exact = np.asarray(simulate_rb_survival_batched(ptms, noise_ptm, lengths=lengths))
    for depth, s in zip(depths, surv_exact):
        expected = 0.5 + 0.5 * (1 - p) ** depth
        assert abs(s - expected) < 1e-10, (depth, s, expected)

    # depolarizing noise per Clifford with sampling: decay ~ 1 - p
    surv = np.asarray(simulate_rb_survival_batched(
        ptms, noise_ptm, key=jax.random.PRNGKey(0), num_shots=5000,
        lengths=lengths))
    fit = fit_rb_results(depths, [[2 * s - 1] for s in surv],
                         [[0.01] for _ in surv])
    assert abs(fit.params["decay"].value - (1 - p)) < 0.02


def test_circuit_unitary_np_matches_sim():
    from forest_benchmarking_tpu.randomized_benchmarking import circuit_unitary_np
    from forest_benchmarking_tpu.sim.statevector import run_statevector
    from forest_benchmarking_tpu.circuits import Circuit, H, CNOT, RZ, X
    c = Circuit([H(0), CNOT(0, 1), RZ(0.3, 1)])
    u = circuit_unitary_np(c, [0, 1])
    psi = np.asarray(run_statevector(c, [0, 1]))
    assert np.allclose(u[:, 0], psi, atol=1e-12)
    assert np.allclose(u @ u.conj().T, np.eye(4), atol=1e-12)


def test_simultaneous_rb_two_groups():
    """Simultaneous RB over two disjoint qubit groups: independent decays."""
    qubit_groups = [(0,), (1,)]
    depths = [d for d in [2, 6, 10] for _ in range(6)]
    expts = generate_rb_experiments(qubit_groups, depths, random_seed=21)
    # attach depolarizing noise only to qubit 1's Cliffords via readout-free
    # channel on every sequence element acting on qubit 1: use noisy readout
    # instead for simplicity — noiseless gates, but qubit 1 has readout error
    for expt in expts:
        expt.program.define_noisy_readout(1, p00=0.95, p11=0.95)
    qvm = QVM(seed=21)
    results = acquire_rb_data(qvm, expts, num_shots=300)
    stats = get_stats_by_qubit_group(qubit_groups, results)
    fit0 = fit_rb_results(depths, stats[(0,)]["expectation"],
                          stats[(0,)]["std_err"])
    fit1 = fit_rb_results(depths, stats[(1,)]["expectation"],
                          stats[(1,)]["std_err"])
    # qubit 0 noiseless: survivals ~1 (weakly identified decay stays high);
    # qubit 1's readout error depresses the baseline+amplitude, not the decay
    surv0 = np.mean([np.mean(e) for e in stats[(0,)]["expectation"]])
    surv1 = np.mean([np.mean(e) for e in stats[(1,)]["expectation"]])
    assert surv0 > 0.98
    assert surv1 < 0.95
    assert fit0.success and fit1.success


def test_survival_variance_closes_to_bernoulli_any_group_size():
    """Algebraic identity: the all-zeros survival estimator built from the
    I/Z-observable means IS the empirical p(0..0), so its variance from the
    covariance formula must equal p0(1-p0)/N exactly — for ANY group size.
    The 3-qubit case pins the dim-2 product multiplicity (the reference's
    2-copies claim holds only for <= 2 qubits)."""
    rng = np.random.RandomState(5)
    num_shots = 1000
    for n in (1, 2, 3):
        dim = 2 ** n
        p = rng.dirichlet(np.ones(dim))
        # Z-string expectations E_k and their per-observable std errs
        outcomes = np.arange(dim)
        expectations, variances = [], []
        for k in range(1, dim):
            signs = (-1.0) ** np.array([bin(k & o).count("1") for o in outcomes])
            e = float((p * signs).sum())
            expectations.append(e)
            variances.append((1 - e ** 2) / num_shots)
        surv, var = z_obs_stats_to_survival_statistics(
            expectations, np.sqrt(variances), num_shots=num_shots)
        assert np.isclose(surv, p[0], atol=1e-12)
        assert np.isclose(var, p[0] * (1 - p[0]) / num_shots, atol=1e-12), n


def test_get_stats_by_qubit_group_accepts_unsorted_groups():
    """Qubit order in a group is meaningful (first = MSB); an unsorted group
    tuple used to KeyError against the sorted-keyed results bucketing."""
    from forest_benchmarking_tpu.observable_estimation import (
        ExperimentResult, ExperimentSetting, zeros_state)
    from forest_benchmarking_tpu.paulis import PauliTerm
    res = ExperimentResult(
        setting=ExperimentSetting(zeros_state([0, 1]),
                                  PauliTerm([(0, "Z"), (1, "Z")])),
        expectation=0.25, total_counts=100, std_err=0.05)
    stats = get_stats_by_qubit_group([(1, 0)], [[res]])
    assert stats[(1, 0)]["expectation"] == [[0.25]]
    assert stats[(1, 0)]["std_err"] == [[0.05]]
