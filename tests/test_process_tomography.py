"""Process tomography: linear inversion + PGDB vs truth and numpy oracle."""
import numpy as np
import jax.numpy as jnp
import pytest

from forest_benchmarking_tpu.circuits import Circuit, H, CNOT, RX, RY, RZ, X
from forest_benchmarking_tpu.sim import QVM
from forest_benchmarking_tpu import distance_measures as dm
from forest_benchmarking_tpu.ops import (
    kraus2choi, choi2pauli_liouville, choi_is_trace_preserving,
    choi_is_completely_positive)
from forest_benchmarking_tpu.tomography import (
    generate_process_tomography_experiment, linear_inv_process_estimate,
    pgdb_process_estimate, pgdb_process_estimate_batched,
    _extract_from_results, do_tomography)
from forest_benchmarking_tpu.observable_estimation import (
    estimate_observables, group_settings)
from oracles import np_pgdb, wfn_estimate_observables


def circuit_unitary(circuit, qubits):
    from forest_benchmarking_tpu.sim.statevector import run_statevector
    from forest_benchmarking_tpu.circuits import Circuit as C, X as XG
    n = len(qubits)
    cols = []
    for i in range(2 ** n):
        prep = C([XG(qubits[j]) for j in range(n) if (i >> (n - 1 - j)) & 1])
        cols.append(np.asarray(run_statevector(prep + circuit, qubits)))
    return np.stack(cols, axis=1)


def true_choi(circuit, qubits):
    return np.asarray(kraus2choi(jnp.asarray(circuit_unitary(circuit, qubits))[None]))


@pytest.mark.parametrize("in_basis", ["pauli", "sic"])
def test_linear_inv_process_exact(in_basis):
    circuit = Circuit([RY(0.7, 0)])
    qubits = [0]
    qvm = QVM(seed=1)
    expt = generate_process_tomography_experiment(circuit, qubits, in_basis)
    results = wfn_estimate_observables(qvm, expt, qubits)
    choi_est = np.asarray(linear_inv_process_estimate(results, qubits))
    assert np.max(np.abs(choi_est - true_choi(circuit, qubits))) < 1e-8


def test_linear_inv_process_2q_exact():
    circuit = Circuit([CNOT(0, 1)])
    qubits = [0, 1]
    qvm = QVM(seed=2)
    expt = generate_process_tomography_experiment(circuit, qubits, "pauli")
    results = wfn_estimate_observables(qvm, expt, qubits)
    choi_est = np.asarray(linear_inv_process_estimate(results, qubits))
    assert np.max(np.abs(choi_est - true_choi(circuit, qubits))) < 1e-8


def test_pgdb_exact_expectations_1q():
    circuit = Circuit([RX(np.pi / 2, 0)])
    qubits = [0]
    qvm = QVM(seed=3)
    expt = generate_process_tomography_experiment(circuit, qubits, "pauli")
    results = wfn_estimate_observables(qvm, expt, qubits)
    choi_est = pgdb_process_estimate(results, qubits)
    truth = true_choi(circuit, qubits)
    pf = float(dm.process_fidelity(choi2pauli_liouville(jnp.asarray(truth)),
                                   choi2pauli_liouville(choi_est)))
    assert pf > 0.999
    assert choi_is_trace_preserving(np.asarray(choi_est), atol=1e-4)


def test_pgdb_matches_numpy_oracle_1q():
    circuit = Circuit([RY(0.9, 0)])
    qubits = [0]
    qvm = QVM(seed=4)
    expt = group_settings(generate_process_tomography_experiment(circuit, qubits,
                                                                 "pauli"))
    results = list(estimate_observables(qvm, expt, num_shots=1500,
                                        use_basic_compile=False))
    a, n = _extract_from_results(results, qubits)
    oracle = np_pgdb(a, n, dim=2)
    ours = np.asarray(pgdb_process_estimate(results, qubits))
    assert np.max(np.abs(ours - oracle)) < 1e-6


@pytest.mark.slow
def test_pgdb_matches_numpy_oracle_2q():
    circuit = Circuit([H(0), CNOT(0, 1)])
    qubits = [0, 1]
    qvm = QVM(seed=5)
    expt = group_settings(generate_process_tomography_experiment(circuit, qubits,
                                                                 "pauli"))
    results = list(estimate_observables(qvm, expt, num_shots=600,
                                        use_basic_compile=False))
    a, n = _extract_from_results(results, qubits)
    oracle = np_pgdb(a, n, dim=4)
    ours = np.asarray(pgdb_process_estimate(results, qubits))
    assert np.max(np.abs(ours - oracle)) < 1e-6


def test_pgdb_sampled_2q_close_to_truth():
    circuit = Circuit([CNOT(0, 1)])
    qubits = [0, 1]
    qvm = QVM(seed=6)
    expt = group_settings(generate_process_tomography_experiment(circuit, qubits,
                                                                 "pauli"))
    results = list(estimate_observables(qvm, expt, num_shots=2000,
                                        use_basic_compile=False))
    choi_est = pgdb_process_estimate(results, qubits)
    truth = true_choi(circuit, qubits)
    pf = float(dm.process_fidelity(choi2pauli_liouville(jnp.asarray(truth)),
                                   choi2pauli_liouville(choi_est)))
    assert pf > 0.97
    assert choi_is_completely_positive(np.asarray(choi_est), atol=1e-2)


def test_pgdb_trace_non_increasing_option():
    circuit = Circuit([RZ(0.4, 0)])
    qubits = [0]
    qvm = QVM(seed=7)
    expt = generate_process_tomography_experiment(circuit, qubits, "pauli")
    results = wfn_estimate_observables(qvm, expt, qubits)
    choi_est = np.asarray(pgdb_process_estimate(results, qubits,
                                                trace_preserving=False))
    # for a unitary process the TNI estimate should still be close to TP
    truth = true_choi(circuit, qubits)
    pf = float(dm.process_fidelity(choi2pauli_liouville(jnp.asarray(truth)),
                                   choi2pauli_liouville(jnp.asarray(choi_est))))
    assert pf > 0.99


def test_pgdb_batched_matches_single():
    qubits = [0]
    qvm = QVM(seed=8)
    all_results = []
    for theta in (0.3, 1.0, 2.2):
        circuit = Circuit([RY(theta, 0)])
        expt = generate_process_tomography_experiment(circuit, qubits, "pauli")
        all_results.append(list(estimate_observables(qvm, expt, num_shots=1000,
                                                     use_basic_compile=False)))
    a, _ = _extract_from_results(all_results[0], qubits)
    ns = np.stack([_extract_from_results(r, qubits)[1] for r in all_results])
    batched = np.asarray(pgdb_process_estimate_batched(jnp.asarray(a),
                                                       jnp.asarray(ns), dim=2))
    singles = np.stack([np.asarray(pgdb_process_estimate(r, qubits))
                        for r in all_results])
    assert np.max(np.abs(batched - singles)) < 1e-10


def test_do_tomography_process():
    qvm = QVM(seed=9)
    circuit = Circuit([X(0)])
    choi, expt, results = do_tomography(qvm, circuit, [0], "process",
                                        num_shots=1500)
    truth = true_choi(circuit, [0])
    pf = float(dm.process_fidelity(choi2pauli_liouville(jnp.asarray(truth)),
                                   choi2pauli_liouville(jnp.asarray(choi))))
    assert pf > 0.95


def test_apg_matches_converged_pgdb():
    """APG (FISTA + function restart) reaches the same MLE optimum as PGDB."""
    import jax
    from forest_benchmarking_tpu.benchmarks import (process_tomo_A_matrix,
                                                    synth_process_datasets)
    from forest_benchmarking_tpu.tomography import pgdb_process_estimate_batched
    a = jnp.asarray(process_tomo_A_matrix(2))
    n, chois = synth_process_datasets(jax.random.PRNGKey(3), a, 4, 4, 1500,
                                      dtype=jnp.float64)
    converged = pgdb_process_estimate_batched(a, n, dim=4, stop_tol=1e-12,
                                              maxiter=3000, dyk_iters=200)
    apg = pgdb_process_estimate_batched(a, n, dim=4, stop_tol=0.0, maxiter=40,
                                        dyk_iters=60, method="apg")
    assert float(jnp.abs(apg - converged).max()) < 2e-4


def test_apg_inexact_prox_matches_full_and_is_physical():
    """loop_dyk_iters caps the in-loop Dykstra; the final converged projection
    keeps the estimate CPTP and within shot noise of the exact-prox solve."""
    import jax
    from forest_benchmarking_tpu.benchmarks import (process_tomo_A_matrix,
                                                    synth_process_datasets)
    from forest_benchmarking_tpu.tomography import pgdb_process_estimate_batched
    from forest_benchmarking_tpu.ops.calculational import partial_trace
    a = jnp.asarray(process_tomo_A_matrix(2))
    n, chois = synth_process_datasets(jax.random.PRNGKey(5), a, 4, 4, 1500,
                                      dtype=jnp.float64)
    full = pgdb_process_estimate_batched(a, n, dim=4, stop_tol=1e-8,
                                         maxiter=200, dyk_iters=1000,
                                         method="apg")
    fast = pgdb_process_estimate_batched(a, n, dim=4, stop_tol=1e-8,
                                         maxiter=200, dyk_iters=1000,
                                         method="apg", loop_dyk_iters=2)
    # well within shot noise (~0.02/element at 1500 shots)
    assert float(jnp.abs(fast - full).max()) < 1e-3
    for i in range(4):
        est = np.asarray(fast[i])
        pt = np.asarray(partial_trace(fast[i], keep=[0], dims=[4, 4]))
        assert np.abs(pt - np.eye(4)).max() < 1e-10          # exactly TP
        eigs = np.linalg.eigvalsh((est + est.conj().T) / 2)
        assert eigs.min() > -1e-3                            # CP to dyk_tol


def test_warm_start_reaches_same_likelihood_plateau():
    """warm_start=True is statistically equivalent to the converged cold-start
    MLE: likelihood-ratio statistic 2*N*deltaLL << the 1-sigma region (~240
    for the 240-parameter 2Q channel) and parameter deviation << shot noise.

    Run at the production config (stop_tol=1e-4, maxiter=25, loop_dyk_iters=2)
    against a fully converged reference solve.
    """
    import jax
    from forest_benchmarking_tpu.benchmarks import (process_tomo_A_matrix,
                                                    synth_process_datasets)
    from forest_benchmarking_tpu.tomography import pgdb_process_estimate_batched
    from forest_benchmarking_tpu.ops.superoperator_transformations import vec
    a = jnp.asarray(process_tomo_A_matrix(2))
    shots = 2000
    n, _ = synth_process_datasets(jax.random.PRNGKey(9), a, 4, 4, shots,
                                  dtype=jnp.float64)
    cold = pgdb_process_estimate_batched(a, n, dim=4, stop_tol=1e-12,
                                         maxiter=3000, dyk_iters=1000,
                                         method="apg")
    warm = pgdb_process_estimate_batched(a, n, dim=4, stop_tol=1e-4,
                                         maxiter=25, dyk_tol=1e-4,
                                         dyk_iters=20, method="apg",
                                         warm_start=True, loop_dyk_iters=1)

    def cost(est_b):
        v = jnp.stack([vec(est_b[i])[:, 0] for i in range(est_b.shape[0])])
        p = jnp.maximum(jnp.real(v @ a.T), 1e-12)
        return -jnp.sum(n * jnp.log(p), axis=1)

    # n is normalized by the grand total, so rescale the cross-entropy excess
    # back to nats to form the likelihood-ratio statistic
    grand_total = shots * (a.shape[0] // 2)
    llr = float(jnp.max(cost(warm) - cost(cold))) * 2 * grand_total
    assert llr < 5.0, llr                   # 1-sigma region is ~240
    assert float(jnp.abs(warm - cold).max()) < 5e-3  # shot noise is ~2e-2

    # PGDB also accepts a warm start (same iteration map, different init);
    # it must land on the same likelihood plateau as the cold trajectory
    warm_pgdb = pgdb_process_estimate_batched(a, n, dim=4, method="pgdb",
                                              warm_start=True, maxiter=200)
    llr_pgdb = float(jnp.max(cost(warm_pgdb) - cost(cold))) * 2 * grand_total
    assert llr_pgdb < 5.0, llr_pgdb
    assert float(jnp.abs(warm_pgdb - cold).max()) < 5e-3


def test_loop_dyk_iters_validation():
    """loop_dyk_iters rejects pgdb (needs exact projections) and values < 1."""
    import jax
    from forest_benchmarking_tpu.benchmarks import (process_tomo_A_matrix,
                                                    synth_process_datasets)
    from forest_benchmarking_tpu.tomography import pgdb_process_estimate_batched
    a = jnp.asarray(process_tomo_A_matrix(2))
    n, _ = synth_process_datasets(jax.random.PRNGKey(5), a, 4, 2, 500)
    with pytest.raises(ValueError, match="apg"):
        pgdb_process_estimate_batched(a, n, dim=4, method="pgdb",
                                      loop_dyk_iters=2)
    with pytest.raises(ValueError, match=">= 1"):
        pgdb_process_estimate_batched(a, n, dim=4, method="apg",
                                      loop_dyk_iters=0)


def test_ns_projection_matches_eigh_in_pgdb():
    import jax
    from forest_benchmarking_tpu.benchmarks import (process_tomo_A_matrix,
                                                    synth_process_datasets)
    from forest_benchmarking_tpu.tomography import pgdb_process_estimate_batched
    a = jnp.asarray(process_tomo_A_matrix(2))
    n, _ = synth_process_datasets(jax.random.PRNGKey(4), a, 4, 2, 1000,
                                  dtype=jnp.float64)
    eigh_est = pgdb_process_estimate_batched(a, n, dim=4, stop_tol=1e-8,
                                             maxiter=40, dyk_iters=60)
    ns_est = pgdb_process_estimate_batched(a, n, dim=4, stop_tol=1e-8,
                                           maxiter=40, dyk_iters=60,
                                           cp_method="ns", ns_iters=24)
    assert float(jnp.abs(eigh_est - ns_est).max()) < 1e-3


def test_unknown_method_raises():
    import jax
    from forest_benchmarking_tpu.benchmarks import (process_tomo_A_matrix,
                                                    synth_process_datasets)
    from forest_benchmarking_tpu.tomography import pgdb_process_estimate_batched
    a = jnp.asarray(process_tomo_A_matrix(2))
    n, _ = synth_process_datasets(jax.random.PRNGKey(5), a, 4, 1, 100,
                                  dtype=jnp.float64)
    with pytest.raises(ValueError):
        pgdb_process_estimate_batched(a, n, dim=4, method="banana")


def test_host_api_apg_method():
    circuit = Circuit([RY(0.5, 0)])
    qubits = [0]
    qvm = QVM(seed=10)
    expt = generate_process_tomography_experiment(circuit, qubits, "pauli")
    results = wfn_estimate_observables(qvm, expt, qubits)
    pgdb = np.asarray(pgdb_process_estimate(results, qubits))
    apg = np.asarray(pgdb_process_estimate(results, qubits, method="apg",
                                           maxiter=60))
    assert np.max(np.abs(pgdb - apg)) < 1e-3


def test_process_estimators_respect_observable_coefficients():
    """Scaling an observable by c scales its returned expectation by c (the
    estimate_observables contract); the process estimators must divide the
    coefficient back out like the state path does. Flipping a coefficient to
    -1 with a correspondingly negated expectation is the same data, so the
    estimates must be unchanged (they silently diverged before)."""
    from dataclasses import replace
    from forest_benchmarking_tpu.observable_estimation import ExperimentSetting
    circuit = Circuit([RY(0.7, 0)])
    qubits = [0]
    qvm = QVM(seed=1)
    expt = generate_process_tomography_experiment(circuit, qubits, "pauli")
    results = list(wfn_estimate_observables(qvm, expt, qubits))

    flipped = []
    for i, r in enumerate(results):
        if i % 2 == 0:
            obs = r.setting.observable.copy(
                coefficient=-1.0 * r.setting.observable.coefficient)
            r = replace(r, setting=ExperimentSetting(r.setting.in_state, obs),
                        expectation=-r.expectation)
        flipped.append(r)

    lin0 = np.asarray(linear_inv_process_estimate(results, qubits))
    lin1 = np.asarray(linear_inv_process_estimate(flipped, qubits))
    np.testing.assert_allclose(lin1, lin0, atol=1e-12)

    est0 = np.asarray(pgdb_process_estimate(results, qubits))
    est1 = np.asarray(pgdb_process_estimate(flipped, qubits))
    np.testing.assert_allclose(est1, est0, atol=1e-8)
