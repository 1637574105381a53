"""State tomography: linear inversion + iterative MLE vs truth and numpy oracle."""
import numpy as np
import jax.numpy as jnp
import pytest

from forest_benchmarking_tpu.circuits import Circuit, H, CNOT, RY, RX
from forest_benchmarking_tpu.sim import QVM
from forest_benchmarking_tpu.sim.statevector import run_statevector
from forest_benchmarking_tpu import distance_measures as dm
from forest_benchmarking_tpu.tomography import (
    generate_state_tomography_experiment, linear_inv_state_estimate,
    iterative_mle_state_estimate, iterative_mle_state_estimate_batched,
    state_log_likelihood, estimate_variance, state_to_density,
    _results_to_state_arrays)
from forest_benchmarking_tpu.observable_estimation import (
    estimate_observables, group_settings, plusX, SIC1, SIC2, SIC3,
    ExperimentResult)
from forest_benchmarking_tpu.ops import project_state_matrix_to_physical
from oracles import np_mle_state, wfn_estimate_observables


def true_state(circuit, qubits):
    psi = np.asarray(run_statevector(circuit, qubits))
    return np.outer(psi, psi.conj())


@pytest.mark.parametrize("circuit,qubits", [
    (Circuit([H(0)]), [0]),
    (Circuit([RY(0.6, 0)]), [0]),
    (Circuit([H(0), CNOT(0, 1)]), [0, 1]),
])
def test_linear_inv_exact_expectations(circuit, qubits):
    qvm = QVM(seed=1)
    expt = generate_state_tomography_experiment(circuit, qubits)
    results = wfn_estimate_observables(qvm, expt, qubits)
    rho_est = np.asarray(linear_inv_state_estimate(results, qubits))
    assert np.max(np.abs(rho_est - true_state(circuit, qubits))) < 1e-10


@pytest.mark.parametrize("circuit,qubits", [
    (Circuit([H(0)]), [0]),
    (Circuit([H(0), CNOT(0, 1)]), [0, 1]),
])
def test_mle_exact_expectations(circuit, qubits):
    qvm = QVM(seed=2)
    expt = generate_state_tomography_experiment(circuit, qubits)
    results = wfn_estimate_observables(qvm, expt, qubits)
    rho_est = np.asarray(iterative_mle_state_estimate(results, qubits))
    truth = true_state(circuit, qubits)
    assert float(dm.fidelity(jnp.asarray(truth), jnp.asarray(rho_est))) > 0.999


def test_mle_matches_numpy_oracle():
    # identical (sampled) data through both implementations -> agree to 1e-8
    qvm = QVM(seed=3)
    circuit = Circuit([RY(0.4, 0), CNOT(0, 1)])
    qubits = [0, 1]
    expt = group_settings(generate_state_tomography_experiment(circuit, qubits))
    results = list(estimate_observables(qvm, expt, num_shots=2000,
                                        use_basic_compile=False))
    obs_mats, expectations, _ = _results_to_state_arrays(results, qubits)
    oracle = np_mle_state(obs_mats, expectations, epsilon=0.1, tol=1e-9)
    ours = np.asarray(iterative_mle_state_estimate(results, qubits, tol=1e-9))
    assert np.max(np.abs(ours - oracle)) < 1e-8


def test_mle_sampled_close_to_truth():
    qvm = QVM(seed=4)
    circuit = Circuit([H(0), CNOT(0, 1)])
    qubits = [0, 1]
    expt = group_settings(generate_state_tomography_experiment(circuit, qubits))
    results = list(estimate_observables(qvm, expt, num_shots=10000,
                                        use_basic_compile=False))
    rho_est = np.asarray(iterative_mle_state_estimate(results, qubits))
    truth = true_state(circuit, qubits)
    assert float(dm.fidelity(jnp.asarray(truth),
                             jnp.asarray(rho_est))) > 0.98


def test_mle_maxent_and_hedged_variants():
    qvm = QVM(seed=5)
    circuit = Circuit([RY(1.1, 0)])
    qubits = [0]
    expt = generate_state_tomography_experiment(circuit, qubits)
    results = list(estimate_observables(qvm, expt, num_shots=4000,
                                        use_basic_compile=False))
    truth = true_state(circuit, qubits)
    rho_me = np.asarray(iterative_mle_state_estimate(results, qubits,
                                                     entropy_penalty=0.005))
    rho_h = np.asarray(iterative_mle_state_estimate(results, qubits, beta=0.5,
                                                    epsilon=0.0001, tol=1e-7))
    for rho in (rho_me, rho_h):
        assert np.isclose(np.trace(rho).real, 1.0, atol=1e-8)
        assert float(dm.fidelity(jnp.asarray(truth), jnp.asarray(rho))) > 0.9
    with pytest.raises(ValueError):
        iterative_mle_state_estimate(results, qubits, entropy_penalty=0.1,
                                     beta=0.5)


def test_mle_batched_matches_single():
    qvm = QVM(seed=6)
    qubits = [0]
    all_results = []
    for theta in (0.3, 0.9, 1.7, 2.5):
        expt = generate_state_tomography_experiment(Circuit([RY(theta, 0)]), qubits)
        all_results.append(list(estimate_observables(qvm, expt, num_shots=2000,
                                                     use_basic_compile=False)))
    obs_mats, _, _ = _results_to_state_arrays(all_results[0], qubits)
    es = np.stack([_results_to_state_arrays(r, qubits)[1] for r in all_results])
    ns = np.array([sum(r.total_counts for r in rr) for rr in all_results],
                  dtype=float)
    batched = np.asarray(iterative_mle_state_estimate_batched(
        jnp.asarray(obs_mats), jnp.asarray(es), jnp.asarray(ns)))
    singles = np.stack([np.asarray(iterative_mle_state_estimate(r, qubits))
                        for r in all_results])
    assert np.max(np.abs(batched - singles)) < 1e-10


def test_state_log_likelihood_increases_with_fit():
    qvm = QVM(seed=7)
    circuit = Circuit([H(0)])
    qubits = [0]
    expt = generate_state_tomography_experiment(circuit, qubits)
    results = list(estimate_observables(qvm, expt, num_shots=4000,
                                        use_basic_compile=False))
    # use a slightly-mixed truth-adjacent state vs a full-rank wrong state so no
    # pr <= 0 branch is skipped (the reference's `continue` artifact)
    near_truth = 0.98 * true_state(circuit, qubits) + 0.02 * np.eye(2) / 2
    bad = np.diag([0.9, 0.1]).astype(complex)
    assert state_log_likelihood(near_truth, results, qubits) > \
        state_log_likelihood(bad, results, qubits)


def test_estimate_variance_bootstrap():
    qvm = QVM(seed=8)
    circuit = Circuit([H(0)])
    qubits = [0]
    expt = generate_state_tomography_experiment(circuit, qubits)
    results = list(estimate_observables(qvm, expt, num_shots=2000,
                                        use_basic_compile=False))
    rng = np.random.RandomState(0)
    mean, var = estimate_variance(results, qubits, linear_inv_state_estimate,
                                  dm.purity, n_resamples=20,
                                  project_to_physical=True, rng=rng)
    assert 0.9 < mean <= 1.01
    assert 0 <= var < 0.01
    truth = true_state(circuit, qubits)
    mean_f, var_f = estimate_variance(results, qubits, linear_inv_state_estimate,
                                      dm.fidelity, target_state=jnp.asarray(truth),
                                      n_resamples=20, project_to_physical=True,
                                      rng=rng)
    assert 0.9 < mean_f <= 1.01
    with pytest.raises(ValueError):
        estimate_variance(results, qubits, linear_inv_state_estimate, dm.fidelity)


def test_state_to_density_sic_states_form_tetrahedron():
    # SIC states should have pairwise overlap 1/3
    from forest_benchmarking_tpu.observable_estimation import SIC0
    states = [np.asarray(state_to_density(S(0), [0]))
              for S in (SIC0, SIC1, SIC2, SIC3)]
    for i in range(4):
        assert np.isclose(np.trace(states[i] @ states[i]).real, 1.0, atol=1e-12)
        for j in range(i + 1, 4):
            assert np.isclose(np.trace(states[i] @ states[j]).real, 1 / 3,
                              atol=1e-10)


def test_do_tomography_state():
    from forest_benchmarking_tpu.tomography import do_tomography
    qvm = QVM(seed=9)
    circuit = Circuit([H(0)])
    rho, expt, results = do_tomography(qvm, circuit, [0], "state",
                                       num_shots=2000)
    truth = true_state(circuit, [0])
    assert float(dm.fidelity(jnp.asarray(truth), jnp.asarray(
        project_state_matrix_to_physical(rho)))) > 0.95


def _random_1q_shot_expectations(rng, batch, shots=2000):
    from forest_benchmarking_tpu.utils import pauli_basis_matrices
    obs = pauli_basis_matrices(1)[1:]
    psi = rng.randn(batch, 2) + 1j * rng.randn(batch, 2)
    psi /= np.linalg.norm(psi, axis=1, keepdims=True)
    rho = psi[:, :, None] * psi[:, None, :].conj()
    exact = np.real(np.einsum("sij,bji->bs", obs, rho))
    e = 2 * rng.binomial(shots, (1 + exact) / 2) / shots - 1
    return obs, e, np.full((batch,), 3.0 * shots)


@pytest.mark.parametrize("warm_start,tol,maxiter", [
    (False, 1e-9, 10_000), (True, 1e-9, 10_000), (True, 1e-7, 60)])
def test_mle_bloch_kernel_matches_general(warm_start, tol, maxiter):
    """The fused Bloch-representation 1Q DIMLE (method='bloch') is the same
    algorithm as the generic complex-matrix kernel: f64 parity to 1e-12."""
    rng = np.random.RandomState(11)
    obs, e, nm = _random_1q_shot_expectations(rng, batch=64)
    kw = dict(tol=tol, maxiter=maxiter, warm_start=warm_start)
    general = np.asarray(iterative_mle_state_estimate_batched(
        jnp.asarray(obs), jnp.asarray(e), jnp.asarray(nm),
        method="general", **kw))
    bloch = np.asarray(iterative_mle_state_estimate_batched(
        obs, jnp.asarray(e), jnp.asarray(nm), method="bloch", **kw))
    assert np.max(np.abs(general - bloch)) < 1e-12
    # trace-1 Hermitian PSD-by-construction
    assert np.allclose(np.trace(bloch, axis1=1, axis2=2).real, 1.0, atol=1e-12)


def test_mle_bloch_matches_numpy_oracle():
    """Bloch path vs the independent numpy re-derivation of diluted MLE."""
    rng = np.random.RandomState(12)
    obs, e, nm = _random_1q_shot_expectations(rng, batch=8)
    ours = np.asarray(iterative_mle_state_estimate_batched(
        obs, jnp.asarray(e), jnp.asarray(nm), tol=1e-9, method="bloch"))
    for i in range(e.shape[0]):
        oracle = np_mle_state(obs, e[i], epsilon=0.1, tol=1e-9)
        assert np.max(np.abs(ours[i] - oracle)) < 1e-7


def test_mle_bloch_routing():
    """method='auto' routes XYZ-stack problems to the Bloch kernel; variants
    and non-Pauli observables fall back; method='bloch' raises if ineligible."""
    from forest_benchmarking_tpu.tomography import _is_xyz_pauli_stack
    from forest_benchmarking_tpu.utils import pauli_basis_matrices
    xyz = pauli_basis_matrices(1)[1:]
    assert _is_xyz_pauli_stack(xyz)
    assert _is_xyz_pauli_stack(jnp.asarray(xyz))  # concrete cpu jax array
    assert not _is_xyz_pauli_stack(xyz[::-1])     # ZYX order
    assert not _is_xyz_pauli_stack(pauli_basis_matrices(2)[1:4])
    rng = np.random.RandomState(13)
    obs, e, nm = _random_1q_shot_expectations(rng, batch=4)
    with pytest.raises(ValueError):
        iterative_mle_state_estimate_batched(
            obs, jnp.asarray(e), jnp.asarray(nm), beta=0.5, method="bloch")
    with pytest.raises(ValueError):
        iterative_mle_state_estimate_batched(
            obs[::-1], jnp.asarray(e), jnp.asarray(nm), method="bloch")
    with pytest.raises(ValueError):
        iterative_mle_state_estimate_batched(
            obs, jnp.asarray(e), jnp.asarray(nm), method="nope")
    # hedged variant still works under auto (falls back to general kernel)
    hedged = np.asarray(iterative_mle_state_estimate_batched(
        obs, jnp.asarray(e), jnp.asarray(nm), beta=0.5, maxiter=500))
    assert np.allclose(np.trace(hedged, axis1=1, axis2=2).real, 1.0, atol=1e-8)


def test_mle_bloch_representation():
    """representation='bloch' returns the (B, 3) Bloch vectors of exactly the
    density matrices the default representation returns; it raises on the
    general-kernel route (where no Bloch form exists)."""
    from forest_benchmarking_tpu.tomography import bloch_to_density
    rng = np.random.RandomState(14)
    obs, e, nm = _random_1q_shot_expectations(rng, batch=16)
    kw = dict(tol=1e-7, maxiter=60, warm_start=True)
    rho = np.asarray(iterative_mle_state_estimate_batched(
        obs, jnp.asarray(e), jnp.asarray(nm), **kw))
    r = iterative_mle_state_estimate_batched(
        obs, jnp.asarray(e), jnp.asarray(nm), representation="bloch", **kw)
    assert r.shape == (16, 3)
    assert np.max(np.abs(np.asarray(bloch_to_density(r)) - rho)) < 1e-12
    with pytest.raises(ValueError):
        iterative_mle_state_estimate_batched(
            obs, jnp.asarray(e), jnp.asarray(nm), method="general",
            representation="bloch", **kw)
    with pytest.raises(ValueError):
        iterative_mle_state_estimate_batched(
            obs, jnp.asarray(e), jnp.asarray(nm), representation="nope", **kw)


def test_mle_warm_start_same_fixed_point():
    """warm_start=True (projected linear inversion init) reaches the same
    DIMLE fixed point as the I/d start, well below shot noise."""
    import jax
    from forest_benchmarking_tpu.utils import pauli_basis_matrices
    from forest_benchmarking_tpu.tomography import (
        iterative_mle_state_estimate_batched)
    rng = np.random.RandomState(3)
    obs = jnp.asarray(pauli_basis_matrices(1)[1:])
    batch, shots = 16, 2000
    psi = rng.randn(batch, 2) + 1j * rng.randn(batch, 2)
    psi /= np.linalg.norm(psi, axis=1, keepdims=True)
    rho = psi[:, :, None] * psi[:, None, :].conj()
    exact = np.real(np.einsum("sij,bji->bs", np.asarray(obs), rho))
    e = jnp.asarray(2 * rng.binomial(shots, (1 + exact) / 2) / shots - 1)
    nm = jnp.full((batch,), 3.0 * shots)
    cold = iterative_mle_state_estimate_batched(obs, e, nm, tol=1e-10,
                                                maxiter=20000)
    warm = iterative_mle_state_estimate_batched(obs, e, nm, tol=1e-10,
                                                maxiter=20000, warm_start=True)
    assert float(jnp.abs(warm - cold).max()) < 1e-3
    assert np.allclose(np.asarray(jnp.trace(warm, axis1=1, axis2=2)).real, 1.0,
                       atol=1e-10)


def test_mle_warm_start_2q_same_fixed_point():
    """The linear-inversion warm start is valid for any full traceless Pauli
    basis: on 2Q problems it reaches the same DIMLE fixed point as I/d."""
    import jax
    from forest_benchmarking_tpu.utils import pauli_basis_matrices
    from forest_benchmarking_tpu.tomography import (
        iterative_mle_state_estimate_batched)
    rng = np.random.RandomState(2)
    obs = jnp.asarray(pauli_basis_matrices(2)[1:])   # 15 traceless 2Q Paulis
    batch, shots = 8, 3000
    psi = rng.randn(batch, 4) + 1j * rng.randn(batch, 4)
    psi /= np.linalg.norm(psi, axis=1, keepdims=True)
    rho = psi[:, :, None] * psi[:, None, :].conj()
    exact = np.real(np.einsum("sij,bji->bs", np.asarray(obs), rho))
    e = jnp.asarray(2 * rng.binomial(shots, (1 + exact) / 2) / shots - 1)
    nm = jnp.full((batch,), 15.0 * shots)
    cold = iterative_mle_state_estimate_batched(obs, e, nm, tol=1e-11,
                                                maxiter=50000)
    warm = iterative_mle_state_estimate_batched(obs, e, nm, tol=1e-11,
                                                maxiter=50000, warm_start=True)
    assert float(jnp.abs(warm - cold).max()) < 1e-4
