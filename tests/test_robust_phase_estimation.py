"""RPE tests: recover known rotation angles within the variance bound."""
import numpy as np
import pytest

from forest_benchmarking_tpu.circuits import Circuit, RZ, RX, RY, H, CZ, I
from forest_benchmarking_tpu.sim import QVM
from forest_benchmarking_tpu.robust_phase_estimation import (
    bloch_rotation_to_eigenvectors, get_change_of_basis_from_eigvecs,
    change_of_basis_matrix_to_circuit, all_eigenvector_prep_meas_settings,
    pick_two_eigenvecs_prep_meas_settings, generate_rpe_experiments,
    num_trials, get_additive_error_factor, acquire_rpe_data,
    get_variance_upper_bound, estimate_phase_from_moments,
    robust_phase_estimate, do_rpe)


def run_1q_rpe(rotation, angle_qubit, num_depths=6, seed=1, cob=None):
    qvm = QVM(seed=seed)
    if cob is None:
        cob = Circuit()
    prep, pre_meas, settings = all_eigenvector_prep_meas_settings(
        [angle_qubit], cob)
    expts = generate_rpe_experiments(rotation, prep, pre_meas, settings,
                                     num_depths=num_depths)
    results = acquire_rpe_data(qvm, expts, multiplicative_factor=10.0)
    return robust_phase_estimate(results, [angle_qubit])


def test_rpe_rz_angle():
    # RZ(phi): relative phase between |0> and |1> is phi
    for angle in (0.3, 1.1, 2.5):
        est = run_1q_rpe(Circuit([RZ(angle, 0)]), 0, seed=int(angle * 10))
        assert abs(est - angle) < 0.05, (angle, est)


def test_rpe_rz_negative_angle():
    angle = -0.7
    est = run_1q_rpe(Circuit([RZ(angle, 0)]), 0, seed=3)
    # returned in [0, 2pi)
    assert abs(est - (angle % (2 * np.pi))) < 0.05


def test_rpe_rx_with_change_of_basis():
    # rotation about X: change of basis maps |0> -> |+>, |1> -> |->
    angle = 0.9
    evecs = bloch_rotation_to_eigenvectors(np.pi / 2, 0)
    cob_mat = get_change_of_basis_from_eigvecs(evecs)
    cob = change_of_basis_matrix_to_circuit([0], cob_mat)
    est = run_1q_rpe(Circuit([RX(angle, 0)]), 0, seed=4, cob=cob)
    assert abs(est - angle) < 0.05


def test_rpe_estimate_within_variance_bound():
    angle = 1.5
    num_depths = 6
    est = run_1q_rpe(Circuit([RZ(angle, 0)]), 0, num_depths=num_depths, seed=5)
    bound = np.sqrt(get_variance_upper_bound(num_depths,
                                             multiplicative_factor=10.0))
    assert abs(est - angle) < max(5 * bound, 0.05)


def test_cob_matrix_properties():
    evecs = bloch_rotation_to_eigenvectors(np.pi / 2, 0)
    u = get_change_of_basis_from_eigvecs(evecs)
    assert np.allclose(u @ u.conj().T, np.eye(2), atol=1e-12)
    # maps |0> to |+>
    plus = np.array([1, 1]) / np.sqrt(2)
    assert np.allclose(np.abs(u @ np.array([1, 0])), np.abs(plus), atol=1e-12)


def test_num_trials_schedule():
    # shots decrease with depth (Heisenberg scaling allocates more to shallow)
    max_depth = 2 ** 5
    trials = [num_trials(2 ** j, max_depth) for j in range(6)]
    assert all(a >= b for a, b in zip(trials, trials[1:]))
    assert trials[-1] >= 1
    # additive error increases the count
    assert num_trials(2, max_depth, additive_error=0.1) >= num_trials(2, max_depth)


def test_additive_error_factor_positive():
    assert get_additive_error_factor(10, 0.1) > 0


def test_estimate_phase_from_moments_exact():
    # noiseless moments of RZ(phi): x_j = cos(2^j phi), y_j = sin(2^j phi)
    phi = 0.713
    depths = [2 ** j for j in range(7)]
    xs = [np.cos(d * phi) for d in depths]
    ys = [np.sin(d * phi) for d in depths]
    stds = [0.001] * len(depths)
    est = estimate_phase_from_moments(xs, ys, stds, stds)
    assert abs(est - phi) < 1e-3


def test_decoherence_limited_warning():
    xs = [0.9, 0.001]
    ys = [0.1, 0.001]
    stds = [0.01, 0.01]
    with pytest.warns(UserWarning):
        est = estimate_phase_from_moments(xs, ys, stds, stds)
    assert est >= 0


def test_do_rpe_wrapper():
    qvm = QVM(seed=6)
    angle = 0.8
    rotation = Circuit([RZ(angle, 0)])
    estimates, expts, results = do_rpe(qvm, rotation, [Circuit()], [(0,)],
                                       num_depths=5,
                                       multiplicative_factor=10.0)
    assert abs(estimates[(0,)] - angle) < 0.1


@pytest.mark.slow
def test_2q_rpe_cz_phases():
    # CZ: relative phase accumulated on qubit 1 depends on qubit 0 state:
    # |0>: 0 phase, |1>: pi phase. Use the multi-qubit post-selection path.
    qvm = QVM(seed=7)
    rotation = Circuit([CZ(0, 1)])
    prep, pre_meas, settings = all_eigenvector_prep_meas_settings(
        [0, 1], Circuit())
    expts = generate_rpe_experiments(rotation, prep, pre_meas, settings,
                                     num_depths=4)
    results = acquire_rpe_data(qvm, expts, multiplicative_factor=20.0)
    phases = robust_phase_estimate(results, [0, 1])
    # 2 qubits -> 2 relative phases per xy qubit: 0 and pi (mod 2pi)
    assert len(phases) == 4

    def circ_dist(p, e):
        d = abs((p - e) % (2 * np.pi))
        return min(d, 2 * np.pi - d)

    near_zero = sum(circ_dist(p, 0.0) < 0.1 for p in phases)
    near_pi = sum(circ_dist(p, np.pi) < 0.1 for p in phases)
    assert near_zero == 2 and near_pi == 2, phases


def test_pick_two_eigenvecs_settings():
    prep, pre_meas, settings = pick_two_eigenvecs_prep_meas_settings((0, 0), 1)
    assert len(settings) == 4
    labels = {str(s.observable) for s in settings}
    assert len(labels) == 4


def test_rpe_with_readout_mitigation():
    """mitigate_readout_errors path: noisy readout, calibrated estimates."""
    angle = 1.3

    class NoisyQVM(QVM):
        def run(self, circuit, qubits, num_shots):
            noisy = circuit.copy()
            noisy.define_noisy_readout(0, p00=0.92, p11=0.9)
            return super().run(noisy, qubits, num_shots)

    qvm = NoisyQVM(seed=8)
    prep, pre_meas, settings = all_eigenvector_prep_meas_settings([0], Circuit())
    expts = generate_rpe_experiments(Circuit([RZ(angle, 0)]), prep, pre_meas,
                                     settings, num_depths=5)
    results = acquire_rpe_data(qvm, expts, multiplicative_factor=20.0,
                               mitigate_readout_errors=True)
    est = robust_phase_estimate(results, [0])
    assert abs(est - angle) < 0.1
