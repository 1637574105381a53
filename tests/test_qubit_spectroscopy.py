"""Spectroscopy closed-loop tests: recover injected T1/T2, Rabi and CZ phases."""
import numpy as np
import pytest

from forest_benchmarking_tpu.circuits import Circuit, DELAY, RZ
from forest_benchmarking_tpu.sim import QVM
from forest_benchmarking_tpu.sim.density import decoherence_kraus
from forest_benchmarking_tpu.qubit_spectroscopy import (
    MICROSECOND, generate_t1_experiments, fit_t1_results, do_t1_or_t2,
    generate_t2_star_experiments, generate_t2_echo_experiments, fit_t2_results,
    generate_rabi_experiments, fit_rabi_results,
    generate_cz_phase_ramsey_experiments, fit_cz_phase_ramsey_results,
    acquire_qubit_spectroscopy_data, get_stats_by_qubit)
from forest_benchmarking_tpu.observable_estimation import ExperimentResult, \
    ExperimentSetting, zeros_state
from forest_benchmarking_tpu.paulis import str_to_pauli_term


def test_decoherence_kraus_trace_preserving():
    for t1, t2 in [(15e-6, 20e-6), (10e-6, None), (None, 5e-6), (None, None)]:
        ks = decoherence_kraus(3e-6, t1, t2)
        total = sum(k.conj().T @ k for k in ks)
        assert np.allclose(total, np.eye(2), atol=1e-12)


def test_t1_recovery():
    t1 = 12e-6
    qvm = QVM(seed=1, t1s={0: t1})
    times = np.linspace(1e-6, 40e-6, 15)
    decay_times, expts, results = do_t1_or_t2(qvm, [0], times, "t1",
                                              num_shots=4000)
    assert abs(decay_times[0] - t1 / MICROSECOND) < 1.0  # within 1 us


def test_t2_star_recovery():
    t2 = 9e-6
    qvm = QVM(seed=2, t1s={0: 100e-6}, t2s={0: t2})
    times = np.linspace(0.5e-6, 20e-6, 25)
    decay_times, expts, results = do_t1_or_t2(qvm, [0], times, "t2_star",
                                              num_shots=4000)
    assert abs(decay_times[0] - t2 / MICROSECOND) < 1.5


def test_t2_echo_recovery():
    t2 = 9e-6
    qvm = QVM(seed=3, t1s={0: 100e-6}, t2s={0: t2})
    times = np.linspace(0.5e-6, 20e-6, 25)
    decay_times, expts, results = do_t1_or_t2(qvm, [0], times, "t2_echo",
                                              num_shots=4000)
    assert abs(decay_times[0] - t2 / MICROSECOND) < 1.5


def test_do_t1_or_t2_bad_kind():
    qvm = QVM(seed=4)
    with pytest.raises(ValueError):
        do_t1_or_t2(qvm, [0], [1e-6], "banana")


def test_rabi_calibrated_gate():
    qvm = QVM(seed=5)
    angles = np.linspace(0, 2 * np.pi, 20)
    expts = generate_rabi_experiments([0], angles)
    results = acquire_qubit_spectroscopy_data(qvm, expts, num_shots=2000)
    stats = get_stats_by_qubit(results)
    fit = fit_rabi_results(angles, stats[0]["expectation"], stats[0]["std_err"])
    # perfectly calibrated: frequency (actual/intended ratio) = 1
    assert abs(fit.params["frequency"].value - 1.0) < 0.02
    assert abs(abs(fit.params["amplitude"].value) - 0.5) < 0.02


def test_cz_phase_ramsey():
    # ideal CZ imparts no phase on the measure qubit when the other is |0>
    qvm = QVM(seed=6)
    angles = np.linspace(-np.pi, np.pi, 20)
    expts = generate_cz_phase_ramsey_experiments((0, 1), 0, angles)
    results = acquire_qubit_spectroscopy_data(qvm, expts, num_shots=2000)
    stats = get_stats_by_qubit(results)
    fit = fit_cz_phase_ramsey_results(angles, stats[0]["expectation"],
                                      stats[0]["std_err"])
    offset = fit.params["offset"].value % (2 * np.pi)
    assert min(offset, 2 * np.pi - offset) < 0.05


def test_effective_rz_phase_detected():
    # replace CZ with an RZ(0.4) on the measured qubit: offset should be ~0.4
    qvm = QVM(seed=7)
    angles = np.linspace(-np.pi, np.pi, 20)
    phase = 0.4
    from forest_benchmarking_tpu.observable_estimation import minusY
    from forest_benchmarking_tpu.paulis import PauliTerm
    from forest_benchmarking_tpu.observable_estimation import ObservablesExperiment
    expts = []
    for angle in angles:
        program = Circuit([RZ(phase, 0), RZ(angle, 0)])
        settings = [ExperimentSetting(minusY(0), PauliTerm([(0, "Y")]))]
        expts.append(ObservablesExperiment([settings], program))
    results = acquire_qubit_spectroscopy_data(qvm, expts, num_shots=2000)
    stats = get_stats_by_qubit(results)
    fit = fit_cz_phase_ramsey_results(angles, stats[0]["expectation"],
                                      stats[0]["std_err"])
    assert abs(fit.params["offset"].value - phase) < 0.05


def test_get_stats_by_qubit_rejects_multiqubit():
    res = ExperimentResult(
        ExperimentSetting(zeros_state([0, 1]), str_to_pauli_term("ZZ", [0, 1])),
        expectation=1.0, total_counts=100)
    with pytest.raises(ValueError):
        get_stats_by_qubit([[res]])


def test_t1_experiment_structure():
    expts = generate_t1_experiments([0, 1], [1e-6, 2e-6])
    assert len(expts) == 2
    # both qubits measured in one parallel group
    assert len(expts[0]) == 1
    assert len(expts[0][0]) == 2


def test_t2_echo_delays_sum_exactly_to_labeled_time():
    """The two half-delays must sum to exactly t for every requested time —
    including odd multiples of 100 ns, which the reference's 100-ns rounding
    (a hardware grid) silently shortened by up to 33% relative to the
    detuning phase and the fit axis."""
    from forest_benchmarking_tpu.qubit_spectroscopy import (
        generate_t2_echo_experiments)
    times = [3e-7, 4.5e-7, 9e-7, 1.05e-6]
    expts = generate_t2_echo_experiments([0], times)
    for t, expt in zip(times, expts):
        delays = [g.params[0] for g in expt.program.gates if g.name == "DELAY"]
        assert len(delays) == 2
        assert delays[0] == delays[1]
        assert delays[0] + delays[1] == t
