"""Tests for the experiment data model, grouping, acquisition, calibration."""
import numpy as np
import pytest

from forest_benchmarking_tpu.circuits import Circuit, H, CNOT, X
from forest_benchmarking_tpu.paulis import (
    PauliTerm, sX, sY, sZ, str_to_pauli_term, all_traceless_pauli_terms)
from forest_benchmarking_tpu.observable_estimation import (
    TensorProductState, ExperimentSetting, ObservablesExperiment,
    ExperimentResult, SIC0, SIC1, plusX, minusX, plusY, plusZ, minusZ,
    zeros_state, group_settings, group_settings_clique_removal,
    _max_weight_operator, _max_weight_state, generate_experiment_programs,
    shots_to_obs_moments, estimate_observables, calibrate_observable_estimates,
    ratio_variance, merge_disjoint_experiments, get_results_by_qubit_groups,
    to_json, read_json)
from forest_benchmarking_tpu.sim import QVM


# ------------------------------ pauli algebra ------------------------------

def test_pauli_term_algebra():
    assert (sX(0) * sY(0)).compact_str() == f"{1j}*Z0"
    assert (sY(0) * sX(0)).coefficient == -1j
    assert (sX(0) * sX(0)).compact_str().endswith("*I")
    xz = sX(0) * sZ(1)
    assert xz.get_qubits() == [0, 1]
    assert xz[0] == "X" and xz[1] == "Z" and xz[2] == "I"


def test_pauli_term_parse_round_trip():
    t = PauliTerm.from_compact_str("(1+0j)*X0Y3")
    assert t[0] == "X" and t[3] == "Y"
    t2 = PauliTerm.from_compact_str(t.compact_str())
    assert t == t2
    assert str_to_pauli_term("XIZ", [5, 6, 7])[7] == "Z"


def test_all_traceless_pauli_terms():
    terms = all_traceless_pauli_terms([0, 1])
    assert len(terms) == 15
    assert all(len(t) > 0 for t in terms)


# ------------------------------ data model ---------------------------------

def test_setting_str_round_trip():
    setting = ExperimentSetting(plusX(0) * minusZ(1),
                                str_to_pauli_term("YZ", [0, 1]))
    s = str(setting)
    back = ExperimentSetting.from_str(s)
    assert back == setting


def test_sic_state_str_round_trip():
    setting = ExperimentSetting(SIC0(0) * SIC1(1), sZ(0) * sZ(1))
    assert ExperimentSetting.from_str(str(setting)) == setting


def test_observables_experiment_json_round_trip(tmp_path):
    expt = ObservablesExperiment(
        [ExperimentSetting(zeros_state([0, 1]), t)
         for t in all_traceless_pauli_terms([0, 1])],
        program=Circuit([H(0), CNOT(0, 1)]))
    fn = str(tmp_path / "expt.json")
    to_json(fn, expt)
    back = read_json(fn)
    assert back == expt


# ------------------------------ grouping -----------------------------------

def test_max_weight_operator():
    assert _max_weight_operator([sX(0), sZ(1)]) is not None
    assert _max_weight_operator([sX(0), sZ(0)]) is None
    merged = _max_weight_operator([sX(0) * sZ(1), sZ(1) * sX(2)])
    assert merged == sX(0) * sZ(1) * sX(2)


def test_max_weight_state():
    assert _max_weight_state([plusX(0), minusZ(1)]) is not None
    assert _max_weight_state([plusX(0), plusZ(0)]) is None


def test_group_settings_2q_state_tomo():
    # 15 two-qubit Pauli observables group into 9 TPB groups
    settings = [ExperimentSetting(zeros_state([0, 1]), t)
                for t in all_traceless_pauli_terms([0, 1])]
    expt = ObservablesExperiment(settings, program=Circuit())
    grouped = group_settings(expt, "greedy")
    assert len(grouped) == 9
    assert sum(len(g) for g in grouped) == 15
    grouped_cr = group_settings(expt, "clique-removal")
    assert sum(len(g) for g in grouped_cr) == 15
    assert len(grouped_cr) <= 15


# ---------------------------- program generation ----------------------------

def test_generate_experiment_programs_meas_qubits():
    settings = [ExperimentSetting(zeros_state([0]), sX(0)),
                ExperimentSetting(zeros_state([0]), sZ(0))]
    expt = ObservablesExperiment(settings, program=Circuit([H(0)]))
    programs, meas_qubits = generate_experiment_programs(
        expt, use_basic_compile=False)
    assert len(programs) == 2
    assert meas_qubits[0] == [0]


def test_shots_to_obs_moments():
    bits = np.array([[0, 0], [0, 1], [1, 1], [0, 1]])
    # ZZ eigenvalue per shot: (+1)(+1)=1, (1)(-1)=-1, (-1)(-1)=1, -1 -> mean 0
    mean, var = shots_to_obs_moments(bits, [0, 1], str_to_pauli_term("ZZ", [0, 1]))
    assert np.isclose(mean, 0.0)
    # single-qubit Z on column 1
    mean1, _ = shots_to_obs_moments(bits, [0, 1], sZ(1))
    assert np.isclose(mean1, (1 - 1 - 1 - 1) / 4)
    # identity observable with coefficient
    mean_i, var_i = shots_to_obs_moments(bits, [0, 1], PauliTerm((), 2.0))
    assert mean_i == 2.0 and var_i == 0
    # beta-prior variant never returns exactly +-1
    ones = np.ones((10, 1), dtype=int)
    m, v = shots_to_obs_moments(ones, [0], sZ(0), use_beta_dist_unbiased_prior=True)
    assert -1 < m < -0.8 and v > 0


def test_estimate_observables_bell():
    qvm = QVM(seed=7)
    settings = [ExperimentSetting(zeros_state([0, 1]), str_to_pauli_term(s, [0, 1]))
                for s in ["XX", "YY", "ZZ"]]
    expt = ObservablesExperiment(settings, program=Circuit([H(0), CNOT(0, 1)]))
    results = list(estimate_observables(qvm, expt, num_shots=4000,
                                        use_basic_compile=False))
    by_obs = {r.setting.observable.id: r for r in results}
    assert abs(by_obs["X0X1"].expectation - 1.0) < 0.05
    assert abs(by_obs["Y0Y1"].expectation + 1.0) < 0.05
    assert abs(by_obs["Z0Z1"].expectation - 1.0) < 0.05
    assert all(r.total_counts == 4000 for r in results)


def test_estimate_observables_with_basic_compile():
    qvm = QVM(seed=8)
    settings = [ExperimentSetting(plusX(0), sX(0))]
    expt = ObservablesExperiment(settings, program=Circuit())
    res = list(estimate_observables(qvm, expt, num_shots=2000,
                                    use_basic_compile=True))[0]
    assert abs(res.expectation - 1.0) < 0.05


def test_calibration_corrects_readout_error():
    # X on qubit 0 with lossy readout; calibration should rescale to ~ -1
    qvm = QVM(seed=9)
    program = Circuit()
    program.define_noisy_readout(0, p00=0.95, p11=0.85)
    settings = [ExperimentSetting(minusZ(0), sZ(0))]
    expt = ObservablesExperiment(settings, program=program)
    raw = list(estimate_observables(qvm, expt, num_shots=30000, symm_type=-1,
                                    use_basic_compile=False))
    assert raw[0].expectation > -0.95  # attenuated by readout error
    cal = list(calibrate_observable_estimates(qvm, raw, num_shots=30000,
                                              noisy_program=program))
    assert abs(cal[0].expectation + 1.0) < 0.03
    assert cal[0].raw_expectation == raw[0].expectation
    assert cal[0].calibration_expectation < 1.0


def test_ratio_variance():
    assert np.isclose(ratio_variance(1.0, 0.1, 1.0, 0.0), 0.1)
    assert np.isclose(ratio_variance(0.0, 0.1, 2.0, 0.3), 0.1 / 4)


def test_merge_disjoint_experiments():
    expt1 = ObservablesExperiment([ExperimentSetting(zeros_state([0]), sZ(0))],
                                  program=Circuit([H(0)]))
    expt2 = ObservablesExperiment([ExperimentSetting(zeros_state([1]), sX(1))],
                                  program=Circuit([X(1)]))
    merged = merge_disjoint_experiments([expt1, expt2])
    assert sum(len(g) for g in merged) == 2
    overlapping = ObservablesExperiment([ExperimentSetting(zeros_state([0]), sX(0))],
                                        program=Circuit([X(0)]))
    with pytest.raises(ValueError):
        merge_disjoint_experiments([expt1, overlapping])


def test_get_results_by_qubit_groups():
    r01 = ExperimentResult(ExperimentSetting(zeros_state([0, 1]),
                                             str_to_pauli_term("XX", [0, 1])),
                           expectation=1.0, total_counts=100)
    r2 = ExperimentResult(ExperimentSetting(zeros_state([2]), sZ(2)),
                          expectation=0.5, total_counts=100)
    groups = get_results_by_qubit_groups([r01, r2], [(0, 1), (2,)])
    assert groups[(0, 1)] == [r01]
    assert groups[(2,)] == [r2]


def test_identity_only_observable_group():
    """A settings group whose observable is the (scaled) identity must yield
    (coefficient, 0) rather than crashing on the padded measurement register
    (reference early-returns the coefficient, observable_estimation.py:826)."""
    from forest_benchmarking_tpu.sim.qvm import QVM
    expt = ObservablesExperiment(
        [[ExperimentSetting(zeros_state([0]), PauliTerm({}, 2.0))]], Circuit())
    res = list(estimate_observables(QVM(), expt, num_shots=50))
    assert res[0].expectation == 2.0
    assert res[0].std_err == 0.0
