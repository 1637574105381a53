"""DFE tests: noiseless fidelity ~1, noisy fidelity matches known values."""
import numpy as np
import pytest

from forest_benchmarking_tpu.circuits import Circuit, Gate, H, CNOT, X, S, CZ


def noisy_circuit(gates, qubits, kraus_ops):
    """Circuit with a custom no-op 'noise' gate (which survives basic_compile)
    carrying the Kraus channel — the reference test pattern."""
    eye = np.eye(2 ** len(qubits), dtype=complex)
    c = Circuit(list(gates) + [Gate("noise", (), tuple(qubits),
                                    matrix=tuple(map(tuple, eye)))])
    c.define_noisy_gate("noise", qubits, kraus_ops)
    return c
from forest_benchmarking_tpu.sim import QVM
from forest_benchmarking_tpu.sim.noise import depolarizing_kraus_map
from forest_benchmarking_tpu.direct_fidelity_estimation import (
    generate_exhaustive_state_dfe_experiment,
    generate_exhaustive_process_dfe_experiment,
    generate_monte_carlo_state_dfe_experiment,
    generate_monte_carlo_process_dfe_experiment,
    acquire_dfe_data, estimate_dfe, do_dfe)


def test_exhaustive_state_dfe_settings_count():
    expt = generate_exhaustive_state_dfe_experiment(Circuit([H(0), CNOT(0, 1)]),
                                                    [0, 1])
    assert len(expt) == 3  # 2**2 - 1 stabilizer observables


def test_exhaustive_process_dfe_settings_count():
    expt = generate_exhaustive_process_dfe_experiment(Circuit([H(0)]), [0])
    assert len(expt) == 3 * 2  # (4-1) paulis x 2 eigenstates


def test_state_dfe_bell_noiseless():
    qvm = QVM(seed=1)
    program = Circuit([H(0), CNOT(0, 1)])
    (fid, err), expt, results = do_dfe(qvm, program, [0, 1], "state",
                                       num_shots=2000)
    assert abs(fid - 1.0) < 0.01


def test_process_dfe_noiseless():
    qvm = QVM(seed=2)
    program = Circuit([H(0)])
    (fid, err), expt, results = do_dfe(qvm, program, [0], "process",
                                       num_shots=2000)
    assert abs(fid - 1.0) < 0.01


def test_process_dfe_2q_noiseless():
    qvm = QVM(seed=3)
    program = Circuit([CZ(0, 1)])
    (fid, err), expt, results = do_dfe(qvm, program, [0, 1], "process",
                                       num_shots=1000)
    assert abs(fid - 1.0) < 0.02


def test_state_dfe_with_depolarizing_noise():
    # |+> state with depolarizing noise p: rho = (1-p)|+><+| + p I/2
    # fidelity = <+|rho|+> = 1 - p/2
    p = 0.2
    qvm = QVM(seed=4)
    program = noisy_circuit([H(0)], (0,), depolarizing_kraus_map(p))
    (fid, err), expt, results = do_dfe(qvm, program, [0], "state",
                                       num_shots=20000)
    assert abs(fid - (1 - p / 2)) < 0.02


def test_process_dfe_with_depolarizing_noise():
    # depolarizing(p) after H: average gate fidelity vs ideal H = 1 - p/2
    p = 0.3
    qvm = QVM(seed=5)
    program = noisy_circuit([H(0)], (0,), depolarizing_kraus_map(p))
    (fid, err), expt, results = do_dfe(qvm, program, [0], "process",
                                       num_shots=20000)
    assert abs(fid - (1 - p / 2)) < 0.02


def test_monte_carlo_state_dfe():
    qvm = QVM(seed=6)
    rng = np.random.RandomState(0)
    program = Circuit([H(0), CNOT(0, 1)])
    expt = generate_monte_carlo_state_dfe_experiment(program, [0, 1],
                                                     n_terms=20, rng=rng)
    assert len(expt) == 20
    results = acquire_dfe_data(qvm, expt, num_shots=500)
    fid, err = estimate_dfe(results, "state")
    assert abs(fid - 1.0) < 0.05


def test_monte_carlo_process_dfe():
    qvm = QVM(seed=7)
    rng = np.random.RandomState(1)
    program = Circuit([S(0)])
    expt = generate_monte_carlo_process_dfe_experiment(program, [0],
                                                       n_terms=20, rng=rng)
    assert len(expt) == 20
    results = acquire_dfe_data(qvm, expt, num_shots=500)
    fid, err = estimate_dfe(results, "process")
    assert abs(fid - 1.0) < 0.05


def test_estimate_dfe_bad_kind_raises():
    qvm = QVM(seed=8)
    program = Circuit([X(0)])
    expt = generate_exhaustive_state_dfe_experiment(program, [0])
    results = acquire_dfe_data(qvm, expt, num_shots=100)
    with pytest.raises(ValueError):
        estimate_dfe(results, "banana")
    with pytest.raises(ValueError):
        do_dfe(qvm, program, [0], "banana")
