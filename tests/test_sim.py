"""Simulator tests: statevector, density, noise, sampling, symmetrization."""
import numpy as np
import jax.numpy as jnp
import pytest

from forest_benchmarking_tpu.circuits import (
    Circuit, Gate, H, X, CNOT, CZ, RX, RY, RZ, SWAP, CCNOT, T, S, ISWAP, XY)
from forest_benchmarking_tpu.sim import QVM, run_statevector
from forest_benchmarking_tpu.sim.density import run_density_matrix
from forest_benchmarking_tpu.paulis import sX, sY, sZ, str_to_pauli_term


def test_plus_state():
    psi = np.asarray(run_statevector(Circuit([H(0)]), [0]))
    assert np.allclose(psi, [1 / np.sqrt(2), 1 / np.sqrt(2)])


def test_bell_state():
    psi = np.asarray(run_statevector(Circuit([H(0), CNOT(0, 1)]), [0, 1]))
    assert np.allclose(psi, [1 / np.sqrt(2), 0, 0, 1 / np.sqrt(2)])


def test_cnot_msb_convention():
    # qubit order [0,1]: first listed qubit is MSB. X(0) then CNOT(0,1) -> |11>
    psi = np.asarray(run_statevector(Circuit([X(0), CNOT(0, 1)]), [0, 1]))
    assert np.allclose(np.abs(psi) ** 2, [0, 0, 0, 1])
    # and with control=1, nothing happens to qubit 0 from |01>
    psi = np.asarray(run_statevector(Circuit([X(1), CNOT(0, 1)]), [0, 1]))
    assert np.allclose(np.abs(psi) ** 2, [0, 1, 0, 0])


def test_ghz_on_3():
    c = Circuit([H(0), CNOT(0, 1), CNOT(1, 2)])
    p = np.abs(np.asarray(run_statevector(c, [0, 1, 2]))) ** 2
    assert np.allclose(p, [0.5, 0, 0, 0, 0, 0, 0, 0.5])


def test_gate_matrix_sanity():
    # RY(pi/2)|0> = (|0>+|1>)/sqrt(2)
    psi = np.asarray(run_statevector(Circuit([RY(np.pi / 2, 0)]), [0]))
    assert np.allclose(psi, [1 / np.sqrt(2), 1 / np.sqrt(2)], atol=1e-12)
    # T*S*Z |1> phases
    psi = np.asarray(run_statevector(Circuit([X(0), T(0)]), [0]))
    assert np.allclose(psi, [0, np.exp(1j * np.pi / 4)])


def test_swap_and_ccnot():
    psi = np.asarray(run_statevector(Circuit([X(0), SWAP(0, 1)]), [0, 1]))
    assert np.allclose(np.abs(psi) ** 2, [0, 1, 0, 0])
    psi = np.asarray(run_statevector(Circuit([X(0), X(1), CCNOT(0, 1, 2)]),
                                     [0, 1, 2]))
    assert np.allclose(np.abs(psi) ** 2, [0, 0, 0, 0, 0, 0, 0, 1])


def test_density_matches_statevector():
    c = Circuit([H(0), CNOT(0, 1), RZ(0.3, 1)])
    psi = np.asarray(run_statevector(c, [0, 1]))
    rho = np.asarray(run_density_matrix(c, [0, 1]))
    assert np.allclose(rho, np.outer(psi, psi.conj()), atol=1e-12)


def test_gate_noise_depolarizes():
    from forest_benchmarking_tpu.utils import I_MAT, X_MAT, Y_MAT, Z_MAT
    p = 0.3
    kraus = [np.sqrt(1 - 3 * p / 4) * I_MAT] + \
            [np.sqrt(p / 4) * P for P in (X_MAT, Y_MAT, Z_MAT)]
    c = Circuit([H(0)])
    c.define_noisy_gate("H", None, kraus)
    rho = np.asarray(run_density_matrix(c, [0]))
    plus = np.array([[0.5, 0.5], [0.5, 0.5]])
    expected = (1 - p) * plus + p * np.eye(2) / 2
    assert np.allclose(rho, expected, atol=1e-12)


def test_qvm_run_deterministic_state():
    qvm = QVM(seed=1)
    bits = qvm.run(Circuit([X(0)]), [0], 100)
    assert bits.shape == (100, 1)
    assert np.all(bits == 1)


def test_qvm_run_statistics():
    qvm = QVM(seed=2)
    bits = qvm.run(Circuit([H(0)]), [0], 20000)
    assert abs(bits.mean() - 0.5) < 0.02


def test_qvm_expectation_exact():
    qvm = QVM(seed=3)
    c = Circuit([H(0)])
    assert np.isclose(qvm.expectation(c, [0], sX(0)), 1.0, atol=1e-12)
    assert np.isclose(qvm.expectation(c, [0], sZ(0)), 0.0, atol=1e-12)
    bell = Circuit([H(0), CNOT(0, 1)])
    assert np.isclose(qvm.expectation(bell, [0, 1],
                                      str_to_pauli_term("ZZ", [0, 1])), 1.0)
    assert np.isclose(qvm.expectation(bell, [0, 1],
                                      str_to_pauli_term("XX", [0, 1])), 1.0)
    assert np.isclose(qvm.expectation(bell, [0, 1],
                                      str_to_pauli_term("YY", [0, 1])), -1.0)


def test_readout_confusion_biases_counts():
    qvm = QVM(seed=4)
    c = Circuit([X(0)])
    c.define_noisy_readout(0, p00=1.0, p11=0.8)  # 1 misread as 0 with prob 0.2
    bits = qvm.run(c, [0], 50000)
    assert abs(bits.mean() - 0.8) < 0.01


def test_symmetrized_readout_balances_asymmetric_error():
    # |+> measured with asymmetric readout: raw mean biased, symmetrized ~0.5
    qvm = QVM(seed=5)
    c = Circuit([H(0)])
    c.define_noisy_readout(0, p00=1.0, p11=0.7)
    raw = qvm.run(c, [0], 40000).mean()
    symm = qvm.run_symmetrized_readout(c, 40000, symm_type=-1,
                                       meas_qubits=[0]).mean()
    # raw mean = 0.5*p(1|0) + 0.5*p(1|1) = 0.35; symmetrization restores 0.5
    assert abs(raw - 0.35) < 0.02
    assert abs(symm - 0.5) < 0.02


def test_symmetrized_readout_shot_count():
    qvm = QVM(seed=6)
    bits = qvm.run_symmetrized_readout(Circuit([H(0), CNOT(0, 1)]), 1001,
                                       symm_type=-1, meas_qubits=[0, 1])
    assert bits.shape == (1001, 2)


def test_dagger_circuit_inverts():
    c = Circuit([H(0), T(0), CNOT(0, 1), RY(0.3, 1)])
    full = c + c.dagger()
    psi = np.asarray(run_statevector(full, [0, 1]))
    expected = np.zeros(4)
    expected[0] = 1
    assert np.allclose(np.abs(psi), expected, atol=1e-12)


def test_iswap_xy_consistency():
    # XY(pi) == ISWAP
    psi1 = np.asarray(run_statevector(Circuit([X(0), XY(np.pi, 0, 1)]), [0, 1]))
    psi2 = np.asarray(run_statevector(Circuit([X(0), ISWAP(0, 1)]), [0, 1]))
    assert np.allclose(psi1, psi2, atol=1e-12)


def test_symmetrization_patterns_properties():
    from forest_benchmarking_tpu.sim.qvm import _symmetrization_patterns
    import itertools
    # exhaustive
    pats = _symmetrization_patterns(-1, 3)
    assert pats.shape == (8, 3)
    # strength 1: each column balanced
    pats = _symmetrization_patterns(1, 4)
    assert np.allclose(pats.mean(axis=0), 0.5)
    # strength 2: every pair of columns sees all 4 combos equally often
    for k in (2, 3, 5):
        pats = _symmetrization_patterns(2, k)
        assert np.allclose(pats.mean(axis=0), 0.5)
        for i, j in itertools.combinations(range(k), 2):
            combos = pats[:, i] * 2 + pats[:, j]
            counts = np.bincount(combos, minlength=4)
            assert len(set(counts)) == 1, (k, i, j, counts)
    # strength 3: every triple of columns sees all 8 combos equally often
    for k in (3, 4):
        pats = _symmetrization_patterns(3, k)
        for i, j, l in itertools.combinations(range(k), 3):
            combos = pats[:, i] * 4 + pats[:, j] * 2 + pats[:, l]
            counts = np.bincount(combos, minlength=8)
            assert len(set(counts)) == 1, (k, i, j, l, counts)
    with pytest.raises(ValueError):
        _symmetrization_patterns(7, 2)


def test_oa_symmetrization_balances_single_qubit_error():
    # strength-1 OA suffices to symmetrize independent single-qubit readout err
    qvm = QVM(seed=11)
    from forest_benchmarking_tpu.circuits import H as HG
    c = Circuit([HG(0)])
    c.define_noisy_readout(0, p00=1.0, p11=0.7)
    symm = qvm.run_symmetrized_readout(c, 40000, symm_type=1,
                                       meas_qubits=[0]).mean()
    assert abs(symm - 0.5) < 0.02


def test_expectation_with_out_of_register_qubits():
    """expectation() simulates the union of circuit/observable/requested
    qubits and returns the marginal, like run()/probabilities() (it used to
    KeyError on any circuit touching a qubit outside `qubits`)."""
    from forest_benchmarking_tpu.circuits import CZ, H as HG
    from forest_benchmarking_tpu.paulis import PauliTerm
    qvm = QVM()
    circ = Circuit([HG(0), CZ(0, 1)])
    # Z on qubit 0 of a (|00>+|11>)-like state after H/CZ: <Z0> = 0
    val = qvm.expectation(circ, [0], PauliTerm([(0, "Z")]))
    assert abs(val) < 1e-12
    # observable on a qubit the caller did not list also works
    val2 = qvm.expectation(circ, [0], PauliTerm([(1, "X")]))
    assert np.isfinite(val2)


def test_probabilities_jit_cache_reuses_compiled_fn(monkeypatch):
    """On accelerator backends, value-identical circuits must reuse one
    jitted program (a fresh lambda per call would recompile every time)."""
    from forest_benchmarking_tpu.circuits import H as HG
    qvm = QVM()
    monkeypatch.setattr(QVM, "_on_cpu", staticmethod(lambda: False))
    p1 = np.asarray(qvm.probabilities(Circuit([HG(0)]), [0]))
    p2 = np.asarray(qvm.probabilities(Circuit([HG(0)]), [0]))
    assert len(qvm._jit_cache) == 1
    np.testing.assert_allclose(p1, p2)
    qvm.probabilities(Circuit([HG(0), HG(0)]), [0])
    assert len(qvm._jit_cache) == 2


def test_symmetrized_readout_with_noisy_flip_gates(monkeypatch):
    """When the circuit defines a noise channel for X gates, the accelerator
    path must fall back to real per-pattern flip gates so the channel applies
    (the vmapped flip layer is ideal)."""
    from forest_benchmarking_tpu.circuits import X as XG
    # X gates suffer a strong bit-flip channel: each X is followed by a 40%
    # chance of another flip
    p = 0.4
    kraus = np.stack([np.sqrt(1 - p) * np.eye(2),
                      np.sqrt(p) * np.array([[0, 1], [1, 0]])]).astype(complex)
    def make_circ():
        c = Circuit([XG(0)])
        c.define_noisy_gate("X", None, kraus)
        return c
    qvm_cpu = QVM(seed=3)
    bits_cpu = qvm_cpu.run_symmetrized_readout(make_circ(), 20000,
                                               symm_type=-1, meas_qubits=[0])
    qvm_acc = QVM(seed=3)
    monkeypatch.setattr(QVM, "_on_cpu", staticmethod(lambda: False))
    bits_acc = qvm_acc.run_symmetrized_readout(make_circ(), 20000,
                                               symm_type=-1, meas_qubits=[0])
    # both paths: the prep X is noisy AND the pattern-1 flip X is noisy, so
    # the distributions must agree (they diverged before the fallback)
    assert abs(bits_cpu.mean() - bits_acc.mean()) < 0.02


def test_decoherence_kraus_drops_zero_operators():
    from forest_benchmarking_tpu.sim.density import decoherence_kraus
    # T1-only: both amplitude ops nonzero
    ks = decoherence_kraus(1e-6, t1=20e-6, t2=None)
    assert ks.shape[0] == 2
    # T2-only: the zero-gamma amplitude op and zero-dephasing products drop
    ks = decoherence_kraus(1e-6, t1=None, t2=15e-6)
    assert ks.shape[0] == 2
    # no decoherence at all: a single identity operator
    ks = decoherence_kraus(1e-6, t1=None, t2=None)
    assert ks.shape[0] == 1
    # T1+T2 composed: the D_dephase @ A_raise product is identically zero
    ks = decoherence_kraus(1e-6, t1=20e-6, t2=15e-6)
    assert ks.shape[0] == 3
    # every stack is trace preserving and has no all-zero operator
    for t1, t2 in [(20e-6, None), (None, 15e-6), (20e-6, 15e-6), (None, None)]:
        ks = decoherence_kraus(1e-6, t1, t2)
        tp = sum(k.conj().T @ k for k in ks)
        np.testing.assert_allclose(tp, np.eye(2), atol=1e-12)
        assert all(np.abs(k).max() > 0 for k in ks)


def test_qvm_jit_cache_dtype_key_and_lru():
    """The jit cache retraces on dtype changes and evicts least-recently-USED
    (a hit refreshes the entry), not first-inserted."""
    from forest_benchmarking_tpu.circuits import Circuit, X

    qvm = QVM(seed=0, dtype=jnp.complex64)
    circ = Circuit([X(0)])
    f1 = qvm._cached_jit(("probs", (0,)), circ, lambda: None)
    # same key -> cache hit
    assert qvm._cached_jit(("probs", (0,)), circ, lambda: None) is f1
    # dtype change -> different key, fresh program
    qvm.dtype = jnp.complex128
    f2 = qvm._cached_jit(("probs", (0,)), circ, lambda: None)
    assert f2 is not f1
    # LRU: touch f1's key again, then fill the cache; the untouched f2 entry
    # must be evicted first even though f1's was inserted earlier
    qvm.dtype = jnp.complex64
    assert qvm._cached_jit(("probs", (0,)), circ, lambda: None) is f1
    for i in range(254):
        qvm._cached_jit(("probs", (i + 1,)), circ, lambda: None)
    qvm._cached_jit(("probs", (999,)), circ, lambda: None)  # evicts one
    assert qvm._cached_jit(("probs", (0,)), circ, lambda: None) is f1
    qvm.dtype = jnp.complex128
    assert qvm._cached_jit(("probs", (0,)), circ, lambda: None) is not f2
