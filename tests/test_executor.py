"""Tests for the structure-keyed compiled executor (sim/executor.py).

The executor must produce exactly the same distributions as the eager QVM
paths — plans only repackage gate values as runtime arguments — and must
reuse compiled programs across circuits that share a structure.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from forest_benchmarking_tpu.circuits import (Circuit, Gate, RX, RY, RZ, CZ, H,
                                              CNOT, DELAY)
from forest_benchmarking_tpu.sim.qvm import QVM, _symmetrization_patterns
from forest_benchmarking_tpu.sim import executor


@pytest.fixture(autouse=True)
def fresh_cache():
    executor.clear_executor_cache()
    yield
    executor.clear_executor_cache()


def _plan_probs(circuit, qubits, dtype=jnp.complex128, **kw):
    plan = executor.build_plan(circuit, qubits, dtype, **kw)
    stacked, conf = plan.args()
    return np.asarray(plan.trace_probs(stacked, conf))


def test_plan_probs_match_eager_statevector():
    c = Circuit([H(0), CNOT(0, 1), RZ(0.3, 1), RY(-0.7, 0)])
    qvm = QVM(seed=3)
    expected = np.asarray(qvm._probs_impl(c, [0, 1]))
    assert np.allclose(_plan_probs(c, [0, 1]), expected, atol=1e-12)


def test_plan_probs_match_eager_with_marginalization():
    # measure a subset, in permuted order, with an extra untouched qubit
    c = Circuit([H(0), CNOT(0, 2), RX(0.4, 1)])
    qvm = QVM(seed=3)
    expected = np.asarray(qvm._probs_impl(c, [2, 0]))
    assert np.allclose(_plan_probs(c, [2, 0]), expected, atol=1e-12)


def test_plan_probs_match_eager_noisy():
    c = Circuit([H(0), CZ(0, 1)])
    kraus = np.stack([np.sqrt(0.9) * np.eye(2),
                      np.sqrt(0.1) * np.array([[0, 1], [1, 0]])]).astype(complex)
    c.define_noisy_gate("H", None, kraus)
    c.define_noisy_readout(0, p00=0.95, p11=0.85)
    qvm = QVM(seed=3)
    expected = np.asarray(qvm._probs_impl(c, [0, 1]))
    assert np.allclose(_plan_probs(c, [0, 1]), expected, atol=1e-12)


def test_plan_probs_match_eager_delay_decoherence():
    c = Circuit([RX(np.pi, 0), DELAY(10e-6, 0)])
    qvm = QVM(seed=3, t1s={0: 20e-6}, t2s={0: 15e-6})
    expected = np.asarray(qvm._probs_impl(c, [0]))
    got = _plan_probs(c, [0], t1s={0: 20e-6}, t2s={0: 15e-6})
    assert np.allclose(got, expected, atol=1e-12)


def test_cache_reuse_across_parameter_values():
    for theta in (0.1, 0.2, 0.3, 0.4):
        c = Circuit([RX(np.pi / 2, 0), RZ(theta, 0), RX(-np.pi / 2, 0)])
        plan = executor.build_plan(c, [0], jnp.complex128)
        executor.sample_bits(plan, 11, jax.random.PRNGKey(0))
    info = executor.executor_cache_info()
    assert info["misses"] == 1 and info["hits"] == 3


def test_cache_distinguishes_structures():
    c1 = Circuit([RX(0.1, 0)])
    c2 = Circuit([RX(0.1, 0), RZ(0.2, 0)])
    for c in (c1, c2, c1, c2):
        plan = executor.build_plan(c, [0], jnp.complex128)
        executor.sample_bits(plan, 7, jax.random.PRNGKey(1))
    info = executor.executor_cache_info()
    assert info["misses"] == 2 and info["hits"] == 2


def test_sample_bits_distribution():
    c = Circuit([RX(np.pi, 0)])  # deterministic |1>
    plan = executor.build_plan(c, [0, 1], jnp.complex128)
    bits = np.asarray(executor.sample_bits(plan, 64, jax.random.PRNGKey(2)))
    assert bits.shape == (64, 2)
    assert (bits[:, 0] == 1).all() and (bits[:, 1] == 0).all()


def test_symmetrized_flip_layer_matches_explicit_x_gates():
    """Per-pattern probs with the flip-layer argument must equal the probs of
    the circuit with explicit X gates appended (including under confusion)."""
    c = Circuit([RY(0.9, 0), CNOT(0, 1)])
    c.define_noisy_readout(0, p00=0.92, p11=0.84)
    c.define_noisy_readout(1, p00=0.97, p11=0.90)
    qubits = [0, 1]
    plan = executor.build_plan(c, qubits, jnp.complex128)
    stacked, conf = plan.args()
    patterns = _symmetrization_patterns(-1, 2)
    flip_pair = np.stack([executor._split_ri(executor._I_MAT, plan.fdtype),
                          executor._split_ri(executor._X_MAT, plan.fdtype)])
    qvm = QVM(seed=5)
    for flips in patterns:
        got = np.asarray(plan.trace_probs(stacked, conf,
                                          jnp.asarray(flip_pair[flips])))
        flipped = c.copy()
        for q, f in zip(qubits, flips):
            if f:
                flipped += Gate("X", (), (q,))
        expected = np.asarray(qvm._probs_impl(flipped, qubits))
        assert np.allclose(got, expected, atol=1e-12), flips


def test_symmetrized_sampler_shape_and_xor():
    c = Circuit([RX(np.pi, 0)])  # |1>: exhaustive patterns must all report 1
    plan = executor.build_plan(c, [0], jnp.complex128)
    patterns = _symmetrization_patterns(-1, 1)
    bits = np.asarray(executor.sample_bits_symmetrized(
        plan, patterns, 33, jax.random.PRNGKey(4)))
    assert bits.shape == (2, 33, 1)
    assert (bits == 1).all()
