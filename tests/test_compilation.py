"""basic_compile: every decomposition must equal the original up to global phase."""
import numpy as np
import pytest

from forest_benchmarking_tpu.circuits import (
    Circuit, Gate, H, X, Y, Z, T, S, RX, RY, RZ, CNOT, CZ, SWAP, CCNOT, XY, I)
from forest_benchmarking_tpu.compilation import (
    basic_compile, match_global_phase, is_magic_angle)
from forest_benchmarking_tpu.sim import run_statevector


def unitary_of(circuit, qubits):
    """Build the unitary by simulating all basis inputs."""
    n = len(qubits)
    cols = []
    for i in range(2 ** n):
        prep = Circuit([X(qubits[j]) for j in range(n) if (i >> (n - 1 - j)) & 1])
        psi = np.asarray(run_statevector(prep + circuit, qubits))
        cols.append(psi)
    return np.stack(cols, axis=1)


def assert_same_up_to_phase(c1, c2, qubits):
    u1 = unitary_of(c1, qubits)
    u2 = unitary_of(c2, qubits)
    a, b = match_global_phase(u1, u2)
    assert np.max(np.abs(a - b)) < 1e-10


@pytest.mark.parametrize("circuit,qubits", [
    (Circuit([H(0)]), [0]),
    (Circuit([X(0)]), [0]),
    (Circuit([T(0)]), [0]),
    (Circuit([T(0).dag()]), [0]),
    (Circuit([RY(0.43, 0)]), [0]),
    (Circuit([RX(0.2, 0)]), [0]),      # non-magic angle
    (Circuit([RX(np.pi / 2, 0)]), [0]),
    (Circuit([RZ(1.2, 0)]), [0]),
    (Circuit([CNOT(0, 1)]), [0, 1]),
    (Circuit([SWAP(0, 1)]), [0, 1]),
    (Circuit([CZ(0, 1)]), [0, 1]),
    (Circuit([XY(0.77, 0, 1)]), [0, 1]),
    (Circuit([CCNOT(0, 1, 2)]), [0, 1, 2]),
    (Circuit([H(0), CNOT(0, 1), RY(0.3, 1), T(0)]), [0, 1]),
])
def test_basic_compile_preserves_unitary(circuit, qubits):
    compiled = basic_compile(circuit)
    assert_same_up_to_phase(circuit, compiled, qubits)


def test_compiled_gates_are_native():
    c = Circuit([H(0), CNOT(0, 1), RY(0.3, 1), CCNOT(0, 1, 2), SWAP(1, 2)])
    compiled = basic_compile(c)
    for g in compiled.gates:
        assert g.name in ("RX", "RZ", "CZ", "XY", "I"), g
        if g.name == "RX":
            assert is_magic_angle(g.params[0])


def test_dagger_angle_folding():
    c = Circuit([RZ(0.3, 0).dag()])
    compiled = basic_compile(c)
    assert compiled.gates[0].params[0] == -0.3
    assert not compiled.gates[0].dagger


def test_custom_matrix_passthrough():
    mat = np.eye(2)
    g = Gate("CUSTOM", (), (0,), matrix=tuple(map(tuple, mat.astype(complex))))
    compiled = basic_compile(Circuit([g]))
    assert compiled.gates[0].name == "CUSTOM"


def test_unknown_gate_raises():
    with pytest.raises(ValueError):
        basic_compile(Circuit([Gate("FOO", (), (0,))]))


def test_is_magic_angle():
    assert is_magic_angle(np.pi / 2)
    assert is_magic_angle(-np.pi)
    assert is_magic_angle(0.0)
    assert not is_magic_angle(0.3)


def test_basic_compile_preserves_noise_annotated_gates():
    """A gate carrying a define_noisy_gate channel must NOT be decomposed:
    renaming it severs the Kraus annotation, silently simulating the
    noiseless circuit (caught in the process-tomography notebook, where the
    'noisy' RY tomographed as ideal)."""
    import jax.numpy as jnp
    from forest_benchmarking_tpu.circuits import Circuit, RY
    from forest_benchmarking_tpu.sim.noise import damping_kraus_map
    from forest_benchmarking_tpu.sim.density import run_density_matrix

    noisy = Circuit([RY(0.6, 0)])
    noisy.define_noisy_gate("RY", (0,), damping_kraus_map(0.3))
    compiled = basic_compile(noisy)
    assert any(g.name == "RY" for g in compiled.gates)
    rho_orig = np.asarray(run_density_matrix(noisy, [0], jnp.complex128))
    rho_comp = np.asarray(run_density_matrix(compiled, [0], jnp.complex128))
    np.testing.assert_allclose(rho_comp, rho_orig, atol=1e-12)
    # gates without annotations still decompose
    plain = basic_compile(Circuit([RY(0.6, 0)]))
    assert all(g.name in ("RX", "RZ") for g in plain.gates)
