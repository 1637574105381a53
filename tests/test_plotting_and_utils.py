"""Smoke tests for plotting (figures render without error) + utils helpers."""
import matplotlib
matplotlib.use("Agg")  # noqa: E402

import matplotlib.pyplot as plt
import numpy as np
import pytest

from forest_benchmarking_tpu.plotting import (
    hinton, hinton_real, plot_pauli_rep_of_state, plot_pauli_bar_rep_of_state,
    plot_pauli_transfer_matrix, plot_figure_for_fit)
from forest_benchmarking_tpu.utils import (
    bit_array_to_int, int_to_bit_array, bit_arrays_to_ints, ints_to_bit_arrays,
    is_pos_pow_two, bloch_vector_to_standard_basis,
    standard_basis_to_bloch_vector, n_qubit_pauli_basis, pauli_basis_matrices,
    pauli_label_strings, prepare_state_on_bloch_sphere, local_pauli_eig_prep,
    local_pauli_eigs_prep, random_local_pauli_eig_prep, local_pauli_eig_meas,
    prepare_prod_pauli_eigenstate, measure_prod_pauli_eigenstate,
    bitstring_prep, parameterized_bitstring_prep, metadata_save,
    transform_pauli_moments_to_bit, transform_bit_moments_to_pauli,
    OperatorBasis, PAULI_BASIS)
from forest_benchmarking_tpu.paulis import str_to_pauli_term
from forest_benchmarking_tpu.sim import QVM
from forest_benchmarking_tpu.circuits import Circuit


def test_bit_conversions():
    assert bit_array_to_int([1, 0, 1]) == 5
    assert int_to_bit_array(5, 3) == [1, 0, 1]
    assert int_to_bit_array(5, 5) == [0, 0, 1, 0, 1]
    arrs = np.array([[1, 0], [0, 1], [1, 1]])
    assert list(bit_arrays_to_ints(arrs)) == [2, 1, 3]
    assert np.array_equal(ints_to_bit_arrays(np.array([2, 1, 3]), 2), arrs)


def test_is_pos_pow_two():
    assert is_pos_pow_two(1) and is_pos_pow_two(8)
    assert not is_pos_pow_two(0) and not is_pos_pow_two(6)
    assert not is_pos_pow_two(-4)


def test_bloch_conversions_round_trip():
    theta, phi = 1.1, 0.7
    a, b = bloch_vector_to_standard_basis(theta, phi)
    theta2, phi2 = standard_basis_to_bloch_vector([a, b])
    assert np.isclose(theta, theta2) and np.isclose(phi, phi2)


def test_moment_transforms_invert():
    m, v = transform_pauli_moments_to_bit(0.4, 0.01)
    m2, v2 = transform_bit_moments_to_pauli(m, v)
    assert np.isclose(m2, 0.4) and np.isclose(v2, 0.01)


def test_pauli_basis_structure():
    basis = n_qubit_pauli_basis(2)
    assert basis.dim == 16
    assert basis.labels[0] == "II" and basis.labels[-1] == "ZZ"
    mats = pauli_basis_matrices(2)
    assert mats.shape == (16, 4, 4)
    assert pauli_label_strings(2)[1] == "IX"
    # orthogonality: tr(P_i P_j) = d delta_ij
    grams = np.einsum("nij,mji->nm", mats, mats)
    assert np.allclose(grams, 4 * np.eye(16))


def test_operator_basis_errors():
    with pytest.raises(TypeError):
        PAULI_BASIS ** 1.5
    with pytest.raises(ValueError):
        PAULI_BASIS ** 0


def test_prep_helpers_produce_correct_states():
    qvm = QVM(seed=1)
    # bloch sphere prep at (theta, phi)
    theta, phi = 0.9, 0.4
    prog = prepare_state_on_bloch_sphere(0, theta, phi)
    a, b = bloch_vector_to_standard_basis(theta, phi)
    psi = np.asarray(qvm.wavefunction(prog, [0]))
    overlap = abs(np.conj([a, b]) @ psi)
    assert np.isclose(overlap, 1.0, atol=1e-10)
    # pauli eig preps: <P> = +1
    for op in "XYZ":
        prog = local_pauli_eig_prep(op, 0)
        assert np.isclose(qvm.expectation(prog, [0],
                                          str_to_pauli_term(op, [0])), 1.0)
        both = local_pauli_eigs_prep(op, 0)
        vals = [qvm.expectation(p, [0], str_to_pauli_term(op, [0]))
                for p in both]
        assert np.allclose(sorted(vals), [-1.0, 1.0], atol=1e-10)
    # prep + meas rotation: measuring prod eigenstate in its basis gives |0..0>
    term = str_to_pauli_term("XY", [0, 1])
    prog = prepare_prod_pauli_eigenstate(term) + measure_prod_pauli_eigenstate(term)
    bits = qvm.run(prog, [0, 1], 100)
    assert np.all(bits == 0)


def test_random_local_pauli_eig_prep():
    rng = np.random.RandomState(0)
    c = Circuit()
    descr = random_local_pauli_eig_prep(c, "X", 0, rng=rng)
    assert descr in ("+X", "-X")
    assert len(c.gates) == 1


def test_bitstring_preps():
    qvm = QVM(seed=2)
    for prep_fn in (bitstring_prep, parameterized_bitstring_prep):
        prog = prep_fn([0, 1, 2], [1, 0, 1])
        bits = qvm.run(prog, [0, 1, 2], 50)
        assert np.all(bits == [1, 0, 1]), prep_fn.__name__


def test_metadata_save(tmp_path):
    qvm = QVM(seed=3)
    df = metadata_save(qvm, repo_path="/root/repo",
                       filename=str(tmp_path / "meta.json"))
    assert df["Device_name"][0] == qvm.name
    assert df["Git_commit"][0]


# ------------------------------- plotting ------------------------------------

def test_hinton_plots():
    rho = np.array([[0.5, 0.5j], [-0.5j, 0.5]])
    ax = hinton(rho)
    plt.close("all")
    fig, ax = hinton_real(np.real(rho), xlabels=["0", "1"], ylabels=["0", "1"],
                          title="test")
    plt.close("all")


def test_state_process_plots():
    fig, ax = plt.subplots(1)
    state_pl = np.array([[1 / np.sqrt(2)], [0], [0], [1 / np.sqrt(2)]])
    plot_pauli_rep_of_state(state_pl, ax, ["I", "X", "Y", "Z"], "zero state")
    plt.close("all")
    fig, ax = plt.subplots(1)
    plot_pauli_bar_rep_of_state(state_pl.ravel()[:, None].T, ax,
                                ["I", "X", "Y", "Z"], "zero state")
    plt.close("all")
    fig, ax = plt.subplots(1)
    plot_pauli_transfer_matrix(np.eye(4), ax)
    plt.close("all")
    with pytest.raises(ValueError):
        plot_pauli_rep_of_state(state_pl.ravel(), ax, list("IXYZ"), "bad")
    with pytest.raises(ValueError):
        plot_pauli_rep_of_state(state_pl.astype(complex) * 1j, ax,
                                list("IXYZ"), "bad")


def test_plot_figure_for_fit():
    from forest_benchmarking_tpu.analysis.fitting import (
        fit_base_param_decay, base_param_decay)
    x = np.arange(1, 20)
    y = base_param_decay(x, 0.5, 0.9, 0.5)
    fit = fit_base_param_decay(x, y)
    fig, axs = plot_figure_for_fit(fit, xlabel="depth", ylabel="survival")
    plt.close("all")


def test_pack_shot_data_roundtrip():
    from forest_benchmarking_tpu.utils import pack_shot_data
    rng = np.random.RandomState(3)
    shots = rng.randint(0, 2, size=(50, 11))
    packed = pack_shot_data(shots)
    assert packed.shape == (50, 2)  # ceil(11/8) bytes per shot
    unpacked = np.unpackbits(packed, axis=1)[:, :11]
    assert np.array_equal(unpacked, shots)


def test_prepare_random_prod_pauli_eigenstate():
    from forest_benchmarking_tpu.utils import (
        prepare_random_prod_pauli_eigenstate)
    term = str_to_pauli_term("XZ", [0, 1])
    qvm = QVM(seed=4)
    rng = np.random.RandomState(5)
    # every sampled circuit prepares a +/-1 product eigenstate: measuring
    # each factor in its own basis gives a deterministic outcome
    seen = set()
    for _ in range(8):
        prog = prepare_random_prod_pauli_eigenstate(term, rng=rng)
        ex = qvm.expectation(prog, [0, 1], term)
        assert np.isclose(abs(ex), 1.0, atol=1e-10)
        seen.add(round(float(ex)))
    assert seen == {-1, 1}  # both signs appear across draws


def test_pauli_strictness_guards():
    """Silent-wrong-answer inputs now raise: duplicate qubits in a factor
    list, length-mismatched string/labels, and factors outside the qubit
    list of pauli_term_to_matrix (pyquil raises in all three cases)."""
    from forest_benchmarking_tpu.paulis import (PauliTerm, str_to_pauli_term,
                                                pauli_term_to_matrix, sX, sY)
    with pytest.raises(ValueError, match="Duplicate"):
        PauliTerm.from_list([("X", 0), ("Y", 0)])
    with pytest.raises(ValueError, match="labels"):
        str_to_pauli_term("XYZ", [0, 1])
    with pytest.raises(ValueError, match="outside"):
        pauli_term_to_matrix(sX(0) * sY(5), [0, 1])


def test_circuit_equality_includes_noise_annotations():
    from forest_benchmarking_tpu.circuits import Circuit, X
    kraus = np.stack([np.sqrt(0.9) * np.eye(2),
                      np.sqrt(0.1) * np.array([[0, 1], [1, 0]])]).astype(complex)
    c1 = Circuit([X(0)])
    c2 = Circuit([X(0)])
    assert c1 == c2
    c2.define_noisy_gate("X", None, kraus)
    assert c1 != c2
    c3 = Circuit([X(0)])
    c3.define_noisy_readout(0, p00=0.95, p11=0.9)
    assert c1 != c3
