"""Distance measure tests: hand calculations, known channels, diamond norm."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

import forest_benchmarking_tpu.distance_measures as dm
from forest_benchmarking_tpu.ops import (
    kraus2choi, kraus2pauli_liouville, ginibre_state_matrix, haar_rand_state,
)
from forest_benchmarking_tpu.utils import I_MAT, X_MAT, Y_MAT, Z_MAT

ZERO = np.array([[1, 0], [0, 0]], dtype=complex)
ONE = np.array([[0, 0], [0, 1]], dtype=complex)
PLUS = np.array([[0.5, 0.5], [0.5, 0.5]], dtype=complex)
MIXED = np.eye(2, dtype=complex) / 2


def depolarizing_kraus(p):
    return [np.sqrt(1 - 3 * p / 4) * I_MAT] + \
           [np.sqrt(p / 4) * P for P in (X_MAT, Y_MAT, Z_MAT)]


def test_purity():
    assert np.isclose(dm.purity(jnp.asarray(ZERO)), 1.0)
    assert np.isclose(dm.purity(jnp.asarray(MIXED)), 0.5)
    assert np.isclose(dm.purity(jnp.asarray(MIXED), dim_renorm=True), 0.0)
    assert np.isclose(dm.impurity(jnp.asarray(MIXED)), 0.5)
    assert np.isclose(dm.impurity(jnp.asarray(ZERO), dim_renorm=True), 0.0)


def test_fidelity_pure_states():
    assert np.isclose(dm.fidelity(jnp.asarray(ZERO), jnp.asarray(ZERO)), 1.0)
    assert np.isclose(dm.fidelity(jnp.asarray(ZERO), jnp.asarray(ONE)), 0.0, atol=1e-10)
    # |<0|+>|^2 = 1/2
    assert np.isclose(dm.fidelity(jnp.asarray(ZERO), jnp.asarray(PLUS)), 0.5, atol=1e-10)
    assert np.isclose(dm.infidelity(jnp.asarray(ZERO), jnp.asarray(PLUS)), 0.5, atol=1e-10)


def test_fidelity_mixed():
    # F(rho, I/2) = tr(sqrt(rho)/sqrt(2))^2 ; for rho = diag(p, 1-p)
    p = 0.8
    rho = np.diag([p, 1 - p]).astype(complex)
    expected = (np.sqrt(p / 2) + np.sqrt((1 - p) / 2)) ** 2
    assert np.isclose(dm.fidelity(jnp.asarray(rho), jnp.asarray(MIXED)), expected, atol=1e-10)


def test_trace_distance_textbook():
    # orthogonal pure states have trace distance 1 (Schatten-1 definition;
    # the reference's induced-norm quirk would give 0.5 here)
    assert np.isclose(dm.trace_distance(jnp.asarray(ZERO), jnp.asarray(ONE)), 1.0)
    assert np.isclose(dm.trace_distance(jnp.asarray(ZERO), jnp.asarray(ZERO)), 0.0)
    # T(|0>, |+>) = sqrt(1 - |<0|+>|^2) = 1/sqrt(2)
    assert np.isclose(dm.trace_distance(jnp.asarray(ZERO), jnp.asarray(PLUS)),
                      1 / np.sqrt(2), atol=1e-10)


def test_bures():
    f = 0.5
    expected_dist = np.sqrt(2 * (1 - np.sqrt(f)))
    assert np.isclose(dm.bures_distance(jnp.asarray(ZERO), jnp.asarray(PLUS)),
                      expected_dist, atol=1e-8)
    assert np.isclose(dm.bures_angle(jnp.asarray(ZERO), jnp.asarray(PLUS)),
                      np.arccos(np.sqrt(f)), atol=1e-8)


def test_quantum_chernoff_bound():
    # for commuting states QCB = min_s sum p_i^s q_i^(1-s)
    rho = np.diag([0.9, 0.1]).astype(complex)
    sigma = np.diag([0.4, 0.6]).astype(complex)
    qcb, s_opt = dm.quantum_chernoff_bound(jnp.asarray(rho), jnp.asarray(sigma))
    ss = np.linspace(0, 1, 100001)
    vals = (0.9 ** ss) * (0.4 ** (1 - ss)) + (0.1 ** ss) * (0.6 ** (1 - ss))
    assert np.isclose(float(qcb), vals.min(), atol=1e-6)
    # identical states: QCB = 1
    qcb2, _ = dm.quantum_chernoff_bound(jnp.asarray(rho), jnp.asarray(rho))
    assert np.isclose(float(qcb2), 1.0, atol=1e-9)


def test_hs_ip_and_smith():
    assert np.isclose(dm.hilbert_schmidt_ip(jnp.asarray(X_MAT), jnp.asarray(X_MAT)), 2.0)
    assert np.isclose(dm.hilbert_schmidt_ip(jnp.asarray(X_MAT), jnp.asarray(Y_MAT)), 0.0)
    f = dm.fidelity(jnp.asarray(ZERO), jnp.asarray(PLUS))
    assert np.isclose(dm.smith_fidelity(jnp.asarray(ZERO), jnp.asarray(PLUS), 1.5),
                      np.sqrt(f) ** 1.5)
    with pytest.raises(ValueError):
        dm.smith_fidelity(jnp.asarray(ZERO), jnp.asarray(PLUS), 2.5)


def test_tvd():
    p = jnp.array([0.5, 0.5])
    q = jnp.array([1.0, 0.0])
    assert np.isclose(dm.total_variation_distance(p, q), 0.5)
    # reference-style column vectors
    assert np.isclose(dm.total_variation_distance(p[:, None], q[:, None]), 0.5)


def test_process_fidelities():
    pl_i = kraus2pauli_liouville(jnp.asarray(I_MAT))
    pl_x = kraus2pauli_liouville(jnp.asarray(X_MAT))
    assert np.isclose(dm.entanglement_fidelity(pl_i, pl_i), 1.0)
    assert np.isclose(dm.process_fidelity(pl_i, pl_i), 1.0)
    # identity vs X: PTM diag(1,1,-1,-1) -> Tr = 0 -> Fe = 0, Fproc = 1/3
    assert np.isclose(dm.entanglement_fidelity(pl_i, pl_x), 0.0)
    assert np.isclose(dm.process_fidelity(pl_i, pl_x), 1.0 / 3.0)
    assert np.isclose(dm.process_infidelity(pl_i, pl_x), 2.0 / 3.0)


def test_process_fidelity_depolarizing():
    # avg gate fidelity of depolarizing(p) vs identity = 1 - p/2 for qubits
    p = 0.2
    pl_i = kraus2pauli_liouville(jnp.asarray(I_MAT))
    pl_d = kraus2pauli_liouville(depolarizing_kraus(p))
    assert np.isclose(dm.process_fidelity(pl_i, pl_d), 1 - p / 2, atol=1e-10)


def test_watrous_bounds():
    choi = kraus2choi(jnp.asarray(I_MAT))
    lower, upper = dm.watrous_bounds(choi)
    assert float(lower) <= 4 * float(lower) + 1e-9
    assert np.isclose(float(upper), 4 * float(lower))


@pytest.mark.slow
def test_diamond_norm_identity_vs_depolarizing():
    # known: ||I - Dep_p||_diamond = 3p/2 for a qubit (p = depolarizing prob)
    p = 0.3
    choi_i = kraus2choi(jnp.asarray(I_MAT))
    choi_d = kraus2choi(depolarizing_kraus(p))
    dn = float(dm.diamond_norm_distance(choi_i, choi_d))
    assert np.isclose(dn, 3 * p / 2, atol=5e-3), dn


@pytest.mark.slow
def test_diamond_norm_unitaries():
    # for single-qubit Z-rotations: ||I - RZ(theta)||_dia = 2 |sin(theta/2)|
    theta = 0.7
    rz = np.diag([1.0, np.exp(1j * theta)])
    choi_i = kraus2choi(jnp.asarray(I_MAT))
    choi_rz = kraus2choi(jnp.asarray(rz))
    dn = float(dm.diamond_norm_distance(choi_i, choi_rz))
    assert np.isclose(dn, 2 * abs(np.sin(theta / 2)), atol=5e-3), dn


@pytest.mark.slow
def test_diamond_norm_orthogonal_unitaries():
    choi_i = kraus2choi(jnp.asarray(I_MAT))
    choi_x = kraus2choi(jnp.asarray(X_MAT))
    dn = float(dm.diamond_norm_distance(choi_i, choi_x))
    assert np.isclose(dn, 2.0, atol=1e-2), dn


def test_batched_state_measures():
    key = jax.random.PRNGKey(0)
    rhos = ginibre_state_matrix(key, 2, 2, batch=(7,))
    sigmas = ginibre_state_matrix(jax.random.PRNGKey(1), 2, 2, batch=(7,))
    fb = np.asarray(dm.fidelity(rhos, sigmas))
    fl = np.array([float(dm.fidelity(r, s)) for r, s in zip(rhos, sigmas)])
    assert np.allclose(fb, fl, atol=1e-10)
    tb = np.asarray(dm.trace_distance(rhos, sigmas))
    tl = np.array([float(dm.trace_distance(r, s)) for r, s in zip(rhos, sigmas)])
    assert np.allclose(tb, tl, atol=1e-10)


@pytest.mark.slow
def test_diamond_norm_2q_cphase():
    # 2Q unitaries I vs CPHASE(theta): eigenvalues of U^dag V are {1,1,1,e^it};
    # diamond distance = 2 sin(theta/2) (hull distance formula for unitaries)
    from forest_benchmarking_tpu.circuits import gate_matrix
    theta = 1.1
    u = np.eye(4, dtype=complex)
    v = gate_matrix("CPHASE", (theta,))
    dn = float(dm.diamond_norm_distance(kraus2choi(jnp.asarray(u)[None]),
                                        kraus2choi(jnp.asarray(v)[None]),
                                        num_iters=600))
    assert np.isclose(dn, 2 * np.sin(theta / 2), atol=2e-2), dn


def _replacer_choi(vec):
    """Choi of E(rho) = tr(rho) |v><v| (Kraus {|v><j|})."""
    d = len(vec)
    kraus = np.stack([np.outer(vec, e) for e in np.eye(d)])
    return kraus2choi(jnp.asarray(kraus))


@pytest.mark.parametrize("d", [2, 4])
def test_diamond_norm_asymmetric_replacer_channels(d):
    """Replace-with-|0> vs replace-with-|d-1>: perfectly distinguishable, so
    the diamond distance is exactly 2. These channels are NOT transpose
    covariant, so they catch the sqrt(rho) lift landing on the wrong Choi
    factor (the output-factor variant returns 2d here), which the unitary/
    depolarizing cases cannot detect."""
    e = np.eye(d, dtype=complex)
    dn = float(dm.diamond_norm_distance(_replacer_choi(e[0]),
                                        _replacer_choi(e[d - 1])))
    assert np.isclose(dn, 2.0, atol=1e-6), dn


def test_diamond_norm_random_pairs_respect_bounds():
    """For random CPTP pairs: ||J||_tr / d <= dnorm <= 2 must hold; the
    pre-fix output-factor lift violated the upper bound on d=4 pairs."""
    from forest_benchmarking_tpu.ops import rand_map_with_BCSZ_dist
    for seed in range(4):
        k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
        d = [2, 4][seed % 2]
        a = rand_map_with_BCSZ_dist(k1, d, kraus_rank=2, dtype=jnp.complex128)
        b = rand_map_with_BCSZ_dist(k2, d, kraus_rank=2, dtype=jnp.complex128)
        dn = float(dm.diamond_norm_distance(a, b))
        j = np.asarray(a - b)
        lb = np.abs(np.linalg.eigvalsh(j)).sum() / d
        assert lb - 1e-6 <= dn <= 2 + 1e-6, (seed, dn, lb)
