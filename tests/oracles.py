"""Independent numpy re-derivations of the reference estimator algorithms.

These serve as parity oracles: they follow the published algorithms ([DIMLE1],
[PGD] with Dykstra) in plain numpy, written from the math (not translated from
our JAX kernels), so agreement to ~1e-8 on identical inputs is strong evidence
both implement the reference semantics.
"""
import numpy as np


def np_proj_cp(c):
    h = (c + c.conj().T) / 2
    w, v = np.linalg.eigh(h)
    w = np.clip(w, 0, None)
    return (v * w) @ v.conj().T


def np_proj_tp(c):
    dim = int(np.sqrt(c.shape[0]))
    pt = np.trace(c.reshape(dim, dim, dim, dim), axis1=1, axis2=3)
    return c - np.kron((pt - np.eye(dim)) / dim, np.eye(dim))


def np_proj_tni(c):
    dim = int(np.sqrt(c.shape[0]))
    pt = np.trace(c.reshape(dim, dim, dim, dim), axis1=1, axis2=3)
    h = (pt + pt.conj().T) / 2
    w, v = np.linalg.eigh(h)
    w = np.minimum(w, 1)
    proj = (v * w) @ v.conj().T
    return c - np.kron((pt - proj) / dim, np.eye(dim))


def np_proj_physical(choi, make_tp=True, tol=1e-4):
    """Dykstra's alternating projections with the Birgin stopping criterion."""
    old_cp = np.zeros_like(choi)
    old_tp = np.zeros_like(choi)
    last_cp_proj = np.zeros_like(choi)
    last = choi
    while True:
        pre_cp = last - old_cp
        cp_proj = np_proj_cp(pre_cp)
        new_cp = cp_proj - pre_cp
        pre_tp = cp_proj - old_tp
        new = np_proj_tp(pre_tp) if make_tp else np_proj_tni(pre_tp)
        new_tp = new - pre_tp
        crit = (np.linalg.norm(new_cp - old_cp) ** 2
                + np.linalg.norm(new_tp - old_tp) ** 2
                + 2 * abs(np.vdot(old_tp, new - last))
                + 2 * abs(np.vdot(old_cp, cp_proj - last_cp_proj)))
        if crit < tol:
            return new
        old_cp, old_tp, last_cp_proj, last = new_cp, new_tp, cp_proj, new


def np_mle_state(obs_mats, expectations, epsilon=0.1, tol=1e-9, maxiter=10000):
    """Diluted MLE [DIMLE1]: rho <- U rho U / tr, U = I + eps (R(rho) - I)."""
    s, d, _ = obs_mats.shape
    tiny = np.finfo(float).tiny
    eye = np.eye(d)
    rho = eye / d
    for _ in range(maxiter):
        update = np.zeros((d, d), dtype=complex)
        for p_mat, e in zip(obs_mats, expectations):
            pred = np.trace(p_mat @ rho)
            for sign in (1, -1):
                f = (1 + sign * e) / 2
                pr = (1 + sign * pred) / 2
                pi = (eye + sign * p_mat) / 2
                update += f / (pr + tiny) * pi
        r = update / s
        u = eye + epsilon * (r - eye)
        new_rho = u @ rho @ u
        new_rho = new_rho / np.trace(new_rho)
        if np.linalg.norm(new_rho - rho) < tol:
            return new_rho
        rho = new_rho
    return rho


def np_pgdb(a, n, dim, trace_preserving=True, stop_tol=1e-10):
    """PGD with backtracking [PGD]: est0 = I/d, mu = 3/(2 d^2), gamma = 0.3."""
    def npvec(m):
        return m.T.reshape(-1)

    def npunvec(v):
        d2 = int(np.sqrt(v.size))
        return v.reshape(d2, d2).T

    def cost(est):
        p = np.clip(np.real(a @ npvec(est)), 1e-6, None)
        return -np.sum(n * np.log(p))

    def grad(est):
        p = np.clip(np.real(a @ npvec(est)), 1e-6, None)
        return npunvec(-(a.conj().T @ (n / p)))

    est = np.eye(dim * dim, dtype=complex) / dim
    old_cost = cost(est)
    mu = 3 / (2 * dim ** 2)
    gamma = 0.3
    while True:
        g = grad(est)
        update = np_proj_physical(est - g / mu, trace_preserving) - est
        alpha = 1.0
        change = gamma * np.real(np.vdot(update, g))
        new_cost = cost(est + alpha * update)
        while new_cost > old_cost + change:
            alpha *= 0.5
            change *= 0.5
            new_cost = cost(est + alpha * update)
            if alpha < 1e-15:
                break
        est = est + alpha * update
        if old_cost - new_cost < stop_tol:
            return est
        old_cost = new_cost


def wfn_estimate_observables(qvm, expt, qubits):
    """Shot-free analytic path: exact expectations, std_err = 0.

    Mirrors the reference test helper (test_process_tomography.py:17).
    """
    from forest_benchmarking_tpu.observable_estimation import (
        ExperimentResult, generate_experiment_programs, _max_weight_state,
        _one_q_state_prep)
    from forest_benchmarking_tpu.circuits import Circuit
    results = []
    for settings in expt:
        prep = Circuit()
        mws = _max_weight_state(s.in_state for s in settings)
        for oneq in mws.states:
            prep += _one_q_state_prep(oneq)
        circuit = prep + expt.program
        for setting in settings:
            e = qvm.expectation(circuit, qubits, setting.observable)
            results.append(ExperimentResult(setting=setting, expectation=e,
                                            std_err=0.0, total_counts=10000))
    return results
