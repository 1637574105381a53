"""Fused lanes-layout diamond-norm solver.

Solves the Watrous SDP (the same program as the reference's cvxpy code,
forest/benchmarking/distance_measures.py:378-433)

    dnorm(J) = 2 max_rho  sum of positive eigenvalues of
               (sqrt(rho) (x) I)^dag J (sqrt(rho) (x) I)

by Adam ascent over an unconstrained square-root factor A (rho = SS^dag,
S = A/||A||_F) — the same outer concave maximization as
:func:`forest_benchmarking_tpu.distance_measures.diamond_norm_distance` —
but with the whole iteration expressed on the (n, n, B) "lanes" planes
layout of :mod:`forest_benchmarking_tpu.ops.lanes_apg`:

- The per-step Hermitian eigendecomposition of M = (S (x) I)^dag J (S (x) I)
  (n = dim^2, 16 for 2Q channels) uses the **warm-carried Jacobi eigenbasis**:
  consecutive Adam iterates are close, so one cyclic sweep from the previous
  basis re-diagonalizes M, instead of XLA's QDWH ``eigvalsh`` (which costs
  ~50 n x n matmuls per call on TPU) plus its autodiff machinery.
- The gradient is **hand-derived** (no autodiff): with P the projector onto
  M's positive eigenspace, df = tr(P dM) gives the Wirtinger gradient

      g = (2/nu) G_S - (2 c / nu^3) A,   nu = ||A||_F,
      G_S[u, v] = sum_a (J L V H V^dag)[(u, a), (v, a)],
      c = Re sum conj(A) * G_S,

  (L = S (x) I, H = diag(1[w > 0])) — three n x n lane-plane matmuls per
  step, all elementwise VPU broadcasts over the batch. Validated exactly
  (1e-15) against ``jax.grad`` of the dense objective.
- Because the outer problem is concave and the objective is stationary at
  the optimum, the **final value error is second order** in the rho error,
  so a short fixed Adam schedule with 1-sweep (inexact) eigenbases plus one
  accurate final evaluation (``final_sweeps``) reaches the same accuracy as
  the converged dense path — the identical inexact-phases/accurate-tail
  design as the fused APG tomography solver.

The entry point :func:`dnorm_fused` is pure jnp and runs under plain XLA on
any backend; :func:`forest_benchmarking_tpu.distance_measures.
diamond_norm_distance` routes to :func:`dnorm_planes` by default
(``method="auto"``) on non-CPU backends for dim <= 4. Measured (v5e, 2Q
BCSZ pairs, incl. generation): 8.7k dnorms/s at batch 1024, 7.9-8.8k at
2048 through the public API with the cold final evaluation (the dense
eigh/autodiff path: ~1.9k); f32-on-chip error vs converged f64 gold
3.3e-6 max (9.8e-6 before the cold final evaluation); f64 error vs an
800-iter dense gold 4.9e-7 max at ``num_iters=96``.

The 1Q (dim=2) path additionally needs the small-n permutation fence in
:func:`forest_benchmarking_tpu.ops.lanes_apg._multi_sweep`: XLA:TPU
miscompiles the n=4 slice-concat pair-layout permutation when fused with
the rotation math (verified on-chip: dnorm(I, X) returned 3.85 instead
of 2.0 before the fence; exact after).
"""
from __future__ import annotations

import functools
from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp

from .lanes_apg import (_cmm, _cmm_hconj_left, _eye_planes, _hermitianize,
                        _multi_sweep)

__all__ = ["dnorm_fused", "dnorm_planes", "dnorm_fused_sharded"]


def _lift_apply(sr, si, vr, vi, dim):
    """W = (S (x) I) @ V on planes: W[(l, b), w] = sum_j S[l, j] V[(j, b), w].

    S planes are (dim, dim, B); V planes are (n, n, B), n = dim^2. Unrolled
    over the small (l, b, j) indices; every op is a lane-wise FMA.
    """
    rows_r, rows_i = [], []
    for l in range(dim):
        for b in range(dim):
            rr = ri = None
            for j in range(dim):
                skr, ski = sr[l, j], si[l, j]          # (B,)
                vjr, vji = vr[j * dim + b], vi[j * dim + b]  # (n, B)
                tr_ = skr * vjr - ski * vji
                ti_ = skr * vji + ski * vjr
                rr = tr_ if rr is None else rr + tr_
                ri = ti_ if ri is None else ri + ti_
            rows_r.append(rr)
            rows_i.append(ri)
    return jnp.stack(rows_r, axis=0), jnp.stack(rows_i, axis=0)


def _grad_s(xr, xi, vr, vi, dim):
    """G_S[u, v] = sum_{a, w} X[(u, a), w] conj(V[(v, a), w]) on planes.

    X = (J L V) H is passed pre-scaled by the positive-eigenvalue mask.
    Returns (dim, dim, B) planes.
    """
    rows_r, rows_i = [], []
    for u in range(dim):
        cols_r, cols_i = [], []
        for v in range(dim):
            rr = ri = None
            for a in range(dim):
                xrr, xii = xr[u * dim + a], xi[u * dim + a]   # (n, B)
                vrr, vii = vr[v * dim + a], vi[v * dim + a]
                tr_ = jnp.sum(xrr * vrr + xii * vii, axis=0)
                ti_ = jnp.sum(xii * vrr - xrr * vii, axis=0)
                rr = tr_ if rr is None else rr + tr_
                ri = ti_ if ri is None else ri + ti_
            cols_r.append(rr)
            cols_i.append(ri)
        rows_r.append(jnp.stack(cols_r, axis=0))
        rows_i.append(jnp.stack(cols_i, axis=0))
    return jnp.stack(rows_r, axis=0), jnp.stack(rows_i, axis=0)


def _abs_marginal(ar, vr, vi, dim, reg):
    """Input marginal of |J| from J's (approximately) diagonalized planes.

    marg[k, l] = sum_w |w_w| sum_a V[(k, a), w] conj(V[(l, a), w]), then
    Tikhonov-regularized by ``reg * tr(marg)/dim * I`` (the marginal can be
    near-singular for low-rank J). Returns (dim, dim, B) planes.
    """
    n = dim * dim
    wabs = [jnp.abs(ar[w, w]) for w in range(n)]       # (B,) each
    rows_r, rows_i = [], []
    for k in range(dim):
        cols_r, cols_i = [], []
        for l in range(dim):
            rr = ri = None
            for a in range(dim):
                vkr, vki = vr[k * dim + a], vi[k * dim + a]   # (n, B)
                vlr, vli = vr[l * dim + a], vi[l * dim + a]
                for w in range(n):
                    pr = wabs[w] * (vkr[w] * vlr[w] + vki[w] * vli[w])
                    pi = wabs[w] * (vki[w] * vlr[w] - vkr[w] * vli[w])
                    rr = pr if rr is None else rr + pr
                    ri = pi if ri is None else ri + pi
            cols_r.append(rr)
            cols_i.append(ri)
        rows_r.append(jnp.stack(cols_r, axis=0))
        rows_i.append(jnp.stack(cols_i, axis=0))
    mr = jnp.stack(rows_r, axis=0)
    mi = jnp.stack(rows_i, axis=0)
    tr = mr[0, 0]
    for k in range(1, dim):
        tr = tr + mr[k, k]
    eye = _eye_planes(dim, mr.shape[2:], mr.dtype)
    return mr + (reg / dim) * tr * eye, mi


def _sqrtm_planes(mr, mi, dim, eps, sweeps):
    """sqrtm of Hermitian PSD (dim, dim, B) planes via a cold Jacobi eigh."""
    vr0 = _eye_planes(dim, mr.shape[2:], mr.dtype)
    vi0 = jnp.zeros_like(vr0)
    ar, ai, wr, wi = _multi_sweep(mr, mi, vr0, vi0, eps, dim, sweeps)
    ws = [jnp.sqrt(jnp.maximum(ar[k, k], 0.0)) for k in range(dim)]
    rows_r, rows_i = [], []
    for i in range(dim):
        rr = ri = None
        for k in range(dim):
            xr_ = wr[i, k] * ws[k]
            xi_ = wi[i, k] * ws[k]
            tr_ = xr_ * wr[:, k] + xi_ * wi[:, k]
            ti_ = -xr_ * wi[:, k] + xi_ * wr[:, k]
            rr = tr_ if rr is None else rr + tr_
            ri = ti_ if ri is None else ri + ti_
        rows_r.append(rr)
        rows_i.append(ri)
    return jnp.stack(rows_r, axis=0), jnp.stack(rows_i, axis=0)


def dnorm_planes(jr: jnp.ndarray, ji: jnp.ndarray, *, dim: int,
                 num_iters: int = 96, sweeps: int = 1,
                 init_sweeps: int = 5, final_sweeps: int = 8,
                 lr0: float = 0.1, decay_iters: float = 50.0,
                 reg: float = 0.05, eps: float = 1e-30) -> jnp.ndarray:
    """Diamond norm of Hermitian (n, n, B) Choi-difference planes.

    :param jr, ji: real/imag planes of J = hermitianize(choi0 - choi1),
        n = dim^2 rows/cols, batch B in the trailing (lane) axis.
    :param num_iters: fixed Adam schedule length (static; no data-dependent
        control flow — the value error is second order in the iterate error,
        see module docstring).
    :param sweeps: Jacobi sweeps per Adam step from the warm-carried basis.
    :param init_sweeps: cold sweeps for the one-time eigh of J itself (warm
        start + initial eigenbasis).
    :param final_sweeps: accurate final evaluation sweeps.
    :return: (B,) diamond-norm values (2x the SDP optimum).
    """
    n = dim * dim
    bsh = jr.shape[2:]
    rdtype = jr.dtype

    # --- one-time cold eigh of J: warm-start factor + initial eigenbasis
    vr0 = _eye_planes(n, bsh, rdtype)
    vi0 = jnp.zeros_like(vr0)
    jar, jai, jvr, jvi = _multi_sweep(jr, ji, vr0, vi0, eps, n, init_sweeps)
    mr, mi = _abs_marginal(jar, jvr, jvi, dim, reg)
    a_r, a_i = _sqrtm_planes(mr, mi, dim, eps, sweeps=3)

    lr0 = jnp.asarray(lr0, rdtype)
    b1, b2, adam_eps = 0.9, 0.999, 1e-8

    def step(i, carry):
        a_r, a_i, m_r, m_i, v2_r, v2_i, vr, vi = carry
        # floor ||A||: J = 0 (identical channels) gives A = 0, and S = 0 is
        # then the correct (zero-value) iterate rather than 0/0 = NaN
        nu2 = jnp.maximum(jnp.sum(a_r * a_r + a_i * a_i, axis=(0, 1)),
                          jnp.asarray(1e-30, rdtype))           # (B,)
        nu = jnp.sqrt(nu2)
        sr, si = a_r / nu, a_i / nu
        # M' = (L V)^dag J (L V), then one warm sweep to refresh (V, w)
        w_r, w_i = _lift_apply(sr, si, vr, vi, dim)
        jw_r, jw_i = _cmm(jr, ji, w_r, w_i, n)
        mp_r, mp_i = _cmm_hconj_left(w_r, w_i, jw_r, jw_i, n)
        mp_r, mp_i = _hermitianize(mp_r, mp_i)
        ar_, ai_, vr, vi = _multi_sweep(mp_r, mp_i, vr, vi, eps, n, sweeps)
        # gradient in the refreshed basis: X = (J L V') H
        w2_r, w2_i = _lift_apply(sr, si, vr, vi, dim)
        x_r, x_i = _cmm(jr, ji, w2_r, w2_i, n)
        h = [(ar_[w, w] > 0).astype(rdtype) for w in range(n)]
        x_r = jnp.stack([x_r[:, w] * h[w] for w in range(n)], axis=1)
        x_i = jnp.stack([x_i[:, w] * h[w] for w in range(n)], axis=1)
        gs_r, gs_i = _grad_s(x_r, x_i, vr, vi, dim)
        # g = (2/nu) (G_S - <S, G_S> S), factored through the already-floored
        # S = A/nu: the naive 2 c A / nu^3 form underflows nu^3 to 0 in f32
        # when A = 0 (J = 0, identical channels) and NaNs as 0/0
        c = jnp.sum(sr * gs_r + si * gs_i, axis=(0, 1))        # (B,)
        g_r = 2 * (gs_r - c * sr) / nu
        g_i = 2 * (gs_i - c * si) / nu
        # Adam ascent with the dense path's decay schedule
        it = (i + 1).astype(rdtype)
        m_r = b1 * m_r + (1 - b1) * g_r
        m_i = b1 * m_i + (1 - b1) * g_i
        v2_r = b2 * v2_r + (1 - b2) * g_r * g_r
        v2_i = b2 * v2_i + (1 - b2) * g_i * g_i
        bc1 = 1 - b1 ** it
        bc2 = 1 - b2 ** it
        lr = lr0 * (0.5 ** ((it - 1) / decay_iters))
        a_r = a_r + lr * (m_r / bc1) / (jnp.sqrt(v2_r / bc2) + adam_eps)
        a_i = a_i + lr * (m_i / bc1) / (jnp.sqrt(v2_i / bc2) + adam_eps)
        return a_r, a_i, m_r, m_i, v2_r, v2_i, vr, vi

    z = jnp.zeros_like(a_r)
    carry = (a_r, a_i, z, z, z, z, jvr, jvi)
    a_r, a_i, _, _, _, _, vr, vi = jax.lax.fori_loop(
        0, num_iters, step, carry)

    # accurate final evaluation at the converged rho — COLD, from the
    # identity basis: the warm-carried V accumulates f32 non-unitarity over
    # ~100 one-sweep refreshes, and conjugating M by a non-unitary V biases
    # its spectrum (measured: 6.6e-5 systematic f32 error through the warm
    # basis vs 2.3e-6 cold on the same converged iterate). M = L^dag J L
    # needs no V at all, and ``final_sweeps`` cyclic sweeps from identity
    # re-converge the n=16 Jacobi to f32 roundoff.
    nu = jnp.sqrt(jnp.maximum(jnp.sum(a_r * a_r + a_i * a_i, axis=(0, 1)),
                              jnp.asarray(1e-30, rdtype)))
    sr, si = a_r / nu, a_i / nu
    er = _eye_planes(n, bsh, rdtype)
    ei = jnp.zeros_like(er)
    w_r, w_i = _lift_apply(sr, si, er, ei, dim)
    jw_r, jw_i = _cmm(jr, ji, w_r, w_i, n)
    mp_r, mp_i = _cmm_hconj_left(w_r, w_i, jw_r, jw_i, n)
    mp_r, mp_i = _hermitianize(mp_r, mp_i)
    ar_, _, _, _ = _multi_sweep(mp_r, mp_i, er, ei, eps, n, final_sweeps)
    val = jnp.maximum(ar_[0, 0], 0.0)
    for w in range(1, n):
        val = val + jnp.maximum(ar_[w, w], 0.0)
    return 2 * val


@functools.partial(jax.jit, static_argnames=("dim", "num_iters", "sweeps",
                                             "init_sweeps", "final_sweeps"))
def dnorm_fused(choi0: jnp.ndarray, choi1: jnp.ndarray, *, dim: int = None,
                num_iters: int = 96, sweeps: int = 1, init_sweeps: int = 5,
                final_sweeps: int = 8) -> jnp.ndarray:
    """Batched diamond-norm distance between Choi matrices (dense complex in,
    planes solver inside). Accepts (..., n, n) with any leading batch shape
    (including none); returns the matching batch-shaped real array."""
    j = jnp.asarray(choi0) - jnp.asarray(choi1)
    j = (j + jnp.conj(jnp.swapaxes(j, -1, -2))) / 2
    n = j.shape[-1]
    if dim is None:
        dim = int(np.sqrt(n))
    batch = j.shape[:-2]
    jp = jnp.moveaxis(j.reshape(-1, n, n), 0, -1)       # (n, n, B)
    vals = dnorm_planes(jnp.real(jp), jnp.imag(jp), dim=dim,
                        num_iters=num_iters, sweeps=sweeps,
                        init_sweeps=init_sweeps, final_sweeps=final_sweeps)
    return vals.reshape(batch)


def dnorm_fused_sharded(choi0: jnp.ndarray, choi1: jnp.ndarray, mesh,
                        axis_name: str = "batch", **kw) -> jnp.ndarray:
    """Run :func:`dnorm_fused` with the channel-pair batch sharded across a
    device mesh (same multi-chip idiom as ``lanes_apg.apg_fused_sharded``:
    the solve is elementwise in the batch, so each device runs the full
    planes solver on its local shard and no collectives appear in the loop).

    :param choi0, choi1: (B, n, n) Choi batches; B must divide evenly by the
        mesh size.
    :param mesh: a ``jax.sharding.Mesh`` with ``axis_name`` as its (only)
        batch axis, e.g. from ``parallel.make_mesh()``.
    :param kw: forwarded to :func:`dnorm_fused` (e.g. ``dim``,
        ``num_iters``).
    """
    from forest_benchmarking_tpu.parallel import shard_map_batched

    if choi0.shape[0] % mesh.shape[axis_name] != 0:
        raise ValueError(
            f"batch {choi0.shape[0]} must be divisible by the mesh axis "
            f"{axis_name!r} size {mesh.shape[axis_name]}")
    mapped = shard_map_batched(lambda c0, c1: dnorm_fused(c0, c1, **kw),
                               mesh, batched_argnums=(0, 1),
                               axis_name=axis_name)
    return mapped(choi0, choi1)
