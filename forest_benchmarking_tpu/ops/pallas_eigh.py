"""Pallas TPU kernel: batched 16x16 Hermitian CP projection via cyclic Jacobi.

Motivation (docs/performance.md): the APG/PGDB tomography solvers are ~100%
batched 16x16 ``eigh``. This kernel keeps the whole cyclic-Jacobi iteration
(and the positive-part reconstruction) in VMEM.

Layout: the batch lives in the LANE dimension — arrays are (16, 16, B) with B a
multiple of 128, so every Jacobi rotation is an elementwise VPU op across the
batch. Complex values are carried as separate real/imag planes. Pallas TPU
lowers neither gather nor scatter, so all row/column movement is static
slices + concatenate.

Status (measured on v5e, in-loop, B=1024, f32): 4.34 ms/projection — numerical
parity with the XLA-eigh projection (4.48 ms) but not yet faster; the plain-XLA
run of the same sweep costs 9.3 ms, so VMEM residency buys ~2.1x and the
remaining cost is the per-round permute copies. Round-2 plan: fuse the whole
APG iteration (not just the projection) into the kernel and cut the permute
traffic. The rotation algebra matches np.linalg.eigh to 1e-14
(tests/test_pallas_eigh.py).
"""
from __future__ import annotations

import functools
from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp

__all__ = ["round_robin_pairs", "cp_project_pallas", "jacobi_eigh_reference"]

N = 16  # matrix dimension this kernel is specialized for


def round_robin_pairs(n: int):
    """n-1 rounds of n/2 disjoint index pairs covering every pair once."""
    players = list(range(n))
    rounds = []
    for _ in range(n - 1):
        pairs = []
        for i in range(n // 2):
            a, b = players[i], players[n - 1 - i]
            pairs.append((min(a, b), max(a, b)))
        rounds.append(pairs)
        players = [players[0]] + [players[-1]] + players[1:-1]
    return rounds


_ROUNDS = round_robin_pairs(N)


def _rotation_coeffs(apq_r, apq_i, app, aqq, eps):
    """Vectorized Jacobi rotation coefficients (c, s, e_r, e_i) per lane."""
    m2 = apq_r * apq_r + apq_i * apq_i
    m = jnp.sqrt(m2)
    small = m < eps
    msafe = jnp.where(small, 1.0, m)
    e_r = jnp.where(small, 1.0, apq_r / msafe)
    e_i = jnp.where(small, 0.0, apq_i / msafe)
    tau = (aqq - app) / (2 * msafe)
    sign_tau = jnp.where(tau < 0, -1.0, 1.0)
    t = jnp.where(tau == 0.0, 1.0,
                  sign_tau / (jnp.abs(tau) + jnp.sqrt(1 + tau * tau)))
    c = jax.lax.rsqrt(1 + t * t)
    s = t * c
    c = jnp.where(small, 1.0, c)
    s = jnp.where(small, 0.0, s)
    return c, s, e_r, e_i


def _sweep(a_r, a_i, v_r, v_i, eps):
    """One full cyclic-Jacobi sweep, vectorized over the 8 disjoint pairs of
    each of the 15 rounds.

    Operates on (16, 16, B) value arrays. Implementation constraint: Pallas TPU
    lowering supports neither gather nor scatter, so rows/columns are moved
    with static single-index slices + concatenate only.
    """
    def cmul(xr, xi, yr, yi):
        return xr * yr - xi * yi, xr * yi + xi * yr

    def rows_perm(a, order):
        return jnp.concatenate([a[i:i + 1] for i in order], axis=0)

    def cols_perm(a, order):
        return jnp.concatenate([a[:, i:i + 1] for i in order], axis=1)

    for pairs in _ROUNDS:
        order = [x for pr in pairs for x in pr]       # [p0,q0,p1,q1,...]
        inv = [0] * N
        for newpos, i in enumerate(order):
            inv[i] = newpos

        # rotation coefficients for all 8 pairs at once: shapes (8, 1, B)
        apq_r = jnp.concatenate([a_r[p:p + 1, q] for (p, q) in pairs], axis=0)
        apq_i = jnp.concatenate([a_i[p:p + 1, q] for (p, q) in pairs], axis=0)
        app = jnp.concatenate([a_r[p:p + 1, p] for (p, _) in pairs], axis=0)
        aqq = jnp.concatenate([a_r[q:q + 1, q] for (_, q) in pairs], axis=0)
        c, s, e_r, e_i = _rotation_coeffs(apq_r, apq_i, app, aqq, eps)
        ebar_r, ebar_i = e_r, -e_i
        # (8, 1, B) coefficient blocks for row-space ops
        cN = c[:, None]
        sN = s[:, None]
        erN, eiN = e_r[:, None], e_i[:, None]
        ebrN, ebiN = ebar_r[:, None], ebar_i[:, None]

        def rotate_cols(x_r, x_i, conj_e):
            """x (16,16,B) -> columns permuted to pair order, rotated, restored."""
            xp_r = cols_perm(x_r, order).reshape(N, 8, 2, -1)
            xp_i = cols_perm(x_i, order).reshape(N, 8, 2, -1)
            pr_, pi_ = xp_r[:, :, 0], xp_i[:, :, 0]   # (16, 8, B)
            qr_, qi_ = xp_r[:, :, 1], xp_i[:, :, 1]
            if conj_e:
                fr, fi, gr, gi = ebar_r, ebar_i, e_r, e_i
            else:
                fr, fi, gr, gi = e_r, e_i, ebar_r, ebar_i
            tq = cmul(fr, fi, qr_, qi_)
            new_p = (c * pr_ - s * tq[0], c * pi_ - s * tq[1])
            tp = cmul(gr, gi, pr_, pi_)
            new_q = (s * tp[0] + c * qr_, s * tp[1] + c * qi_)
            out_r = jnp.stack([new_p[0], new_q[0]], axis=2).reshape(N, N, -1)
            out_i = jnp.stack([new_p[1], new_q[1]], axis=2).reshape(N, N, -1)
            return cols_perm(out_r, inv), cols_perm(out_i, inv)

        # columns: A <- A U  (p' = c p - s ebar q ; q' = s e p + c q)
        a_r, a_i = rotate_cols(a_r, a_i, conj_e=True)

        # rows: A <- U^dag A  (p' = c p - s e q ; q' = s ebar p + c q)
        ar_p = rows_perm(a_r, order).reshape(8, 2, N, -1)
        ai_p = rows_perm(a_i, order).reshape(8, 2, N, -1)
        pr_, pi_ = ar_p[:, 0], ai_p[:, 0]   # (8, 16, B)
        qr_, qi_ = ar_p[:, 1], ai_p[:, 1]
        tq = cmul(erN, eiN, qr_, qi_)
        new_pr, new_pi = cN * pr_ - sN * tq[0], cN * pi_ - sN * tq[1]
        tp = cmul(ebrN, ebiN, pr_, pi_)
        new_qr, new_qi = sN * tp[0] + cN * qr_, sN * tp[1] + cN * qi_
        out_r = jnp.stack([new_pr, new_qr], axis=1).reshape(N, N, -1)
        out_i = jnp.stack([new_pi, new_qi], axis=1).reshape(N, N, -1)
        a_r, a_i = rows_perm(out_r, inv), rows_perm(out_i, inv)

        # eigenvectors: V <- V U (column update only)
        v_r, v_i = rotate_cols(v_r, v_i, conj_e=True)
    return a_r, a_i, v_r, v_i


def _jacobi_pos_part(h_r, h_i, sweeps: int):
    """Positive part pos(H) = V relu(w) V^dag via Jacobi; (16, 16, B) layout."""
    b = h_r.shape[-1]
    dtype = h_r.dtype
    eps = jnp.asarray(1e-30 if dtype == jnp.float64 else 1e-18, dtype)
    eye = jnp.broadcast_to(jnp.eye(N, dtype=dtype)[:, :, None], (N, N, b))
    a_r, a_i = h_r, h_i
    v_r, v_i = eye, jnp.zeros_like(eye)

    def body(_, carry):
        return _sweep(*carry, eps)

    a_r, a_i, v_r, v_i = jax.lax.fori_loop(0, sweeps, body,
                                           (a_r, a_i, v_r, v_i))
    w = jnp.stack([a_r[k, k] for k in range(N)])  # (16, B) eigenvalues
    wpos = jnp.maximum(w, 0.0)
    # pos[i, j] = sum_k V[i,k] wpos[k] conj(V[j,k])
    pos_r = jnp.zeros_like(h_r)
    pos_i = jnp.zeros_like(h_i)
    for k in range(N):
        wr = wpos[k]
        vkr, vki = v_r[:, k], v_i[:, k]  # (16, B)
        # outer product (i, j): (V[i,k] w) * conj(V[j,k])
        ar = (vkr * wr)[:, None, :]
        ai = (vki * wr)[:, None, :]
        br = vkr[None, :, :]
        bi = -vki[None, :, :]
        pos_r = pos_r + ar * br - ai * bi
        pos_i = pos_i + ar * bi + ai * br
    return pos_r, pos_i


def _have_pallas() -> bool:
    try:
        from jax.experimental import pallas as pl  # noqa: F401
        from jax.experimental.pallas import tpu as pltpu  # noqa: F401
        return jax.default_backend() != "cpu"
    except Exception:  # noqa: BLE001
        return False


@functools.partial(jax.jit, static_argnames=("sweeps", "block", "use_pallas"))
def cp_project_pallas(h: jnp.ndarray, sweeps: int = 6, block: int = 128,
                      use_pallas: bool = True) -> jnp.ndarray:
    """CP projection (positive part) of a batch of 16x16 Hermitian matrices.

    :param h: (B, 16, 16) complex array (B a multiple of ``block``).
    :return: (B, 16, 16) complex positive parts.

    On TPU this runs as a Pallas kernel holding the full Jacobi iteration in
    VMEM (batch in the lane dimension); elsewhere (or with use_pallas=False)
    the identical jnp sweep runs under plain XLA — same numerics either way.
    """
    b = h.shape[0]
    rdtype = jnp.real(h).dtype
    # (B, 16, 16) -> (16, 16, B) with batch in lanes
    h_r = jnp.transpose(jnp.real(h), (1, 2, 0))
    h_i = jnp.transpose(jnp.imag(h), (1, 2, 0))

    if use_pallas and _have_pallas() and b % block == 0:
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        def kernel(hr_ref, hi_ref, or_ref, oi_ref):
            pos_r, pos_i = _jacobi_pos_part(hr_ref[:], hi_ref[:], sweeps)
            or_ref[:] = pos_r
            oi_ref[:] = pos_i

        grid = (b // block,)
        spec = pl.BlockSpec((N, N, block), lambda i: (0, 0, i),
                            memory_space=pltpu.VMEM)
        pos_r, pos_i = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[spec, spec],
            out_specs=[spec, spec],
            out_shape=[jax.ShapeDtypeStruct((N, N, b), rdtype),
                       jax.ShapeDtypeStruct((N, N, b), rdtype)],
        )(h_r, h_i)
    else:
        pos_r, pos_i = _jacobi_pos_part(h_r, h_i, sweeps)

    out = pos_r + 1j * pos_i
    return jnp.transpose(out, (2, 0, 1)).astype(h.dtype)


def jacobi_eigh_reference(h: np.ndarray, sweeps: int = 8):
    """Host reference: eigendecomposition of one 16x16 Hermitian matrix using
    the same sweep schedule (for tests)."""
    h_r = jnp.asarray(np.real(h))[:, :, None]
    h_i = jnp.asarray(np.imag(h))[:, :, None]
    pos_r, pos_i = _jacobi_pos_part(h_r, h_i, sweeps)
    return np.asarray(pos_r[..., 0] + 1j * pos_i[..., 0])
