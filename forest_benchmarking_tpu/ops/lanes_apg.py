"""Fused lanes-layout APG process-MLE solver (the TPU flagship kernel).

Solves the PGDB maximum-likelihood problem (reference
forest/benchmarking/tomography.py:542-594: min -sum n log(A vec(E)) over CPTP
Choi matrices E) with an accelerated projected-gradient iteration whose EVERY
step — gradient matmuls, Dykstra alternating projection with a Jacobi
eigensolver, Nesterov momentum with function restart — runs in a single fused
kernel over a "lanes" data layout: batched matrices are (d2, d2, B) real/imag
planes with the batch B in the TPU lane dimension, so Jacobi rotations and
projections are elementwise VPU ops across the whole batch and the A-matrix
contractions are (R, d4) x (d4, B) MXU matmuls.

Key algorithmic points vs the per-problem ``lax.while_loop`` kernels in
``tomography.py``:

- **Warm eigenbasis (V-carry)**: consecutive Dykstra/APG iterates are close,
  so the eigenvector matrix V from the previous CP projection nearly
  diagonalizes the next one. Each CP projection rotates into the carried
  basis (M = V^dag H V), runs 1-2 Jacobi sweeps, and reconstructs — instead
  of ~6 cold sweeps per projection.
- **Static phase schedule**: iteration counts are compile-time constants
  (tuples of (outer_iters, dykstra_iters, jacobi_sweeps)), so the kernel has
  no data-dependent control flow at all; early phases use cheap inexact
  projections and the final phase uses accurate ones. The returned estimate
  always ends on a trace-preserving Dykstra half-step (exactly TP, CP to the
  schedule's accuracy).
- The same pure-jnp function runs under plain XLA on any backend (used for
  float64 parity measurements vs the reference algorithm) and inside a
  ``pallas_call`` on TPU, where the whole solve stays VMEM-resident.

Numerical contract: with the default ``PARITY_PHASES`` schedule the float64
estimate agrees with the fully converged reference PGDB optimum (tight
Dykstra) to < 1e-6 max elementwise deviation — measured by bench.py's parity
subprocess, cf. docs/performance.md.
"""
from __future__ import annotations

import functools
from typing import Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

__all__ = [
    "raster_a_matrix", "apg_fused_lanes", "apg_fused", "apg_fused_sharded",
    "PARITY_PHASES", "PARITY_TUNED_2Q", "HEADLINE_TUNED_2Q",
]


def _round_robin_pairs(n: int):
    """n-1 rounds of n/2 disjoint index pairs covering every pair exactly once."""
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


# ----------------------------------------------------------------------
# Lanes-layout building blocks (pure jnp; Pallas-lowerable: no gather/scatter)
# ----------------------------------------------------------------------

def _rotation_coeffs(apq_r, apq_i, app, aqq, eps):
    """Jacobi rotation coefficients (c, s, e_r, e_i), vectorized per lane."""
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


@functools.lru_cache(maxsize=None)
def _sweep_schedule(n: int):
    """Precomputed pair-layout permutation schedule for the cyclic sweep.

    In round r the matrix lives in "pair layout": rows/cols permuted by
    ``order_r`` (the flattened pair list), so the rotated pairs sit at
    (2i, 2i+1) and the rotation needs NO permutes at all. Between rounds a
    single composed transition permutation ``trans[r]`` moves layout r to
    layout r+1 (and ``trans[-1]`` wraps the last round back to round 0 for
    multi-sweep chaining) — halving the full-matrix copy traffic versus
    permuting to pair order and back every round.

    Returns (orders, invs, trans) as tuples of index tuples.
    """
    rounds = _round_robin_pairs(n)
    orders = [tuple(x for pr in pairs for x in pr) for pairs in rounds]
    invs = []
    for order in orders:
        inv = [0] * n
        for newpos, i in enumerate(order):
            inv[i] = newpos
        invs.append(tuple(inv))
    trans = []
    for r in range(len(orders)):
        nxt = orders[(r + 1) % len(orders)]
        trans.append(tuple(invs[r][nxt[i]] for i in range(n)))
    return tuple(orders), tuple(invs), tuple(trans)


def _rows_perm(a, order):
    return jnp.concatenate([a[i:i + 1] for i in order], axis=0)


def _cols_perm(a, order):
    return jnp.concatenate([a[:, i:i + 1] for i in order], axis=1)


def _multi_sweep(a_r, a_i, v_r, v_i, eps, n, sweeps):
    """``sweeps`` cyclic-Jacobi sweeps on (n, n, *batch) planes, rotating A
    and V jointly. All movement is static slices + concatenate (Pallas TPU
    lowers neither gather nor scatter); rounds run in pair layout with
    composed transition permutations (see :func:`_sweep_schedule`).

    The batch may have any rank: with the classic lanes layout it is a
    single (B,) axis; with the vreg layout (``apg_fused(sublanes=8)``) it
    is (B/128, 128) so each matrix entry occupies whole (8, 128) vregs and
    every pair slice/permutation moves untiled major axes only.

    ``sweeps=0`` is a no-op (used by the sweep-free warm CP projection,
    which reuses the carried eigenbasis verbatim).
    """
    if sweeps == 0:
        return a_r, a_i, v_r, v_i
    npairs = n // 2
    orders, invs, trans = _sweep_schedule(n)
    nrounds = len(orders)

    def cmul(xr, xi, yr, yi):
        return xr * yr - xi * yi, xr * yi + xi * yr

    def fence(*xs):
        # XLA:TPU miscompiles the slice-concat permutation when it fuses
        # with the rotation math that consumes it at small n (measured: n=4
        # pair-layout entry + rotate_cols returns values off by O(1); the
        # permuted intermediate alone fetches correctly, and both an
        # optimization_barrier and a gather-based permute fix it; n=16 is
        # unaffected). Fence the perms from the rotations for n <= 8 only,
        # so the hot n=16 tomography sweeps keep full fusion.
        return jax.lax.optimization_barrier(xs) if n <= 8 else xs

    # enter pair layout of round 0
    o0 = orders[0]
    a_r = _rows_perm(_cols_perm(a_r, o0), o0)
    a_i = _rows_perm(_cols_perm(a_i, o0), o0)
    v_r = _cols_perm(v_r, o0)
    v_i = _cols_perm(v_i, o0)
    a_r, a_i, v_r, v_i = fence(a_r, a_i, v_r, v_i)

    for swp in range(sweeps):
        for r in range(nrounds):
            # rotation coefficients from the in-layout pairs (2i, 2i+1)
            apq_r = jnp.concatenate(
                [a_r[2 * i:2 * i + 1, 2 * i + 1] for i in range(npairs)], axis=0)
            apq_i = jnp.concatenate(
                [a_i[2 * i:2 * i + 1, 2 * i + 1] for i in range(npairs)], axis=0)
            app = jnp.concatenate(
                [a_r[2 * i:2 * i + 1, 2 * i] for i in range(npairs)], axis=0)
            aqq = jnp.concatenate(
                [a_r[2 * i + 1:2 * i + 2, 2 * i + 1] for i in range(npairs)],
                axis=0)
            c, s, e_r, e_i = _rotation_coeffs(apq_r, apq_i, app, aqq, eps)
            ebar_r, ebar_i = e_r, -e_i
            cN, sN = c[:, None], s[:, None]
            erN, eiN = e_r[:, None], e_i[:, None]
            ebrN, ebiN = ebar_r[:, None], ebar_i[:, None]

            def rotate_cols(x_r, x_i):
                bsh = x_r.shape[2:]
                xp_r = x_r.reshape(n, npairs, 2, *bsh)
                xp_i = x_i.reshape(n, npairs, 2, *bsh)
                pr_, pi_ = xp_r[:, :, 0], xp_i[:, :, 0]
                qr_, qi_ = xp_r[:, :, 1], xp_i[:, :, 1]
                tq = cmul(ebar_r, ebar_i, qr_, qi_)
                new_p = (c * pr_ - s * tq[0], c * pi_ - s * tq[1])
                tp = cmul(e_r, e_i, pr_, pi_)
                new_q = (s * tp[0] + c * qr_, s * tp[1] + c * qi_)
                out_r = jnp.stack([new_p[0], new_q[0]],
                                  axis=2).reshape(n, n, *bsh)
                out_i = jnp.stack([new_p[1], new_q[1]],
                                  axis=2).reshape(n, n, *bsh)
                return out_r, out_i

            a_r, a_i = rotate_cols(a_r, a_i)

            bsh = a_r.shape[2:]
            ar_p = a_r.reshape(npairs, 2, n, *bsh)
            ai_p = a_i.reshape(npairs, 2, n, *bsh)
            pr_, pi_ = ar_p[:, 0], ai_p[:, 0]
            qr_, qi_ = ar_p[:, 1], ai_p[:, 1]
            if len(bsh) > 1:
                # Mosaic-safe row rotation: transpose the pair axis inward
                # so the (npairs, *batch) coefficients broadcast over the
                # LEADING column axis only (expanding the interior size-1
                # dim of c[:, None] is the Mosaic-crash pattern)
                prt, pit = (jnp.swapaxes(x, 0, 1) for x in (pr_, pi_))
                qrt, qit = (jnp.swapaxes(x, 0, 1) for x in (qr_, qi_))
                tq = cmul(e_r, e_i, qrt, qit)
                new_pr = jnp.swapaxes(c * prt - s * tq[0], 0, 1)
                new_pi = jnp.swapaxes(c * pit - s * tq[1], 0, 1)
                tp = cmul(ebar_r, ebar_i, prt, pit)
                new_qr = jnp.swapaxes(s * tp[0] + c * qrt, 0, 1)
                new_qi = jnp.swapaxes(s * tp[1] + c * qit, 0, 1)
            else:
                tq = cmul(erN, eiN, qr_, qi_)
                new_pr, new_pi = cN * pr_ - sN * tq[0], cN * pi_ - sN * tq[1]
                tp = cmul(ebrN, ebiN, pr_, pi_)
                new_qr, new_qi = sN * tp[0] + cN * qr_, sN * tp[1] + cN * qi_
            a_r = jnp.stack([new_pr, new_qr], axis=1).reshape(n, n, *bsh)
            a_i = jnp.stack([new_pi, new_qi], axis=1).reshape(n, n, *bsh)

            v_r, v_i = rotate_cols(v_r, v_i)

            last = (swp == sweeps - 1) and (r == nrounds - 1)
            t = invs[r] if last else trans[r]
            a_r = _rows_perm(_cols_perm(a_r, t), t)
            a_i = _rows_perm(_cols_perm(a_i, t), t)
            v_r = _cols_perm(v_r, t)
            v_i = _cols_perm(v_i, t)
            a_r, a_i, v_r, v_i = fence(a_r, a_i, v_r, v_i)
    return a_r, a_i, v_r, v_i


def _sweep(a_r, a_i, v_r, v_i, eps, n):
    """One cyclic-Jacobi sweep (see :func:`_multi_sweep`)."""
    return _multi_sweep(a_r, a_i, v_r, v_i, eps, n, 1)


def _cmm(ar, ai, br, bi, n):
    """Per-problem complex matmul on (n, n, *batch) planes: C = A @ B.

    Unrolled over the contraction index as broadcast FMAs (VPU-friendly).
    Multi-rank batches take the row-wise form: expanding interior size-1
    major dims (the ``(n, 1, *b) * (1, n, *b)`` outer-product broadcast)
    is the Mosaic-crash pattern, so each output row i is accumulated as
    sum_k A[i, k] * B[k] with only leading-dim broadcasts."""
    if len(ar.shape) > 3:
        rows_r, rows_i = [], []
        for i in range(n):
            rr = ar[i, 0] * br[0] - ai[i, 0] * bi[0]
            ri = ar[i, 0] * bi[0] + ai[i, 0] * br[0]
            for k in range(1, n):
                akr, aki = ar[i, k], ai[i, k]       # (*batch,)
                rr = rr + akr * br[k] - aki * bi[k]
                ri = ri + akr * bi[k] + aki * br[k]
            rows_r.append(rr)
            rows_i.append(ri)
        return jnp.stack(rows_r, axis=0), jnp.stack(rows_i, axis=0)
    cr = ar[:, 0:1] * br[0:1] - ai[:, 0:1] * bi[0:1]
    ci = ar[:, 0:1] * bi[0:1] + ai[:, 0:1] * br[0:1]
    for k in range(1, n):
        akr, aki = ar[:, k:k + 1], ai[:, k:k + 1]   # (n, 1, B)
        bkr, bki = br[k:k + 1], bi[k:k + 1]         # (1, n, B)
        cr = cr + akr * bkr - aki * bki
        ci = ci + akr * bki + aki * bkr
    return cr, ci


def _cmm_hconj_left(vr, vi, br, bi, n):
    """C = V^dag @ B on (n, n, *batch) planes: C[i,j] = sum_k conj(V[k,i])
    B[k,j]. Multi-rank batches use the row-wise Mosaic-safe form (see
    :func:`_cmm`)."""
    if len(vr.shape) > 3:
        rows_r, rows_i = [], []
        for i in range(n):
            rr = vr[0, i] * br[0] + vi[0, i] * bi[0]
            ri = vr[0, i] * bi[0] - vi[0, i] * br[0]
            for k in range(1, n):
                vkr, vki = vr[k, i], vi[k, i]       # (*batch,)
                rr = rr + vkr * br[k] + vki * bi[k]
                ri = ri + vkr * bi[k] - vki * br[k]
            rows_r.append(rr)
            rows_i.append(ri)
        return jnp.stack(rows_r, axis=0), jnp.stack(rows_i, axis=0)

    def row(a, k):
        return jnp.swapaxes(a[k:k + 1], 0, 1)      # (n, 1, B): V[k, i] over i
    cr = row(vr, 0) * br[0:1] + row(vi, 0) * bi[0:1]
    ci = row(vr, 0) * bi[0:1] - row(vi, 0) * br[0:1]
    for k in range(1, n):
        vkr, vki = row(vr, k), row(vi, k)
        bkr, bki = br[k:k + 1], bi[k:k + 1]
        cr = cr + vkr * bkr + vki * bki
        ci = ci + vkr * bki - vki * bkr
    return cr, ci


def _hermitianize(xr, xi):
    return (xr + jnp.swapaxes(xr, 0, 1)) / 2, (xi - jnp.swapaxes(xi, 0, 1)) / 2


def _warm_cp(hr, hi, vr, vi, sweeps, n, eps):
    """CP projection with a carried eigenbasis: rotate H into the previous
    eigenbasis V, run ``sweeps`` Jacobi sweeps, clip negative eigenvalues,
    reconstruct. Returns (pos_r, pos_i, V'_r, V'_i)."""
    hr, hi = _hermitianize(hr, hi)
    # M = V^dag H V  (near-diagonal when V is warm)
    tr, ti = _cmm(hr, hi, vr, vi, n)
    mr, mi = _cmm_hconj_left(vr, vi, tr, ti, n)
    ar, ai, wr, wi = _multi_sweep(mr, mi, vr, vi, eps, n, sweeps)
    # eigenvalues on the diagonal; clip and reconstruct pos = W w+ W^dag
    if len(hr.shape) > 3:
        # Mosaic-safe row-wise form (no interior size-1 broadcasts): row i
        # accumulates sum_k (W[i,k] w_k) conj(W[j,k]) over the k order of
        # the classic path — identical floating-point sequence per element
        ws = [jnp.maximum(ar[k, k], 0.0) for k in range(n)]   # (*batch,)
        rows_r, rows_i = [], []
        for i in range(n):
            rr = ri = None
            for k in range(n):
                xr_ = wr[i, k] * ws[k]
                xi_ = wi[i, k] * ws[k]
                tr_ = xr_ * wr[:, k] + xi_ * wi[:, k]
                ti_ = -xr_ * wi[:, k] + xi_ * wr[:, k]
                rr = tr_ if rr is None else rr + tr_
                ri = ti_ if ri is None else ri + ti_
            rows_r.append(rr)
            rows_i.append(ri)
        return (jnp.stack(rows_r, axis=0), jnp.stack(rows_i, axis=0),
                wr, wi)
    pos_r = jnp.zeros_like(hr)
    pos_i = jnp.zeros_like(hi)
    for k in range(n):
        w = jnp.maximum(ar[k, k], 0.0)             # (*batch,)
        wkr, wki = wr[:, k], wi[:, k]               # (n, *batch)
        xr_ = (wkr * w)[:, None]
        xi_ = (wki * w)[:, None]
        yr_ = wkr[None]
        yi_ = -wki[None]
        pos_r = pos_r + xr_ * yr_ - xi_ * yi_
        pos_i = pos_i + xr_ * yi_ + xi_ * yr_
    return pos_r, pos_i, wr, wi


def _eye_planes(n, bsh, dtype):
    """Identity planes (n, n, *batch) built by concatenating full-minor
    zero/one tiles — Mosaic-safe for multi-rank batches (a broadcast of an
    (n, n, 1, 1) constant over the tiled minor dims crashes the TPU
    compiler; see docs/performance.md round-3 notes)."""
    if len(bsh) <= 1:
        return jnp.broadcast_to(
            jnp.eye(n, dtype=dtype).reshape((n, n) + (1,) * len(bsh)),
            (n, n) + tuple(bsh))
    z = jnp.zeros((1, 1) + tuple(bsh), dtype)
    o = jnp.ones((1, 1) + tuple(bsh), dtype)
    rows = [jnp.concatenate([o if t == k else z for t in range(n)], axis=1)
            for k in range(n)]
    return jnp.concatenate(rows, axis=0)


def _proj_tp_safe(xr, xi, dim):
    """:func:`_proj_tp` without interior/minor-mixed broadcasts: the partial
    trace is summed from entry slices and the correction kron(D, I) is
    assembled by stacking rows — every op is a slice/concat/elementwise on
    full-minor tiles, which Mosaic lowers for any batch rank."""
    n = dim * dim
    bsh = xr.shape[2:]
    z1 = jnp.zeros((1, dim) + tuple(bsh), xr.dtype)

    def pt(x):
        rows = []
        for i in range(dim):
            cols = []
            for j in range(dim):
                acc = x[i * dim:i * dim + 1, j * dim:j * dim + 1]
                for k in range(1, dim):
                    acc = acc + x[i * dim + k:i * dim + k + 1,
                                  j * dim + k:j * dim + k + 1]
                cols.append(acc)
            rows.append(jnp.concatenate(cols, axis=1))
        return jnp.concatenate(rows, axis=0)            # (dim, dim, *batch)

    eyed = _eye_planes(dim, bsh, xr.dtype)
    dr = (pt(xr) - eyed) / dim
    di = pt(xi) / dim

    def kron_eye(d):
        # row p = (i, k) of kron(d, I): d[i, j] at columns j*dim + k
        rows = []
        for i in range(dim):
            dri = d[i:i + 1]                             # (1, dim, *batch)
            for k in range(dim):
                blk = jnp.stack([dri if t == k else z1
                                 for t in range(dim)], axis=2)
                rows.append(blk.reshape(1, n, *bsh))
        return jnp.concatenate(rows, axis=0)             # (n, n, *batch)

    return xr - kron_eye(dr), xi - kron_eye(di)


def _proj_tp(xr, xi, dim):
    """Trace-preserving projection on (d2, d2, *batch) planes (eq. 12 of
    [PGD]): X - kron(Tr_out(X) - I, I) / dim, Tr_out the keep=[0] partial
    trace."""
    if len(xr.shape) > 3:
        return _proj_tp_safe(xr, xi, dim)
    bsh = xr.shape[2:]
    ones = (1,) * len(bsh)
    x5r = xr.reshape(dim, dim, dim, dim, *bsh)
    x5i = xi.reshape(dim, dim, dim, dim, *bsh)
    eye = jnp.eye(dim, dtype=xr.dtype).reshape(1, dim, 1, dim, *ones)
    pt_r = jnp.sum(x5r * eye, axis=(1, 3))          # (dim, dim, *batch)
    pt_i = jnp.sum(x5i * eye, axis=(1, 3))
    eye2 = jnp.eye(dim, dtype=xr.dtype).reshape(dim, dim, *ones)
    dr = (pt_r - eye2) / dim
    di = pt_i / dim
    cr = dr[:, None, :, None] * eye
    ci = di[:, None, :, None] * eye
    return (x5r - cr).reshape(dim * dim, dim * dim, *bsh), \
        (x5i - ci).reshape(dim * dim, dim * dim, *bsh)


def _dykstra(zr, zi, vr, vi, iters, sweeps, dim, eps,
             sweeps_rest: int = None):
    """``iters`` Dykstra alternating-projection iterations (CP then TP) with
    the warm-V CP projection; ends on the TP half-step (exactly TP output).

    Runs as a ``fori_loop`` so the traced graph holds ONE iteration body
    (compile-time matters: the sweep is heavily unrolled).

    ``sweeps_rest`` (default: ``sweeps``) sets the Jacobi sweep count for
    inner iterations after the first: with ``sweeps_rest=0`` the eigenbasis
    V refreshed by iteration 1 is REUSED verbatim by the remaining
    iterations (their CP projection rotates into V, clips the diagonal, and
    reconstructs — no sweep at all). Measured: too crude for the parity
    tail (dev ~3e-3); kept for cheap inexact phases.
    (Round-3 note: warm-starting the correction variables across outer
    iterations was measured and REJECTED — corrections are tied to the
    specific prox input and go stale as it moves, degrading the parity
    deviation 100x; see docs/performance.md round-3 dead ends.)
    """
    n = dim * dim
    if sweeps_rest is None:
        sweeps_rest = sweeps

    def make_body(s):
        def body(_, carry):
            cp_ch_r, cp_ch_i, tp_ch_r, tp_ch_i, st_r, st_i, vr, vi = carry
            pre_r, pre_i = st_r - cp_ch_r, st_i - cp_ch_i
            cp_r, cp_i, vr, vi = _warm_cp(pre_r, pre_i, vr, vi, s, n, eps)
            cp_ch_r, cp_ch_i = cp_r - pre_r, cp_i - pre_i
            pre_r, pre_i = cp_r - tp_ch_r, cp_i - tp_ch_i
            st_r, st_i = _proj_tp(pre_r, pre_i, dim)
            tp_ch_r, tp_ch_i = st_r - pre_r, st_i - pre_i
            return (cp_ch_r, cp_ch_i, tp_ch_r, tp_ch_i, st_r, st_i, vr, vi)
        return body

    zeros = jnp.zeros_like(zr)
    carry = (zeros, zeros, zeros, zeros, zr, zi, vr, vi)
    if sweeps_rest == sweeps:
        carry = jax.lax.fori_loop(0, iters, make_body(sweeps), carry)
    elif iters > 0:  # iters == 0 must stay a no-op in the split case too
        carry = make_body(sweeps)(0, carry)
        carry = jax.lax.fori_loop(1, iters, make_body(sweeps_rest), carry)
    return carry[4], carry[5], carry[6], carry[7]


# ----------------------------------------------------------------------
# Host-side A-matrix preparation
# ----------------------------------------------------------------------

def raster_a_matrix(a: np.ndarray, d2: int) -> np.ndarray:
    """Permute the PGDB A-matrix columns from vec (column-stacking) order to
    the raster order of (d2, d2, B) plane flattening, so that
    ``A_raster @ X.reshape(d2*d2, B) == A @ vec(X)`` per lane."""
    return np.asarray(a).reshape(-1, d2, d2).transpose(0, 2, 1).reshape(
        a.shape[0], d2 * d2)


# ----------------------------------------------------------------------
# The fused solver (pure jnp — runs under XLA anywhere, or inside Pallas)
# ----------------------------------------------------------------------

# (outer_iters, dykstra_iters, jacobi_sweeps) — early phases take cheap
# inexact proximal steps, the last phase accurate ones. Tuned against the
# f64 tight-projection reference optimum (see module docstring).
PARITY_PHASES: Tuple[Tuple[int, int, int], ...] = (
    (12, 1, 1), (10, 2, 1), (28, 6, 1))

# Round-3 tuned 2Q (dim=4) parity configuration: the same < 1e-6 f64
# deviation vs the tight-projection converged reference optimum — measured
# across 16 datasets (8 seeds x 2 generators) at every shot count in
# {750, 1000, 1500, 2000, 4000, 8000} per setting (worst case 7.8e-7) — at
# ~81% of the default schedule's Dykstra work, by (a) a 2x larger validated
# step (mu scale 0.5; 0.4 DIVERGES — measured) which shortens every phase,
# and (b) trimmed init/final projections. A shorter (20,6,1) tail breaks the
# bar on isolated 750/1500-shot datasets (1.5e-6) — 24 is the measured floor
# with margin. Production callers should also precompute ``a_pinv`` once per
# A-matrix (see :func:`apg_fused`).
#
# Operating envelope: at 500 shots/setting the comparison itself bottoms
# out — EVERY schedule (including the conservative PARITY_PHASES default,
# which hits 1.7e-6 there) plateaus at ~1.1e-6 independent of tail length
# or Jacobi sweeps, while the reference algorithm needs ~10^4 outer
# iterations just to pin its own optimum to <1e-4 on such flat likelihoods
# (measured: one 500-shot dataset moved 7.3e-5 between maxiter 3000 and
# 10000). The <1e-6 contract applies at >=750 shots/setting;
# docs/performance.md has the full sweep.
#
# Round-5 margin bank: the tail is SPLIT into a 20x6 phase plus a 4x8
# accurate finishing phase — same 24 tail outer iterations, +4% Dykstra
# work (200 vs 196 iteration-equivalents), which buys the worst measured
# dataset down from 8.42e-7 to 7.50e-7 (the round-4 margin-recovery scan,
# confirmed on the pinned worst-case fixtures and a fresh 48-dataset f64
# sweep; docs/performance.md). Lengthening the tail without splitting does
# NOT move the floor (24->32 at 6 Dykstra: unchanged).
PARITY_TUNED_2Q = dict(
    phases=((10, 1, 1), (10, 2, 1), (20, 6, 1), (4, 8, 1)),
    init_iters=6, init_sweeps=3, final_iters=12, final_sweeps=1,
    mu=1.5 / 32)

# Round-3 tuned 2Q HEADLINE (statistical-equivalence) configuration. With the
# validated 2x step (mu scale 0.5) a 9-Dykstra-iteration schedule — project
# the linear-inversion start (2 iterations, 3 sweeps), five momentum steps
# with 1-iteration inexact projections, a 2-iteration final projection — is
# BOTH faster and statistically tighter than the early-exit XLA warm-APG
# while_loop path that owned the headline through round 2:
#
# - f64 likelihood-ratio statistic 2*N*deltaLL vs the converged reference
#   optimum, worst over 16 datasets (4 seeds x shots in {500,1000,2000,8000}):
#   3.66, vs 5.15 for the XLA warm-APG headline config on the SAME datasets
#   (1-sigma region for this 240-parameter model: ~240) — tighter on 15 of
#   the 16 datasets.
# - f32 mean relative Frobenius reconstruction error at 2000 shots/setting:
#   0.10007 vs the XLA path's 0.10019 (same shot-noise plateau).
# - Measured (v5e, batch 16384, single dispatch incl. host fetch):
#   ~140k solves/s vs the XLA path's 68-84k.
#
# The LLR-vs-schedule-length curve is NON-monotone at the short end (e.g.
# 16-iteration schedules measure worst-LLR ~16): the momentum trajectory
# overshoots the optimum before reconverging, and this 9-iteration schedule
# sits in the measured sweet spot where the final projection lands on the
# plateau. All candidate schedules are orders of magnitude inside the
# 1-sigma region — the choice optimizes speed at equal statistical quality;
# docs/performance.md has the full scan.
HEADLINE_TUNED_2Q = dict(
    phases=((5, 1, 1),), init_iters=2, init_sweeps=3,
    final_iters=2, final_sweeps=1, mu=1.5 / 32)


def apg_fused_lanes(ar, ai, n_mat, rho0_r, rho0_i, *, dim: int,
                    phases: Sequence[Tuple[int, int, int]] = PARITY_PHASES,
                    init_iters: int = 8, init_sweeps: int = 3,
                    final_iters: int = 20, final_sweeps: int = 1,
                    final_sweeps_rest: int = None,
                    mu: float = None):
    """Run the fused APG solve on lanes-layout inputs.

    :param ar, ai: (R, d4) real/imag planes of the raster-ordered A-matrix
        (the gradient contraction reuses the same arrays with transposed
        dimension numbers — no transposed copies are materialized).
    :param n_mat: (R, B) normalized counts, one column per problem.
    :param rho0_r, rho0_i: (d2, d2, B) linear-inversion (or any) starting
        matrices; they are Dykstra-projected before the first gradient step.
    :param phases: static schedule of (outer_iters, dykstra_iters, sweeps).
    :param init_iters/init_sweeps: Dykstra schedule for projecting rho0 (the
        first projection runs cold, so it gets extra sweeps).
    :param final_iters/final_sweeps: the converged projection applied to the
        returned estimate (ends on the TP half-step; exactly TP).
    :return: (est_r, est_i) planes of shape (d2, d2, B).
    """
    n = dim * dim
    rdtype = ar.dtype
    batch = n_mat.shape[1:]          # any rank; (B,) classic, (S, 128) vreg
    n_flat = n_mat.reshape(n_mat.shape[0], -1)       # (R, flatB)
    eps_rot = jnp.asarray(1e-30 if rdtype == jnp.float64 else 1e-18, rdtype)
    eps_p = jnp.asarray(1e-6, rdtype)
    if mu is None:
        mu = 3.0 / (2 * dim ** 2)
    inv_mu = jnp.asarray(1.0 / mu, rdtype)

    def prob(xr, xi):
        """p = Re(A vec(X)) >= eps, shape (R, flatB)."""
        vrr = xr.reshape(n * n, -1)
        vii = xi.reshape(n * n, -1)
        p = jnp.dot(ar, vrr, preferred_element_type=rdtype) - \
            jnp.dot(ai, vii, preferred_element_type=rdtype)
        return jnp.maximum(p, eps_p)

    def cost(xr, xi):
        p = prob(xr, xi)
        return -jnp.sum(n_flat * jnp.log(p), axis=0, keepdims=True)  # (1, fB)

    def grad(xr, xi):
        eta = n_flat / prob(xr, xi)
        # A^T eta without materializing A^T: contract over the row axis
        tdot = lambda m: jax.lax.dot_general(
            m, eta, (((0,), (0,)), ((), ())), preferred_element_type=rdtype)
        gr = -tdot(ar)
        gi = tdot(ai)
        return gr.reshape(n, n, *batch), gi.reshape(n, n, *batch)

    eye = _eye_planes(n, batch, rdtype)
    v_r, v_i = eye, jnp.zeros_like(eye)

    # warm start: Dykstra-project rho0 (first CP projection runs cold)
    est_r, est_i, v_r, v_i = _dykstra(rho0_r, rho0_i, v_r, v_i, init_iters,
                                      init_sweeps, dim, eps_rot)
    prev_r, prev_i = est_r, est_i
    t = jnp.ones((1, int(np.prod(batch))), rdtype)
    old_cost = cost(est_r, est_i)

    for phase in phases:
        # (outer, dykstra_iters, sweeps[, sweeps_rest]) — the optional 4th
        # entry makes inner Dykstra iterations after the first sweep-free
        # (see _dykstra)
        iters, ld, sweeps = phase[:3]
        srest = phase[3] if len(phase) == 4 else None

        def body(_, carry, ld=ld, sweeps=sweeps, srest=srest):
            est_r, est_i, prev_r, prev_i, v_r, v_i, t, old_cost = carry
            t_next = (1 + jnp.sqrt(1 + 4 * t * t)) / 2
            # multi-rank batches broadcast beta as a (*batch,) suffix —
            # expanding interior size-1 majors is the Mosaic-crash pattern
            beta = ((t - 1) / t_next).reshape(
                (1, 1, *batch) if len(batch) == 1 else batch)
            y_r = est_r + beta * (est_r - prev_r)
            y_i = est_i + beta * (est_i - prev_i)
            g_r, g_i = grad(y_r, y_i)
            z_r = y_r - inv_mu * g_r
            z_i = y_i - inv_mu * g_i
            cand_r, cand_i, v_r, v_i = _dykstra(z_r, z_i, v_r, v_i, ld,
                                                sweeps, dim, eps_rot,
                                                sweeps_rest=srest)
            new_cost = cost(cand_r, cand_i)
            # O'Donoghue-Candes function restart
            t_next = jnp.where(new_cost > old_cost, jnp.ones_like(t_next),
                               t_next)
            return (cand_r, cand_i, est_r, est_i, v_r, v_i, t_next, new_cost)

        carry = (est_r, est_i, prev_r, prev_i, v_r, v_i, t, old_cost)
        carry = jax.lax.fori_loop(0, iters, body, carry)
        est_r, est_i, prev_r, prev_i, v_r, v_i, t, old_cost = carry

    est_r, est_i, _, _ = _dykstra(est_r, est_i, v_r, v_i, final_iters,
                                  final_sweeps, dim, eps_rot,
                                  sweeps_rest=final_sweeps_rest)
    return est_r, est_i


# ----------------------------------------------------------------------
# Batched entry point: (B, d2, d2) complex -> (B, d2, d2) complex
# ----------------------------------------------------------------------

def _have_pallas() -> bool:
    try:
        from jax.experimental import pallas as pl  # noqa: F401
        from jax.experimental.pallas import tpu as pltpu  # noqa: F401
        return jax.default_backend() not in ("cpu",)
    except Exception:  # noqa: BLE001
        return False


@functools.partial(jax.jit, static_argnames=(
    "dim", "phases", "init_iters", "init_sweeps", "final_iters",
    "final_sweeps", "final_sweeps_rest", "block", "use_pallas", "mu",
    "sublanes"))
def apg_fused(a: jnp.ndarray, n_counts: jnp.ndarray, dim: int,
              phases: Tuple[Tuple[int, int, int], ...] = PARITY_PHASES,
              init_iters: int = 8, init_sweeps: int = 3,
              final_iters: int = 20, final_sweeps: int = 1,
              final_sweeps_rest: int = None,
              block: int = 128, use_pallas: bool = True,
              mu: float = None, a_pinv: jnp.ndarray = None,
              sublanes: int = None) -> jnp.ndarray:
    """Fused-APG batched PGDB MLE: (R, d4) A-matrix (vec order, as used by
    ``pgdb_process_estimate_batched``), (B, R) counts -> (B, d2, d2) Chois.

    Warm-starts from the linear-inversion estimate (pinv(A) n), then runs the
    static-schedule fused APG. On TPU the solve runs as a Pallas kernel over
    batch blocks (whole solver VMEM-resident); elsewhere the identical jnp
    code runs under XLA — same numerics.

    ``a_pinv`` (optional, (d4, R)): precomputed ``jnp.linalg.pinv(a)``. The
    A-matrix is fixed per experiment design, so production callers solving
    many batches should compute the pseudo-inverse once — the in-call SVD
    is a measurable fraction of a batch solve (docs/performance.md).

    ``sublanes`` selects the kernel's batch layout. ``1`` (classic lanes):
    planes are (d2, d2, block) with the batch in the lane axis only — matrix
    rows/cols land in the sublane axis, so every Jacobi pair slice and
    permutation is a sublane-granularity shuffle. ``8`` (vreg layout): each
    grid step takes ``sublanes * 128`` problems as a (d2, d2, sublanes, 128)
    block whose trailing (8, 128) axes fill whole TPU vregs — every matrix
    entry is vreg-aligned, so the sweep's pair addressing and the composed
    transition permutations move untiled major axes (near-free) instead of
    shuffling sublanes. Identical numerics (same op sequence per problem).

    Default (``sublanes=None``): auto — the vreg layout whenever the Pallas
    path is live and the batch tiles into whole (8, 128) vregs, else the
    classic layout. TPU-measured at batch 16384 (v5e, round 4): the vreg
    layout is 3.0x on the parity schedule (12.45k -> 37.4k solves/s) and
    1.79x on the headline schedule (144.0k -> 258.1k); full table in
    docs/performance.md.
    """
    d2 = dim * dim
    rdtype = jnp.real(a).dtype
    # host-order preparation inside jit: raster-permute A columns
    a_rast = a.reshape(-1, d2, d2).transpose(0, 2, 1).reshape(a.shape[0], -1)
    ar = jnp.real(a_rast).astype(rdtype)
    ai = jnp.imag(a_rast).astype(rdtype)

    # linear-inversion warm start (shared pinv, batched matvec)
    if a_pinv is None:
        a_pinv = jnp.linalg.pinv(a)
    x0 = a_pinv @ n_counts.astype(a.dtype).T               # (d4, B) vec order
    b = n_counts.shape[0]
    rho0 = x0.T.reshape(b, d2, d2).transpose(0, 2, 1)       # unvec (col-stack)
    rho0 = (rho0 + jnp.conj(jnp.swapaxes(rho0, -1, -2))) / 2
    tr = jnp.real(jnp.trace(rho0, axis1=-2, axis2=-1))
    scale = (dim / jnp.where(jnp.abs(tr) < 1e-12, 1.0, tr)).astype(rho0.dtype)
    rho0 = rho0 * scale[:, None, None]
    # lanes layout
    rho0_r = jnp.transpose(jnp.real(rho0), (1, 2, 0)).astype(rdtype)
    rho0_i = jnp.transpose(jnp.imag(rho0), (1, 2, 0)).astype(rdtype)
    n_mat = n_counts.T.astype(rdtype)                        # (R, B)

    kw = dict(dim=dim, phases=tuple(phases), init_iters=init_iters,
              init_sweeps=init_sweeps, final_iters=final_iters,
              final_sweeps=final_sweeps, final_sweeps_rest=final_sweeps_rest,
              mu=mu)

    try:
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        def _compiler_params():
            try:
                return pltpu.CompilerParams(
                    vmem_limit_bytes=100 * 1024 * 1024)
            except TypeError:  # older jax spelling
                return pltpu.TPUCompilerParams(
                    vmem_limit_bytes=100 * 1024 * 1024)
    except Exception:  # noqa: BLE001
        pl = pltpu = None

    r_rows = ar.shape[0]

    if sublanes is None:
        # auto layout: vreg when the kernel will actually run under Pallas
        # AND the batch tiles into whole (8, 128) f32 vregs; classic
        # otherwise (CPU testing, small/ragged batches)
        sublanes = 8 if (use_pallas and _have_pallas()
                         and b % (8 * 128) == 0) else 1

    def _run_pallas(n_in, rr_in, ri_in, n_spec, mat_spec, out_shape, grid):
        # one pallas_call for both batch layouts; only the batch-axis
        # BlockSpecs and shapes differ between the classic-lanes and vreg
        # paths (the kernel body is layout-agnostic: apg_fused_lanes treats
        # every axis after the first two as batch)
        def kernel(ar_ref, ai_ref, n_ref, r0r_ref, r0i_ref,
                   outr_ref, outi_ref):
            er, ei = apg_fused_lanes(ar_ref[:], ai_ref[:], n_ref[:],
                                     r0r_ref[:], r0i_ref[:], **kw)
            outr_ref[:] = er
            outi_ref[:] = ei

        shared2 = lambda shape: pl.BlockSpec(shape, lambda i: (0, 0),
                                             memory_space=pltpu.VMEM)
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[shared2(ar.shape), shared2(ai.shape), n_spec,
                      mat_spec, mat_spec],
            out_specs=[mat_spec, mat_spec],
            out_shape=[jax.ShapeDtypeStruct(out_shape, rdtype),
                       jax.ShapeDtypeStruct(out_shape, rdtype)],
            compiler_params=_compiler_params(),
        )(ar, ai, n_in, rr_in, ri_in)

    if sublanes > 1:
        # vreg layout: batch as (B/128, 128); each grid step takes
        # (sublanes, 128) of it so the trailing axes tile whole vregs
        step = sublanes * 128
        if b % step == 0:
            lanes = 128
        elif b % sublanes == 0:
            # CPU/XLA testing with small batches: any (B/sublanes) split
            # preserves the multi-rank graph; the Pallas path (which needs
            # the full (8, 128) vreg tile) requires b % (sublanes*128) == 0
            lanes = b // sublanes
        else:
            raise ValueError(f"batch {b} must be divisible by "
                             f"sublanes ({sublanes})")
        n4 = n_mat.reshape(r_rows, b // lanes, lanes)
        r4r = rho0_r.reshape(d2, d2, b // lanes, lanes)
        r4i = rho0_i.reshape(d2, d2, b // lanes, lanes)
        if use_pallas and _have_pallas() and lanes == 128:
            est_r, est_i = _run_pallas(
                n4, r4r, r4i,
                n_spec=pl.BlockSpec((r_rows, sublanes, 128),
                                    lambda i: (0, i, 0),
                                    memory_space=pltpu.VMEM),
                mat_spec=pl.BlockSpec((d2, d2, sublanes, 128),
                                      lambda i: (0, 0, i, 0),
                                      memory_space=pltpu.VMEM),
                out_shape=(d2, d2, b // 128, 128),
                grid=(b // step,))
        else:
            est_r, est_i = apg_fused_lanes(ar, ai, n4, r4r, r4i, **kw)
        est_r = est_r.reshape(d2, d2, b)
        est_i = est_i.reshape(d2, d2, b)
    # Mosaic requires the lane (batch-block) dimension to be a multiple of
    # 128; anything else falls back to the identical-numerics XLA path
    elif (use_pallas and _have_pallas() and block % 128 == 0
            and b % block == 0 and b >= block):
        est_r, est_i = _run_pallas(
            n_mat, rho0_r, rho0_i,
            n_spec=pl.BlockSpec((r_rows, block), lambda i: (0, i),
                                memory_space=pltpu.VMEM),
            mat_spec=pl.BlockSpec((d2, d2, block), lambda i: (0, 0, i),
                                  memory_space=pltpu.VMEM),
            out_shape=(d2, d2, b),
            grid=(b // block,))
    else:
        est_r, est_i = apg_fused_lanes(ar, ai, n_mat, rho0_r, rho0_i, **kw)

    est = est_r + 1j * est_i
    return jnp.transpose(est, (2, 0, 1)).astype(a.dtype)


def apg_fused_sharded(a: jnp.ndarray, n_counts: jnp.ndarray, mesh,
                      axis_name: str = "batch", **kw) -> jnp.ndarray:
    """Run :func:`apg_fused` with the problem batch sharded across a mesh.

    A bare ``pallas_call`` does not auto-partition across devices, so the
    multi-chip path wraps the solver in ``shard_map``: each device runs the
    full fused kernel (Pallas on TPU, the identical-numerics XLA path
    elsewhere) on its local batch shard, with the A-matrix replicated. The
    solve is elementwise in the batch dimension, so no collectives appear in
    the hot loop — scaling is linear over ICI by construction.

    :param a: (R, d4) complex A-matrix (replicated on every device).
    :param n_counts: (B, R) normalized counts; B must divide evenly by the
        mesh size, and each per-device shard must still satisfy
        :func:`apg_fused`'s ``block`` divisibility to take the Pallas path
        (otherwise that shard falls back to XLA — same numerics).
    :param mesh: a ``jax.sharding.Mesh`` with ``axis_name`` as its (only)
        batch axis, e.g. from ``parallel.make_mesh()``.
    :param kw: forwarded to :func:`apg_fused` (``dim`` is required).
    """
    from forest_benchmarking_tpu.parallel import shard_map_batched

    if n_counts.shape[0] % mesh.shape[axis_name] != 0:
        raise ValueError(
            f"batch {n_counts.shape[0]} must be divisible by the mesh axis "
            f"{axis_name!r} size {mesh.shape[axis_name]}")
    mapped = shard_map_batched(lambda a_, n_: apg_fused(a_, n_, **kw),
                               mesh, batched_argnums=(1,),
                               axis_name=axis_name)
    return mapped(a, n_counts)
