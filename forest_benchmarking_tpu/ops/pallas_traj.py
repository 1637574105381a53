"""Fused Pallas kernel for Kraus-trajectory noisy-QV statevector evolution.

The XLA formulation of the trajectory kernel (quantum_volume.py
``_simulate_qv_circuit_traj``) spends its time in unfused HBM round-trips:
every gate/channel/permutation step reads and writes the whole
(circuits x 2^depth x trajectories) state, and the basis-permutation gathers
and per-lane Kraus application lower poorly. This kernel keeps one
(2^depth, lane-block) state block VMEM-resident for the ENTIRE circuit
(lane block = largest of 512/256/128 dividing the trajectory count;
512 measured fastest at depth 8):

- **Permutations as one-hot matmuls.** Pallas TPU lowers no gather; each
  layer-boundary basis permutation h becomes a (2^d, 2^d) one-hot matrix
  built in-kernel from an index row (two compares) and applied on the MXU.
  Consecutive boundaries are pre-composed on indices (h = inv_l o fwd_{l+1})
  outside the kernel, so there is ONE perm matmul per boundary, not two.
- **Branch selection on the MXU.** The per-trajectory Kraus weights
  p_k = <psi|K_k^dag K_k|psi> come from the pair-reduced density (16
  reductions) contracted against the precomputed M_k in one (K, 16) x
  (16, T) matmul; the sampled operator is materialized per-lane as
  Ksel = sel^T K (another small matmul) and applied as broadcast FMAs.
- **Layers under fori_loop.** The loop body indexes gates/uniforms/index
  maps by the layer counter, so the traced kernel holds one layer, keeping
  Mosaic compile time flat in depth.

Same math as the XLA kernel: given identical uniforms both samplers draw
from identical per-slot branch distributions (tested in interpret mode).
Reference semantics: forest quantum_volume.py:94-118 (heavy outputs) with
noise per applied gate, cf. docs/performance.md round-3 notes.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

__all__ = ["traj_probs_pallas", "ideal_probs_pallas", "supports_pallas_traj",
           "traj_flops_per_circuit"]

_LB = 128  # minimum trajectory lane block (Mosaic lane width)


def supports_pallas_traj(depth: int) -> bool:
    """Pallas path constraint: every slot reshape keeps the second-minor dim
    >= 8 sublanes, which holds for depth >= 7 (r = 2^(depth-j-2) >= 8)."""
    if depth < 7:
        return False
    try:
        from jax.experimental import pallas as pl  # noqa: F401
        from jax.experimental.pallas import tpu as pltpu  # noqa: F401
        return True
    except Exception:  # noqa: BLE001
        return False


def _boundary_maps(perms: jnp.ndarray, depth: int) -> jnp.ndarray:
    """Compose per-layer basis permutations into boundary index maps.

    ``fwd_l`` permutes amplitudes so layer l's gates act at static positions
    (psi_l[x] = psi_orig[fwd_l[x]]); the kernel applies one boundary map per
    layer: h_0 = fwd_0, h_l = inv_{l-1}[fwd_l] (leave layer l-1's basis and
    enter layer l's in one step), and h_depth = inv_{depth-1} restores the
    original basis at the end.

    :param perms: (depth, depth) int array of qubit permutations.
    :return: (depth + 1, 2^depth) int32 index maps.
    """
    from forest_benchmarking_tpu.quantum_volume import _bit_permute_indices

    fwd = jnp.stack([_bit_permute_indices(perms[l], depth)
                     for l in range(depth)])          # (depth, 2^d)
    inv = jnp.argsort(fwd, axis=1)
    hs = [fwd[0]]
    for l in range(1, depth):
        hs.append(inv[l - 1][fwd[l]])
    hs.append(inv[depth - 1])
    return jnp.stack(hs).astype(jnp.int32)


def _kernel(h_ref, g_ref, u_ref, kr_ref, m_ref, out_ref, *, depth: int,
            n_kraus: int, lb: int, noiseless: bool = False,
            perm_split3: bool = False):
    """One (circuit, lane-block) instance: evolve (2^d, LB) trajectories.

    h_ref: (1, depth+1, 2^d) int32 boundary index maps      [VMEM]
    g_ref: (1, depth, depth//2, 2, 16) f32 gate planes      [VMEM]
    u_ref: (1, depth, depth//2, LB) f32 branch uniforms     [VMEM]
    kr_ref: noisy: (1, depth, depth//2, 2, K, 16) f32 fused gate-Kraus
        planes W_k = K_k U (per circuit/layer/slot); noiseless: (2, K, 16)
        dummy                                               [VMEM]
    m_ref: noisy: (1, depth, depth//2, 2, K, 16) f32 rotated-POVM planes
        (U^dag K_k^dag K_k U)^T; noiseless: (2, K, 16) dummy [VMEM]
    out_ref: (1, 2^d, LB) f32 per-trajectory probabilities  [VMEM]

    ``noiseless=True`` skips every channel step (all lanes then evolve the
    IDEAL circuit via the per-slot gate apply) — used to compute the
    heavy-set probabilities in-kernel instead of through the unfused XLA
    statevector simulator.

    In the noisy mode the per-slot Haar gate is FUSED into the channel:
    branch weights come from the pre-gate state through the rotated POVM
    (p_k = tr(M_k U rho U^dag) = tr((U^dag M_k U) rho)), and the sampled
    branch applies the precomposed W_k = K_k U — ONE 4x4 apply per slot
    instead of gate-then-Kraus (the gate apply was ~1/3 of the slot's VPU
    work; the 4x4 compositions are precomputed outside the kernel and
    amortize over the trajectory lanes).
    """
    d = 2 ** depth
    slots = depth // 2
    hi = jax.lax.Precision.HIGHEST
    f32 = jnp.float32

    iota_col = jax.lax.broadcasted_iota(jnp.int32, (d, d), 0)

    def permute(pr, pi, l):
        """psi[x] <- psi[h[x]] via a one-hot contraction on the MXU.

        Two exact forms, selected by ``perm_split3``:

        - False: Precision.HIGHEST (6-pass bf16) f32 dots — exact selection.
          Measured round 4 (interleaved A/B on chip, depth 8, C=256, T=1024)
          for the NOISY kernel: the 3-term split below is only ~3.5% faster
          there (perm matmuls are ~12% of the noisy kernel's time — it is
          NOT MXU-pass bound, see docs/performance.md), so the noisy path
          keeps this proven form. Mosaic rejects Precision.HIGH
          ("Unsupported dot precision") and lowers no optimization_barrier.
        - True: 3-term bf16 split of psi (hi/mid/lo bf16 planes, three
          single-pass dots, f32 accumulate) — BIT-EXACT vs the 6-pass form
          (the one-hot is 0/1, exactly representable in bf16; each dot
          selects one split term and the three-term sum reconstructs the f32
          value exactly). Halves the MXU passes: in the NOISELESS kernel the
          perm matmuls dominate (the 128 redundant lanes make the per-slot
          gate work tiny), so the ideal path uses this form.
        """
        h_row = h_ref[0, l].reshape(1, d)                 # (1, d)
        dn = (((0,), (0,)), ((), ()))
        if perm_split3:
            onehot_t = (iota_col == h_row).astype(jnp.bfloat16)

            def sel(x):
                x1 = x.astype(jnp.bfloat16)
                r1 = x - x1.astype(f32)
                x2 = r1.astype(jnp.bfloat16)
                r2 = r1 - x2.astype(f32)
                x3 = r2.astype(jnp.bfloat16)
                out = None
                for term in (x1, x2, x3):
                    # explicit DEFAULT precision: the ambient "highest"
                    # config would stamp fp32 contract precision on a bf16
                    # dot, which Mosaic rejects ("Bad lhs type")
                    dot = jax.lax.dot_general(
                        onehot_t, term, dn,
                        precision=jax.lax.Precision.DEFAULT,
                        preferred_element_type=f32)
                    out = dot if out is None else out + dot
                return out

            return sel(pr), sel(pi)
        onehot_t = (iota_col == h_row).astype(f32)        # [y, x] = (y==h[x])
        return (jax.lax.dot_general(onehot_t, pr, dn, precision=hi,
                                    preferred_element_type=f32),
                jax.lax.dot_general(onehot_t, pi, dn, precision=hi,
                                    preferred_element_type=f32))

    def apply_4x4(pr, pi, j, coef_r, coef_i, scalar_coefs):
        """Apply a 4x4 complex operator at positions (j, j+1).

        ``scalar_coefs=True``: coef_* index scalars (shared gate);
        otherwise coef_* is a (16, LB) per-lane plane (sampled Kraus)."""
        left = 2 ** j
        right = 2 ** (depth - j - 2)
        pr4 = pr.reshape(left, 4, right, lb)
        pi4 = pi.reshape(left, 4, right, lb)
        outs_r, outs_i = [], []
        for a in range(4):
            acc_r = None
            acc_i = None
            for b in range(4):
                if scalar_coefs:
                    cr = coef_r[a * 4 + b]
                    ci = coef_i[a * 4 + b]
                else:
                    cr = coef_r[a * 4 + b].reshape(1, 1, lb)
                    ci = coef_i[a * 4 + b].reshape(1, 1, lb)
                tr = cr * pr4[:, b] - ci * pi4[:, b]
                ti = cr * pi4[:, b] + ci * pr4[:, b]
                acc_r = tr if acc_r is None else acc_r + tr
                acc_i = ti if acc_i is None else acc_i + ti
            outs_r.append(acc_r)
            outs_i.append(acc_i)
        new_r = jnp.stack(outs_r, axis=1).reshape(d, lb)
        new_i = jnp.stack(outs_i, axis=1).reshape(d, lb)
        return new_r, new_i

    def channel(pr, pi, j, l):
        m_r = m_ref[0, l, j, 0]           # (K, 16) rotated-POVM^T planes
        m_i = m_ref[0, l, j, 1]
        kr_r = kr_ref[0, l, j, 0]         # (K, 16) fused W_k = K_k U planes
        kr_i = kr_ref[0, l, j, 1]
        left = 2 ** j
        right = 2 ** (depth - j - 2)
        pr4 = pr.reshape(left, 4, right, lb)
        pi4 = pi.reshape(left, 4, right, lb)
        # pair-reduced density rho[a,b] = sum_{l,r} psi_a conj(psi_b).
        # Hermiticity halves the expensive (d/4, LB)-plane products: the
        # a > b entries reuse the a < b reductions BIT-EXACTLY (rr is a
        # symmetric expression with identical elementwise/reduce order; ri
        # negates, which is exact), and the diagonal imaginary parts are
        # exactly zero (the old code computed sum(x - x))
        zero_row = jnp.zeros((1, lb), f32)
        rows_r = {}
        rows_i = {}
        for a in range(4):
            for b in range(a, 4):
                rr = jnp.sum((pr4[:, a] * pr4[:, b]
                              + pi4[:, a] * pi4[:, b]).reshape(-1, lb),
                             axis=0, keepdims=True)
                rows_r[(a, b)] = rows_r[(b, a)] = rr
                if a == b:
                    rows_i[(a, a)] = zero_row
                else:
                    ri = jnp.sum((pi4[:, a] * pr4[:, b]
                                  - pr4[:, a] * pi4[:, b]).reshape(-1, lb),
                                 axis=0, keepdims=True)
                    rows_i[(a, b)] = ri
                    rows_i[(b, a)] = -ri
        rho_r = jnp.concatenate([rows_r[(a, b)] for a in range(4)
                                 for b in range(4)], axis=0)  # (16, LB) [a*4+b]
        rho_i = jnp.concatenate([rows_i[(a, b)] for a in range(4)
                                 for b in range(4)], axis=0)
        # p_k = sum_ab M'_k[a,b] rho[b,a] with M'_k = U^dag K_k^dag K_k U
        # the PRE-gate branch weight (real by hermiticity); m_ref holds M'
        # TRANSPOSED (built host-side), so the contraction is direct
        dn = (((1,), (0,)), ((), ()))
        p = (jax.lax.dot_general(m_r, rho_r, dn, precision=hi,
                                 preferred_element_type=f32)
             - jax.lax.dot_general(m_i, rho_i, dn, precision=hi,
                                   preferred_element_type=f32))  # (K, LB)
        p = jnp.maximum(p, 0.0)
        p = p / jnp.sum(p, axis=0, keepdims=True)
        u = u_ref[0, l, j].reshape(1, lb)
        # branch k* = number of cumulative sums strictly below u (same rule
        # as the XLA kernel); Mosaic lowers no cumsum, so unroll the K=16
        # running sum and materialize a one-hot row mask
        run = jnp.zeros((1, lb), f32)
        below_rows = []
        for k in range(n_kraus):
            run = run + p[k:k + 1]
            below_rows.append((run < u).astype(f32))
        below = jnp.concatenate(below_rows, axis=0)        # (K, LB)
        idx = jnp.sum(below.astype(jnp.int32), axis=0,
                      keepdims=True)                       # (1, LB) in [0, K)
        krange = jax.lax.broadcasted_iota(jnp.int32, (n_kraus, lb), 0)
        sel = (krange == jnp.minimum(idx, n_kraus - 1)).astype(f32)
        # Ksel[ab, t] = sum_k sel[k, t] K_k[ab]
        dnk = (((0,), (0,)), ((), ()))
        ks_r = jax.lax.dot_general(kr_r, sel, dnk, precision=hi,
                                   preferred_element_type=f32)  # (16, LB)
        ks_i = jax.lax.dot_general(kr_i, sel, dnk, precision=hi,
                                   preferred_element_type=f32)
        # NO per-slot renormalization: the branch weights are normalized
        # (p / sum p), which is invariant to the state's norm, so the norm
        # may decay by the sampled branch weight across the layer's slots
        # and be restored ONCE per layer (layer_body) — the sampled-branch
        # distribution and the final normalized probabilities are exactly
        # the same math, and the norm cannot underflow f32 within a layer
        # (>= (p_min/K)^(depth/2) ~ 1e-12 worst case vs 1e-38 min normal).
        # Saves 3 of 4 norm-reduce+rescale passes over the (2^d, LB) planes.
        return apply_4x4(pr, pi, j, ks_r, ks_i, scalar_coefs=False)

    row = jax.lax.broadcasted_iota(jnp.int32, (d, lb), 0)
    psi_r = jnp.where(row == 0, 1.0, 0.0).astype(f32)   # |0...0>
    psi_i = jnp.zeros((d, lb), f32)

    def layer_body(l, carry):
        pr, pi = carry
        pr, pi = permute(pr, pi, l)
        for j in range(slots):
            if noiseless:
                g_r = g_ref[0, l, j, 0]                    # (16,)
                g_i = g_ref[0, l, j, 1]
                pr, pi = apply_4x4(pr, pi, j, g_r, g_i, scalar_coefs=True)
            else:
                # gate fused into the channel (W_k = K_k U planes)
                pr, pi = channel(pr, pi, j, l)
        if not noiseless:
            # one renormalization per LAYER (see channel's norm note)
            nrm2 = jnp.sum(pr * pr + pi * pi, axis=0, keepdims=True)
            inv = jax.lax.rsqrt(jnp.maximum(nrm2, 1e-30))
            pr, pi = pr * inv, pi * inv
        return pr, pi

    psi_r, psi_i = jax.lax.fori_loop(0, depth, layer_body, (psi_r, psi_i))
    psi_r, psi_i = permute(psi_r, psi_i, depth)            # back to original
    p = psi_r * psi_r + psi_i * psi_i
    out_ref[0] = p / jnp.sum(p, axis=0, keepdims=True)


@functools.partial(jax.jit, static_argnames=("depth", "interpret"))
def traj_probs_pallas(perms: jnp.ndarray, gates_ri: jnp.ndarray,
                      kraus_ri: jnp.ndarray, uniforms: jnp.ndarray,
                      depth: int, interpret: bool = False) -> jnp.ndarray:
    """Per-trajectory noisy output probabilities, fused on TPU.

    :param perms: (C, depth, depth) int permutations.
    :param gates_ri: (2, C, depth, depth//2, 4, 4) f32 Haar-gate planes.
    :param kraus_ri: (2, K, 4, 4) f32 Kraus planes.
    :param uniforms: (C, depth, depth//2, T) f32; T must be a multiple of 128.
    :return: (C, 2^depth, T) f32 probabilities (columns sum to 1).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    c = perms.shape[0]
    t = uniforms.shape[-1]
    if t % _LB != 0:
        raise ValueError(f"trajectory count {t} must be a multiple of {_LB}")
    # largest lane block dividing T wins: 512 measured ~8% faster than 128
    # at depth 8 (fewer grid steps, fuller perm-matmul tiles), 256 slower
    lb = max(b for b in (512, 256, 128) if t % b == 0)
    d = 2 ** depth
    slots = depth // 2
    n_kraus = kraus_ri.shape[1]
    f32 = jnp.float32

    hmaps = jax.vmap(lambda p: _boundary_maps(p, depth))(perms)  # (C, depth+1, d)
    gates = jnp.transpose(gates_ri, (1, 2, 3, 0, 4, 5)).reshape(
        c, depth, slots, 2, 16).astype(f32)
    hi = jax.lax.Precision.HIGHEST
    gates_c = (gates_ri[0] + 1j * gates_ri[1]).astype(jnp.complex64)
    kraus = (kraus_ri[0] + 1j * kraus_ri[1]).reshape(-1, 4, 4)
    m_ops = jnp.einsum("kba,kbc->kac", jnp.conj(kraus), kraus, precision=hi)
    # fuse the per-slot gate into the channel (one 4x4 apply per slot in the
    # kernel): the sampled branch applies W_k = K_k U, and the branch weights
    # come from the PRE-gate state through the rotated POVM
    # M'_k = U^dag M_k U (tr(M_k U rho U^dag) = tr(M'_k rho)); these 4x4
    # compositions are cheap here (no trajectory axis) and amortize over all
    # T lanes in the kernel
    w = jnp.einsum("kab,cljbe->cljkae", kraus, gates_c, precision=hi)
    mp = jnp.einsum("cljba,kbe,cljef->cljkaf", jnp.conj(gates_c), m_ops,
                    gates_c, precision=hi)
    # the kernel contracts p_k = sum_ab M'[a,b] rho[b,a]; ship M' transposed
    # so the in-kernel contraction needs no relayout
    mp_t = jnp.swapaxes(mp, -1, -2)

    def planes(x):
        return jnp.stack([jnp.real(x), jnp.imag(x)], axis=3).reshape(
            c, depth, slots, 2, n_kraus, 16).astype(f32)

    return _traj_pallas_call(hmaps, gates, uniforms.astype(f32), planes(w),
                             planes(mp_t), depth=depth, n_kraus=n_kraus,
                             lb=lb, noiseless=False, interpret=interpret)


def _traj_pallas_call(hmaps, gates, uniforms, kr, m, *, depth, n_kraus, lb,
                      noiseless, interpret, perm_split3=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    c = hmaps.shape[0]
    t = uniforms.shape[-1]
    d = 2 ** depth
    slots = depth // 2
    grid = (c, t // lb)
    kern = functools.partial(_kernel, depth=depth, n_kraus=n_kraus, lb=lb,
                             noiseless=noiseless, perm_split3=perm_split3)
    try:
        compiler_params = pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024)
    except TypeError:  # older jax spelling
        compiler_params = pltpu.TPUCompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024)
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, depth + 1, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, depth, slots, 2, 16), lambda i, j: (i, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, depth, slots, lb), lambda i, j: (i, 0, 0, j),
                         memory_space=pltpu.VMEM),
        ] + ([
            # noiseless: shared (unused) dummy planes
            pl.BlockSpec((2, n_kraus, 16), lambda i, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, n_kraus, 16), lambda i, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ] if noiseless else [
            # noisy: per-circuit fused gate-Kraus (W_k = K_k U) and rotated
            # POVM (U^dag M_k U)^T planes, one slot block each layer step
            pl.BlockSpec((1, depth, slots, 2, n_kraus, 16),
                         lambda i, j: (i, 0, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, depth, slots, 2, n_kraus, 16),
                         lambda i, j: (i, 0, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ]),
        out_specs=pl.BlockSpec((1, d, lb), lambda i, j: (i, 0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((c, d, t), jnp.float32),
        compiler_params=compiler_params,
        interpret=interpret,
    )(hmaps, gates, uniforms, kr, m)


@functools.partial(jax.jit, static_argnames=("depth", "interpret",
                                             "perm_split3"))
def ideal_probs_pallas(perms: jnp.ndarray, gates_ri: jnp.ndarray,
                       depth: int, interpret: bool = False,
                       perm_split3: bool = True) -> jnp.ndarray:
    """Ideal (noiseless) output probabilities via the fused kernel.

    Replaces the unfused XLA statevector simulation both for the heavy-set
    computation in the noisy-QV trajectory path and for the ideal QV path
    itself (the XLA path reads/writes the whole (C, 2^d) state from HBM at
    every gate and lowers the basis-permutation gathers poorly; measured
    round 5 on v5e at depth 8, C=1600: 10.4k vs 4.5k circuits/s end-to-end
    through ``sample_heavy_outputs_batched``, max prob diff 1.3e-7). Runs
    one minimum-width (128-lane)
    noiseless block per circuit — lanes are redundant (every lane evolves
    the same ideal circuit; permutation maps are per-circuit data so they
    cannot be batched into lanes) but the whole evolution is one
    VMEM-resident kernel instance. ``perm_split3=True`` (default) applies
    the boundary permutations as three single-pass bf16 dots (bit-exact —
    see ``_kernel.permute``; measured ~10% faster on chip: with the tiny
    per-slot gate work the noiseless kernel is the one place the perm
    matmul passes show up).

    :param perms: (C, depth, depth) int permutations.
    :param gates_ri: (2, C, depth, depth//2, 4, 4) f32 Haar-gate planes.
    :return: (C, 2^depth) f32 ideal probabilities.
    """
    c = perms.shape[0]
    slots = depth // 2
    f32 = jnp.float32
    hmaps = jax.vmap(lambda p: _boundary_maps(p, depth))(perms)
    gates = jnp.transpose(gates_ri, (1, 2, 3, 0, 4, 5)).reshape(
        c, depth, slots, 2, 16).astype(f32)
    uniforms = jnp.zeros((c, depth, slots, _LB), f32)       # unused
    eye = jnp.eye(4, dtype=f32).reshape(1, 16)
    kr = jnp.stack([eye, jnp.zeros_like(eye)])              # K=1 identity
    out = _traj_pallas_call(hmaps, gates, uniforms, kr, kr, depth=depth,
                            n_kraus=1, lb=_LB, noiseless=True,
                            interpret=interpret, perm_split3=perm_split3)
    return out[:, :, 0]


def traj_flops_per_circuit(depth: int, n_kraus: int = 16,
                           num_trajectories: int = 1024,
                           noiseless: bool = False) -> float:
    """Analytic FLOPs of one noisy-QV circuit in the trajectory kernel.

    Per trajectory, per layer: one basis-permutation one-hot matmul
    (2 planes x 2 d^2), ONE renormalization (~7d; round-5 moved it out of
    the per-slot channel — branch weights are norm-invariant), and per
    slot (depth//2 of them) either a 4x4 gate application (~32d,
    ``noiseless``) or the fused gate-channel step (hermitian-reuse
    pair-reduced density ~16d [round 5: the a > b and diagonal-imaginary
    passes reuse/skip — was ~32d], rotated-POVM branch-weight contraction
    4K*16, selection ~3K, sampled fused-operator materialization 4K*16,
    ONE per-lane 4x4 W_k = K_k U application ~32d — the plain gate apply
    is folded into W_k, and the host-side 4x4 compositions have no
    trajectory axis so they are not counted per trajectory). Plus the
    final boundary permutation and the output probability normalization
    (~4d).
    """
    d = float(2 ** depth)
    slots = depth // 2
    perm = 2 * 2 * d * d
    gate = 32 * d
    channel = (
        16 * d + 4 * n_kraus * 16 + 3 * n_kraus
        + 4 * n_kraus * 16 + 32 * d)
    per_slot = gate if noiseless else channel
    renorm = 0 if noiseless else 7 * d
    per_layer = perm + slots * per_slot + renorm
    return num_trajectories * (depth * per_layer + perm + 4 * d)
