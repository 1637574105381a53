"""Quantum volume measurement [QVol] (arXiv:1811.12926).

Reference parity: forest/benchmarking/quantum_volume.py —
_naive_program_generator:21, collect_heavy_outputs:94,
generate_abstract_qv_circuit:126, sample_rand_circuits_for_heavy_out:154,
calculate_prob_est_and_err:211 (eq. C3), measure_quantum_volume:234,
count_heavy_hitters_sampled:322, get_prob_sample_heavy_by_depth:344,
extract_quantum_volume_from_results:379 (QV = 2^maxdepth).

Gate indexing note: the reference applies layer gate j to qubits
(perm[j], perm[j+1]) — sequentially within a layer, sharing qubits — in both
its simulator and its program generator (quantum_volume.py:55,113). We mirror
that exactly so heavy-output statistics are comparable.

TPU-first design: besides the reference-shaped per-circuit API (which runs
through the in-process QVM and supports noise), ``sample_heavy_outputs_batched``
is a single jit that samples permutations + Haar gates, simulates all circuits
as one batched statevector evolution (per-circuit qubit permutations become
bit-permutation gathers so gate positions stay static), finds heavy outputs,
and samples shots — the whole depth in one XLA dispatch (BASELINE config 5).
"""
from __future__ import annotations

import logging
import warnings
from statistics import median
from typing import Callable, Dict, Iterator, List, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from forest_benchmarking_tpu.circuits import Circuit, Gate
from forest_benchmarking_tpu.ops.random_operators import haar_rand_unitary
from forest_benchmarking_tpu.utils import bit_array_to_int, progress_iter
from forest_benchmarking_tpu.sim.statevector import apply_gate_matrix

log = logging.getLogger(__name__)

__all__ = [
    "generate_abstract_qv_circuit", "collect_heavy_outputs",
    "abstract_circuit_to_circuit", "sample_rand_circuits_for_heavy_out",
    "sample_heavy_outputs_batched", "sample_heavy_outputs_sharded",
    "calculate_prob_est_and_err",
    "topology_restricted_program_generator",
    "measure_quantum_volume", "measure_quantum_volume_batched",
    "count_heavy_hitters_sampled", "get_prob_sample_heavy_by_depth",
    "extract_quantum_volume_from_results",
]


def generate_abstract_qv_circuit(depth: int,
                                 rng: Optional[np.random.RandomState] = None) \
        -> Tuple[List[np.ndarray], np.ndarray]:
    """Random permutations and Haar-random 4x4 gates of a model circuit."""
    if rng is None:
        rng = np.random
    permutations = [rng.permutation(range(depth)) for _ in range(depth)]
    num_gates_per_layer = depth // 2
    # host-side Haar samples (tiny); use numpy QR with phase fix
    def haar4():
        # standard_normal exists on np.random, RandomState AND Generator
        # (randn does not exist on Generator)
        z = rng.standard_normal((4, 4)) + 1j * rng.standard_normal((4, 4))
        q, r = np.linalg.qr(z)
        lam = np.diagonal(r) / np.abs(np.diagonal(r))
        return q * lam
    gates = np.asarray([[haar4() for _ in range(num_gates_per_layer)]
                        for _ in range(depth)])
    return permutations, gates


def collect_heavy_outputs(depth: int, permutations: Sequence[np.ndarray],
                          gates: np.ndarray) -> List[int]:
    """Ints of bitstrings output with greater-than-median ideal probability.

    Simulates the model circuit with the in-process statevector engine
    (replacing NumpyWavefunctionSimulator; same qubit-0-leftmost ordering).
    """
    # plain numpy on the host (dim <= 2^8): eager jnp here would compile a
    # tiny program per gate on the axon backend and end with an UNIMPLEMENTED
    # complex device->host fetch
    psi = np.zeros((2,) * depth, dtype=complex)
    psi[(0,) * depth] = 1.0
    for perm, layer in zip(permutations, gates):
        for gate_idx, gate in enumerate(layer):
            axes = (int(perm[gate_idx]), int(perm[gate_idx + 1]))
            g = np.asarray(gate, complex).reshape(2, 2, 2, 2)
            psi = np.tensordot(g, psi, axes=([2, 3], list(axes)))
            psi = np.moveaxis(psi, [0, 1], list(axes))
    probabilities = np.abs(psi.reshape(-1)) ** 2
    median_prob = median(probabilities)
    return [idx for idx, prob in enumerate(probabilities) if prob > median_prob]


def abstract_circuit_to_circuit(qubits: Sequence[int],
                                permutations: Sequence[np.ndarray],
                                gates: np.ndarray) -> Circuit:
    """The analog of _naive_program_generator: custom-matrix gates on the first
    depth-many of ``qubits`` (no ISA restriction — there is no remote compiler).
    """
    num_measure_qubits = len(permutations[0])
    measure_qubits = list(qubits)[:num_measure_qubits]
    circ = Circuit()
    for perm, layer in zip(permutations, gates):
        for gate_idx, gate in enumerate(layer):
            circ += Gate("QVGATE", (), (int(measure_qubits[perm[gate_idx]]),
                                        int(measure_qubits[perm[gate_idx + 1]])),
                         matrix=tuple(map(tuple, np.asarray(gate, complex))))
    return circ


def topology_restricted_program_generator(
        edges: Sequence[Tuple[int, int]]) -> Callable:
    """A ``program_generator`` for :func:`measure_quantum_volume` that routes
    model circuits onto a restricted qubit connectivity graph.

    The TPU-native analog of the reference's ``_naive_program_generator``
    (quantum_volume.py:62-89), which recompiles onto the qc's ISA/topology via
    the remote compiler: here a naive greedy router inserts SWAP chains
    (shortest path by BFS) to bring each gate's qubits adjacent, applies the
    Haar gate, and finally restores the identity logical->physical mapping so
    the caller's fixed measurement qubits read out the model circuit's
    logical bits. SWAPs are named gates, so noise models attached via
    ``Circuit.define_noisy_gate("SWAP", ...)`` hit exactly the routing
    overhead — enabling QV-vs-connectivity studies.

    :param edges: undirected edges of the available topology (physical qubit
        labels; every qubit passed to measure_quantum_volume must appear).
    :return: a ``program_generator(qc, qubits, permutations, gates)``.
    """
    adj: Dict[int, List[int]] = {}
    for a, b in edges:
        adj.setdefault(int(a), []).append(int(b))
        adj.setdefault(int(b), []).append(int(a))

    def shortest_path(src: int, dst: int) -> List[int]:
        prev = {src: None}
        frontier = [src]
        while frontier:
            nxt = []
            for u in frontier:
                for v in adj.get(u, ()):
                    if v not in prev:
                        prev[v] = u
                        nxt.append(v)
            if dst in prev:
                break
            frontier = nxt
        if dst not in prev:
            raise ValueError(f"No path between qubits {src} and {dst} in the "
                             "given topology")
        path = [dst]
        while path[-1] != src:
            path.append(prev[path[-1]])
        return path[::-1]

    def generator(qc, qubits: Sequence[int], permutations: Sequence[np.ndarray],
                  gates: np.ndarray) -> Circuit:
        depth = len(permutations[0])
        physical = list(qubits)[:depth]
        for q in physical:
            if int(q) not in adj:
                raise ValueError(f"Qubit {q} is not in the topology")
        # occupant[p] = logical qubit currently on physical qubit p (None for
        # spare topology qubits, which routing may freely swap through);
        # loc[l] = physical qubit currently holding logical qubit l.
        occupant: Dict[int, Optional[int]] = {p: None for p in adj}
        for l in range(depth):
            occupant[int(physical[l])] = l
        loc = {l: int(physical[l]) for l in range(depth)}
        circ = Circuit()
        routing_swaps: List[Tuple[int, int]] = []

        def swap(a: int, b: int):
            nonlocal circ
            circ += Gate("SWAP", (), (a, b))
            routing_swaps.append((a, b))
            occupant[a], occupant[b] = occupant[b], occupant[a]
            for p in (a, b):
                if occupant[p] is not None:
                    loc[occupant[p]] = p

        for perm, layer in zip(permutations, gates):
            for gate_idx, gate in enumerate(layer):
                la, lb = int(perm[gate_idx]), int(perm[gate_idx + 1])
                if loc[lb] not in adj.get(loc[la], ()):
                    # walk logical qubit la along a shortest physical path
                    # (possibly through spare qubits) until adjacent to lb
                    for step in shortest_path(loc[la], loc[lb])[1:-1]:
                        swap(loc[la], step)
                pa, pb = loc[la], loc[lb]
                circ += Gate("QVGATE", (), (pa, pb),
                             matrix=tuple(map(tuple, np.asarray(gate, complex))))
        # restore the identity mapping (so measurement qubits read out logical
        # bits) by undoing every routing swap in reverse order — each swap is
        # self-inverse and topology-respecting by construction
        for a, b in reversed(routing_swaps):
            circ += Gate("SWAP", (), (a, b))
        return circ

    return generator


def sample_rand_circuits_for_heavy_out(qc, qubits: Sequence[int], depth: int,
                                       program_generator: Callable = None,
                                       num_circuits: int = 100,
                                       num_shots: int = 1000,
                                       show_progress_bar: bool = False,
                                       rng: Optional[np.random.RandomState] = None) -> int:
    """Count sampled heavy outputs across random model circuits at this depth.

    Runs each circuit on ``qc`` (which may be noisy) and compares against the
    ideal heavy-output set.
    """
    if rng is None:
        rng = np.random
    num_heavy = 0
    for _ in progress_iter(range(num_circuits), show_progress_bar,
                           desc=f"qv depth {depth}"):
        permutations, gates = generate_abstract_qv_circuit(depth, rng)
        if program_generator is None:
            program = abstract_circuit_to_circuit(qubits, permutations, gates)
        else:
            program = program_generator(qc, qubits, permutations, gates)
        measure_qubits = list(qubits)[:depth]
        results = qc.run(program, measure_qubits, num_shots)
        heavy_outputs = set(collect_heavy_outputs(depth, permutations, gates))
        for result in results:
            if bit_array_to_int(result) in heavy_outputs:
                num_heavy += 1
    return num_heavy


# ----------------------- batched TPU-native fast path ------------------------

def _pallas_qv_routing(depth: int, has_kraus: bool, noisy_method: str,
                       backend: str) -> Tuple[bool, bool]:
    """(use_pallas_ideal, use_pallas_traj) kernel routing for the batched QV
    sampler. The fused Pallas kernels need an accelerator backend and
    depth >= 7 (``supports_pallas_traj``); the trajectory kernel additionally
    needs a Kraus stack and a trajectory-capable ``noisy_method``. The ideal
    probabilities (heavy sets, and the whole ideal path when ``not
    has_kraus``) ride the fused noiseless kernel whenever it is available —
    with kraus at densities' depths (``noisy_method='auto'``, depth <= 6)
    the density kernel computes its own exact probabilities, so the ideal
    kernel is only engaged alongside the trajectory kernel there.
    """
    from forest_benchmarking_tpu.ops.pallas_traj import supports_pallas_traj

    on_accel = backend not in ("cpu",)
    fused_ok = supports_pallas_traj(depth) and on_accel
    use_pallas_traj = (has_kraus
                       and noisy_method in ("trajectory", "auto")
                       and (noisy_method == "trajectory" or depth > 6)
                       and fused_ok)
    use_pallas_ideal = use_pallas_traj or (not has_kraus and fused_ok)
    return use_pallas_ideal, use_pallas_traj


def _bit_permute_indices(perm: jnp.ndarray, depth: int) -> jnp.ndarray:
    """Gather indices so new position i holds old qubit perm[i] (MSB first)."""
    x = jnp.arange(2 ** depth)
    out = jnp.zeros_like(x)
    for i in range(depth):
        bit = (x >> (depth - 1 - i)) & 1
        out = out | (bit << (depth - 1 - perm[i]))
    return out


def _simulate_qv_circuit(perms: jnp.ndarray, gates: jnp.ndarray,
                         depth: int) -> jnp.ndarray:
    """Ideal output probabilities of one model circuit (jit/vmap-safe).

    perms: (depth, depth) int array; gates: (depth, depth//2, 4, 4) complex.
    """
    psi = jnp.zeros((2,) * depth, dtype=gates.dtype).at[(0,) * depth].set(1.0)
    for layer in range(depth):
        perm = perms[layer]
        # permute the state so old qubit perm[i] sits at position i; gates then
        # act at static positions (j, j+1), exactly matching the reference's
        # (perm[j], perm[j+1]) indexing
        fwd = _bit_permute_indices(perm, depth)
        psi = psi.reshape(-1)[fwd].reshape((2,) * depth)
        for j in range(depth // 2):
            psi = apply_gate_matrix(psi, gates[layer, j], (j, j + 1))
        inv = jnp.argsort(fwd)
        psi = psi.reshape(-1)[inv].reshape((2,) * depth)
    return jnp.abs(psi.reshape(-1)) ** 2


def _apply_2q_to_density(rho_t: jnp.ndarray, u4: jnp.ndarray, j: int,
                         depth: int) -> jnp.ndarray:
    """rho -> U rho U^dag with U a 4x4 on adjacent qubits (j, j+1).

    ``rho_t`` has shape (2,)*depth + (2,)*depth (ket axes then bra axes).
    """
    u_t = u4.reshape(2, 2, 2, 2)
    # left: contract U's input axes with ket axes (j, j+1)
    hi = jax.lax.Precision.HIGHEST
    rho_t = jnp.moveaxis(jnp.tensordot(u_t, rho_t, axes=[(2, 3), (j, j + 1)],
                                       precision=hi),
                         (0, 1), (j, j + 1))
    # right: contract conj(U) with bra axes
    bj = depth + j
    rho_t = jnp.moveaxis(
        jnp.tensordot(jnp.conj(u_t), rho_t, axes=[(2, 3), (bj, bj + 1)],
                      precision=hi),
        (0, 1), (bj, bj + 1))
    return rho_t


def _apply_2q_channel_to_density(rho_t: jnp.ndarray, kraus: jnp.ndarray,
                                 j: int, depth: int) -> jnp.ndarray:
    """rho -> sum_k K_k rho K_k^dag on adjacent qubits (j, j+1), with the
    whole Kraus sum fused into two stacked tensordots.

    ``rho_t`` has shape (2,)*depth + (2,)*depth; ``kraus`` is (K, 4, 4).
    """
    k_t = kraus.reshape(-1, 2, 2, 2, 2)          # (K, out, out, in, in)
    # left: T[K, o1, o2, ...rest] = sum_in K[k,o,i] rho[... i at (j,j+1) ...]
    hi = jax.lax.Precision.HIGHEST
    t = jnp.tensordot(k_t, rho_t, axes=[(3, 4), (j, j + 1)], precision=hi)
    # bra axes of rho sit after the remaining ket axes; in t they are shifted
    # by 3 (K, o1, o2) minus the 2 removed ket axes
    bj = 3 + (depth - 2) + j
    # right: contract conj(K) over (K, bra_j, bra_j+1) jointly -> Kraus sum
    out = jnp.tensordot(jnp.conj(k_t), t, axes=[(0, 3, 4), (0, bj, bj + 1)],
                        precision=hi)
    # out axes: (b_j, b_j+1, k_j, k_j+1, kets w/o j,j+1..., bras w/o j,j+1...)
    # restore the canonical (kets..., bras...) order with one transpose
    def src_ket(m):
        if m == j:
            return 2
        if m == j + 1:
            return 3
        return 4 + (m if m < j else m - 2)

    def src_bra(m):
        if m == j:
            return 0
        if m == j + 1:
            return 1
        return 4 + (depth - 2) + (m if m < j else m - 2)

    perm = [src_ket(m) for m in range(depth)] + \
        [src_bra(m) for m in range(depth)]
    return jnp.transpose(out, perm)


def _simulate_qv_circuit_density(perms: jnp.ndarray, gates: jnp.ndarray,
                                 kraus: jnp.ndarray, depth: int) -> jnp.ndarray:
    """Noisy output probabilities of one model circuit via density-matrix
    evolution: each Haar gate is followed by the two-qubit Kraus channel
    ``kraus`` (K, 4, 4) on the same qubit pair — the batched equivalent of
    ``Circuit.define_noisy_gate("QVGATE", None, kraus)`` on the QVM
    (sim/density.py:71 run_density_matrix). Layers run under a ``fori_loop``
    (compile-time: one traced layer body, not depth of them).
    """
    d = 2 ** depth
    rho0 = jnp.zeros((d, d), dtype=gates.dtype).at[0, 0].set(1.0)

    def layer_body(layer, rho):
        perm = perms[layer]
        fwd = _bit_permute_indices(perm, depth)
        rho = rho[fwd][:, fwd]
        rho_t = rho.reshape((2,) * (2 * depth))
        for j in range(depth // 2):
            rho_t = _apply_2q_to_density(rho_t, gates[layer, j], j, depth)
            rho_t = _apply_2q_channel_to_density(rho_t, kraus, j, depth)
        rho = rho_t.reshape(d, d)
        inv = jnp.argsort(fwd)
        return rho[inv][:, inv]

    rho = jax.lax.fori_loop(0, depth, layer_body, rho0)
    p = jnp.real(jnp.diagonal(rho))
    return jnp.maximum(p, 0.0) / jnp.sum(jnp.maximum(p, 0.0))


def _lift_2q(mat: jnp.ndarray, j: int, depth: int) -> jnp.ndarray:
    """kron(I_{2^j}, mat, I_{2^(depth-j-2)}): a 4x4 on qubits (j, j+1) lifted
    to the full 2^depth space."""
    left = jnp.eye(2 ** j, dtype=mat.dtype)
    right = jnp.eye(2 ** (depth - j - 2), dtype=mat.dtype)
    return jnp.kron(jnp.kron(left, mat), right)


def _simulate_qv_circuit_density_lifted(perms: jnp.ndarray, gates: jnp.ndarray,
                                        kraus_lifts, depth: int) -> jnp.ndarray:
    """Noisy output probabilities via LIFTED-matrix density evolution: gates
    and Kraus operators become (2^depth, 2^depth) matrices and every
    application is a plain matmul. Same semantics as
    :func:`_simulate_qv_circuit_density`; preferred at depth >= 6 where the
    tensor-contraction form's 2*depth-dimensional tensordots make XLA
    compile time explode, while matmuls stay cheap to compile and ride the
    MXU. ``kraus_lifts`` is a tuple of (K, 2^depth, 2^depth) stacks, one per
    gate slot j (precomputed once, shared across circuits and layers).
    """
    d = 2 ** depth
    hi = jax.lax.Precision.HIGHEST
    rho0 = jnp.zeros((d, d), dtype=gates.dtype).at[0, 0].set(1.0)

    def layer_body(layer, rho):
        perm = perms[layer]
        fwd = _bit_permute_indices(perm, depth)
        rho = rho[fwd][:, fwd]
        for j in range(depth // 2):
            u = _lift_2q(gates[layer, j], j, depth)
            rho = jnp.matmul(jnp.matmul(u, rho, precision=hi),
                             jnp.conj(u.T), precision=hi)
            kl = kraus_lifts[j]
            t = jnp.einsum("kab,bc->kac", kl, rho, precision=hi)
            rho = jnp.einsum("kac,kbc->ab", t, jnp.conj(kl), precision=hi)
        inv = jnp.argsort(fwd)
        return rho[inv][:, inv]

    rho = jax.lax.fori_loop(0, depth, layer_body, rho0)
    p = jnp.real(jnp.diagonal(rho))
    return jnp.maximum(p, 0.0) / jnp.sum(jnp.maximum(p, 0.0))


def _apply_gate_slot_traj(psi: jnp.ndarray, u4: jnp.ndarray, j: int,
                          depth: int) -> jnp.ndarray:
    """Apply a 4x4 unitary at positions (j, j+1) to a (2^depth, T) trajectory
    batch (trajectories ride the trailing/lane dimension)."""
    left = 2 ** j
    right = 2 ** (depth - j - 2)
    t = psi.shape[-1]
    ps = psi.reshape(left, 4, right, t)
    out = jnp.einsum("ab,lbrt->lart", u4, ps,
                     precision=jax.lax.Precision.HIGHEST)
    return out.reshape(-1, t)


def _apply_channel_slot_traj(psi: jnp.ndarray, kraus: jnp.ndarray,
                             m_ops: jnp.ndarray, u: jnp.ndarray, j: int,
                             depth: int) -> jnp.ndarray:
    """Monte-Carlo unraveling of a 2q Kraus channel at positions (j, j+1):
    each trajectory samples ONE Kraus operator k with the Born weight
    p_k = <psi| K_k^dag K_k |psi> and jumps to K_k|psi>/||K_k psi||.

    The weights come from the pair-reduced density (16 entries per
    trajectory), so the K-way branch costs ~one gate application plus a
    (K, 4, 4) x (4, 4, T) contraction — NOT K full state applications.

    :param psi: (2^depth, T) trajectory statevectors.
    :param kraus: (K, 4, 4) Kraus stack.
    :param m_ops: (K, 4, 4) precomputed K_k^dag K_k.
    :param u: (T,) uniform variates selecting the branch.
    """
    left = 2 ** j
    right = 2 ** (depth - j - 2)
    t = psi.shape[-1]
    hi = jax.lax.Precision.HIGHEST
    ps = psi.reshape(left, 4, right, t)
    rho_pair = jnp.einsum("lart,lbrt->abt", ps, jnp.conj(ps), precision=hi)
    p = jnp.real(jnp.einsum("kab,bat->kt", m_ops, rho_pair, precision=hi))
    p = jnp.maximum(p, 0.0)
    p = p / jnp.sum(p, axis=0, keepdims=True)
    idx = jnp.sum(jnp.cumsum(p, axis=0) < u[None, :], axis=0)  # (T,)
    ksel = kraus[idx]                                          # (T, 4, 4)
    out = jnp.einsum("tab,lbrt->lart", ksel, ps, precision=hi).reshape(-1, t)
    nrm = jnp.sqrt(jnp.sum(jnp.abs(out) ** 2, axis=0, keepdims=True))
    return out / jnp.maximum(nrm, jnp.finfo(nrm.dtype).tiny)


def _simulate_qv_circuit_traj(perms: jnp.ndarray, gates: jnp.ndarray,
                              kraus: jnp.ndarray, m_ops: jnp.ndarray,
                              uniforms: jnp.ndarray, depth: int) -> jnp.ndarray:
    """Noisy per-trajectory output probabilities of one model circuit via
    Kraus-unraveled statevector evolution — the O(T 2^d) replacement for the
    O((2^d)^2..3) density kernels at large depth. Same channel placement as
    :func:`_simulate_qv_circuit_density` (the channel follows every Haar gate
    on its qubit pair); the trajectory average converges to the density
    kernel's distribution (tested at shallow depth).

    :param uniforms: (depth, depth//2, T) branch-selection variates.
    :return: (2^depth, T) per-trajectory probabilities.
    """
    d = 2 ** depth
    t = uniforms.shape[-1]
    psi0 = jnp.zeros((d, t), dtype=gates.dtype).at[0].set(1.0)

    def layer_body(layer, psi):
        fwd = _bit_permute_indices(perms[layer], depth)
        psi = psi[fwd]
        for j in range(depth // 2):
            psi = _apply_gate_slot_traj(psi, gates[layer, j], j, depth)
            psi = _apply_channel_slot_traj(psi, kraus, m_ops,
                                           uniforms[layer, j], j, depth)
        return psi[jnp.argsort(fwd)]

    psi = jax.lax.fori_loop(0, depth, layer_body, psi0)
    p = jnp.abs(psi) ** 2
    return p / jnp.sum(p, axis=0, keepdims=True)


def sample_heavy_outputs_batched(key, depth: int, num_circuits: int,
                                 num_shots: int,
                                 dtype=jnp.float32,
                                 kraus: Optional[jnp.ndarray] = None,
                                 noisy_method: str = "auto",
                                 num_trajectories: Optional[int] = None) \
        -> jnp.ndarray:
    """One jit: sample circuits, find heavy sets, sample shots, count heavies.

    Returns the per-circuit heavy-output counts as a (num_circuits,) int32
    array — an ARRAY, not a scalar, because in-jit scalar reductions of
    large programs can fetch the wrong buffer over the axon tunnel
    (CLAUDE.md); sum on the host. Without ``kraus`` this is the ideal-device
    path: shots
    are drawn from the exact output distribution, so the heavy-output
    probability estimate converges to the ideal (0.85-ish asymptote
    (1+ln2)/2) at large depth. On TPU at depth >= 7 the ideal simulation
    runs through the fused Pallas noiseless kernel
    (:func:`~forest_benchmarking_tpu.ops.pallas_traj.ideal_probs_pallas`,
    whole evolution VMEM-resident) instead of the unfused XLA statevector
    sim — same distribution (tested to 2e-6), several times the throughput.

    With ``kraus`` — a two-qubit Kraus stack applied after every Haar gate
    on its qubit pair, passed either complex (K, 4, 4) or as float real/imag
    planes (2, K, 4, 4) (the only transportable form on the axon TPU tunnel,
    which cannot move complex arrays host->device) — shots are drawn from
    the NOISY output
    distribution, while the heavy sets still come from the ideal circuit,
    exactly as the per-circuit QVM path defines QV for noisy devices
    (reference quantum_volume.py:94-118,154-208). Three noisy kernels:

    - ``noisy_method="density"``: exact density-matrix evolution (tensor form
      at depth < 6, lifted-matrix MXU form at depth >= 6) — the parity oracle.
    - ``noisy_method="trajectory"``: Kraus-unraveled statevector trajectories,
      O(T 2^d) instead of O((2^d)^2) memory / (2^d)^3 matmuls — the fast path
      at QV-relevant depths. ``num_trajectories`` (default: ``num_shots``,
      must divide it) sets T; each trajectory contributes
      ``num_shots / T`` shots, so T = num_shots gives fully independent
      shots and smaller T trades shot independence (slightly wider CI, same
      expectation) for speed.
    - ``noisy_method="auto"`` (default): density at depth <= 6, trajectory
      above.
    """
    kp, kg, ks = jax.random.split(key, 3)
    cdtype = jnp.complex64 if dtype == jnp.float32 else jnp.complex128

    perms = _sample_perms(kp, num_circuits, depth)

    gates = haar_rand_unitary(kg, 4, batch=(num_circuits, depth, depth // 2),
                              dtype=dtype).astype(cdtype)

    from forest_benchmarking_tpu.ops.pallas_traj import (
        traj_probs_pallas, ideal_probs_pallas)
    use_pallas_ideal, use_pallas_traj = _pallas_qv_routing(
        depth, kraus is not None, noisy_method, jax.default_backend())
    if use_pallas_ideal:
        # fused noiseless kernel (one 128-lane block per circuit, whole
        # evolution VMEM-resident). Two users: the heavy-set computation of
        # the noisy trajectory path (the unfused XLA statevector sim was
        # ~40% of the depth-8 noisy wall clock), and — since round 5 — the
        # IDEAL path itself (kraus=None), which had been flat on the unfused
        # XLA sim since round 1 while this kernel sat noisy-only.
        gates_ri = jnp.stack([jnp.real(gates), jnp.imag(gates)]).astype(
            jnp.float32)
        probs = ideal_probs_pallas(perms, gates_ri, depth).astype(dtype)
    else:
        probs = jax.vmap(lambda p, g: _simulate_qv_circuit(p, g, depth))(
            perms, gates)
    med = jnp.median(probs, axis=1, keepdims=True)
    heavy = probs > med  # (C, 2**depth)

    if kraus is not None:
        kraus = jnp.asarray(kraus)
        if kraus.ndim == 4 and not jnp.iscomplexobj(kraus):
            # (2, K, 4, 4) real/imag planes — float-only transport for the
            # axon TPU tunnel (complex host->device transfers are unsupported)
            kraus = kraus[0] + 1j * kraus[1]
        kraus = kraus.astype(cdtype)
        if noisy_method not in ("auto", "density", "trajectory"):
            raise ValueError(f"unknown noisy_method {noisy_method!r}")
        method = noisy_method
        if method == "auto":
            method = "density" if depth <= 6 else "trajectory"
        if method == "trajectory":
            t = num_shots if num_trajectories is None else num_trajectories
            if num_shots % t != 0:
                raise ValueError(f"num_trajectories ({t}) must divide "
                                 f"num_shots ({num_shots})")
            shots_per_traj = num_shots // t
            ku, kt = jax.random.split(ks)
            if use_pallas_traj:
                # fused kernel: whole evolution VMEM-resident per 128-lane
                # trajectory block; pad T up to the lane block and slice
                t_pad = -(-t // 128) * 128
                uniforms = jax.random.uniform(
                    ku, (num_circuits, depth, depth // 2, t_pad),
                    dtype=jnp.float32)
                kraus_ri = jnp.stack([jnp.real(kraus), jnp.imag(kraus)])
                traj_probs = traj_probs_pallas(
                    perms, gates_ri,
                    kraus_ri.astype(jnp.float32), uniforms,
                    depth)[:, :, :t].astype(dtype)
            else:
                m_ops = jnp.einsum("kba,kbc->kac", jnp.conj(kraus), kraus)
                uniforms = jax.random.uniform(
                    ku, (num_circuits, depth, depth // 2, t), dtype=dtype)
                traj_probs = jax.vmap(
                    lambda p, g, u: _simulate_qv_circuit_traj(
                        p, g, kraus, m_ops, u, depth))(perms, gates, uniforms)
            # (C, 2**depth, T) -> sample shots_per_traj per trajectory
            logits = jnp.log(jnp.clip(jnp.swapaxes(traj_probs, 1, 2),
                                      jnp.finfo(dtype).tiny, None))
            samples = jax.random.categorical(
                kt, logits[:, :, None, :], axis=-1,
                shape=(num_circuits, t, shots_per_traj))
            sampled_heavy = jnp.take_along_axis(
                heavy, samples.reshape(num_circuits, -1), axis=1)
            return jnp.sum(sampled_heavy.astype(jnp.int32), axis=1)
        if depth >= 6:
            # lifted-matrix form: fast to compile, MXU matmuls (see
            # _simulate_qv_circuit_density_lifted)
            kraus_lifts = tuple(
                jax.vmap(lambda m, jj=j: _lift_2q(m, jj, depth))(kraus)
                for j in range(depth // 2))
            probs = jax.vmap(
                lambda p, g: _simulate_qv_circuit_density_lifted(
                    p, g, kraus_lifts, depth))(perms, gates)
        else:
            probs = jax.vmap(
                lambda p, g: _simulate_qv_circuit_density(p, g, kraus, depth))(
                    perms, gates)

    logits = jnp.log(jnp.clip(probs, jnp.finfo(dtype).tiny, None))
    samples = jax.random.categorical(ks, logits[:, None, :], axis=-1,
                                     shape=(num_circuits, num_shots))
    sampled_heavy = jnp.take_along_axis(heavy, samples, axis=1)
    return jnp.sum(sampled_heavy.astype(jnp.int32), axis=1)


def sample_heavy_outputs_sharded(key, mesh, depth: int, num_circuits: int,
                                 num_shots: int, axis_name: str = "batch",
                                 **kw) -> jnp.ndarray:
    """:func:`sample_heavy_outputs_batched` with circuits sharded over a mesh.

    QV heavy-output sampling is embarrassingly parallel in the circuit axis,
    so the multi-chip path is ``shard_map`` over a 1-D batch mesh
    (``parallel.make_mesh()``): each device folds its mesh position into the
    PRNG key and runs the full single-chip kernel (the fused Pallas
    trajectory kernel on TPU for ``noisy_method="trajectory"``) on
    ``num_circuits / n_devices`` circuits. No collectives appear — the
    gathered output is the per-circuit heavy counts of a ``num_circuits``
    experiment, exactly as if each shard had been run on its own chip with
    ``fold_in(key, shard_index)`` (tested bit-exact on the virtual mesh).

    :param key: PRNG key (replicated; per-device streams are derived).
    :param mesh: 1-D ``jax.sharding.Mesh`` whose ``axis_name`` axis shards
        the circuit batch; its size must divide ``num_circuits``.
    :param kw: forwarded to :func:`sample_heavy_outputs_batched`
        (``dtype``, ``kraus``, ``noisy_method``, ``num_trajectories``).
    :return: (num_circuits,) int32 per-circuit heavy counts; sum on the host
        (in-jit scalar reductions can fetch the wrong buffer on the tunnel).
    """
    from forest_benchmarking_tpu.parallel import shard_map_batched

    n_dev = mesh.shape[axis_name]
    if num_circuits % n_dev != 0:
        raise ValueError(f"num_circuits ({num_circuits}) must be divisible "
                         f"by the mesh axis {axis_name!r} size {n_dev}")
    per_dev = num_circuits // n_dev

    def shard(k):
        return sample_heavy_outputs_batched(
            k, depth=depth, num_circuits=per_dev, num_shots=num_shots, **kw)

    return shard_map_batched(shard, mesh, batched_argnums=(),
                             fold_key_argnums=(0,), axis_name=axis_name)(key)


def _sample_perms(key, num_circuits: int, depth: int) -> jnp.ndarray:
    keys = jax.random.split(key, num_circuits * depth)
    perms = jax.vmap(lambda k: jax.random.permutation(k, depth))(keys)
    return perms.reshape(num_circuits, depth, depth)


def measure_quantum_volume_batched(key=None, max_depth: int = 8,
                                   num_circuits: int = 200,
                                   num_shots: int = 1000,
                                   achievable_threshold: float = 2 / 3,
                                   stop_when_fail: bool = True,
                                   dtype=jnp.float32,
                                   kraus: Optional[np.ndarray] = None,
                                   noisy_method: str = "auto",
                                   num_trajectories: Optional[int] = None) \
        -> Dict[int, Tuple[float, float]]:
    """Scan depths 2..max_depth with the fully-batched kernel.

    ``kraus`` (optional (K, 4, 4) stack) switches every depth to the noisy
    path — the batched analog of running :func:`measure_quantum_volume` on a
    QVM with a noisy QVGATE. ``noisy_method``/``num_trajectories`` select and
    tune the noisy kernel (see :func:`sample_heavy_outputs_batched`)."""
    if key is None:
        key = jax.random.PRNGKey(0)
    if kraus is not None:
        kraus = np.asarray(kraus)
        if np.iscomplexobj(kraus):
            # float-plane transport: complex arrays cannot cross the axon
            # host->device boundary
            kraus = np.stack([kraus.real, kraus.imag]).astype(
                np.float32 if dtype == jnp.float32 else np.float64)
    results = {}
    sample_jit = jax.jit(sample_heavy_outputs_batched,
                         static_argnames=("depth", "num_circuits", "num_shots",
                                          "dtype", "noisy_method",
                                          "num_trajectories"))
    for depth in range(2, max_depth + 1):
        key, sub = jax.random.split(key)
        # per-circuit counts come back as an int array; reduce on host
        num_heavy = int(np.asarray(sample_jit(
            sub, depth=depth, num_circuits=num_circuits,
            num_shots=num_shots, dtype=dtype, kraus=kraus,
            noisy_method=noisy_method,
            num_trajectories=num_trajectories)).sum())
        prob, conf = calculate_prob_est_and_err(num_heavy, num_circuits,
                                                num_shots)
        results[depth] = (prob, conf)
        if stop_when_fail and conf <= achievable_threshold:
            break
    return results


# ------------------------------- analysis ------------------------------------

def calculate_prob_est_and_err(num_heavy: int, num_circuits: int,
                               num_shots: int) -> Tuple[float, float]:
    """Heavy-output probability estimate and its 2-sigma one-sided lower bound
    (eq. C3 of [QVol])."""
    total_sampled_outputs = num_circuits * num_shots
    prob_sample_heavy = num_heavy / total_sampled_outputs
    one_sided_confidence_interval = prob_sample_heavy - \
        2 * np.sqrt(num_heavy * (num_shots - num_heavy / num_circuits)) \
        / total_sampled_outputs
    return prob_sample_heavy, one_sided_confidence_interval


def measure_quantum_volume(qc, qubits: Sequence[int] = None,
                           program_generator: Callable = None,
                           num_circuits: int = 100, num_shots: int = 1000,
                           depths: Optional[np.ndarray] = None,
                           achievable_threshold: float = 2 / 3,
                           stop_when_fail: bool = True,
                           show_progress_bar: bool = False,
                           rng: Optional[np.random.RandomState] = None) \
        -> Dict[int, Tuple[float, float]]:
    """Measure quantum volume of the given (possibly noisy) qc [QVol]."""
    if num_circuits < 100:
        warnings.warn("The number of random circuits ran ought to be greater "
                      "than 100 for results to be valid.")
    if qubits is None:
        raise ValueError("Specify the qubits available on the qc.")
    if depths is None:
        depths = np.arange(2, len(qubits) + 1)

    results = {}
    for depth in depths:
        log.info("Starting depth %s", depth)
        num_heavy = sample_rand_circuits_for_heavy_out(
            qc, qubits, depth, program_generator, num_circuits, num_shots,
            show_progress_bar, rng=rng)
        prob_sample_heavy, one_sided = calculate_prob_est_and_err(
            num_heavy, num_circuits, num_shots)
        results[depth] = (prob_sample_heavy, one_sided)
        if stop_when_fail and not one_sided > achievable_threshold:
            break
    return results


def count_heavy_hitters_sampled(qc_results: Iterator[np.ndarray],
                                heavy_hitters: Iterator[List[int]]) -> Iterator[int]:
    """Per-circuit counts of sampled bitstrings that are heavy."""
    for results, hh_list in zip(qc_results, heavy_hitters):
        hh_set = set(hh_list)
        num_heavy = 0
        for result in results:
            if bit_array_to_int(result) in hh_set:
                num_heavy += 1
        yield num_heavy


def get_prob_sample_heavy_by_depth(depths: Iterator[int],
                                   num_hh_sampled: Iterator[int],
                                   num_shots: Iterator[int]) \
        -> Dict[int, Tuple[float, float]]:
    """Per-depth (probability estimate, lower bound) from per-circuit counts."""
    nheavy_by_depth = {}
    for depth, num_heavy, n_shots in zip(depths, num_hh_sampled, num_shots):
        if depth not in nheavy_by_depth:
            nheavy_by_depth[depth] = ([num_heavy], n_shots)
        else:
            nheavy_by_depth[depth][0].append(num_heavy)
            assert n_shots == nheavy_by_depth[depth][1], \
                "The number of shots should be the same for each circuit of a " \
                "given depth."
    results_by_depth = {}
    for depth, (n_heavy, n_shots) in nheavy_by_depth.items():
        results_by_depth[depth] = calculate_prob_est_and_err(
            sum(n_heavy), len(n_heavy), n_shots)
    return results_by_depth


def extract_quantum_volume_from_results(results: Dict[int, Tuple[float, float]]) -> int:
    """QV = 2^(largest achieved depth) (eq. 7 of [QVol])."""
    depths = sorted(results.keys())
    max_depth = 1
    for depth in depths:
        _, lower_bound = results[depth]
        if lower_bound <= 2 / 3:
            break
        max_depth = depth
    return 2 ** max_depth
