"""Structure-keyed compiled circuit execution (the parametric-executable engine).

The reference compiles one *parametric* executable and rebinds run-time
parameters across runs (readout.py:147-150, utils.parameterized_bitstring_prep
:461). The TPU-native equivalent implemented here: a circuit's *structure*
(gate arities and qubit axes, noise-channel slots, marginalization pattern,
shot count) keys a cache of jit-compiled executables whose *values* (gate
matrices, Kraus stacks, readout-confusion matrix) are runtime arguments.
Circuits that differ only in gate parameters — every bitstring prep, every RB
sequence of a given shape, every QV model circuit at a depth — re-enter the
same compiled program with zero recompilation.

Readout symmetrization compiles ONCE for all flip patterns: the
pre-measurement flips enter as per-qubit 2x2 unitary arguments (identity or
X) vmapped over patterns, so an exhaustive 2^k-pattern run is one dispatch.

All array arguments cross the host boundary as stacked float real/imag pairs
and are joined to complex inside the jit (complex buffers cannot cross the
axon TPU tunnel), and the only outputs are integer bit arrays.
"""
from __future__ import annotations

from collections import OrderedDict
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from forest_benchmarking_tpu.circuits import Circuit
from forest_benchmarking_tpu.sim.statevector import apply_gate_matrix
from forest_benchmarking_tpu.sim.density import (
    apply_gate_to_density, apply_kraus_to_density, decoherence_kraus)

__all__ = ["CircuitPlan", "build_plan", "sample_bits", "sample_bits_symmetrized",
           "executor_cache_info", "clear_executor_cache"]

_MAX_CACHE_ENTRIES = 512
_CACHE: "OrderedDict[tuple, object]" = OrderedDict()
_CACHE_HITS = 0
_CACHE_MISSES = 0

_X_MAT = np.array([[0.0, 1.0], [1.0, 0.0]], dtype=complex)
_I_MAT = np.eye(2, dtype=complex)


def executor_cache_info() -> Dict[str, int]:
    return {"entries": len(_CACHE), "hits": _CACHE_HITS, "misses": _CACHE_MISSES}


def clear_executor_cache() -> None:
    global _CACHE_HITS, _CACHE_MISSES
    _CACHE.clear()
    _CACHE_HITS = 0
    _CACHE_MISSES = 0


def _float_dtype(cdtype) -> np.dtype:
    return np.dtype(np.float64 if np.dtype(cdtype) == np.complex128
                    else np.float32)


def _split_ri(arr: np.ndarray, fdtype) -> np.ndarray:
    """complex (…) -> float (2, …) stacked real/imag."""
    arr = np.asarray(arr, dtype=complex)
    return np.stack([arr.real, arr.imag]).astype(fdtype)


def _join_ri(ri: jnp.ndarray, cdtype) -> jnp.ndarray:
    return (ri[0] + 1j * ri[1]).astype(cdtype)


class CircuitPlan:
    """Static structure + runtime argument pools for one circuit execution.

    ``ops`` is a tuple of ("u"|"k", axes, pool_shape, pool_index) descriptors;
    the matching values live in ``pools`` grouped by real/imag-split shape so
    each distinct shape crosses the host boundary as one stacked array.
    """

    def __init__(self, circuit: Circuit, qubits: Sequence[int], cdtype,
                 t1s: Optional[dict], t2s: Optional[dict], noisy: bool):
        qubits = list(qubits)
        fdtype = _float_dtype(cdtype)
        sim_qubits = sorted(set(circuit.get_qubits()) | set(qubits))
        pos = {q: i for i, q in enumerate(sim_qubits)}
        n = len(sim_qubits)
        needs_density = bool(
            circuit.gate_noise or circuit.readout_confusion or noisy
            or ((t1s or t2s) and any(g.name == "DELAY" for g in circuit.gates)))

        ops: List[Tuple] = []
        pools: Dict[Tuple[int, ...], List[np.ndarray]] = {}

        def push(kind: str, axes: Tuple[int, ...], value: np.ndarray):
            ri = _split_ri(value, fdtype)
            pool = pools.setdefault(ri.shape, [])
            ops.append((kind, axes, ri.shape, len(pool)))
            pool.append(ri)

        for gate in circuit.gates:
            axes = tuple(pos[q] for q in gate.qubits)
            push("u", axes, gate.get_matrix())
            if needs_density:
                if gate.name == "DELAY" and (t1s or t2s):
                    q = gate.qubits[0]
                    kraus = decoherence_kraus(gate.params[0],
                                              (t1s or {}).get(q),
                                              (t2s or {}).get(q))
                    push("k", axes, kraus)
                for name, nq, kraus in circuit.gate_noise:
                    if name == gate.name and (nq is None
                                              or tuple(nq) == tuple(gate.qubits)):
                        push("k", axes, np.asarray(kraus))

        confusion = None
        if needs_density and circuit.readout_confusion:
            c = np.eye(1)
            for q in sim_qubits:
                cq = circuit.readout_confusion.get(q, np.eye(2))
                # stored row-stochastic p(observed|true) with rows = true;
                # transpose to column-action form obs = C @ true
                c = np.kron(c, np.asarray(cq).T)
            confusion = np.asarray(c, dtype=fdtype)

        # marginalization of the n-qubit distribution onto `qubits`
        keep = [pos[q] for q in qubits]
        drop = tuple(i for i in range(n) if i not in keep)
        kept_sorted = [q for q in sim_qubits if q in set(qubits)]
        perm = tuple(kept_sorted.index(q) for q in qubits)

        self.n = n
        self.sim_qubits = sim_qubits
        self.meas_axes = tuple(pos[q] for q in qubits)
        self.needs_density = needs_density
        self.ops = tuple(ops)
        self.pool_shapes = tuple(sorted(pools))
        self.pools = pools
        self.confusion = confusion
        self.drop_axes = drop
        self.perm = perm
        self.cdtype = jnp.dtype(cdtype)
        self.fdtype = fdtype

    # ---- static structure key (what the compiled program depends on) ----
    def key(self) -> tuple:
        return (self.n, self.needs_density, self.ops, self.pool_shapes,
                self.confusion is not None, self.drop_axes, self.perm,
                str(self.cdtype), self.meas_axes)

    # ---- runtime argument pytree ----
    def args(self):
        stacked = tuple(jnp.asarray(np.stack(self.pools[s]))
                        for s in self.pool_shapes)
        conf = () if self.confusion is None else (jnp.asarray(self.confusion),)
        return (stacked, conf)

    # ---- tracing (called inside jit) ----
    def trace_probs(self, stacked, conf,
                    flips_ri: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        """Probability vector over the measured qubits, as a traced value.

        ``flips_ri`` (k, 2, 2, 2) float, if given, are extra one-qubit
        unitaries applied to the measured axes after the circuit but before
        readout confusion — the symmetrization flip layer.
        """
        n = self.n
        by_shape = dict(zip(self.pool_shapes, stacked))
        mats = [(kind, axes, _join_ri(by_shape[shape][idx], self.cdtype))
                for kind, axes, shape, idx in self.ops]
        flip_mats = None
        if flips_ri is not None:
            flip_mats = [(ax, _join_ri(flips_ri[i], self.cdtype))
                         for i, ax in enumerate(self.meas_axes)]

        if self.needs_density:
            d = 2 ** n
            rho = jnp.zeros((d, d), dtype=self.cdtype).at[0, 0].set(1.0)
            for kind, axes, mat in mats:
                if kind == "u":
                    rho = apply_gate_to_density(rho, mat, list(axes), n)
                else:
                    rho = apply_kraus_to_density(rho, mat, list(axes), n)
            if flip_mats is not None:
                for ax, mat in flip_mats:
                    rho = apply_gate_to_density(rho, mat, [ax], n)
            p = jnp.clip(jnp.real(jnp.diagonal(rho)), 0, None)
            p = p / jnp.sum(p)
            if conf:
                p = jnp.matmul(conf[0].astype(p.dtype), p,
                               precision=jax.lax.Precision.HIGHEST)
        else:
            psi = jnp.zeros((2,) * n, dtype=self.cdtype).at[(0,) * n].set(1.0)
            for kind, axes, mat in mats:
                psi = apply_gate_matrix(psi, mat, list(axes))
            if flip_mats is not None:
                for ax, mat in flip_mats:
                    psi = apply_gate_matrix(psi, mat, [ax])
            p = jnp.abs(psi.reshape(-1)) ** 2
            p = p / jnp.sum(p)
        # marginalize + reorder to the requested qubit order
        pt = p.reshape((2,) * n)
        if self.drop_axes:
            pt = jnp.sum(pt, axis=self.drop_axes)
        pt = jnp.transpose(pt, self.perm)
        return pt.reshape(-1)


def _cache_get(key: tuple, builder):
    global _CACHE_HITS, _CACHE_MISSES
    fn = _CACHE.get(key)
    if fn is not None:
        _CACHE_HITS += 1
        _CACHE.move_to_end(key)
        return fn
    _CACHE_MISSES += 1
    fn = builder()
    _CACHE[key] = fn
    while len(_CACHE) > _MAX_CACHE_ENTRIES:
        _CACHE.popitem(last=False)
    return fn


def _sample_from_probs(probs: jnp.ndarray, key, num_shots: int,
                       k: int) -> jnp.ndarray:
    logits = jnp.log(jnp.clip(probs, jnp.finfo(probs.dtype).tiny, None))
    ints = jax.random.categorical(key, logits, shape=(num_shots,))
    shifts = jnp.arange(k - 1, -1, -1)
    return (ints[:, None] >> shifts) & 1


def build_plan(circuit: Circuit, qubits: Sequence[int], cdtype,
               t1s=None, t2s=None, noisy: bool = False) -> CircuitPlan:
    return CircuitPlan(circuit, qubits, cdtype, t1s, t2s, noisy)


def sample_bits(plan: CircuitPlan, num_shots: int, key) -> jnp.ndarray:
    """(num_shots, k) 0/1 samples via the cached compiled executable."""
    k = len(plan.meas_axes)
    cache_key = ("run", plan.key(), num_shots)

    def builder():
        def fn(stacked, conf, key):
            probs = plan.trace_probs(stacked, conf)
            return _sample_from_probs(probs, key, num_shots, k)
        return jax.jit(fn)

    fn = _cache_get(cache_key, builder)
    stacked, conf = plan.args()
    return fn(stacked, conf, key)


def sample_bits_symmetrized(plan: CircuitPlan, patterns: np.ndarray,
                            shots_per_pattern: int, key) -> jnp.ndarray:
    """One dispatch (and one compile per structure) for ALL flip patterns.

    Returns (n_patterns, shots_per_pattern, k) bits, already XORed with each
    pattern. The flip layer acts on the state before readout confusion —
    identical semantics to appending X gates per pattern, but the compiled
    program is shared across patterns and runs vmapped in a single dispatch.
    """
    k = len(plan.meas_axes)
    patterns = np.asarray(patterns, dtype=np.int64)
    n_patterns = len(patterns)
    cache_key = ("symrun", plan.key(), n_patterns, shots_per_pattern)

    def builder():
        def one(stacked, conf, flips_ri, pattern, key):
            probs = plan.trace_probs(stacked, conf, flips_ri)
            bits = _sample_from_probs(probs, key, shots_per_pattern, k)
            return bits ^ pattern

        def fn(stacked, conf, flips_ri, patterns_arr, keys):
            return jax.vmap(one, in_axes=(None, None, 0, 0, 0))(
                stacked, conf, flips_ri, patterns_arr, keys)
        return jax.jit(fn)

    fn = _cache_get(cache_key, builder)
    # (n_patterns, k, 2, 2, 2) float flip-layer values: I or X per qubit
    flip_pair = np.stack([_split_ri(_I_MAT, plan.fdtype),
                          _split_ri(_X_MAT, plan.fdtype)])
    flips_ri = jnp.asarray(flip_pair[patterns])
    stacked, conf = plan.args()
    keys = jax.random.split(key, n_patterns)
    return fn(stacked, conf, flips_ri, jnp.asarray(patterns), keys)
