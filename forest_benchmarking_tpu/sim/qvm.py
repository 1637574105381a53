"""The in-process quantum virtual machine: circuits -> shot data.

Replaces the reference's ``QuantumComputer`` handle (QVM server + rpcq client):
``run`` and ``run_symmetrized_readout`` have the same observable behavior as
pyquil's (observable_estimation.py:907,1016) but execute as on-device JAX
programs with explicit PRNG state — deterministic and server-free.
"""
from __future__ import annotations

from collections import OrderedDict
from typing import Sequence

import numpy as np
import jax
import jax.numpy as jnp

from forest_benchmarking_tpu.circuits import Circuit, Gate
from forest_benchmarking_tpu.paulis import PauliTerm, pauli_term_to_matrix
from forest_benchmarking_tpu.sim.statevector import run_statevector
from forest_benchmarking_tpu.sim.density import (
    run_density_matrix, density_probabilities)

__all__ = ["QVM", "_symmetrization_patterns"]


def _sylvester_hadamard(m: int) -> np.ndarray:
    """Sylvester Hadamard matrix of order m (m a power of two), entries +-1."""
    h = np.array([[1]])
    while h.shape[0] < m:
        h = np.block([[h, h], [h, -h]])
    return h


def _next_pow2(x: int) -> int:
    m = 1
    while m < x:
        m *= 2
    return m


def _symmetrization_patterns(symm_type: int, k: int) -> np.ndarray:
    """Flip-pattern matrix (n_patterns, k) for readout symmetrization.

    * -1: exhaustive, all 2**k rows.
    *  1: strength-1 OA — [all zeros; all ones] (2 rows).
    *  2: strength-2 OA from a Hadamard matrix of order m >= k+1 (m rows):
         drop the constant column, map +1 -> 0, -1 -> 1.
    *  3: strength-3 OA from [H; -H] with H of order m >= k (2m rows).
    """
    if symm_type == -1:
        ints = np.arange(2 ** k)
        shifts = np.arange(k - 1, -1, -1)
        return (ints[:, None] >> shifts) & 1
    if symm_type == 1:
        return np.stack([np.zeros(k, dtype=np.int64),
                         np.ones(k, dtype=np.int64)])
    if symm_type == 2:
        m = _next_pow2(k + 1)
        h = _sylvester_hadamard(m)
        return ((1 - h[:, 1:k + 1]) // 2).astype(np.int64)
    if symm_type == 3:
        m = _next_pow2(max(k, 2))
        h = _sylvester_hadamard(m)
        stacked = np.vstack([h, -h])
        return ((1 - stacked[:, :k]) // 2).astype(np.int64)
    raise ValueError(f"Unknown symmetrization type {symm_type}")


def _circuit_value_key(circuit: Circuit) -> tuple:
    """Hashable fingerprint of a circuit's full VALUES (gates incl. params and
    custom matrices, noise channels, readout confusion) — unlike the
    structure-only key in sim.executor, equal keys here mean the traced
    program constants are identical, so a jitted closure can be reused."""
    parts = []
    for g in circuit.gates:
        parts.append((g.name, g.qubits,
                      tuple(float(p) for p in g.params), g.dagger,
                      None if g.matrix is None else
                      np.asarray(g.matrix, dtype=complex).tobytes()))
    for name, qs, kraus in circuit.gate_noise:
        parts.append(("noise", name, None if qs is None else tuple(qs),
                      np.asarray(kraus, dtype=complex).tobytes()))
    for q, mat in sorted(circuit.readout_confusion.items()):
        parts.append(("conf", q, np.asarray(mat, dtype=float).tobytes()))
    return tuple(parts)


class QVM:
    """A seeded, in-process simulator with optional noise.

    :param seed: PRNG seed (explicit, reproducible; split per run).
    :param dtype: complex dtype for simulation (complex128 on cpu for parity
        tests, complex64 on TPU).
    :param noisy: force the density-matrix path even without noise annotations.
    """

    def __init__(self, seed: int = 52, dtype=jnp.complex128, noisy: bool = False,
                 t1s=None, t2s=None):
        self._key = jax.random.PRNGKey(seed)
        self.dtype = dtype
        self.noisy = noisy
        # optional per-qubit decoherence model applied at DELAY instructions
        self.t1s = dict(t1s or {})
        self.t2s = dict(t2s or {})
        self.name = f"fbtpu-qvm-{seed}"
        # value-keyed cache of jitted probabilities()/expectation() programs:
        # jax.jit caches by function identity, so a fresh lambda per call
        # would recompile every time on the accelerator backend
        self._jit_cache: "OrderedDict[tuple, object]" = OrderedDict()

    def _cached_jit(self, key_head: tuple, circuit: Circuit, impl):
        key = (key_head, _circuit_value_key(circuit), self.noisy,
               jnp.dtype(self.dtype).name,
               tuple(sorted(self.t1s.items())),
               tuple(sorted(self.t2s.items())))
        fn = self._jit_cache.get(key)
        if fn is None:
            fn = jax.jit(impl)
            if len(self._jit_cache) >= 256:
                self._jit_cache.popitem(last=False)
            self._jit_cache[key] = fn
        else:
            self._jit_cache.move_to_end(key)  # LRU, not FIFO
        return fn

    # ---- PRNG plumbing ----
    def _next_key(self):
        self._key, sub = jax.random.split(self._key)
        return sub

    # ---- exact results ----
    def wavefunction(self, circuit: Circuit, qubits: Sequence[int]) -> jnp.ndarray:
        """Exact wavefunction. NOTE: complex arrays cannot be fetched to host on
        the axon TPU tunnel; use probabilities()/expectation() there."""
        return run_statevector(circuit, qubits, self.dtype)

    def density(self, circuit: Circuit, qubits: Sequence[int]) -> jnp.ndarray:
        """Exact density matrix (same TPU host-fetch caveat as wavefunction)."""
        return run_density_matrix(circuit, qubits, self.dtype)

    def _probs_impl(self, circuit: Circuit, qubits) -> jnp.ndarray:
        """Probabilities over ``qubits`` (in order), simulating the union of
        the circuit's qubits and the requested ones, then marginalizing —
        mirroring how a QVM measures a subset of a larger register."""
        sim_qubits = sorted(set(circuit.get_qubits()) | set(qubits))
        needs_density = (circuit.gate_noise or circuit.readout_confusion
                         or self.noisy
                         or ((self.t1s or self.t2s)
                             and any(g.name == "DELAY" for g in circuit.gates)))
        if needs_density:
            p = density_probabilities(circuit, sim_qubits, self.dtype,
                                      t1s=self.t1s, t2s=self.t2s)
        else:
            psi = run_statevector(circuit, sim_qubits, self.dtype)
            p = jnp.abs(psi) ** 2
            p = p / jnp.sum(p)
        if list(sim_qubits) == list(qubits):
            return p
        n = len(sim_qubits)
        pos = {q: i for i, q in enumerate(sim_qubits)}
        keep_axes = [pos[q] for q in qubits]
        drop_axes = tuple(i for i in range(n) if i not in keep_axes)
        pt = p.reshape((2,) * n)
        if drop_axes:
            pt = jnp.sum(pt, axis=drop_axes)
        # remaining axes are the kept ones in sim order; reorder to `qubits`
        kept_sorted = [q for q in sim_qubits if q in set(qubits)]
        perm = [kept_sorted.index(q) for q in qubits]
        pt = jnp.transpose(pt, perm)
        return pt.reshape(-1)

    @staticmethod
    def _on_cpu() -> bool:
        # on cpu, per-circuit jit compiles dominate; run eagerly there. On the
        # axon TPU tunnel, jit with real outputs is REQUIRED (complex buffers
        # cannot cross the host boundary).
        return jax.default_backend() == "cpu"

    def probabilities(self, circuit: Circuit, qubits: Sequence[int]) -> jnp.ndarray:
        """Measurement probabilities; jitted so only real buffers leave device."""
        qubits = list(qubits)
        if self._on_cpu():
            return self._probs_impl(circuit, qubits)
        fn = self._cached_jit(("probs", tuple(qubits)), circuit,
                              lambda: self._probs_impl(circuit, qubits))
        return fn()

    def expectation(self, circuit: Circuit, qubits: Sequence[int],
                    observable: PauliTerm) -> float:
        """Exact <P> on the simulated (possibly noisy) state; no readout error.

        Like run()/probabilities(), the union of the circuit's, observable's,
        and requested qubits is simulated, so a circuit touching qubits
        outside ``qubits`` yields the marginal expectation instead of a crash.
        """
        qubits = list(qubits)
        sim_qubits = sorted(set(circuit.get_qubits()) | set(qubits)
                            | set(observable.get_qubits()))

        def impl():
            op = jnp.asarray(pauli_term_to_matrix(observable, sim_qubits),
                             self.dtype)
            if circuit.gate_noise or self.noisy or self.t1s or self.t2s:
                rho = run_density_matrix(circuit, sim_qubits, self.dtype,
                                         t1s=self.t1s, t2s=self.t2s)
                return jnp.real(jnp.trace(op @ rho))
            psi = run_statevector(circuit, sim_qubits, self.dtype)
            return jnp.real(jnp.conj(psi) @ (op @ psi))

        if self._on_cpu():
            return float(impl())
        fn = self._cached_jit(("expt", tuple(sim_qubits), str(observable)),
                              circuit, impl)
        return float(fn())

    # ---- sampling ----
    def run(self, circuit: Circuit, qubits: Sequence[int],
            num_shots: int) -> np.ndarray:
        """Sample bitstrings; returns (num_shots, len(qubits)) 0/1 array.

        Column i is qubit ``qubits[i]`` (analog of pyquil's ro register order).
        On accelerator backends the simulate+sample step runs through the
        structure-keyed executable cache (sim.executor): circuits differing
        only in gate values reuse one compiled program, and only int buffers
        cross the host boundary (axon TPU tunnel constraint).
        """
        qubits = list(qubits)
        n = len(qubits)
        key = self._next_key()

        if self._on_cpu():
            def impl(key):
                probs = self._probs_impl(circuit, qubits)
                logits = jnp.log(jnp.clip(probs,
                                          jnp.finfo(probs.dtype).tiny, None))
                ints = jax.random.categorical(key, logits, shape=(num_shots,))
                shifts = jnp.arange(n - 1, -1, -1)
                return (ints[:, None] >> shifts) & 1
            return np.asarray(impl(key), dtype=np.int64)

        from forest_benchmarking_tpu.sim.executor import build_plan, sample_bits
        plan = build_plan(circuit, qubits, self.dtype,
                          t1s=self.t1s, t2s=self.t2s, noisy=self.noisy)
        return np.asarray(sample_bits(plan, num_shots, key), dtype=np.int64)

    def run_symmetrized_readout(self, circuit: Circuit, num_shots: int,
                                symm_type: int = -1,
                                meas_qubits: Sequence[int] = None) -> np.ndarray:
        """Run with readout symmetrization.

        Pre-measurement X flips are applied according to the rows of a flip
        pattern matrix; observed bits are XORed with the pattern. Pattern sets
        (mirroring pyquil's semantics, reference observable_estimation.py:880):

          * -1 — exhaustive: all 2**k patterns
          *  0 — none
          *  1/2/3 — orthogonal array of the given strength (balances flip
            marginals over every 1/2/3-qubit subset with far fewer patterns)

        ``meas_qubits`` defaults to the circuit's own qubits (sorted).
        """
        if meas_qubits is None:
            meas_qubits = sorted(circuit.get_qubits())
        meas_qubits = list(meas_qubits)
        if symm_type == 0:
            return self.run(circuit, meas_qubits, num_shots)
        k = len(meas_qubits)
        patterns = _symmetrization_patterns(symm_type, k)
        n_patterns = len(patterns)
        base = num_shots // n_patterns
        rem = num_shots - base * n_patterns

        # the vmapped flip layer applies IDEAL I/X unitaries; if the circuit
        # attaches a noise channel to X gates, take the per-pattern path below
        # instead, where flips are real X Gates that pick up that channel —
        # keeping accelerator semantics identical to the cpu path and to
        # appending flip gates in pyquil
        flip_noise = any(
            name == "X" and (qs is None or any(q in meas_qubits for q in qs))
            for name, qs, _ in circuit.gate_noise)
        if not self._on_cpu() and not flip_noise:
            # one compiled executable + one dispatch for ALL patterns: the
            # flip layer is a runtime argument (I or X per measured qubit)
            from forest_benchmarking_tpu.sim.executor import (
                build_plan, sample_bits_symmetrized)
            plan = build_plan(circuit, meas_qubits, self.dtype,
                              t1s=self.t1s, t2s=self.t2s, noisy=self.noisy)
            shots_per = base + (1 if rem else 0)
            bits = np.asarray(sample_bits_symmetrized(
                plan, patterns, shots_per, self._next_key()), dtype=np.int64)
            chunks = [bits[i, :base + (1 if i < rem else 0)]
                      for i in range(n_patterns)]
            return np.concatenate(chunks, axis=0)

        chunks = []
        for pat, flips in enumerate(patterns):
            shots = base + (1 if pat < rem else 0)
            if shots == 0:
                continue
            flipped = circuit.copy()
            for q, f in zip(meas_qubits, flips):
                if f:
                    flipped += Gate("X", (), (q,))
            bits = self.run(flipped, meas_qubits, shots)
            chunks.append(bits ^ np.asarray(flips, dtype=np.int64))
        return np.concatenate(chunks, axis=0)
