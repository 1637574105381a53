"""Example: state and process distance measures, including the diamond norm.

Mirrors the reference's distance_measures notebook: fidelities, trace
distance, purity, and for processes the average gate / process fidelities and
the diamond-norm distance (first-order Watrous SDP solver — replaces cvxpy).

Run on CPU with:
    python -c "import jax; jax.config.update('jax_platforms','cpu'); \
               jax.config.update('jax_enable_x64', True); \
               exec(open('examples/distance_measures.py').read())"
"""
import numpy as np
import jax.numpy as jnp

from forest_benchmarking_tpu.ops import kraus2choi, choi2pauli_liouville
from forest_benchmarking_tpu.sim.noise import depolarizing_kraus_map
from forest_benchmarking_tpu.distance_measures import (
    fidelity, trace_distance, purity, bures_angle, entanglement_fidelity,
    process_fidelity, diamond_norm_distance, watrous_bounds)

# --- states
plus = np.array([[0.5, 0.5], [0.5, 0.5]], dtype=complex)
zero = np.array([[1, 0], [0, 0]], dtype=complex)
mixed = np.eye(2, dtype=complex) / 2
print("F(|+>,|0>) =", float(jnp.real(fidelity(jnp.asarray(plus), jnp.asarray(zero)))),
      " (analytic 0.5)")
print("T(|0>,I/2) =", float(trace_distance(jnp.asarray(zero), jnp.asarray(mixed))),
      " (analytic 0.5)")
print("purity(I/2) =", float(jnp.real(purity(jnp.asarray(mixed)))),
      " bures_angle(|+>,|0>) =",
      float(bures_angle(jnp.asarray(plus), jnp.asarray(zero))))

# --- processes: identity vs p-depolarizing channel
p = 0.2
eye_choi = kraus2choi(jnp.asarray(np.eye(2, dtype=complex))[None])
dep_choi = kraus2choi(jnp.asarray(np.stack(depolarizing_kraus_map(p))))
pl_i = choi2pauli_liouville(eye_choi)
pl_d = choi2pauli_liouville(dep_choi)
print(f"\ndepolarizing p={p} vs identity (I w.p. 1-3p/4, X/Y/Z w.p. p/4):")
# reference convention: process_fidelity is the AVERAGE GATE fidelity
# (d*F_ent + 1)/(d+1); entanglement_fidelity is the process-matrix overlap
print("  process (avg gate) fidelity:",
      float(jnp.real(process_fidelity(pl_i, pl_d))),
      f" (analytic {1 - p / 2})")
print("  entanglement fidelity:",
      float(jnp.real(entanglement_fidelity(pl_i, pl_d))),
      f" (analytic {1 - 3 * p / 4})")

# diamond norm: ||I - Dep_p||_diamond = 3p/2 for this convention
dn = float(diamond_norm_distance(eye_choi, dep_choi))
lo, hi = (float(x) for x in watrous_bounds(eye_choi - dep_choi))
print(f"  diamond norm: {dn:.4f} (analytic {3 * p / 2:.4f}), "
      f"watrous bounds [{lo:.3f}, {hi:.3f}]")
