"""Example: superoperator representations, projections, and random operators.

Mirrors the reference's superoperator_tools and random_operators notebooks:
convert a noisy channel between Kraus / Choi / chi / Pauli-Liouville
representations, validate physicality, project an unphysical estimate back to
CPTP, and sample the random-operator menagerie.

Run on CPU with:
    python -c "import jax; jax.config.update('jax_platforms','cpu'); \
               jax.config.update('jax_enable_x64', True); \
               exec(open('examples/superoperator_tools.py').read())"
"""
import numpy as np
import jax
import jax.numpy as jnp

from forest_benchmarking_tpu.ops import (
    kraus2choi, choi2kraus, choi2chi, choi2pauli_liouville, kraus2superop,
    proj_choi_to_physical, choi_is_cptp, choi_is_unital,
    apply_kraus_ops_2_state, apply_choi_matrix_2_state)
from forest_benchmarking_tpu.ops.random_operators import (
    haar_rand_unitary, ginibre_state_matrix, bures_measure_state_matrix,
    rand_map_with_BCSZ_dist)
from forest_benchmarking_tpu.sim.noise import damping_kraus_map

# --- representations of a 1Q amplitude-damping channel
kraus = jnp.asarray(np.stack(damping_kraus_map(0.1)))
choi = kraus2choi(kraus)
print("amplitude damping p=0.1:")
print("  CPTP:", bool(choi_is_cptp(choi)), " unital:", bool(choi_is_unital(choi)))
print("  chi[0,0] (identity weight):", float(jnp.real(choi2chi(choi)[0, 0])))
print("  PTM:\n", np.round(np.asarray(jnp.real(choi2pauli_liouville(choi))), 3))

# applying the channel: Kraus and Choi forms agree
rho = np.array([[0.2, 0.3], [0.3, 0.8]], dtype=complex)
out_k = np.asarray(apply_kraus_ops_2_state(kraus, jnp.asarray(rho)))
out_c = np.asarray(apply_choi_matrix_2_state(choi, jnp.asarray(rho)))
print("  apply agreement (Kraus vs Choi):", np.abs(out_k - out_c).max())

# --- projection: corrupt the Choi, project back to the physical set
rng = np.random.RandomState(0)
noise = 0.05 * (rng.randn(4, 4) + 1j * rng.randn(4, 4))
corrupted = choi + jnp.asarray(noise + noise.conj().T)
print("corrupted is CPTP:", bool(choi_is_cptp(corrupted)))
repaired = proj_choi_to_physical(corrupted, tol=1e-8, max_iters=5000)
print("projected back:    CPTP:", bool(choi_is_cptp(repaired, atol=1e-3)),
      " distance moved:", float(jnp.abs(repaired - corrupted).max()))

# --- random operators (all take explicit jax PRNG keys)
key = jax.random.PRNGKey(42)
k1, k2, k3, k4 = jax.random.split(key, 4)
u = haar_rand_unitary(k1, 4)
print("Haar unitary: max |U U^dag - I| =",
      float(jnp.abs(u @ u.conj().T - jnp.eye(4)).max()))
rho_g = ginibre_state_matrix(k2, 2, 2)
rho_b = bures_measure_state_matrix(k3, 2)
print("Ginibre state purity:", float(jnp.real(jnp.trace(rho_g @ rho_g))),
      " Bures state purity:", float(jnp.real(jnp.trace(rho_b @ rho_b))))
rand_choi = rand_map_with_BCSZ_dist(k4, 2, 4)
print("BCSZ random channel is CPTP:", bool(choi_is_cptp(rand_choi, atol=1e-8)))
