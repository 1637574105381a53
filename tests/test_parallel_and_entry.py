"""Multi-chip sharding on the virtual 8-device CPU mesh + graft entry points."""
import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from forest_benchmarking_tpu.parallel import (
    make_mesh, shard_batch, replicate, batch_sharded)
from forest_benchmarking_tpu.benchmarks import (
    process_tomo_A_matrix, synth_process_datasets, split_complex, join_complex)
from forest_benchmarking_tpu.tomography import pgdb_process_estimate_batched


def test_mesh_has_8_devices():
    mesh = make_mesh()
    assert mesh.devices.size == 8


def test_shard_batch_and_replicate():
    mesh = make_mesh()
    x = jnp.arange(16.0).reshape(16, 1)
    xs = shard_batch(mesh, x)
    assert xs.sharding.spec == P("batch", None)
    a = replicate(mesh, jnp.eye(3))
    assert a.sharding.spec == P()


def test_sharded_pgdb_matches_single_device():
    mesh = make_mesh()
    a = jnp.asarray(process_tomo_A_matrix(2))
    n, chois = synth_process_datasets(jax.random.PRNGKey(0), a, 4, 16, 500,
                                      dtype=jnp.float64)
    expected = np.asarray(pgdb_process_estimate_batched(
        a, n, dim=4, maxiter=8, dyk_iters=20))

    def fn(shared, batched):
        return pgdb_process_estimate_batched(shared, batched, dim=4,
                                             maxiter=8, dyk_iters=20)

    sharded_fn = batch_sharded(fn, mesh)
    a_r = replicate(mesh, a)
    n_s = shard_batch(mesh, n)
    out = sharded_fn(a_r, n_s)
    assert np.allclose(np.asarray(out), expected, atol=1e-12)


@pytest.mark.slow
def test_sharded_fused_apg_matches_single_device():
    """cp_method='pallas' under the mesh: shard_map-wrapped apg_fused on 8
    devices reproduces the single-device fused solve exactly (the solve is
    elementwise in the batch dim, so sharding must not move the numerics)."""
    from forest_benchmarking_tpu.ops.lanes_apg import apg_fused, apg_fused_sharded

    mesh = make_mesh()
    a = jnp.asarray(process_tomo_A_matrix(2))
    n, _ = synth_process_datasets(jax.random.PRNGKey(3), a, 4, 16, 500,
                                  dtype=jnp.float64)
    # short schedule: this checks mesh plumbing, not convergence
    kw = dict(dim=4, phases=((4, 1, 1), (4, 2, 1)), init_iters=4,
              final_iters=6)
    expected = np.asarray(apg_fused(a, n, **kw))
    a_r = replicate(mesh, a)
    n_s = shard_batch(mesh, n)
    out = apg_fused_sharded(a_r, n_s, mesh, **kw)
    assert out.sharding.spec[0] == "batch"   # leading (batch) dim sharded
    assert np.allclose(np.asarray(out), expected, atol=1e-12)
    with pytest.raises(ValueError, match="divisible"):
        apg_fused_sharded(a_r, n[:12], mesh, **kw)


def test_graft_entry_compiles():
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as g
    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    pf, mean_pf = out
    assert pf.shape == (64,)
    assert np.isfinite(float(mean_pf))


@pytest.mark.slow
def test_graft_dryrun_multichip():
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as g
    g.dryrun_multichip(8)
    g.dryrun_multichip(4)


def test_sharded_qv_matches_per_shard_streams():
    """sample_heavy_outputs_sharded == concatenating single-chip runs with
    fold_in(key, shard_index) — bit-exact on the virtual mesh, ideal and
    noisy-trajectory paths."""
    from forest_benchmarking_tpu.quantum_volume import (
        sample_heavy_outputs_batched, sample_heavy_outputs_sharded)
    from forest_benchmarking_tpu.sim.noise import depolarizing_kraus_map

    mesh = make_mesh()
    n_dev = mesh.devices.size
    key = jax.random.PRNGKey(11)
    depth, per_dev, shots = 4, 5, 64

    got = np.asarray(sample_heavy_outputs_sharded(
        key, mesh, depth=depth, num_circuits=per_dev * n_dev,
        num_shots=shots, dtype=jnp.float32))
    want = np.concatenate([
        np.asarray(sample_heavy_outputs_batched(
            jax.random.fold_in(key, d), depth=depth, num_circuits=per_dev,
            num_shots=shots, dtype=jnp.float32))
        for d in range(n_dev)])
    np.testing.assert_array_equal(got, want)

    ks = depolarizing_kraus_map(0.05)
    two_q = np.stack([np.kron(a, b) for a in ks for b in ks])
    kraus_ri = jnp.asarray(np.stack([two_q.real, two_q.imag])
                           .astype(np.float32))
    got = np.asarray(sample_heavy_outputs_sharded(
        key, mesh, depth=depth, num_circuits=per_dev * n_dev,
        num_shots=shots, dtype=jnp.float32, kraus=kraus_ri,
        noisy_method="trajectory", num_trajectories=16))
    want = np.concatenate([
        np.asarray(sample_heavy_outputs_batched(
            jax.random.fold_in(key, d), depth=depth, num_circuits=per_dev,
            num_shots=shots, dtype=jnp.float32, kraus=kraus_ri,
            noisy_method="trajectory", num_trajectories=16))
        for d in range(n_dev)])
    np.testing.assert_array_equal(got, want)

    with pytest.raises(ValueError, match="divisible"):
        sample_heavy_outputs_sharded(key, mesh, depth=depth,
                                     num_circuits=n_dev * 2 + 1,
                                     num_shots=shots)


def test_batch_sharded_rb_simulation_matches_single_device():
    """The generic batch_sharded helper composes with the RB PTM simulator:
    survivals with the sequence axis sharded over the mesh == unsharded."""
    from forest_benchmarking_tpu.randomized_benchmarking import (
        sequences_to_ptm_stack, simulate_rb_survival_batched,
        generate_rb_experiment_sequences)

    mesh = make_mesh()
    qubits = (0,)
    depths = [d for d in [2, 6, 10, 16] for _ in range(4)]  # 16 sequences
    sequences = generate_rb_experiment_sequences(qubits, depths, random_seed=5)
    ptms, lengths = sequences_to_ptm_stack(sequences, qubits)
    noise_ptm = jnp.asarray(np.diag([1.0, 0.9, 0.9, 0.9]))

    want = np.asarray(simulate_rb_survival_batched(
        jnp.asarray(ptms), noise_ptm, lengths=jnp.asarray(lengths)))

    fn = batch_sharded(
        lambda shared, batched: simulate_rb_survival_batched(
            batched[0], shared, lengths=batched[1]), mesh)
    got = np.asarray(fn(noise_ptm, (shard_batch(mesh, jnp.asarray(ptms)),
                                    shard_batch(mesh, jnp.asarray(lengths)))))
    np.testing.assert_allclose(got, want, atol=1e-12)


@pytest.mark.slow
def test_sharded_fused_apg_vreg_layout_matches_single_device():
    """The vreg batch layout (sublanes>1) composes with the mesh wrapper:
    each shard reshapes its local batch, so sharded == unsharded exactly."""
    from forest_benchmarking_tpu.ops.lanes_apg import (apg_fused,
                                                       apg_fused_sharded)

    mesh = make_mesh()
    a = jnp.asarray(process_tomo_A_matrix(2))
    n, _ = synth_process_datasets(jax.random.PRNGKey(9), a, 4, 32, 500,
                                  dtype=jnp.float64)
    kw = dict(dim=4, phases=((4, 1, 1), (4, 2, 1)), init_iters=4,
              final_iters=6, sublanes=2)   # per-device batch 4, 2 | 4
    expected = np.asarray(apg_fused(a, n, **kw))
    out = apg_fused_sharded(replicate(mesh, a), shard_batch(mesh, n),
                            mesh, **kw)
    assert np.allclose(np.asarray(out), expected, atol=1e-12)


def test_sharded_fused_dnorm_matches_single_device():
    """dnorm_fused_sharded on the 8-device mesh reproduces the single-device
    fused diamond norm exactly (elementwise in the channel-pair batch)."""
    from forest_benchmarking_tpu.ops.lanes_dnorm import (dnorm_fused,
                                                         dnorm_fused_sharded)
    from forest_benchmarking_tpu.ops.random_operators import (
        rand_map_with_BCSZ_dist)

    mesh = make_mesh()
    k1, k2 = jax.random.split(jax.random.PRNGKey(11))
    # 1Q channels: this checks mesh plumbing, not convergence — the n=4
    # planes compile is seconds on CPU where the 2Q (n=16) one is minutes
    c0 = rand_map_with_BCSZ_dist(k1, 2, 4, batch=(16,))
    c1 = rand_map_with_BCSZ_dist(k2, 2, 4, batch=(16,))
    kw = dict(num_iters=16)
    expected = np.asarray(dnorm_fused(c0, c1, **kw))
    out = dnorm_fused_sharded(shard_batch(mesh, c0), shard_batch(mesh, c1),
                              mesh, **kw)
    assert out.sharding.spec[0] == "batch"
    assert np.allclose(np.asarray(out), expected, atol=1e-12)
    with pytest.raises(ValueError, match="divisible"):
        dnorm_fused_sharded(c0[:12], c1[:12], mesh, **kw)
