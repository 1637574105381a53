"""TPU-dtype regression smoke suite (``-m tpu_smoke``).

Runs the production f32/c64 kernel configurations — the actual TPU regime —
on whatever backend is active, asserting f32-level tolerances against
analytic/statistical targets (no f64 oracle needed at runtime). On the dev
box they run under the cpu backend in f32; on the chip run them with

    FBT_TPU_SMOKE=1 python -m pytest tests -m tpu_smoke

(tests/conftest.py skips the cpu/x64 pin under that env var). Every jit
surface here is float/int-only, so the suite works over the axon TPU tunnel
(complex arrays cannot be fetched device->host there).
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from forest_benchmarking_tpu.analysis.fitting import (
    _base_param_decay_p, fit_model_batched)
from forest_benchmarking_tpu.benchmarks import (
    process_tomo_A_matrix, synth_process_datasets, split_complex, join_complex)
from forest_benchmarking_tpu.ops.lanes_apg import apg_fused
from forest_benchmarking_tpu.ops.project_superoperators import (
    proj_choi_to_physical)
from forest_benchmarking_tpu.ops.random_operators import rand_map_with_BCSZ_dist
from forest_benchmarking_tpu.quantum_volume import sample_heavy_outputs_batched
from forest_benchmarking_tpu.tomography import (
    iterative_mle_state_estimate_batched, pgdb_process_estimate_batched)

pytestmark = pytest.mark.tpu_smoke

BATCH = 128
SHOTS = 2000
A_RI = jnp.asarray(split_complex(process_tomo_A_matrix(2).astype(np.complex64)))


def _data(key, batch=BATCH):
    @jax.jit
    def gen(a_ri, key):
        a = join_complex(a_ri)
        n, chois = synth_process_datasets(key, a, 4, batch, SHOTS,
                                          dtype=jnp.float32)
        return n, jnp.stack([jnp.real(chois), jnp.imag(chois)])
    n, c = gen(A_RI, key)
    return n, c


def _rel_err(est, chois):
    err = jnp.sqrt(jnp.sum(jnp.abs(est - chois) ** 2, axis=(1, 2)))
    return err / jnp.sqrt(jnp.sum(jnp.abs(chois) ** 2, axis=(1, 2)))


def _tp_viol(est):
    pt = jnp.trace(est.reshape(-1, 4, 4, 4, 4), axis1=2, axis2=4)
    return jnp.max(jnp.abs(pt - jnp.eye(4)[None]), axis=(1, 2))


def test_apg_solver_f32():
    """Headline-config warm APG at f32 reconstructs to the shot-noise floor
    and returns (near-)physical channels."""
    n, c = _data(jax.random.PRNGKey(0))

    @jax.jit
    def solve(a_ri, n, c_ri):
        a = join_complex(a_ri)
        est = pgdb_process_estimate_batched(
            a, n, dim=4, stop_tol=1e-4, maxiter=25, dyk_tol=1e-4,
            dyk_iters=20, method="apg", warm_start=True, loop_dyk_iters=1)
        return _rel_err(est, join_complex(c_ri)), _tp_viol(est)

    rel, tp = (np.asarray(x) for x in solve(A_RI, n, c))
    assert rel.mean() < 0.12          # shot-noise floor ~0.10 at 2000 shots
    assert tp.max() < 1e-4


def test_fused_apg_solver_f32():
    """The fused lanes-layout solver (production headline schedule) at f32:
    physical output at the shot-noise floor. The full parity schedule is
    exercised by bench.py; this covers kernel + dtypes quickly."""
    from forest_benchmarking_tpu.ops.lanes_apg import HEADLINE_TUNED_2Q
    n, c = _data(jax.random.PRNGKey(1))

    @jax.jit
    def solve(a_ri, n, c_ri):
        a = join_complex(a_ri)
        est = apg_fused(a, n, dim=4, **HEADLINE_TUNED_2Q)
        return _rel_err(est, join_complex(c_ri)), _tp_viol(est)

    rel, tp = (np.asarray(x) for x in solve(A_RI, n, c))
    assert rel.mean() < 0.14
    assert tp.max() < 1e-5


def test_pgdb_solver_f32():
    """Reference-faithful PGDB at f32 (production bench config)."""
    n, c = _data(jax.random.PRNGKey(2), batch=32)

    @jax.jit
    def solve(a_ri, n, c_ri):
        a = join_complex(a_ri)
        est = pgdb_process_estimate_batched(a, n, dim=4, stop_tol=1e-6,
                                            maxiter=60, dyk_tol=1e-4,
                                            dyk_iters=20)
        return _rel_err(est, join_complex(c_ri)), _tp_viol(est)

    rel, tp = (np.asarray(x) for x in solve(A_RI, n, c))
    assert rel.mean() < 0.12
    assert tp.max() < 1e-4


def test_dykstra_projection_f32():
    """CPTP projection at f32: physical output; CPTP inputs are fixed points."""
    @jax.jit
    def run(seed):
        key = jax.random.PRNGKey(seed)
        chois = rand_map_with_BCSZ_dist(key, 4, 16, batch=(64,),
                                        dtype=jnp.float32)
        perturbed = chois + 0.05 * jnp.eye(16)[None] * jnp.arange(64)[:, None, None] / 64
        proj = proj_choi_to_physical(perturbed, tol=1e-4, max_iters=50)
        fixed = proj_choi_to_physical(chois, tol=1e-4, max_iters=50)
        w = jnp.linalg.eigvalsh((proj + jnp.conj(jnp.swapaxes(proj, 1, 2))) / 2)
        fp_dev = jnp.max(jnp.abs(fixed - chois), axis=(1, 2))
        return jnp.min(w, axis=1), _tp_viol(proj), fp_dev

    minw, tp, fp = (np.asarray(x) for x in run(3))
    assert minw.min() > -1e-4
    assert tp.max() < 1e-5
    assert fp.max() < 1e-4


def test_batched_lm_fitter_f32():
    """Batched Levenberg-Marquardt at f32 recovers decay parameters."""
    b, npts = 256, 12
    x = np.arange(1, npts + 1, dtype=np.float32) * 4
    rng = np.random.RandomState(0)
    amp = 0.5 * np.ones(b)
    decay = rng.uniform(0.8, 0.95, b)
    base = 0.5 * np.ones(b)
    y = (amp[:, None] * decay[:, None] ** x[None] + base[:, None]
         + 1e-3 * rng.randn(b, npts)).astype(np.float32)
    params, chisq, _ = fit_model_batched(
        _base_param_decay_p, np.broadcast_to(x, (b, npts)), y, None,
        np.array([0.6, 0.9, 0.4], np.float32), num_iters=50)
    params = np.asarray(params)
    assert np.max(np.abs(params[:, 1] - decay)) < 2e-2
    assert np.max(np.abs(params[:, 0] - amp)) < 5e-2


def test_qv_sim_f32():
    """Ideal QV heavy-output fraction at f32 sits near the large-depth
    asymptote (1+ln2)/2 ~ 0.847."""
    nh = np.asarray(jax.jit(
        sample_heavy_outputs_batched,
        static_argnames=("depth", "num_circuits", "num_shots", "dtype"))(
            jax.random.PRNGKey(4), depth=4, num_circuits=200, num_shots=500))
    assert nh.shape == (200,)  # per-circuit counts (tunnel-safe array return)
    frac = int(nh.sum()) / (200 * 500)
    assert 0.75 < frac < 0.92


def test_fused_apg_sharded_f32():
    """apg_fused under shard_map on a mesh of the available devices: on a
    real chip this exercises the production multi-chip path with the actual
    Pallas kernel per shard (the virtual-CPU-mesh test covers 8-way
    sharding with the XLA-path numerics). Sharded output == unsharded."""
    from forest_benchmarking_tpu.ops.lanes_apg import (apg_fused,
                                                       apg_fused_sharded)
    from forest_benchmarking_tpu.parallel import (make_mesh, shard_batch,
                                                  replicate)

    n_dev = len(jax.devices())
    mesh = make_mesh(jax.devices()[:n_dev])
    batch = 128 * n_dev
    n, _ = _data(jax.random.PRNGKey(8), batch=batch)
    kw = dict(dim=4, phases=((4, 1, 1), (4, 2, 1)), init_iters=4,
              final_iters=6)

    @jax.jit
    def direct(a_ri, nn):
        est = apg_fused(join_complex(a_ri), nn, **kw)
        return jnp.stack([jnp.real(est), jnp.imag(est)])

    @jax.jit
    def sharded(a_ri, nn):
        est = apg_fused_sharded(join_complex(a_ri), nn, mesh, **kw)
        return jnp.stack([jnp.real(est), jnp.imag(est)])

    want = np.asarray(direct(A_RI, n))
    got = np.asarray(sharded(replicate(mesh, A_RI), shard_batch(mesh, n)))
    assert np.max(np.abs(got - want)) < 1e-5


def test_noisy_qv_trajectory_f32():
    """Noisy QV through the trajectory path (the fused Pallas kernel on TPU,
    the identical-math XLA formulation on cpu): depolarizing noise pulls the
    depth-7 heavy fraction clearly below the ideal asymptote but far above
    the 0.5 random floor."""
    from forest_benchmarking_tpu.sim.noise import depolarizing_kraus_map
    ks = depolarizing_kraus_map(0.02)
    two_q = np.stack([np.kron(a, b) for a in ks for b in ks])
    kraus_ri = jnp.asarray(np.stack([two_q.real, two_q.imag])
                           .astype(np.float32))
    nh = np.asarray(jax.jit(
        sample_heavy_outputs_batched,
        static_argnames=("depth", "num_circuits", "num_shots", "dtype",
                         "noisy_method", "num_trajectories"))(
            jax.random.PRNGKey(6), depth=7, num_circuits=50, num_shots=256,
            kraus=kraus_ri, noisy_method="trajectory"))
    assert nh.shape == (50,)  # per-circuit counts (tunnel-safe array return)
    frac = int(nh.sum()) / (50 * 256)
    assert 0.55 < frac < 0.85


def test_state_mle_f32():
    """Warm-started 1Q DIMLE at f32 (production config 1 settings)."""
    paulis = np.stack([np.array([[0, 1], [1, 0]]),
                       np.array([[0, -1j], [1j, 0]]),
                       np.array([[1, 0], [0, -1]])]).astype(np.complex64)
    rng = np.random.RandomState(1)
    b = 512
    # random pure-ish states' Bloch vectors, noisy measurements
    v = rng.randn(b, 3)
    v /= np.linalg.norm(v, axis=1, keepdims=True) * 1.25
    e = (v + 0.02 * rng.randn(b, 3)).astype(np.float32)

    @jax.jit
    def solve(paulis_ri, e):
        obs = join_complex(paulis_ri)
        rho = iterative_mle_state_estimate_batched(
            obs, e, jnp.full((e.shape[0],), 3000.0, jnp.float32),
            maxiter=60, warm_start=True)
        bloch = jnp.stack([jnp.real(jnp.einsum("sij,bji->bs", obs, rho))],
                          axis=0)[0]
        tr = jnp.real(jnp.trace(rho, axis1=1, axis2=2))
        return bloch, tr

    bloch, tr = (np.asarray(x) for x in solve(
        jnp.asarray(split_complex(paulis)), jnp.asarray(e)))
    assert np.max(np.abs(tr - 1)) < 1e-5
    assert np.median(np.linalg.norm(bloch - v, axis=1)) < 0.05


def test_diamond_norm_f32():
    """f32 diamond norm on random 2Q channel pairs: internally pinned
    full-precision matmuls keep the known analytic case accurate (identity
    vs itself = 0; orthogonal-unitary pair = 2)."""
    @jax.jit
    def run(seed):
        from forest_benchmarking_tpu.distance_measures import (
            diamond_norm_distance)
        from forest_benchmarking_tpu.ops.superoperator_transformations import (
            kraus2choi)
        key = jax.random.PRNGKey(seed)
        chois = rand_map_with_BCSZ_dist(key, 2, 4, batch=(4,),
                                        dtype=jnp.float32)
        self_d = diamond_norm_distance(chois, chois)
        eye = kraus2choi(jnp.eye(2, dtype=jnp.complex64)[None])
        x = kraus2choi(jnp.asarray([[0, 1], [1, 0]], jnp.complex64)[None])
        ortho = diamond_norm_distance(eye, x)
        return self_d, ortho

    self_d, ortho = (np.asarray(x) for x in run(0))
    assert np.max(np.abs(self_d)) < 1e-4
    assert abs(float(ortho) - 2.0) < 1e-3
