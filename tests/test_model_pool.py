import jax
import jax.numpy as jnp
import numpy as np

from sgs_tpu.models.densify import densify_and_prune, reset_opacity
from sgs_tpu.models.gaussians import DensifyStats, GaussianPool
from sgs_tpu.train.optim import AdamState


def make_pool(n=20, capacity=64, seed=0, sh_degree=2):
    rng = np.random.default_rng(seed)
    pts = rng.normal(size=(n, 3)).astype(np.float32)
    cols = rng.uniform(size=(n, 3)).astype(np.float32)
    return GaussianPool.from_pcd(pts, cols, sh_degree, capacity=capacity)


def test_from_pcd_matches_reference_init():
    pool = make_pool()
    alive = np.asarray(pool.alive)
    assert alive[:20].all() and not alive[20:].any()
    # opacity = inverse_sigmoid(0.1)
    np.testing.assert_allclose(
        np.asarray(pool.get_opacity)[:20], 0.1, rtol=1e-5
    )
    # identity rotations
    np.testing.assert_allclose(
        np.asarray(pool.rotation)[:20], [[1, 0, 0, 0]] * 20, atol=1e-7
    )
    # isotropic scales: log sqrt(mean 3-NN sq dist)
    s = np.asarray(pool.scaling)[:20]
    assert np.allclose(s[:, 0], s[:, 1]) and np.allclose(s[:, 0], s[:, 2])
    # features_rest zero, dc = (rgb - 0.5)/C0
    assert np.asarray(pool.features_rest)[:20].max() == 0.0


def test_render_inputs_mask_dead_slots():
    pool = make_pool()
    gi = pool.render_inputs(active_sh_degree=0)
    assert gi.alive is not None
    assert gi.means3d.shape[0] == pool.capacity
    # dead slots must carry benign finite values
    assert np.isfinite(np.asarray(gi.scales)).all()
    assert np.isfinite(np.asarray(gi.rotations)).all()


def test_grow_preserves_content():
    pool = make_pool()
    bigger = pool.grown(128)
    assert bigger.capacity == 128
    np.testing.assert_array_equal(
        np.asarray(bigger.xyz)[:64], np.asarray(pool.xyz)
    )
    assert int(bigger.num_alive) == int(pool.num_alive)


def test_densify_clone_copies_small_high_grad():
    pool = make_pool(n=10, capacity=32)
    adam = AdamState.init(pool.params())
    stats = DensifyStats.zeros(32)
    # slot 3: high grad, small scale -> clone
    stats = stats.replace(
        xyz_gradient_accum=stats.xyz_gradient_accum.at[3, 0].set(1.0),
        denom=stats.denom.at[3, 0].set(1.0),
    )
    # make every scale small so nothing splits
    pool = pool.replace(scaling=jnp.full_like(pool.scaling, -5.0))
    new_pool, new_adam, new_stats, info = densify_and_prune(
        pool, adam, stats, jax.random.PRNGKey(0),
        max_grad=0.5, min_opacity=0.005, extent=10.0,
        max_screen_size=0.0, percent_dense=0.01,
    )
    assert int(info["n_cloned"]) == 1
    assert int(info["n_split"]) == 0
    assert int(info["n_pruned"]) == 0
    assert int(new_pool.num_alive) == 11
    # the clone is an exact copy of slot 3's parameters
    newcomer = np.asarray(new_pool.alive) & ~np.asarray(pool.alive)
    slot = int(np.nonzero(newcomer)[0][0])
    np.testing.assert_array_equal(
        np.asarray(new_pool.xyz)[slot], np.asarray(pool.xyz)[3]
    )
    # newcomer Adam moments zero
    assert np.asarray(new_adam.mu["xyz"])[slot].max() == 0.0
    # stats reset
    assert float(new_stats.xyz_gradient_accum.sum()) == 0.0


def test_densify_split_samples_children_and_prunes_parent():
    pool = make_pool(n=10, capacity=64)
    adam = AdamState.init(pool.params())
    stats = DensifyStats.zeros(64)
    stats = stats.replace(
        xyz_gradient_accum=stats.xyz_gradient_accum.at[5, 0].set(1.0),
        denom=stats.denom.at[5, 0].set(1.0),
    )
    # slot 5: large scale -> split
    pool = pool.replace(scaling=pool.scaling.at[5].set(jnp.log(jnp.asarray([2.0, 1.0, 0.5]))))
    new_pool, _, _, info = densify_and_prune(
        pool, adam, stats, jax.random.PRNGKey(1),
        max_grad=0.5, min_opacity=0.005, extent=10.0,
        max_screen_size=0.0, percent_dense=0.01,
    )
    assert int(info["n_split"]) == 1
    assert int(info["n_pruned"]) == 1  # the split parent
    assert int(new_pool.num_alive) == 11  # 10 - 1 + 2
    # exactly two alive slots carry the child scale = parent_scale/(0.8*2);
    # the parent's original scale is gone (freed slots may be reused).
    scales = np.exp(np.asarray(new_pool.scaling))[np.asarray(new_pool.alive)]
    child_scale = np.asarray([2.0, 1.0, 0.5]) / 1.6
    is_child = np.all(np.abs(scales - child_scale) < 1e-5 * child_scale, axis=1)
    assert is_child.sum() == 2
    parent_scale = np.asarray([2.0, 1.0, 0.5])
    assert not np.any(np.all(np.abs(scales - parent_scale) < 1e-6, axis=1))


def test_densify_prunes_low_opacity():
    pool = make_pool(n=10, capacity=32)
    adam = AdamState.init(pool.params())
    stats = DensifyStats.zeros(32)
    pool = pool.replace(opacity=pool.opacity.at[2, 0].set(-8.0))  # sigmoid ~ 3e-4
    new_pool, _, _, info = densify_and_prune(
        pool, adam, stats, jax.random.PRNGKey(2),
        max_grad=0.5, min_opacity=0.005, extent=10.0,
        max_screen_size=0.0, percent_dense=0.01,
    )
    assert int(info["n_pruned"]) == 1
    assert not bool(new_pool.alive[2])
    assert int(new_pool.num_alive) == 9
    # pruned slot reset to benign defaults
    np.testing.assert_allclose(np.asarray(new_pool.rotation)[2], [1, 0, 0, 0])


def test_densify_overflow_drops_children():
    pool = make_pool(n=10, capacity=10)  # zero free slots
    adam = AdamState.init(pool.params())
    stats = DensifyStats.zeros(10)
    stats = stats.replace(
        xyz_gradient_accum=jnp.ones_like(stats.xyz_gradient_accum),
        denom=jnp.ones_like(stats.denom),
    )
    pool2 = pool.replace(scaling=jnp.full_like(pool.scaling, -5.0))
    new_pool, _, _, info = densify_and_prune(
        pool2, adam, stats, jax.random.PRNGKey(3),
        max_grad=0.5, min_opacity=0.005, extent=10.0,
        max_screen_size=0.0, percent_dense=0.01,
    )
    assert int(info["n_cloned"]) == 10
    assert int(info["n_dropped_overflow"]) == 10  # no room
    assert int(new_pool.num_alive) == 10


def test_reset_opacity():
    pool = make_pool(n=5, capacity=16)
    adam = AdamState.init(pool.params())
    adam = adam.replace(mu={**adam.mu, "opacity": jnp.ones_like(adam.mu["opacity"])})
    new_pool, new_adam = reset_opacity(pool, adam)
    op = np.asarray(new_pool.get_opacity)[:5]
    np.testing.assert_allclose(op, 0.01, rtol=1e-4)  # init 0.1 -> min(0.1, 0.01)
    assert float(jnp.sum(jnp.abs(new_adam.mu["opacity"]))) == 0.0
    # dead slots untouched
    assert float(new_pool.opacity[10, 0]) == -10.0
