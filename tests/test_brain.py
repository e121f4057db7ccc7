"""Brain package tests: sensing edge cases, on-device GMM vs sklearn,
smoothing semantics, and the full jitted slow loop.

Mirrors reference verification intent (tests/verify_hoyer.py,
tests/verify_reset.py) and adds GMM fidelity vs sklearn that the reference
cannot test (its GMM *is* sklearn).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from forde_tpu.brain import actuation, clustering, sensing, smoothing
from forde_tpu.brain.slow_loop import collect_moe_stats, moe_slow_loop_step
from forde_tpu.core.config import BrainConfig


# ---------------------------------------------------------------------------
# Sensing (verify_hoyer.py parity)
# ---------------------------------------------------------------------------


def test_hoyer_edge_cases():
    assert float(sensing.hoyer_sparsity(jnp.zeros(16))) == 0.0  # zero vec
    np.testing.assert_allclose(
        float(sensing.hoyer_sparsity(jnp.ones(16))), 0.0, atol=1e-6
    )  # uniform
    one_hot = jnp.zeros(16).at[3].set(5.0)
    np.testing.assert_allclose(
        float(sensing.hoyer_sparsity(one_hot)), 1.0, atol=1e-6
    )  # single spike
    assert float(sensing.hoyer_sparsity(jnp.array([3.0]))) == 0.0  # N == 1


def test_hoyer_matches_reference_formula():
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (7, 33))
    n = x.shape[-1]
    l1 = jnp.sum(jnp.abs(x), -1)
    l2 = jnp.sqrt(jnp.sum(x**2, -1))
    expected = (jnp.sqrt(float(n)) - l1 / l2) / (jnp.sqrt(float(n)) - 1)
    np.testing.assert_allclose(
        np.asarray(sensing.hoyer_sparsity(x)), np.asarray(expected), atol=1e-6
    )


def test_neuron_stats_shape_and_semantics():
    key = jax.random.PRNGKey(1)
    acts = jax.random.normal(key, (8, 4, 32))
    grads = jax.random.normal(jax.random.PRNGKey(2), (8, 4, 32))
    stats = sensing.calculate_neuron_stats(acts, grads)
    assert stats.shape == (32, 5)
    # act_gdp is mean |activation| per neuron
    np.testing.assert_allclose(
        np.asarray(stats[:, 3]),
        np.abs(np.asarray(acts).reshape(-1, 32)).mean(0),
        atol=1e-5,
    )
    # sparse neuron has high act_gini
    sparse = jnp.zeros((64, 16)).at[0, 0].set(10.0)
    s = sensing.calculate_neuron_stats(sparse, jnp.ones((64, 16)))
    assert float(s[0, 2]) > 0.8


def test_expert_stats():
    probs = jax.nn.softmax(jax.random.normal(jax.random.PRNGKey(3), (4, 16, 8)))
    stats = sensing.calculate_expert_stats(probs)
    assert stats.shape == (8, 5)
    np.testing.assert_allclose(float(stats[:, 0].sum()), 1.0, atol=1e-5)
    # entropy column is constant across experts (reference quirk)
    assert float(stats[:, 2].std()) < 1e-6


# ---------------------------------------------------------------------------
# On-device GMM vs sklearn
# ---------------------------------------------------------------------------


def test_gmm_recovers_separated_clusters():
    key = jax.random.PRNGKey(0)
    n, d = 120, 5
    base = jax.random.normal(key, (n, d)) * 0.3
    data = base.at[0:40].add(4.0).at[40:80].add(-4.0)
    assignments, params = clustering.cluster_neurons_gmm(
        data, 3, jax.random.PRNGKey(7)
    )
    # Each true block maps to one dominant label; blocks get distinct labels.
    labels = [
        int(np.bincount(np.asarray(assignments[a:b])).argmax())
        for a, b in ((0, 40), (40, 80), (80, 120))
    ]
    assert len(set(labels)) == 3
    purity = np.mean(
        [
            (np.asarray(assignments[a:b]) == lab).mean()
            for (a, b), lab in zip(((0, 40), (40, 80), (80, 120)), labels)
        ]
    )
    assert purity > 0.95
    assert params["means"].shape == (3, d)
    assert params["covariances"].shape == (3, d, d)
    np.testing.assert_allclose(float(params["weights"].sum()), 1.0, atol=1e-4)


def test_gmm_agrees_with_sklearn_up_to_permutation():
    sklearn = pytest.importorskip("sklearn.mixture")
    rng = np.random.RandomState(0)
    data = np.concatenate(
        [
            rng.randn(50, 3) * 0.4 + [3, 0, 0],
            rng.randn(50, 3) * 0.4 + [-3, 0, 0],
            rng.randn(50, 3) * 0.4 + [0, 4, 0],
        ]
    ).astype(np.float32)
    ours, _ = clustering.cluster_neurons_gmm(
        jnp.asarray(data), 3, jax.random.PRNGKey(1)
    )
    ref = sklearn.GaussianMixture(n_components=3, random_state=0).fit_predict(data)
    # Agreement up to label permutation (labels are arbitrary in both).
    ours = np.asarray(ours)
    from itertools import permutations

    best = max(
        (np.mean(np.take(perm, ours) == ref) for perm in permutations(range(3)))
    )
    assert best > 0.95, best


# ---------------------------------------------------------------------------
# Smoothing
# ---------------------------------------------------------------------------


def test_smoothing_removes_salt_and_pepper():
    grid = jnp.zeros((8, 8), dtype=jnp.int32).at[4, 4].set(1)
    out = smoothing.smooth_assignments(grid, kernel_size=3, num_clusters=2)
    assert int(out.sum()) == 0  # lone pixel voted away


def test_smoothing_preserves_contiguous_regions():
    grid = jnp.concatenate(
        [jnp.zeros((8, 4), jnp.int32), jnp.ones((8, 4), jnp.int32)], axis=1
    )
    out = smoothing.smooth_assignments(grid, kernel_size=3, num_clusters=2)
    # Interior of each half keeps its label.
    assert int(out[:, :3].sum()) == 0
    assert int(out[:, 5:].sum()) == 8 * 3


def test_smoothing_matches_reference_conv_math():
    """Our single-conv mode filter equals the reference's per-cluster
    scipy-style convolution (smoothing.py:49-89)."""
    from jax.scipy.signal import convolve2d

    key = jax.random.PRNGKey(5)
    grid = jax.random.randint(key, (6, 7), 0, 3)
    k = 3
    kernel = jnp.ones((k, k)) / (k**2)
    one_hot = jax.nn.one_hot(grid, 3)
    ref_density = jnp.stack(
        [convolve2d(one_hot[:, :, i], kernel, mode="same") for i in range(3)],
        axis=-1,
    )
    expected = jnp.argmax(ref_density, axis=-1)
    out = smoothing.smooth_assignments(grid, kernel_size=k, num_clusters=3)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(expected))


def test_smoothing_3d_tiny_grid():
    """(1, 2, 4) expert grid with 3x3x3 kernel — the edge-pad path
    (reference smoothing.py:129-146)."""
    grid = jnp.array([[[0, 0, 1, 1], [0, 2, 1, 1]]])
    out = smoothing.smooth_assignments_3d(grid, kernel_size=3, num_clusters=3)
    assert out.shape == grid.shape
    assert out.dtype in (jnp.int32, jnp.int64)


def test_near_square_grid():
    assert smoothing.near_square_grid(8) == (2, 4)
    assert smoothing.near_square_grid(16) == (4, 4)
    assert smoothing.near_square_grid(7) == (1, 7)


# ---------------------------------------------------------------------------
# Actuation + full slow loop
# ---------------------------------------------------------------------------


def _mock_state(num_layers=2, num_experts=4):
    params = {
        f"layer_{i}": {
            "moe": {
                "moe_layer": {
                    "router": {
                        "router_linear": {
                            "kernel": jnp.ones((8, num_experts)),
                            "bias": jnp.zeros(num_experts),
                        }
                    }
                }
            },
            "other": {"bias": jnp.zeros(num_experts)},  # must NOT be touched
        }
        for i in range(num_layers)
    }
    usage = jnp.stack(
        [jnp.array([0.7, 0.1, 0.1, 0.1]) * 10, jnp.array([0.4, 0.3, 0.2, 0.1]) * 10]
    )
    stats = {
        f"layer_{i}": {
            "moe": {
                "expert_usage": usage[i],
                "step_count": jnp.array(10, jnp.int32),
            }
        }
        for i in range(num_layers)
    }
    return params, {"stats_buffer": stats}


def test_collect_moe_stats():
    _, mv = _mock_state()
    usage, steps = collect_moe_stats(mv, 2, 4)
    assert int(steps) == 10
    np.testing.assert_allclose(float(usage[0, 0]), 7.0, atol=1e-5)


def test_router_adjustment_rules():
    assignments = jnp.array([0, 1, 2, 0])
    usage = jnp.array([0.7, 0.1, 0.1, 0.1])
    adj = actuation.compute_router_adjustments(assignments, usage)
    # over-used expert 0 pushed down, under-used pushed up
    assert float(adj[0]) < 0 and float(adj[2]) > 0
    # specialist (cluster 1) damped by half vs same-usage non-specialist
    np.testing.assert_allclose(float(adj[1]), float(adj[2]) * 0.5, atol=1e-6)
    assert np.abs(np.asarray(adj)).max() <= 0.1 + 1e-6


class _Cfg:
    num_layers = 2
    num_experts = 4


def test_slow_loop_end_to_end():
    params, mv = _mock_state()
    new_params, new_mv, diag = moe_slow_loop_step(
        params, mv, _Cfg(), jax.random.PRNGKey(0), brain=BrainConfig()
    )
    assert not bool(diag["skipped"])
    assert int(diag["updates_count"]) == 2
    # router biases changed, other params untouched
    b0 = new_params["layer_0"]["moe"]["moe_layer"]["router"]["router_linear"]["bias"]
    assert float(jnp.abs(b0).sum()) > 0
    np.testing.assert_array_equal(
        np.asarray(new_params["layer_0"]["other"]["bias"]), np.zeros(4)
    )
    # over-used expert 0 (usage 0.55 mean) must be pushed down
    assert float(b0[0]) < 0
    # reset: stats buffer zeroed (verify_reset.py parity)
    for leaf in jax.tree.leaves(new_mv["stats_buffer"]):
        assert float(jnp.abs(leaf).sum()) == 0.0


def test_slow_loop_skips_without_stats():
    params, mv = _mock_state()
    mv = jax.tree.map(jnp.zeros_like, mv)
    new_params, _, diag = moe_slow_loop_step(
        params, mv, _Cfg(), jax.random.PRNGKey(0)
    )
    assert bool(diag["skipped"])
    b0 = new_params["layer_0"]["moe"]["moe_layer"]["router"]["router_linear"]["bias"]
    np.testing.assert_array_equal(np.asarray(b0), np.zeros(4))
