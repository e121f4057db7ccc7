"""Dual-encoder integration: towers, contrastive loss, CLIP train step with
sensing harvest, neuron slow loop end-to-end, Forde-lite."""

import jax
import jax.numpy as jnp
import numpy as np

from forde_tpu.brain.neuron_slow_loop import (
    canonicalize_labels,
    forde_lite_assignments,
    neuron_slow_loop_step,
)
from forde_tpu.core.config import BrainConfig, DualEncoderConfig, TowerConfig
from forde_tpu.data.vl import SyntheticVLDataset
from forde_tpu.models.dual_encoder import (
    FORDEDualEncoder,
    clip_contrastive_loss,
    l2_normalize,
)
import pytest

from forde_tpu.train.clip_step import (
    clip_eval_embeddings,
    clip_train_step,
    create_clip_train_state,
)


def tiny_cfg(**kw) -> DualEncoderConfig:
    base = dict(
        image_size=32,
        patch_size=8,
        vision=TowerConfig(
            d_model=32, num_layers=2, num_heads=2, head_dim=16, mlp_hidden_dim=64
        ),
        vocab_size=128,
        max_text_len=16,
        text=TowerConfig(
            d_model=32, num_layers=2, num_heads=2, head_dim=16, mlp_hidden_dim=64
        ),
        embed_dim=32,
        stateful_kernel_impl="reference",
    )
    base.update(kw)
    return DualEncoderConfig(**base)


def _batch(b=4, cfg=None, seed=0):
    cfg = cfg or tiny_cfg()
    ds = SyntheticVLDataset(
        b, 1, image_size=cfg.image_size, text_len=cfg.max_text_len,
        vocab_size=cfg.vocab_size, seed=seed,
    )
    raw = next(iter(ds))
    return {k: jnp.asarray(v) for k, v in raw.items()}


@pytest.mark.slow
def test_dual_encoder_forward_shapes_and_collections():
    cfg = tiny_cfg()
    model = FORDEDualEncoder(config=cfg)
    batch = _batch(2, cfg)
    variables = model.init(
        jax.random.PRNGKey(0), batch["image"], batch["input_ids"],
        batch["attention_mask"],
    )
    assert set(variables) >= {"params", "brain", "stats_buffer", "perturbations"}
    (img, txt, scale), updates = model.apply(
        variables, batch["image"], batch["input_ids"], batch["attention_mask"],
        mutable=["stats_buffer"],
    )
    assert img.shape == (2, cfg.embed_dim)
    assert txt.shape == (2, cfg.embed_dim)
    assert np.isfinite(np.asarray(img)).all()
    # 4 StatefulLayers (2 vision + 2 text) sensed one step each
    counts = [
        v
        for p, v in jax.tree_util.tree_flatten_with_path(updates["stats_buffer"])[0]
        if "step_count" in str(p)
    ]
    assert len(counts) == 4 and all(int(c) == 1 for c in counts)


def test_contrastive_loss_prefers_aligned_pairs():
    key = jax.random.PRNGKey(0)
    emb = jax.random.normal(key, (8, 16))
    loss_aligned, m = clip_contrastive_loss(emb, emb, jnp.array(2.0))
    shuffled = jnp.roll(emb, 1, axis=0)
    loss_shuffled, _ = clip_contrastive_loss(emb, shuffled, jnp.array(2.0))
    assert float(loss_aligned) < float(loss_shuffled)
    assert float(m["contrastive/acc_img"]) == 1.0
    # embeddings normalized inside
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(l2_normalize(emb)), axis=-1), 1.0, atol=1e-5
    )


@pytest.mark.slow
def test_clip_train_step_senses_and_learns():
    cfg = tiny_cfg()
    b = 4
    state = create_clip_train_state(
        cfg, jax.random.PRNGKey(0), 1e-3, 0.01, batch_size=b,
        text_len=cfg.max_text_len,
    )
    batch = _batch(b, cfg)
    losses = []
    for _ in range(10):
        state, metrics = clip_train_step(state, batch)
        losses.append(float(metrics["loss/contrastive"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]  # memorizes the fixed batch
    assert int(state.grad_step_count) == 10
    # grad stats accumulated and nonzero
    leaves = jax.tree.leaves(state.grad_stats)
    assert len(leaves) == 4
    for leaf in leaves:
        assert leaf.shape[-1] == 2
        assert float(jnp.abs(leaf).sum()) > 0
    # act stats accumulated
    for p, v in jax.tree_util.tree_flatten_with_path(state.stats_buffer)[0]:
        if "step_count" in str(p):
            assert int(v) == 10


@pytest.mark.slow
def test_neuron_slow_loop_rewrites_brain_and_resets():
    cfg = tiny_cfg()
    state = create_clip_train_state(
        cfg, jax.random.PRNGKey(0), 1e-3, 0.01, batch_size=4,
        text_len=cfg.max_text_len,
    )
    batch = _batch(4, cfg)
    for _ in range(3):
        state, _ = clip_train_step(state, batch)

    new_brain, new_stats, new_grads, diag = neuron_slow_loop_step(
        state.brain,
        state.stats_buffer,
        state.grad_stats,
        state.grad_step_count,
        jax.random.PRNGKey(1),
        brain=BrainConfig(gmm_iterations=10, gmm_kmeans_iterations=5),
    )
    assert not bool(diag["skipped"])
    assert len(diag["layers"]) == 4
    # assignments now span multiple types for at least one layer
    assert any(
        len(np.unique(np.asarray(d["assignments"]))) > 1
        for d in diag["layers"].values()
    )
    for leaf in jax.tree.leaves(new_stats) + jax.tree.leaves(new_grads):
        assert float(jnp.abs(leaf).sum()) == 0.0
    # new brain actually landed: at least one layer's assignments differ
    # from the all-zeros init
    changed = [
        float(jnp.abs(leaf).sum()) > 0 for leaf in jax.tree.leaves(new_brain)
    ]
    assert any(changed)


def test_forde_lite_rules():
    stats = jnp.array(
        [
            [0.9, 0.1, 0.5, 0.1, 0.1],  # spec (grad_gini > 0.8)
            [0.1, 0.1, 0.1, 0.1, 0.1],  # pool (act_gini < 0.3)
            [0.1, 0.1, 0.9, 0.1, 0.1],  # generalist
        ]
    )
    a = forde_lite_assignments(stats, BrainConfig())
    np.testing.assert_array_equal(np.asarray(a), [2, 1, 0])


def test_canonicalize_labels():
    assignments = jnp.array([0, 0, 1, 1, 2, 2], jnp.int32)
    gini = jnp.array([0.9, 0.8, 0.1, 0.2, 0.5, 0.5])
    out = canonicalize_labels(assignments, gini, 3)
    # old cluster 1 (lowest gini) -> 0, old 2 -> 1, old 0 (highest) -> 2
    np.testing.assert_array_equal(np.asarray(out), [2, 2, 0, 0, 1, 1])


def test_eval_embeddings_no_mutation():
    cfg = tiny_cfg()
    state = create_clip_train_state(
        cfg, jax.random.PRNGKey(0), 1e-3, 0.01, batch_size=2,
        text_len=cfg.max_text_len,
    )
    batch = _batch(2, cfg)
    img, txt, scale = clip_eval_embeddings(state, batch)
    assert img.shape == (2, cfg.embed_dim)
    # different batch size than init also works (taps disabled in eval)
    batch3 = _batch(3, cfg)
    img3, _, _ = clip_eval_embeddings(state, batch3)
    assert img3.shape == (3, cfg.embed_dim)


def test_single_tower_encode_methods_match_call():
    """encode_image / encode_text (the serving surface) must produce the
    same embeddings as the joint __call__ and share its param tree."""
    cfg = tiny_cfg()
    model = FORDEDualEncoder(config=cfg)
    batch = _batch(2, cfg)
    variables = model.init(
        jax.random.PRNGKey(0), batch["image"], batch["input_ids"],
        batch["attention_mask"],
    )
    (img, txt, _), _ = model.apply(
        variables, batch["image"], batch["input_ids"], batch["attention_mask"],
        mutable=["stats_buffer"],
    )
    img_solo, _ = model.apply(
        variables, batch["image"], method=FORDEDualEncoder.encode_image,
        mutable=["stats_buffer"],
    )
    txt_solo, _ = model.apply(
        variables, batch["input_ids"], batch["attention_mask"],
        method=FORDEDualEncoder.encode_text, mutable=["stats_buffer"],
    )
    np.testing.assert_allclose(np.asarray(img_solo), np.asarray(img), atol=1e-6)
    np.testing.assert_allclose(np.asarray(txt_solo), np.asarray(txt), atol=1e-6)
