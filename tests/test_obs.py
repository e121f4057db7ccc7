"""Observability: plot artifacts, metrics writer, throughput meter."""

import json
import os
import time

import numpy as np

from forde_tpu.obs.metrics import MetricsWriter, ThroughputMeter
from forde_tpu.obs.plots import plot_brain_scan, plot_census, plot_feature_space
import pytest


def test_plot_artifacts_written(tmp_path):
    out = str(tmp_path / "plots")
    grid = np.array([[0, 1, 2], [1, 1, 0]])
    p1 = plot_brain_scan(grid, epoch=0, step=10, output_dir=out)
    stats = np.random.RandomState(0).rand(12, 2)
    assigns = np.random.RandomState(1).randint(0, 3, 12)
    p2 = plot_feature_space(stats, assigns, 0, 10, out)
    p3 = plot_census(assigns, 0, 10, out, num_clusters=3,
                     labels={0: "Gen", 1: "Pool", 2: "Spec"})
    for p in (p1, p2, p3):
        assert os.path.exists(p) and os.path.getsize(p) > 0
    assert "brain_scan_epoch0_step10.png" in p1  # reference naming scheme


def test_plot_brain_scan_1d_assignments(tmp_path):
    # 1D input (e.g. 7 experts) is rendered as a single row
    p = plot_brain_scan(np.array([0, 1, 2, 1, 0, 2, 1]), 1, 5, str(tmp_path))
    assert os.path.exists(p)


def test_metrics_writer_roundtrip(tmp_path):
    w = MetricsWriter(str(tmp_path / "run"))
    w.scalars({"loss/total": 1.5, "loss/aux": 0.1}, step=3)
    w.scalar("Throughput/tokens_per_sec_per_chip", 1000.0, step=3)
    w.flush()
    w.close()
    files = os.listdir(str(tmp_path / "run"))
    assert files  # tensorboard events or metrics.jsonl
    jsonl = os.path.join(str(tmp_path / "run"), "metrics.jsonl")
    if os.path.exists(jsonl):
        rows = [json.loads(line) for line in open(jsonl)]
        assert {"tag": "loss/total", "value": 1.5, "step": 3} in rows


def test_throughput_meter():
    m = ThroughputMeter(items_per_step=100, num_chips=2)
    m.step(4)
    time.sleep(0.05)
    rate = m.items_per_sec_per_chip
    assert 0 < rate < 4 * 100 / 0.05 / 2 + 1
    m.reset()
    assert m.items_per_sec_per_chip == 0.0


def test_retrieval_metrics_perfect_and_shuffled():
    import jax.numpy as jnp

    from forde_tpu.obs.retrieval import retrieval_metrics

    rng = np.random.RandomState(0)
    emb = rng.randn(16, 8).astype(np.float32)
    m = retrieval_metrics(jnp.asarray(emb), jnp.asarray(emb))
    assert m["retrieval/i2t_recall@1"] == 1.0
    assert m["retrieval/t2i_mean_rank"] == 1.0
    # mismatched pairs: recall@1 should be far from 1
    shuffled = np.roll(emb, 5, axis=0)
    m2 = retrieval_metrics(jnp.asarray(emb), jnp.asarray(shuffled))
    assert m2["retrieval/i2t_recall@1"] < 0.5


@pytest.mark.slow
def test_evaluate_retrieval_end_to_end():
    import jax

    from forde_tpu.data.vl import SyntheticVLDataset
    from forde_tpu.obs.retrieval import evaluate_retrieval
    from forde_tpu.train.clip_step import create_clip_train_state
    from tests.test_dual_encoder import tiny_cfg

    cfg = tiny_cfg()
    state = create_clip_train_state(
        cfg, jax.random.PRNGKey(0), 1e-3, 0.0, batch_size=4,
        text_len=cfg.max_text_len,
    )
    ds = SyntheticVLDataset(4, 3, image_size=cfg.image_size,
                            text_len=cfg.max_text_len,
                            vocab_size=cfg.vocab_size)
    metrics = evaluate_retrieval(state, ds, ks=(1, 5))
    assert set(metrics) >= {
        "retrieval/i2t_recall@1", "retrieval/t2i_recall@5",
        "retrieval/i2t_mean_rank",
    }
    assert 0.0 <= metrics["retrieval/i2t_recall@1"] <= 1.0
