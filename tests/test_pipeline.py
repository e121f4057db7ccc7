"""GPipe pipeline parallelism (parallel/pipeline.py): exactness against
the unpipelined model on the 8-virtual-device CPU mesh.

GPipe is exact, not approximate — logits, gradients, and FORDE stats
must all match the plain forward (per-example computation is
independent of microbatching; usage stats decompose over microbatches).
"""

import pytest
import jax
import jax.numpy as jnp
import numpy as np
import optax

from forde_tpu.core import mesh as mesh_lib
from forde_tpu.core.config import DTypePolicy, LLMConfig
from forde_tpu.models.decoder_lm import FORDEDecoderLM
from forde_tpu.parallel.pipeline import merge_stats, pp_forward


def _cfg(**kw):
    base = dict(
        vocab_size=128,
        d_model=32,
        num_layers=4,
        num_heads=2,
        head_dim=16,
        max_seq_len=64,
        use_moe=True,
        num_experts=4,
        top_k_experts=2,
        expert_hidden_dim=64,
        moe_dispatch="capacity",
        moe_capacity_factor=4.0,
        use_sparse_attention=False,
        use_hyper_connections=True,
        num_streams=2,
        sinkhorn_iterations=3,
        dropout_rate=0.0,
        attention_impl="reference",
        scan_layers=True,
        dtypes=DTypePolicy.fp32(),
    )
    base.update(kw)
    return LLMConfig(**base)


def _setup(cfg, batch=8, seq=32):
    model = FORDEDecoderLM(config=cfg)
    variables = model.init(jax.random.PRNGKey(0), jnp.ones((1, 8), jnp.int32))
    ids = jnp.asarray(
        np.random.RandomState(3).randint(0, cfg.vocab_size, (batch, seq)),
        jnp.int32,
    )
    return model, dict(variables), ids


def _pipe_mesh(stages):
    return mesh_lib.create_mesh(
        data=1, pipe=stages, devices=jax.devices()[:stages]
    )


@pytest.mark.slow
def test_pp_forward_matches_model():
    """Logits + aux + stats from the 4-stage, 2-microbatch pipeline ==
    one plain full-batch forward."""
    cfg = _cfg()
    model, variables, ids = _setup(cfg)
    mesh = _pipe_mesh(4)

    pp_logits, pp_aux, pp_delta = pp_forward(cfg, variables, ids, mesh, 2)
    (ref_logits, ref_aux), upd = model.apply(
        variables, ids, mutable=["stats_buffer"]
    )
    np.testing.assert_allclose(
        np.asarray(pp_logits), np.asarray(ref_logits), atol=2e-5, rtol=2e-5
    )
    # plain forward sums aux over layers once for the full batch; the
    # pipeline averages the per-microbatch layer sums — equal only in
    # expectation, so compare against the microbatched reference:
    mb_aux = []
    for m in range(2):
        (_, a), _ = model.apply(
            variables, ids[4 * m : 4 * (m + 1)], mutable=["stats_buffer"]
        )
        mb_aux.append(float(a))
    np.testing.assert_allclose(float(pp_aux), np.mean(mb_aux), atol=1e-5)

    # expert-usage sums decompose over microbatches -> must equal the
    # full-batch forward's stats delta exactly
    ref_stats = upd["stats_buffer"]["layers"]["block"]
    flat_ref = jax.tree_util.tree_leaves_with_path(ref_stats)
    flat_pp = dict(
        (
            "/".join(str(getattr(k, "key", "")) for k in path),
            leaf,
        )
        for path, leaf in jax.tree_util.tree_leaves_with_path(pp_delta)
    )
    checked_usage = False
    for path, ref_leaf in flat_ref:
        name = "/".join(str(getattr(k, "key", "")) for k in path)
        if name.endswith("expert_usage"):
            np.testing.assert_allclose(
                np.asarray(flat_pp[name]),
                np.asarray(ref_leaf),
                atol=1e-4,
                rtol=1e-5,
            )
            checked_usage = True
    assert checked_usage

    # merge_stats: usage accumulates, step_count advances by exactly 1
    merged = merge_stats(variables["stats_buffer"], pp_delta)
    flat_m = jax.tree_util.tree_leaves_with_path(merged["layers"]["block"])
    for path, leaf in flat_m:
        if str(getattr(path[-1], "key", "")) == "step_count":
            np.testing.assert_array_equal(np.asarray(leaf), 1)


@pytest.mark.slow
def test_pp_gradients_match():
    """d(loss)/d(params) through the pipeline == through the plain model
    (gradient flows through ppermute + the tick scan)."""
    cfg = _cfg(num_layers=2)
    model, variables, ids = _setup(cfg, batch=4, seq=16)
    mesh = _pipe_mesh(2)
    params = variables["params"]
    stats = variables["stats_buffer"]

    def pp_loss(p):
        logits, aux, _ = pp_forward(
            cfg, {"params": p, "stats_buffer": stats}, ids, mesh, 2
        )
        lm = optax.softmax_cross_entropy_with_integer_labels(
            logits[:, :-1], ids[:, 1:]
        ).mean()
        return lm + 0.01 * aux

    def ref_loss(p):
        lms, auxes = [], []
        for m in range(2):
            (logits, aux), _ = model.apply(
                {"params": p, "stats_buffer": stats},
                ids[2 * m : 2 * (m + 1)],
                mutable=["stats_buffer"],
            )
            lms.append(
                optax.softmax_cross_entropy_with_integer_labels(
                    logits[:, :-1], ids[2 * m : 2 * (m + 1), 1:]
                ).mean()
            )
            auxes.append(aux)
        return jnp.mean(jnp.stack(lms)) + 0.01 * jnp.mean(jnp.stack(auxes))

    g_pp = jax.grad(pp_loss)(params)
    g_ref = jax.grad(ref_loss)(params)
    for (pa, a), (pb, b) in zip(
        jax.tree_util.tree_leaves_with_path(g_pp),
        jax.tree_util.tree_leaves_with_path(g_ref),
    ):
        np.testing.assert_allclose(
            np.asarray(a),
            np.asarray(b),
            atol=5e-5,
            rtol=5e-4,
            err_msg="/".join(str(getattr(k, "key", "")) for k in pa),
        )


@pytest.mark.slow
def test_pp_without_mhc_or_moe():
    """Dense decoder (no streams, no stats): pipeline still matches."""
    cfg = _cfg(use_hyper_connections=False, use_moe=False)
    model, variables, ids = _setup(cfg)
    mesh = _pipe_mesh(2)

    pp_logits, _, pp_delta = pp_forward(cfg, variables, ids, mesh, 4)
    ref_logits, _ = model.apply(variables, ids)
    assert pp_delta is None
    np.testing.assert_allclose(
        np.asarray(pp_logits), np.asarray(ref_logits), atol=2e-5, rtol=2e-5
    )


@pytest.mark.slow
def test_pp_composes_with_dp():
    """(data=2, pipe=2): microbatch examples shard over data, stages
    over pipe; logits still match the plain model."""
    cfg = _cfg(num_layers=2)
    model, variables, ids = _setup(cfg)
    mesh = mesh_lib.create_mesh(
        data=2, pipe=2, devices=jax.devices()[:4]
    )
    pp_logits, _, _ = pp_forward(cfg, variables, ids, mesh, 2)
    (ref_logits, _), _ = model.apply(variables, ids, mutable=["stats_buffer"])
    np.testing.assert_allclose(
        np.asarray(pp_logits), np.asarray(ref_logits), atol=2e-5, rtol=2e-5
    )


@pytest.mark.slow
def test_pp_train_cli_smoke(tmp_path):
    """Driver wiring: --pipeline_parallelism 2 trains with finite loss."""
    from forde_tpu.train.loop import build_parser, train

    args = build_parser().parse_args([
        "--use_dummy_data", "--steps_per_epoch", "3", "--num_epochs", "1",
        "--batch_size", "4", "--seq_len", "32",
        "--d_model", "32", "--num_layers", "2", "--num_heads", "2",
        "--num_experts", "2", "--window_size", "8", "--no_nsa",
        "--scan_layers", "--pipeline_parallelism", "2",
        "--pp_microbatches", "2",
        "--slow_loop_interval", "0", "--log_interval", "1",
        "--plots_dir", "", "--experiment_name", "pytest_smoke",
    ])
    out = train(args)
    assert np.isfinite(out["final_metrics"]["loss/total"])


@pytest.mark.slow
def test_pp_state_is_stage_sharded_at_rest():
    """shard_train_state on a pipe mesh puts P('pipe', ...) on the
    (L,)-stacked layer params AND optimizer moments (per-device state
    divides by stages — the point of PP), and the pp train step runs
    from that placement unchanged."""
    from forde_tpu.parallel.pipeline import make_pp_train_step
    from forde_tpu.train.state import create_train_state, shard_train_state

    cfg = _cfg(num_layers=2)
    mesh = mesh_lib.create_mesh(
        data=2, pipe=2, devices=jax.devices()[:4]
    )
    state = create_train_state(cfg, jax.random.PRNGKey(0), 1e-3, 0.0)
    state = shard_train_state(state, mesh)

    def pipe_sharded(tree):
        n = 0
        for path, leaf in jax.tree_util.tree_leaves_with_path(tree):
            names = [str(getattr(p, "key", "")) for p in path]
            if "layers" in names and hasattr(leaf, "sharding"):
                spec = tuple(leaf.sharding.spec)
                assert spec and spec[0] == "pipe", (names, spec)
                n += 1
        return n

    assert pipe_sharded(state.params) >= 10
    assert pipe_sharded(state.opt_state) >= 10

    step = make_pp_train_step(cfg, mesh, num_microbatches=2)
    ids = jnp.asarray(
        np.random.RandomState(5).randint(0, cfg.vocab_size, (8, 16)),
        jnp.int32,
    )
    new_state, metrics = step(state, {"input_ids": ids})
    assert np.isfinite(float(metrics["loss/total"]))
    # placement survives the step (donation keeps shardings)
    pipe_sharded(new_state.params)
