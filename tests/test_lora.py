"""LoRA fine-tuning: adapter init/merge semantics, frozen-base training,
CLI round trip, and merged serving (train/lora.py).

The reference has no fine-tuning story at all (pretrain-only,
src/training/train.py); these tests pin the framework's contract:
merged == base at init, only adapters move, serving reconstructs the
merged weights from (base checkpoint, adapter checkpoint) exactly.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from flax import traverse_util

from forde_tpu.core.config import LLMConfig
from forde_tpu.models.decoder_lm import FORDEDecoderLM
from forde_tpu.train import lora as lora_lib
from forde_tpu.train.state import create_train_state


def tiny_config(**kw):
    base = dict(
        vocab_size=64, d_model=32, num_layers=2, num_heads=2, head_dim=16,
        max_seq_len=64, use_moe=True, num_experts=2, top_k_experts=1,
        expert_hidden_dim=64, use_sparse_attention=True, window_size=8,
        use_hyper_connections=True, num_streams=2, dropout_rate=0.0,
    )
    base.update(kw)
    return LLMConfig(**base)


def make_state(config, seed=0):
    return create_train_state(
        config, jax.random.PRNGKey(seed), learning_rate=1e-3,
        weight_decay=0.0, init_batch_shape=(1, 16),
    )


class TestLoraCore:
    def test_merge_is_identity_at_init(self):
        config = tiny_config()
        state = make_state(config)
        adapters = lora_lib.init_lora(
            state.params, rank=4, rng=jax.random.PRNGKey(1)
        )
        merged = lora_lib.merge_lora(state.params, adapters, scale=2.0)
        ids = jnp.arange(16, dtype=jnp.int32)[None, :] % 64
        model = FORDEDecoderLM(config=config)
        (ref, _), _ = model.apply(
            {"params": state.params, "stats_buffer": state.stats_buffer},
            ids, mutable=["stats_buffer"],
        )
        (got, _), _ = model.apply(
            {"params": merged, "stats_buffer": state.stats_buffer},
            ids, mutable=["stats_buffer"],
        )
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-6)

    def test_targets_cover_attention_projections(self):
        config = tiny_config()
        state = make_state(config)
        adapters = lora_lib.init_lora(
            state.params, rank=2, rng=jax.random.PRNGKey(1)
        )
        flat = traverse_util.flatten_dict(jax.tree.map(lambda x: 0, adapters))
        mods = {p[-3] for p in flat}  # module above kernel/lora_a
        # local fused qkv + out, compressed q/k/v/out, topk q/k/v/out
        assert "qkv_proj" in mods and "out_proj" in mods
        assert "compressed_k_proj" in mods and "topk_v_proj" in mods
        # rank shapes: A (..., in, r), B (..., r, out)
        aflat = traverse_util.flatten_dict(adapters)
        for p, leaf in aflat.items():
            if p[-1] == "lora_a":
                assert leaf.shape[-1] == 2
            else:
                assert leaf.shape[-2] == 2

    def test_expert_bank_targets_handle_stacked_dims(self):
        config = tiny_config()
        state = make_state(config)
        adapters = lora_lib.init_lora(
            state.params, rank=2, rng=jax.random.PRNGKey(1),
            targets=("w_up", "w_down"),
        )
        aflat = traverse_util.flatten_dict(adapters)
        a = aflat[("layer_0", "moe", "moe_layer", "experts", "w_up", "lora_a")]
        assert a.shape == (2, 32, 2)  # (E, in, r): leading expert dim kept
        merged = lora_lib.merge_lora(state.params, adapters, scale=1.0)
        mflat = traverse_util.flatten_dict(merged)
        assert mflat[
            ("layer_0", "moe", "moe_layer", "experts", "w_up")
        ].shape == (2, 32, 64)

    def test_unknown_target_raises(self):
        config = tiny_config()
        state = make_state(config)
        with pytest.raises(ValueError, match="matched no kernel"):
            lora_lib.init_lora(
                state.params, rank=2, rng=jax.random.PRNGKey(1),
                targets=("definitely_not_a_module",),
            )

    @pytest.mark.slow
    def test_train_moves_adapters_only_and_loss_drops(self):
        config = tiny_config()
        full = make_state(config)
        base = full.params
        state = lora_lib.create_lora_train_state(
            full, base, rank=4, rng=jax.random.PRNGKey(1), tx=full.tx
        )
        step = lora_lib.make_lora_train_step(
            lora_lib.lora_scale(4, 16.0), aux_loss_weight=0.01
        )
        rng = np.random.RandomState(0)
        batch = {
            "input_ids": jnp.asarray(
                rng.randint(0, 8, size=(4, 16)), jnp.int32
            )
        }
        first = None
        b_leaf_before = traverse_util.flatten_dict(state.params)[
            ("layer_0", "sparse_attention", "local_attention", "qkv_proj",
             "kernel", "lora_b")
        ]
        assert float(jnp.abs(b_leaf_before).max()) == 0.0
        for i in range(30):
            state, metrics = step(state, base, batch)
            if first is None:
                first = float(metrics["loss/total"])
        last = float(metrics["loss/total"])
        assert last < first - 0.1, (first, last)
        # adapters moved
        b_after = traverse_util.flatten_dict(state.params)[
            ("layer_0", "sparse_attention", "local_attention", "qkv_proj",
             "kernel", "lora_b")
        ]
        assert float(jnp.abs(b_after).max()) > 0
        # stats buffer advanced (FORDE fast loop still accumulates)
        sflat = traverse_util.flatten_dict(state.stats_buffer)
        counts = [v for k, v in sflat.items() if k[-1] == "step_count"]
        assert counts and float(counts[0]) == 30

    def test_adapter_count_is_small(self):
        config = tiny_config()
        full = make_state(config)
        adapters = lora_lib.init_lora(
            full.params, rank=2, rng=jax.random.PRNGKey(1)
        )
        n_base = sum(x.size for x in jax.tree.leaves(full.params))
        assert lora_lib.adapter_param_count(adapters) < 0.25 * n_base


class TestLoraCLI:
    def _pretrain(self, tmp_path, name="base"):
        from forde_tpu.train.loop import build_parser, train

        ckpt = str(tmp_path / name)
        args = build_parser().parse_args([
            "--use_dummy_data", "--steps_per_epoch", "2", "--num_epochs", "1",
            "--batch_size", "2", "--seq_len", "16", "--d_model", "32",
            "--num_layers", "1", "--num_heads", "2", "--num_experts", "2",
            "--window_size", "8", "--slow_loop_interval", "0",
            "--log_interval", "1", "--plots_dir", "",
            "--checkpoint_dir", ckpt,
        ])
        train(args)
        return ckpt

    @pytest.mark.slow
    def test_lora_cli_roundtrip_and_serve_merge(self, tmp_path, capsys):
        from forde_tpu.train.checkpoint import load_lm_state
        from forde_tpu.train.loop import build_parser, train

        base = self._pretrain(tmp_path)
        lora_ckpt = str(tmp_path / "lora")
        args = build_parser().parse_args([
            "--use_dummy_data", "--steps_per_epoch", "3", "--num_epochs", "1",
            "--batch_size", "2", "--seq_len", "16",
            "--slow_loop_interval", "0", "--log_interval", "1",
            "--plots_dir", "", "--checkpoint_dir", lora_ckpt,
            "--init_from", base, "--lora_rank", "2",
        ])
        out = train(args)
        assert out["step"] == 3
        adapter_state = out["state"]
        # saved params are adapters (small tree with lora_a/lora_b leaves)
        flat = traverse_util.flatten_dict(adapter_state.params)
        assert all(p[-1] in ("lora_a", "lora_b") for p in flat)

        # serving loader returns the MERGED dense state
        config, served = load_lm_state(lora_ckpt)
        mflat = traverse_util.flatten_dict(served.params)
        assert all(p[-1] not in ("lora_a", "lora_b") for p in mflat)

        # and the merge equals base + scale * A@B computed by hand
        _, base_state = load_lm_state(base)
        # (device_get: the trained adapters live on the training mesh,
        # the reloaded base on the default device)
        expect = lora_lib.merge_lora(
            jax.device_get(base_state.params),
            jax.device_get(adapter_state.params),
            lora_lib.lora_scale(2, 16.0),
        )
        for p, leaf in traverse_util.flatten_dict(expect).items():
            np.testing.assert_allclose(
                np.asarray(mflat[p]), np.asarray(leaf), atol=1e-6,
                err_msg="/".join(p),
            )

    def test_lora_requires_init_from(self):
        from forde_tpu.train.loop import build_parser, train

        args = build_parser().parse_args([
            "--use_dummy_data", "--lora_rank", "2",
            "--slow_loop_interval", "0",
        ])
        with pytest.raises(ValueError, match="requires --init_from"):
            train(args)

    @pytest.mark.slow
    def test_lora_rejects_slow_loop(self, tmp_path):
        from forde_tpu.train.loop import build_parser, train

        base = self._pretrain(tmp_path)
        args = build_parser().parse_args([
            "--use_dummy_data", "--init_from", base, "--lora_rank", "2",
        ])
        with pytest.raises(ValueError, match="slow_loop_interval 0"):
            train(args)

    @pytest.mark.slow
    def test_warm_start_without_lora(self, tmp_path):
        from forde_tpu.train.checkpoint import load_lm_state
        from forde_tpu.train.loop import build_parser, train

        base = self._pretrain(tmp_path)
        _, base_state = load_lm_state(base)
        args = build_parser().parse_args([
            "--use_dummy_data", "--steps_per_epoch", "1", "--num_epochs",
            "1", "--batch_size", "2", "--seq_len", "16",
            "--slow_loop_interval", "0", "--log_interval", "1",
            "--plots_dir", "", "--init_from", base,
        ])
        out = train(args)
        # params warm-started: one step moved them, but the embedding is
        # near the base values, NOT a fresh random init
        emb0 = np.asarray(
            traverse_util.flatten_dict(base_state.params)[
                ("token_embed", "embedding")
            ]
        )
        emb1 = np.asarray(
            traverse_util.flatten_dict(out["state"].params)[
                ("token_embed", "embedding")
            ]
        )
        assert np.abs(emb1 - emb0).max() < 0.1
        assert not np.allclose(emb1, emb0)
