"""Driver-level tests: the EXPLICIT parallel paths (shard_map EP, ring
attention CP) wired into the production model/train step must match the
single-device run (VERDICT r1 item 5).

Runs on the 8-virtual-device CPU mesh (conftest.py).
"""

import jax
import jax.numpy as jnp
import numpy as np

from forde_tpu.core import mesh as mesh_lib
from forde_tpu.core.config import DTypePolicy, LLMConfig
from forde_tpu.train.state import create_train_state, shard_train_state
from forde_tpu.train.step import train_step


import pytest


@pytest.fixture(autouse=True)
def _fresh_compile_state():
    """XLA:CPU has segfaulted compiling this module's heavily-partitioned
    train steps late in a full-suite run (accumulated executables from
    ~20 prior files; the same tests pass standalone — jax-ml/jax-level
    compiler state bug, not a model bug). Dropping the in-process
    compilation caches before each test removes the trigger and bounds
    compiler memory."""
    jax.clear_caches()
    yield


def _cfg(**kw):
    base = dict(
        vocab_size=128,
        d_model=32,
        num_layers=2,
        num_heads=2,
        head_dim=16,
        max_seq_len=64,
        use_moe=True,
        num_experts=4,
        top_k_experts=2,
        expert_hidden_dim=64,
        use_sparse_attention=False,
        use_hyper_connections=True,
        num_streams=2,
        sinkhorn_iterations=3,
        dropout_rate=0.0,
        attention_impl="reference",
        dtypes=DTypePolicy.fp32(),
        # capacity >= T*K (factor >= E) guarantees zero dropped tokens, so
        # capacity-routed outputs are exactly the dense-routing outputs and
        # shard-local routing matches global routing.
        moe_capacity_factor=4.0,
    )
    base.update(kw)
    return LLMConfig(**base)


def _run_steps(cfg, mesh, model_mesh, batch_np, n=2):
    state = create_train_state(
        cfg, jax.random.PRNGKey(0), 1e-2, 0.0,
        init_batch_shape=(1, 16), mesh=model_mesh,
    )
    state = shard_train_state(state, mesh)
    sharding = mesh_lib.tokens_sharding(mesh)
    losses = []
    for i in range(n):
        batch = {"input_ids": jax.device_put(batch_np[i], sharding)}
        state, metrics = train_step(state, batch, aux_loss_weight=0.01)
        losses.append(float(metrics["loss/total"]))
    return losses


def _batches(n, b, s, vocab):
    rng = np.random.RandomState(0)
    return [rng.randint(0, vocab, (b, s)).astype(np.int32) for i in range(n)]


class TestExpertParallelWiring:
    @pytest.mark.slow
    def test_ep_matches_single_device(self):
        """moe_dispatch='ep' on (data=2, expert=2) == capacity on 1 device."""
        cfg_ep = _cfg(moe_dispatch="ep")
        cfg_ref = _cfg(moe_dispatch="capacity")
        batches = _batches(2, 4, 32, cfg_ep.vocab_size)

        mesh_ep = mesh_lib.create_mesh(
            data=2, expert=2, devices=jax.devices()[:4]
        )
        mesh_1 = mesh_lib.create_mesh(data=1, devices=jax.devices()[:1])

        ep_losses = _run_steps(cfg_ep, mesh_ep, mesh_ep, batches)
        ref_losses = _run_steps(cfg_ref, mesh_1, None, batches)
        np.testing.assert_allclose(ep_losses, ref_losses, rtol=0, atol=2e-5)

    @pytest.mark.slow
    def test_ep_a2a_wide_expert_axis(self):
        """All-to-all EP at (data=2, expert=4) == capacity on 1 device —
        the wide-expert-mesh regime the psum variant scales badly in
        (VERDICT r2 #4)."""
        cfg_ep = _cfg(moe_dispatch="ep")
        cfg_ref = _cfg(moe_dispatch="capacity")
        batches = _batches(2, 4, 32, cfg_ep.vocab_size)

        mesh_ep = mesh_lib.create_mesh(
            data=2, expert=4, devices=jax.devices()[:8]
        )
        mesh_1 = mesh_lib.create_mesh(data=1, devices=jax.devices()[:1])

        ep_losses = _run_steps(cfg_ep, mesh_ep, mesh_ep, batches)
        ref_losses = _run_steps(cfg_ref, mesh_1, None, batches)
        np.testing.assert_allclose(ep_losses, ref_losses, rtol=0, atol=2e-5)

    @pytest.mark.slow
    def test_ep_a2a_matches_psum_ffn(self):
        """Direct FFN check: a2a and psum variants agree (grads included)
        with no-drop capacity."""
        from forde_tpu.parallel.expert_parallel import expert_parallel_ffn
        from forde_tpu.ops import moe_dispatch

        e, d, h, b, s, k = 4, 16, 32, 4, 8, 2
        rng = np.random.RandomState(1)
        x = jnp.asarray(rng.randn(b, s, d), jnp.float32)
        logits = jnp.asarray(rng.randn(b, s, e), jnp.float32)
        tki, tkp = moe_dispatch.top_k_gating(logits, k)
        params = tuple(
            jnp.asarray(rng.randn(*shape) * 0.1, jnp.float32)
            for shape in [(e, d, h), (e, h), (e, h, d), (e, d)]
        )
        mesh = mesh_lib.create_mesh(data=2, expert=4, devices=jax.devices()[:8])

        def loss(x, variant):
            out = expert_parallel_ffn(
                x, tki, tkp, params, mesh, num_experts=e, top_k=k,
                capacity_factor=float(e), variant=variant,
            )
            return jnp.sum(out**2), out

        (l_a, out_a), g_a = jax.value_and_grad(loss, has_aux=True)(x, "a2a")
        (l_p, out_p), g_p = jax.value_and_grad(loss, has_aux=True)(x, "psum")
        np.testing.assert_allclose(np.asarray(out_a), np.asarray(out_p), atol=1e-5)
        np.testing.assert_allclose(float(l_a), float(l_p), rtol=1e-6)
        np.testing.assert_allclose(np.asarray(g_a), np.asarray(g_p), atol=1e-5)

    @pytest.mark.slow
    def test_ep_requires_mesh(self):
        import pytest

        cfg = _cfg(moe_dispatch="ep")
        with pytest.raises(ValueError, match="mesh"):
            _run_steps(
                cfg, mesh_lib.create_mesh(data=1, devices=jax.devices()[:1]),
                None, _batches(1, 2, 16, cfg.vocab_size), n=1,
            )


@pytest.mark.slow
class TestThreeAxisMeshes:
    """3-axis composition (VERDICT r3 item 6): loss equivalence vs a
    single-device run of the same params/batch, not just finiteness."""

    def test_data_model_pipe(self):
        """data x model x pipe (2x2x2): Megatron TP inside each GPipe
        stage. The pipeline's shard_map is manual over pipe/data only, so
        'model' stays automatic and tp_param_spec shardings propagate.
        loss/lm must equal the unpipelined single-device run (the MoE aux
        term is per-microbatch averaged by design, so only lm compares)."""
        from forde_tpu.parallel.pipeline import make_pp_train_step

        cfg = _cfg(moe_dispatch="capacity", scan_layers=True)
        mesh = mesh_lib.create_mesh(
            data=2, model=2, pipe=2, devices=jax.devices()[:8]
        )
        batch_np = _batches(1, 8, 32, cfg.vocab_size)[0]

        state = create_train_state(
            cfg, jax.random.PRNGKey(0), 1e-2, 0.0, init_batch_shape=(1, 16)
        )
        state = shard_train_state(state, mesh)
        # TP really is engaged: a qkv kernel leaf carries 'model'
        from flax import traverse_util

        flat = traverse_util.flatten_dict(state.params)
        qkv = next(v for p, v in flat.items() if p[-2:] == ("qkv_proj", "kernel"))
        assert mesh_lib.AXIS_MODEL in jax.tree.leaves(
            tuple(qkv.sharding.spec)
        ), qkv.sharding
        assert tuple(qkv.sharding.spec)[0] == mesh_lib.AXIS_PIPE

        step = make_pp_train_step(cfg, mesh, num_microbatches=2,
                                  aux_loss_weight=0.01)
        batch = {
            "input_ids": jax.device_put(
                batch_np, mesh_lib.batch_sharding(mesh)
            )
        }
        _, pp_metrics = step(state, batch)

        ref_state = create_train_state(
            cfg, jax.random.PRNGKey(0), 1e-2, 0.0, init_batch_shape=(1, 16)
        )
        _, ref_metrics = train_step(
            ref_state, {"input_ids": jnp.asarray(batch_np)},
            aux_loss_weight=0.01,
        )
        np.testing.assert_allclose(
            float(pp_metrics["loss/lm"]), float(ref_metrics["loss/lm"]),
            rtol=0, atol=2e-5,
        )

    def test_data_expert_context(self):
        """data x expert x context (2x2x2): shard_map EP (psum variant)
        with tokens sharded (data, context) and ring attention over
        'context'. Total loss (lm + aux) equals the single-device
        capacity run exactly (no-drop capacity)."""
        cfg_ep = _cfg(moe_dispatch="ep")
        cfg_ref = _cfg(moe_dispatch="capacity")
        batches = _batches(2, 4, 32, cfg_ep.vocab_size)

        mesh = mesh_lib.create_mesh(
            data=2, expert=2, context=2, devices=jax.devices()[:8]
        )
        mesh_1 = mesh_lib.create_mesh(data=1, devices=jax.devices()[:1])

        losses = _run_steps(cfg_ep, mesh, mesh, batches)
        ref_losses = _run_steps(cfg_ref, mesh_1, None, batches)
        np.testing.assert_allclose(losses, ref_losses, rtol=0, atol=2e-5)

    def test_a2a_rejects_context_mesh(self):
        """The all-to-all EP variant cannot split S over 'context' —
        explicit error, psum is the CP-composing variant."""
        from forde_tpu.ops import moe_dispatch
        from forde_tpu.parallel.expert_parallel import expert_parallel_ffn

        e, d, h, b, s, k = 4, 16, 32, 4, 8, 2
        rng = np.random.RandomState(1)
        x = jnp.asarray(rng.randn(b, s, d), jnp.float32)
        logits = jnp.asarray(rng.randn(b, s, e), jnp.float32)
        tki, tkp = moe_dispatch.top_k_gating(logits, k)
        params = tuple(
            jnp.asarray(rng.randn(*shape) * 0.1, jnp.float32)
            for shape in [(e, d, h), (e, h), (e, h, d), (e, d)]
        )
        mesh = mesh_lib.create_mesh(
            data=2, expert=2, context=2, devices=jax.devices()[:8]
        )
        with pytest.raises(ValueError, match="context"):
            expert_parallel_ffn(
                x, tki, tkp, params, mesh, num_experts=e, top_k=k,
                capacity_factor=float(e), variant="a2a",
            )


class TestContextParallelWiring:
    @pytest.mark.slow
    def test_cp_matches_single_device(self):
        """context=4 ring attention training == single-device training."""
        cfg = _cfg(use_moe=False)
        batches = _batches(2, 2, 32, cfg.vocab_size)

        mesh_cp = mesh_lib.create_mesh(
            data=1, context=4, devices=jax.devices()[:4]
        )
        mesh_1 = mesh_lib.create_mesh(data=1, devices=jax.devices()[:1])

        cp_losses = _run_steps(cfg, mesh_cp, mesh_cp, batches)
        ref_losses = _run_steps(cfg, mesh_1, None, batches)
        np.testing.assert_allclose(cp_losses, ref_losses, rtol=0, atol=2e-5)

    @pytest.mark.slow
    def test_dp_cp_compose(self):
        """(data=2, context=4) runs and stays finite with sharded tokens."""
        cfg = _cfg(use_moe=False)
        mesh = mesh_lib.create_mesh(
            data=2, context=4, devices=jax.devices()[:8]
        )
        losses = _run_steps(
            cfg, mesh, mesh, _batches(2, 4, 32, cfg.vocab_size)
        )
        assert all(np.isfinite(x) for x in losses)


class TestTensorParallelWiring:
    """Tensor parallelism is pure GSPMD: params column/row-sharded over
    the ``model`` axis (core/mesh.tp_param_spec), model code unchanged,
    XLA inserts the all-reduces. Losses must match single-device runs."""

    @pytest.mark.slow
    def test_tp_matches_single_device(self):
        """Dense decoder on (data=2, model=2) == 1 device."""
        cfg = _cfg(moe_dispatch="capacity")
        batches = _batches(2, 4, 32, cfg.vocab_size)

        mesh_tp = mesh_lib.create_mesh(
            data=2, model=2, devices=jax.devices()[:4]
        )
        mesh_1 = mesh_lib.create_mesh(data=1, devices=jax.devices()[:1])

        tp_losses = _run_steps(cfg, mesh_tp, None, batches)
        ref_losses = _run_steps(cfg, mesh_1, None, batches)
        np.testing.assert_allclose(tp_losses, ref_losses, rtol=0, atol=2e-5)

    @pytest.mark.slow
    def test_tp_params_actually_sharded(self):
        """The Megatron layout is real: expert w_up is (expert?, None,
        'model')-sharded and qkv kernels are last-dim 'model'-sharded on
        a model>1 mesh (guards against the rule silently matching
        nothing and the test above passing on replicated params)."""
        cfg = _cfg(moe_dispatch="capacity")
        mesh_tp = mesh_lib.create_mesh(
            data=2, model=2, devices=jax.devices()[:4]
        )
        state = create_train_state(
            cfg, jax.random.PRNGKey(0), 1e-2, 0.0, init_batch_shape=(1, 16)
        )
        state = shard_train_state(state, mesh_tp)
        flat = jax.tree_util.tree_leaves_with_path(state.params)
        specs = {
            "/".join(str(getattr(k, "key", "")) for k in path): (
                leaf.sharding.spec
            )
            for path, leaf in flat
        }
        w_up = next(v for k, v in specs.items() if k.endswith("w_up"))
        assert "model" in tuple(w_up), w_up
        qkv = next(
            v for k, v in specs.items() if k.endswith("qkv_proj/kernel")
        )
        assert tuple(qkv)[-1] == "model", qkv

    @pytest.mark.slow
    def test_tp_with_nsa(self):
        """NSA decoder (all three branches) under (data=2, model=2) ==
        1 device: the branch q/k/v projections are column-sharded, the
        out-projections row-sharded."""
        cfg = _cfg(
            use_sparse_attention=True, window_size=16,
            compression_ratio=4, top_k_global=8, max_seq_len=64,
        )
        batches = _batches(2, 4, 32, cfg.vocab_size)

        mesh_tp = mesh_lib.create_mesh(
            data=2, model=2, devices=jax.devices()[:4]
        )
        mesh_1 = mesh_lib.create_mesh(data=1, devices=jax.devices()[:1])

        tp_losses = _run_steps(cfg, mesh_tp, None, batches)
        ref_losses = _run_steps(cfg, mesh_1, None, batches)
        np.testing.assert_allclose(tp_losses, ref_losses, rtol=0, atol=2e-5)


class TestFSDPWiring:
    """param_sharding='fsdp' (ZeRO-3-style over the data axis) must be
    numerically invisible: same losses as replicated params, with the
    big param/moment leaves actually sharded."""

    @pytest.mark.slow
    def test_fsdp_matches_single_device(self):
        cfg = _cfg(moe_dispatch="capacity")
        batches = _batches(2, 8, 32, cfg.vocab_size)

        mesh_dp = mesh_lib.create_mesh(data=4, devices=jax.devices()[:4])
        mesh_1 = mesh_lib.create_mesh(data=1, devices=jax.devices()[:1])

        def run(mesh, param_sharding):
            state = create_train_state(
                cfg, jax.random.PRNGKey(0), 1e-2, 0.0, init_batch_shape=(1, 16)
            )
            state = shard_train_state(state, mesh, param_sharding)
            sharding = mesh_lib.tokens_sharding(mesh)
            losses = []
            for i in range(2):
                batch = {"input_ids": jax.device_put(batches[i], sharding)}
                state, metrics = train_step(state, batch, aux_loss_weight=0.01)
                losses.append(float(metrics["loss/total"]))
            return losses, state

        fsdp_losses, fsdp_state = run(mesh_dp, "fsdp")
        ref_losses, _ = run(mesh_1, "replicated")
        np.testing.assert_allclose(fsdp_losses, ref_losses, rtol=0, atol=2e-5)

        # the big leaves really are data-sharded (params AND moments)
        def count_data_sharded(tree):
            return sum(
                1
                for leaf in jax.tree.leaves(tree)
                if hasattr(leaf, "sharding")
                and "data" in jax.tree.leaves(tuple(leaf.sharding.spec))
            )

        assert count_data_sharded(fsdp_state.params) >= 10
        assert count_data_sharded(fsdp_state.opt_state) >= 10

    @pytest.mark.slow
    def test_fsdp_composes_with_tp(self):
        """(data=2, model=2) with fsdp: TP dims keep 'model', remaining
        big dims take 'data'; losses still match single device."""
        cfg = _cfg(moe_dispatch="capacity")
        batches = _batches(2, 8, 32, cfg.vocab_size)

        mesh_tp = mesh_lib.create_mesh(
            data=2, model=2, devices=jax.devices()[:4]
        )
        mesh_1 = mesh_lib.create_mesh(data=1, devices=jax.devices()[:1])

        def run(mesh, param_sharding):
            state = create_train_state(
                cfg, jax.random.PRNGKey(0), 1e-2, 0.0, init_batch_shape=(1, 16)
            )
            state = shard_train_state(state, mesh, param_sharding)
            sharding = mesh_lib.tokens_sharding(mesh)
            losses = []
            for i in range(2):
                batch = {"input_ids": jax.device_put(batches[i], sharding)}
                state, metrics = train_step(state, batch, aux_loss_weight=0.01)
                losses.append(float(metrics["loss/total"]))
            return losses, state

        got, state = run(mesh_tp, "fsdp")
        ref, _ = run(mesh_1, "replicated")
        np.testing.assert_allclose(got, ref, rtol=0, atol=2e-5)

        flat = jax.tree_util.tree_leaves_with_path(state.params)
        qkv_spec = next(
            tuple(leaf.sharding.spec)
            for path, leaf in flat
            if str(getattr(path[-2], "key", "")) == "qkv_proj"
            and str(getattr(path[-1], "key", "")) == "kernel"
        )
        assert "model" in qkv_spec and "data" in qkv_spec, qkv_spec


class TestDualEncoderTPFSDP:
    """The CLIP fast loop under TP (tower attention + StatefulLayer
    projections Megatron-sharded) and FSDP must match single-device
    losses — the encoder-side twin of the decoder tests above."""

    def _clip_cfg(self):
        from forde_tpu.core.config import DualEncoderConfig, TowerConfig

        return DualEncoderConfig(
            image_size=32,
            patch_size=16,
            vision=TowerConfig(
                d_model=32, num_layers=2, num_heads=2, head_dim=16,
                mlp_hidden_dim=64,
            ),
            vocab_size=128,
            max_text_len=16,
            text=TowerConfig(
                d_model=32, num_layers=2, num_heads=2, head_dim=16,
                mlp_hidden_dim=64,
            ),
            embed_dim=32,
            attention_kernel_impl="reference",
            stateful_kernel_impl="reference",
        )

    def _run(self, mesh, param_sharding, batches):
        from forde_tpu.train.clip_step import (
            clip_train_step,
            create_clip_train_state,
        )
        from forde_tpu.train.state import shard_train_state

        cfg = self._clip_cfg()
        state = create_clip_train_state(
            cfg, jax.random.PRNGKey(0), 1e-3, 0.0,
            batch_size=batches[0]["image"].shape[0], text_len=16,
        )
        state = shard_train_state(state, mesh, param_sharding)
        sharding = mesh_lib.batch_sharding(mesh)
        losses = []
        for batch in batches:
            dev_batch = {
                k: jax.device_put(v, sharding) for k, v in batch.items()
            }
            state, metrics = clip_train_step(state, dev_batch)
            losses.append(float(metrics["loss/contrastive"]))
        return losses, state

    @pytest.mark.slow
    def test_clip_tp_fsdp_matches_single_device(self):
        rng = np.random.RandomState(0)
        batches = [
            {
                "image": rng.rand(8, 32, 32, 3).astype(np.float32),
                "input_ids": rng.randint(1, 128, (8, 16)).astype(np.int32),
                "attention_mask": np.ones((8, 16), np.int32),
            }
            for _ in range(2)
        ]
        mesh_tp = mesh_lib.create_mesh(
            data=2, model=2, devices=jax.devices()[:4]
        )
        mesh_1 = mesh_lib.create_mesh(data=1, devices=jax.devices()[:1])

        got, state = self._run(mesh_tp, "fsdp", batches)
        ref, _ = self._run(mesh_1, "replicated", batches)
        np.testing.assert_allclose(got, ref, rtol=0, atol=5e-5)

        # StatefulLayer w_in kernel carries 'model' (column-parallel)
        flat = jax.tree_util.tree_leaves_with_path(state.params)
        w_in = next(
            tuple(leaf.sharding.spec)
            for path, leaf in flat
            if len(path) >= 2
            and str(getattr(path[-2], "key", "")) == "w_in"
            and str(getattr(path[-1], "key", "")) == "kernel"
        )
        assert "model" in w_in, w_in
