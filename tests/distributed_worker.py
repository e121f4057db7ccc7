"""Worker for the 2-process distributed DP test (tests/test_distributed.py).

Launched twice by the test with JAX_COORDINATOR_ADDRESS /
JAX_NUM_PROCESSES / JAX_PROCESS_ID / FORDE_TEST_CKPT_DIR set and 4
virtual CPU devices per process. Joins the cluster through the
production bootstrap (``core.mesh.maybe_initialize_distributed`` —
SURVEY.md §2.4 distributed backend), builds a global (data=8) mesh
spanning both processes, and runs, over globally-sharded arrays:

  1. ONE decoder-LM train step (replicated loss must agree);
  2. the jitted GMM slow loop (BASELINE config 5's "on-device GMM slow
     loop at scale") over the sharded params/stats;
  3. a multi-process Orbax save/restore roundtrip of the SHARDED
     TrainState (each process writes its shards; restore must be exact).

Prints ``WORKER_OK loss=<float> imbalance=<float> ckpt_roundtrip=exact``
on success; the parent asserts both processes agree.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

from forde_tpu.core import mesh as mesh_lib


def main() -> None:
    assert mesh_lib.maybe_initialize_distributed(), "bootstrap did not fire"
    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.devices()) == 8, len(jax.devices())
    assert len(jax.local_devices()) == 4, len(jax.local_devices())

    from forde_tpu.core.config import LLMConfig
    from forde_tpu.train.state import create_train_state, shard_train_state
    from forde_tpu.train.step import train_step

    cfg = LLMConfig(
        vocab_size=256,
        d_model=32,
        num_layers=2,
        num_heads=2,
        head_dim=16,
        max_seq_len=32,
        use_moe=True,
        num_experts=4,
        top_k_experts=2,
        expert_hidden_dim=32,
        moe_dispatch="capacity",
        use_sparse_attention=False,
        use_hyper_connections=False,
        dropout_rate=0.0,
    )
    mesh = mesh_lib.create_mesh(data=8, devices=jax.devices())
    state = create_train_state(
        cfg, jax.random.PRNGKey(0), 1e-3, 0.01, mesh=mesh
    )
    state = shard_train_state(state, mesh)

    # Same global batch on every process; each contributes its local rows.
    rng = np.random.RandomState(0)
    full = rng.randint(0, cfg.vocab_size, (8, 32)).astype(np.int32)
    sharding = mesh_lib.tokens_sharding(mesh)
    pid = jax.process_index()
    ids = jax.make_array_from_process_local_data(
        sharding, full[pid * 4 : (pid + 1) * 4], global_shape=(8, 32)
    )

    state, metrics = train_step(state, {"input_ids": ids}, aux_loss_weight=1.0)
    loss = float(metrics["loss/total"])  # replicated -> addressable
    assert np.isfinite(loss), loss

    # --- jitted GMM slow loop over the 2-process sharded state
    # (BASELINE config 5: "on-device GMM slow loop at scale") ---
    from forde_tpu.brain.slow_loop import moe_slow_loop_step

    new_params, new_mutable, diag = moe_slow_loop_step(
        state.params, {"stats_buffer": state.stats_buffer}, cfg,
        jax.random.PRNGKey(1),
    )
    state = state.replace(
        params=new_params, stats_buffer=new_mutable["stats_buffer"]
    )
    assert not bool(jax.device_get(diag["skipped"])), "slow loop skipped"
    imbalance = float(jax.device_get(diag["load_imbalance"]))
    assert np.isfinite(imbalance), imbalance

    # --- multi-process Orbax save/restore of the SHARDED state
    # (train/checkpoint.py multi-host coordination, previously untested
    # beyond one process) ---
    from forde_tpu.train.checkpoint import CheckpointManager

    ckdir = os.environ["FORDE_TEST_CKPT_DIR"]  # shared across processes
    mgr = CheckpointManager(ckdir, keep=1, async_save=False)
    assert mgr.save(1, state, force=True)
    mgr.wait()
    restored = mgr.restore(state)
    mgr.close()

    import jax.numpy as jnp

    @jax.jit
    def tree_absdiff(a, b):
        return sum(
            jnp.sum(jnp.abs(x.astype(jnp.float32) - y.astype(jnp.float32)))
            for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b))
        )

    d_params = float(tree_absdiff(state.params, restored.params))
    d_stats = float(tree_absdiff(state.stats_buffer, restored.stats_buffer))
    assert d_params == 0.0 and d_stats == 0.0, (d_params, d_stats)

    print(
        f"WORKER_OK loss={loss:.6f} imbalance={imbalance:.6f} "
        f"ckpt_roundtrip=exact",
        flush=True,
    )


if __name__ == "__main__":
    main()
