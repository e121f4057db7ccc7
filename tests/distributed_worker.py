"""Worker for the 2-process distributed DP test (tests/test_distributed.py).

Launched twice by the test with JAX_COORDINATOR_ADDRESS /
JAX_NUM_PROCESSES / JAX_PROCESS_ID set and 4 virtual CPU devices per
process. Joins the cluster through the production bootstrap
(``core.mesh.maybe_initialize_distributed`` — SURVEY.md §2.4 distributed
backend), builds a global (data=8) mesh spanning both processes, and runs
ONE decoder-LM train step on a globally-sharded batch. Prints
``WORKER_OK loss=<float>`` on success; the parent asserts both processes
print the same finite loss.
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

    _, metrics = train_step(state, {"input_ids": ids}, aux_loss_weight=1.0)
    loss = float(metrics["loss/total"])  # replicated -> addressable
    assert np.isfinite(loss), loss
    print(f"WORKER_OK loss={loss:.6f}", flush=True)


if __name__ == "__main__":
    main()
