"""Verification: model init produces params + stats_buffer; apply mutates
the buffer; logits have the right shape (reference tests/verify_init.py).

Print-based SUCCESS/FAILURE script, runnable standalone on CPU or TPU.
"""

import sys

import jax
import jax.numpy as jnp


def main() -> int:
    from forde_tpu.core.config import create_default_config
    from forde_tpu.models.decoder_lm import FORDEDecoderLM

    cfg = create_default_config().replace(
        d_model=64, num_layers=2, num_heads=2, head_dim=32, expert_hidden_dim=128,
        vocab_size=512, window_size=32, top_k_global=16,
    )
    model = FORDEDecoderLM(config=cfg)
    ids = jnp.ones((1, 32), jnp.int32)
    variables = model.init(jax.random.PRNGKey(0), ids)

    ok = True
    if "params" not in variables:
        print("FAILURE: no params collection")
        ok = False
    if "stats_buffer" not in variables:
        print("FAILURE: no stats_buffer collection")
        ok = False

    (logits, aux), updates = model.apply(variables, ids, mutable=["stats_buffer"])
    if logits.shape != (1, 32, cfg.vocab_size):
        print(f"FAILURE: logits shape {logits.shape}")
        ok = False
    counts = [
        v for p, v in
        jax.tree_util.tree_flatten_with_path(updates["stats_buffer"])[0]
        if "step_count" in str(p)
    ]
    if not counts or not all(int(c) == 1 for c in counts):
        print("FAILURE: stats_buffer did not accumulate")
        ok = False

    print("SUCCESS: init + stats_buffer verified" if ok else "FAILURE")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
