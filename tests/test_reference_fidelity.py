"""Numerical fidelity against the actual reference implementation.

Loads the reference model from /root/reference (read-only), transplants its
initialized weights into our parameter layout, and checks that our decoder
produces the same logits and aux loss — the BASELINE.json fidelity
criterion ("embeddings match reference CPU within 1e-5").

Covers every MoE×NSA×mHC flag combination. mHC-on requires
``reference_quirks=True`` in our config: the reference computes final_norm
and then discards it whenever hyper-connections are on (model.py:276-285);
our default fixes that, the quirks flag restores it bit-exactly.

Weight mapping: all module names match except (a) the MoE internals — the
reference keeps a Python list of per-expert Dense modules (moe.py:98-105);
we stack them into (E, d, h)/(E, h, d) tensors — and (b) the mHC stream
init — the reference uses per-stream Dense modules ``stream_init_{i}``
(hyper_connections.py:109-124); we fuse them into one Dense to
(num_streams-1)*d, whose kernel is their column-wise concatenation.
"""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

REFERENCE_PATH = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REFERENCE_PATH, "src")),
    reason="reference checkout not available",
)


def _load_reference():
    if REFERENCE_PATH not in sys.path:
        sys.path.insert(0, REFERENCE_PATH)
    from src.forde.model import FORDEDecoderLM as RefModel
    from src.forde.model import LLMConfig as RefConfig

    return RefModel, RefConfig


def _shared_config_kwargs(use_moe=True, use_nsa=True, use_mhc=False):
    return dict(
        vocab_size=211,
        d_model=32,
        num_layers=2,
        num_heads=2,
        head_dim=16,
        max_seq_len=64,
        use_moe=use_moe,
        num_experts=4,
        top_k_experts=2,
        expert_hidden_dim=48,
        use_sparse_attention=use_nsa,
        window_size=8,
        compression_ratio=4,
        top_k_global=8,
        use_hyper_connections=use_mhc,
        num_streams=3,
        sinkhorn_iterations=3,
        dropout_rate=0.0,
    )


def _fuse_stream_init(ref_streams, num_streams):
    """Per-stream Dense modules (reference hyper_connections.py:109-124) →
    our single fused Dense to (num_streams-1)*d (column concat)."""
    return {
        "stream_init": {
            "kernel": jnp.concatenate(
                [ref_streams[f"stream_init_{i}"]["kernel"]
                 for i in range(1, num_streams)], axis=1
            ),
            "bias": jnp.concatenate(
                [ref_streams[f"stream_init_{i}"]["bias"]
                 for i in range(1, num_streams)], axis=0
            ),
        }
    }


def _transplant(ref_params, kwargs):
    """Map reference params into our layout."""
    num_layers = kwargs["num_layers"]
    num_experts = kwargs["num_experts"]
    ours = {}
    for name in ("token_embed", "pos_embed", "final_norm", "lm_head"):
        ours[name] = ref_params[name]
    if kwargs["use_hyper_connections"]:
        ours["initial_streams"] = _fuse_stream_init(
            ref_params["initial_streams"], kwargs["num_streams"]
        )
        ours["stream_collapser"] = ref_params["stream_collapser"]
    for i in range(num_layers):
        ref_layer = ref_params[f"layer_{i}"]
        layer = {
            "attn_norm": ref_layer["attn_norm"],
            "ffn_norm": ref_layer["ffn_norm"],
        }
        if kwargs["use_sparse_attention"]:
            layer["sparse_attention"] = ref_layer["sparse_attention"]
        else:
            layer["causal_attention"] = ref_layer["causal_attention"]
        if kwargs["use_hyper_connections"]:
            layer["mhc_attn"] = ref_layer["mhc_attn"]
            layer["mhc_ffn"] = ref_layer["mhc_ffn"]
        if kwargs["use_moe"]:
            ref_moe = ref_layer["moe"]["MoELayer_0"]
            experts = {
                "w_up": jnp.stack(
                    [ref_moe[f"expert_{e}"]["up_proj"]["kernel"]
                     for e in range(num_experts)]
                ),
                "b_up": jnp.stack(
                    [ref_moe[f"expert_{e}"]["up_proj"]["bias"]
                     for e in range(num_experts)]
                ),
                "w_down": jnp.stack(
                    [ref_moe[f"expert_{e}"]["down_proj"]["kernel"]
                     for e in range(num_experts)]
                ),
                "b_down": jnp.stack(
                    [ref_moe[f"expert_{e}"]["down_proj"]["bias"]
                     for e in range(num_experts)]
                ),
            }
            layer["moe"] = {
                "moe_layer": {
                    "router": {
                        "router_linear": ref_moe["MoERouter_0"]["router_linear"]
                    },
                    "experts": experts,
                }
            }
        else:
            layer["ffn_up"] = ref_layer["ffn_up"]
            layer["ffn_down"] = ref_layer["ffn_down"]
        ours[f"layer_{i}"] = layer
    return ours


@pytest.mark.parametrize(
    "impl",
    [pytest.param("reference", marks=pytest.mark.slow), "interpret"],
)
@pytest.mark.slow
def test_decoder_matches_reference_with_transplanted_weights(impl):
    RefModel, RefConfig = _load_reference()
    kwargs = _shared_config_kwargs()
    ref_cfg = RefConfig(**kwargs)

    from forde_tpu.core.config import LLMConfig
    from forde_tpu.models.decoder_lm import FORDEDecoderLM

    our_cfg = LLMConfig(**kwargs, attention_impl=impl, moe_dispatch="dense")

    rng = jax.random.PRNGKey(0)
    ids = jax.random.randint(rng, (2, 24), 0, kwargs["vocab_size"])

    ref_model = RefModel(config=ref_cfg)
    ref_vars = ref_model.init(rng, ids)
    ref_logits, ref_aux = ref_model.apply(
        ref_vars, ids, mutable=["stats_buffer"]
    )[0]

    our_model = FORDEDecoderLM(config=our_cfg)
    our_vars = our_model.init(jax.random.PRNGKey(1), ids)
    transplanted = _transplant(
        jax.tree.map(lambda x: x, ref_vars["params"]), kwargs
    )
    # structural check: same tree, same shapes
    ours_flat = jax.tree_util.tree_flatten_with_path(our_vars["params"])[0]
    theirs_flat = jax.tree_util.tree_flatten_with_path(transplanted)[0]
    assert [(jax.tree_util.keystr(p), v.shape) for p, v in ours_flat] == [
        (jax.tree_util.keystr(p), v.shape) for p, v in theirs_flat
    ]

    (our_logits, our_aux), _ = our_model.apply(
        {"params": transplanted, "stats_buffer": our_vars["stats_buffer"]},
        ids,
        mutable=["stats_buffer"],
    )

    atol = 1e-5 if impl == "reference" else 5e-5
    np.testing.assert_allclose(
        np.asarray(our_logits), np.asarray(ref_logits), atol=atol
    )
    np.testing.assert_allclose(float(our_aux), float(ref_aux), atol=1e-6)


@pytest.mark.parametrize("use_moe", [True, False])
@pytest.mark.parametrize("use_nsa", [True, False])
@pytest.mark.parametrize("use_mhc", [True, False])
def test_all_flag_combinations_match_reference(use_moe, use_nsa, use_mhc):
    """1e-5 transplant fidelity across the full MoE×NSA×mHC cube.

    mHC-on runs our model with reference_quirks=True, which restores the
    reference's discard-final-norm-after-mHC behavior (model.py:276-285)
    that our default deliberately fixes."""
    RefModel, RefConfig = _load_reference()
    kwargs = _shared_config_kwargs(use_moe, use_nsa, use_mhc)
    ref_cfg = RefConfig(**kwargs)

    from forde_tpu.core.config import LLMConfig
    from forde_tpu.models.decoder_lm import FORDEDecoderLM

    our_cfg = LLMConfig(
        **kwargs,
        attention_impl="reference",
        moe_dispatch="dense",
        reference_quirks=use_mhc,
    )

    rng = jax.random.PRNGKey(0)
    ids = jax.random.randint(rng, (2, 24), 0, kwargs["vocab_size"])

    ref_model = RefModel(config=ref_cfg)
    ref_vars = ref_model.init(rng, ids)
    ref_logits, ref_aux = ref_model.apply(
        ref_vars, ids, mutable=["stats_buffer"]
    )[0]

    our_model = FORDEDecoderLM(config=our_cfg)
    our_vars = our_model.init(jax.random.PRNGKey(1), ids)
    transplanted = _transplant(ref_vars["params"], kwargs)

    ours_flat = jax.tree_util.tree_flatten_with_path(our_vars["params"])[0]
    theirs_flat = jax.tree_util.tree_flatten_with_path(transplanted)[0]
    assert [(jax.tree_util.keystr(p), v.shape) for p, v in ours_flat] == [
        (jax.tree_util.keystr(p), v.shape) for p, v in theirs_flat
    ]

    our_in = {"params": transplanted}
    if "stats_buffer" in our_vars:
        our_in["stats_buffer"] = our_vars["stats_buffer"]
    (our_logits, our_aux), _ = our_model.apply(
        our_in, ids, mutable=["stats_buffer"]
    )
    np.testing.assert_allclose(
        np.asarray(our_logits), np.asarray(ref_logits), atol=1e-5
    )
    np.testing.assert_allclose(float(our_aux), float(ref_aux), atol=1e-6)


def test_capacity_dispatch_matches_reference_model():
    """The production (capacity) dispatch also reproduces the reference
    model's outputs when capacity covers all tokens."""
    RefModel, RefConfig = _load_reference()
    kwargs = _shared_config_kwargs()
    ref_cfg = RefConfig(**kwargs)

    from forde_tpu.core.config import LLMConfig
    from forde_tpu.models.decoder_lm import FORDEDecoderLM

    our_cfg = LLMConfig(
        **kwargs,
        attention_impl="reference",
        moe_dispatch="capacity",
        moe_capacity_factor=float(kwargs["num_experts"]),
    )

    rng = jax.random.PRNGKey(0)
    ids = jax.random.randint(rng, (2, 24), 0, kwargs["vocab_size"])
    ref_model = RefModel(config=ref_cfg)
    ref_vars = ref_model.init(rng, ids)
    ref_logits, _ = ref_model.apply(ref_vars, ids, mutable=["stats_buffer"])[0]

    our_model = FORDEDecoderLM(config=our_cfg)
    our_vars = our_model.init(jax.random.PRNGKey(1), ids)
    transplanted = _transplant(ref_vars["params"], kwargs)
    (our_logits, _), _ = our_model.apply(
        {"params": transplanted, "stats_buffer": our_vars["stats_buffer"]},
        ids,
        mutable=["stats_buffer"],
    )
    np.testing.assert_allclose(
        np.asarray(our_logits), np.asarray(ref_logits), atol=1e-5
    )
