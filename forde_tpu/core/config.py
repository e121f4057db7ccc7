"""Typed configuration for the FORDE TPU framework.

Covers both reference capability sets:
  * the decoder-only LLM (MoE + Native Sparse Attention + manifold
    hyper-connections), mirroring the flag surface of the reference
    ``LLMConfig`` (reference: src/forde/model.py:39-69), and
  * the CLIP-style dual encoder with StatefulLayer blocks
    (reference: README.md:26-59),
plus brain (slow-loop), parallelism, and training knobs that are new,
TPU-first concerns (mesh axes, dtype policy, MoE dispatch mode).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Optional, Tuple

import jax.numpy as jnp

# ---------------------------------------------------------------------------
# dtype policy
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class DTypePolicy:
    """Compute in low precision on the MXU, keep params/stats in fp32.

    ``compute``  — activations & matmuls (bf16 on TPU).
    ``param``    — parameter storage.
    ``stats``    — sensing/brain statistics accumulators (always fp32).
    """

    compute: jnp.dtype = jnp.float32
    param: jnp.dtype = jnp.float32
    stats: jnp.dtype = jnp.float32

    @staticmethod
    def bf16() -> "DTypePolicy":
        return DTypePolicy(compute=jnp.bfloat16, param=jnp.float32)

    @staticmethod
    def fp32() -> "DTypePolicy":
        return DTypePolicy()


# ---------------------------------------------------------------------------
# Decoder-only LLM (reference: src/forde/model.py:39-69)
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class LLMConfig:
    """Configuration for the FORDE decoder-only LLM.

    Field names and defaults match the reference ``LLMConfig``
    (src/forde/model.py:39-69) so that configs translate 1:1; TPU-specific
    fields (dispatch mode, kernels, remat) are additive.
    """

    vocab_size: int = 32000
    d_model: int = 512
    num_layers: int = 12
    num_heads: int = 8
    head_dim: int = 64
    max_seq_len: int = 2048

    # MoE configuration
    use_moe: bool = True
    num_experts: int = 8
    top_k_experts: int = 2
    expert_hidden_dim: int = 2048
    moe_aux_loss_weight: float = 0.01

    # NSA configuration
    use_sparse_attention: bool = True
    window_size: int = 512
    compression_ratio: int = 8
    top_k_global: int = 64

    # mHC configuration
    use_hyper_connections: bool = True
    num_streams: int = 4
    sinkhorn_iterations: int = 5

    # Dropout
    dropout_rate: float = 0.1

    # --- TPU-first knobs (no reference equivalent) ---
    # MoE dispatch: "dense" reproduces the reference's every-expert-on-every-
    # token math exactly (src/forde/moe.py:161-185); "capacity" is the
    # production scatter/gather path with a capacity factor.
    moe_dispatch: str = "dense"
    moe_capacity_factor: float = 2.0
    # Attention kernel: "auto" picks Pallas flash attention on TPU and the
    # jnp reference elsewhere; "reference" forces the jnp path; "pallas"
    # forces the kernel (interpreted off-TPU).
    attention_impl: str = "auto"
    # Rematerialize decoder blocks to trade FLOPs for HBM.
    remat: bool = False
    # Scan over layers (one traced block instead of num_layers unrolled
    # copies): shrinks the HLO and compile time dramatically (an unrolled
    # 12-layer NSA+MoE+mHC step took 30+ min to compile through the remote
    # compiler). Parameters and stats_buffer get a leading (L,) axis.
    scan_layers: bool = False
    # Weight-only int8 serving (ops/quant.py): the attention/FFN/lm_head
    # Dense layers consume int8 kernels + per-channel scales produced by
    # quantize_params. Serving only — there is no quantized training path.
    quantized: bool = False
    # Bit-exact reference-quirk mode. The reference applies final_norm and
    # then *discards* it whenever hyper-connections are on (reference
    # src/forde/model.py:276-285: the norm of x is computed at :276, then x
    # is overwritten with the raw StreamCollapser output at :279-285, so
    # lm_head never sees a normalized activation). Our default fixes that
    # (collapse, then normalize — models/decoder_lm.py); this flag restores
    # the reference behavior so weight-transplant fidelity holds for every
    # MoE×NSA×mHC flag combination (tests/test_reference_fidelity.py).
    reference_quirks: bool = False
    dtypes: DTypePolicy = field(default_factory=DTypePolicy)

    def replace(self, **kw) -> "LLMConfig":
        return dataclasses.replace(self, **kw)


def create_default_config() -> LLMConfig:
    """Small test config, mirroring reference create_default_config
    (src/forde/model.py:349-370)."""
    return LLMConfig(
        vocab_size=50257,
        d_model=256,
        num_layers=4,
        num_heads=4,
        head_dim=64,
        max_seq_len=1024,
        use_moe=True,
        num_experts=4,
        top_k_experts=2,
        expert_hidden_dim=512,
        use_sparse_attention=True,
        window_size=128,
        compression_ratio=4,
        top_k_global=32,
        use_hyper_connections=True,
        num_streams=2,
        sinkhorn_iterations=3,
        dropout_rate=0.0,
    )


# ---------------------------------------------------------------------------
# Dual encoder (reference: README.md:26-59 + BASELINE.json configs)
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class TowerConfig:
    """One encoder tower (vision or text) built from FORDE transformer
    blocks (README.md:39-45)."""

    d_model: int = 512
    num_layers: int = 12
    num_heads: int = 8
    head_dim: int = 64
    mlp_hidden_dim: int = 2048
    dropout_rate: float = 0.0


@dataclass(frozen=True)
class DualEncoderConfig:
    """CLIP-style dual encoder (README.md:26-35).

    StatefulLayer semantics per README.md:47-56: k-way multiplexed
    activation (relu / tanh / straight-through binary_step), gated
    residual (specialists gate=0.1, generalists gate=1.0).
    """

    # Vision tower
    image_size: int = 224
    patch_size: int = 16
    vision: TowerConfig = field(default_factory=lambda: TowerConfig())
    # Text tower
    vocab_size: int = 30522  # bert-base-uncased (download_to_drive.py:122)
    max_text_len: int = 64
    text: TowerConfig = field(
        default_factory=lambda: TowerConfig(d_model=512, num_layers=12)
    )
    # Shared embedding space
    embed_dim: int = 512
    logit_scale_init: float = 2.6592  # log(1/0.07), CLIP convention
    # StatefulLayer
    num_neuron_types: int = 3
    specialist_gate: float = 0.1
    # Forde-lite: rule-based assignments instead of GMM (README.md:58-59)
    forde_lite: bool = False
    # Use fused Pallas StatefulLayer kernel on TPU
    stateful_kernel_impl: str = "auto"
    # Encoder attention implementation ("auto" | "pallas" | "reference") —
    # forwarded to ops.flash_attention.flash_mha for both towers.
    attention_kernel_impl: str = "auto"
    # Rematerialization policy: False/"none" saves everything;
    # True/"block" remats whole tower blocks (recomputes attention too —
    # measured -23% when not HBM-limited); "mlp" remats ONLY the
    # StatefulLayer, whose two (B, S, mlp_hidden) intermediates are the
    # largest per-block tensors — the cheap way to unlock bigger batches.
    remat: object = False
    # FORDE sensing (activation stats + gradient taps) in the fast loop.
    # False builds towers with no stats_buffer/perturbations variables —
    # used by the sensing-stride train step (train/clip_step.py), which
    # alternates sensed and unsensed steps so the stat reductions' HBM
    # passes are paid only every `sense_interval`-th step.
    sense: bool = True
    dtypes: DTypePolicy = field(default_factory=DTypePolicy)

    def replace(self, **kw) -> "DualEncoderConfig":
        return dataclasses.replace(self, **kw)


def vit_b16_config() -> DualEncoderConfig:
    """ViT-B/16 + 12-layer text tower (BASELINE.json config 4)."""
    return DualEncoderConfig(
        image_size=224,
        patch_size=16,
        vision=TowerConfig(
            d_model=768, num_layers=12, num_heads=12, head_dim=64, mlp_hidden_dim=3072
        ),
        text=TowerConfig(
            d_model=512, num_layers=12, num_heads=8, head_dim=64, mlp_hidden_dim=2048
        ),
        embed_dim=512,
    )


def vit_tiny_config() -> DualEncoderConfig:
    """Forde-lite tiny config: ViT-Ti/16 + 2-layer text (BASELINE.json
    config 1)."""
    return DualEncoderConfig(
        image_size=224,
        patch_size=16,
        vision=TowerConfig(
            d_model=192, num_layers=12, num_heads=3, head_dim=64, mlp_hidden_dim=768
        ),
        text=TowerConfig(
            d_model=192, num_layers=2, num_heads=3, head_dim=64, mlp_hidden_dim=768
        ),
        embed_dim=192,
        forde_lite=True,
    )


# ---------------------------------------------------------------------------
# Config (de)serialization — lets a checkpoint carry its model shape so
# serving never needs hand-matched flags (forde_tpu/serve.py).
# ---------------------------------------------------------------------------


def vit_tiny_hd128_config() -> DualEncoderConfig:
    """ViT-Ti-scale towers with a single 128-wide attention head.

    Same d_model/depth/MLP as vit_tiny_config, but H=1/D=128 instead of
    H=3/D=64: the fused-MHA kernel then runs one lane-perfect (S, 128)
    matmul chain per element instead of three half-lane (S, 64) ones and
    a third of the (S, S) softmax traffic. Measured 9,155 vs 6,740
    pairs/s/chip at batch 512 (benchmarks/tiny_levers.py, v5e) — the
    head_dim=128 lever the round-2 study predicted (PERF.md). A
    different architecture (fewer attention params), so it is a separate
    preset, not a silent change to vit_tiny_config.
    """
    return DualEncoderConfig(
        image_size=224,
        patch_size=16,
        vision=TowerConfig(
            d_model=192, num_layers=12, num_heads=1, head_dim=128,
            mlp_hidden_dim=768,
        ),
        text=TowerConfig(
            d_model=192, num_layers=2, num_heads=1, head_dim=128,
            mlp_hidden_dim=768,
        ),
        embed_dim=192,
        forde_lite=True,
    )


def vit_b16_hd128_config() -> DualEncoderConfig:
    """ViT-B/16 with 128-wide heads: vision 6x128, text 4x128.

    Parameter-shape neutral vs vit_b16_config (H*D stays 768/512 so every
    projection keeps its exact CLIP ViT-B/16 shape) — only the head split
    changes. Each attention chain becomes lane-perfect (S, 128) dots on
    the MXU's 128-lane contraction instead of half-lane (S, 64) ones, and
    halves the (S, S) softmax traffic. Measured 1,092 vs 1,009
    pairs/s/chip at batch 128 (benchmarks/vitb_levers.py, v5e, round 4).
    """
    return DualEncoderConfig(
        image_size=224,
        patch_size=16,
        vision=TowerConfig(
            d_model=768, num_layers=12, num_heads=6, head_dim=128,
            mlp_hidden_dim=3072,
        ),
        text=TowerConfig(
            d_model=512, num_layers=12, num_heads=4, head_dim=128,
            mlp_hidden_dim=2048,
        ),
        embed_dim=512,
    )


def config_to_dict(cfg) -> dict:
    """JSON-safe dict for an LLMConfig or DualEncoderConfig (dtypes by name)."""
    if isinstance(cfg, LLMConfig):
        kind = "llm"
    elif isinstance(cfg, DualEncoderConfig):
        kind = "dual_encoder"
    else:
        raise TypeError(f"unsupported config type {type(cfg)}")
    d = dataclasses.asdict(cfg)
    d["dtypes"] = {k: jnp.dtype(v).name for k, v in d["dtypes"].items()}
    return {"kind": kind, **d}


def config_from_dict(d: dict):
    """Inverse of ``config_to_dict``."""
    d = dict(d)
    kind = d.pop("kind")
    d["dtypes"] = DTypePolicy(
        **{k: jnp.dtype(v) for k, v in d["dtypes"].items()}
    )
    if kind == "llm":
        return LLMConfig(**d)
    if kind == "dual_encoder":
        d["vision"] = TowerConfig(**d["vision"])
        d["text"] = TowerConfig(**d["text"])
        return DualEncoderConfig(**d)
    raise ValueError(f"unknown config kind {kind!r}")


# ---------------------------------------------------------------------------
# Brain (slow loop)
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class BrainConfig:
    """Sense -> Cluster -> Smooth -> Actuate slow loop configuration.

    The reference runs this host-side with sklearn GMM
    (src/forde/moe_slow_loop.py:253-464, src/forde/clustering.py:27-30);
    here the whole loop is jittable and stays on device.
    """

    num_clusters: int = 3
    gmm_iterations: int = 50
    gmm_kmeans_iterations: int = 10
    gmm_reg_covar: float = 1e-6
    smoothing_kernel_size: int = 3
    # Router actuation (moe_slow_loop.py:211-250)
    target_balance: float = 0.1
    max_adjustment: float = 0.1
    specialist_damping: float = 0.5
    # Forde-lite rule thresholds (README.md:58-59)
    lite_spec_grad_gini: float = 0.8
    lite_pool_act_gini: float = 0.3


# ---------------------------------------------------------------------------
# Training
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class TrainConfig:
    """Training-loop configuration, mirroring the reference CLI surface
    (src/training/train.py:178-237)."""

    batch_size: int = 8
    seq_len: int = 512
    learning_rate: float = 3e-4
    weight_decay: float = 0.01
    grad_clip_norm: float = 1.0
    num_epochs: int = 1
    steps_per_epoch: int = 1000
    log_interval: int = 10
    slow_loop_interval: int = 100  # 0 disables
    checkpoint_dir: Optional[str] = None
    checkpoint_interval: int = 0  # 0 = only final
    experiment_name: str = "forde_tpu"
    use_dummy_data: bool = False
    seed: int = 42
    # Mesh shape: (data, expert) axis sizes; None = all devices on data.
    mesh_shape: Optional[Tuple[int, int]] = None
    brain: BrainConfig = field(default_factory=BrainConfig)
