"""Weight-only int8 quantization for serving.

A production-serving capability the training-only reference has no
analog for (SURVEY.md §0). Symmetric per-output-channel int8 weights +
dynamic per-row (per-token) int8 activation quantization, so the matmul
itself runs int8 x int8 -> int32 — on TPU that is the MXU's native
low-precision path AND halves (vs bf16; quarters vs fp32) the weight
bytes HBM must stream per decode step, which is what bounds small-batch
decoding.

Design notes:
  * weights: ``q = round(w / s)`` with ``s = max|w| / 127`` per OUTPUT
    channel — keeps each channel's dynamic range, costs one (dout,) fp32
    vector;
  * activations: quantized on the fly per row (token) — no calibration
    pass needed, and the rescale ``acc * x_scale * w_scale`` is exact
    (both scales are outer factors of the int accumulation);
  * ``QDense`` is a drop-in for ``nn.Dense`` (same constructor surface);
    ``quantize_params`` rewrites a trained fp param tree into the QDense
    layout for the module names the decoder swaps (models/decoder_lm.py
    under ``config.quantized``).

Expected error: int8 per-channel weight rounding is ~0.4% RMS of the
channel range; see tests/test_quant.py for the measured end-to-end logit
error on the tiny decoder.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

# Dense submodules the decoder swaps to QDense under config.quantized
# (models/decoder_lm.py, nn/attention.py). MoE expert stacks and the NSA
# branch projections keep fp weights (the NSA prefill reads them
# directly — models/generate.nsa_prefill); embeddings are gathers, not
# matmuls.
QUANT_MODULE_NAMES = frozenset(
    {"qkv_proj", "out_proj", "ffn_up", "ffn_down", "lm_head"}
)


def quantize_weight(w: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(..., din, dout) fp kernel -> (int8 kernel, (..., dout) fp32 scale).

    The leading ... covers nn.scan's stacked-(L,) layout (scan_layers)."""
    w = w.astype(jnp.float32)
    scale = jnp.max(jnp.abs(w), axis=-2) / 127.0
    scale = jnp.maximum(scale, 1e-12)
    q = jnp.clip(
        jnp.round(w / scale[..., None, :]), -127, 127
    ).astype(jnp.int8)
    return q, scale


def quantize_activations(x) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Dynamic symmetric per-row int8 activation quantization: (..., din)
    float -> ((..., din) int8, (..., 1) fp32 scale). THE quantization
    recipe — int8_dense and the MoE expert einsums (nn/moe.ExpertsFFN)
    both use it, so a numerics change lands everywhere at once."""
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    x_scale = jnp.maximum(amax, 1e-12) / 127.0
    xq = jnp.clip(jnp.round(xf / x_scale), -127, 127).astype(jnp.int8)
    return xq, x_scale


def int8_dense(x, kernel_q, w_scale, bias=None, out_dtype=jnp.float32):
    """``x @ dequant(kernel_q)`` computed as an int8 matmul.

    x: (..., din) float; kernel_q: (din, dout) int8; w_scale: (dout,).
    Activations are quantized symmetrically per row; the int32
    accumulator is rescaled by both scales.
    """
    xq, x_scale = quantize_activations(x)
    acc = jax.lax.dot_general(
        xq,
        kernel_q,
        (((xq.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    out = acc.astype(jnp.float32) * x_scale * w_scale
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    return out.astype(out_dtype)


class QDense(nn.Module):
    """Drop-in for ``nn.Dense`` consuming int8 weights (serving only).

    Params: ``kernel_q`` (din, features) int8, ``scale`` (features,)
    fp32, ``bias`` (features,) fp32 — produced from a trained fp kernel
    by ``quantize_params``; the zero/one initializers only exist so
    ``model.init`` can materialize cache shapes.
    """

    features: int
    dtype: jnp.dtype = jnp.float32
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        din = x.shape[-1]
        kernel_q = self.param(
            "kernel_q",
            lambda key, shape: jnp.zeros(shape, jnp.int8),
            (din, self.features),
        )
        scale = self.param(
            "scale", nn.initializers.ones, (self.features,), jnp.float32
        )
        bias = (
            self.param(
                "bias", nn.initializers.zeros, (self.features,), jnp.float32
            )
            if self.use_bias
            else None
        )
        return int8_dense(x, kernel_q, scale, bias, out_dtype=self.dtype)


def quantize_params(params):
    """Rewrite a trained fp param tree into the QDense layout: every
    subtree named in ``QUANT_MODULE_NAMES`` that holds a ``kernel`` is
    replaced by {kernel_q, scale, bias}. Everything else passes through
    (embeddings, norms, mHC, MoE experts, NSA projections)."""

    def walk(name, node, in_nsa):
        if isinstance(node, dict) or hasattr(node, "items"):
            # NSA branch projections (incl. its local qkv_proj) stay fp:
            # the NSA module keeps nn.Dense and nsa_prefill reads the raw
            # kernels (models/generate.py)
            in_nsa = in_nsa or name == "sparse_attention"
            if not in_nsa and name in QUANT_MODULE_NAMES and "kernel" in node:
                q, scale = quantize_weight(node["kernel"])
                out = {"kernel_q": q, "scale": scale}
                if "bias" in node:
                    out["bias"] = node["bias"].astype(jnp.float32)
                return out
            if name == "experts" and "w_up" in node:
                # stacked MoE expert bank (nn/moe.ExpertsFFN)
                up_q, up_s = quantize_weight(node["w_up"])
                dn_q, dn_s = quantize_weight(node["w_down"])
                return {
                    "w_up_q": up_q, "w_up_scale": up_s,
                    "w_down_q": dn_q, "w_down_scale": dn_s,
                    "b_up": node["b_up"].astype(jnp.float32),
                    "b_down": node["b_down"].astype(jnp.float32),
                }
            return {k: walk(k, v, in_nsa) for k, v in node.items()}
        return node

    return walk("", params, False)
