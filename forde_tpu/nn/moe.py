"""Mixture-of-Experts layers with stacked expert parameters.

Parity target: reference src/forde/moe.py. Differences are deliberate and
TPU-first:

  * Experts are ONE stacked parameter tensor (E, d, h) / (E, h, d) so the
    whole expert bank runs as two batched einsums on the MXU. The reference
    instantiates a Python list of Dense modules and stacks activations
    (moe.py:98-105, 161-163).
  * Two dispatch modes: "dense" reproduces the reference math exactly
    (every expert sees every token, outputs mixed by top-k weights);
    "capacity" is the production scatter/gather path that expert
    parallelism shards over the ``expert`` mesh axis.

The stats contract is identical to the reference: a ``stats_buffer``
mutable collection holding ``expert_usage`` (summed mean router probability
per expert) and ``step_count`` (moe.py:265-279), consumed and zeroed by the
slow loop.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax.sharding import Mesh

from forde_tpu.ops import moe_dispatch

_expert_kernel_init = nn.initializers.variance_scaling(
    1.0, "fan_in", "truncated_normal", in_axis=-2, out_axis=-1, batch_axis=(0,)
)


class ExpertsFFN(nn.Module):
    """The full expert bank as batched einsums: (E,d,h) up, gelu, (E,h,d) down.

    Per-expert math matches reference ExpertMLP (moe.py:17-29):
    Dense -> gelu -> Dense.
    """

    num_experts: int
    hidden_dim: int
    d_model: int
    dtype: jnp.dtype = jnp.float32
    # int8 weight-only serving (ops/quant.py): stacked expert tensors are
    # stored int8 with per-(expert, out-channel) scales; both einsums run
    # int8 with dynamically-quantized activations.
    quantized: bool = False

    def setup(self):
        e, d, h = self.num_experts, self.d_model, self.hidden_dim
        if self.quantized:
            int8_zeros = lambda key, shape: jnp.zeros(shape, jnp.int8)  # noqa: E731
            self.w_up_q = self.param("w_up_q", int8_zeros, (e, d, h))
            self.w_up_scale = self.param(
                "w_up_scale", nn.initializers.ones, (e, h), jnp.float32
            )
            self.w_down_q = self.param("w_down_q", int8_zeros, (e, h, d))
            self.w_down_scale = self.param(
                "w_down_scale", nn.initializers.ones, (e, d), jnp.float32
            )
        else:
            self.w_up = self.param("w_up", _expert_kernel_init, (e, d, h))
            self.w_down = self.param("w_down", _expert_kernel_init, (e, h, d))
        self.b_up = self.param("b_up", nn.initializers.zeros, (e, h))
        self.b_down = self.param("b_down", nn.initializers.zeros, (e, d))

    def _q_einsum(self, spec, x, w_q, w_scale, scale_shape):
        """int8 einsum with dynamic per-row activation quantization
        (the shared recipe, ops/quant.quantize_activations)."""
        from forde_tpu.ops.quant import quantize_activations

        xq, x_scale = quantize_activations(x)
        acc = jnp.einsum(spec, xq, w_q, preferred_element_type=jnp.int32)
        # x_scale (rows..., 1) broadcasts against the output's trailing
        # channel dim; w_scale is reshaped to line up per output spec
        return acc.astype(jnp.float32) * x_scale * w_scale.reshape(scale_shape)

    def all_tokens(self, x: jnp.ndarray) -> jnp.ndarray:
        """Dense mode: run every expert on every token. x (B,S,D) -> (E,B,S,D)."""
        if self.quantized:
            e, h, d = self.num_experts, self.hidden_dim, self.d_model
            # (B,S,1) activation scales broadcast against (E,B,S,F)
            hid = self._q_einsum(
                "bsd,edh->ebsh", x, self.w_up_q, self.w_up_scale, (e, 1, 1, h)
            ) + self.b_up[:, None, None, :]
            hid = nn.gelu(hid)
            out = self._q_einsum(
                "ebsh,ehd->ebsd", hid, self.w_down_q, self.w_down_scale,
                (e, 1, 1, d),
            ) + self.b_down[:, None, None, :]
            return out.astype(self.dtype)
        w_up = self.w_up.astype(self.dtype)
        w_down = self.w_down.astype(self.dtype)
        h = jnp.einsum("bsd,edh->ebsh", x, w_up) + self.b_up.astype(self.dtype)[
            :, None, None, :
        ]
        h = nn.gelu(h)
        return jnp.einsum("ebsh,ehd->ebsd", h, w_down) + self.b_down.astype(
            self.dtype
        )[:, None, None, :]

    def raw_params(self):
        """Expose the stacked tensors for the explicit-EP shard_map path."""
        assert not self.quantized, "dispatch='ep' serves fp experts only"
        return self.w_up, self.b_up, self.w_down, self.b_down

    def dispatched(self, expert_inputs: jnp.ndarray) -> jnp.ndarray:
        """Capacity mode: per-expert buffers (E, C, D) -> (E, C, D)."""
        if self.quantized:
            e, h, d = self.num_experts, self.hidden_dim, self.d_model
            hid = self._q_einsum(
                "ecd,edh->ech", expert_inputs, self.w_up_q, self.w_up_scale,
                (e, 1, h),
            ) + self.b_up[:, None, :]
            hid = nn.gelu(hid)
            out = self._q_einsum(
                "ech,ehd->ecd", hid, self.w_down_q, self.w_down_scale,
                (e, 1, d),
            ) + self.b_down[:, None, :]
            return out.astype(self.dtype)
        w_up = self.w_up.astype(self.dtype)
        w_down = self.w_down.astype(self.dtype)
        h = jnp.einsum("ecd,edh->ech", expert_inputs, w_up) + self.b_up.astype(
            self.dtype
        )[:, None, :]
        h = nn.gelu(h)
        return jnp.einsum("ech,ehd->ecd", h, w_down) + self.b_down.astype(self.dtype)[
            :, None, :
        ]


class MoERouter(nn.Module):
    """Linear router (reference moe.py:32-54)."""

    num_experts: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        return nn.Dense(
            self.num_experts,
            name="router_linear",
            kernel_init=nn.initializers.normal(stddev=0.02),
            dtype=self.dtype,
        )(x)


class MoELayer(nn.Module):
    """Top-k routed MoE FFN (reference moe.py:57-222).

    Returns (output, aux_loss, router_probs) exactly like the reference.
    """

    num_experts: int = 8
    top_k: int = 2
    expert_hidden_dim: int = 2048
    d_model: int = 512
    aux_loss_weight: float = 0.01
    dispatch: str = "dense"  # "dense" | "capacity" | "ep"
    capacity_factor: float = 2.0
    dtype: jnp.dtype = jnp.float32
    # Required for dispatch="ep": the device mesh whose ``expert`` axis
    # shards the stacked expert tensors (explicit shard_map EP).
    mesh: Optional[Mesh] = None
    # int8 weight-only serving (dense/capacity dispatch only)
    quantized: bool = False

    @nn.compact
    def __call__(self, x) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        if self.quantized and self.dispatch == "ep":
            raise ValueError("quantized serving supports dense/capacity "
                             "dispatch (EP shard_map moves fp tensors)")
        b, s, d_model = x.shape

        router_logits = MoERouter(
            num_experts=self.num_experts, dtype=self.dtype, name="router"
        )(x)
        # Router math in fp32: the softmax/top-k decisions are control flow
        # and deserve full precision even under bf16 compute.
        router_logits = router_logits.astype(jnp.float32)
        router_probs = jax.nn.softmax(router_logits, axis=-1)
        top_k_indices, top_k_probs = moe_dispatch.top_k_gating(
            router_logits, self.top_k
        )

        experts = ExpertsFFN(
            num_experts=self.num_experts,
            hidden_dim=self.expert_hidden_dim,
            d_model=d_model,
            dtype=self.dtype,
            quantized=self.quantized,
            name="experts",
        )

        if self.dispatch == "dense":
            all_out = experts.all_tokens(x)  # (E, B, S, D)
            combine = moe_dispatch.combine_matrix(
                top_k_indices, top_k_probs, self.num_experts
            )  # (B, S, E)
            output = moe_dispatch.dense_combine(all_out, combine)
        elif self.dispatch == "capacity":
            t = b * s
            capacity = int(self.capacity_factor * t * self.top_k / self.num_experts)
            capacity = max(capacity, self.top_k)
            plan = moe_dispatch.capacity_route(
                top_k_indices.reshape(t, self.top_k),
                top_k_probs.reshape(t, self.top_k),
                self.num_experts,
                capacity,
            )
            flat_x = x.reshape(t, d_model)
            expert_in = moe_dispatch.capacity_gather(flat_x, plan)  # (E, C, D)
            expert_out = experts.dispatched(expert_in)
            output = moe_dispatch.capacity_combine(expert_out, plan).reshape(
                b, s, d_model
            )
        elif self.dispatch == "ep":
            # Explicit expert parallelism: the router and aux loss run in
            # the surrounding pjit computation; the dispatch/expert-FFN/
            # combine is shard_mapped over the mesh so every device holds
            # E/ep experts. Tokens move to their experts via all_to_all
            # (GShard-style; psum fallback for ragged token counts) —
            # parallel/expert_parallel.py.
            if self.mesh is None:
                raise ValueError(
                    'dispatch="ep" requires a mesh (MoELayer(mesh=...))'
                )
            from forde_tpu.parallel.expert_parallel import expert_parallel_ffn

            output = expert_parallel_ffn(
                x,
                top_k_indices,
                top_k_probs,
                experts.raw_params(),
                self.mesh,
                num_experts=self.num_experts,
                top_k=self.top_k,
                capacity_factor=self.capacity_factor,
            )
        else:
            raise ValueError(f"unknown dispatch mode {self.dispatch!r}")

        aux_loss = (
            moe_dispatch.load_balancing_loss(
                router_probs, top_k_indices, self.num_experts
            )
            * self.aux_loss_weight
        )
        return output.astype(x.dtype), aux_loss, router_probs


class MoEStatefulLayer(nn.Module):
    """MoE + FORDE sensing: accumulates expert usage into ``stats_buffer``
    (reference moe.py:225-281, same collection/variable names)."""

    num_experts: int = 8
    top_k: int = 2
    expert_hidden_dim: int = 2048
    d_model: int = 512
    aux_loss_weight: float = 0.01
    dispatch: str = "dense"
    capacity_factor: float = 2.0
    dtype: jnp.dtype = jnp.float32
    mesh: Optional[Mesh] = None
    quantized: bool = False

    @nn.compact
    def __call__(self, x) -> Tuple[jnp.ndarray, jnp.ndarray]:
        output, aux_loss, router_probs = MoELayer(
            num_experts=self.num_experts,
            top_k=self.top_k,
            expert_hidden_dim=self.expert_hidden_dim,
            d_model=x.shape[-1],
            aux_loss_weight=self.aux_loss_weight,
            dispatch=self.dispatch,
            capacity_factor=self.capacity_factor,
            dtype=self.dtype,
            mesh=self.mesh,
            quantized=self.quantized,
            name="moe_layer",
        )(x)

        expert_usage = self.variable(
            "stats_buffer",
            "expert_usage",
            lambda: jnp.zeros(self.num_experts, dtype=jnp.float32),
        )
        step_count = self.variable(
            "stats_buffer", "step_count", lambda: jnp.array(0, dtype=jnp.int32)
        )
        if not self.is_initializing():
            current = router_probs.mean(axis=(0, 1)).astype(jnp.float32)
            expert_usage.value = expert_usage.value + current
            step_count.value = step_count.value + 1

        return output, aux_loss
