"""Attention modules: Native Sparse Attention and dense causal attention.

Behavioral parity with the reference (src/forde/sparse_attention.py), but the
local/causal branches run on the Pallas flash kernel instead of
materializing (B, H, S, S) scores, and softmax always accumulates in fp32.

Preserved reference quirks (these are *behavior*, per SURVEY.md §7.3):
  * top-k selection is global per sequence, not per query
    (sparse_attention.py:441)
  * compressed branch pools the first num_pools*ratio positions via
    modular indexing, with a pool-granularity causal mask
    (sparse_attention.py:383-421)
  * branch combination is local + sigmoid(gate_c)*compressed +
    sigmoid(gate_t)*topk with hard on/off masks for short sequences
    (sparse_attention.py:346-363)
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax.sharding import Mesh

from forde_tpu.core.mesh import AXIS_CONTEXT
from forde_tpu.ops import attention_ref
from forde_tpu.ops.attention_ref import causal_mask, sliding_window_mask
from forde_tpu.ops.flash_attention import flash_attention
from forde_tpu.ops.nsa_attention import small_kv_attention


def create_causal_mask(seq_len: int) -> jnp.ndarray:
    """Lower-triangular boolean mask (reference sparse_attention.py:22-24)."""
    return causal_mask(seq_len)


def create_sliding_window_mask(seq_len: int, window_size: int) -> jnp.ndarray:
    """Causal window mask: 0 <= q - k < window
    (reference sparse_attention.py:27-48)."""
    return sliding_window_mask(seq_len, window_size)


def _split_heads(x, num_heads, head_dim):
    b, s, _ = x.shape
    return x.reshape(b, s, num_heads, head_dim).transpose(0, 2, 1, 3)


def _merge_heads(x):
    b, h, s, d = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, s, h * d)


def topk_insert(state, new_score, new_k, new_v, pos):
    """One insertion into the running top-k set of the NSA decode cache.

    ``state = (scores (B,K) f32, idxs (B,K) i32, k (B,H,K,d), v)``;
    ``new_score (B,)``, ``new_k/new_v (B,H,1,d)``, ``pos`` scalar — or
    (B,) per-row — source position. The new entry replaces the set's
    minimum iff strictly greater (ties keep the earlier index — the same
    winner as ``lax.top_k``'s stable ordering over the full prefix).
    Shared by the per-token decode step and the parallel-prefill scan
    (models/generate.nsa_prefill) so prefill caches are LEAF-EXACT
    against token-by-token streaming — same kept set, same slot order.
    """
    scores, idxs, kk, vv = state
    slot = jnp.argmin(scores, axis=1)  # (B,) first minimum
    min_score = jnp.take_along_axis(scores, slot[:, None], axis=1)[:, 0]
    accept = new_score > min_score  # (B,)
    upd = jax.nn.one_hot(slot, scores.shape[1], dtype=bool) & accept[:, None]
    scores = jnp.where(upd, new_score[:, None], scores)
    pos = jnp.asarray(pos, jnp.int32)
    idxs = jnp.where(upd, pos[:, None] if pos.ndim == 1 else pos, idxs)
    sel = upd[:, None, :, None]  # (B,1,K,1): broadcast over heads/depth
    kk = jnp.where(sel, new_k.astype(kk.dtype), kk)
    vv = jnp.where(sel, new_v.astype(vv.dtype), vv)
    return scores, idxs, kk, vv


class SlidingWindowAttention(nn.Module):
    """Causal sliding-window attention (reference sparse_attention.py:51-104),
    computed with the block-sparse flash kernel — work outside the window is
    skipped, not masked.

    ``decode=True``: incremental KV-cache path. The cache is a true RING
    BUFFER of the last ``window_size`` K/V rows (O(window) memory and
    per-step attention work, independent of ``max_decode_len``): slot
    ``pos % W`` holds position ``pos``, and each slot's source position is
    reconstructed from the write counter for masking. Multi-token calls
    (S > 1) are prefill-from-empty: attention runs over the in-call K/V
    (the training window kernel) and only the last ``W`` rows are written
    into the ring."""

    num_heads: int
    head_dim: int
    window_size: int = 512
    impl: str = "auto"
    dtype: jnp.dtype = jnp.float32
    max_decode_len: int = 2048
    # Context parallelism: when the mesh's ``context`` axis is >1 the
    # sequence arrives sharded over it; the window attention then runs
    # shard-locally with a W-row halo exchange from the previous shard
    # (parallel/nsa_context.py) — comms O(window), not O(S).
    mesh: Optional[Mesh] = None

    @nn.compact
    def __call__(
        self,
        x,
        mask: Optional[jnp.ndarray] = None,
        decode: bool = False,
        positions: Optional[jnp.ndarray] = None,
    ):
        """``positions`` (B,), decode-only: per-row position of the single
        token being fed (the continuous-pool / ragged serving path). When
        omitted the shared ``cache_index`` counter supplies the position
        (single-sequence streaming)."""
        b, s, d_model = x.shape
        qkv = nn.Dense(
            3 * self.num_heads * self.head_dim, name="qkv_proj", dtype=self.dtype
        )(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = _split_heads(q, self.num_heads, self.head_dim)
        k = _split_heads(k, self.num_heads, self.head_dim)
        v = _split_heads(v, self.num_heads, self.head_dim)
        if decode:
            w = min(self.window_size, self.max_decode_len)
            cache_shape = (b, self.num_heads, w, self.head_dim)
            cached_key = self.variable(
                "cache", "cached_key", jnp.zeros, cache_shape, k.dtype
            )
            cached_value = self.variable(
                "cache", "cached_value", jnp.zeros, cache_shape, v.dtype
            )
            cache_index = self.variable(
                "cache", "cache_index", lambda: jnp.array(0, jnp.int32)
            )
            if self.is_initializing():
                out = jnp.zeros_like(q)
            elif s == 1:
                # per-row token positions: the shared counter broadcast
                # (single-sequence streaming) or the caller's (B,) vector
                # (continuous pool / ragged batch — each row decodes at
                # its OWN position).
                if positions is not None:
                    idx = positions.astype(jnp.int32)  # (B,)
                else:
                    idx = jnp.broadcast_to(cache_index.value, (b,))
                slot = jnp.mod(idx, w)  # (B,)
                bidx = jnp.arange(b)
                keys = cached_key.value.at[bidx, :, slot].set(k[:, :, 0])
                values = cached_value.value.at[bidx, :, slot].set(v[:, :, 0])
                cached_key.value = keys
                cached_value.value = values
                cache_index.value = cache_index.value + 1
                # Slot j holds position idx - ((idx - j) mod w) — always
                # within (idx - w, idx], so the window/causal bounds hold
                # by construction; only not-yet-written slots (source
                # position < 0) are masked.
                j = jnp.arange(w)
                slot_pos = idx[:, None] - jnp.mod(idx[:, None] - j[None, :], w)
                attn_mask = (slot_pos >= 0)[:, None, None, :]
                out = attention_ref.mha_reference(q, keys, values, mask=attn_mask)
            else:
                # Prefill from an empty cache (cache_index assumed 0):
                # full in-call window attention, then write the tail.
                out = flash_attention(
                    q, k, v, causal=True, window_size=self.window_size,
                    impl=self.impl,
                )
                t = min(s, w)
                slots = jnp.mod(jnp.arange(s - t, s), w)
                cached_key.value = cached_key.value.at[:, :, slots].set(
                    k[:, :, s - t:]
                )
                cached_value.value = cached_value.value.at[:, :, slots].set(
                    v[:, :, s - t:]
                )
                cache_index.value = cache_index.value + s
        elif (
            self.mesh is not None
            and self.mesh.shape.get(AXIS_CONTEXT, 1) > 1
        ):
            from forde_tpu.parallel.nsa_context import window_attention_cp

            out = window_attention_cp(
                q, k, v, self.mesh, self.window_size, impl=self.impl
            )
        else:
            out = flash_attention(
                q, k, v, causal=True, window_size=self.window_size,
                impl=self.impl,
            )
        out = _merge_heads(out)
        return nn.Dense(d_model, name="out_proj", dtype=self.dtype)(out)


class CausalSelfAttention(nn.Module):
    """Dense causal attention fallback (reference sparse_attention.py:483-518).

    ``decode=True`` enables KV-cache autoregressive decoding (a capability
    the reference lacks entirely): a prefill call (S > 1) fills the cache
    and sets the index; subsequent single-token calls append and attend to
    the cached prefix. ``max_decode_len`` bounds the cache.
    """

    num_heads: int
    head_dim: int
    impl: str = "auto"
    dtype: jnp.dtype = jnp.float32
    max_decode_len: int = 2048
    # Context parallelism: when the mesh's ``context`` axis is >1, the
    # sequence dimension arrives sharded over it and attention runs as
    # ring attention over ICI (parallel/ring_attention.py) instead of the
    # single-chip flash kernel.
    mesh: Optional[Mesh] = None
    # int8 weight-only serving: projections consume quantized kernels
    # (ops/quant.QDense; params produced by quant.quantize_params)
    quantized: bool = False

    @nn.compact
    def __call__(
        self,
        x,
        mask: Optional[jnp.ndarray] = None,
        decode: bool = False,
        positions: Optional[jnp.ndarray] = None,
    ):
        if self.quantized:
            from forde_tpu.ops.quant import QDense as DenseCls
        else:
            DenseCls = nn.Dense
        b, s, d_model = x.shape
        qkv = DenseCls(
            3 * self.num_heads * self.head_dim, name="qkv_proj", dtype=self.dtype
        )(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = _split_heads(q, self.num_heads, self.head_dim)
        k = _split_heads(k, self.num_heads, self.head_dim)
        v = _split_heads(v, self.num_heads, self.head_dim)

        if decode:
            cache_shape = (b, self.num_heads, self.max_decode_len, self.head_dim)
            cached_key = self.variable(
                "cache", "cached_key", jnp.zeros, cache_shape, k.dtype
            )
            cached_value = self.variable(
                "cache", "cached_value", jnp.zeros, cache_shape, v.dtype
            )
            cache_index = self.variable(
                "cache", "cache_index", lambda: jnp.array(0, jnp.int32)
            )
            if self.is_initializing():
                out = jnp.zeros_like(q)
            elif positions is not None:
                # Ragged batch decode: one token per row, each sitting at
                # its OWN position (right-padded prompts of mixed lengths
                # share one compiled program; models/generate.
                # generate_ragged). Scatter the K/V row per batch element
                # and mask per-row causally — cache rows past a row's
                # position hold prefill pad garbage and are never visible.
                assert s == 1, (
                    f"per-row positions require one token per call, got s={s}"
                )
                bidx = jnp.arange(b)
                keys = cached_key.value.at[bidx, :, positions].set(k[:, :, 0])
                values = cached_value.value.at[bidx, :, positions].set(
                    v[:, :, 0]
                )
                cached_key.value = keys
                cached_value.value = values
                cache_index.value = cache_index.value + 1  # unused here
                k_pos = jnp.arange(self.max_decode_len)
                attn_mask = (k_pos[None, :] <= positions[:, None])[
                    :, None, None, :
                ]  # (B, 1, 1, M)
                out = attention_ref.mha_reference(q, keys, values, mask=attn_mask)
            else:
                idx = cache_index.value
                keys = jax.lax.dynamic_update_slice(
                    cached_key.value, k, (0, 0, idx, 0)
                )
                values = jax.lax.dynamic_update_slice(
                    cached_value.value, v, (0, 0, idx, 0)
                )
                cached_key.value = keys
                cached_value.value = values
                cache_index.value = idx + s
                # attend to everything written so far, causally within the
                # new chunk: valid iff k_pos <= idx + (local q offset)
                q_pos = idx + jnp.arange(s)[:, None]
                k_pos = jnp.arange(self.max_decode_len)[None, :]
                attn_mask = (k_pos <= q_pos)[None, None]
                out = attention_ref.mha_reference(q, keys, values, mask=attn_mask)
        elif (
            self.mesh is not None
            and self.mesh.shape.get(AXIS_CONTEXT, 1) > 1
        ):
            from forde_tpu.parallel.ring_attention import ring_attention

            out = ring_attention(q, k, v, self.mesh, causal=True)
        else:
            out = flash_attention(q, k, v, causal=True, impl=self.impl)
        out = _merge_heads(out)
        return DenseCls(d_model, name="out_proj", dtype=self.dtype)(out)


class NativeSparseAttention(nn.Module):
    """Three-branch NSA (reference sparse_attention.py:279-480).

    local (sliding-window flash) + gated compressed-global + gated top-k.
    """

    num_heads: int = 8
    head_dim: int = 64
    window_size: int = 512
    compression_ratio: int = 8
    top_k_global: int = 64
    use_compressed: bool = True
    use_top_k: bool = True
    impl: str = "auto"
    dtype: jnp.dtype = jnp.float32
    max_decode_len: int = 2048
    # Context parallelism (training path): sequence sharded over the
    # mesh's ``context`` axis. Each branch uses a structure-aware
    # collective (parallel/nsa_context.py): window halo exchange, pool
    # all-gather, global top-k with masked gather + psum. Decode stays
    # single-device (serving).
    mesh: Optional[Mesh] = None

    @property
    def _cp_active(self) -> bool:
        return (
            self.mesh is not None
            and self.mesh.shape.get(AXIS_CONTEXT, 1) > 1
        )

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        mask: Optional[jnp.ndarray] = None,
        decode: bool = False,
        positions: Optional[jnp.ndarray] = None,
        lengths: Optional[jnp.ndarray] = None,
    ):
        """``positions`` (B,), decode-only: per-row position of the single
        token being fed (continuous pool / ragged batch serving).
        ``lengths`` (B,), training-mode-only: the RAGGED forward — ``x``
        is right-padded and row i's true length is ``lengths[i]``. Every
        position < lengths[i] then computes exactly what a per-row
        exact-length forward would (traced per-row branch gates, pad
        importance scores at -inf, per-row pool-count masking via the
        INVALID_KEY_POS sentinel) — the foundation of the padded
        one-compile NSA prefill (models/generate.nsa_prefill)."""
        if decode:
            return self._decode_step(x, positions)
        b, s, d_model = x.shape

        output = SlidingWindowAttention(
            num_heads=self.num_heads,
            head_dim=self.head_dim,
            window_size=self.window_size,
            impl=self.impl,
            dtype=self.dtype,
            max_decode_len=self.max_decode_len,
            mesh=self.mesh,
            name="local_attention",
        )(x, mask)

        # Short-sequence gates (reference sparse_attention.py:331-332,
        # 362): static Python bools of the (padded) length normally,
        # traced per-row predicates of the true length on the ragged path.
        if lengths is None:
            local_window_start = s - self.window_size
            use_c = 1.0 if local_window_start > self.compression_ratio else 0.0
            use_t = 1.0 if s > self.window_size else 0.0
        else:
            use_c = (
                lengths - self.window_size > self.compression_ratio
            ).astype(x.dtype)[:, None, None]
            use_t = (lengths > self.window_size).astype(x.dtype)[:, None, None]

        if self.use_compressed:
            compressed = self._compressed_global(x, lengths)
            gate_c = jax.nn.sigmoid(
                nn.Dense(d_model, name="gate_compressed", dtype=self.dtype)(x)
            )
            output = output + use_c * gate_c * compressed

        if self.use_top_k:
            topk = self._top_k(x, lengths)
            gate_t = jax.nn.sigmoid(
                nn.Dense(d_model, name="gate_top_k", dtype=self.dtype)(x)
            )
            output = output + use_t * gate_t * topk

        return output

    # ------------------------------------------------------------------
    # Incremental decoding (a capability the reference lacks entirely —
    # it is training-only). One token per call.
    #
    # SEMANTICS: streaming — each position is computed at its own
    # generation-time length. The LAST position of a clean full forward
    # at length L matches this exactly (tests/test_generate.py). NSA's
    # reference semantics are not streaming-consistent in DEPTH, though:
    # the branch gates switch on the total sequence length and the top-k
    # selection is global, so a teacher-forced forward at length L
    # recomputes EARLIER positions under length-L gates/selection, which
    # feeds later layers slightly different intermediates than the
    # historical values a streaming decoder (necessarily) uses. Below
    # seq_len == window_size the two coincide at every depth.
    #
    # Cache structure per branch:
    #   local      — ring of the last window_size k/v.
    #   compressed — running chunk sum; every compression_ratio tokens a
    #                pool's k/v row is emitted. Pool p participates once
    #                seq_len - window >= (p+1)*ratio (the training
    #                num_pools bound), enforced through the fused
    #                kernel's key_pos threshold.
    #   top-k      — per-token importance scores + projected k/v rows;
    #                each step re-selects the global top-k over all
    #                scored positions (unwritten slots = -inf and masked
    #                by their position anyway).
    # The short-sequence branch gates become traced predicates of the
    # current length (they are static Python bools in training).
    # ------------------------------------------------------------------

    def _decode_step(
        self, x: jnp.ndarray, positions: Optional[jnp.ndarray] = None
    ) -> jnp.ndarray:
        b, s, d_model = x.shape
        assert s == 1 or self.is_initializing(), (
            "NSA decode processes one token per call (prefill feeds the "
            f"prompt token-by-token); got s={s}"
        )
        h, d, ratio = self.num_heads, self.head_dim, self.compression_ratio
        max_pools = max(self.max_decode_len // ratio, 1)

        pos = self.variable("cache", "nsa_pos", lambda: jnp.array(0, jnp.int32))
        # position of this token, PER ROW; seq_len after = cur + 1. All
        # branch state (ring, chunk sums, running top-k) is per-row, so
        # the shared-counter path is just the broadcast special case of
        # per-row positions (the continuous pool / ragged serving path).
        if positions is not None:
            cur = positions.astype(jnp.int32)  # (B,)
        else:
            cur = jnp.broadcast_to(pos.value, (b,))

        output = SlidingWindowAttention(
            num_heads=h,
            head_dim=d,
            window_size=self.window_size,
            impl=self.impl,
            dtype=self.dtype,
            max_decode_len=self.max_decode_len,
            name="local_attention",
        )(x, None, decode=True, positions=positions)

        seq_len = cur + 1  # (B,)
        if self.use_compressed:
            comp = self._compressed_decode(x, cur, b, d_model, max_pools)
            gate_c = jax.nn.sigmoid(
                nn.Dense(d_model, name="gate_compressed", dtype=self.dtype)(x)
            )
            use_c = (seq_len - self.window_size > ratio).astype(x.dtype)
            output = output + use_c[:, None, None] * gate_c * comp

        if self.use_top_k:
            topk = self._top_k_decode(x, cur, b, d_model)
            gate_t = jax.nn.sigmoid(
                nn.Dense(d_model, name="gate_top_k", dtype=self.dtype)(x)
            )
            use_t = (seq_len > self.window_size).astype(x.dtype)
            output = output + use_t[:, None, None] * gate_t * topk

        if not self.is_initializing():
            pos.value = pos.value + 1
        return output

    def _compressed_decode(self, x, cur, b, d_model, max_pools):
        h, d, ratio = self.num_heads, self.head_dim, self.compression_ratio
        chunk_sum = self.variable(
            "cache", "comp_chunk_sum",
            lambda: jnp.zeros((b, d_model), jnp.float32),
        )
        comp_k = self.variable(
            "cache", "comp_k",
            lambda: jnp.zeros((b, h, max_pools, d), self.dtype),
        )
        comp_v = self.variable(
            "cache", "comp_v",
            lambda: jnp.zeros((b, h, max_pools, d), self.dtype),
        )

        q = nn.Dense(h * d, name="compressed_q_proj", dtype=self.dtype)(x)
        # The pool k/v projections must exist in the param tree with the
        # training shapes; at decode they are applied to one pool mean.
        k_proj = nn.Dense(h * d, name="compressed_k_proj", dtype=self.dtype)
        v_proj = nn.Dense(h * d, name="compressed_v_proj", dtype=self.dtype)

        if self.is_initializing():
            # trace the projections once so their params materialize
            k_proj(x)
            v_proj(x)
            return jnp.zeros_like(x)

        new_sum = chunk_sum.value + x[:, 0, :].astype(jnp.float32)
        completes = (cur + 1) % ratio == 0  # (B,) this token closes a chunk
        pool_idx = jnp.maximum((cur + 1) // ratio - 1, 0)  # (B,)

        pool_mean = (new_sum / ratio).astype(x.dtype)[:, None, :]  # (B,1,D)
        new_k = _split_heads(k_proj(pool_mean), h, d)[:, :, 0]  # (B,H,d)
        new_v = _split_heads(v_proj(pool_mean), h, d)[:, :, 0]
        # per-row gather/scatter at each row's own pool slot (rows sit at
        # different positions in the continuous pool / ragged path; the
        # shared-counter case is the broadcast special case)
        bidx = jnp.arange(b)
        old_k = comp_k.value[bidx, :, pool_idx]  # (B,H,d)
        old_v = comp_v.value[bidx, :, pool_idx]
        sel = completes[:, None, None]
        comp_k.value = comp_k.value.at[bidx, :, pool_idx].set(
            jnp.where(sel, new_k, old_k)
        )
        comp_v.value = comp_v.value.at[bidx, :, pool_idx].set(
            jnp.where(sel, new_v, old_v)
        )
        chunk_sum.value = jnp.where(
            completes[:, None], jnp.zeros_like(new_sum), new_sum
        )

        # Pool p participates once seq_len - window >= (p+1)*ratio, i.e.
        # cur >= (p+1)*ratio + window - 1. The kernel compares against
        # query position 0 (our one query), so shift thresholds by -cur.
        pool_ends = (jnp.arange(max_pools) + 1) * ratio + self.window_size - 1
        key_pos = pool_ends[None, :] - cur[:, None]  # (B, max_pools)
        qh = _split_heads(q, h, d)
        out = small_kv_attention(
            qh, comp_k.value, comp_v.value, key_pos, impl=self.impl
        )
        out = _merge_heads(out).astype(x.dtype)
        return nn.Dense(d_model, name="compressed_out_proj", dtype=self.dtype)(out)

    def _top_k_decode(self, x, cur, b, d_model):
        """Running top-k set: O(k) memory and per-step work, NOT
        O(max_decode_len).

        Importance scores are write-once per position, so the global
        top-k over the prefix can be maintained INCREMENTALLY and
        exactly: a new token either replaces the current minimum of the
        kept set (strictly greater — ties keep the earlier index, the
        same preference as ``lax.top_k``'s stable ordering) or is
        dropped forever. Only the kept k projected K/V rows are stored;
        round 2 kept every row ((B, H, max_decode_len, d) buffers) and
        re-ran ``lax.top_k`` over all scores each step.
        """
        h, d = self.num_heads, self.head_dim
        k_sel = min(self.top_k_global, self.max_decode_len)
        scores = self.variable(
            "cache", "topk_scores",
            lambda: jnp.full((b, k_sel), -jnp.inf, jnp.float32),
        )
        # source position of each kept row; empty slots sit at
        # max_decode_len (> any cur) so the key_pos mask kills them.
        idxs = self.variable(
            "cache", "topk_idx",
            lambda: jnp.full((b, k_sel), self.max_decode_len, jnp.int32),
        )
        topk_k = self.variable(
            "cache", "topk_k", lambda: jnp.zeros((b, h, k_sel, d), self.dtype)
        )
        topk_v = self.variable(
            "cache", "topk_v", lambda: jnp.zeros((b, h, k_sel, d), self.dtype)
        )

        importance = nn.Dense(1, name="importance_scorer", dtype=self.dtype)(
            x
        ).squeeze(-1)  # (B, 1)
        q = nn.Dense(h * d, name="topk_q_proj", dtype=self.dtype)(x)
        k_proj = nn.Dense(h * d, name="topk_k_proj", dtype=self.dtype)
        v_proj = nn.Dense(h * d, name="topk_v_proj", dtype=self.dtype)

        if self.is_initializing():
            k_proj(x)
            v_proj(x)
            return jnp.zeros_like(x)

        new_k = _split_heads(k_proj(x), h, d)
        new_v = _split_heads(v_proj(x), h, d)
        sc, ix, kk, vv = topk_insert(
            (scores.value, idxs.value, topk_k.value, topk_v.value),
            importance[:, 0].astype(jnp.float32), new_k, new_v, cur,
        )
        scores.value, idxs.value = sc, ix
        topk_k.value, topk_v.value = kk, vv

        # index-based causal mask: kept row j visible iff cur >= its
        # source index (thresholds shifted by each row's own -cur for the
        # position-0 query); empty slots sit at max_decode_len (> any
        # admissible cur — positions are clipped to max_seq_len - 1) and
        # stay masked.
        out = small_kv_attention(
            _split_heads(q, h, d), kk, vv, ix - cur[:, None], impl=self.impl
        )
        out = _merge_heads(out).astype(x.dtype)
        return nn.Dense(d_model, name="topk_out_proj", dtype=self.dtype)(out)

    def _compressed_global(
        self, x: jnp.ndarray, lengths: Optional[jnp.ndarray] = None
    ) -> jnp.ndarray:
        """Coarse branch: mean-pool early positions into summaries, attend
        with a pool-granular causal mask (reference :367-429).

        ``lengths`` (B,): the ragged path — pools that do not exist at a
        row's true length are excluded ABSOLUTELY (INVALID_KEY_POS →
        -inf), so even the reference's all-masked-uniform quirk
        normalizes over exactly the pools a per-row exact-length forward
        would have. (The modular-wrap quirk cannot fire for any row whose
        gate is on: gate-on means len > window + ratio, so the row's pool
        span num_pools_row*ratio <= len - window < len never wraps.)"""
        assert lengths is None or not self._cp_active, (
            "ragged NSA forward is a serving/prefill path — not supported "
            "under context parallelism"
        )
        b, s, d_model = x.shape
        max_global_len = max(s - self.window_size, self.compression_ratio)
        num_pools = max(max_global_len // self.compression_ratio, 1)
        truncated_len = num_pools * self.compression_ratio

        if self._cp_active and truncated_len <= s:
            # Shard-local pooling + all-gather of the (small) pool means;
            # the modular-wrap quirk below cannot trigger here because
            # truncated_len <= s (s > window in any CP configuration).
            from forde_tpu.parallel.nsa_context import gather_pool_means_cp

            compressed = gather_pool_means_cp(
                x, self.mesh, self.compression_ratio, num_pools
            )
        else:
            # Modular indexing quirk preserved: positions wrap past seq_len.
            pool_indices = jnp.arange(truncated_len) % s
            global_tokens = jnp.take(x, pool_indices, axis=1)
            compressed = global_tokens.reshape(
                b, num_pools, self.compression_ratio, d_model
            ).mean(axis=2)

        q = nn.Dense(
            self.num_heads * self.head_dim, name="compressed_q_proj", dtype=self.dtype
        )(x)
        k = nn.Dense(
            self.num_heads * self.head_dim, name="compressed_k_proj", dtype=self.dtype
        )(compressed)
        v = nn.Dense(
            self.num_heads * self.head_dim, name="compressed_v_proj", dtype=self.dtype
        )(compressed)
        q = _split_heads(q, self.num_heads, self.head_dim)
        k = _split_heads(k, self.num_heads, self.head_dim)
        v = _split_heads(v, self.num_heads, self.head_dim)

        # Pool p is visible to queries at positions >= (p+1)*ratio — the
        # pool-granular causal mask, expressed as per-key thresholds for
        # the fused small-KV kernel (scores never materialize in HBM).
        pool_ends = (jnp.arange(num_pools) + 1) * self.compression_ratio
        key_pos = jnp.broadcast_to(pool_ends[None, :], (b, num_pools))
        if lengths is not None:
            from forde_tpu.ops.nsa_attention import INVALID_KEY_POS

            # exact per-row pool count (reference num_pools formula at
            # the row's true length); pools beyond it are padding keys
            np_row = jnp.maximum(
                jnp.maximum(lengths - self.window_size, self.compression_ratio)
                // self.compression_ratio,
                1,
            )
            key_pos = jnp.where(
                jnp.arange(num_pools)[None, :] < np_row[:, None],
                key_pos,
                INVALID_KEY_POS,
            )
        if self._cp_active:
            from forde_tpu.parallel.nsa_context import small_kv_attention_cp

            out = small_kv_attention_cp(
                q, k, v, key_pos, self.mesh, impl=self.impl
            )
        else:
            out = small_kv_attention(q, k, v, key_pos, impl=self.impl)
        out = _merge_heads(out).astype(x.dtype)
        return nn.Dense(d_model, name="compressed_out_proj", dtype=self.dtype)(out)

    def _top_k(
        self, x: jnp.ndarray, lengths: Optional[jnp.ndarray] = None
    ) -> jnp.ndarray:
        """Fine branch: learned importance scores pick k tokens globally per
        sequence; attend with index-based causal mask (reference :431-480).

        ``lengths`` (B,): the ragged path — pad positions score -inf, so
        a row's selected set restricted to visible (index <= query)
        tokens is exactly what a per-row exact-length forward selects
        (pads only ever fill surplus slots, at indices >= the row's
        length, invisible to every real query)."""
        b, s, d_model = x.shape
        k_sel = min(self.top_k_global, s)

        importance = nn.Dense(1, name="importance_scorer", dtype=self.dtype)(
            x
        ).squeeze(-1)
        if lengths is not None:
            importance = jnp.where(
                jnp.arange(s)[None, :] < lengths[:, None], importance, -jnp.inf
            )
        _, top_k_indices = jax.lax.top_k(importance, k_sel)  # (b, k) global per seq

        if self._cp_active:
            # scores gather replicates only (B, S) scalars under pjit;
            # selected rows come from a masked shard gather + psum so the
            # full (B, S, D) sequence never materializes on one device.
            from forde_tpu.parallel.nsa_context import topk_select_cp

            selected = topk_select_cp(x, top_k_indices, self.mesh)
        else:
            batch_idx = jnp.arange(b)[:, None]
            selected = x[batch_idx, top_k_indices, :]  # (b, k, d_model)

        q = nn.Dense(
            self.num_heads * self.head_dim, name="topk_q_proj", dtype=self.dtype
        )(x)
        kk = nn.Dense(
            self.num_heads * self.head_dim, name="topk_k_proj", dtype=self.dtype
        )(selected)
        vv = nn.Dense(
            self.num_heads * self.head_dim, name="topk_v_proj", dtype=self.dtype
        )(selected)
        q = _split_heads(q, self.num_heads, self.head_dim)
        kk = _split_heads(kk, self.num_heads, self.head_dim)
        vv = _split_heads(vv, self.num_heads, self.head_dim)

        # Selected token j is visible to queries at positions >= its source
        # index (the reference's index-based causal mask), fused so the
        # (B, H, S, k) scores stay in VMEM.
        if self._cp_active:
            from forde_tpu.parallel.nsa_context import small_kv_attention_cp

            out = small_kv_attention_cp(
                q, kk, vv, top_k_indices, self.mesh, impl=self.impl
            )
        else:
            out = small_kv_attention(q, kk, vv, top_k_indices, impl=self.impl)
        out = _merge_heads(out).astype(x.dtype)
        return nn.Dense(d_model, name="topk_out_proj", dtype=self.dtype)(out)
