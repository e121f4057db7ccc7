"""GPipe-style pipeline parallelism over the ``pipe`` mesh axis.

The reference is single-device (SURVEY.md §2.4); pipelining here is new,
TPU-first work. The decoder's ``scan_layers=True`` layout is the natural
pipeline representation: every block parameter is (L,)-stacked, so stage
``s`` of ``S`` simply owns the contiguous slice of ``L/S`` layers — the
same bytes, sharded over ``pipe`` with ``P('pipe')`` on dim 0, no
repacking.

Schedule (classic GPipe, SPMD form): the global batch is split into M
microbatches. At tick t (t = 0..M+S-2), every stage applies its local
layer stack to its current activation; stage 0 ingests microbatch t,
stage S-1 emits the finished microbatch t-(S-1); activations move one
stage down the ring via ``lax.ppermute``. All shapes are static — the
pipeline bubble is computed-and-masked (inactive ticks contribute
nothing to outputs, aux losses, or FORDE stats), which is the standard
SPMD cost of the (S-1)/(M+S-1) bubble.

Exactness (tested in tests/test_pipeline.py):
  * logits are bit-for-the-same-math equal to the unpipelined model —
    per-example computation is independent of microbatching;
  * expert-usage stats decompose over microbatches, so the accumulated
    stats_buffer equals one full-batch forward; ``step_count`` advances
    by 1 per optimizer step (microbatches are not steps) so the slow
    loop's usage/step_count normalization is unchanged;
  * gradients flow through ppermute + the tick scan and match the
    microbatched reference exactly (the schedule itself is exact —
    contrast nothing is approximated by the bubble masking).

One deliberate microbatching semantic: the MoE load-balance aux loss is
computed per microbatch and AVERAGED. It is nonlinear in batch
composition, so ``mean_m(aux(mb_m)) != aux(full batch)`` in general —
the standard GPipe trade (every microbatched trainer makes it). The LM
loss and its gradients are unaffected (cross-entropy means decompose);
only the aux regularizer sees microbatch statistics. Toggling
``--pipeline_parallelism`` therefore changes the aux term's value
slightly at identical data; tests compare against the microbatched
reference, which is the semantics actually computed.

Scope: training/eval forward (``decode=False``), ``deterministic=True``
(PP serving would pipeline the decode loop instead), and
``scan_layers=True`` (the stacked layout IS the stage slicing).

Axis composition: the stage program is manual ONLY over ``pipe`` (and
``data``); every other mesh axis stays automatic, so GSPMD keeps
partitioning inside each stage. Supported 3-axis meshes:
  * data x model x pipe — Megatron TP inside each GPipe stage
    (tp_param_spec shardings on the (L,)-stacked block params);
  * data x expert x pipe — ``moe_dispatch="capacity"`` with the stacked
    expert bank sharded (L, E->expert, ...) by train/state.state_shardings;
    XLA partitions the expert einsums over ``expert``.
PP x EP via the shard_map all-to-all path (``moe_dispatch="ep"``) is
REJECTED: it would nest a manual shard_map over (data, expert) inside
the pipeline's manual region over (pipe, data) — ``data`` cannot be
manual twice. pp_forward therefore applies blocks with ``mesh=None``,
and a "ep"-dispatch config raises inside DecoderBlock; use capacity
dispatch under PP (same math, GSPMD-sharded experts).

Cites: reference src/forde/model.py:202-294 for the block/embedding
semantics being pipelined (unchanged here, only re-scheduled).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax.sharding import Mesh, PartitionSpec as P

from forde_tpu.core.mesh import AXIS_PIPE


def _stage_apply(cfg, bp_one_layer, stats_zero, x, streams):
    """Apply ONE decoder block functionally from an extracted param slice."""
    from forde_tpu.models.decoder_lm import DecoderBlock

    variables = {"params": bp_one_layer}
    if stats_zero is not None:
        variables["stats_buffer"] = stats_zero
    (y, new_streams, aux), upd = DecoderBlock(config=cfg, mesh=None).apply(
        variables, x, streams, None, True, False, mutable=["stats_buffer"]
    )
    delta = upd.get("stats_buffer", None) if stats_zero is not None else None
    return y, new_streams, aux, delta


def pp_forward(
    cfg,
    variables,
    input_ids: jnp.ndarray,
    mesh: Mesh,
    num_microbatches: int,
) -> Tuple[jnp.ndarray, jnp.ndarray, Optional[dict]]:
    """Pipelined FORDEDecoderLM forward.

    Returns ``(logits_f32, aux_mean, stats_delta)`` where ``stats_delta``
    is the (L,)-stacked per-forward stats contribution for the
    ``layers/block`` subtree (None when the model collects no stats).
    Embeddings / stream init / final norm / lm_head run replicated (they
    are a few % of FLOPs); only the L blocks are pipelined.
    """
    assert cfg.scan_layers, "pipeline parallelism requires scan_layers=True"
    S = mesh.shape[AXIS_PIPE]
    L = cfg.num_layers
    assert L % S == 0, f"pipe axis {S} must divide num_layers {L}"
    M = num_microbatches
    b, s = input_ids.shape
    assert b % M == 0, f"num_microbatches {M} must divide batch {b}"
    mb = b // M
    dtype = cfg.dtypes.compute

    params = variables["params"]
    stats_full = variables.get("stats_buffer", {})

    # ---- replicated prologue (same modules/scopes as FORDEDecoderLM) ----
    x = nn.Embed(
        num_embeddings=cfg.vocab_size, features=cfg.d_model, dtype=dtype
    ).apply({"params": params["token_embed"]}, input_ids)
    pos = nn.Embed(
        num_embeddings=cfg.max_seq_len, features=cfg.d_model, dtype=dtype
    ).apply({"params": params["pos_embed"]}, jnp.arange(s)[None, :])
    x = x + pos

    use_mhc = cfg.use_hyper_connections
    if use_mhc:
        from forde_tpu.nn.hyper_connections import HyperConnectionStream

        streams = HyperConnectionStream(
            num_streams=cfg.num_streams, d_model=cfg.d_model, dtype=dtype
        ).apply({"params": params["initial_streams"]}, x)

    # ---- pipelined middle ----
    block_params = params["layers"]["block"]  # (L, ...) leaves
    stats_tpl = stats_full.get("layers", {}).get("block", None)
    has_stats = stats_tpl is not None and jax.tree.leaves(stats_tpl)

    x_mb = x.reshape(M, mb, s, cfg.d_model)
    if use_mhc:
        str_mb = streams.reshape(M, mb, s, cfg.num_streams, cfg.d_model)
    T = M + S - 1

    pspec = jax.tree.map(lambda _: P(AXIS_PIPE), block_params)
    stats_spec = (
        jax.tree.map(lambda _: P(AXIS_PIPE), stats_tpl) if has_stats else P()
    )
    # compose with DP: shard the per-microbatch example dim over 'data'
    from forde_tpu.core.mesh import AXIS_DATA

    data_ax = AXIS_DATA if mesh.shape.get(AXIS_DATA, 1) > 1 else None
    if data_ax:
        assert mb % mesh.shape[AXIS_DATA] == 0, (
            f"data axis {mesh.shape[AXIS_DATA]} must divide "
            f"microbatch size {mb}"
        )
    bspec = P(None, data_ax)

    manual = {AXIS_PIPE} | ({data_ax} if data_ax else set())

    def _vary(t):
        """Mark values as varying over every manual axis (JAX's
        varying-manual-axes type system: replicated inputs and fresh
        zeros are invariant until explicitly pvary'd, and the scan
        carry/ppermute/psum plumbing below requires consistent types)."""
        return jax.tree.map(
            lambda a: jax.lax.pcast(
                a,
                tuple(ax for ax in sorted(manual)
                      if ax not in jax.typeof(a).vma),
                to="varying",
            ),
            t,
        )

    def stage_program(bp_local, stats_local, x_mb, str_mb):
        stage = jax.lax.axis_index(AXIS_PIPE)
        mb = x_mb.shape[1]  # local (data-sharded) microbatch size
        x_mb = _vary(x_mb)
        if use_mhc:
            str_mb = _vary(str_mb)
        bp_local = _vary(bp_local)
        if has_stats:
            stats_local = _vary(stats_local)
        # per-layer zero template (stats deltas start from zero each tick)
        stats_zero = (
            jax.tree.map(lambda a: jnp.zeros_like(a[0]), stats_local)
            if has_stats
            else None
        )

        def layer_scan(carry, bp_one):
            xx, ss = carry
            y, new_ss, aux, delta = _stage_apply(
                cfg, bp_one, stats_zero, xx, ss
            )
            return (y, new_ss), (aux, delta)

        def tick(carry, t):
            recv_x, recv_str, out, stats_acc, aux_acc = carry
            m_in = jnp.clip(t, 0, M - 1)
            cur_x = jnp.where(stage == 0, x_mb[m_in], recv_x)
            cur_str = (
                jnp.where(stage == 0, str_mb[m_in], recv_str)
                if use_mhc
                else None
            )
            active = (t - stage >= 0) & (t - stage < M)

            (y, y_str), (auxes, deltas) = jax.lax.scan(
                layer_scan, (cur_x, cur_str), bp_local
            )

            aux_acc = aux_acc + jnp.where(active, jnp.sum(auxes), 0.0)
            if has_stats:
                stats_acc = jax.tree.map(
                    lambda acc, d: acc + jnp.where(active, d, 0),
                    stats_acc,
                    deltas,
                )

            # stage S-1 emits microbatch t-(S-1)
            m_out = jnp.clip(t - (S - 1), 0, M - 1)
            payload = y_str if use_mhc else y
            emit = (stage == S - 1) & (t - (S - 1) >= 0) & (t - (S - 1) < M)
            written = jax.lax.dynamic_update_index_in_dim(
                out, payload.astype(out.dtype), m_out, axis=0
            )
            out = jnp.where(emit, written, out)

            # shift activations one stage down the ring
            perm = [(i, (i + 1) % S) for i in range(S)]
            next_x = jax.lax.ppermute(y, AXIS_PIPE, perm)
            next_str = (
                jax.lax.ppermute(y_str, AXIS_PIPE, perm) if use_mhc else None
            )
            return (next_x, next_str, out, stats_acc, aux_acc), None

        out0 = _vary(jnp.zeros(
            (M, mb, s, cfg.num_streams, cfg.d_model)
            if use_mhc
            else (M, mb, s, cfg.d_model),
            dtype,
        ))
        stats_acc0 = (
            jax.tree.map(jnp.zeros_like, stats_local)
            if has_stats
            else _vary(jnp.zeros(()))
        )
        carry0 = (
            _vary(jnp.zeros((mb, s, cfg.d_model), x_mb.dtype)),
            _vary(jnp.zeros(
                (mb, s, cfg.num_streams, cfg.d_model), x_mb.dtype
            ))
            if use_mhc
            else None,
            out0,
            stats_acc0,
            _vary(jnp.zeros(())),
        )
        (_, _, out, stats_acc, aux_acc), _ = jax.lax.scan(
            tick, carry0, jnp.arange(T)
        )
        # only stage S-1's buffer is non-zero; replicate it everywhere
        out = jax.lax.psum(out, AXIS_PIPE)
        aux_acc = jax.lax.psum(aux_acc, AXIS_PIPE)
        if data_ax:
            # DP composition: aux and stats are shard-local means over
            # the local examples — average them over 'data' so the
            # returned values are GLOBAL (equal shard sizes; previously,
            # with vma checking off, the per-shard values were silently
            # treated as replicated).
            dsize = mesh.shape[data_ax]
            aux_acc = jax.lax.psum(aux_acc, data_ax) / dsize
            if has_stats:
                stats_acc = jax.tree.map(
                    lambda a: jax.lax.psum(a, data_ax) / dsize, stats_acc
                )
        if not has_stats:
            stats_acc = jnp.zeros(())  # fresh invariant dummy (unused)
        return out, stats_acc, aux_acc

    # Manual only over the pipeline (and data) axes; every other mesh
    # axis stays AUTOMATIC inside the stage program, so GSPMD shardings
    # keep propagating there — in particular a ``model`` axis gives
    # Megatron tensor parallelism INSIDE each pipeline stage (the
    # data x model x pipe 3-axis mesh), and an ``expert`` axis shards the
    # (L, E, ...) stacked expert bank of the capacity dispatch (PP x EP
    # via GSPMD — the shard_map a2a EP path cannot nest here, see module
    # docstring).
    out, stats_delta, aux_total = jax.shard_map(
        stage_program,
        mesh=mesh,
        in_specs=(pspec, stats_spec, bspec, bspec if use_mhc else P()),
        out_specs=(bspec, stats_spec, P()),
        axis_names=frozenset(manual),
    )(
        block_params,
        stats_tpl if has_stats else jnp.zeros(()),
        x_mb,
        str_mb if use_mhc else jnp.zeros(()),
    )

    # ---- replicated epilogue ----
    if use_mhc:
        from forde_tpu.nn.hyper_connections import StreamCollapser

        final = out.reshape(b, s, cfg.num_streams, cfg.d_model)
        x = StreamCollapser(
            d_model=cfg.d_model, collapse_method="weighted_sum", dtype=dtype
        ).apply({"params": params["stream_collapser"]}, final)
    else:
        x = out.reshape(b, s, cfg.d_model)
    x = nn.LayerNorm(dtype=dtype).apply({"params": params["final_norm"]}, x)
    logits = nn.Dense(cfg.vocab_size, dtype=dtype).apply(
        {"params": params["lm_head"]}, x
    )
    aux_mean = aux_total / M
    if has_stats:
        # Decoder stats are per-forward MEANS (expert_usage adds
        # router_probs.mean over batch+tokens once per forward,
        # nn/moe.py:237-239), so the pipeline's per-microbatch deltas
        # average — with equal microbatches this equals one full-batch
        # forward's delta exactly. step_count deltas are zeroed here;
        # merge_stats advances the counter by 1 per optimizer step.
        def _norm(path, d):
            name = str(getattr(path[-1], "key", ""))
            if name == "step_count":
                return jnp.zeros_like(d)
            return d / M

        stats_delta = jax.tree_util.tree_map_with_path(_norm, stats_delta)
    return (
        logits.astype(jnp.float32),
        aux_mean,
        stats_delta if has_stats else None,
    )


def merge_stats(stats_full: dict, stats_delta, step_increment: int = 1):
    """Fold a pp_forward stats delta back into the full stats_buffer.

    Usage sums accumulate; ``step_count`` leaves advance by
    ``step_increment`` (1 per optimizer step — microbatches are NOT
    steps, so the slow loop's usage/step_count normalization matches the
    unpipelined trainer exactly)."""
    if stats_delta is None or not stats_full:
        return stats_full

    def leaf_name(path):
        return str(getattr(path[-1], "key", getattr(path[-1], "name", "")))

    block = stats_full["layers"]["block"]
    merged = jax.tree_util.tree_map_with_path(
        lambda path, old, d: (
            old + step_increment if leaf_name(path) == "step_count"
            else old + d
        ),
        block,
        stats_delta,
    )
    out = dict(stats_full)
    layers = dict(stats_full["layers"])
    layers["block"] = merged
    out["layers"] = layers
    return out


def make_pp_train_step(cfg, mesh: Mesh, num_microbatches: int,
                       aux_loss_weight: float = 1.0):
    """Jitted optimizer step over the pipelined forward.

    Mirrors train/step.train_step (donated state, fp32 loss, same metric
    keys) with the L blocks executed by the GPipe schedule and the FORDE
    stats threaded back via merge_stats (step_count +1 per step)."""
    import functools

    import optax

    def loss_fn(params, stats, input_ids):
        logits, aux, delta = pp_forward(
            cfg, {"params": params, "stats_buffer": stats}, input_ids,
            mesh, num_microbatches,
        )
        lm = optax.softmax_cross_entropy_with_integer_labels(
            logits[:, :-1].astype(jnp.float32), input_ids[:, 1:]
        ).mean()
        return lm + aux_loss_weight * aux, (lm, aux, delta)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def step(state, batch):
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (total, (lm, aux, delta)), grads = grad_fn(
            state.params, state.stats_buffer, batch["input_ids"]
        )
        new_state = state.apply_gradients(grads=grads)
        new_state = new_state.replace(
            stats_buffer=merge_stats(dict(state.stats_buffer), delta)
        )
        metrics = {
            "loss/total": total,
            "loss/lm": lm,
            "loss/aux": aux,
            "training/grad_norm": optax.global_norm(grads),
        }
        return new_state, metrics

    return step
