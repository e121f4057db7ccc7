"""Sampling tests: shapes, prompt preservation, greedy determinism,
causal consistency (generated prefix unaffected by later steps)."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from forde_tpu.models.decoder_lm import FORDEDecoderLM
from forde_tpu.models.generate import generate
from tests.test_decoder_model import tiny_config


def _model_and_vars():
    cfg = tiny_config()
    model = FORDEDecoderLM(config=cfg)
    ids = jnp.ones((1, 8), jnp.int32)
    variables = model.init(jax.random.PRNGKey(0), ids)
    return cfg, model, variables


def test_generate_shapes_and_prompt_preserved():
    cfg, model, variables = _model_and_vars()
    prompt = jnp.asarray(
        np.random.RandomState(0).randint(0, cfg.vocab_size, (2, 5)), jnp.int32
    )
    out = generate(
        model, variables, prompt, jax.random.PRNGKey(1), max_new_tokens=6
    )
    assert out.shape == (2, 11)
    np.testing.assert_array_equal(np.asarray(out[:, :5]), np.asarray(prompt))
    assert int(out.max()) < cfg.vocab_size and int(out.min()) >= 0


def test_greedy_is_deterministic():
    cfg, model, variables = _model_and_vars()
    prompt = jnp.ones((1, 4), jnp.int32)
    a = generate(
        model, variables, prompt, jax.random.PRNGKey(1), max_new_tokens=5,
        temperature=0,
    )
    b = generate(
        model, variables, prompt, jax.random.PRNGKey(2), max_new_tokens=5,
        temperature=0,
    )
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.slow
def test_greedy_prefix_consistency():
    """Greedy decoding N then N+3 tokens agrees on the first N — i.e. the
    padded buffer's future garbage never leaks into earlier steps."""
    cfg, model, variables = _model_and_vars()
    prompt = jnp.ones((1, 4), jnp.int32)
    short = generate(
        model, variables, prompt, jax.random.PRNGKey(0), max_new_tokens=4,
        temperature=0,
    )
    long = generate(
        model, variables, prompt, jax.random.PRNGKey(0), max_new_tokens=7,
        temperature=0,
    )
    np.testing.assert_array_equal(
        np.asarray(short[:, :8]), np.asarray(long[:, :8])
    )


@pytest.mark.slow
def test_top_k_restricts_support():
    cfg, model, variables = _model_and_vars()
    prompt = jnp.ones((1, 4), jnp.int32)
    # top_k=1 == greedy regardless of temperature
    g = generate(
        model, variables, prompt, jax.random.PRNGKey(3), max_new_tokens=5,
        temperature=0,
    )
    k1 = generate(
        model, variables, prompt, jax.random.PRNGKey(7), max_new_tokens=5,
        temperature=2.0, top_k=1,
    )
    np.testing.assert_array_equal(np.asarray(g), np.asarray(k1))


@pytest.mark.slow
def test_top_p_restricts_support():
    """Tiny top_p == greedy; _sample's nucleus keeps the crossing token."""
    from forde_tpu.models.generate import _sample

    cfg, model, variables = _model_and_vars()
    prompt = jnp.ones((1, 4), jnp.int32)
    g = generate(
        model, variables, prompt, jax.random.PRNGKey(3), max_new_tokens=5,
        temperature=0,
    )
    # top_p -> 0 keeps only the argmax token (the crossing token rule)
    p0 = generate(
        model, variables, prompt, jax.random.PRNGKey(11), max_new_tokens=5,
        temperature=2.0, top_p=1e-6,
    )
    np.testing.assert_array_equal(np.asarray(g), np.asarray(p0))

    # direct unit check: mass {0.5, 0.3, 0.2}, top_p=0.6 keeps {0, 1}
    logits = jnp.log(jnp.array([[0.5, 0.3, 0.2]], jnp.float32))
    draws = [
        int(_sample(logits, jax.random.PRNGKey(s), 1.0, None, 0.6)[0])
        for s in range(64)
    ]
    assert set(draws) <= {0, 1} and len(set(draws)) == 2


@pytest.mark.slow
def test_cached_generation_matches_full_recompute():
    """KV-cache greedy decode == full-recompute greedy decode (no-NSA cfg)."""
    from forde_tpu.models.generate import generate_cached

    cfg = tiny_config(use_sparse_attention=False)
    model = FORDEDecoderLM(config=cfg)
    variables = model.init(jax.random.PRNGKey(0), jnp.ones((1, 8), jnp.int32))
    prompt = jnp.asarray(
        np.random.RandomState(3).randint(0, cfg.vocab_size, (2, 6)), jnp.int32
    )
    full = generate(
        model, variables, prompt, jax.random.PRNGKey(0), max_new_tokens=8,
        temperature=0,
    )
    cached = generate_cached(
        model, variables, prompt, jax.random.PRNGKey(0), max_new_tokens=8,
        temperature=0,
    )
    np.testing.assert_array_equal(np.asarray(full), np.asarray(cached))


@pytest.mark.slow
def test_nsa_cached_decode_matches_clean_prefix_forwards():
    """Single-layer NSA decoder: streaming decode == a clean full forward
    at every prefix length (all three branches + their length gates
    exercised: window 16, ratio 4, top_k 8, sequence 30).

    Single-layer because NSA's reference semantics are NOT
    streaming-consistent in depth: the branch gates switch on the TOTAL
    sequence length and the top-k selection is global, so in a clean
    forward at length L every position's output (not just the last) is
    computed under length-L gates/selection — while streaming decode
    computed position t under its historical length t+1. The LAST
    position of a clean forward always matches streaming decode (this
    test); deeper layers see the historical intermediate values, which
    is the correct autoregressive serving semantics (see
    test_nsa_multilayer_decode_matches_below_window for the regime where
    both coincide at depth)."""
    cfg = tiny_config(max_seq_len=32, num_layers=1)
    model = FORDEDecoderLM(config=cfg)
    variables = model.init(jax.random.PRNGKey(0), jnp.ones((1, 8), jnp.int32))
    ids = jnp.asarray(
        np.random.RandomState(11).randint(0, cfg.vocab_size, (2, 30)),
        jnp.int32,
    )

    model_vars = {
        "params": variables["params"],
        "stats_buffer": variables["stats_buffer"],
    }
    cache = model.init(
        jax.random.PRNGKey(0), jnp.zeros((2, 1), jnp.int32), None, True, True
    )["cache"]
    for t in range(ids.shape[1]):
        (dec_logits, _), upd = model.apply(
            {**model_vars, "cache": cache},
            ids[:, t : t + 1],
            None,
            True,
            True,
            mutable=["cache", "stats_buffer"],
        )
        cache = upd["cache"]
        (clean_logits, _), _ = model.apply(
            variables, ids[:, : t + 1], mutable=["stats_buffer"]
        )
        np.testing.assert_allclose(
            np.asarray(dec_logits[:, 0]),
            np.asarray(clean_logits[:, -1]),
            atol=2e-4,
            rtol=2e-4,
            err_msg=f"prefix length {t + 1}",
        )


@pytest.mark.slow
def test_nsa_multilayer_decode_matches_below_window():
    """Multi-layer NSA decode == clean forwards while seq_len <= window
    (gates closed everywhere -> streaming and teacher-forced semantics
    coincide at every depth)."""
    cfg = tiny_config(max_seq_len=32)
    model = FORDEDecoderLM(config=cfg)
    variables = model.init(jax.random.PRNGKey(0), jnp.ones((1, 8), jnp.int32))
    ids = jnp.asarray(
        np.random.RandomState(7).randint(0, cfg.vocab_size, (2, 16)), jnp.int32
    )
    model_vars = {
        "params": variables["params"],
        "stats_buffer": variables["stats_buffer"],
    }
    cache = model.init(
        jax.random.PRNGKey(0), jnp.zeros((2, 1), jnp.int32), None, True, True
    )["cache"]
    for t in range(16):  # = window_size
        (dec_logits, _), upd = model.apply(
            {**model_vars, "cache": cache},
            ids[:, t : t + 1], None, True, True,
            mutable=["cache", "stats_buffer"],
        )
        cache = upd["cache"]
        (clean_logits, _), _ = model.apply(
            variables, ids[:, : t + 1], mutable=["stats_buffer"]
        )
        np.testing.assert_allclose(
            np.asarray(dec_logits[:, 0]),
            np.asarray(clean_logits[:, -1]),
            atol=2e-4, rtol=2e-4, err_msg=f"prefix length {t + 1}",
        )


@pytest.mark.slow
def test_nsa_generate_cached_runs_and_respects_prompt():
    from forde_tpu.models.generate import generate_cached

    cfg = tiny_config(max_seq_len=32)
    model = FORDEDecoderLM(config=cfg)
    variables = model.init(jax.random.PRNGKey(0), jnp.ones((1, 8), jnp.int32))
    prompt = jnp.asarray(
        np.random.RandomState(5).randint(0, cfg.vocab_size, (2, 6)), jnp.int32
    )
    out = generate_cached(
        model, variables, prompt, jax.random.PRNGKey(0), max_new_tokens=8,
        temperature=0,
    )
    assert out.shape == (2, 14)
    np.testing.assert_array_equal(np.asarray(out[:, :6]), np.asarray(prompt))
    assert (np.asarray(out[:, 6:]) >= 0).all()


@pytest.mark.slow
def test_nsa_prefill_cache_matches_streaming_below_window():
    """nsa_prefill (one teacher-forced forward) must build EXACTLY the
    cache that token-by-token streaming builds, whenever the prompt fits
    inside the local window (the regime where teacher-forced and
    streaming semantics coincide at every depth). Exercises completed
    pools (12 tokens / ratio 4 = 3 pools), the chunk-sum tail, top-k
    buffers, and every counter."""
    import flax
    from forde_tpu.models.generate import nsa_prefill

    cfg = tiny_config(max_seq_len=32)
    model = FORDEDecoderLM(config=cfg)
    variables = model.init(jax.random.PRNGKey(0), jnp.ones((1, 8), jnp.int32))
    ids = jnp.asarray(
        np.random.RandomState(3).randint(0, cfg.vocab_size, (2, 12)), jnp.int32
    )

    cache_p, logits_p = nsa_prefill(model, variables, ids)

    model_vars = {
        "params": variables["params"],
        "stats_buffer": variables["stats_buffer"],
    }
    cache_s = model.init(
        jax.random.PRNGKey(0), jnp.zeros((2, 1), jnp.int32), None, True, True
    )["cache"]
    for t in range(12):
        (logits_s, _), upd = model.apply(
            {**model_vars, "cache": cache_s},
            ids[:, t : t + 1], None, True, True,
            mutable=["cache", "stats_buffer"],
        )
        cache_s = upd["cache"]

    np.testing.assert_allclose(
        np.asarray(logits_p), np.asarray(logits_s[:, 0]), atol=2e-4, rtol=2e-4
    )
    flat_p = flax.traverse_util.flatten_dict(flax.core.unfreeze(cache_p))
    flat_s = flax.traverse_util.flatten_dict(flax.core.unfreeze(cache_s))
    assert set(flat_p) == set(flat_s)
    for k in flat_p:
        np.testing.assert_allclose(
            np.asarray(flat_p[k], np.float32),
            np.asarray(flat_s[k], np.float32),
            atol=2e-4, rtol=2e-3, err_msg="/".join(map(str, k)),
        )


@pytest.mark.slow
def test_beam_search_beats_or_matches_greedy_and_respects_prompt():
    """beam_size=1 == greedy cached decode; beam_size=4's best-path score
    must be >= the greedy path's score under the same model."""
    from forde_tpu.models.generate import generate_beam, generate_cached

    cfg = tiny_config(max_seq_len=32, use_sparse_attention=False)
    model = FORDEDecoderLM(config=cfg)
    variables = model.init(jax.random.PRNGKey(0), jnp.ones((1, 8), jnp.int32))
    prompt = jnp.asarray(
        np.random.RandomState(9).randint(0, cfg.vocab_size, (2, 5)), jnp.int32
    )
    greedy = generate_cached(
        model, variables, prompt, jax.random.PRNGKey(0), max_new_tokens=6,
        temperature=0,
    )
    beam1 = generate_beam(model, variables, prompt, max_new_tokens=6,
                          beam_size=1)
    np.testing.assert_array_equal(np.asarray(beam1), np.asarray(greedy))

    beam4 = generate_beam(model, variables, prompt, max_new_tokens=6,
                          beam_size=4)
    assert beam4.shape == (2, 11)
    np.testing.assert_array_equal(np.asarray(beam4[:, :5]), np.asarray(prompt))

    def seq_logprob(ids):
        (logits, _), _ = model.apply(
            variables, ids[:, :-1], mutable=["stats_buffer"]
        )
        lp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        tgt = ids[:, 1:]
        tok_lp = jnp.take_along_axis(lp, tgt[..., None], axis=-1)[..., 0]
        return tok_lp[:, 4:].sum(axis=-1)  # only generated positions

    s_greedy = np.asarray(seq_logprob(greedy))
    s_beam = np.asarray(seq_logprob(beam4))
    assert (s_beam >= s_greedy - 1e-4).all(), (s_beam, s_greedy)


@pytest.mark.slow
def test_beam_search_nsa_config_runs():
    from forde_tpu.models.generate import generate_beam

    cfg = tiny_config(max_seq_len=32)  # NSA on
    model = FORDEDecoderLM(config=cfg)
    variables = model.init(jax.random.PRNGKey(0), jnp.ones((1, 8), jnp.int32))
    prompt = jnp.asarray(
        np.random.RandomState(4).randint(0, cfg.vocab_size, (1, 4)), jnp.int32
    )
    out = generate_beam(model, variables, prompt, max_new_tokens=4, beam_size=2)
    assert out.shape == (1, 8)
    np.testing.assert_array_equal(np.asarray(out[:, :4]), np.asarray(prompt))


@pytest.mark.slow
def test_beam_search_scan_layers():
    """Beam search over the (L,)-stacked scan cache: beam_size=1 must
    reproduce greedy cached decode token-exactly; beam_size=3 must score
    >= greedy. Covers both layouts' cache tile/reorder (batch axis 1
    under nn.scan)."""
    from forde_tpu.models.generate import generate_beam, generate_cached

    for nsa in (False, True):
        cfg = tiny_config(
            max_seq_len=32, scan_layers=True, use_sparse_attention=nsa
        )
        model = FORDEDecoderLM(config=cfg)
        variables = model.init(
            jax.random.PRNGKey(0), jnp.ones((1, 8), jnp.int32)
        )
        prompt = jnp.asarray(
            np.random.RandomState(11).randint(0, cfg.vocab_size, (2, 5)),
            jnp.int32,
        )
        greedy = generate_cached(
            model, variables, prompt, jax.random.PRNGKey(0), max_new_tokens=6,
            temperature=0,
        )
        beam1 = generate_beam(
            model, variables, prompt, max_new_tokens=6, beam_size=1
        )
        np.testing.assert_array_equal(
            np.asarray(beam1), np.asarray(greedy), err_msg=f"nsa={nsa}"
        )
        beam3 = generate_beam(
            model, variables, prompt, max_new_tokens=6, beam_size=3
        )
        assert beam3.shape == (2, 11)
        np.testing.assert_array_equal(
            np.asarray(beam3[:, :5]), np.asarray(prompt)
        )


@pytest.mark.slow
def test_beam_search_eos_freezes_finished_beams():
    """With eos_id set, every position after a beam's first EOS is pad_id,
    and length_penalty normalizes by the per-beam generated length."""
    from forde_tpu.models.generate import generate_beam

    cfg = tiny_config(max_seq_len=32, use_sparse_attention=False)
    model = FORDEDecoderLM(config=cfg)
    variables = model.init(jax.random.PRNGKey(0), jnp.ones((1, 8), jnp.int32))
    prompt = jnp.asarray(
        np.random.RandomState(3).randint(1, cfg.vocab_size, (2, 4)), jnp.int32
    )
    # pick the eos token from an unconstrained run so it actually fires
    free = np.asarray(
        generate_beam(model, variables, prompt, max_new_tokens=6, beam_size=2)
    )
    eos = int(free[0, 4])  # first generated token of row 0's best beam
    out = np.asarray(
        generate_beam(
            model, variables, prompt, max_new_tokens=6, beam_size=2,
            eos_id=eos, pad_id=0, length_penalty=0.5,
        )
    )
    assert out.shape == (2, 10)
    for row in out:
        gen = row[4:]
        hits = np.nonzero(gen == eos)[0]
        if hits.size:
            assert (gen[hits[0] + 1:] == 0).all(), row


def test_topk_insert_matches_global_top_k():
    """The running top-k set (nn/attention.topk_insert, O(k) decode
    cache) keeps exactly the same source positions as lax.top_k over the
    full score prefix, at every stream length — including the underfull
    regime (t < k) and a k/v payload that tracks the kept set."""
    from forde_tpu.nn.attention import topk_insert

    b, h, d, k, t_max = 3, 2, 4, 5, 23
    rng = np.random.RandomState(7)
    scores = jnp.asarray(rng.randn(b, t_max), jnp.float32)
    ks = jnp.asarray(rng.randn(b, h, t_max, d), jnp.float32)
    vs = jnp.asarray(rng.randn(b, h, t_max, d), jnp.float32)

    state = (
        jnp.full((b, k), -jnp.inf, jnp.float32),
        jnp.full((b, k), t_max, jnp.int32),
        jnp.zeros((b, h, k, d), jnp.float32),
        jnp.zeros((b, h, k, d), jnp.float32),
    )
    for t in range(t_max):
        state = topk_insert(
            state, scores[:, t], ks[:, :, t : t + 1], vs[:, :, t : t + 1], t
        )
        sc, ix, kk, vv = state
        _, want = jax.lax.top_k(scores[:, : t + 1], min(k, t + 1))
        for row in range(b):
            kept = np.asarray(ix[row])
            kept = np.sort(kept[kept < t_max])  # drop empty slots
            np.testing.assert_array_equal(kept, np.sort(np.asarray(want[row])))
            # payload rows must be the k/v of the kept positions
            for slot, src in enumerate(np.asarray(ix[row])):
                if src < t_max:
                    np.testing.assert_array_equal(
                        np.asarray(kk[row, :, slot]), np.asarray(ks[row, :, src])
                    )
                    np.testing.assert_array_equal(
                        np.asarray(vv[row, :, slot]), np.asarray(vs[row, :, src])
                    )


@pytest.mark.slow
def test_generate_cached_data_parallel_serving():
    """Batched serving scales over the mesh with zero code: a prompt
    batch sharded over 'data' (replicated params) decodes token-exactly
    vs single-device — GSPMD partitions the whole cached-decode program,
    KV caches included."""
    from forde_tpu.core import mesh as mesh_lib
    from forde_tpu.models.generate import generate_cached

    cfg = tiny_config(max_seq_len=64, scan_layers=True)
    model = FORDEDecoderLM(config=cfg)
    variables = dict(
        model.init(jax.random.PRNGKey(0), jnp.ones((1, 8), jnp.int32))
    )
    prompt = jnp.asarray(
        np.random.RandomState(0).randint(1, cfg.vocab_size, (4, 6)), jnp.int32
    )
    ref = np.asarray(
        generate_cached(
            model, variables, prompt, jax.random.PRNGKey(1),
            max_new_tokens=5, temperature=0.0,
        )
    )
    mesh = mesh_lib.create_mesh(data=4, devices=jax.devices()[:4])
    out = np.asarray(
        generate_cached(
            model,
            jax.device_put(variables, mesh_lib.replicated(mesh)),
            jax.device_put(prompt, mesh_lib.batch_sharding(mesh)),
            jax.random.PRNGKey(1),
            max_new_tokens=5,
            temperature=0.0,
        )
    )
    np.testing.assert_array_equal(ref, out)


@pytest.mark.slow
def test_generate_cached_tensor_parallel_serving():
    """Model-parallel serving: params Megatron-sharded over 'model'
    (serve.py --tensor_parallelism) decode token-exactly vs single
    device — the capability that serves models too big for one chip."""
    from forde_tpu.core import mesh as mesh_lib
    from forde_tpu.models.generate import generate_cached
    from forde_tpu.train.state import _leaf_sharding

    cfg = tiny_config(max_seq_len=64, scan_layers=True)
    model = FORDEDecoderLM(config=cfg)
    variables = dict(
        model.init(jax.random.PRNGKey(0), jnp.ones((1, 8), jnp.int32))
    )
    prompt = jnp.asarray(
        np.random.RandomState(0).randint(1, cfg.vocab_size, (2, 6)), jnp.int32
    )
    ref = np.asarray(
        generate_cached(
            model, variables, prompt, jax.random.PRNGKey(1),
            max_new_tokens=5, temperature=0.0,
        )
    )
    mesh = mesh_lib.create_mesh(data=1, model=2, devices=jax.devices()[:2])
    sh_vars = jax.tree_util.tree_map_with_path(
        lambda p, leaf: jax.device_put(leaf, _leaf_sharding(p, leaf, mesh)),
        variables,
    )
    n_sharded = sum(
        1
        for leaf in jax.tree.leaves(sh_vars)
        if hasattr(leaf, "sharding")
        and "model" in jax.tree.leaves(tuple(leaf.sharding.spec))
    )
    assert n_sharded >= 10, n_sharded
    out = np.asarray(
        generate_cached(
            model, sh_vars, prompt, jax.random.PRNGKey(1),
            max_new_tokens=5, temperature=0.0,
        )
    )
    np.testing.assert_array_equal(ref, out)


def _ragged_fixture(scan_layers=False):
    from forde_tpu.models.generate import generate_cached, generate_ragged

    cfg = tiny_config(
        use_sparse_attention=False, max_seq_len=64, scan_layers=scan_layers
    )
    model = FORDEDecoderLM(config=cfg)
    variables = model.init(jax.random.PRNGKey(0), jnp.ones((1, 8), jnp.int32))
    rng = np.random.RandomState(7)
    prompts = [
        rng.randint(1, cfg.vocab_size, (n,)).tolist() for n in (5, 2, 7, 2)
    ]
    lens = np.array([len(p) for p in prompts], np.int32)
    pmax = int(lens.max())
    padded = np.zeros((len(prompts), pmax), np.int32)
    for i, p in enumerate(prompts):
        padded[i, : len(p)] = p
    return cfg, model, variables, prompts, padded, lens, (
        generate_cached, generate_ragged,
    )


@pytest.mark.slow
def test_generate_ragged_matches_per_row_cached():
    """Ragged mixed-length batch decode (one program) is token-exact vs
    generate_cached run per row — prefill pad garbage never leaks into
    any row's continuation. Both layer layouts."""
    for scan in (False, True):
        cfg, model, variables, prompts, padded, lens, (gc, gr) = (
            _ragged_fixture(scan)
        )
        new = 6
        out = np.asarray(gr(
            model, variables, jnp.asarray(padded), jnp.asarray(lens),
            jax.random.PRNGKey(0), max_new_tokens=new, temperature=0,
        ))
        assert out.shape == (len(prompts), padded.shape[1] + new)
        for i, p in enumerate(prompts):
            single = np.asarray(gc(
                model, variables, jnp.asarray([p], jnp.int32),
                jax.random.PRNGKey(0), max_new_tokens=new, temperature=0,
            ))[0]
            row = out[i, : len(p) + new]
            np.testing.assert_array_equal(row, single, err_msg=(
                f"row {i} (len {len(p)}, scan_layers={scan})"
            ))
            # slack past the row's end is pad
            assert (out[i, len(p) + new:] == 0).all()


@pytest.mark.slow
def test_generate_ragged_eos_pads_tail():
    """A row that emits eos_id stops — every later position is pad_id —
    and other rows keep generating (per-row done tracking)."""
    cfg, model, variables, prompts, padded, lens, (gc, gr) = (
        _ragged_fixture()
    )
    new = 6
    # find what row 0 greedily emits first, then declare THAT token eos
    probe = np.asarray(gr(
        model, variables, jnp.asarray(padded), jnp.asarray(lens),
        jax.random.PRNGKey(0), max_new_tokens=new, temperature=0,
    ))
    eos = int(probe[0, lens[0]])
    out = np.asarray(gr(
        model, variables, jnp.asarray(padded), jnp.asarray(lens),
        jax.random.PRNGKey(0), max_new_tokens=new, temperature=0,
        eos_id=eos, pad_id=0,
    ))
    assert (out[0, lens[0] + 1: lens[0] + new] == 0).all()
    # every row: greedy output matches the eos-free probe up to and
    # including its first eos, and is pad after (rows with no eos in the
    # probe match it fully — done tracking is per-row)
    any_continues = False
    for i in range(len(prompts)):
        gen = probe[i, lens[i]: lens[i] + new]
        hits = np.where(gen == eos)[0]
        cut = int(hits[0]) + 1 if hits.size else new
        np.testing.assert_array_equal(
            out[i, : lens[i] + cut], probe[i, : lens[i] + cut],
            err_msg=f"row {i} diverges before its eos",
        )
        assert (out[i, lens[i] + cut: lens[i] + new] == 0).all(), i
        any_continues |= cut > 1
    assert any_continues, "fixture degenerate: every row stopped at once"


# NSA ragged generation (one padded program for the reference's default
# architecture) is covered by tests/test_nsa_ragged.py.
