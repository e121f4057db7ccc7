"""Serving CLI: random-init smoke and checkpoint round-trip (CPU)."""

import pytest
import sys

# every test here is a whole-CLI / multi-process end-to-end smoke
pytestmark = pytest.mark.slow

import jax
import jax.numpy as jnp
import numpy as np


def test_config_json_roundtrip(tmp_path):
    from forde_tpu.core.config import (
        DTypePolicy,
        config_from_dict,
        config_to_dict,
        create_default_config,
        vit_tiny_config,
    )
    from forde_tpu.train import checkpoint as ckpt_lib

    llm = create_default_config().replace(
        dtypes=DTypePolicy.bf16(), scan_layers=True, moe_dispatch="capacity"
    )
    assert config_from_dict(config_to_dict(llm)) == llm
    de = vit_tiny_config().replace(remat="mlp")
    assert config_from_dict(config_to_dict(de)) == de

    ckpt_lib.save_model_config(
        str(tmp_path), llm, train_meta={"moment_dtype": "bfloat16"}
    )
    assert ckpt_lib.load_model_config(str(tmp_path)) == llm
    assert ckpt_lib.load_train_meta(str(tmp_path)) == {
        "moment_dtype": "bfloat16"
    }
    assert ckpt_lib.load_model_config(str(tmp_path / "nope")) is None


def test_serve_from_checkpoint_needs_no_shape_flags(tmp_path, capsys):
    """Train 2 steps with a checkpoint dir, then serve giving ONLY the
    checkpoint dir — the architecture must come from model_config.json
    (VERDICT r2 #9). The serve CLI's shape defaults deliberately do NOT
    match the trained shape."""
    from forde_tpu import serve
    from forde_tpu.train import loop as train_loop

    ckpt = str(tmp_path / "ckpt")
    args = train_loop.build_parser().parse_args([
        "--use_dummy_data", "--steps_per_epoch", "2", "--num_epochs", "1",
        "--batch_size", "2", "--seq_len", "32",
        "--d_model", "32", "--num_layers", "1", "--num_heads", "2",
        "--num_experts", "2", "--window_size", "8",
        "--slow_loop_interval", "0", "--log_interval", "1",
        "--moment_dtype", "bfloat16",
        "--checkpoint_dir", ckpt,
    ])
    train_loop.train(args)

    serve.main([
        "--checkpoint_dir", ckpt,
        "--prompt_ids", "5,17,20",
        "--max_new_tokens", "3",
        "--temperature", "0",
    ])
    out = capsys.readouterr().out
    assert "model config loaded" in out
    ids = eval(out.split("token ids:")[1].splitlines()[0])
    assert ids[:3] == [5, 17, 20]
    assert len(ids) == 6


def test_serve_main_generates_from_prompt_ids(tmp_path, capsys, monkeypatch):
    from forde_tpu import serve

    serve.main([
        "--prompt_ids", "5,17,20",
        "--max_new_tokens", "4",
        "--temperature", "0",
        "--d_model", "32", "--num_layers", "1", "--num_heads", "2",
        "--num_experts", "2", "--window_size", "8", "--seq_len", "32",
    ])
    out = capsys.readouterr().out
    assert "token ids:" in out
    ids = eval(out.split("token ids:")[1].splitlines()[0])
    assert ids[:3] == [5, 17, 20]
    assert len(ids) == 7


def test_serve_eos_id_stops_and_pads(capsys):
    """--eos_id plumbs through to generate_cached (VERDICT r2 #9: the
    serving CLI must stop at EOS). Greedy decoding from a fixed seed is
    deterministic, so run once without --eos_id, pick the first generated
    token as the "EOS", and re-run: every position after (and including
    nothing before) the first occurrence must be --pad_id."""
    from forde_tpu import serve

    shape = ["--d_model", "32", "--num_layers", "1", "--num_heads", "2",
             "--num_experts", "2", "--window_size", "8", "--seq_len", "32"]
    base = ["--prompt_ids", "5,17,20", "--max_new_tokens", "4",
            "--temperature", "0", *shape]
    serve.main(base)
    free = eval(capsys.readouterr().out.split("token ids:")[1].splitlines()[0])
    eos = free[3]  # first generated token under greedy
    serve.main([*base, "--eos_id", str(eos), "--pad_id", "99"])
    out = eval(capsys.readouterr().out.split("token ids:")[1].splitlines()[0])
    assert out[:3] == [5, 17, 20]
    assert out[3] == eos  # the EOS token itself is kept
    assert out[4:] == [99] * (len(out) - 4)  # everything after is pad


def test_serve_speculative_decoding(tmp_path, capsys):
    """Target + draft checkpoints -> serve --draft_checkpoint_dir decodes
    speculatively; greedy output must equal plain greedy serving."""
    from forde_tpu import serve
    from forde_tpu.train import loop as train_loop

    common = [
        "--use_dummy_data", "--steps_per_epoch", "2", "--num_epochs", "1",
        "--batch_size", "2", "--seq_len", "32", "--no_nsa",
        "--d_model", "32", "--num_heads", "2",
        "--num_experts", "2", "--window_size", "8",
        "--slow_loop_interval", "0", "--log_interval", "1",
        "--plots_dir", "",
    ]
    tgt = str(tmp_path / "tgt")
    drf = str(tmp_path / "drf")
    train_loop.train(train_loop.build_parser().parse_args(
        common + ["--num_layers", "2", "--checkpoint_dir", tgt]))
    train_loop.train(train_loop.build_parser().parse_args(
        common + ["--num_layers", "1", "--checkpoint_dir", drf]))

    serve.main([
        "--checkpoint_dir", tgt,
        "--prompt_ids", "5,17,20", "--max_new_tokens", "4",
        "--temperature", "0",
    ])
    plain = eval(capsys.readouterr().out.split("token ids:")[1].splitlines()[0])

    serve.main([
        "--checkpoint_dir", tgt, "--draft_checkpoint_dir", drf,
        "--gamma", "2",
        "--prompt_ids", "5,17,20", "--max_new_tokens", "4",
        "--temperature", "0",
    ])
    out = capsys.readouterr().out
    assert "speculative" in out
    spec = eval(out.split("token ids:")[1].splitlines()[0])
    assert spec == plain

    # the advertised combo: int8 target + fp draft (smoke; quantization
    # error may legitimately change the greedy chain)
    serve.main([
        "--checkpoint_dir", tgt, "--draft_checkpoint_dir", drf,
        "--gamma", "2", "--quantize", "int8",
        "--prompt_ids", "5,17,20", "--max_new_tokens", "4",
        "--temperature", "0",
    ])
    out = capsys.readouterr().out
    assert "int8 weight-only quantization applied" in out
    qids = eval(out.split("token ids:")[1].splitlines()[0])
    assert qids[:3] == [5, 17, 20] and len(qids) == 7


def test_serve_prompts_file_batch(tmp_path, capsys):
    """Batch serving (NSA config, ragged): the whole mixed-length batch
    decodes in ONE program via the length-aware NSA prefill; results in
    input order; each row must equal the single-prompt greedy output for
    the same prompt."""
    import json

    from forde_tpu import serve

    shape = [
        "--d_model", "32", "--num_layers", "1", "--num_heads", "2",
        "--num_experts", "2", "--window_size", "8", "--seq_len", "32",
    ]
    prompts = ["5,17,20", "9,9", "7,3,11", "2,40"]
    pf = tmp_path / "prompts.txt"
    pf.write_text("\n".join(prompts) + "\n")
    out_file = tmp_path / "out.jsonl"

    serve.main([
        "--prompts_file", str(pf), "--output_file", str(out_file),
        "--max_new_tokens", "3", "--temperature", "0", *shape,
    ])
    out = capsys.readouterr().out
    assert "4 prompts, ragged (1 program)" in out

    rows = [json.loads(ln) for ln in out_file.read_text().splitlines()]
    assert [r["index"] for r in rows] == [0, 1, 2, 3]
    for r, p in zip(rows, prompts):
        want = [int(t) for t in p.split(",")]
        assert r["prompt_ids"] == want
        assert r["output_ids"][: len(want)] == want
        assert len(r["output_ids"]) == len(want) + 3

    # batched rows match single-prompt greedy decoding exactly
    serve.main([
        "--prompt_ids", prompts[2], "--max_new_tokens", "3",
        "--temperature", "0", *shape,
    ])
    single = eval(
        capsys.readouterr().out.split("token ids:")[1].splitlines()[0]
    )
    assert rows[2]["output_ids"] == single


def test_serve_prompts_file_ragged_dense(tmp_path, capsys):
    """Dense config batch serving goes through the ragged single-program
    path; rows must equal single-prompt greedy decoding exactly."""
    import json

    from forde_tpu import serve

    shape = [
        "--d_model", "32", "--num_layers", "1", "--num_heads", "2",
        "--num_experts", "2", "--no_nsa", "--seq_len", "32",
    ]
    prompts = ["5,17,20", "9,9", "7,3,11,8,2"]
    pf = tmp_path / "prompts.txt"
    pf.write_text("\n".join(prompts) + "\n")
    out_file = tmp_path / "out.jsonl"

    serve.main([
        "--prompts_file", str(pf), "--output_file", str(out_file),
        "--max_new_tokens", "3", "--temperature", "0", *shape,
    ])
    out = capsys.readouterr().out
    assert "3 prompts, ragged (1 program)" in out
    rows = [json.loads(ln) for ln in out_file.read_text().splitlines()]
    for r, p in zip(rows, prompts):
        want = [int(t) for t in p.split(",")]
        assert r["output_ids"][: len(want)] == want
        assert len(r["output_ids"]) == len(want) + 3

    serve.main([
        "--prompt_ids", prompts[1], "--max_new_tokens", "3",
        "--temperature", "0", *shape,
    ])
    single = eval(
        capsys.readouterr().out.split("token ids:")[1].splitlines()[0]
    )
    assert rows[1]["output_ids"] == single
