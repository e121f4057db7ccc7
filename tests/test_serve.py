"""Serving CLI: random-init smoke and checkpoint round-trip (CPU)."""

import sys

import jax
import jax.numpy as jnp
import numpy as np


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
