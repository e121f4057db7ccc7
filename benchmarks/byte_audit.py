"""HBM traffic audit for the dual-encoder train step.

Compiles ``clip_train_step`` at a given preset/batch, then walks the
optimized HLO's ENTRY computation: every top-level instruction's operand
and output bytes approximate its HBM reads/writes (post-fusion, each
fusion reads its parameters from HBM and writes its root). Reports the
top instructions by traffic, totals by dtype, and totals by op kind —
the tool behind PERF.md's "cut bytes, not utilization" work.

Usage: python benchmarks/byte_audit.py [vit_b16|tiny] [batch]
"""

from __future__ import annotations

import os
import re
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

DTYPE_BYTES = {
    "f64": 8, "f32": 4, "bf16": 2, "f16": 2, "f8e4m3fn": 1, "f8e5m2": 1,
    "s64": 8, "u64": 8, "s32": 4, "u32": 4, "s16": 2, "u16": 2,
    "s8": 1, "u8": 1, "pred": 1, "c64": 8, "c128": 16,
}

_SHAPE_RE = re.compile(r"(\w+)\[([\d,]*)\]")


def shape_bytes(shape_str: str) -> int:
    """Bytes of one shape string like 'f32[128,200,3072]{2,1,0}' or a
    tuple '(bf16[8,128]{1,0}, f32[8]{0})'."""
    total = 0
    for dtype, dims in _SHAPE_RE.findall(shape_str):
        if dtype not in DTYPE_BYTES:
            continue
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * DTYPE_BYTES[dtype]
    return total


def main() -> None:
    from forde_tpu.core.config import DTypePolicy, vit_b16_config, vit_tiny_config
    from forde_tpu.train.clip_step import clip_train_step, create_clip_train_state
    import jax.numpy as jnp

    preset = sys.argv[1] if len(sys.argv) > 1 else "vit_b16"
    batch_size = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    text_len = 64

    cfg = vit_b16_config() if preset == "vit_b16" else vit_tiny_config()
    cfg = cfg.replace(dtypes=DTypePolicy.bf16(), forde_lite=False)
    if os.environ.get("AUDIT_REMAT"):
        cfg = cfg.replace(remat=os.environ["AUDIT_REMAT"])

    state = create_clip_train_state(
        cfg, jax.random.PRNGKey(0), 1e-4, 0.01,
        batch_size=batch_size, text_len=text_len,
    )
    rng = np.random.RandomState(0)
    batch = {
        "image": jnp.asarray(
            rng.rand(batch_size, cfg.image_size, cfg.image_size, 3), jnp.float32
        ),
        "input_ids": jnp.asarray(
            rng.randint(1, cfg.vocab_size, (batch_size, text_len)), jnp.int32
        ),
        "attention_mask": jnp.ones((batch_size, text_len), jnp.int32),
    }

    lowered = clip_train_step.lower(state, batch)
    compiled = lowered.compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    print(f"== cost_analysis: {ca.get('flops', 0) / 1e12:.2f} TFLOP, "
          f"{ca.get('bytes accessed', 0) / 1e9:.2f} GB accessed ==")
    mem = compiled.memory_analysis()
    if mem is not None:
        print(f"== memory: temp {mem.temp_size_in_bytes / 1e9:.2f} GB, "
              f"args {mem.argument_size_in_bytes / 1e9:.2f} GB ==")

    hlo = compiled.as_text()
    if os.environ.get("AUDIT_SAVE_HLO"):
        with open(os.environ["AUDIT_SAVE_HLO"], "w") as f:
            f.write(hlo)

    # Parse the ENTRY computation's top-level instructions.
    entry = hlo.split("ENTRY ")[1]
    inst_re = re.compile(
        r"^\s+(?:ROOT\s+)?(%?[\w.-]+)\s*=\s*(\([^=]*?\)|\S+)\s+([\w-]+)\(",
        re.M,
    )
    by_inst = []
    by_kind = defaultdict(int)
    by_dtype = defaultdict(int)
    shapes_of = {}

    for m in inst_re.finditer(entry):
        name, shape_str, op = m.group(1), m.group(2), m.group(3)
        out_b = shape_bytes(shape_str)
        shapes_of[name] = out_b
        # operand bytes: resolve named operands on the full line
        line_end = entry.find("\n", m.end())
        line = entry[m.end():line_end]
        # strip nested computation references (calls=..., to_apply=...)
        operands = re.findall(r"(%?[\w.-]+)(?:,|\))", line.split(", calls=")[0])
        in_b = sum(shapes_of.get(o, 0) for o in operands)
        total = out_b + in_b
        if op in ("parameter", "constant", "get-tuple-element", "tuple",
                  "bitcast"):
            continue
        by_inst.append((total, out_b, in_b, op, name, shape_str[:90]))
        by_kind[op] += total
        for dtype, dims in _SHAPE_RE.findall(shape_str):
            if dtype in DTYPE_BYTES:
                n = 1
                for d in dims.split(","):
                    if d:
                        n *= int(d)
                by_dtype[dtype] += n * DTYPE_BYTES[dtype]

    grand = sum(t for t, *_ in by_inst)
    print(f"\n== top-level instruction traffic (reads+writes, post-fusion): "
          f"{grand / 1e9:.1f} GB ==")
    print("\n-- by op kind --")
    for op, b in sorted(by_kind.items(), key=lambda kv: -kv[1])[:12]:
        print(f"  {op:28s} {b / 1e9:8.2f} GB")
    print("\n-- output bytes by dtype --")
    for dt, b in sorted(by_dtype.items(), key=lambda kv: -kv[1]):
        print(f"  {dt:8s} {b / 1e9:8.2f} GB")
    print("\n-- top 40 instructions --")
    for total, out_b, in_b, op, name, shape in sorted(by_inst)[::-1][:40]:
        print(f"  {total / 1e9:7.2f} GB (out {out_b / 1e9:6.2f} in {in_b / 1e9:6.2f}) "
              f"{op:16s} {name:40s} {shape}")


if __name__ == "__main__":
    main()
