"""32k global-batch contrastive loss at BASELINE config-4 scale (VERDICT r2 #8).

Drives ``parallel.contrastive.sharded_contrastive_loss`` (value+grad) at a
32,768-pair global batch over an 8-device mesh — 4,096 local pairs per
device, embed_dim 512 (the ViT-B/16 dual-encoder embedding shape) — and
reports XLA's compiled memory analysis next to the naive single-matrix
loss, which would materialize the full (32k, 32k) fp32 logits twice
(~8.6 GB) plus softmax intermediates.

Self-bootstraps onto an 8-virtual-device CPU mesh when run under the
single-chip axon env (same pattern as __graft_entry__.dryrun_multichip).

Usage: python benchmarks/contrastive_32k.py [--global_batch 32768]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

N_DEV = 8


def _bootstrap() -> None:
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    flags = env.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        flags = (flags + f" --xla_force_host_platform_device_count={N_DEV}").strip()
    env["XLA_FLAGS"] = flags
    env["CONTRASTIVE32K_BOOTSTRAPPED"] = "1"
    env["PYTHONPATH"] = os.pathsep.join(
        p for p in (_REPO, env.get("PYTHONPATH", "")) if p
    )
    subprocess.run(
        [sys.executable, os.path.abspath(__file__)] + sys.argv[1:],
        env=env, cwd=_REPO, check=True,
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--global_batch", type=int, default=32768)
    ap.add_argument("--embed_dim", type=int, default=512)
    args = ap.parse_args()

    import jax

    if (
        len(jax.devices()) < N_DEV
        and not os.environ.get("CONTRASTIVE32K_BOOTSTRAPPED")
    ):
        _bootstrap()
        return

    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from forde_tpu.core import mesh as mesh_lib
    from forde_tpu.models.dual_encoder import clip_contrastive_loss
    from forde_tpu.parallel.contrastive import sharded_contrastive_loss

    b, d = args.global_batch, args.embed_dim
    mesh = mesh_lib.create_mesh(data=N_DEV, devices=jax.devices()[:N_DEV])
    shard = NamedSharding(mesh, P(mesh_lib.AXIS_DATA, None))

    rng = np.random.RandomState(0)
    img = jax.device_put(rng.randn(b, d).astype(np.float32), shard)
    txt = jax.device_put(
        (0.7 * np.asarray(img) + 0.3 * rng.randn(b, d)).astype(np.float32),
        shard,
    )
    scale = jnp.asarray(2.6592, jnp.float32)

    def sharded(img, txt):
        loss, aux = sharded_contrastive_loss(img, txt, scale, mesh)
        return loss, aux

    def naive(img, txt):
        loss, aux = clip_contrastive_loss(img, txt, scale)
        return loss, aux

    report = {}
    for name, fn in [("sharded", sharded), ("naive", naive)]:
        g = jax.jit(jax.value_and_grad(fn, argnums=(0, 1), has_aux=True))
        lowered = g.lower(img, txt)
        compiled = lowered.compile()
        ma = compiled.memory_analysis()
        entry = {
            "temp_gb": round(ma.temp_size_in_bytes / 1e9, 3),
            "arg_gb": round(ma.argument_size_in_bytes / 1e9, 3),
            "output_gb": round(ma.output_size_in_bytes / 1e9, 3),
        }
        if name == "sharded" or b <= 8192:
            # executing the naive path at 32k on the CPU mesh would page
            # through the 8.6 GB logits; only run it at small scale
            (loss, aux), (gi, gt) = compiled(img, txt)
            entry["loss"] = round(float(loss), 4)
            entry["grad_norm"] = round(
                float(jnp.linalg.norm(gi) + jnp.linalg.norm(gt)), 4
            )
            entry["acc_img"] = round(float(aux["contrastive/acc_img"]), 4)
        report[name] = entry

    report["global_batch"] = b
    report["local_batch"] = b // N_DEV
    report["devices"] = N_DEV
    print(json.dumps(report))


if __name__ == "__main__":
    main()
