"""Direct xplane.pb → per-step op-time attribution (no tensorboard).

``jax.profiler.trace`` writes an XSpace proto; the usual consumer
(tensorboard_plugin_profile) is version-broken in this image (its
``_pywrap_profiler`` bindings don't match the installed TF), so this
module parses the proto directly with the xplane_pb2 schema that ships
inside tensorflow and aggregates the ``/device:TPU:0`` "XLA Ops" line —
the synchronous per-op timeline whose total equals the module's device
busy time (if it didn't, there would be scheduling bubbles; see
PERF.md round 4 for the attribution this produced).

Ops are bucketed by their HLO fusion category (the name prefix before
the first ``.``: ``fusion``, ``convert_reduce_fusion``, ``attention``
— Pallas custom-calls keep their kernel name). The async DMA line
(``slice-start``/``copy-start``) is reported separately: its durations
overlap compute, so they attribute traffic, not wall time.

Usage:
    python benchmarks/xplane_summary.py <trace_dir_or_xplane.pb> [steps]
or  from xplane_summary import summarize; summarize(path, steps=8)

Requires PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python when the
installed protobuf rejects TF's generated descriptors; re-execs itself
with that set if the import fails.
"""

from __future__ import annotations

import collections
import glob
import os
import re
import sys


def _load_xplane_pb2():
    try:
        from tensorflow.tsl.profiler.protobuf import xplane_pb2
        return xplane_pb2
    except TypeError:
        # "Descriptors cannot be created directly": protobuf C++ impl
        # rejects TF's older generated code — rerun under the pure-
        # python implementation.
        if os.environ.get("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION") == "python":
            raise
        os.environ["PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION"] = "python"
        os.execv(sys.executable, [sys.executable] + sys.argv)


def _find_xplane(path: str) -> str:
    if os.path.isfile(path):
        return path
    xs = glob.glob(os.path.join(path, "**", "*.xplane.pb"), recursive=True)
    if not xs:
        raise FileNotFoundError(f"no *.xplane.pb under {path}")
    return max(xs, key=os.path.getmtime)


_CAT = re.compile(r"%?([a-zA-Z][a-zA-Z0-9_-]*)")


def summarize(path: str, steps: int = 8, top: int = 20, out=sys.stdout):
    """Print per-step op-category times for the TPU device plane.

    ``steps``: how many train steps the trace window covered — per-step
    numbers divide by it. Returns {category: ms_per_step} for the
    synchronous op line.
    """
    xplane_pb2 = _load_xplane_pb2()
    xp = _find_xplane(path)
    space = xplane_pb2.XSpace()
    with open(xp, "rb") as f:
        space.ParseFromString(f.read())
    planes = [p for p in space.planes if p.name.startswith("/device:TPU")]
    if not planes:
        print(f"no /device:TPU plane in {xp} "
              f"(planes: {[p.name for p in space.planes]})", file=out)
        return {}
    result = {}
    for plane in planes:
        meta = plane.event_metadata
        print(f"== {plane.name} ({os.path.basename(xp)}, /{steps} steps)",
              file=out)
        for line in plane.lines:
            sync = line.name == "XLA Ops"
            if not sync and line.name != "Async XLA Ops":
                continue
            tot: collections.Counter = collections.Counter()
            cnt: collections.Counter = collections.Counter()
            total = 0.0
            for ev in line.events:
                name = meta[ev.metadata_id].name
                m = _CAT.match(name)
                cat = m.group(1) if m else name[:24]
                ms = ev.duration_ps / 1e9
                tot[cat] += ms
                cnt[cat] += 1
                total += ms
            kind = ("device busy" if sync else
                    "async DMA (overlaps compute; traffic, not wall)")
            print(f"-- {line.name}: {total / steps:.2f} ms/step ({kind})",
                  file=out)
            for cat, ms in tot.most_common(top):
                print(f"   {ms / steps:8.2f} ms/step ({100 * ms / total:4.1f}%)"
                      f"  x{cnt[cat] // max(steps, 1):<5d} {cat}", file=out)
            if sync:
                result = {c: m / steps for c, m in tot.items()}
    return result


if __name__ == "__main__":
    target = sys.argv[1] if len(sys.argv) > 1 else "."
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    summarize(target, steps=n)
