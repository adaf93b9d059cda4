"""Summarize a jax.profiler trace: device busy-time by op / category.

The reference's only observability hook is `tracing` spans printed by the
front-ends (SURVEY.md §5 — no flamegraph/chrome-trace exporter). The TPU
build captures real XLA device timelines instead: set
``DIFFUSION_RS_TPU_TRACE_DIR=/tmp/trace`` around any generation (the
pipeline and `bench.py --mode step` both wrap their hot loops in
``util.tracing.maybe_profile``), then::

    python tools/profile_summary.py /tmp/trace [--top 25]

reads the newest ``*.xplane.pb`` and prints, for each TPU device plane,
total busy time, a category rollup (Pallas/custom-call, XLA fusions, data
formatting, copies, infeed/outfeed), and the top-N ops by self time.
This is how the BENCH.md step profiles are produced.
"""

from __future__ import annotations

import argparse
import collections
import pathlib
import re
import sys


def _load_xplane(path: pathlib.Path):
    try:
        from tensorflow.tsl.profiler.protobuf import xplane_pb2  # type: ignore
    except ImportError:  # pragma: no cover - layout varies across TF versions
        try:
            from tsl.profiler.protobuf import xplane_pb2  # type: ignore
        except ImportError:
            from tensorflow.core.profiler.protobuf import xplane_pb2  # type: ignore
    space = xplane_pb2.XSpace()
    space.ParseFromString(path.read_bytes())
    return space


_CATEGORIES = (
    # (label, name regex) — first match wins. Pallas kernels lower to
    # custom-calls whose names keep the kernel function name.
    ("pallas qmm", re.compile(r"qmm|quantized_matmul|dequant", re.I)),
    ("pallas flash-attn", re.compile(r"flash|attention_kernel", re.I)),
    ("custom-call (other)", re.compile(r"custom-call", re.I)),
    ("convolution", re.compile(r"conv")),
    ("data formatting", re.compile(r"transpose|reshape|copy|bitcast|pad|concat|slice|gather|convert", re.I)),
    ("all-reduce/collective", re.compile(r"all-reduce|all-gather|collective|reduce-scatter|permute", re.I)),
    ("infeed/outfeed", re.compile(r"infeed|outfeed", re.I)),
    ("fusion (XLA)", re.compile(r"fusion|loop|scatter|reduce|dot|add|mul", re.I)),
)


def _categorize(name: str) -> str:
    for label, rx in _CATEGORIES:
        if rx.search(name):
            return label
    return "other"


def summarize(trace_dir: str, top: int = 25) -> int:
    files = sorted(
        pathlib.Path(trace_dir).rglob("*.xplane.pb"),
        key=lambda p: p.stat().st_mtime,
    )
    if not files:
        print(f"no *.xplane.pb under {trace_dir}", file=sys.stderr)
        return 1
    space = _load_xplane(files[-1])
    print(f"trace: {files[-1]}")
    for plane in space.planes:
        if "TPU" not in plane.name and "device" not in plane.name.lower():
            continue
        meta = {m_id: m.name for m_id, m in plane.event_metadata.items()}
        lines = {line.name: line for line in plane.lines}
        # 'XLA Modules' = whole-executable container events (the wall time);
        # 'XLA Ops' = leaf device ops (the budget breakdown);
        # 'Async XLA Ops' = overlapped DMA (duration includes async wait —
        # reported separately, NOT added to busy time).
        ops_line = lines.get("XLA Ops")
        if ops_line is None or not ops_line.events:
            continue
        by_name: dict[str, float] = collections.defaultdict(float)
        for ev in ops_line.events:
            name = meta.get(ev.metadata_id, "?")
            # scan bodies appear as %while container events on the op line
            # too — their children are also on the line; skip containers.
            if name.startswith(("%while", "jit_", "%fusion-wrapper")):
                continue
            by_name[name] += ev.duration_ps / 1e12
        total = sum(by_name.values())
        wall = sum(
            ev.duration_ps / 1e12
            for ev in lines.get("XLA Modules", ops_line).events
        )
        async_s = sum(
            ev.duration_ps / 1e12
            for line in (lines.get("Async XLA Ops"),) if line is not None
            for ev in line.events
        )
        print(
            f"\n== plane: {plane.name} — module wall {wall * 1e3:.1f} ms, "
            f"leaf-op busy {total * 1e3:.1f} ms "
            f"({total / wall * 100:.1f}% of wall; async-DMA span "
            f"{async_s * 1e3:.0f} ms overlapped) =="
        )
        by_cat = collections.defaultdict(float)
        for name, sec in by_name.items():
            by_cat[_categorize(name)] += sec
        for cat, sec in sorted(by_cat.items(), key=lambda kv: -kv[1]):
            print(f"  {sec / total * 100:5.1f}%  {sec * 1e3:9.2f} ms  {cat}")
        print(f"  top {top} ops:")
        for name, sec in sorted(by_name.items(), key=lambda kv: -kv[1])[:top]:
            print(f"    {sec / total * 100:5.1f}%  {sec * 1e3:9.2f} ms  {name[:90]}")
    return 0


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("trace_dir")
    ap.add_argument("--top", type=int, default=25)
    args = ap.parse_args()
    sys.exit(summarize(args.trace_dir, args.top))
