"""Shared helpers for TPU trace analysis scripts.

`summarize_trace(trace_dir, n_steps)` — aggregate device op durations from
the newest .trace.json.gz under trace_dir.

`hlo_fusion_index(compiled_text)` — map fusion/instruction names from the
compiled HLO text to a one-line summary of what the fusion computes (root
op + the heaviest ops inside + result shape), so trace rows like
"fusion.1549  2.97 ms" become actionable.
"""

from __future__ import annotations

import glob
import gzip
import json
import os
import re
from collections import defaultdict

_OP_WEIGHT = (
    "convolution",
    "dot",
    "reduce",
    "scatter",
    "gather",
    "transpose",
    "reverse",
    "pad",
    "convert",
    "concatenate",
    "reshape",
    "broadcast",
    "select",
    "dynamic-slice",
    "dynamic-update-slice",
    "copy",
)


def summarize_trace(trace_dir: str, n_steps: int):
    """Return {op_name: ms_per_step} aggregated over device pids."""
    paths = glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"), recursive=True)
    assert paths, f"no trace under {trace_dir}"
    path = max(paths, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        trace = json.load(f)
    raw = trace.get("traceEvents", [])
    pid_names = {
        ev["pid"]: ev["args"].get("name", "")
        for ev in raw
        if ev.get("ph") == "M" and ev.get("name") == "process_name" and "args" in ev
    }
    device_pids = {
        pid for pid, name in pid_names.items() if "TPU" in name or "/device" in name.lower()
    }
    totals = defaultdict(float)
    for ev in raw:
        if ev.get("ph") != "X":
            continue
        if device_pids and ev.get("pid") not in device_pids:
            continue
        totals[ev.get("name", "?")] += ev.get("dur", 0.0) / 1e3 / n_steps
    return dict(totals)


def hlo_fusion_index(compiled_text: str):
    """Map each named computation/instruction to a content summary.

    Parses the HLO text dump: fusion instructions reference a computation
    (`calls=%fused_computation.N`); we summarise that computation by its
    heaviest op kinds and the fusion's result shape.
    """
    comp_ops: dict[str, list] = {}
    cur = None
    for line in compiled_text.splitlines():
        m = re.match(r"\s*%?([\w.\-]+)\s+\([^)]*\)\s*->\s*.*\{\s*$", line)
        if m:
            cur = m.group(1)
            comp_ops[cur] = []
            continue
        if cur is None:
            continue
        if line.strip() == "}" or line.strip().startswith("}"):
            cur = None
            continue
        m = re.match(r"\s*(?:ROOT\s+)?%?[\w.\-]+\s*=\s*(\S+)\s+([a-z][a-z0-9\-]*)\(", line)
        if m:
            shape, op = m.group(1), m.group(2)
            comp_ops[cur].append((op, shape))

    # instruction name -> (op kind, called computation, result shape)
    inst = {}
    for line in compiled_text.splitlines():
        m = re.match(r"\s*(?:ROOT\s+)?%?([\w.\-]+)\s*=\s*(\S+)\s+([a-z][a-z0-9\-\.]*)\(.*", line)
        if not m:
            continue
        name, shape, op = m.group(1), m.group(2), m.group(3)
        mm = re.search(r"calls=%?([\w.\-]+)", line)
        inst[name] = (op, mm.group(1) if mm else None, shape)

    def describe(trace_name: str) -> str:
        info = inst.get(trace_name)
        if info is None:
            return ""
        op, called, shape = info
        if called and called in comp_ops:
            counts = defaultdict(int)
            for o, _ in comp_ops[called]:
                counts[o] += 1
            interesting = [
                f"{o}x{c}" if c > 1 else o
                for o, c in sorted(counts.items(), key=lambda kv: -kv[1])
                if o in _OP_WEIGHT
            ][:5]
            return f"{shape} <- {','.join(interesting) or op}"
        return f"{shape} {op}"

    return describe
