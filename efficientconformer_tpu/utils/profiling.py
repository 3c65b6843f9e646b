"""Profiler trace summary: the reference's printed top-op table, jax-native.

The reference's ``--profiler`` prints torch.autograd.profiler's
``key_averages().table(sort_by="cpu_time_total", row_limit=10)``
(reference models/model.py:613-622). Here ``jax.profiler.trace`` writes a
TensorBoard/perfetto log directory; this module parses the Chrome-trace JSON
inside it (stdlib only — no tensorflow/tensorboard-profile dependency) and
prints the equivalent table: top ops by total device time.

Lane selection: events on ``/device:*`` processes (TPU/GPU op lanes) are
preferred; otherwise XLA-runtime threads (CPU backend's ``tf_XLAPjRtCpuClient``
lanes). Python host frames (``$file:line``), infrastructure markers and
``end:`` pairs are dropped.
"""

from __future__ import annotations

import glob
import gzip
import json
import os
from typing import List, Optional, Tuple

_SKIP_PREFIXES = (
    "$", "end: ", "ThreadpoolListener", "ThunkExecutor", "TaskDispatcher",
    "FusionCompiler", "PjitFunction", "Xla", "BufferAllocations",
)
_SKIP_THREADS = ("python",)


def _trace_files(log_dir: str) -> List[str]:
    return sorted(
        glob.glob(os.path.join(log_dir, "**", "*.trace.json.gz"),
                  recursive=True),
        key=os.path.getmtime,
    )


def summarize_trace(log_dir: str, top: int = 10
                    ) -> Optional[List[Tuple[str, float, int]]]:
    """Aggregate the newest trace in ``log_dir``: [(op, total_us, count)]
    sorted by total time desc, or None if no trace file exists (e.g. a
    backend that exports no traces)."""
    files = _trace_files(log_dir)
    if not files:
        return None
    with gzip.open(files[-1], "rt") as f:
        events = json.load(f).get("traceEvents", [])

    pname, tname = {}, {}
    for e in events:
        if e.get("ph") == "M":
            if e.get("name") == "process_name":
                pname[e.get("pid")] = e["args"].get("name", "")
            elif e.get("name") == "thread_name":
                tname[(e.get("pid"), e.get("tid"))] = e["args"].get("name", "")

    device_pids = {p for p, n in pname.items() if n.startswith("/device:")}

    totals: dict = {}
    counts: dict = {}
    for e in events:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        pid, tid = e.get("pid"), e.get("tid")
        if device_pids and pid not in device_pids:
            continue
        thread = tname.get((pid, tid), "")
        if not device_pids and not thread.startswith("tf_XLA"):
            continue
        if thread in _SKIP_THREADS:
            continue
        name = e["name"]
        if name.startswith(_SKIP_PREFIXES):
            continue
        totals[name] = totals.get(name, 0.0) + float(e["dur"])
        counts[name] = counts.get(name, 0) + 1
    rows = sorted(totals.items(), key=lambda kv: -kv[1])[:top]
    return [(n, t, counts[n]) for n, t in rows]


def format_op_table(rows: List[Tuple[str, float, int]]) -> str:
    """Render [(op, total_us, count)] as the reference-style table."""
    total = sum(t for _, t, _ in rows) or 1.0
    name_w = max([len(n) for n, _, _ in rows] + [4])
    name_w = min(name_w, 48)
    lines = [
        f"{'Op':<{name_w}}  {'Total':>12}  {'Avg':>10}  {'Calls':>6}  {'%':>6}",
        "-" * (name_w + 42),
    ]
    for n, t, c in rows:
        lines.append(
            f"{n[:name_w]:<{name_w}}  {t/1e3:>10.3f}ms  {t/c/1e3:>8.3f}ms  "
            f"{c:>6}  {100*t/total:>5.1f}%"
        )
    return "\n".join(lines)


def print_trace_summary(log_dir: str, top: int = 10) -> bool:
    """Print the top-op table for ``log_dir``; returns False when the
    backend exported no trace (the table is then unavailable, matching the
    tunnelled-TPU platform's behaviour)."""
    rows = summarize_trace(log_dir, top)
    if not rows:
        print(f"profiler: no trace events exported under {log_dir} "
              "(trace directory kept for TensorBoard)")
        return False
    print(f"profiler: top {len(rows)} device ops by total time "
          f"({log_dir}):")
    print(format_op_table(rows))
    return True
