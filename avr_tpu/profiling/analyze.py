"""Aggregate device-op time from a JAX profiler xplane trace.

Usage (programmatic)::

    from avr_tpu.profiling import op_breakdown, print_breakdown
    rows = op_breakdown("/tmp/trace_dir")   # newest *.xplane.pb inside
    print_breakdown(rows, top=30)

or from the CLI::

    python -m avr_tpu.profiling.analyze /tmp/trace_dir [top_k]

Rows aggregate XLA op events on the device plane(s) by op name (fusion
instructions keep their HLO name, so matmuls/fusions/copies are
distinguishable), reporting total device microseconds and occurrence
counts.  Host/python lines are ignored.
"""

from __future__ import annotations

import collections
import glob
import os
import re
import sys
from typing import Dict, List, Tuple

from avr_tpu.profiling import xplane_pb2

# Strip trailing SSA numbering so repeated instances of the same HLO
# aggregate together: "fusion.123" -> "fusion", "dot_general.7" -> ...
_NUM = re.compile(r"\.\d+$")


def _find_xplane(path: str) -> str:
    if os.path.isfile(path):
        return path
    cands = sorted(
        glob.glob(os.path.join(path, "**", "*.xplane.pb"), recursive=True),
        key=os.path.getmtime,
    )
    if not cands:
        raise FileNotFoundError(f"no *.xplane.pb under {path}")
    return cands[-1]


_KIND = re.compile(r"=\s*[^ ]+\s+([a-zA-Z-]+)\(")


def _op_kind(name: str) -> str:
    """'%fusion.3 = bf16[...] fusion(...), kind=kLoop ...' -> 'fusion'."""
    m = _KIND.search(name)
    if m:
        return m.group(1)
    return name.split(" ")[0].lstrip("%").split(".")[0]


def op_breakdown(path: str, line_name: str = "XLA Ops",
                 collapse_numbers: bool = True) -> List[Tuple[str, float, int]]:
    """Return ``[(op_name, total_us, count), ...]`` sorted by time desc.

    Only events on device lines named ``line_name`` count ("XLA Ops" is the
    sequential op timeline; "Async XLA Ops" are overlapping DMAs and would
    double-count).
    """
    xfile = _find_xplane(path)
    space = xplane_pb2.XSpace()
    with open(xfile, "rb") as f:
        space.ParseFromString(f.read())

    totals: Dict[str, float] = collections.defaultdict(float)
    counts: Dict[str, int] = collections.defaultdict(int)
    for plane in space.planes:
        if "TPU" not in plane.name and "/device:" not in plane.name:
            continue
        meta = plane.event_metadata
        for line in plane.lines:
            if (line.display_name or line.name) != line_name:
                continue
            for ev in line.events:
                name = meta[ev.metadata_id].name if ev.metadata_id in meta else str(ev.metadata_id)
                if collapse_numbers:
                    name = _NUM.sub("", name)
                totals[name] += ev.duration_ps / 1e6  # ps -> us
                counts[name] += 1
    rows = sorted(
        ((k, v, counts[k]) for k, v in totals.items()), key=lambda r: -r[1]
    )
    return rows


def kind_breakdown(path: str, line_name: str = "XLA Ops"):
    """Aggregate :func:`op_breakdown` rows by HLO op kind."""
    totals: Dict[str, float] = collections.defaultdict(float)
    counts: Dict[str, int] = collections.defaultdict(int)
    for name, us, n in op_breakdown(path, line_name=line_name,
                                    collapse_numbers=False):
        k = _op_kind(name)
        totals[k] += us
        counts[k] += n
    return sorted(((k, v, counts[k]) for k, v in totals.items()),
                  key=lambda r: -r[1])


def print_breakdown(rows, top: int = 30) -> None:
    total = sum(r[1] for r in rows)
    print(f"{'op':60s} {'us':>12s} {'%':>6s} {'count':>8s}")
    for name, us, n in rows[:top]:
        print(f"{name[:60]:60s} {us:12.1f} {100*us/max(total,1e-9):6.2f} {n:8d}")
    print(f"{'TOTAL (device)':60s} {total:12.1f}")


if __name__ == "__main__":
    path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/avr_trace"
    top = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    print("== by op kind ==")
    print_breakdown(kind_breakdown(path), top=top)
    print("\n== top individual ops ==")
    print_breakdown(op_breakdown(path), top=top)
