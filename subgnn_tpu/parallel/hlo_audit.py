"""Count GSPMD-inserted collectives (and their byte volume) in compiled HLO.

The measurement behind PERF.md's anchor-gather accounting and the
at-scale multichip dryrun's assertions (SURVEY §2.3 "anchor-patch
all-gather" deliverable). GSPMD partitioning is platform-independent, so
counts from a virtual CPU mesh equal the real-chip program's.
"""
from __future__ import annotations

import re
from collections import defaultdict
from typing import Any, Dict

DTYPE_BYTES = {"f32": 4, "bf16": 2, "f16": 2, "s32": 4, "u32": 4,
               "s8": 1, "u8": 1, "pred": 1, "f64": 8, "s64": 8}

COLLECTIVES = ("all-gather", "all-reduce", "reduce-scatter",
               "collective-permute", "all-to-all")


def shape_bytes(shape_str: str) -> int:
    m = re.match(r"(\w+)\[([\d,]*)\]", shape_str)
    if not m:
        return 0
    dt, dims = m.groups()
    n = 1
    for d in dims.split(","):
        if d:
            n *= int(d)
    return n * DTYPE_BYTES.get(dt, 4)


def count_hlo_collectives(hlo_text: str, max_examples: int = 4
                          ) -> Dict[str, Any]:
    """{'counts': {op: n}, 'bytes': {op: total output bytes},
    'examples': {op: [str, ...]}} over the optimized HLO text."""
    counts: Dict[str, int] = defaultdict(int)
    bytes_by_op: Dict[str, int] = defaultdict(int)
    examples: Dict[str, list] = defaultdict(list)
    for line in hlo_text.splitlines():
        for op in COLLECTIVES:
            marker = f" {op}(" if f" {op}(" in line else (
                f" {op}-start(" if f" {op}-start(" in line else None)
            if marker is None:
                continue
            # sum every shape in the OUTPUT (the `%name = <ty>` part left
            # of the op name) — collectives are often variadic tuples
            out_part = line.split(marker)[0]
            shapes = re.findall(r"\w+\[[\d,]*\]", out_part)
            total = sum(shape_bytes(s) for s in shapes)
            counts[op] += 1
            bytes_by_op[op] += total
            if len(examples[op]) < max_examples:
                big = max(shapes, key=shape_bytes) if shapes else "?"
                examples[op].append(
                    f"{len(shapes)}-tuple, {total/1e6:.2f} MB total,"
                    f" largest {big}")
            break
    return {"counts": dict(counts), "bytes": dict(bytes_by_op),
            "examples": dict(examples)}
