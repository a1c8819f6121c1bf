"""Collective census of a compiled sharded program.

The <10 s multi-chip projection (docs/PERF_r3.md §7) rests on the compiled
HLO containing ONLY the inherent collectives — the spatial-attention k/v
all-gathers, conv halo exchanges and norm-stat all-reduces — and in
particular ZERO full-activation all-gathers at the temporal fold
boundaries (the h-major `tokens_to_temporal` layout guarantees this; a
b-major regression would re-insert 5.1 GB/row of gathers).  This module
parses collectives out of compiled HLO so tests and `scripts/
audit_collectives.py` can pin that property.

No reference analog: the torch reference has no compiled-program artifact
to audit (comms are imperative NCCL calls).
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from typing import List

DTYPE_BYTES = {"f32": 4, "bf16": 2, "f16": 2, "s32": 4, "u32": 4, "pred": 1,
               "f64": 8, "s8": 1, "u8": 1, "s64": 8, "u64": 8}

_COLLECTIVE_PAT = re.compile(
    r"=\s*((?:\([^)]*\)|\S+))\s+"
    r"(all-gather|all-reduce|reduce-scatter|collective-permute|all-to-all)"
    r"(-start)?\(", re.M)


@dataclass
class Collective:
    op: str          # all-gather | all-reduce | reduce-scatter | ...
    shape: str       # result shape string (possibly truncated)
    nbytes: int      # total payload bytes of the result


def parse_collectives(hlo: str) -> List[Collective]:
    """Every collective in an HLO text dump, with its result payload bytes.

    Async collectives (``*-start``, TPU default) produce a tuple result
    ``(operand_alias, result[, contexts])`` — only the RESULT element is the
    payload; summing every typed leaf would double-count (~2x for
    all-reduce, operand+gathered for all-gather)."""
    out = []
    for m in _COLLECTIVE_PAT.finditer(hlo):
        shape_s, op, is_start = m.group(1), m.group(2), bool(m.group(3))
        leaves = []
        for ty, dims in re.findall(r"(\w+)\[([\d,]*)\]", shape_s):
            n = 1
            for d in dims.split(","):
                if d:
                    n *= int(d)
            leaves.append(n * DTYPE_BYTES.get(ty, 4))
        if is_start and len(leaves) >= 2:
            # (operand, result, ...) tuple: element 1 is the payload
            total = leaves[1]
        else:
            total = sum(leaves)
        out.append(Collective(op, shape_s if len(shape_s) < 70
                              else shape_s[:67] + "...", total))
    return out


def census(compiled) -> List[Collective]:
    """Collectives of a jax ``Compiled`` object (``jit(...).lower(...)
    .compile()``)."""
    return parse_collectives(compiled.as_text())


def total_bytes(cols: List[Collective], op: str | None = None) -> int:
    return sum(c.nbytes for c in cols if op is None or c.op == op)


def max_bytes(cols: List[Collective], op: str | None = None) -> int:
    return max((c.nbytes for c in cols if op is None or c.op == op),
               default=0)
