"""SURVEY §7.2 discipline: the hot path never uses row-at-a-time Python.

Allowed Python entry points are Arrow-batched only (mapInPandas/
applyInPandas/mapInArrow/applyInArrow/pandas_udf); `F.udf(`, `@udf` and
RDD row transformations are banned in the package source."""

from __future__ import annotations

import pathlib
import re

PKG = pathlib.Path(__file__).resolve().parent.parent / "triangle_counting_spark"

BANNED = [
    re.compile(r"(?<![\w.])udf\s*\("),  # F.udf( / udf( — row-at-a-time
    re.compile(r"@udf\b"),
    re.compile(r"\.rdd\s*\.\s*(map|flatMap|mapPartitions)\b"),
    re.compile(r"\.foreach\s*\("),
]


def test_no_row_at_a_time_python():
    offenders = []
    for path in PKG.rglob("*.py"):
        text = path.read_text()
        for pat in BANNED:
            for m in pat.finditer(text):
                line = text[: m.start()].count("\n") + 1
                offenders.append(f"{path.name}:{line} {m.group(0)!r}")
    assert not offenders, f"row-at-a-time Python found: {offenders}"
