"""PII pattern detection and scrubbing — pure JVM regex expressions.

Training-data pipelines scrub personally identifiable information before
anything else sees the text. This is the cheap, standard regex tier
(emails, phone numbers, IPv4 addresses, SSN-shaped ids, card-shaped
numbers) — one projection per document, `regexp_count` for detection and
chained `regexp_replace` for redaction, all inside whole-stage codegen
with no Python in the path, so it runs at parquet-scan speed on a 100 TB
corpus. (Model-based NER-grade PII is out of scope for this engine —
that's an inference workload, not a query.)

Patterns are ordered most-specific-first (card before phone before bare
number shapes) so an earlier redaction cannot leave a suffix a later,
looser pattern then mangles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# ordered: longer/stricter shapes first
DEFAULT_PII_PATTERNS: tuple[tuple[str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}"),
    ("card", r"\b\d{4}[- ]\d{4}[- ]\d{4}[- ]\d{4}\b"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b"),
    ("phone", r"\b(?:\+?1[-. ])?\(?\d{3}\)?[-. ]\d{3}[-. ]\d{4}\b"),
    ("ipv4", r"\b(?:\d{1,3}\.){3}\d{1,3}\b"),
)


def _patterns(
    patterns: dict[str, str] | tuple[tuple[str, str], ...] | None,
) -> tuple[tuple[str, str], ...]:
    if patterns is None:
        return DEFAULT_PII_PATTERNS
    pats = tuple(patterns.items()) if isinstance(patterns, dict) else tuple(patterns)
    if not pats:
        raise ValueError("patterns must be non-empty (omit for the defaults)")
    return pats


def pii_stats(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    patterns: dict[str, str] | tuple[tuple[str, str], ...] | None = None,
) -> DataFrame:
    """(doc_id, n_<kind>..., n_pii) — per-document match counts for each
    pattern plus the total. Counts are taken on the progressively-redacted
    text (same order as :func:`pii_scrub`), so a card number is counted
    once as a card, not again as two phone-shaped fragments."""
    pats = _patterns(patterns)
    remaining = F.col(text_col)
    counts = []
    for kind, rx in pats:
        counts.append(F.regexp_count(remaining, F.lit(rx)).alias(f"n_{kind}"))
        remaining = F.regexp_replace(remaining, rx, f"<{kind.upper()}>")
    out = docs.select(F.col(id_col).cast("long").alias("doc_id"), *counts)
    total_expr = None
    for kind, _ in pats:
        t = F.col(f"n_{kind}")
        total_expr = t if total_expr is None else total_expr + t
    return out.select("*", total_expr.cast("long").alias("n_pii"))


def pii_scrub(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    patterns: dict[str, str] | tuple[tuple[str, str], ...] | None = None,
) -> DataFrame:
    """(doc_id, text, n_redactions) — text with every pattern match
    replaced by its `<KIND>` token, applied in pattern order over the
    already-redacted string."""
    pats = _patterns(patterns)
    redacted = F.col(text_col)
    n_red = None
    for kind, rx in pats:
        cnt = F.regexp_count(redacted, F.lit(rx))
        n_red = cnt if n_red is None else n_red + cnt
        redacted = F.regexp_replace(redacted, rx, f"<{kind.upper()}>")
    return docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        redacted.alias("text"),
        n_red.cast("long").alias("n_redactions"),
    )
