"""PII detection and redaction for training-data pipelines.

Everything is `pyspark.sql.functions` regex built-ins (JVM, inside
whole-stage codegen) — a narrow map stage that composes with pushdown
and scales linearly; no Python touches the text.

The patterns are deliberately written in the common subset of Java
regex (Spark) and RE2 (DuckDB/Trino/Go tooling): no backreferences, no
lookaround — so detectors give identical answers when cross-checked in
an oracle engine (see tests/test_pii.py).

These are pattern detectors, not NER: they flag the high-precision
machine-readable identifiers (emails, phone numbers, SSN-shaped ids,
IPv4 addresses, card-shaped numbers) that dominate accidental PII in web
corpora.  Names/addresses need a model and are out of scope here.
"""

from __future__ import annotations

from typing import TYPE_CHECKING, Iterable

if TYPE_CHECKING:
    from pyspark.sql import Column, DataFrame

#: kind -> regex.  Order matters for redaction: longer/more-specific
#: digit shapes first so e.g. a card number is not half-eaten by the
#: phone pattern.
PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "credit_card": r"\b\d{4}[- ]\d{4}[- ]\d{4}[- ]\d{4}\b",
    "ssn": r"\b\d{3}-\d{2}-\d{4}\b",
    "phone": r"\b\d{3}[-.]\d{3}[-.]\d{4}\b",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
}


def pii_count(text_col: "Column", kind: str) -> "Column":
    """Number of matches of one PII kind in the text."""
    from pyspark.sql import functions as F

    return F.regexp_count(text_col, F.lit(PATTERNS[kind]))


def pii_counts(
    df: "DataFrame", text_col: str = "text", kinds: Iterable[str] | None = None
) -> "DataFrame":
    """Adds one `n_<kind>` count column per detector plus `has_pii`."""
    from pyspark.sql import functions as F

    kinds = list(kinds) if kinds is not None else list(PATTERNS)
    t = F.col(text_col)
    for kind in kinds:
        df = df.withColumn(f"n_{kind}", pii_count(t, kind))
    flag = None
    for kind in kinds:
        c = F.col(f"n_{kind}") > 0
        flag = c if flag is None else (flag | c)
    return df.withColumn("has_pii", flag if flag is not None else F.lit(False))


def redact(
    df: "DataFrame",
    text_col: str = "text",
    out_col: str | None = None,
    kinds: Iterable[str] | None = None,
) -> "DataFrame":
    """Replace each PII match with a `[KIND]` token (idempotent: tokens
    contain no digits or @, so they never re-match a detector)."""
    from pyspark.sql import functions as F

    kinds = list(kinds) if kinds is not None else list(PATTERNS)
    out = F.col(text_col)
    for kind in kinds:  # PATTERNS order: most-specific digit shapes first
        out = F.regexp_replace(out, PATTERNS[kind], f"[{kind.upper()}]")
    return df.withColumn(out_col or text_col, out)


def pii_stats(df: "DataFrame", text_col: str = "text") -> "DataFrame":
    """Corpus-level census: per-kind totals and documents affected."""
    from pyspark.sql import functions as F

    counted = pii_counts(df, text_col)
    aggs = [F.sum(f"n_{kind}").alias(f"total_{kind}") for kind in PATTERNS]
    aggs.append(F.sum(F.col("has_pii").cast("long")).alias("docs_with_pii"))
    aggs.append(F.count("*").alias("n_docs"))
    return counted.agg(*aggs)
