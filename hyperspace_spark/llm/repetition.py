"""Intra-document repetition metrics — the Gopher/C4-style quality
filters a pretraining pipeline runs BEFORE corpus-level dedup: documents
that repeat themselves (boilerplate menus, scraped pagination, SEO spam)
are dropped by per-document thresholds, cheaply, before any pairwise
machinery sees them.

Metrics (per document):

- ``n_lines``            non-empty trimmed lines
- ``dup_line_frac``      1 - distinct/total over those lines (count of
                         repeated-line OCCURRENCES beyond the first)
- ``top_2gram_frac``     occurrences of the most common word 2-gram /
                         total 2-grams (Gopher's top-n-gram family)
- ``dup_2gram_frac``     fraction of 2-gram occurrences whose gram
                         appears more than once

Scale shape: ONE Arrow-batched kernel over (doc_id, text) — a
per-document reduction exactly like the minhash/simhash kernels
(llm/dedup.py), so it is a narrow zero-shuffle map stage; a Counter
pass is O(tokens) per document.  The HOF-expression alternative for the
2-gram mode would be O(tokens^2) per row (no per-key state in Catalyst
lambdas), and the explode+groupBy alternative costs two keyed shuffles
of the full token stream — at 100 TB that is the difference between a
scan-speed pass and a corpus-sized shuffle.  NULL text yields NULL
metrics (a missing document is not a "clean" document — the same
null-semantics rule as simhash/pack_sequences).

Tokenization parity: lines split on \\n and trimmed; words are
llm/text.py's tokens() definition (whitespace split of trimmed
lowercased text) re-expressed in the kernel, and the DuckDB oracle
replays both (workload.py).

Reference note: microsoft/hyperspace has no document operators; this is
part of the LLM-training extension surface (SURVEY §2 extensions).
"""

from __future__ import annotations

from typing import TYPE_CHECKING

if TYPE_CHECKING:
    from pyspark.sql import Column, DataFrame

def repetition_stats(
    df: "DataFrame", text_col: str = "text", id_col: str = "doc_id"
) -> "DataFrame":
    """-> (doc_id, n_lines, dup_line_frac, top_2gram_frac, dup_2gram_frac);
    ``doc_id`` keeps the source id column's type (string ids work).

    Fractions are rounded to 6 dp (engine-portable comparison)."""
    import re

    from pyspark.sql import functions as F
    from pyspark.sql.types import DoubleType, LongType, StructField, StructType

    schema = StructType(
        [
            StructField("doc_id", df.schema[id_col].dataType),
            StructField("n_lines", LongType()),
            StructField("dup_line_frac", DoubleType()),
            StructField("top_2gram_frac", DoubleType()),
            StructField("dup_2gram_frac", DoubleType()),
        ]
    )
    # Whitespace parity with llm/text.py tokens() (Spark trim = SPACES
    # only; Java regex \\s = [ \\t\\n\\x0b\\f\\r]) — NOT Python str.strip/
    # \\s, which also eat NBSP etc. and would diverge from the rest of
    # the pipeline's token definition and the SQL oracle on tab/CR text.
    # Known residual gap shared by EVERY _DUCK_TOKENS oracle in
    # workload.py: RE2's \\s omits \\x0b (vertical tab), so a \\x0b
    # between words splits here/in Spark but not in DuckDB.
    ws = re.compile(r"[ \t\n\x0b\f\r]+")

    def kernel(batches):
        import pandas as pd
        from collections import Counter

        for pdf in batches:
            out = {
                "doc_id": pdf["doc_id"],
                "n_lines": [],
                "dup_line_frac": [],
                "top_2gram_frac": [],
                "dup_2gram_frac": [],
            }
            for text in pdf["text"]:
                if text is None:
                    out["n_lines"].append(None)
                    out["dup_line_frac"].append(None)
                    out["top_2gram_frac"].append(None)
                    out["dup_2gram_frac"].append(None)
                    continue
                lines = [ln.strip(" ") for ln in text.split("\n")]
                lines = [ln for ln in lines if ln]
                n_lines = len(lines)
                dup_line = (
                    round(1.0 - len(set(lines)) / n_lines, 6) if n_lines else 0.0
                )
                t = text.strip(" ").lower()
                words = ws.split(t) if t else []
                grams = Counter(
                    (words[i], words[i + 1]) for i in range(len(words) - 1)
                )
                total = sum(grams.values())
                if total:
                    top = round(max(grams.values()) / total, 6)
                    dup = round(
                        sum(c for c in grams.values() if c > 1) / total, 6
                    )
                else:
                    top = dup = 0.0
                out["n_lines"].append(n_lines)
                out["dup_line_frac"].append(dup_line)
                out["top_2gram_frac"].append(top)
                out["dup_2gram_frac"].append(dup)
            yield pd.DataFrame(out)

    from hyperspace_spark.scale import ensure_min_parallelism

    # Same guard as the simhash/minhash kernels: byte-sized scan splits
    # under-parallelize CPU-heavy kernels on small inputs; no-op (no
    # shuffle) once the scan already splits past core count.
    src = ensure_min_parallelism(
        df.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("text"))
    )
    return src.mapInPandas(kernel, schema)


def repetition_filter(
    df: "DataFrame",
    max_dup_line_frac: float = 0.3,
    max_top_2gram_frac: float = 0.2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> "DataFrame":
    """Documents passing the repetition thresholds (Gopher-rule defaults:
    drop if >30% duplicate lines or the top 2-gram covers >20% of the
    text).  NULL-text docs are DROPPED — they can't be certified clean.
    Returns the original rows (all columns), filtered."""
    from pyspark.sql import functions as F

    stats = repetition_stats(df, text_col, id_col)
    keep = stats.filter(
        (F.col("dup_line_frac") <= max_dup_line_frac)
        & (F.col("top_2gram_frac") <= max_top_2gram_frac)
    ).select(F.col("doc_id").alias(id_col))
    return df.join(keep, id_col, "left_semi")
