"""Inverted text index (kind TXT): token -> posting rows, BUCKETED by
token — keyword search over a 100 TB corpus reads only the probed
tokens' buckets instead of scanning text.

Extension beyond the reference (it has no text index); the engineering
discipline is the covering index's: bucketed external table sink
(indexes/covering.py write_bucketed — the catalog entry is session
scaffolding, the files are the artifact), a lineage column for exact
delete handling at query time, and an append-only incremental refresh
that hardlinks retained bucket files and writes only the new postings
per bucket.

Query shape at scale: a probe for k terms is a bucket-pruned read of
<= k/num_buckets of the postings (Spark prunes buckets for equality/IN
on the bucket column), then one groupBy on doc id over the matching
postings only.  The corpus text is never touched.  Tokenization is the
shared llm/text.py whitespace normalizer, so results are reproducible
in any engine (the contract oracle replays it in DuckDB).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import TYPE_CHECKING, Iterable

if TYPE_CHECKING:
    from pyspark.sql import DataFrame, SparkSession


@dataclass
class InvertedTextIndexConfig:
    name: str
    text_col: str = "text"
    id_col: str = "doc_id"
    num_buckets: int | None = None
    kind: str = field(default="TXT", init=False)

    def referenced_columns(self) -> list[str]:
        return [self.id_col, self.text_col]


def normalize_terms(terms: Iterable) -> list[str]:
    """Search terms through the SAME normalization as indexed tokens.
    A term containing whitespace is an ERROR, not a silent drop: under
    mode='all', dropping one conjunct would return a superset of the
    requested result (phrase search is not what a token index answers —
    split the phrase into its tokens explicitly)."""
    import re

    out = sorted({str(t).strip().lower() for t in terms if t is not None})
    bad = [t for t in out if re.search(r"\s", t)]
    if bad:
        raise ValueError(
            f"terms must be single tokens (whitespace in {bad!r}); "
            "split phrases into their tokens"
        )
    return [t for t in out if t]


def postings_df(
    spark: "SparkSession", df: "DataFrame", config, files, tracker
) -> "DataFrame":
    """(token, _doc, _data_file_id) — one row per DISTINCT token per doc.
    array_distinct happens in-row before the explode (narrow), and
    explode_outer sidesteps InferFiltersFromGenerate re-evaluating the
    tokenizer in the scan task (same lesson as llm/dedup.py
    doc_shingles).  Lineage is always on: postings carry no row payload,
    so the only way to subtract a deleted source file exactly is by
    file id."""
    from pyspark.sql import functions as F

    from hyperspace_spark.config import DATA_FILE_ID_COLUMN
    from hyperspace_spark.indexes.covering import with_lineage
    from hyperspace_spark.llm.text import tokens

    src = with_lineage(df, spark, files, tracker)
    return (
        src.filter(F.col(config.text_col).isNotNull())
        .select(
            F.col(config.id_col).alias("_doc"),
            F.col(DATA_FILE_ID_COLUMN),
            F.explode_outer(
                F.array_distinct(tokens(F.col(config.text_col)))
            ).alias("token"),
        )
        .filter(F.col("token") != "")
        .select("token", "_doc", DATA_FILE_ID_COLUMN)
    )


def create_index_data(
    spark: "SparkSession",
    df: "DataFrame",
    config: InvertedTextIndexConfig,
    conf,
    files,
    tracker,
    data_dir: str,
    index_name: str,
    version: int,
) -> dict:
    from hyperspace_spark.indexes.covering import table_name, write_bucketed

    tbl = table_name(index_name, version)
    nb = config.num_buckets or conf.resolve_num_buckets(
        sum(f.size for f in files), spark.sparkContext.defaultParallelism
    )
    postings = postings_df(spark, df, config, files, tracker)
    write_bucketed(spark, postings, ["token"], nb, data_dir, tbl)
    return {
        "indexedColumns": ["token"],
        "includedColumns": ["_doc"],
        "numBuckets": nb,
        "lineage": True,
        "schemaJson": postings.schema.json(),
        "tableName": tbl,
        "textCol": config.text_col,
        "idCol": config.id_col,
    }


def text_search(
    spark: "SparkSession",
    entry,
    terms: Iterable,
    mode: str = "all",
    appended=None,
    deleted=None,
) -> "DataFrame":
    """Doc ids containing ALL (default) or ANY of the normalized terms.

    Hybrid-exact against source drift, the covering index's discipline:
    ``deleted`` source files' postings drop via the lineage anti-filter
    (the stale index still answers exactly); ``appended`` files' docs
    are tokenized on the fly (raw read of ONLY those files) and unioned
    in.  Both lists are computed by Hyperspace.text_search from live
    source state."""
    import json as _json

    from pyspark.sql import functions as F
    from pyspark.sql.types import StructType

    from hyperspace_spark.config import DATA_FILE_ID_COLUMN

    norm = normalize_terms(terms)
    if not norm:
        raise ValueError("no usable search terms after normalization")
    if mode not in ("all", "any"):
        raise ValueError("mode must be 'all' or 'any'")

    props = entry.derived_properties
    # Driver-side bucket-FILE pruning (the covering index's own
    # discipline — planner/mmh3.py is the Spark-compatible murmur3 and
    # covering._BUCKET_FILE_RE the one copy of the bucket-name
    # contract): Spark's bucketed-scan pruning is disabled by
    # autoBucketedScan whenever no operator consumes the token-hash
    # distribution — which is every probe, since the aggregate keys on
    # _doc.  Probing k terms reads <= k/numBuckets of the postings with
    # NO extra Spark job; an unparseable file name falls back to a full
    # posting read (never guess — silently excluding a file would drop
    # matches).
    from hyperspace_spark.indexes.covering import _BUCKET_FILE_RE
    from hyperspace_spark.planner.mmh3 import bucket_id

    nb = int(props["numBuckets"])
    wanted = {bucket_id(t, "string", nb) for t in norm}
    pq = [f for f in entry.content_files if f.path.endswith(".parquet")]
    files: list[str] | None = []
    if None in wanted:
        files = None
    else:
        for f in pq:
            m = _BUCKET_FILE_RE.search(f.path.rsplit("/", 1)[-1])
            if m is None:
                files = None  # unexpected layout: full read
                break
            if int(m.group(1)) in wanted:
                files.append(f.path)
    if files is None:
        files = [f.path for f in pq]
    schema = StructType.fromJson(_json.loads(props["schemaJson"]))
    if files:
        idx = spark.read.schema(schema).parquet(*files)
    else:
        idx = spark.createDataFrame([], schema)
    hits = idx.filter(F.col("token").isin(norm))
    if deleted:
        tracker = entry.file_id_tracker
        ids = [i for i in (tracker.get(f) for f in deleted) if i is not None]
        if ids:
            hits = hits.filter(~F.col(DATA_FILE_ID_COLUMN).isin(ids))
    hits = hits.select("token", "_doc")

    if appended:
        from hyperspace_spark.llm.text import tokens as _tokens

        rel = entry.relations[0]
        from hyperspace_spark.hyperspace import _relation_reader

        raw = _relation_reader(spark, rel, with_base_path=True).load(
            [f.path for f in appended]
        )
        raw_hits = (
            raw.filter(F.col(props["textCol"]).isNotNull())
            .select(
                F.col(props["idCol"]).alias("_doc"),
                F.explode_outer(
                    F.array_distinct(_tokens(F.col(props["textCol"])))
                ).alias("token"),
            )
            .filter(F.col("token").isin(norm))
            .select("token", "_doc")
        )
        hits = hits.unionByName(raw_hits)

    id_col = props["idCol"]
    if mode == "any":
        return hits.select(F.col("_doc").alias(id_col)).distinct()
    return (
        hits.groupBy("_doc")
        .agg(F.count_distinct("token").alias("_n"))
        .filter(F.col("_n") == len(norm))
        .select(F.col("_doc").alias(id_col))
    )
