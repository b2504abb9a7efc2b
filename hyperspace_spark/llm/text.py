"""Text analysis over document tables: token stats, quality scoring,
language ID, fingerprinting.

All operators are pure `pyspark.sql.functions` compositions (JVM-side,
whole-stage-codegen'd) — at 100 TB these run at scan speed with zero
Python in the loop.  Every function is deterministic so results can be
checked against a SQL oracle.
"""

from __future__ import annotations

from typing import TYPE_CHECKING

if TYPE_CHECKING:
    from pyspark.sql import Column, DataFrame

# Small fixed stopword lists; deterministic, latin-script oriented.
STOPWORDS = {
    "en": ["the", "a", "an", "and", "or", "of", "to", "in", "is", "on", "for", "with"],
    "es": ["el", "la", "los", "de", "y", "que", "en", "un", "una", "es", "por", "con"],
    "fr": ["le", "la", "les", "de", "et", "que", "en", "un", "une", "est", "pour", "avec"],
    "de": ["der", "die", "das", "und", "von", "zu", "mit", "ist", "ein", "eine", "auf", "nicht"],
}


def tokens(text_col: "Column") -> "Column":
    """Whitespace tokenization of trimmed, lowercased text."""
    from pyspark.sql import functions as F

    return F.split(F.trim(F.lower(text_col)), r"\s+")


def token_count(text_col: "Column") -> "Column":
    from pyspark.sql import functions as F

    t = F.trim(text_col)
    return F.when(F.length(t) == 0, F.lit(0)).otherwise(F.size(F.split(t, r"\s+")))


def bpe_ish_token_count(text_col: "Column") -> "Column":
    """Sub-word-ish token count: splits on whitespace AND
    letter/digit/punct boundaries — a cheap, deterministic BPE proxy
    (a real tokenizer is a pandas UDF away, but this stays JVM-side)."""
    from pyspark.sql import functions as F

    pieces = F.split(
        F.regexp_replace(
            F.regexp_replace(F.trim(text_col), r"([0-9]+|[^\sA-Za-z0-9])", r" $1 "),
            r"([A-Za-z]{4})(?=[A-Za-z])",
            r"$1 ",
        ),
        r"\s+",
    )
    return F.size(F.filter(pieces, lambda x: x != ""))


def punct_ratio(text_col: "Column") -> "Column":
    from pyspark.sql import functions as F

    t = F.trim(text_col)
    n_punct = F.length(t) - F.length(F.regexp_replace(t, r"[.,;:!?'\"()\[\]{}-]", ""))
    return F.when(F.length(t) == 0, F.lit(0.0)).otherwise(n_punct / F.length(t))


def stopword_ratio(text_col: "Column", lang: str = "en") -> "Column":
    from pyspark.sql import functions as F

    toks = tokens(text_col)
    sw = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    # array_contains instead of isin: lambda variables inside higher-order
    # functions don't support Column.isin in classic PySpark.
    hits = F.size(F.filter(toks, lambda x: F.array_contains(sw, x)))
    return F.when(F.size(toks) <= 0, F.lit(0.0)).otherwise(hits / F.size(toks))


def quality_score(text_col: "Column") -> "Column":
    """Deterministic [0,1] quality heuristic: length band + stopword
    presence + moderate punctuation + mean token length band.  The exact
    weights are arbitrary; what matters is that it is cheap, monotone in
    the obvious signals, and identical across engines."""
    from pyspark.sql import functions as F

    t = F.trim(text_col)
    n = F.length(t)
    ntok = token_count(text_col)
    mean_tok = F.when(ntok > 0, n / ntok).otherwise(F.lit(0.0))
    len_ok = F.when((n >= 100) & (n <= 20000), 0.4).otherwise(
        F.when(n > 0, 0.1).otherwise(0.0)
    )
    sw_ok = F.when(stopword_ratio(text_col) >= 0.05, 0.3).otherwise(0.0)
    punct_ok = F.when(punct_ratio(text_col) <= 0.2, 0.2).otherwise(0.0)
    tok_ok = F.when((mean_tok >= 3) & (mean_tok <= 12), 0.1).otherwise(0.0)
    return F.round(len_ok + sw_ok + punct_ok + tok_ok, 4)


def language_id(text_col: "Column") -> "Column":
    """N-gram/stopword-heuristic language ID over latin-script languages;
    returns 'und' (undetermined) when no list scores > 0.  Deterministic
    argmax with fixed priority order (en, es, fr, de) for ties.

    Shape: ONE pass over the token array accumulating all four stopword
    hit counts (zip_with against a nested stopword-list literal), then a
    strict-> argmax fold that keeps the earliest index on ties.  The
    previous chained-when formulation embedded each per-language filter
    (and therefore the tokenization) up to ~16x in one expression tree —
    measured 3.3 s -> 1.3 s at sf0.1 on identical outputs."""
    from pyspark.sql import functions as F

    toks = tokens(text_col)
    order = ["en", "es", "fr", "de"]  # tie-break priority
    sw_lit = F.lit([list(STOPWORDS[lang]) for lang in order])
    counts = F.aggregate(
        toks,
        F.array_repeat(F.lit(0), len(order)),
        lambda acc, x: F.zip_with(
            acc,
            F.transform(sw_lit, lambda sw: F.array_contains(sw, x).cast("int")),
            lambda a, c: a + c,
        ),
    )
    best = F.aggregate(
        F.zip_with(
            counts,
            F.lit(list(range(len(order)))),
            lambda c, i: F.struct(c.alias("c"), i.alias("i")),
        ),
        F.struct(F.lit(0).alias("c"), F.lit(-1).alias("i")),
        lambda acc, x: F.when(x["c"] > acc["c"], x).otherwise(acc),
    )
    return (
        F.when(best["c"] >= 1, F.element_at(F.lit(order), best["i"] + 1))
        .otherwise(F.lit("und"))
    )


def fingerprint(text_col: "Column") -> "Column":
    """Whole-document fingerprint: md5 of whitespace-normalized lowercase
    text — the exact-dedup key."""
    from pyspark.sql import functions as F

    return F.md5(F.regexp_replace(F.trim(F.lower(text_col)), r"\s+", " "))


def shingle_fingerprint(text_col: "Column", k: int = 5) -> "Column":
    """Winnowing-style content fingerprint: minimum md5 over word
    k-shingles — stable under small edits, unlike the whole-doc hash."""
    from pyspark.sql import functions as F

    sh = word_shingles(text_col, k)
    return F.array_min(F.transform(sh, F.md5))


def word_shingles(text_col: "Column", n: int) -> "Column":
    """Array of word n-gram shingle strings (JVM higher-order functions)."""
    from pyspark.sql import functions as F

    toks = tokens(text_col)
    return F.when(F.size(toks) < n, F.array(F.array_join(toks, " "))).otherwise(
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - n + 1),
            lambda i: F.array_join(F.slice(toks, i, n), " "),
        )
    )


def text_stats(df: "DataFrame", text_col: str = "text", id_col: str = "doc_id") -> "DataFrame":
    """One row per document with the full stats vector."""
    from pyspark.sql import functions as F

    from hyperspace_spark.scale import ensure_min_parallelism

    df = ensure_min_parallelism(df)
    t = F.col(text_col)
    return df.select(
        F.col(id_col),
        F.length(F.trim(t)).alias("n_chars_text"),
        token_count(t).alias("n_tokens"),
        bpe_ish_token_count(t).alias("n_subword_tokens"),
        F.round(punct_ratio(t), 4).alias("punct_ratio"),
        F.round(stopword_ratio(t), 4).alias("stopword_ratio"),
        quality_score(t).alias("quality_score"),
        language_id(t).alias("lang_pred"),
        fingerprint(t).alias("fingerprint"),
    )


def chunk_text_udtf(size: int = 64, overlap: int = 16):
    """Python UDTF (Spark 3.5+ table function) that splits each document
    into overlapping context-window chunks of at most ``size`` whitespace
    words, stepping ``size - overlap`` words — the standard shape for
    RAG / training-example windowing.

    This is the §2.B UDTF surface: genuinely generative row logic (one
    input row -> a data-dependent number of output rows with computed
    payloads) where a table function is the idiomatic tool.  It is
    row-at-a-time Python — the deliberate slow path; every hot-loop
    operator in this package stays in JVM expressions or Arrow batches.
    Usage::

        spark.udtf.register("chunk_text", chunk_text_udtf(64, 16))
        spark.sql("SELECT * FROM chunk_text(TABLE(docs))")

    Deterministic and engine-portable: ``str.split()`` (whitespace runs,
    empties dropped) + slice bounds match a SQL replica via
    regexp_split_to_array + list slices, so the driver contract verifies
    it against a DuckDB oracle (workload.py ``udtf_chunk_text``).
    """
    from pyspark.sql.functions import udtf

    step = max(1, size - overlap)

    @udtf(returnType="doc_id bigint, chunk_idx int, n_words int, chunk string")
    class ChunkText:
        def eval(self, row):
            text = row["text"]
            if text is None:
                return
            words = text.split()
            n = len(words)
            for ci, start in enumerate(range(0, max(n, 1), step)):
                w = words[start : start + size]
                if not w:
                    break
                # A trailing chunk whose end does not pass the PREVIOUS
                # chunk's end (prev covers [start-step, start-step+size),
                # i.e. through start+overlap) is fully contained in it —
                # emitting it would inject exact sub-duplicate windows
                # into the training corpus.  Starts increase, so the
                # first contained chunk ends the loop.
                if start > 0 and start + len(w) <= start + (size - step):
                    break
                yield row["doc_id"], ci, len(w), " ".join(w)

    return ChunkText


def unigram_logprob(
    df: "DataFrame", text_col: str = "text", id_col: str = "doc_id"
) -> "DataFrame":
    """-> (doc_id, n_tokens, mean_neg_logprob): per-document mean
    negative log-probability under the CORPUS'S OWN unigram model — the
    deterministic core of the CCNet/KenLM-style perplexity filter
    (documents whose tokens are improbable under the corpus distribution
    are gibberish, boilerplate, or wrong-language; high score = filter
    candidate).  A real deployment swaps the self-model for a reference
    LM's frequency table; the plumbing (model build, score join) is
    identical and this version needs no external model file.

    Scale shape: building the model is one explode + token-keyed
    groupBy — a corpus shuffle, same cost class as an index build, paid
    once (persist the freq table as a derived dataset for reuse).  The
    scoring pass joins exploded tokens against the frequency table
    (vocab after min-count pruning fits executor memory at any corpus
    size — Heaps' law; AQE broadcasts it) and reduces per doc.  No
    driver-side state: the corpus total rides along as a 1-row
    broadcast, never a collect().

    Docs with NULL text (no tokens) are absent from the output —
    upstream gates (clean_corpus null_text) own that case."""
    from pyspark.sql import functions as F

    toks = df.select(
        F.col(id_col).alias("doc_id"), F.explode(tokens(F.col(text_col))).alias("tok")
    )
    freqs = toks.groupBy("tok").agg(F.count("*").alias("_hs_c"))
    total = freqs.agg(F.sum("_hs_c").alias("_hs_tot"))
    return (
        toks.join(freqs, "tok")
        .crossJoin(F.broadcast(total))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.round(
                F.avg(-F.log(F.col("_hs_c") / F.col("_hs_tot"))), 4
            ).alias("mean_neg_logprob"),
        )
    )


def top_ngrams(
    df: "DataFrame",
    n: int = 2,
    k: int = 5,
    by: str = "lang",
    text_col: str = "text",
) -> "DataFrame":
    """Top-k most frequent word n-grams per group — the corpus
    diagnostic run before boilerplate stripping and contamination
    triage (a gram that tops every group is template text; one that
    tops a single source is that crawler's furniture).

    Output: (by, gram, cnt, rn), rn = 1..k per group, ties broken
    lexicographically on the gram for determinism.

    Shape at 100 TB: the exploded grams feed ONE map-side-combined
    groupBy (the only corpus-sized shuffle; a gram occurring 10^9 times
    folds into one row per partition before the exchange), and the
    top-k window runs over per-group aggregates — rows ~ distinct grams,
    not corpus tokens.  explode_outer for the same
    InferFiltersFromGenerate reason as doc_shingles."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    grams = (
        df.filter(F.col(text_col).isNotNull())
        .select(F.col(by), tokens(F.col(text_col)).alias("_t"))
        .filter(F.size("_t") >= n)
        .select(
            by,
            F.explode_outer(
                F.transform(
                    F.sequence(F.lit(1), F.size("_t") - n + 1),
                    lambda i: F.array_join(F.slice("_t", i, n), " "),
                )
            ).alias("gram"),
        )
    )
    counted = grams.groupBy(by, "gram").agg(F.count("*").alias("cnt"))
    w = W.partitionBy(by).orderBy(F.col("cnt").desc(), "gram")
    return counted.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= k)
