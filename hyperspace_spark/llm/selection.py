"""Data selection by target-domain importance — the DSIR family
(Xie et al., "Data Selection for Language Models via Importance
Resampling", NeurIPS'23): given a small TARGET corpus that looks like
what the model should train on (wiki+books in the paper) and a huge RAW
corpus, score every raw document by how much more likely its tokens are
under the target's n-gram distribution than under the raw corpus's own,
then keep the top slice.  The published recipe hashes n-grams into
10^4 buckets and scores log p_target(x) - log p_raw(x) under bag-of-
features unigram models; this implementation keeps real unigram tokens
(no hash collisions to explain at audit time — the bucketed variant is
one ``F.crc32 % n_buckets`` away) with add-α smoothing over the joint
vocabulary.

Scale shape: two token-keyed count aggregates (target is SMALL by
construction — the paper uses ~10^5 docs against 10^9 raw), a full-outer
join of the two count tables into one log-ratio table (vocab-sized:
fits executor memory at any corpus size by Heaps' law, AQE broadcasts
it), then one explode + broadcast-join + doc-keyed sum over the raw
corpus — the same cost class as ``text.unigram_logprob``, whose oracle
conventions (round(…, 4), NULL text absent from output) this module
follows.  The corpus totals and vocabulary size ride the plan as 1-row
broadcasts — no driver-side ``collect()`` anywhere.

Reference note: microsoft/hyperspace has no document operators; this is
part of the LLM-training extension surface (SURVEY §2 extensions).
"""

from __future__ import annotations

from typing import TYPE_CHECKING

if TYPE_CHECKING:
    from pyspark.sql import DataFrame


def dsir_logratio_table(
    raw_df: "DataFrame",
    target_df: "DataFrame",
    text_col: str = "text",
    alpha: float = 0.5,
) -> "DataFrame":
    """-> (tok, logratio): per-token log(p_target / p_raw) under add-α
    smoothed unigram models over the JOINT vocabulary (a token seen only
    in one corpus gets the α floor in the other — without the floor,
    any raw-only token would score -inf and one typo would veto a
    document).  Persist this at scale: it is the model, and
    :func:`dsir_importance` accepts it via ``logratio_df`` so one build
    scores any number of raw shards."""
    from pyspark.sql import functions as F

    from hyperspace_spark.llm.text import tokens

    if alpha <= 0.0:
        raise ValueError("alpha must be > 0 (0 reintroduces -inf scores)")

    def counts(df, name):
        return (
            df.where(F.col(text_col).isNotNull())
            .select(F.explode(tokens(F.col(text_col))).alias("tok"))
            .groupBy("tok")
            .agg(F.count("*").alias(name))
        )

    joint = counts(raw_df, "_hs_cr").join(
        counts(target_df, "_hs_ct"), "tok", "full_outer"
    ).select(
        "tok",
        F.coalesce("_hs_cr", F.lit(0)).alias("_hs_cr"),
        F.coalesce("_hs_ct", F.lit(0)).alias("_hs_ct"),
    )
    totals = joint.agg(
        F.sum("_hs_cr").alias("_hs_nr"),
        F.sum("_hs_ct").alias("_hs_nt"),
        F.count("*").alias("_hs_v"),
    )
    a = F.lit(float(alpha))
    return joint.crossJoin(F.broadcast(totals)).select(
        "tok",
        (
            F.log((F.col("_hs_ct") + a) / (F.col("_hs_nt") + a * F.col("_hs_v")))
            - F.log((F.col("_hs_cr") + a) / (F.col("_hs_nr") + a * F.col("_hs_v")))
        ).alias("logratio"),
    )


def dsir_importance(
    raw_df: "DataFrame",
    target_df: "DataFrame | None" = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    alpha: float = 0.5,
    logratio_df: "DataFrame | None" = None,
) -> "DataFrame":
    """-> (doc_id, n_tokens, importance, importance_per_token): DSIR
    importance of every raw document, ``importance`` = Σ over the doc's
    token occurrences of log(p_target/p_raw) — positive means "more
    target-like than the raw average"; select by descending importance
    (the paper resamples ∝ exp(importance); a deterministic pipeline
    takes the top slice, e.g. with a window rank or
    ``sampling.deterministic_sample`` over the survivors).
    ``importance_per_token`` is the length-normalized variant — sums
    favor long documents, so rank on the column that matches the
    selection policy.  Both are round(…, 4) for cross-engine oracle
    stability (the ``unigram_logprob`` convention).

    Pass EITHER ``target_df`` (the model is built inline) or a persisted
    ``logratio_df`` from :func:`dsir_logratio_table`.  Documents with
    NULL text are absent from the output (no tokens ⇒ no evidence —
    same contract as ``unigram_logprob``)."""
    from pyspark.sql import functions as F

    from hyperspace_spark.llm.text import tokens

    if (target_df is None) == (logratio_df is None):
        raise ValueError("exactly one of target_df / logratio_df is required")
    if logratio_df is None:
        logratio_df = dsir_logratio_table(
            raw_df, target_df, text_col=text_col, alpha=alpha
        )

    toks = raw_df.where(F.col(text_col).isNotNull()).select(
        F.col(id_col).alias("doc_id"),
        F.explode(tokens(F.col(text_col))).alias("tok"),
    )
    # Left join + neutral 0.0: when scoring NEW raw shards against a
    # persisted model, out-of-vocabulary tokens carry no evidence either
    # way (an inner join would silently shorten the document instead).
    # The inline-built path never hits the coalesce — raw tokens are in
    # the joint vocab by construction.
    return (
        toks.join(logratio_df, "tok", "left")
        .select("doc_id", F.coalesce("logratio", F.lit(0.0)).alias("logratio"))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            # + 0.0 collapses IEEE -0.0 (a possible round() output when
            # the sum is a tiny negative) to +0.0 — engines disagree on
            # the sign bit's rendering, values are equal.
            (F.round(F.sum("logratio"), 4) + F.lit(0.0)).alias("importance"),
            (F.round(F.avg("logratio"), 4) + F.lit(0.0)).alias(
                "importance_per_token"
            ),
        )
    )
