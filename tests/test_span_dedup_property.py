"""Property-based check of remove_repeated_spans (hypothesis): for ANY
small corpus over a tiny token alphabet (engineered so repeated 3-grams
are common), the Spark pipeline must equal a direct pure-Python
implementation of the spec — every occurrence of a duplicated n-gram
except the global (doc_id, position) first is cut, covered positions
union, survivors re-join with single spaces.

The Python reference is an independent O(corpus²)-ish re-derivation, not
a refactor of the Spark code, so a shared bug cannot hide.
"""

from __future__ import annotations

from collections import defaultdict

import pytest
from hypothesis import HealthCheck, given, settings

from tests.conftest import hyp_examples
from hypothesis import strategies as st

N = 3  # small n so tiny random docs actually produce duplicate spans


def reference_span_dedup(docs: dict[int, list[str]], n: int):
    """Spec: group n-grams; for count>=2 keep only the min (doc, pos)
    occurrence; covered token positions (1-based) drop."""
    occs = defaultdict(list)  # gram -> [(doc_id, pos)]
    for did in sorted(docs):
        toks = docs[did]
        for i in range(len(toks) - n + 1):
            occs[tuple(toks[i : i + n])].append((did, i + 1))
    removed = defaultdict(set)  # doc_id -> {token positions}
    for gram, lst in occs.items():
        if len(lst) < 2:
            continue
        first = min(lst)
        for did, pos in lst:
            if (did, pos) != first:
                removed[did].update(range(pos, pos + n))
    out = {}
    for did, toks in docs.items():
        kept = [t for i, t in enumerate(toks, start=1) if i not in removed[did]]
        out[did] = (len(toks), len(toks) - len(kept), " ".join(kept))
    return out


corpus_strategy = st.dictionaries(
    keys=st.integers(min_value=0, max_value=30),
    values=st.lists(st.sampled_from(["a", "b", "c"]), min_size=0, max_size=12),
    min_size=1,
    max_size=8,
)


@pytest.mark.usefixtures("spark")
@settings(max_examples=hyp_examples(25), deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(corpus=corpus_strategy)
def test_remove_repeated_spans_matches_reference(spark, corpus):
    from hyperspace_spark.llm import dedup

    rows = [(did, " ".join(toks) if toks else "") for did, toks in corpus.items()]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: (r.n_tokens, r.n_removed, r.cleaned_text)
        for r in dedup.remove_repeated_spans(df, n=N).collect()
    }
    dedup.release_caches()
    # Tokenization parity with the engine: empty text -> [''] (one empty
    # token), same as split(trim(lower('')), '\s+').
    norm = {
        did: " ".join(toks).strip().lower().split(" ")
        for did, toks in corpus.items()
    }
    want = reference_span_dedup(norm, N)
    assert got == want


def test_remove_repeated_spans_self_repetitive_doc_is_linear(spark):
    """A pathologically self-repetitive document (one token repeated 40k
    times) must complete fast: the r9 gap-walk rebuild is O(n log n)
    per row, where the old per-token array_contains was O(n^2) (~1.6e9
    comparisons on one executor thread for this doc)."""
    import time

    from hyperspace_spark.llm import dedup

    n_rep = 40_000
    df = spark.createDataFrame(
        [(1, " ".join(["tok"] * n_rep)), (2, "a unique document here")],
        "doc_id long, text string",
    )
    t0 = time.perf_counter()
    rows = {r.doc_id: r for r in dedup.remove_repeated_spans(df, n=8).collect()}
    wall = time.perf_counter() - t0
    dedup.release_caches()
    # every 8-gram repeats; only the globally-first occurrence's span
    # survives uncovered... all positions from 2..n are covered starts,
    # so tokens 1..8 of the first span survive? No: spans at 2..n-7 are
    # non-first occurrences -> covered positions 2..n. Kept = position 1.
    assert rows[1].n_tokens == n_rep
    assert rows[1].n_removed == n_rep - 1
    assert rows[1].cleaned_text == "tok"
    assert rows[2].n_removed == 0
    assert wall < 60, f"self-repetitive doc took {wall:.1f}s — quadratic path?"
