"""LLM-data-pipeline operators: dedup, similarity search, text analysis,
multimodal column plumbing — first-class extensions beyond the reference
surface (BASELINE.json north star), built on the same Spark-first rules:
JVM built-ins in the hot path, Arrow-batched pandas UDFs only where
built-ins can't express the semantics, no driver-side loops over data.
"""
