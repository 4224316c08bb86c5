"""LLM-data-pipeline operators — the engine's extension family beyond
the reference's own surface (BASELINE.json north star):

* :mod:`.textprep`   — tokenization / shingling shared builders
* :mod:`.dedup`      — exact, n-gram-Jaccard, MinHash-LSH and SimHash
  document deduplication
* :mod:`.similarity` — embedding cosine top-k, near-dup pairs, and
  LSH-bucketed approximate nearest neighbours
* :mod:`.text_analysis` — language ID, quality scoring, token counts,
  fingerprinting
* :mod:`.multimodal` — opaque-binary payload columns with typed
  metadata and Arrow-batched feature extraction

All operators are DataFrame-native (JVM-side built-ins; Pandas UDFs only
where Spark genuinely lacks the primitive) and are designed around one
rule for the 100 TB deployment: **candidate generation must be a
shuffle on a bucket key, never an all-pairs crossJoin.** Exact
quadratic variants exist solely as correctness oracles for the bucketed
paths and for modest inputs.
"""
