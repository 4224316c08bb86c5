"""Text analysis over the documents table — language ID, quality
scoring, token statistics, fingerprinting.

Everything is built-in column expressions (whole-stage codegen; no
UDFs), so at 100 TB these are embarrassingly-parallel narrow maps plus
one hash-aggregate where noted. Each operator is mirrored by an exact
DuckDB oracle; arithmetic sticks to int/int → double divisions so both
engines produce bit-identical values.

* :func:`token_stats` — whitespace token count, regex (BPE-ish) token
  count, punctuation count/ratio, mean token length.
* :func:`quality_score` — deterministic [0, 1] quality heuristic from
  length, punctuation and stopword ratios (the standard cheap filters
  in front of a training-data pipeline).
* :func:`lang_id` — marker-word n-gram heuristic: score each candidate
  language by its marker hit count; best (count desc, lang asc) wins,
  zero hits → 'und'. One explode + one broadcast join + one aggregate.
* :func:`fingerprint` — order-independent document fingerprint: the
  lexicographic minimum of the shingle md5s (a 1-hash MinHash) plus the
  exact normalized-text md5.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .textprep import shingle_expr, tokens

#: BPE-ish token regex: letter runs, digit runs, single other symbols.
#: Kept to a dialect-portable subset (same semantics in Java regex and
#: DuckDB's RE2).
TOKEN_RE = "[a-z]+|[0-9]+|[^a-z0-9 ]"

#: punctuation = anything outside [a-z0-9<space>] after lower()
PUNCT_RE = "[^a-z0-9 ]"

#: marker words per language for the heuristic language ID. English
#: markers double as generic stopwords for the quality score.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and", "to", "in", "is"],
    "de": ["der", "die", "das", "und", "ist", "nicht"],
    "es": ["el", "la", "de", "que", "y", "es"],
    "fr": ["le", "la", "et", "les", "des", "est"],
}

STOPWORDS = LANG_MARKERS["en"]


def token_stats(docs: DataFrame, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """Per-document token statistics — one narrow projection."""
    low = F.lower(F.trim(F.col(text_col)))
    ws = tokens(text_col)
    re_toks = F.regexp_extract_all(low, F.lit(TOKEN_RE), F.lit(0))
    n_punct = F.size(F.regexp_extract_all(low, F.lit(PUNCT_RE), F.lit(0)))
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.length(low).alias("n_chars"),
        F.size(ws).alias("n_tokens"),
        F.size(re_toks).alias("n_re_tokens"),
        n_punct.alias("n_punct"),
        _punct_ratio(low, n_punct).alias("punct_ratio"),
        # split(" ") of any string yields >= 1 token ([""] for empty
        # text), so this denominator can never be zero
        (F.length(low).cast("double") / F.size(ws)).alias("mean_token_len"),
    )


def _punct_ratio(low, n_punct):
    """punct/chars with the empty-text AND null-text branches pinned to
    0.0. An empty or whitespace-only doc has length(low) = 0, and ANSI
    mode (Spark 4 default) raises DIVIDE_BY_ZERO instead of returning
    NULL; a NULL text makes the WHEN predicate NULL, so the division
    branch is never taken and the coalesce pins the result. Both match
    the oracles' coalesce(x / nullif(len, 0), 0.0), which also yields
    0.0 for NULL text (NULL/NULL -> NULL -> 0.0) — ADVICE r9 found the
    previous WHEN length == 0 shape fell through to NULL on NULL text.
    CASE WHEN short-circuits, so the ANSI division only evaluates when
    length(low) > 0."""
    return F.coalesce(
        F.when(F.length(low) > 0, n_punct.cast("double") / F.length(low)),
        F.lit(0.0))


def quality_score(docs: DataFrame, id_col: str = "doc_id",
                  text_col: str = "text") -> DataFrame:
    """[0, 1] quality heuristic:

        0.4·min(n_tokens, 64)/64            (enough content)
      + 0.3·(1 − punct_ratio)               (not symbol soup)
      + 0.3·min(stop_ratio·5, 1)            (looks like prose)

    Deterministic double arithmetic, identical on the oracle side."""
    low = F.lower(F.trim(F.col(text_col)))
    ws = tokens(text_col)
    n_tokens = F.size(ws)  # split(" ") yields >= 1 token, never 0
    punct_ratio = _punct_ratio(
        low, F.size(F.regexp_extract_all(low, F.lit(PUNCT_RE), F.lit(0))))
    stop_hits = F.size(F.filter(ws, _isin_any))
    stop_ratio = stop_hits.cast("double") / n_tokens
    length_term = F.least(n_tokens, F.lit(64)).cast("double") / 64.0
    prose_term = F.least(stop_ratio * 5.0, F.lit(1.0))
    score = 0.4 * length_term + 0.3 * (1.0 - punct_ratio) \
        + 0.3 * prose_term
    return docs.select(
        F.col(id_col).alias("doc_id"),
        n_tokens.alias("n_tokens"),
        punct_ratio.alias("punct_ratio"),
        stop_ratio.alias("stop_ratio"),
        score.alias("quality"),
    )


def _isin_any(t):
    cond = None
    for s in STOPWORDS:
        c = t == F.lit(s)
        cond = c if cond is None else cond | c
    return cond


def lang_id(docs: DataFrame, id_col: str = "doc_id",
            text_col: str = "text",
            markers: dict[str, list[str]] | None = None) -> DataFrame:
    """Heuristic language ID: explode tokens, broadcast-join the marker
    table, count hits per (doc, lang), keep the best (count desc, lang
    asc); no hits → 'und'. Shuffle keys: token join is broadcast (the
    marker table is tiny and fixed), then one aggregate on doc_id."""
    m = markers or LANG_MARKERS
    spark = docs.sparkSession
    marker_rows = [(lang, w) for lang, ws in m.items() for w in ws]
    mdf = spark.createDataFrame(marker_rows, "lang string, w string")
    ex = docs.select(F.col(id_col).alias("doc_id"),
                     F.explode(tokens(text_col)).alias("w"))
    hits = (ex.join(F.broadcast(mdf), "w")
            .groupBy("doc_id", "lang").agg(F.count(F.lit(1)).alias("c")))
    w_best = Window.partitionBy("doc_id").orderBy(F.col("c").desc(), "lang")
    best = (hits.withColumn("rn", F.row_number().over(w_best))
            .filter(F.col("rn") == 1)
            .select("doc_id", F.col("lang").alias("pred_lang"),
                    F.col("c").alias("marker_hits")))
    return (docs.select(F.col(id_col).alias("doc_id"),
                        F.col("lang").alias("labeled_lang"))
            .join(best, "doc_id", "left_outer")
            .na.fill({"pred_lang": "und", "marker_hits": 0})
            .orderBy("doc_id"))


def fingerprint(docs: DataFrame, k: int = 3, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """Exact + fuzzy document fingerprints: md5 of the normalized text
    (exact identity) and min(md5(shingle)) (a 1-hash MinHash — equal
    for heavily-overlapping documents with high probability)."""
    low = F.lower(F.trim(F.col(text_col)))
    sh = docs.select(F.col(id_col).alias("doc_id"),
                     F.md5(low).alias("exact_fp"),
                     F.col(text_col).alias("_t")) \
        .withColumn("t", tokens("_t")) \
        .withColumn("s", shingle_expr("t", k))
    return (sh.select("doc_id", "exact_fp",
                      F.array_min(F.transform("s", F.md5))
                      .alias("shingle_fp"))
            .orderBy("doc_id"))


def top_ngrams(docs: DataFrame, k: int = 2, top: int = 100,
               id_col: str = "doc_id",
               text_col: str = "text") -> DataFrame:
    """Corpus-wide top-N ``k``-gram frequencies — the word-count shape
    at corpus scale: explode k-grams, one hash-aggregate on the gram
    string (map-side partial counts carry one row per distinct gram per
    partition), top-N via `limit` after sort. Duplicate k-grams within
    a document count every occurrence (no distinct), so the numbers are
    true corpus frequencies."""
    toks = docs.select(F.col(id_col).alias("doc_id"),
                       tokens(text_col).alias("t"))
    joined = ", ".join(f"t[i + {j}]" for j in range(k))
    grams = toks.select(F.explode(F.expr(
        f"CASE WHEN size(t) >= {k} THEN "
        f"transform(sequence(0, size(t) - {k}), "
        f"i -> concat_ws(' ', {joined})) "
        f"ELSE array() END")).alias("gram"))
    return (grams.groupBy("gram")
            .agg(F.count(F.lit(1)).alias("n"))
            .orderBy(F.col("n").desc(), "gram")
            .limit(top))


def lang_stats(docs: DataFrame, id_col: str = "doc_id",
               text_col: str = "text",
               lang_col: str = "lang") -> DataFrame:
    """Per-language corpus statistics — one hash-aggregate over the
    labeled language: document count, char/token totals and means.
    int/int → double divisions only, so the oracle reproduces values
    bit-for-bit."""
    low = F.lower(F.trim(F.col(text_col)))
    n_tokens = F.size(tokens(text_col))
    return (docs.select(F.col(lang_col).alias("lang"),
                        F.length(low).alias("nc"),
                        n_tokens.alias("nt"))
            .groupBy("lang")
            .agg(F.count(F.lit(1)).alias("docs"),
                 F.sum("nc").alias("total_chars"),
                 F.sum("nt").alias("total_tokens"),
                 (F.sum("nc").cast("double")
                  / F.count(F.lit(1))).alias("mean_chars"),
                 (F.sum("nt").cast("double")
                  / F.count(F.lit(1))).alias("mean_tokens"))
            .orderBy("lang"))


def tfidf_top_terms(docs: DataFrame, k: int = 5, id_col: str = "doc_id",
                    text_col: str = "text",
                    log_idf: bool = False) -> DataFrame:
    """Top-``k`` most distinctive terms per document by tf-idf.

    Shape at scale: one explode + two hash aggregates (term counts per
    doc, then document frequency per term — both shuffle on the term)
    + a broadcast of the small (term, dft) side + one window top-k per
    doc. Nothing quadratic; the dft table is ≤ |vocabulary| rows.

    ``log_idf=False`` (default) scores with the RATIONAL idf
    ``(N+1)/(dft+1)``: multiplication and division are IEEE-correctly
    rounded in every engine, so scores and ranks are bit-identical
    cross-engine and the query stays hash-checkable. ``log_idf=True``
    is the textbook ``ln((N+1)/(dft+1))`` — monotone-identical per
    fixed tf, but ``ln`` is only faithfully (not correctly) rounded in
    some runtimes, so cross-engine rank stability cannot be guaranteed;
    use it in production, not under an exact oracle."""
    tok = docs.select(F.col(id_col).alias("doc_id"),
                      F.explode(tokens(text_col)).alias("term"))
    tf = (tok.groupBy("doc_id", "term")
          .agg(F.count(F.lit(1)).alias("tf")))
    dft = tf.groupBy("term").agg(F.count(F.lit(1)).alias("dft"))
    n = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = tf.join(F.broadcast(dft), "term").crossJoin(F.broadcast(n))
    if log_idf:
        score = F.col("tf") * F.log((F.col("n_docs") + F.lit(1.0))
                                    / (F.col("dft") + F.lit(1.0)))
    else:
        score = (F.col("tf") * (F.col("n_docs") + F.lit(1))) \
            .cast("double") / (F.col("dft") + F.lit(1))
    w = Window.partitionBy("doc_id").orderBy(
        F.col("score").desc(), F.col("term"))
    return (scored.withColumn("score", score)
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("doc_id", "term", "tf", "dft", "score", "rank")
            .orderBy("doc_id", "rank"))


def _sliding_grams(tok_sql: str, n: int):
    """Sliding ``n``-token windows of the token array named by
    ``tok_sql`` (full windows only; docs shorter than ``n`` contribute
    none). Pure higher-order expression — a narrow map."""
    joined = ", ".join(f"{tok_sql}[i + {j}]" for j in range(n))
    return F.expr(
        f"CASE WHEN size({tok_sql}) >= {n} THEN "
        f"transform(sequence(0, size({tok_sql}) - {n}), "
        f"i -> concat_ws(' ', {joined})) "
        f"ELSE array() END")


def repetition_stats(docs: DataFrame, ns: tuple = (2, 3),
                     id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """Gopher-style within-document repetition signals (Rae et al. 2021,
    'Scaling Language Models' §A1.1 — the repetition filters): for each
    n in ``ns`` the fraction of n-gram occurrences belonging to n-grams
    that repeat within the document (``dup_{n}gram_frac``) and the
    occurrence share of the single most frequent n-gram
    (``top_{n}gram_frac``), plus the distinct-token ratio.

    Shape at scale (r12, guide §2.4 + §4.2): every statistic here is a
    PER-DOCUMENT function of the token array, so no shuffle is needed
    at all — the old shape hash-aggregated exploded (doc, n, gram)
    rows corpus-wide (a corpus-sized exchange of gram strings) purely
    to get per-doc counts back. One Arrow kernel pass now computes all
    of it inside the scan stage: tokens are dictionary-encoded with an
    exact factorization (no hashing — collisions impossible), n-gram
    occurrences count via vectorized group-bys, and only the final
    orderBy moves data. Per-task state is bounded by the batch's token
    count — the same bound the input rows already paid. Counts are
    exact integers and every fraction is the same int/int → double
    division the oracle runs, so values stay bit-identical."""
    ns = tuple(ns)
    toks = docs.select(F.col(id_col).alias("doc_id"),
                       tokens(text_col).alias("t"))
    fields = ["doc_id long", "n_tokens int",
              "distinct_token_ratio double"]
    for n in ns:
        fields += [f"dup_{n}gram_frac double", f"top_{n}gram_frac double"]
    schema = ", ".join(fields)

    def kernel(batches):
        import numpy as np
        import pandas as pd

        from ..arrow_guard import exact_longs

        for pdf in batches:
            m = len(pdf)
            if not m:
                continue
            doc_ids = exact_longs(pdf["doc_id"], "doc_id").to_numpy()
            arrs = [np.asarray(a, dtype=object) for a in pdf["t"]]
            sizes = np.fromiter((len(a) for a in arrs),
                                dtype=np.int64, count=m)
            flat = (np.concatenate(arrs) if int(sizes.sum())
                    else np.empty(0, dtype=object))
            didx = np.repeat(np.arange(m, dtype=np.int64), sizes)
            # exact dictionary encoding: equal strings ↔ equal codes
            codes = pd.factorize(flat)[0].astype(np.int64)
            uniq = (pd.DataFrame({"d": didx, "c": codes})
                    .groupby("d", sort=False)["c"].nunique())
            n_uniq = np.zeros(m, dtype=np.int64)
            n_uniq[uniq.index.to_numpy()] = uniq.to_numpy()
            out = {
                "doc_id": doc_ids,
                "n_tokens": sizes.astype(np.int32),
                "distinct_token_ratio": [
                    float(n_uniq[i]) / float(sizes[i])
                    if sizes[i] else None for i in range(m)],
            }
            for n in ns:
                # gram start positions: windows fully inside one doc
                span = max(len(codes) - n + 1, 0)
                valid = (didx[:span] == didx[n - 1:n - 1 + span]
                         if span else np.zeros(0, dtype=bool))
                key_cols = {"d": didx[:span][valid]}
                for j in range(n):
                    key_cols[f"w{j}"] = codes[j:j + span][valid]
                total = np.maximum(sizes - (n - 1), 0)
                top = np.zeros(m, dtype=np.int64)
                single = np.zeros(m, dtype=np.int64)
                if len(key_cols["d"]):
                    cnt = (pd.DataFrame(key_cols)
                           .groupby(list(key_cols), sort=False)
                           .size().reset_index(name="c"))
                    d = cnt["d"].to_numpy()
                    c = cnt["c"].to_numpy()
                    np.maximum.at(top, d, c)
                    np.add.at(single, d[c == 1], 1)
                # dup occurrences = total − grams occurring exactly once
                dup = total - single
                out[f"dup_{n}gram_frac"] = [
                    float(dup[i]) / float(total[i])
                    if total[i] else None for i in range(m)]
                out[f"top_{n}gram_frac"] = [
                    float(top[i]) / float(total[i])
                    if total[i] else None for i in range(m)]
            yield pd.DataFrame(out)

    return toks.mapInPandas(kernel, schema).orderBy("doc_id")


def bm25_topk(docs: DataFrame, query_terms: list[str], k: int = 25,
              id_col: str = "doc_id", text_col: str = "text",
              scale: int = 1_000_000) -> DataFrame:
    """Top-``k`` documents for a bag-of-terms query under BM25 with a
    rational idf (no ``ln`` — same reason as :func:`tfidf_top_terms`:
    cross-engine rank/hash stability).

    Per (doc, term):

        idf   = (N + 1) / (dft + 1)
        norm  = tf + k1*(1 - b) + k1*b*dl/avgdl        (k1=1.2, b=0.75)
        score = idf * tf * (k1 + 1) / norm

    k1 and b are FIXED at the standard 1.2 / 0.75: the cross-
    multiplied integer algebra below (10/3/9/22) encodes them exactly,
    which is what makes every factor an exact int64 — generic
    parameters would need per-call rational scaling and a matching
    oracle rewrite. (An earlier signature accepted k1_num/b_num and
    silently ignored them.)

    int64 range: ``num = 22·S·tf·(N+1)`` must stay below 2^63, which
    bounds S·tf·N ≲ 4·10^17 — comfortable for any single-query corpus
    this engine benches (sf0.1: S ≈ 6·10^6), but a 100 TB corpus
    (S ≈ 10^13, N ≈ 10^10) overflows; at that scale promote the two
    products to DECIMAL(38,0) on BOTH engines (the same escape
    :func:`unigram_lm_score` documents).

    Each factor is an exact-int → double conversion or a single
    correctly-rounded op evaluated in the SAME expression tree by both
    engines, so per-term scores are bit-identical. The per-document
    SUM over query terms, however, is order-dependent in floating
    point, so the per-term score is first quantized to an int64
    (``floor(score * scale)``) and the sum runs in exact integer
    arithmetic — the same int64-quantized-partial-sums trick as the
    Lloyd trainer oracle in `similarity.py`.

    Scale shape: the corpus side is one explode restricted to the query
    terms (``array_contains`` prunes before the explode), one hash
    aggregate for tf, a broadcast of the ≤|query| row dft/stats side,
    and one global top-k sort of per-doc scores. Nothing quadratic; the
    corpus is scanned once.
    """
    qlit = F.array(*[F.lit(t) for t in sorted(set(query_terms))])
    toks = docs.select(F.col(id_col).alias("doc_id"),
                       tokens(text_col).alias("t"))
    toks = toks.withColumn("dl", F.size("t"))
    # corpus stats: N docs, total tokens (avgdl = S/N kept as the exact
    # pair, folded into the norm by cross-multiplication below)
    stats = toks.agg(F.count(F.lit(1)).alias("n_docs"),
                     F.sum("dl").alias("s_tokens"))
    hits = (toks.select("doc_id", "dl",
                        F.explode(F.array_intersect("t", qlit))
                        .alias("term"),
                        F.col("t"))
            .withColumn("tf",
                        F.expr("size(filter(t, x -> x = term))"))
            .drop("t"))
    dft = hits.groupBy("term").agg(F.count(F.lit(1)).alias("dft"))
    scored = (hits.join(F.broadcast(dft), "term")
              .crossJoin(F.broadcast(stats)))
    # norm * 10*S  =  10*S*tf + 3*S + 9*dl*N   (exact int64)
    norm10s = (F.lit(10) * F.col("s_tokens") * F.col("tf")
               + F.lit(3) * F.col("s_tokens")
               + F.lit(9) * F.col("dl") * F.col("n_docs"))
    # score = (N+1)/(dft+1) * tf*2.2*10*S / norm10s — kept as
    # double((exact int)) / double((exact int)) * double((exact int))
    # with one division then one multiply, same tree both engines
    num = (F.lit(22) * F.col("s_tokens") * F.col("tf")
           * (F.col("n_docs") + F.lit(1))).cast("double")
    den = (norm10s * (F.col("dft") + F.lit(1))).cast("double")
    score_q = F.floor(num / den * F.lit(float(scale))).cast("long")
    per_doc = (scored.withColumn("score_q", score_q)
               .groupBy("doc_id")
               .agg(F.sum("score_q").alias("score_q"),
                    F.count(F.lit(1)).alias("n_terms_hit")))
    return (per_doc
            .orderBy(F.col("score_q").desc(), F.col("doc_id"))
            .limit(k)
            .select("doc_id", "n_terms_hit", "score_q"))


def doc_chunks(docs: DataFrame, size: int = 32, stride: int = 24,
               id_col: str = "doc_id",
               text_col: str = "text") -> DataFrame:
    """Overlapping token-window chunking — the RAG / context-window
    preprocessing step: each document becomes ⌈n_tokens/stride⌉ chunks
    of up to ``size`` tokens starting every ``stride`` tokens
    (``size - stride`` tokens of overlap carry context across chunk
    boundaries).

    Pure higher-order column expressions (sequence → posexplode →
    slice) — a narrow map with no shuffle at all until the final
    ordering, so at 100 TB this runs at scan speed and the chunk rows
    can stream straight into a partitioned sink. Chunk identity is
    carried as md5(chunk_text) so the output stays small; downstream
    exact-dedup over chunks joins on that hash (`pipeline/clean.py`'s
    chunk_dedup).
    """
    toks = docs.select(F.col(id_col).alias("doc_id"),
                       tokens(text_col).alias("t"))
    starts = F.expr(f"sequence(0, size(t) - 1, {stride})")
    return (toks
            .select("doc_id", "t",
                    F.posexplode(starts).alias("chunk_idx", "start_tok"))
            .select("doc_id", "chunk_idx", "start_tok",
                    F.slice(F.col("t"), F.col("start_tok") + 1, size)
                    .alias("c"))
            .select("doc_id", "chunk_idx", "start_tok",
                    F.size("c").alias("n_tok"),
                    F.md5(F.concat_ws(" ", "c")).alias("chunk_hash"))
            .orderBy("doc_id", "chunk_idx"))


def bigram_novelty(docs: DataFrame, k: int = 25,
                   id_col: str = "doc_id",
                   text_col: str = "text") -> DataFrame:
    """The ``k`` most "novel" documents by mean corpus-frequency of
    their bigrams — a statistical-LM quality signal (documents whose
    word transitions are rare corpus-wide are outliers: noise, code,
    boilerplate, or genuinely novel text — exactly what a perplexity
    filter flags, minus the language model).

    The score is the arithmetic mean of each bigram's corpus count —
    integer sums with ONE final division to double, so unlike a
    log-probability sum it is order-independent and bit-identical
    cross-engine (same reason `tfidf_top_terms` uses a rational idf).

    Scale shape: one explode, one hash aggregate on the bigram for
    corpus counts, one shuffle join back on the bigram (the count side
    is |vocab²| — shuffle-joined, NOT broadcast, since real-corpus
    bigram tables run to billions of rows), one per-doc aggregate,
    one global top-k. Documents with < 2 tokens have no bigrams and
    are excluded (no score exists for them).
    """
    toks = docs.select(F.col(id_col).alias("doc_id"),
                       tokens(text_col).alias("t"))
    bigrams = toks.select(
        "doc_id",
        F.explode(_sliding_grams("t", 2)).alias("bg"))
    counts = bigrams.groupBy("bg").agg(F.count(F.lit(1)).alias("freq"))
    per_doc = (bigrams.join(counts, "bg")
               .groupBy("doc_id")
               .agg(F.count(F.lit(1)).alias("n_bigrams"),
                    F.sum("freq").alias("sum_freq")))
    return (per_doc
            .select("doc_id", "n_bigrams",
                    (F.col("sum_freq").cast("double")
                     / F.col("n_bigrams")).alias("avg_bigram_freq"))
            .orderBy("avg_bigram_freq", "doc_id")
            .limit(k))


def pmi_collocations(docs: DataFrame, k: int = 25, min_count: int = 5,
                     text_col: str = "text") -> DataFrame:
    """Top-``k`` word-bigram collocations by LIFT — corpus-level
    multiword-expression mining (the "New York" / "machine learning"
    detector in a tokenizer-prep or phrase-vocab pipeline).

    lift = p(xy) / (p(x)·p(y)) = (c_xy / N₂) · N₁² / (c_x · c_y) with
    unigram instance counts c and totals N₁ (unigrams), N₂ (bigrams).
    Rank-equivalent to PMI = log₂(lift) — log is monotone — but unlike
    a log it is evaluated WITHOUT transcendental functions whose last
    bit differs across runtimes: two exact decimal(38,0) products, one
    double division each, one double multiply, in a fixed order — every
    step correctly rounded, so bit-identical to the DuckDB oracle.

    Scale shape: one explode + hash-agg for unigram counts, one for
    bigram counts (both map-side-combining on the gram key), two joins
    of the bigram table against the vocabulary on w1/w2 — shuffle
    joins, NOT forced broadcasts, because a web-corpus vocabulary runs
    to billions of terms (AQE may still broadcast small ones) — and the
    two one-row totals are broadcast. ``min_count`` prunes the bigram
    table before the joins (low-count bigrams dominate the long tail
    and produce degenerate lift estimates anyway).
    """
    toks = docs.select(tokens(text_col).alias("t"))
    uni = toks.select(F.explode("t").alias("tok"))
    uc = uni.groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
    n1 = uc.agg(F.sum("c").alias("n1"))
    pairs = toks.select(F.explode(F.expr(
        "CASE WHEN size(t) >= 2 THEN transform(sequence(0, size(t) - 2),"
        " i -> struct(t[i] AS w1, t[i + 1] AS w2)) "
        "ELSE array() END"
    )).alias("p")).select("p.w1", "p.w2")
    bgc = pairs.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("cxy"))
    n2 = bgc.agg(F.sum("cxy").alias("n2"))
    c1 = uc.select(F.col("tok").alias("w1"), F.col("c").alias("c1"))
    c2 = uc.select(F.col("tok").alias("w2"), F.col("c").alias("c2"))
    dec = "decimal(19,0)"
    num = (F.col("cxy").cast(dec) * F.col("n1").cast(dec)).cast("double")
    den = (F.col("c1").cast(dec) * F.col("c2").cast(dec)).cast("double")
    lift = ((num / den)
            * (F.col("n1").cast("double") / F.col("n2").cast("double")))
    return (bgc.filter(F.col("cxy") >= min_count)
            .join(c1, "w1").join(c2, "w2")
            .crossJoin(F.broadcast(n1)).crossJoin(F.broadcast(n2))
            .select("w1", "w2", F.col("cxy").alias("pair_count"),
                    lift.alias("lift"))
            .orderBy(F.col("lift").desc(), "w1", "w2")
            .limit(k))


def bpe_merge_candidates(docs: DataFrame, top: int = 25,
                         text_col: str = "text") -> DataFrame:
    """Round-0 BPE merge candidates: the corpus's most frequent
    adjacent CHARACTER pairs inside whitespace tokens — exactly the
    statistic byte-pair-encoding training greedily merges first
    (Sennrich et al. 2016). One round is registered because each merge
    changes the pair distribution; a full trainer is this op in a
    driver loop re-tokenizing against the growing merge table.

    Scale shape: scan-speed substring explode (x avg token length)
    into a partial/final hash-agg on the two-char pair key — the same
    cost class as ``top_ngrams``; the top-k is a tiny final sort.
    """
    tok = (docs.select(F.explode(tokens(text_col)).alias("w"))
           .filter(F.length("w") >= 2))
    pairs = tok.select(F.explode(F.expr(
        "transform(sequence(1, length(w) - 1),"
        " i -> substring(w, i, 2))")).alias("pair"))
    return (pairs.groupBy("pair")
            .agg(F.count(F.lit(1)).alias("cnt"))
            .orderBy(F.col("cnt").desc(), "pair")
            .limit(top))


# ---------------------------------------------------------------------------
# BPE trainer — multi-round greedy merge learning + application
# ---------------------------------------------------------------------------

#: separator packing a token sequence into one string during BPE folds
#: (unit separator — never appears in the whitespace-tokenized corpus;
#: asserted by the planted-corpus tests).
_BPE_US = "chr(31)"


def _bpe_lit(s: str) -> str:
    """Spark-SQL string literal for a data-derived token (backslash and
    quote escaped — Spark treats backslash as an escape in literals)."""
    return "'" + s.replace("\\", "\\\\").replace("'", "''") + "'"


def _bpe_fold_sql(tk_sql: str, lft: str, rgt: str) -> str:
    """SQL expression applying ONE merge (lft, rgt) leftmost-greedily
    over the token array named by ``tk_sql``, returning the re-packed
    representation string (tokens joined by the unit separator).

    The fold keeps a packed-string accumulator and compares its LAST
    token against ``lft``: on a match with the incoming ``rgt`` the
    last token is replaced by the merged unit via pure substr
    arithmetic — deliberately regex-free, because Spark's
    ``regexp_replace`` replaces every match while DuckDB's replaces
    the first, so a regex formulation could not be oracle-shared."""
    l, r, m = _bpe_lit(lft), _bpe_lit(rgt), _bpe_lit(lft + rgt)
    return (
        f"aggregate(slice({tk_sql}, 2, size({tk_sql}) - 1), "
        f"element_at({tk_sql}, 1), "
        f"(acc, x) -> CASE WHEN element_at(split(acc, {_BPE_US}), -1) = {l}"
        f" AND x = {r} "
        f"THEN concat(substr(acc, 1, length(acc) - length({l})), {m}) "
        f"ELSE concat(acc, {_BPE_US}, x) END)"
    )


#: adjacent-pair list over a token array — zip_with over the two
#: off-by-one slices (NOT transform(sequence(1, n-1), ...): Spark's
#: ``sequence(1, 0)`` DESCENDS, which under ANSI mode turns the
#: single-token edge case into an element_at(0) error).
def _bpe_pairs_sql(tk_sql: str) -> str:
    return (f"zip_with(slice({tk_sql}, 1, size({tk_sql}) - 1), "
            f"slice({tk_sql}, 2, size({tk_sql}) - 1), "
            f"(a, b) -> named_struct('lft', a, 'rgt', b))")


def bpe_trained(docs: DataFrame, rounds: int = 3,
                text_col: str = "text"):
    """Distributed BPE merge training (Sennrich et al. 2016): ``rounds``
    greedy rounds, each picking the corpus's most frequent adjacent
    token pair (ties: count desc, pair asc) and merging every
    leftmost-greedy occurrence before recounting — the real iterative
    trainer, not the round-0 approximation of
    :func:`bpe_merge_candidates`.

    Returns ``(rep, merge_frames, merges)``: the distinct-word frame
    with the final token array ``tk`` and weight ``wc``; one 1-row
    DataFrame per round (merge_rank, lft, rgt, cnt) still expressed as
    a distributed argmax so the registered outputs stay in-plan; and
    the driver-side merge list.

    Scale shape — the standard trainer decomposition: pair statistics
    live on the DISTINCT-WORD table (vocabulary-sized, weighted by
    word count), not the corpus, so the only corpus-scale pass is the
    initial tokenize + word count (one shuffle on the word key,
    persisted and reused by every round). Each round is then a
    scan-speed fold over the vocabulary, a map-side-combined hash-agg
    on tiny pair keys, and a 1-row argmax fetch — O(1) driver traffic
    per round, the same bounded-literal re-broadcast pattern as the
    Lloyd trainer in ``similarity.py``."""
    words = (docs.select(F.explode(tokens(text_col)).alias("w"))
             .filter(F.length("w") >= 2)
             .groupBy("w").agg(F.count(F.lit(1)).alias("wc"))
             .persist())
    rep = words.withColumn(
        "tk",
        F.expr("transform(sequence(1, length(w)), i -> substring(w, i, 1))"))
    merge_frames = []
    merges: list[tuple[str, str, int]] = []
    for rnd in range(1, rounds + 1):
        cand = (rep.select("wc",
                           F.explode(F.expr(_bpe_pairs_sql("tk"))).alias("p"))
                .groupBy(F.col("p.lft").alias("lft"),
                         F.col("p.rgt").alias("rgt"))
                .agg(F.sum("wc").alias("cnt"))
                .orderBy(F.col("cnt").desc(), "lft", "rgt")
                .limit(1))
        merge_frames.append(cand.select(
            F.lit(rnd).alias("merge_rank"), "lft", "rgt", "cnt"))
        top = cand.collect()
        if not top:  # vocabulary fully merged — stop early
            break
        lft, rgt, cnt = top[0]["lft"], top[0]["rgt"], top[0]["cnt"]
        merges.append((lft, rgt, cnt))
        rep = (rep.withColumn("packed", F.expr(_bpe_fold_sql("tk", lft, rgt)))
               .withColumn("tk", F.expr(f"split(packed, {_BPE_US})"))
               .drop("packed"))
    return rep, merge_frames, merges


def bpe_train_merges(docs: DataFrame, rounds: int = 3,
                     text_col: str = "text") -> DataFrame:
    """(merge_rank, lft, rgt, cnt): the learned BPE merge table —
    round r's row is the argmax pair AFTER applying merges 1..r-1."""
    _, frames, _ = bpe_trained(docs, rounds, text_col)
    out = frames[0]
    for f in frames[1:]:
        out = out.unionAll(f)
    return out.orderBy("merge_rank")


def bpe_vocab_census(docs: DataFrame, rounds: int = 3, top: int = 15,
                     text_col: str = "text") -> DataFrame:
    """(token, cnt): corpus token census AFTER applying the ``rounds``
    trained merges — the apply half of the tokenizer: merged units rise
    above their constituent characters exactly as the trainer intends.
    Cost: the trainer plus one more vocabulary fold + tiny-key hash-agg
    and a distributed top-k (TakeOrderedAndProject, no global sort)."""
    rep, _, _ = bpe_trained(docs, rounds, text_col)
    return (rep.select("wc", F.explode("tk").alias("token"))
            .groupBy("token").agg(F.sum("wc").alias("cnt"))
            .orderBy(F.col("cnt").desc(), "token")
            .limit(top))


def rrf_retrieval_fusion(docs: DataFrame, query_terms: list[str],
                         k: int = 25, pool: int = 100,
                         c: int = 60) -> DataFrame:
    """Reciprocal-rank fusion (Cormack et al., SIGIR 2009) of two
    retrieval signals over the same corpus: the BM25 ranking for
    ``query_terms`` and the corpus quality-score prior —

        rrf(d) = Σ_lists 1 / (c + rank_list(d))

    the standard way a retrieval pipeline combines heterogeneous
    scorers without calibrating their scales (absent-from-list terms
    contribute 0). Each reciprocal is ONE correctly-rounded division
    of exact integers and the sum has a fixed two-term order, so the
    fused score is bit-identical cross-engine; ties break on doc_id.

    Scale shape: each ranking is a distributed top-``pool`` (Spark
    TakeOrderedAndProject — no global sort materializes) and the rank
    assignment + full-outer fusion run on the two pool-sized frames
    (single-partition by construction, bounded by ``pool``). The only
    corpus-scale work is the two scorers themselves, each already
    plan-audited (:func:`bm25_topk`, :func:`quality_score`).
    """
    from pyspark.sql import Window

    a = bm25_topk(docs, query_terms, k=pool)
    wa = Window.orderBy(F.col("score_q").desc(), "doc_id")
    ra = a.select("doc_id", F.row_number().over(wa).alias("r_bm25"))
    topq = (quality_score(docs)
            .orderBy(F.col("quality").desc(), "doc_id").limit(pool))
    wb = Window.orderBy(F.col("quality").desc(), "doc_id")
    rb = topq.select("doc_id", F.row_number().over(wb).alias("r_qual"))
    one = F.lit(1.0)
    rrf = (F.coalesce(one / (F.lit(c) + F.col("r_bm25")), F.lit(0.0))
           + F.coalesce(one / (F.lit(c) + F.col("r_qual")), F.lit(0.0)))
    return (ra.join(rb, "doc_id", "full_outer")
            .select("doc_id", "r_bm25", "r_qual", rrf.alias("rrf"))
            .orderBy(F.col("rrf").desc(), "doc_id")
            .limit(k))


def unigram_lm_score(docs: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text",
                     ppm: int = 1_000_000) -> DataFrame:
    """CCNet-style LM document scoring (Wenzek et al. 2020 score each
    document with a 5-gram KenLM and split the corpus into head /
    middle / tail perplexity terciles). The score here is the exact
    unigram analogue kept in integer arithmetic so DuckDB replays it
    bit-for-bit: a document's score is the arithmetic mean of its
    tokens' corpus frequencies,

        mean_p = sum(count(tok)) / (n_tokens * N),

    reported as floor-ppm (``sum_cnt * ppm div (n_tokens * N)``) —
    sum/count/N are integers, so the quantized division is
    engine-independent (no libm log). High mean frequency = common
    well-modeled text = "head"; rare/garbled text lands in "tail",
    matching CCNet's orientation (low perplexity -> head).

    Shape at scale: one explode (narrow), one hash-aggregate with the
    token as the shuffle key, one co-partitioned join back on that same
    key, one hash-aggregate on doc_id. The corpus total N is a one-row
    broadcast. The tercile split is an ``exact_global_ntile``
    (operators/ranking.py: parallel range shuffle + per-partition
    row_numbers + P-row offsets fold) — bit-identical to the oracle's
    ``ntile(3)`` with no single-task sort over the per-doc frame.

    Overflow bound: ``sum_cnt * ppm`` with ppm=1e6 stays inside int64
    while ``sum_cnt`` < 9.2e12 — a ~9-trillion-token corpus per the
    sum bound ``sum_cnt <= n_tokens * max_count``; past that, lift the
    multiply to DECIMAL(38,0) (both engines widen losslessly).
    """
    tok = docs.select(F.col(id_col).alias("doc_id"),
                      F.explode(tokens(text_col)).alias("w"))
    cnt = tok.groupBy("w").agg(F.count(F.lit(1)).alias("c"))
    tot = cnt.agg(F.sum("c").alias("n_total"))
    doc = (tok.join(cnt, "w")
           .groupBy("doc_id")
           .agg(F.count(F.lit(1)).alias("n_tokens"),
                F.sum("c").alias("sum_cnt")))
    sc = (doc.crossJoin(F.broadcast(tot))
          .select("doc_id", "n_tokens", "sum_cnt",
                  F.expr(f"(sum_cnt * {ppm}) div (n_tokens * n_total)")
                  .alias("score_ppm")))
    from ..operators.ranking import exact_global_ntile

    terciled = exact_global_ntile(
        sc, 3, [F.col("score_ppm").desc(), F.col("doc_id")], "_t")
    bucket = (F.when(F.col("_t") == 1, F.lit("head"))
              .when(F.col("_t") == 2, F.lit("middle"))
              .otherwise(F.lit("tail")))
    return (terciled.select("doc_id", "n_tokens", "sum_cnt", "score_ppm",
                            bucket.alias("bucket"))
            .orderBy("doc_id"))


def zipf_census(docs: DataFrame, top: int = 50, id_col: str = "doc_id",
                text_col: str = "text",
                ppm: int = 1_000_000) -> DataFrame:
    """Rank-frequency vocabulary audit (Zipf census): the ``top`` most
    frequent tokens with their corpus share and their frequency
    relative to rank 1, both as exact floor-ppm integers — the
    corpus-health check that catches boilerplate explosions (a token
    whose share is far above the Zipf curve) and tokenizer damage (a
    head full of fragments) before a training run.

    All arithmetic is integer (count * ppm div total), so DuckDB
    replays bit-for-bit. Plan shape: one explode, one hash-aggregate
    with the token as the shuffle key, then ``orderBy(...).limit(top)``
    — Spark's distributed TakeOrdered (per-partition top-``top`` then a
    driver merge of partition heads), NOT a global sort: the
    vocabulary never lands on one partition, so a 100M-type vocab at
    100 TB costs each executor a bounded heap. The rank window runs on
    the ``top``-row survivor frame only; the corpus total and max
    count ride one-row broadcasts.
    """
    tok = docs.select(F.explode(tokens(text_col)).alias("w"))
    cnt = tok.groupBy("w").agg(F.count(F.lit(1)).alias("c"))
    tot = cnt.agg(F.sum("c").alias("n_total"),
                  F.max("c").alias("c_max"))
    head = cnt.orderBy(F.col("c").desc(), "w").limit(top)
    w_rk = Window.orderBy(F.col("c").desc(), "w")
    return (head.crossJoin(F.broadcast(tot))
            .select(F.row_number().over(w_rk).alias("rank"),
                    F.col("w").alias("token"),
                    F.col("c").alias("cnt"),
                    F.expr(f"(c * {ppm}) div n_total").alias("share_ppm"),
                    F.expr(f"(c * {ppm}) div c_max").alias("rel_ppm"))
            .orderBy("rank"))


def bigram_lm_score(docs: DataFrame, id_col: str = "doc_id",
                    text_col: str = "text",
                    ppm: int = 1_000_000) -> DataFrame:
    """Exact integer bigram LM fluency score — the local-coherence
    upgrade of :func:`unigram_lm_score`. Each adjacent token pair
    contributes the floor-ppm conditional frequency

        t_i = c2(w_{i-1}, w_i) * ppm div c1(w_{i-1})

    (c2 = corpus bigram count, c1 = corpus unigram count of the
    prefix), and the document score is the integer mean of its terms —
    jumbled text scores near zero even when every token is common,
    which the unigram score cannot see. Every quantity is an integer
    count or a floor division, so DuckDB replays bit-for-bit (no log
    probabilities — same rationale as the unigram scorer).

    Plan shape (r12, guide §2.4 share one exchange): ONE explode emits
    every token once as (doc_id, w1 = token_i, w2 = token_{i+1} or
    NULL at the doc end), explicitly repartitioned by w1; the bigram
    count is a count window over (w1, w2) and the prefix count a count
    window over (w1) — both distributions and both sort orders are
    satisfied by that single exchange (hash(w1) clusters (w1, w2);
    sorting (w1, w2) prefixes (w1)), where the old shape paid two
    gram-keyed aggregates plus two shuffled joins to re-attach them.
    c1 counts every token occurrence because every token appears in
    exactly one row as w1, including doc-final ones; the NULL-w2 rows
    drop before the doc_id roll-up, so docs shorter than two tokens
    emit zero bigrams and score 0, as before.
    """
    toks = docs.select(F.col(id_col).alias("doc_id"),
                       tokens(text_col).alias("t"))
    pairs = toks.select(
        "doc_id",
        F.explode(F.expr(
            "CASE WHEN size(t) >= 1 THEN "
            "transform(sequence(1, size(t)), "
            "i -> struct(element_at(t, i) AS w1, "
            "IF(i < size(t), element_at(t, i + 1), NULL) AS w2)) "
            "ELSE array() END")).alias("x")) \
        .select("doc_id", "x.w1", "x.w2") \
        .repartition("w1")
    term = (pairs
            .withColumn("c2", F.count(F.lit(1)).over(
                Window.partitionBy("w1", "w2")))
            .withColumn("c1", F.count(F.lit(1)).over(
                Window.partitionBy("w1")))
            .filter(F.col("w2").isNotNull())
            .select("doc_id", F.expr(f"(c2 * {ppm}) div c1").alias("tq")))
    per_doc = (term.groupBy("doc_id")
               .agg(F.count(F.lit(1)).alias("n_bigrams"),
                    F.expr("sum(tq) div count(1)").alias("score_ppm")))
    return (toks.select("doc_id").join(per_doc, "doc_id", "left")
            .select("doc_id",
                    F.coalesce("n_bigrams", F.lit(0)).alias("n_bigrams"),
                    F.coalesce("score_ppm", F.lit(0)).alias("score_ppm"))
            .orderBy("doc_id"))
