"""Corpus-level cleaning operators for training-data pipelines:
C4-style repeated-passage removal, PII redaction, and benchmark
contamination scoring.

Everything is built-in column expressions (whole-stage codegen, no
UDFs) with exact DuckDB oracle twins; the design notes on each
operator spell out the 100 TB shuffle story.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .textprep import tokens


def _chunk_expr(tok_sql: str, w: int):
    """Fixed-width ``w``-token chunks of the token array named by
    ``tok_sql`` (last chunk may be short) — a pure higher-order
    expression, evaluated row-side."""
    return F.expr(
        f"CASE WHEN size({tok_sql}) > 0 THEN "
        f"transform(sequence(0, CAST(ceil(size({tok_sql}) / {w}.0) AS INT)"
        f" - 1), i -> concat_ws(' ', slice({tok_sql}, i * {w} + 1, {w}))) "
        f"ELSE array() END")


def chunk_dedup(docs: DataFrame, chunk_tokens: int = 5,
                min_docs: int = 2, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """C4-style corpus-level passage dedup (Raffel et al. 2020 §2.2
    cleaned up the Common Crawl by deleting any three-sentence span
    occurring more than once; here the unit is a fixed ``chunk_tokens``
    token chunk since the corpus has no sentence boundaries): every
    chunk appearing in ≥ ``min_docs`` DISTINCT documents is removed
    from *all* of them, and each document is re-assembled from its
    surviving chunks in position order.

    Shape at scale: chunking is a narrow map; the global frequency pass
    is one hash-aggregate with the chunk as the shuffle key, and the
    membership pass is a co-partitioned join on that same key — two
    shuffles total, nothing quadratic, no driver-side set. At 100 TB
    the join key should be ``md5(chunk)`` (16 bytes instead of a
    ~40-byte string); kept as the raw chunk here so the oracle stays a
    verbatim replay. Reassembly is one more shuffle on doc_id with a
    position-sorted ``collect_list`` whose state is bounded by the
    document length — the same bound the input row already paid.
    """
    toks = docs.select(F.col(id_col).alias("doc_id"),
                       tokens(text_col).alias("t"))
    ch = toks.select(
        "doc_id",
        F.posexplode(_chunk_expr("t", chunk_tokens)).alias("pos", "chunk"))
    # r12 (§2.4, the repeated_span_mask pattern): the distinct-doc count
    # per chunk is max(dense_rank) over the SAME chunk-keyed exchange the
    # membership rows ride — one explode and one chunk exchange instead
    # of two of each (the old shape aggregated countDistinct on one
    # explode and left-joined it back onto a second). dense_rank over
    # doc_id within a chunk reaches exactly countDistinct(doc_id) at the
    # partition max; both windows share one exchange + sort.
    w_ord = Window.partitionBy("chunk").orderBy("doc_id")
    w_all = Window.partitionBy("chunk")
    fl = (ch.withColumn("_dr", F.dense_rank().over(w_ord))
          .withColumn("_nd", F.max("_dr").over(w_all))
          .withColumn("is_dup",
                      F.when(F.col("_nd") >= min_docs, F.lit(True))))
    kept = F.when(F.col("is_dup").isNull(), F.struct("pos", "chunk"))
    return (fl.groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("n_chunks"),
                 F.count("is_dup").alias("n_removed"),
                 F.array_join(
                     F.transform(F.array_sort(F.collect_list(kept)),
                                 lambda x: x["chunk"]),
                     " ").alias("clean_text"))
            .orderBy("doc_id"))


#: PII patterns kept to the dialect-portable subset shared by Java
#: regex and DuckDB's RE2: character classes, bounded repetition,
#: word boundaries — no lookaround, no backrefs. PHONE_RE requires
#: 3-4 hyphenated groups with a <=3-digit lead and \b anchors, so
#: ISO dates (2024-01-01: 4-digit lead) and year ranges (1998-2024:
#: one group) never match; the \b sits AFTER the optional '+' because
#: '+' is a non-word char and would break the boundary.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\+?\b[0-9]{1,3}(-[0-9]{2,4}){2,3}\b"
IP_RE = r"([0-9]{1,3}\.){3}[0-9]{1,3}"

#: redaction order matters: emails first (their local parts may contain
#: digit runs), then hyphenated phone runs, then dotted quads — each
#: later pattern cannot match inside an earlier placeholder.
PII_RULES = (("email", EMAIL_RE, "<EMAIL>"),
             ("phone", PHONE_RE, "<PHONE>"),
             ("ip", IP_RE, "<IP>"))


def pii_scrub(df: DataFrame, text_col: str = "text",
              out_col: str = "clean_text") -> DataFrame:
    """Detect and redact emails / phone numbers / IPv4 addresses.

    A narrow per-row projection — regex extraction and replacement are
    whole-stage-codegen JVM expressions, no shuffle, no UDF; at 100 TB
    this runs at scan speed and pushes column pruning to the source.
    Counts (``n_email``/``n_phone``/``n_ip``) are measured against the
    ORIGINAL text; replacements are applied in :data:`PII_RULES` order,
    which is deliberately non-overlapping (see comment above).
    """
    out = df
    red = F.col(text_col)
    for name, pat, token in PII_RULES:
        out = out.withColumn(
            f"n_{name}",
            F.size(F.regexp_extract_all(F.col(text_col), F.lit(pat),
                                        F.lit(0))))
        red = F.regexp_replace(red, pat, token)
    return out.withColumn(out_col, red)


def benchmark_contamination(corpus: DataFrame, benchmark: DataFrame,
                            n: int = 5, id_col: str = "doc_id",
                            text_col: str = "text") -> DataFrame:
    """Per-document n-gram overlap against a benchmark/eval set — the
    standard train-test contamination check (GPT-3 appendix C measures
    13-gram overlap; here ``n`` defaults to 5 to suit the short
    synthetic docs).

    For every corpus document: the number of its DISTINCT n-grams, how
    many also occur anywhere in the benchmark, and the contaminated
    fraction (bigint/bigint → double, hash-stable cross-engine).

    Shape at scale: the benchmark side (an eval suite — thousands of
    docs, not billions) collapses to a distinct-gram set and is
    BROADCAST, so the corpus side never shuffles at all: explode →
    broadcast-hash left join → one doc_id hash-agg, i.e. scan-bound.
    If the benchmark ever outgrows broadcast size, drop the hint and
    the same plan shuffles both sides on the gram.
    """
    from .text_analysis import _sliding_grams

    def grams(df):
        t = df.select(F.col(id_col).alias("doc_id"),
                      tokens(text_col).alias("t"))
        return t.select(
            "doc_id",
            F.explode(F.array_distinct(_sliding_grams("t", n)))
            .alias("gram"))

    bench = (grams(benchmark).select("gram").distinct()
             .withColumn("hit", F.lit(True)))
    return (grams(corpus)
            .join(F.broadcast(bench), "gram", "left")
            .groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("n_grams"),
                 F.count("hit").alias("n_contaminated"),
                 (F.count("hit").cast("double")
                  / F.count(F.lit(1))).alias("contamination_frac"))
            .orderBy("doc_id"))


def fuzzy_match(candidates: DataFrame, probes: DataFrame,
                cand_col: str, probe_col: str,
                max_dist: int = 2) -> DataFrame:
    """Entity resolution against a reference list: every candidate row
    within ``max_dist`` Levenshtein edits of a probe, with the exact
    distance.

    The probe side is a REFERENCE LIST (banned entities, benchmark
    titles, canonical names) — small by use-case definition — so the
    right 100 TB plan is a broadcast nested-loop over k probes: O(N·k)
    work with N scanned once, the same declared-BNLJ class as the
    brute-force cosine scorer. A cheap length-band guard
    (``abs(len_c - len_p) <= max_dist``, a necessary condition for edit
    distance) runs before the O(len²) levenshtein so most of the N·k
    pairs short-circuit on an integer compare. For probe lists too big
    to broadcast, PassJoin-style segment blocking is the upgrade path —
    not implemented because it changes the contract (requires exploding
    positional substrings of every candidate).
    """
    p = F.broadcast(probes)
    # the broadcast-NLJ parallelism equals the candidate partition
    # count; a small single-file scan would score all N·k pairs on one
    # core, so spread it. The probe is metadata-only: inputFiles() reads
    # the already-resolved file listing (a .rdd probe would force an
    # extra physical-plan materialization — CI-gated against now).
    # Fewer files than cores ⇒ the scan may not parallelize ⇒ add one
    # round-robin shuffle of the candidate side; wide many-file scans
    # (the 100 TB case) skip it, and so do non-file frames (0 files:
    # createDataFrame already slices to defaultParallelism). A frame
    # that sits above a shuffle of a single-file scan pays one
    # avoidable re-shuffle — rare shape for a reference-resolution
    # input, and strictly better than under-parallelizing the NLJ.
    sc = candidates.sparkSession.sparkContext
    if 0 < len(candidates.inputFiles()) < sc.defaultParallelism:
        candidates = candidates.repartition(sc.defaultParallelism)
    lc, lp = F.length(F.col(cand_col)), F.length(F.col(probe_col))
    guard = F.abs(lc - lp) <= max_dist
    # thresholded levenshtein runs the banded DP (O(d·len) instead of
    # O(len²)) and early-exits with -1 past the threshold — on
    # same-length corpora where the length guard can't prune this is
    # 2x alone, 12x with the partition spread (13.8 s -> 1.1 s at
    # sf0.1 on 2.25M pairs)
    dist = F.levenshtein(F.col(cand_col), F.col(probe_col), max_dist)
    return (candidates.join(p, guard, "inner")
            .withColumn("dist", dist)
            .filter(F.col("dist") >= 0))


def normalize_text(docs: DataFrame, id_col: str = "doc_id",
                   text_col: str = "text") -> DataFrame:
    """Whitespace/control-character normalization — the cheap cleanup
    pass in front of every tokenizer: strip C0 control characters,
    collapse whitespace runs to a single space, trim. Pure projection
    (scan-speed, no shuffle); the regexes stay in the portable subset
    both Java regex and RE2 agree on (explicit char classes, no
    lookaround), so the oracle replays byte-for-byte.

    Returns per-document before/after lengths, a changed flag, and the
    md5 of the normalized text — the digest makes the oracle comparison
    cover the full normalized content without hauling the text column
    through the result.
    """
    raw = F.col(text_col)
    stripped = F.regexp_replace(
        raw, "[\\x00-\\x1f]", " ")
    collapsed = F.trim(F.regexp_replace(stripped, "  +", " "))
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.length(raw).alias("n_chars_raw"),
        F.length(collapsed).alias("n_chars_norm"),
        (F.length(raw) != F.length(collapsed)).alias("changed"),
        F.md5(collapsed).alias("norm_md5")).orderBy("doc_id")


def repeated_span_mask(docs: DataFrame, k: int = 8, min_count: int = 2,
                       id_col: str = "doc_id",
                       text_col: str = "text") -> DataFrame:
    """Exact repeated-substring dedup at token granularity (Lee et al.
    2022, "Deduplicating Training Data Makes Language Models Better",
    which excises every >=50-token substring occurring more than once
    in the corpus; the unit here is a ``k``-token gram to suit the
    short synthetic docs). Every overlapping ``k``-token gram occurring
    >= ``min_count`` times corpus-wide (within-document repeats count)
    marks its ``k`` positions in EVERY occurrence; per document the
    marked intervals are merged into maximal spans (gaps-and-islands:
    an interval opens a new span only when it starts past the running
    max end + 1, so overlapping AND adjacent marked regions fuse). A
    repeated substring of length L >= k is covered by its L-k+1
    repeated k-grams, so maximal repeated regions surface as single
    spans — the suffix-array result restricted to granularity ``k``,
    with no suffix array built.

    Returns one row per document: token count, number of masked spans,
    masked token count, and the text re-assembled from unmasked
    positions.

    Shape at scale: gram explode is a narrow ~L-rows-per-doc map; the
    frequency AND membership passes are ONE count window partitioned
    by the gram — a single shuffle with the gram as the key (at 100 TB
    hash the gram to 16 bytes first; kept raw here so the oracle
    replays verbatim), no second explode, no semi join. Island-merging and
    re-assembly shuffle once more on doc_id with per-group state
    bounded by the document length — the same bound the input row
    already paid. Nothing quadratic, no driver-side state.
    """
    from pyspark.sql import Window

    toks = docs.select(F.col(id_col).alias("doc_id"),
                       tokens(text_col).alias("t"))
    kg = toks.select(
        "doc_id",
        F.explode(F.expr(
            f"CASE WHEN size(t) >= {k} THEN "
            f"transform(sequence(1, size(t) - {k} + 1), "
            f"i -> struct(i AS pos, concat_ws(' ', slice(t, i, {k})) AS g)) "
            f"ELSE array() END")).alias("x")) \
        .select("doc_id", F.col("x.pos").alias("pos"),
                F.col("x.g").alias("g"))
    # r12 (§2.4 remove shuffles outright): the corpus-wide frequency
    # pass and the membership pass used to be a gram-keyed aggregate
    # PLUS a semi join back onto a second explode of the gram table —
    # two exchanges and two scan passes. A count window partitioned by
    # the gram computes the same frequency on the same single exchange
    # the membership rows ride anyway: one explode, one shuffle on g,
    # identical marked set (a row survives iff its gram occurs
    # >= min_count corpus-wide, exactly the old HAVING + semi join).
    wg = Window.partitionBy("g")
    marked = (kg.withColumn("n", F.count(F.lit(1)).over(wg))
              .filter(F.col("n") >= min_count)
              .select("doc_id", "pos", (F.col("pos") + (k - 1)).alias("e")))
    w = Window.partitionBy("doc_id").orderBy("pos")
    prev_e = F.max("e").over(
        w.rowsBetween(Window.unboundedPreceding, -1))
    new_isl = F.when(prev_e.isNull() | (F.col("pos") > prev_e + 1),
                     F.lit(1)).otherwise(F.lit(0))
    isl = marked.withColumn(
        "iid", F.sum(new_isl).over(
            w.rowsBetween(Window.unboundedPreceding, 0)))
    spans = (isl.groupBy("doc_id", "iid")
             .agg(F.min("pos").alias("s"), F.max("e").alias("e")))
    per_doc = spans.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_spans"),
        F.sum(F.col("e") - F.col("s") + 1).alias("masked_tokens"),
        F.array_sort(F.collect_list(F.struct(
            F.col("s").alias("s"), F.col("e").alias("e")))).alias("sp"))
    clean = F.expr(
        "concat_ws(' ', filter(transform(sequence(1, size(t)), "
        "p -> IF(sp IS NOT NULL AND exists(sp, x -> p >= x.s AND p <= x.e), "
        "NULL, element_at(t, p))), v -> v IS NOT NULL))")
    return (toks.join(per_doc, "doc_id", "left")
            .select("doc_id",
                    F.size("t").cast("long").alias("n_tokens"),
                    F.coalesce("n_spans", F.lit(0)).alias("n_spans"),
                    F.coalesce("masked_tokens", F.lit(0))
                    .alias("masked_tokens"),
                    clean.alias("clean_text"))
            .orderBy("doc_id"))


def contamination_spans(corpus: DataFrame, benchmark: DataFrame,
                        n: int = 5, id_col: str = "doc_id",
                        text_col: str = "text") -> DataFrame:
    """Contiguous-overlap contamination: where
    :func:`benchmark_contamination` counts how MANY of a document's
    n-grams appear in the eval set, this measures the longest
    CONTIGUOUS run of matching grams — a 50-token verbatim quote and
    50 scattered common n-grams have the same overlap count but very
    different leak severity (the PaLM/GPT-4 reports use exactly this
    consecutive-overlap criterion for their decontamination).

    Per corpus document: total n-gram positions, matched positions,
    and the longest matched run in TOKENS (consecutive matched gram
    starts p..q cover q - p + n tokens; 0 when nothing matches).
    Matched start positions merge into runs by gaps-and-islands — an
    island breaks when the next matched start skips a position.

    Shape at scale: the benchmark collapses to a distinct-gram set and
    broadcasts (eval suites are small); the corpus side is one narrow
    gram explode, a broadcast semi join, and two doc_id-keyed window/
    aggregate passes whose per-group state is bounded by document
    length. The corpus never shuffles on anything but doc_id.
    """
    from pyspark.sql import Window

    def kg(df):
        t = df.select(F.col(id_col).alias("doc_id"),
                      tokens(text_col).alias("t"))
        return t.select(
            "doc_id",
            F.explode(F.expr(
                f"CASE WHEN size(t) >= {n} THEN "
                f"transform(sequence(1, size(t) - {n} + 1), "
                f"i -> struct(i AS pos, "
                f"concat_ws(' ', slice(t, i, {n})) AS g)) "
                f"ELSE array() END")).alias("x")) \
            .select("doc_id", "x.pos", "x.g")

    bench = kg(benchmark).select("g").distinct()
    grams = kg(corpus)
    marked = grams.join(F.broadcast(bench), "g", "leftsemi") \
                  .select("doc_id", "pos")
    w = Window.partitionBy("doc_id").orderBy("pos")
    new_run = F.when(F.lag("pos").over(w).isNull()
                     | (F.col("pos") > F.lag("pos").over(w) + 1),
                     F.lit(1)).otherwise(F.lit(0))
    # r12 (§2.4 fewer passes): per-run position counts fold into the
    # runs aggregate, so n_hits (= matched positions per doc) comes
    # out of the same doc_id-keyed pass as the run stats instead of a
    # THIRD explode + semi-join recompute of `marked`.
    runs = (marked.withColumn("rid", F.sum(new_run).over(
                w.rowsBetween(Window.unboundedPreceding, 0)))
            .groupBy("doc_id", "rid")
            .agg((F.max("pos") - F.min("pos") + n).alias("run_tokens"),
                 F.count(F.lit(1)).alias("n_pos")))
    per_doc = runs.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_runs"),
        F.max("run_tokens").cast("long").alias("max_run_tokens"),
        F.sum("n_pos").alias("n_hits"))
    # r12 (§2.4 remove shuffles outright): the per-doc gram total is a
    # pure function of the token count — max(size(t) - n + 1, 0) — so
    # it is computed in the corpus scan's projection, replacing a
    # SECOND explode + doc_id-keyed aggregate pass with zero rows of
    # shuffle (the left-join null for short docs becomes the
    # greatest(..., 0) floor, the same 0 the old coalesce produced).
    base = corpus.select(
        F.col(id_col).alias("doc_id"),
        F.greatest(
            F.size(tokens(text_col)) - F.lit(n - 1), F.lit(0))
        .cast("long").alias("n_grams"))
    return (base.join(per_doc, "doc_id", "left")
            .select("doc_id", "n_grams",
                    F.coalesce("n_hits", F.lit(0)).alias("n_hits"),
                    F.coalesce("n_runs", F.lit(0)).alias("n_runs"),
                    F.coalesce("max_run_tokens", F.lit(0))
                    .alias("max_run_tokens"))
            .orderBy("doc_id"))
