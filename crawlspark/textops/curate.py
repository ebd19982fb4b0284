"""Training-data curation operators: PII scrubbing, Gopher-style repetition
signals, deterministic hash sampling, language-stratified sampling.

These are the dataset-curation stages a 100 TB crawl->training-data pipeline
runs after dedup/quality: scrub PII spans, drop repetition-heavy docs
(Gopher rules, Rae et al. 2021), then draw deterministic and per-language
stratified samples.  Everything stays in JVM whole-stage codegen (regexp /
array expressions; the repetition mode counts are one map-side-combined
explode+groupBy) and every formula is integer-exact so the DuckDB oracle
replays bit-for-bit.  Production would swap the md5-prefix hash for
``xxhash64`` (same plan shape, cheaper hash) — see dedup.base_hash.

Reference scope note: crwlrsoft/crawler stops at extraction (Steps/Html.php,
Steps/Refiners/*); these operators are the post-extraction curation layer the
assignment adds on top.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .dedup import base_hash

# Regexes restricted to the Java-regex ∩ RE2 common dialect so Spark and the
# DuckDB oracle match the exact same spans.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PHONE_RE = r"\+\d{2}-\d{3}-\d{4}"


def pii_scrub(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Redact emails / IPv4s / phone numbers, keeping per-doc match counts.

    Email first (its local part may contain digits-and-dots the IP pattern
    would otherwise bite into), then IP, then phone.  Pure regexp
    expressions — no UDF, no shuffle; at 100 TB this is a narrow map stage
    fused into the scan.
    """
    t = F.col(text_col)
    n_email = F.regexp_count(t, F.lit(EMAIL_RE)).cast("long")
    n_ip = F.regexp_count(t, F.lit(IPV4_RE)).cast("long")
    n_phone = F.regexp_count(t, F.lit(PHONE_RE)).cast("long")
    clean = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(t, EMAIL_RE, "<EMAIL>"), IPV4_RE, "<IP>"
        ),
        PHONE_RE,
        "<PHONE>",
    )
    return df.select(
        F.col(id_col),
        clean.alias("clean_text"),
        n_email.alias("n_email"),
        n_ip.alias("n_ip"),
        n_phone.alias("n_phone"),
        (n_email + n_ip + n_phone).alias("n_pii"),
    )


# Gopher-rule thresholds (permille): docs above either are repetition spam.
TOP_UNIGRAM_MAX_PERMILLE = 120
TOP_BIGRAM_MAX_PERMILLE = 100


def repetition_signals(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Gopher-style repetition signals per document, integer permille.

    - ``dup_word_permille``: 1 - (#distinct words / #words) — array-side,
      no shuffle.
    - ``top_unigram_permille`` / ``top_bigram_permille``: share of the
      most frequent unigram / bigram.  Mode counting is explode ->
      groupBy(id, token) -> max — two shuffles, both map-side combined,
      the honest distributed plan (an array-side O(distinct*n) fold would
      be quadratic per doc and melt on long documents).
    - ``keep``: the Gopher keep/drop verdict at the module thresholds.
    """
    d = df.select(F.col(id_col), F.split(F.col(text_col), " ").alias("__w"))
    d = d.withColumn("__n", F.size("__w").cast("long")).withColumn(
        "__nd", F.size(F.array_distinct("__w")).cast("long")
    )
    bigrams = F.when(
        F.size("__w") >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size("__w") - 1),
            lambda i: F.concat_ws(
                " ",
                F.element_at(F.col("__w"), i.cast("int")),
                F.element_at(F.col("__w"), (i + 1).cast("int")),
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    d = d.withColumn("__bg", bigrams).localCheckpoint(eager=False)

    def _mode_cnt(frame: DataFrame, arr: str) -> DataFrame:
        return (
            frame.select(F.col(id_col), F.explode(arr).alias("__tok"))
            .groupBy(id_col, "__tok")
            .agg(F.count("*").alias("__c"))
            .groupBy(id_col)
            .agg(F.max("__c").alias("__mc"))
        )

    top_uni = _mode_cnt(d, "__w").withColumnRenamed("__mc", "__mu")
    top_bi = _mode_cnt(d, "__bg").withColumnRenamed("__mc", "__mb")
    out = (
        d.select(id_col, "__n", "__nd")
        .join(top_uni, id_col, "left")
        .join(top_bi, id_col, "left")
    )
    n = F.col("__n")
    top_uni_pm = F.floor(F.coalesce(F.col("__mu"), F.lit(0)) * 1000 / n).cast("long")
    top_bi_pm = F.floor(
        F.coalesce(F.col("__mb"), F.lit(0)) * 1000 / F.greatest(n - 1, F.lit(1))
    ).cast("long")
    dup_pm = F.floor((n - F.col("__nd")) * 1000 / n).cast("long")
    return out.select(
        F.col(id_col),
        n.alias("n_words"),
        F.col("__nd").alias("n_distinct_words"),
        dup_pm.alias("dup_word_permille"),
        top_uni_pm.alias("top_unigram_permille"),
        top_bi_pm.alias("top_bigram_permille"),
        (
            (top_uni_pm <= TOP_UNIGRAM_MAX_PERMILLE)
            & (top_bi_pm <= TOP_BIGRAM_MAX_PERMILLE)
        ).alias("keep"),
    )


def c4_clean(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words_per_line: int = 3,
    min_sentences: int = 5,
) -> DataFrame:
    """C4 cleaning rules (Raffel et al. 2020, arXiv:1910.10683 §2.2):
    keep only lines that end in terminal punctuation, have at least
    ``min_words_per_line`` words, and don't mention javascript; drop whole
    pages that contain ``lorem ipsum`` or a curly brace (code), or whose
    cleaned text has fewer than ``min_sentences`` sentences.  (The paper's
    bad-words list is licensing-encumbered; plug a blocklist join in front
    if needed.  Its three-sentence-span dedup is :func:`crawlspark.textops.
    dedup.duplicate_spans` at sentence granularity.)

    All line logic is HOF array expressions over the split text — a
    narrow whole-stage-codegen'd map; no shuffle, no UDF.

    Returns (id, clean_text, n_lines_total, n_lines_kept, n_sentences,
    has_lorem_ipsum, has_brace, keep_page).
    """
    t = F.col(text_col)
    lines = F.split(t, "\n")

    def line_ok(x: Column) -> Column:
        n_words = F.size(F.filter(F.split(x, " "), lambda w: w != ""))
        return (
            x.rlike('[.!?"]$')
            & (n_words >= min_words_per_line)
            & ~F.lower(x).contains("javascript")
        )

    kept = F.filter(lines, line_ok)
    clean = F.array_join(kept, "\n")
    n_sent = F.regexp_count(clean, F.lit(r"[.!?]")).cast("long")
    has_lorem = F.lower(t).contains("lorem ipsum")
    has_brace = t.contains("{")
    return df.select(
        F.col(id_col),
        clean.alias("clean_text"),
        F.size(lines).cast("long").alias("n_lines_total"),
        F.size(kept).cast("long").alias("n_lines_kept"),
        n_sent.alias("n_sentences"),
        has_lorem.alias("has_lorem_ipsum"),
        has_brace.alias("has_brace"),
        (~has_lorem & ~has_brace & (n_sent >= min_sentences)).alias("keep_page"),
    )


# Gopher quality-rule bounds (Rae et al. 2021, arXiv:2112.11446 A1.1)
GOPHER_MIN_WORDS = 50
GOPHER_MAX_WORDS = 100_000
GOPHER_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]


def gopher_rules(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words: int = GOPHER_MIN_WORDS,
    max_words: int = GOPHER_MAX_WORDS,
) -> DataFrame:
    """The full Gopher document-quality rule set (Rae et al. 2021, A1.1),
    complementing :func:`repetition_signals` (the same paper's repetition
    section): word-count bounds, mean word length 3..10, symbol-to-word
    ratio <= 0.1 (# or ...), at most 90% of lines starting with a bullet,
    at most 30% ending with an ellipsis, >= 80% of words containing an
    alphabetic character, and at least 2 distinct stop words present.

    Every ratio is compared by integer cross-multiplication (no float
    division), so the verdicts are bit-exact and the DuckDB oracle
    replays them; the whole operator is one narrow projection.

    Returns per-rule booleans + the combined ``keep``.
    """
    t = F.col(text_col)
    words = F.filter(F.split(t, r"\s+"), lambda w: w != "")
    nw = F.size(words).cast("long")
    total_chars = F.aggregate(
        words, F.lit(0).cast("long"), lambda acc, w: acc + F.length(w)
    )
    n_sym = F.regexp_count(t, F.lit(r"#|\.\.\.")).cast("long")
    lines = F.split(t, "\n")
    nl = F.size(lines).cast("long")
    n_bullet = F.size(
        F.filter(lines, lambda x: x.rlike(r"^\s*[-*•]"))
    ).cast("long")
    n_ellipsis = F.size(F.filter(lines, lambda x: x.endswith("..."))).cast("long")
    n_alpha = F.size(
        F.filter(words, lambda w: w.rlike("[A-Za-z]"))
    ).cast("long")
    n_stop = F.size(
        F.array_intersect(
            F.transform(words, F.lower),
            F.array(*[F.lit(s) for s in GOPHER_STOPWORDS]),
        )
    ).cast("long")
    ok_words = (nw >= min_words) & (nw <= max_words)
    ok_mean_len = (3 * nw <= total_chars) & (total_chars <= 10 * nw)
    ok_symbols = 10 * n_sym <= nw
    # Gopher removes docs with MORE than 90% bullet-started lines
    ok_bullets = 10 * n_bullet <= 9 * nl
    ok_ellipsis = 10 * n_ellipsis <= 3 * nl
    ok_alpha = 5 * n_alpha >= 4 * nw
    ok_stop = n_stop >= 2
    return df.select(
        F.col(id_col),
        nw.alias("n_words"),
        ok_words.alias("ok_word_count"),
        ok_mean_len.alias("ok_mean_word_len"),
        ok_symbols.alias("ok_symbol_ratio"),
        ok_bullets.alias("ok_bullet_lines"),
        ok_ellipsis.alias("ok_ellipsis_lines"),
        ok_alpha.alias("ok_alpha_words"),
        ok_stop.alias("ok_stopwords"),
        (
            ok_words & ok_mean_len & ok_symbols & ok_bullets
            & ok_ellipsis & ok_alpha & ok_stop
        ).alias("keep"),
    )


def dsir_weights(
    df: DataFrame,
    target: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    buckets: int = 10007,
) -> DataFrame:
    """DSIR data selection (Xie et al. 2023, arXiv:2302.03169): score every
    raw document by its importance weight under hashed-bigram bag-of-ngrams
    language models of the TARGET distribution vs the RAW distribution —
    the standard way to up-sample "looks like the target domain" data at
    corpus scale.  Per hashed feature bucket b (Laplace-smoothed):

        w(b) = ln( (ct(b)+1)·(Tr+B) / ((cr(b)+1)·(Tt+B)) )   [micro-nats]

    and a document's log-weight is the sum of w over its bigram
    occurrences.  w(b) is quantized to integer micro-nats BEFORE the
    per-doc sum (same order-stability discipline as unigram_logprob), so
    results are bit-exact under any partitioning and SQL-replayable.

    Plan shape: bigram explode is narrow; the two count relations are
    map-side-combined groupBys bounded by ``buckets`` rows; the per-bucket
    weight table (<= buckets rows) BROADCASTS onto the feature stream; one
    final groupBy(doc) sum.  Nothing scales with |corpus| except narrow
    passes.

    Returns (id, n_feats, logw_micro) — resample by logw_micro rank or by
    Gumbel top-k on it.
    """
    def feats(frame: DataFrame, keep_id: bool) -> DataFrame:
        words = F.split(F.col(text_col), " ")
        grams = F.when(
            F.size(words) >= 2,
            F.transform(
                F.sequence(F.lit(1), F.size(words) - 1),
                lambda i: F.concat_ws(
                    " ",
                    F.element_at(words, i.cast("int")),
                    F.element_at(words, (i + 1).cast("int")),
                ),
            ),
        ).otherwise(F.array().cast("array<string>"))
        cols = [F.col(id_col)] if keep_id else []
        ex = frame.select(*cols, F.explode(grams).alias("g"))
        return ex.withColumn(
            "b", F.pmod(base_hash(F.col("g")), F.lit(buckets))
        ).drop("g")

    raw_f = feats(df, keep_id=True)
    tgt_f = feats(target, keep_id=False)
    cr = raw_f.groupBy("b").agg(F.count("*").alias("cr"))
    ct = tgt_f.groupBy("b").agg(F.count("*").alias("ct"))
    tr = cr.agg(F.sum("cr").alias("tr"))
    tt = ct.agg(F.sum("ct").alias("tt"))
    wtab = (
        cr.join(ct, "b", "full_outer")
        .crossJoin(F.broadcast(tr))
        .crossJoin(F.broadcast(tt))
        .select(
            "b",
            F.floor(
                F.log(
                    (
                        (F.coalesce("ct", F.lit(0)) + 1)
                        * (F.col("tr") + buckets)
                    ).cast("double")
                    / (
                        (F.coalesce("cr", F.lit(0)) + 1)
                        * (F.col("tt") + buckets)
                    ).cast("double")
                )
                * 1_000_000
            ).cast("long").alias("w_micro"),
        )
    )
    return (
        raw_f.join(F.broadcast(wtab), "b")
        .groupBy(id_col)
        .agg(
            F.count("*").cast("long").alias("n_feats"),
            F.sum("w_micro").alias("logw_micro"),
        )
    )


def sample_bucket(key: Column, salt: str = "s1") -> Column:
    """Deterministic 0..999 bucket for hash sampling (DuckDB-replayable)."""
    return base_hash(F.concat(F.lit(salt), key.cast("string"))) % 1000


def hash_sample(
    df: DataFrame, key_col: str, permille: int, salt: str = "s1"
) -> DataFrame:
    """Keep rows whose salted key-hash bucket < permille.

    Deterministic (re-runs and resumes pick the identical sample — unlike
    ``df.sample``), stable under repartitioning, and a pure narrow filter:
    at 100 TB it fuses into the scan with zero shuffle.  Different salts
    give independent samples; the same salt gives consistent joins across
    tables sampled on the same key.
    """
    b = sample_bucket(F.col(key_col), salt)
    return df.withColumn("sample_bucket", b.cast("long")).where(
        F.col("sample_bucket") < permille
    )


def pack_sequences(
    df: DataFrame,
    n_tokens_col: str = "n_tokens",
    capacity: int = 2048,
    id_col: str = "doc_id",
    order_salt: str = "pack",
    num_rows: int | None = None,
) -> DataFrame:
    """Assign docs to fixed-token-budget training bins (sequence packing).

    Docs are laid out in a deterministic salted-hash order (so the packing
    is reproducible and independent of partitioning), a running token
    prefix sum is taken over that order, and ``bin_id = floor((cumsum - n)
    / capacity)`` — i.e. a bin boundary falls wherever the running total
    crosses a capacity multiple.  Bins can overflow by at most one doc
    (the standard streaming first-fit relaxation: exact bin packing is
    NP-hard and inherently sequential; this layout is what large training
    pipelines actually run).  Docs longer than ``capacity`` occupy
    ceil(n/capacity) bins' worth of budget but are never split here —
    chunking is the tokenizer's job upstream.

    Scale: the prefix sum is ONE global sort + running sum.  Spark plans
    `sum() OVER (ORDER BY ...)` as a single-partition window, so this
    delegates to :func:`crawlspark.ranks.global_prefix_sum` — the same
    two-phase plan the BFS frontier rank uses (range-partition on the
    order key, per-partition partial sums, broadcast offsets): no stage
    sees more than one partition of rows.
    """
    h = base_hash(F.concat(F.lit(order_salt), F.col(id_col).cast("string")))
    d = df.select(
        F.col(id_col),
        F.col(n_tokens_col).cast("long").alias("__n"),
        h.alias("__h"),
    )
    from ..ranks import global_prefix_sum

    start = global_prefix_sum(d, order_cols=["__h", id_col], val_col="__n",
                              out="__start", num_rows=num_rows)
    return start.select(
        F.col(id_col),
        F.col("__n").alias("n_tokens"),
        (F.col("__start") + F.col("__n")).alias("cum_tokens"),
        F.floor(F.col("__start") / capacity).cast("long").alias("bin_id"),
    )


def rebalance_sources(
    df: DataFrame,
    target_permille: dict[str, int],
    source_col: str = "source",
    id_col: str = "doc_id",
    salt: str = "mix",
) -> DataFrame:
    """Down-sample each source to a target share of ITS OWN rows (permille
    kept), e.g. {'web': 1000, 'forum': 250}: keep all web docs, a
    deterministic quarter of forum docs.  Sources absent from the map are
    dropped (permille 0).

    The rate table is a literal map expression compiled into the filter —
    a pure narrow map stage (no join, no shuffle) that fuses into the
    parquet scan; the per-row draw is the same salted hash bucket as
    :func:`hash_sample`, so samples stay consistent across re-runs,
    resumes, and repartitioning.
    """
    rate = F.create_map(
        *[F.lit(x) for kv in target_permille.items() for x in kv]
    )[F.col(source_col)]
    b = sample_bucket(F.col(id_col), salt)
    return df.withColumn(
        "sample_bucket", b.cast("long")
    ).where(F.col("sample_bucket") < F.coalesce(rate, F.lit(0)))


def temperature_sample(
    df: DataFrame,
    source_col: str = "source",
    id_col: str = "doc_id",
    salt: str = "temp",
) -> DataFrame:
    """Temperature-scaled source mixing at T = 0.5 (the multilingual-LM
    recipe: sample source s with probability ∝ n_s^T, so small sources are
    up-weighted relative to their share — mBERT/XLM-R exponent-smoothing,
    Conneau & Lample 2019; unlike :func:`rebalance_sources` the rates are
    DERIVED from the observed counts, not caller-supplied).

    Keep-rate per source = sqrt(n_s / n_max) in permille: the largest
    source keeps everything, a source 100x smaller keeps 1/10th of its
    rows — i.e. its share of the mix grows 10x vs proportional sampling.

    Exactness/scale: the rate is computed in INTEGER arithmetic —
    ``floor(sqrt((10^6 * n_s) div n_max))`` — so the DuckDB oracle replays
    it bit-for-bit (IEEE sqrt of an exact integer is correctly rounded in
    both engines; the div is integer on both).  Plan: one map-side-combined
    count over the corpus, a 1-row max, and a BROADCAST of the tiny rate
    table back onto the big side — the keep filter itself is the same
    deterministic salted hash bucket as :func:`hash_sample` (narrow,
    resume-stable, no shuffle of the corpus).
    """
    counts = df.groupBy(source_col).agg(F.count("*").alias("__n"))
    nmax = counts.agg(F.max("__n").alias("__nmax"))
    rates = (
        counts.crossJoin(F.broadcast(nmax))
        .select(
            source_col,
            F.floor(
                F.sqrt(F.expr("(1000000 * __n) div __nmax").cast("double"))
            ).cast("long").alias("keep_permille"),
        )
    )
    b = sample_bucket(F.col(id_col), salt)
    return (
        df.join(F.broadcast(rates), source_col)
        .withColumn("sample_bucket", b.cast("long"))
        .where(F.col("sample_bucket") < F.col("keep_permille"))
    )


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    k: int,
    id_col: str = "doc_id",
    salt: str = "strat",
) -> DataFrame:
    """Exact deterministic top-k per stratum (e.g. k docs per language).

    Rank = salted hash of the id (ties broken by id), so the draw is
    uniform-ish and reproducible.  Two-phase plan for scale: strata
    cardinality is tiny (languages), so a single window partitioned by
    stratum would funnel each stratum through ONE task.  Phase 1 takes the
    per-(stratum, input-partition) top-k — parallel across the cluster —
    which provably contains the global per-stratum top-k; phase 2 runs the
    exact window on the surviving <= k * n_partitions rows only.
    """
    h = base_hash(F.concat(F.lit(salt), F.col(id_col).cast("string")))
    d = df.select(F.col(strata_col), F.col(id_col), h.alias("rank_hash"))
    part = F.spark_partition_id().alias("__p")
    w1 = Window.partitionBy(strata_col, "__p").orderBy("rank_hash", id_col)
    survivors = (
        d.select("*", part)
        .withColumn("__r1", F.row_number().over(w1))
        .where(F.col("__r1") <= k)
        .drop("__p", "__r1")
    )
    w2 = Window.partitionBy(strata_col).orderBy("rank_hash", id_col)
    return (
        survivors.withColumn("rn", F.row_number().over(w2).cast("long"))
        .where(F.col("rn") <= k)
    )


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_text_col: str = "text",
) -> DataFrame:
    """Benchmark decontamination (GPT-3 appendix C / The Pile: drop
    training documents that share an n-gram with an evaluation set —
    13-grams for GPT-3, 8 here to suit the small fixture corpus).

    Scale shape: the benchmark side is tiny (eval suites are KBs-MBs) —
    its distinct n-gram hashes BROADCAST; the corpus side is one narrow
    explode + broadcast LEFT SEMI probe + map-side-combined per-doc
    count.  The 100 TB corpus never shuffles on text, only the final
    (doc_id, count) aggregate moves.

    Returns (id_col, n_contaminated_ngrams, contaminated) for every doc.
    """
    from .dedup import shingles

    # guard: F.sequence descends when stop < start, so docs shorter than
    # n words must not reach the shingle builder (they can't match anyway)
    bench_grams = (
        benchmark.filter(F.size(F.split(F.col(bench_text_col), " ")) >= n)
        .select(
            F.explode(
                shingles(F.split(F.col(bench_text_col), " "), n)
            ).alias("gram")
        )
        .select(base_hash(F.col("gram")).alias("gh"))
        .distinct()
    )
    doc_grams = (
        docs.filter(F.size(F.split(F.col(text_col), " ")) >= n)
        .select(
            F.col(id_col),
            F.explode(shingles(F.split(F.col(text_col), " "), n)).alias("gram"),
        )
        .select(id_col, base_hash(F.col("gram")).alias("gh"))
    )
    hits = (
        doc_grams.join(F.broadcast(bench_grams), "gh", "left_semi")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_contaminated_ngrams"))
    )
    return (
        docs.select(id_col)
        .join(hits, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_contaminated_ngrams", F.lit(0))
            .cast("long").alias("n_contaminated_ngrams"),
            (F.coalesce("n_contaminated_ngrams", F.lit(0)) > 0)
            .alias("contaminated"),
        )
    )


def chunk_tokens(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_size: int = 32,
    stride: int = 24,
) -> DataFrame:
    """Overlapping token-window chunking — the standard context-window
    prep for embedding / pretraining pipelines (chunk_size tokens per
    chunk, stride < chunk_size gives chunk_size - stride tokens of
    overlap so no boundary context is lost).

    Chunk starts are 0, stride, 2*stride, ... up to the LAST start that
    still begins inside the document (start < n_tokens); the final chunk
    is short if the tail has fewer than chunk_size tokens.  Empty docs
    yield one empty chunk (chunk_id 0) so every input row is accounted
    for downstream.

    Spark shape: whitespace tokenize once, then sequence -> posexplode ->
    slice — all JVM higher-order functions fused into one narrow map over
    the scan (no shuffle, no UDF); at 100 TB this is embarrassingly
    parallel and the only cost is the output fan-out itself.

    Returns (id, chunk_id, start_tok, n_tok, chunk_text).
    """
    toks = F.filter(F.split(F.col(text_col), r"\s+"), lambda w: w != "")
    n = F.size(toks)
    last_start = F.greatest(
        F.lit(0),
        F.floor((n - 1) / F.lit(stride)).cast("int") * F.lit(stride),
    )
    starts = F.sequence(F.lit(0), last_start, F.lit(stride))
    return (
        df.select(F.col(id_col), toks.alias("__toks"),
                  F.posexplode(starts).alias("chunk_id", "start_tok"))
        .select(
            id_col,
            F.col("chunk_id").cast("long").alias("chunk_id"),
            F.col("start_tok").cast("long").alias("start_tok"),
            F.least(
                F.size("__toks") - F.col("start_tok"), F.lit(chunk_size)
            ).cast("long").alias("n_tok"),
            F.concat_ws(
                " ", F.slice("__toks", F.col("start_tok") + 1, chunk_size)
            ).alias("chunk_text"),
        )
    )


def chunk_tokens_oracle_sql(
    chunk_size: int = 32, stride: int = 24, max_tokens: int = 4096,
    table: str = "documents", id_col: str = "doc_id", text_col: str = "text",
) -> str:
    """DuckDB replay of :func:`chunk_tokens`.  DuckDB's generate_series
    takes constant parameters only (no lateral column bounds), so starts
    come from a constant position table up to ``max_tokens`` (must cover
    the longest document — asserted generous for the test tables) cross
    joined and filtered to each doc's real last start; 1-based inclusive
    list_slice mirrors Spark's F.slice."""
    return f"""
WITH t AS (
  SELECT {id_col},
         list_filter(str_split_regex({text_col}, '\\s+'), x -> x <> '')
           AS toks
  FROM {table}
),
gs AS (
  SELECT generate_series AS start_tok
  FROM generate_series(0, {max_tokens}, {stride})
),
s AS (
  SELECT {id_col}, toks, start_tok,
         CAST(start_tok // {stride} AS BIGINT) AS chunk_id
  FROM t CROSS JOIN gs
  WHERE start_tok <=
    GREATEST(0, CAST(((len(toks) - 1) // {stride}) * {stride} AS BIGINT))
)
SELECT {id_col}, chunk_id, CAST(start_tok AS BIGINT) AS start_tok,
       CAST(LEAST(len(toks) - start_tok, {chunk_size}) AS BIGINT) AS n_tok,
       COALESCE(list_aggregate(
         list_slice(toks, start_tok + 1, start_tok + {chunk_size}),
         'string_agg', ' '), '') AS chunk_text
FROM s
"""

def luhn_valid(digits: Column) -> Column:
    """Luhn checksum (ISO/IEC 7812) over a digit string, pure Column
    HOFs: from the RIGHT, double every second digit (subtracting 9 when
    the double exceeds 9) and require the total to divide by 10 — the
    validity gate that separates real payment-card numbers from random
    digit runs (scrubbing every 16-digit run would destroy order ids,
    EANs, timestamps)."""
    rev = F.reverse(digits)
    total = F.aggregate(
        F.sequence(F.lit(1), F.length(digits)),
        F.lit(0).cast("long"),
        lambda acc, i: acc
        + F.when(
            i % 2 == 0,
            F.when(
                (F.ascii(F.substring(rev, i.cast("int"), F.lit(1))) - 48) > 4,
                2 * (F.ascii(F.substring(rev, i.cast("int"), F.lit(1))) - 48)
                - 9,
            ).otherwise(
                2 * (F.ascii(F.substring(rev, i.cast("int"), F.lit(1))) - 48)
            ),
        ).otherwise(
            F.ascii(F.substring(rev, i.cast("int"), F.lit(1))) - 48
        ).cast("long"),
    )
    return (total % 10 == 0) & (F.length(digits) >= 13)


def scrub_credit_cards(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Payment-card scrubbing with Luhn validation: 13-19 digit runs that
    PASS the checksum are replaced with ``[CC]``; runs that fail it (order
    numbers, timestamps) are left alone.  The extract -> validate ->
    fold-replace chain is all Column HOFs (regexp_extract_all + aggregate)
    — narrow map over the scan, the same plan class as :func:`pii_scrub`.

    Returns (id, clean_text, n_cc).
    """
    t = F.col(text_col)
    cands = F.array_distinct(
        F.regexp_extract_all(t, F.lit(r"(?<!\d)\d{13,19}(?!\d)"), 0)
    )
    valid = F.filter(cands, luhn_valid)
    clean = F.aggregate(
        valid, t, lambda acc, c: F.replace(acc, c, F.lit("[CC]"))
    )
    return df.select(
        F.col(id_col),
        clean.alias("clean_text"),
        F.size(valid).cast("long").alias("n_cc"),
    )


def vocab_stats(
    df: DataFrame, group_col: str = "lang", text_col: str = "text"
) -> DataFrame:
    """Per-slice vocabulary statistics — the corpus-health diagnostics a
    training-data pipeline tracks per language/source: token count, type
    count (distinct words), hapax share (words seen once — high hapax =
    noisy OCR / low dedup; low hapax = template spam), and the top
    token's share.  All integer permille.

    Two-level aggregation: explode -> groupBy(slice, word) is map-side
    combined (a 10^11-token slice reduces to its vocabulary before the
    exchange), then one groupBy(slice) over vocabulary-sized data.
    Returns (group, n_tokens, n_types, hapax_permille,
    top_token_permille).
    """
    words = df.select(
        F.col(group_col).alias("g"),
        F.explode(
            F.filter(F.split(F.col(text_col), r"\s+"), lambda w: w != "")
        ).alias("w"),
    )
    wc = words.groupBy("g", "w").agg(F.count("*").alias("c"))
    return (
        wc.groupBy("g")
        .agg(
            F.sum("c").cast("long").alias("n_tokens"),
            F.count("*").cast("long").alias("n_types"),
            F.sum(F.when(F.col("c") == 1, 1).otherwise(0)).cast("long")
            .alias("__hapax"),
            F.max("c").cast("long").alias("__top"),
        )
        .select(
            F.col("g").alias(group_col),
            "n_tokens",
            "n_types",
            F.expr("(1000 * __hapax) div n_types").alias("hapax_permille"),
            F.expr("(1000 * __top) div n_tokens").alias("top_token_permille"),
        )
    )


def epoch_plan(
    sources: DataFrame,
    total_docs_per_epoch: int,
    source_col: str = "source",
    n_docs_col: str = "n_docs",
    weight_col: str = "weight",
) -> DataFrame:
    """Epoch sampling plan — the data-order planner for a training run:
    split an epoch's document budget across sources proportionally to
    integer mixture weights, then express each source's allotment as a
    repeat rate against what the source actually holds
    (repeat_permille > 1000 = the source is traversed more than once per
    epoch — the small high-quality corpus upsampled; < 1000 = subsampled).

        target_s = total * w_s div sum(w)
        repeat_permille_s = 1000 * target_s div n_docs_s

    One 1-row aggregate broadcast back (same shape as
    scheduler.allocate_host_budgets); floor division keeps the plan
    bit-exact, the <n_sources undershoot rolls into the next epoch.
    Returns (source, n_docs, weight, target_docs, repeat_permille).
    """
    w = F.col(weight_col).cast("long")
    tot = sources.agg(F.sum(w).alias("__tw"))
    return (
        sources.select(
            F.col(source_col).alias("source"),
            F.col(n_docs_col).cast("long").alias("n_docs"),
            w.alias("weight"),
        )
        .join(F.broadcast(tot))
        .select(
            "source", "n_docs", "weight",
            F.expr(f"({int(total_docs_per_epoch)}L * weight) div __tw")
            .alias("target_docs"),
            F.expr(
                f"(1000 * (({int(total_docs_per_epoch)}L * weight)"
                " div __tw)) div n_docs"
            ).alias("repeat_permille"),
        )
    )


def train_val_test_split(
    df: DataFrame,
    id_col: str = "doc_id",
    train_permille: int = 900,
    val_permille: int = 50,
    salt: str = "split1",
) -> DataFrame:
    """Reproducible three-way split — the eval-hygiene primitive every
    training corpus needs: assignment is a pure function of (salt, id),
    so it is stable under repartition, resume, re-crawl, and corpus
    growth (a doc never migrates between splits when other docs arrive —
    the property random shuffles don't have).

    bucket = hash(salt||id) % 1000; [0, train) -> train,
    [train, train+val) -> val, rest -> test.  Narrow map, SQL-replayable
    via the md5-prefix hash.  Returns input + (split_bucket, split).
    """
    b = sample_bucket(F.col(id_col), salt=salt)
    split = (
        F.when(b < train_permille, F.lit("train"))
        .when(b < train_permille + val_permille, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return df.select(
        "*", b.cast("long").alias("split_bucket"), split.alias("split")
    )


def truncate_head_tail(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    head_tokens: int = 24,
    tail_tokens: int = 8,
) -> DataFrame:
    """Head+tail truncation for over-long documents — the
    context-window strategy that beats plain head-truncation on
    documents whose conclusions matter (papers, articles, contracts):
    keep the first ``head_tokens`` and last ``tail_tokens`` tokens with
    an ellipsis marker between; docs already within budget pass
    through unchanged.  Pure HOF slices, narrow map.

    Returns (id, n_tokens, truncated:boolean, text_out).
    """
    toks = F.filter(F.split(F.col(text_col), r"\s+"), lambda w: w != "")
    n = F.size(toks)
    budget = head_tokens + tail_tokens
    head = F.slice(toks, 1, head_tokens)
    tail = F.slice(toks, n - tail_tokens + 1, tail_tokens)
    out = F.when(
        n <= budget, F.concat_ws(" ", toks)
    ).otherwise(
        F.concat_ws(
            " ",
            F.concat_ws(" ", head), F.lit("..."), F.concat_ws(" ", tail),
        )
    )
    return df.select(
        F.col(id_col),
        n.cast("long").alias("n_tokens"),
        (n > budget).alias("truncated"),
        out.alias("text_out"),
    )


BITEXT_MIN_RATIO_PERMILLE = 500
BITEXT_MAX_RATIO_PERMILLE = 2000


def bitext_candidates(
    docs: DataFrame,
    cluster_col: str = "cluster_key",
    lang_col: str = "lang",
    id_col: str = "doc_id",
    len_col: str = "n_chars",
    pivot_lang: str = "en",
) -> DataFrame:
    """Bitext candidate mining from language-variant clusters (the
    CCMatrix/CCAligned shape, but structure-driven: hreflang clusters
    already assert the documents are translations of each other) —
    pair the cluster's pivot-language edition with every other
    language edition, keeping pairs whose length ratio is plausible
    for a translation (0.5x..2x — wildly different lengths mean one
    side is a stub or an error page).

    One self-join on the cluster key (pivot side filtered first, so
    the join is pivot x other, not all-pairs); integer ratio in
    permille.  Returns (cluster_key, src_id, src_lang, tgt_id,
    tgt_lang, len_ratio_permille, plausible).
    """
    pivot = docs.filter(F.col(lang_col) == pivot_lang).select(
        F.col(cluster_col).alias("cluster_key"),
        F.col(id_col).alias("src_id"),
        F.col(lang_col).alias("src_lang"),
        F.col(len_col).cast("long").alias("__sl"),
    )
    other = docs.filter(F.col(lang_col) != pivot_lang).select(
        F.col(cluster_col).alias("cluster_key"),
        F.col(id_col).alias("tgt_id"),
        F.col(lang_col).alias("tgt_lang"),
        F.col(len_col).cast("long").alias("__tl"),
    )
    j = pivot.join(other, "cluster_key")
    ratio = F.expr("(1000 * __tl) div greatest(__sl, 1)")
    plausible = (ratio >= BITEXT_MIN_RATIO_PERMILLE) & (
        ratio <= BITEXT_MAX_RATIO_PERMILLE
    )
    return j.select(
        "cluster_key", "src_id", "src_lang", "tgt_id", "tgt_lang",
        ratio.cast("long").alias("len_ratio_permille"),
        plausible.alias("plausible"),
    )


PRIORITY_SCALE = 1 << 43  # quantization for w/u priorities (see below)
PRIORITY_U_SPAN = 1 << 32  # base_hash+1 spans [1, 2^32]
# priorities q = w/u_frac = w*2^32/u are stored as qk = (w<<43) div u =
# q * 2^11, so tau and the re-weighted estimates live in (weight << 11)
# units:
PRIORITY_EST_SCALE = PRIORITY_SCALE // PRIORITY_U_SPAN


def priority_sample(
    df: DataFrame,
    strata_col: str,
    weight_col: str,
    k: int,
    id_col: str = "doc_id",
    salt: str = "prio",
) -> DataFrame:
    """Weighted sampling without replacement per stratum — Duffield-
    Lund-Thorup priority sampling (Priority sampling for estimation of
    arbitrary subset sums, JACM 2007), the scheme whose k-subset
    supports UNBIASED subset-sum estimates: each item gets priority
    q_i = w_i / u_i with u_i uniform, the k highest priorities are the
    sample, and each sampled item is re-weighted max(w_i, tau) where
    tau is the (k+1)-th priority.  hash_sample/stratified_sample ignore
    weights; temperature_sample reweights whole strata — this is the
    per-ITEM weighted draw (sample long docs more, keep totals
    estimable), the standard way to subsample a corpus while preserving
    per-language token-count estimates.

    Determinism + oracle replay: u_i is the salted md5-prefix hash
    (base_hash, in [1, 2^32]); the priority is QUANTIZED to the integer
    sort key qk = (w << 43) div u (floor division) so both engines
    compare identical BIGINTs — no float, no libm.  Ties broken by id.
    Re-weighting: u spans [1, 2^32] so a stored key qk = (w << 43)
    div u equals the true priority w/u_frac scaled by 2^11; est_scaled
    = max(w << 11, tau_qk) is therefore max(w_i, tau) in (weight << 11)
    units and sum(est_scaled) >> 11 estimates the stratum's total
    weight from the k kept rows (unbiased up to the deterministic
    floor quantization).

    Scale shape: same two-phase plan as stratified_sample — the
    per-stratum window would funnel each stratum (a whole language!)
    through one task, so phase 1 takes the per-(stratum, partition)
    top-(k+1) in parallel (provably a superset of the global
    top-(k+1); k+1 because tau is the (k+1)-th order statistic),
    phase 2 windows only the <= (k+1)*n_partitions survivors.

    Returns (strata, id, weight, qk, rn, tau_qk, est_scaled) for the k
    kept rows per stratum; tau_qk NULL when the stratum had <= k items
    (everything kept, est = exact weight).
    """
    w = F.col(weight_col).cast("long")
    u = base_hash(F.concat(F.lit(salt), F.col(id_col).cast("string"))) + 1
    qk = F.expr(f"(weight * CAST({PRIORITY_SCALE} AS BIGINT)) div __u")
    d = (
        df.select(F.col(strata_col), F.col(id_col), w.alias("weight"))
        .withColumn("__u", u)
        .withColumn("qk", qk)
        .drop("__u")
    )
    part = F.spark_partition_id().alias("__p")
    w1 = Window.partitionBy(strata_col, "__p").orderBy(
        F.desc("qk"), F.col(id_col))
    survivors = (
        d.select("*", part)
        .withColumn("__r1", F.row_number().over(w1))
        .where(F.col("__r1") <= k + 1)
        .drop("__p", "__r1")
    )
    w2 = Window.partitionBy(strata_col).orderBy(F.desc("qk"), F.col(id_col))
    wall = Window.partitionBy(strata_col)
    ranked = survivors.withColumn(
        "rn", F.row_number().over(w2).cast("long"))
    return (
        ranked.withColumn(
            "tau_qk",
            F.max(F.when(F.col("rn") == k + 1, F.col("qk"))).over(wall))
        .where(F.col("rn") <= k)
        .withColumn(
            "est_scaled",
            F.greatest(
                F.col("weight") * F.lit(PRIORITY_EST_SCALE),
                F.coalesce(F.col("tau_qk"), F.lit(0)),
            ),
        )
    )


def pack_multimodal(
    df: DataFrame,
    n_tokens_col: str = "n_tokens",
    n_images_col: str = "n_images",
    token_capacity: int = 2048,
    image_capacity: int = 8,
    image_token_cost: int = 64,
    id_col: str = "doc_id",
    order_salt: str = "mmpack",
) -> DataFrame:
    """Interleaved multimodal sequence packing — the image-axis sibling of
    :func:`pack_sequences`: a vision-language training sequence spends its
    budget on text tokens PLUS a fixed per-image patch-token cost, and is
    additionally capped on images per sequence (vision-encoder batch
    memory), so packing is constrained in TWO dimensions.

    Docs are laid out in the same deterministic salted-hash order as
    pack_sequences; running prefix sums are taken over BOTH the combined
    token cost (``n_tokens + image_token_cost * n_images``) and the image
    count; ``bin_id = greatest(floor(cost_start / token_capacity),
    floor(img_start / image_capacity))`` — a bin boundary falls wherever
    EITHER running budget crosses a multiple of its capacity.  Same
    streaming first-fit relaxation as pack_sequences (a bin can overflow
    by at most one doc per dimension); ``bound_by`` reports which budget
    closed each doc's bin ('tokens' / 'images' / 'both').

    Scale: two exclusive prefix sums over one total order — both via
    ranks.global_prefix_sum (range-partition + partial sums + broadcast
    offsets), never a single-partition window; the second sum reuses the
    first's order columns so AQE sees the same range exchange.
    """
    h = base_hash(F.concat(F.lit(order_salt), F.col(id_col).cast("string")))
    cost = (
        F.col(n_tokens_col).cast("long")
        + F.lit(int(image_token_cost)) * F.col(n_images_col).cast("long")
    )
    d = df.select(
        F.col(id_col),
        F.col(n_tokens_col).cast("long").alias("n_tokens"),
        F.col(n_images_col).cast("long").alias("n_images"),
        cost.alias("__cost"),
        h.alias("__h"),
    )
    from ..ranks import global_prefix_sum

    d = global_prefix_sum(d, order_cols=["__h", id_col], val_col="__cost",
                          out="__cost_start")
    d = global_prefix_sum(d, order_cols=["__h", id_col], val_col="n_images",
                          out="__img_start")
    tok_bin = F.floor(F.col("__cost_start") / token_capacity).cast("long")
    img_bin = F.floor(F.col("__img_start") / image_capacity).cast("long")
    return d.select(
        F.col(id_col),
        "n_tokens",
        "n_images",
        F.col("__cost").alias("seq_cost"),
        F.greatest(tok_bin, img_bin).alias("bin_id"),
        F.when(tok_bin == img_bin, "both")
        .when(tok_bin > img_bin, "tokens")
        .otherwise("images").alias("bound_by"),
    )


def corpus_datasheet(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """One-row corpus datasheet — the summary block a dataset card
    leads with (Gebru et al., "Datasheets for Datasets"): document
    and token counts, vocabulary size, mean document length, and the
    exact-duplicate rate.  Everything is a map-side-combined
    aggregate or a vocabulary-scale groupBy; the scalars meet in one
    broadcast cross-join, so the datasheet costs two passes at any
    corpus size.

    Returns (n_docs, n_tokens, vocab_size, mean_tokens_milli,
    n_exact_dup_docs, dup_permille).
    """
    toks = F.filter(
        F.split(F.lower(F.col(text_col)), "[^a-z]+"),
        lambda t: t != "",
    )
    base = docs.select(F.col(id_col).alias("id"), toks.alias("t"),
                       F.col(text_col).alias("__text"))
    core = base.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(F.size("t")).cast("long").alias("n_tokens"),
        F.countDistinct("__text").cast("long").alias("n_distinct_texts"),
    )
    vocab = (
        base.select(F.explode("t").alias("w"))
        .agg(F.countDistinct("w").cast("long").alias("vocab_size"))
    )
    return (
        core.crossJoin(F.broadcast(vocab))
        .select(
            "n_docs", "n_tokens", "vocab_size",
            F.when(F.col("n_docs") > 0,
                   F.round(1e3 * F.col("n_tokens").cast("double")
                           / F.col("n_docs"), 0).cast("long"))
            .alias("mean_tokens_milli"),
            (F.col("n_docs") - F.col("n_distinct_texts"))
            .alias("n_exact_dup_docs"),
            F.when(F.col("n_docs") > 0, F.expr(
                "(1000 * (n_docs - n_distinct_texts)) div n_docs"))
            .alias("dup_permille"),
        )
    )


# ---------------------------------------------------------------------------
# Luhn credit-card detection (PII, checksum-verified)
# ---------------------------------------------------------------------------

def luhn_cc_audit(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Checksum-verified payment-card detection — the high-precision
    sibling of :func:`pii_scrub`'s pattern redaction: a 13-19 digit run
    is only PII-flagged when it passes the Luhn mod-10 check (ISO/IEC
    7812), which rejects ~90% of random digit runs (order numbers,
    tracking ids, timestamps) that a bare regex would scrub.

    Candidates are maximal digit runs (lookaround-bounded, so a
    25-digit serial yields NO 19-digit sub-candidate); the Luhn fold is
    a per-candidate Column HOF (reverse positional walk: double every
    second digit from the right, subtract 9 above 9, sum % 10 == 0) —
    pure narrow-map arithmetic, SQL-replayable digit by digit.

    Returns (id, n_candidates, n_luhn_valid, first_valid_last4); docs
    with a valid hit are the scrub/quarantine feed.
    """
    cands = F.regexp_extract_all(
        F.col(text_col), F.lit(r"(?<!\d)(\d{13,19})(?!\d)"), 1
    )
    def _luhn_ok(s):
        d = lambda i: F.reverse(s).substr(i, F.lit(1)).cast("int")  # noqa: E731
        term = lambda i: F.when(  # noqa: E731
            i % 2 == 1, d(i)
        ).otherwise(
            F.when(d(i) * 2 > 9, d(i) * 2 - 9).otherwise(d(i) * 2)
        )
        return (
            F.aggregate(
                F.sequence(F.lit(1), F.length(s)), F.lit(0),
                lambda acc, i: acc + term(i),
            ) % 10 == 0
        )

    luhn_ok = _luhn_ok
    valid = F.filter(cands, luhn_ok)
    return df.select(
        F.col(id_col),
        F.size(cands).cast("long").alias("n_candidates"),
        F.size(valid).cast("long").alias("n_luhn_valid"),
        F.when(
            F.size(valid) > 0,
            F.substring(F.element_at(valid, 1), -4, 4),
        ).alias("first_valid_last4"),
    )


# ---------------------------------------------------------------------------
# Unicode hygiene audit (invisible chars, bidi controls, combining marks)
# ---------------------------------------------------------------------------

def unicode_hygiene(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Invisible/control-codepoint audit for crawl text: zero-width
    characters (ZWSP/ZWNJ/ZWJ/word-joiner/BOM — SEO cloaking and
    copy-trap watermarks ride these), soft hyphens (U+00AD — break
    token counts and dedup hashes), explicit bidi controls
    (U+202A-202E / U+2066-2069 — the "Trojan Source" class, and a
    spoofing vector in link text), and combining marks (zalgo /
    double-diacritic junk when dense).  Emits counts plus a scrubbed
    text with the first three classes removed and NFC-agnostic combing
    left alone (combining marks are legitimate in many scripts —
    density is the signal, not presence).

    Pure JVM regexp counts + one regexp_replace — narrow map, fuses
    into the scan.
    """
    t = F.col(text_col)
    zw = r"[\u200B\u200C\u200D\u2060\uFEFF]"
    bidi = r"[\u202A-\u202E\u2066-\u2069]"
    shy = r"\u00AD"
    comb = r"\p{Mn}"
    count = lambda rx: F.size(  # noqa: E731
        F.regexp_extract_all(t, F.lit(rx), 0)
    ).cast("long")
    scrubbed = F.regexp_replace(
        t, f"(?:{zw}|{bidi}|{shy})", ""
    )
    return df.select(
        F.col(id_col),
        count(zw).alias("n_zero_width"),
        count(bidi).alias("n_bidi"),
        count(shy).alias("n_soft_hyphen"),
        count(comb).alias("n_combining"),
        scrubbed.alias("scrubbed"),
        F.length(t).cast("long").alias("len_raw"),
        F.length(scrubbed).cast("long").alias("len_scrubbed"),
    )


# ---------------------------------------------------------------------------
# Line-break dehyphenation (PDF/OCR text repair)
# ---------------------------------------------------------------------------

def dehyphenate(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Rejoin words split by end-of-line hyphenation — the classic
    PDF/OCR extraction artifact ('informa-\\n tion') that breaks token
    counts, dedup hashes and every downstream n-gram statistic.  The
    rule is deliberately conservative: a lowercase letter, a hyphen,
    optional trailing spaces, ONE newline, optional indent, then a
    lowercase letter — explicit dashes before capitals ('US-\\nBased')
    and list bullets are left alone.

    Pure regexp (count + replace), narrow map.  Returns (id, text,
    n_rejoined) with the repaired text.
    """
    t = F.col(text_col)
    pat = r"([a-z])- *\n[ \t]*([a-z])"
    return df.select(
        F.col(id_col),
        F.regexp_replace(t, pat, r"$1$2").alias("text"),
        F.regexp_count(t, F.lit(pat)).cast("long").alias("n_rejoined"),
    )


# ---------------------------------------------------------------------------
# Content-kind routing (chat / math / code signals)
# ---------------------------------------------------------------------------

def content_kind_signals(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Route documents by content KIND before mixing — instruction/chat
    transcripts, math-heavy text and code want different pipelines
    (chat data must not leak into pretraining dedup'd as prose; math
    and code get their own tokenizer/quality treatment):

    - chat: dialogue-turn markers (``Human:`` / ``Assistant:`` /
      ``Q:`` / ``A:`` at line starts, ``<|im_start|>`` template tokens)
      — ``n_turns`` counts them;
    - math: LaTeX structures (``\\frac``, ``\\begin{..}``, ``$$``,
      inline ``\\( \\)``) — ``n_math``;
    - code: fenced blocks plus a keyword screen (``def`` / ``class`` /
      ``function`` / ``import`` / ``return`` at line starts) —
      ``n_code``.

    ``kind`` picks the dominant signal (ties: chat > code > math —
    chat contamination is the costliest) with 'prose' when all zero.
    Pure regexp counts, narrow map.
    """
    t = F.coalesce(F.col(text_col), F.lit(""))
    n_turns = (
        F.regexp_count(t, F.lit(r"(?m)^(Human|Assistant|User|Q|A)\s*:"))
        + F.regexp_count(t, F.lit(r"<\|im_start\|>"))
    ).cast("long")
    n_math = (
        F.regexp_count(t, F.lit(r"\\(frac|begin\{[a-z*]+\}|sum|int)\b"))
        + F.regexp_count(t, F.lit(r"\$\$"))
        + F.regexp_count(t, F.lit(r"\\\("))
    ).cast("long")
    n_code = (
        F.regexp_count(t, F.lit("```"))
        + F.regexp_count(
            t, F.lit(r"(?m)^\s*(def |class |function |import |return )"))
    ).cast("long")
    kind = (
        F.when((n_turns == 0) & (n_math == 0) & (n_code == 0),
               F.lit("prose"))
        .when((n_turns >= n_code) & (n_turns >= n_math), F.lit("chat"))
        .when(n_code >= n_math, F.lit("code"))
        .otherwise(F.lit("math"))
    )
    return df.select(
        F.col(id_col),
        n_turns.alias("n_turns"),
        n_math.alias("n_math"),
        n_code.alias("n_code"),
        kind.alias("kind"),
    )


def canary_scan(
    df: DataFrame,
    canaries: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Eval-set canary scan (the BIG-bench practice: benchmark files
    embed a unique canary GUID precisely so trainers can PROVE their
    corpus never saw them): count occurrences of each shipped canary
    string per document and total.  Any hit routes the doc out and —
    more importantly — flags the upstream source for contamination
    review.

    The canary list is a plan literal (tens of strings); counting is a
    per-canary regexp_count sum — narrow map, no join, no shuffle.
    Returns (id, n_canary_hits, first_canary) — ``first_canary`` is
    the first list entry found (list order = severity order).
    """
    import re as _re

    t = F.coalesce(F.col(text_col), F.lit(""))
    if not canaries:
        return df.select(
            F.col(id_col),
            F.lit(0).cast("long").alias("n_canary_hits"),
            F.lit(None).cast("string").alias("first_canary"),
        )
    counts = [F.regexp_count(t, F.lit(_re.escape(c))).cast("long")
              for c in canaries]
    total = counts[0]
    for c in counts[1:]:
        total = total + c
    first = None
    for c, cnt in reversed(list(zip(canaries, counts))):
        cond = cnt > 0
        first = F.when(cond, F.lit(c)) if first is None else F.when(
            cond, F.lit(c)).otherwise(first)
    return df.select(
        F.col(id_col),
        total.alias("n_canary_hits"),
        first.alias("first_canary"),
    )
