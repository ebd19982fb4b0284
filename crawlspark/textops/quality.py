"""Text quality / language-id / token counting / fingerprinting.

Every formula is integer-exact (ratios as permille via integer division) so
DuckDB oracles replay bit-for-bit — no float fuzz in the correctness gate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import base_hash

STOPWORDS = ["the", "a", "of", "and", "to"]

# marker-word sets for the n-gram language heuristic; prediction is the
# argmax of marker occurrences with a fixed tie order (en > de > fr > other)
LANG_MARKERS = {
    "en": ["the", "and", "of"],
    "de": ["der", "und", "das"],
    "fr": ["le", "et", "les"],
}


def _count_occurrences(text: Column, needle: str) -> Column:
    """Occurrences of a fixed substring via the length-difference trick
    (identical semantics in Spark and DuckDB)."""
    return (
        (F.length(text) - F.length(F.replace(text, F.lit(needle), F.lit(""))))
        / len(needle)
    ).cast("long")


COUNT_SQL = "CAST((length({t}) - length(replace({t}, '{n}', ''))) / {l} AS BIGINT)"


def token_count(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace tokens + a BPE-ish estimate (ceil(chars/4), the classic
    4-chars-per-token heuristic) — both integer-exact."""
    t = F.col(text_col)
    ws = F.size(F.split(t, " ")).cast("long")
    bpe = F.ceil(F.length(t) / 4).cast("long")
    return df.select(
        "doc_id", ws.alias("ws_tokens"), bpe.alias("bpe_tokens_est"),
        F.length(t).cast("long").alias("n_chars"),
    )


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Length / stopword-ratio quality signals, score in integer permille."""
    t = F.col(text_col)
    words = F.split(t, " ")
    n_words = F.size(words).cast("long")
    n_chars = F.length(t).cast("long")
    stop_cnt = F.size(F.filter(words, lambda w: w.isin(STOPWORDS))).cast("long")
    mean_word_len_milli = F.floor(n_chars * 1000 / n_words).cast("long")
    stop_permille = F.floor(stop_cnt * 1000 / n_words).cast("long")
    # crude quality: long-enough docs with some stopwords score higher
    score = (
        F.least(n_words, F.lit(100)) * 5
        + F.least(stop_permille, F.lit(300))
    ).cast("long")
    return df.select(
        "doc_id",
        n_words.alias("n_words"),
        stop_cnt.alias("stopword_cnt"),
        mean_word_len_milli.alias("mean_word_len_milli"),
        stop_permille.alias("stop_permille"),
        score.alias("quality_score"),
    )


def lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Marker-count language heuristic with deterministic tie-breaking."""
    t = F.concat(F.lit(" "), F.col(text_col), F.lit(" "))
    scores = {
        lang: sum(
            (_count_occurrences(t, f" {m} ") for m in markers), F.lit(0).cast("long")
        )
        for lang, markers in LANG_MARKERS.items()
    }
    en, de, fr = scores["en"], scores["de"], scores["fr"]
    best = F.greatest(en, de, fr)
    pred = (
        F.when(best == 0, "other")
        .when(en == best, "en")
        .when(de == best, "de")
        .otherwise("fr")
    )
    return df.select(
        "doc_id",
        en.alias("score_en"), de.alias("score_de"), fr.alias("score_fr"),
        pred.alias("pred_lang"),
    )


def doc_fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Content fingerprint: hash of the first 64 chars + length (a cheap
    whole-document stand-in; winnow_fingerprints below is the real
    rolling-hash local-fingerprint operator)."""
    t = F.col(text_col)
    fp = base_hash(F.concat(F.substring(t, 1, 64), F.length(t).cast("string")))
    return df.select("doc_id", fp.alias("fingerprint"))


def unigram_logprob(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """CCNet-style LM quality scoring (Wenzek et al. 2020,
    arXiv:1911.00359 §4.3 — docs ranked by LM perplexity), reduced to a
    corpus-trained UNIGRAM model so the whole thing is two DataFrame
    passes: (1) token counts over the corpus (one map-side-combined
    groupBy), (2) per-token cost ``-ln(cnt(w)/T)`` joined back onto the
    token stream and averaged per document.  Low mean cost = typical
    wording (fluent), high = rare-token soup (gibberish, boilerplate
    codes) — the standard perplexity-filter signal without shipping an
    external LM.

    Determinism at scale: the per-token cost is quantized to integer
    MICRO-nats BEFORE the per-doc sum — a float sum across partitions is
    order-nondeterministic in its last bits, an integer sum is not, so
    the result is bit-stable under any parallelism (and DuckDB replays
    it exactly).  At 100 TB the count relation is heavy-tailed: broadcast
    the top-V tokens and floor the tail to an OOV cost instead of the
    full join (same plan shape, bounded build side).

    Returns (id, n_tokens, nll_micro_mean): mean cost in micro-nats,
    floor-divided, all LONG.
    """
    toks = df.select(F.col(id_col), F.explode(F.split(F.col(text_col), " ")).alias("w"))
    cnt = toks.groupBy("w").agg(F.count("*").alias("__c"))
    tot = cnt.agg(F.sum("__c").alias("__t"))
    cost = F.floor(-F.log(F.col("__c") / F.col("__t")) * 1_000_000).cast("long")
    per_tok = (
        toks.join(cnt, "w")
        .crossJoin(F.broadcast(tot))
        .select(F.col(id_col), cost.alias("__cost"))
    )
    return per_tok.groupBy(id_col).agg(
        F.count("*").cast("long").alias("n_tokens"),
        F.floor(F.sum("__cost") / F.count("*")).cast("long").alias("nll_micro_mean"),
    )


def bm25_top_terms(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    top_k: int = 3,
) -> DataFrame:
    """Per-document top-k BM25 term weights (Robertson/Okapi, k1=1.2,
    b=0.75) — the keyword signature used for corpus search, near-dup
    triage and topic-balance audits over a crawl.

    All arithmetic is integer (idf and the tf normalization are scaled to
    micro/milli units with floor divisions in a fixed order), so weights
    are bit-stable under any partitioning and the oracle replays them:

        rel_dl_milli = (1000 * dl * N) // T          (dl/avgdl in milli)
        norm_milli   = 250 + (750 * rel_dl_milli) // 1000
        tf_factor    = (22000 * tf * 10^6) // (10000 * tf + 12 * norm_milli)
        idf_micro    = floor(10^6 * ln(1 + (N - df + 0.5)/(df + 0.5)))
        w_micro      = (idf_micro * tf_factor) // 10^6

    Plan shape: one groupBy((doc, term)) for tf (map-side combine), one
    groupBy(term) for df over the already-reduced tf relation, scalars
    (N, T) broadcast, and a PARTITIONED top-k window per doc.  The df
    relation is vocabulary-sized — broadcast it when it fits, as here.

    Returns (id, term, tf, w_micro, rnk) with rnk 1..top_k per doc.
    """
    from pyspark.sql import Window

    toks = df.select(
        F.col(id_col),
        F.explode(F.filter(F.split(F.col(text_col), r"\s+"),
                           lambda w: w != "")).alias("term"),
    )
    tf = toks.groupBy(id_col, "term").agg(F.count("*").alias("tf"))
    dl = tf.groupBy(id_col).agg(F.sum("tf").alias("dl"))
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    scal = dl.agg(
        F.count("*").alias("n_docs"), F.sum("dl").alias("t_tokens")
    )
    idf_micro = F.floor(
        F.log(
            1.0
            + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
        )
        * 1_000_000
    ).cast("long")
    rel_dl_milli = F.expr("(1000 * dl * n_docs) div t_tokens")
    norm_milli = F.lit(250) + F.expr("(750 * __rel) div 1000")
    scored = (
        tf.join(dl, id_col)
        .crossJoin(F.broadcast(scal))
        .join(F.broadcast(dfreq), "term")
        .withColumn("__idf", idf_micro)
        .withColumn("__rel", rel_dl_milli)
        .withColumn("__norm", norm_milli)
        .withColumn(
            "__tff",
            F.expr("(22000 * tf * 1000000) div (10000 * tf + 12 * __norm)"),
        )
        .withColumn("w_micro", F.expr("(__idf * __tff) div 1000000"))
    )
    w = Window.partitionBy(id_col).orderBy(
        F.desc("w_micro"), F.asc("term")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= top_k)
        .select(id_col, "term", F.col("tf").cast("long").alias("tf"),
                "w_micro", F.col("rnk").cast("long").alias("rnk"))
    )


def winnow_fingerprints(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    w: int = 4,
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer, Wilkerson, Aiken,
    SIGMOD'03 — the MOSS algorithm): hash every k-char gram, then keep the
    minimum hash of each w-gram window; the distinct minima are the doc's
    fingerprint set, with the guarantee that any shared substring of
    length >= k + w - 1 between two documents produces at least one shared
    fingerprint.  Overlap of fingerprint sets is the plagiarism/near-dup
    signal at local (passage) granularity, where MinHash is global.

    Returns (id, fp, first_pos) — one row per distinct fingerprint with
    its first window position, integer-exact and replayed bit-for-bit by
    the DuckDB oracle.

    Plan shape (round-5 fix): gram hashing is ONE transform evaluated
    once per document (posexplode materializes it), and the w-window
    minimum is a per-document ROW WINDOW aggregate
    (``min(h) OVER (PARTITION BY doc ORDER BY pos ROWS BETWEEN CURRENT
    ROW AND w-1 FOLLOWING)``) — a single JVM pass.  The previous nested
    HOF (an outer transform slicing an inner transform's array) hit
    Catalyst's CollapseProject: the O(L) gram expression was INLINED into
    every window lambda, recomputing the whole gram array per window —
    O(L^2) interpreted md5 per document (measured: 0.4 s/300-char doc;
    the sf0.1 gate query ran 40+ minutes on one task).  Now ~3 s for the
    whole 5000-doc table."""
    from pyspark.sql import Window

    d = df.select(F.col(id_col), F.col(text_col).alias("__t"))
    n_grams = F.length("__t") - k + 1
    # sequence(1, 0) would DESCEND in Spark — guard short docs to empty
    grams = F.when(
        n_grams >= 1,
        F.transform(
            F.sequence(F.lit(1), n_grams),
            lambda i: base_hash(F.col("__t").substr(i, F.lit(k))),
        ),
    ).otherwise(F.array().cast("array<bigint>"))
    g = d.select(
        F.col(id_col),
        (n_grams - w + 1).alias("__nwin"),
        F.posexplode(grams).alias("pos0", "__h"),
    )
    wspec = (
        Window.partitionBy(id_col)
        .orderBy("pos0")
        .rowsBetween(Window.currentRow, w - 1)
    )
    return (
        g.withColumn("fp", F.min("__h").over(wspec))
        .filter(F.col("pos0") < F.col("__nwin"))  # full windows only
        .groupBy(id_col, "fp")
        .agg((F.min("pos0") + 1).cast("long").alias("first_pos"))
    )


# Frozen hashed-linear classifier artifact (fastText-style, Joulin et al.
# 2016 reduced to 1-dim: hashed bag-of-tokens -> averaged bucket weights ->
# threshold).  The weight table is a SHIPPED artifact — derived once from a
# stand-in training run (per-bucket integer micro-nat log-ratio of src0 vs
# the rest over the gate corpus, +1 smoothing; a real deployment ships a
# fastText .bin the same way).  64 buckets, micro-units, all arithmetic
# integer so the DuckDB oracle replays bit-for-bit.
FT_BUCKETS = 64
FT_WEIGHTS_MICRO: list[int] = [
    164322, 0, -116086, -270878, 0, -214927, 224892, 0, 0, 0, 0, 0, 0,
    92605, -125359, -86961, 26349, 0, 0, 0, 0, 0, 0, 0, 0, 0, -96727, 0,
    0, 0, 0, 70443, 147219, 0, 0, 58962, 0, 44959, 0, 0, -52248, 0,
    -45028, 0, 0, -175676, 0, -164917, 38354, 0, -135506, 0, 164322,
    -29867, 0, 0, 0, 0, 0, -169963, 0, 0, -82852, 0,
]
FT_SALT = "ft"


def classifier_score(
    df: DataFrame,
    text_col: str = "text",
    weights_micro: list[int] | None = None,
    threshold_micro: int = 0,
) -> DataFrame:
    """Model-based quality filtering (the CCNet/LLaMA recipe: a linear
    text classifier decides keep/drop; here the fastText-style hashed
    bag-of-tokens form).  score = avg over tokens of
    ``weights[base_hash(salt||token) % K]``; keep iff
    ``score_sum_micro >= threshold_micro * n_tokens`` (integer
    cross-multiplication — no float mean, so exact and replayable).

    Plan: pure Column HOFs (split -> transform hash+array-index ->
    aggregate sum) — a narrow map fusing into the scan, the weight table
    a plan literal (the 100 TB shape: the model rides the closure, no
    join, no shuffle, no UDF)."""
    w = weights_micro if weights_micro is not None else FT_WEIGHTS_MICRO
    k = len(w)
    warr = F.array(*[F.lit(int(x)) for x in w])
    toks = F.filter(F.split(F.col(text_col), r"\s+"), lambda x: x != "")
    per_tok = F.transform(
        toks,
        lambda t: F.element_at(
            warr,
            (base_hash(F.concat(F.lit(FT_SALT), t)) % k + 1).cast("int"),
        ),
    )
    score = F.aggregate(
        per_tok, F.lit(0).cast("long"), lambda acc, x: acc + x
    )
    n = F.size(toks).cast("long")
    return df.select(
        "doc_id",
        n.alias("n_tokens"),
        score.alias("score_sum_micro"),
        (score >= F.lit(int(threshold_micro)) * n).alias("keep"),
    )


SOFT404_PHRASES = ["page not found", "404 error", "does not exist",
                   "no longer available"]
SOFT404_MAX_CHARS = 512


def soft404_signals(
    df: "DataFrame",
    status_col: str = "status",
    body_col: str = "body",
) -> "DataFrame":
    """Soft-404 detection — pages that return HTTP 200 but are really
    error pages (the classic crawl-quality trap: they pollute the corpus
    AND their outlinks re-seed the frontier with garbage).  Signals:
    an error phrase ("page not found", ...), a near-empty body
    (< SOFT404_MAX_CHARS), or an error-looking <title>; a 200-status row
    with phrase+tiny or phrase+title is flagged.

    Pure Column expressions fused into the scan.  Returns the input plus
    (has_phrase, tiny_body, title_404, soft404).
    """
    body = F.lower(F.col(body_col))
    has_phrase = F.lit(False)
    for p in SOFT404_PHRASES:
        has_phrase = has_phrase | body.contains(p)
    tiny = F.length(body) < SOFT404_MAX_CHARS
    title = F.lower(
        F.regexp_extract(F.col(body_col), r"(?is)<title[^>]*>(.*?)</title>", 1)
    )
    title_404 = title.contains("404") | title.contains("not found")
    soft = (F.col(status_col) == 200) & has_phrase & (tiny | title_404)
    return df.select(
        "*",
        has_phrase.alias("has_phrase"),
        tiny.alias("tiny_body"),
        title_404.alias("title_404"),
        soft.alias("soft404"),
    )


LINK_FARM_MIN_LINKS = 50
LINK_FARM_MAX_HOST_DIVERSITY_PERMILLE = 100
LINK_FARM_MIN_TEXT_PER_LINK = 20


def link_farm_signals(
    pages: "DataFrame",
    id_col: str = "doc_id",
    n_links_col: str = "n_links",
    n_link_hosts_col: str = "n_link_hosts",
    n_chars_col: str = "n_chars",
) -> "DataFrame":
    """Link-farm / SEO-spam scoring from per-page link statistics: flags
    pages with many outlinks (>= 50), low target-host diversity
    (distinct hosts <= 10% of links — a farm rotates few domains), and
    thin text per link (< 20 chars/link — lists of anchors, no
    content).  Integer permille arithmetic; a page is a farm when ALL
    three hold (each alone is normal for hubs/portals).

    The inputs are aggregates an extraction pass already produces
    (count + approx-distinct of link hosts per page); this stage is a
    narrow map.  Returns (id, n_links, host_diversity_permille,
    chars_per_link, is_link_farm).
    """
    n = F.col(n_links_col).cast("long")
    nh = F.col(n_link_hosts_col).cast("long")
    nc = F.col(n_chars_col).cast("long")
    diversity = F.expr(f"(1000 * {n_link_hosts_col}) div"
                       f" greatest({n_links_col}, 1)")
    per_link = F.expr(f"{n_chars_col} div greatest({n_links_col}, 1)")
    farm = (
        (n >= LINK_FARM_MIN_LINKS)
        & (diversity <= LINK_FARM_MAX_HOST_DIVERSITY_PERMILLE)
        & (per_link < LINK_FARM_MIN_TEXT_PER_LINK)
    )
    return pages.select(
        F.col(id_col),
        n.alias("n_links"),
        diversity.cast("long").alias("host_diversity_permille"),
        per_link.cast("long").alias("chars_per_link"),
        farm.alias("is_link_farm"),
    )


BOILERPLATE_MIN_DOCS = 4
BOILERPLATE_MIN_SHARE_PERMILLE = 500


def boilerplate_shingles(
    docs: "DataFrame",
    host_col: str = "host",
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
) -> "DataFrame":
    """Host-level boilerplate mining: the word k-grams that appear in
    >= 50% of a host's pages (host has >= 4 pages) are template text —
    nav bars, footers, cookie banners — the data-driven complement of
    the block-heuristic main-content extractor: subtracting mined
    shingles from every page of the host strips the template without
    any per-page heuristics.

    Plan: per-doc DISTINCT shingles first (array_distinct on the
    HOF-built k-gram array — a shingle repeated within one page counts
    once), then explode -> ONE map-side-combined groupBy(host, shingle)
    with countDistinct docs, then the per-host page count broadcast
    back.  Returns only the flagged rows: (host, shingle, n_docs_with,
    host_docs, share_permille).
    """
    words = F.filter(F.split(F.col(text_col), r"\s+"), lambda w: w != "")
    grams = F.when(
        F.size(words) >= k,
        F.array_distinct(F.transform(
            F.sequence(F.lit(1), F.size(words) - (k - 1)),
            lambda i: F.concat_ws(
                " ", *[F.element_at(words, (i + j).cast("int"))
                       for j in range(k)]
            ),
        )),
    ).otherwise(F.array().cast("array<string>"))
    exploded = docs.select(
        F.col(host_col).alias("host"),
        F.col(id_col).alias("doc"),
        F.explode(grams).alias("shingle"),
    )
    per_shingle = exploded.groupBy("host", "shingle").agg(
        F.countDistinct("doc").alias("n_docs_with")
    )
    per_host = docs.groupBy(F.col(host_col).alias("host")).agg(
        F.count("*").alias("host_docs")
    )
    j = per_shingle.join(per_host, "host")
    share = F.expr("(1000 * n_docs_with) div host_docs")
    return j.filter(
        (F.col("host_docs") >= BOILERPLATE_MIN_DOCS)
        & (share >= BOILERPLATE_MIN_SHARE_PERMILLE)
    ).select(
        "host", "shingle",
        F.col("n_docs_with").cast("long").alias("n_docs_with"),
        F.col("host_docs").cast("long").alias("host_docs"),
        share.cast("long").alias("share_permille"),
    )


PAGE_KIND_GALLERY_MIN_IMGS = 8
PAGE_KIND_ARTICLE_MIN_WORDS = 150
PAGE_KIND_NAV_MIN_LINKS = 30


def classify_page_kind(
    pages: "DataFrame",
    n_imgs_col: str = "n_imgs",
    n_words_col: str = "n_words",
    n_links_col: str = "n_links",
) -> "DataFrame":
    """Coarse page-kind routing from extraction counts — which pipeline
    a fetched page feeds: ``gallery`` (image-heavy, few words -> the
    image+caption harvester), ``article`` (word-heavy -> the text
    pipeline), ``nav`` (link-heavy, thin on both -> link extraction
    only), ``stub`` (nothing much — candidates for soft-404 checks).
    First match wins in that order.  Narrow CASE map.
    Returns input + (page_kind).
    """
    imgs = F.col(n_imgs_col).cast("long")
    words = F.col(n_words_col).cast("long")
    links = F.col(n_links_col).cast("long")
    kind = (
        F.when((imgs >= PAGE_KIND_GALLERY_MIN_IMGS)
               & (words < PAGE_KIND_ARTICLE_MIN_WORDS), F.lit("gallery"))
        .when(words >= PAGE_KIND_ARTICLE_MIN_WORDS, F.lit("article"))
        .when(links >= PAGE_KIND_NAV_MIN_LINKS, F.lit("nav"))
        .otherwise(F.lit("stub"))
    )
    return pages.select("*", kind.alias("page_kind"))


def detect_cloaking(
    bot_view: "DataFrame",
    browser_view: "DataFrame",
    url_col: str = "url",
    hash_col: str = "content_hash",
    len_col: str = "n_chars",
    max_len_skew_permille: int = 300,
) -> "DataFrame":
    """Cloaking detection — pages that serve DIFFERENT content to the
    crawler's bot user-agent than to a browser UA (the classic search
    spam the reference's BotUserAgent/browser split makes possible to
    probe): join the two fetch views on URL and flag rows whose content
    hashes differ AND whose length skew exceeds the threshold (small
    hash differences from timestamps/nonces are normal; wholesale
    different pages are not).

    One equi-join on url (both views hash-partition the same way).
    Returns (url, bot_hash, browser_hash, len_skew_permille, cloaked).
    """
    b = bot_view.select(
        F.col(url_col).alias("url"), F.col(hash_col).alias("bot_hash"),
        F.col(len_col).cast("long").alias("__bl"),
    )
    r = browser_view.select(
        F.col(url_col).alias("url"), F.col(hash_col).alias("browser_hash"),
        F.col(len_col).cast("long").alias("__rl"),
    )
    j = b.join(r, "url")
    skew = F.expr(
        "(1000 * abs(__bl - __rl)) div greatest(greatest(__bl, __rl), 1)"
    )
    cloaked = (F.col("bot_hash") != F.col("browser_hash")) & (
        skew > max_len_skew_permille
    )
    return j.select(
        "url", "bot_hash", "browser_hash",
        skew.cast("long").alias("len_skew_permille"),
        cloaked.alias("cloaked"),
    )


def varint_bytes(v) -> "Column":
    """LEB128/varint byte cost of a non-negative BIGINT — the unit of
    measure for postings compression planning (exact CASE ladder, both
    engines agree).  A non-negative int64 needs at most ceil(63/7) = 9
    varint bytes, so the ladder tops out at 9 (and 2^63 never appears
    as a literal, which LongType could not hold)."""
    c = F.col(v) if isinstance(v, str) else v
    expr = F.lit(9)
    for nbytes in range(8, 0, -1):
        expr = F.when(c < (1 << (7 * nbytes)), nbytes).otherwise(expr)
    return expr.cast("long")


def _varint_case_sql(e: str) -> str:
    """The DuckDB replay of :func:`varint_bytes` as a CASE ladder."""
    arms = "\n".join(
        f"    WHEN {e} < {1 << (7 * n)} THEN {n}" for n in range(1, 9)
    )
    return f"CASE\n{arms}\n    ELSE 9 END"


def postings_gap_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_df: int = 2,
) -> DataFrame:
    """Inverted-index size planning: per-term posting lists as
    delta-gaps with varint (LEB128) byte costs — the standard
    d-gap + variable-byte encoding every search index uses (Manning et
    al., IIR ch. 5).  A crawl pipeline needs this BEFORE building the
    index: postings_bytes per term is the index-size forecast, and the
    savings ratio vs fixed 8-byte ids says whether doc-id assignment
    (crawl order vs hash order) is leaving compression on the table —
    clustered doc ids make small gaps make small varints.

    Shape: explode -> distinct (term, doc) via groupBy (map-side
    combined), then gaps via ONE window partitioned by term ordered by
    doc id (lag), then a groupBy(term) rollup.  The per-term window is
    the honest index-construction shape (posting lists are per-term
    sorted runs); at 10^10 docs a stopword's partition is large — cap
    it upstream (min_df/stopword thresholds) or shard terms per
    segment as segment-wise indexes do.

    Returns (word, df, first_doc, postings_bytes, fixed_bytes,
    savings_permille), terms with document frequency >= min_df.
    """
    from pyspark.sql import Window

    docs_words = (
        df.select(
            F.col(id_col).cast("long").alias("doc"),
            F.explode(
                F.filter(F.split(F.col(text_col), r"\s+"),
                         lambda w: w != "")
            ).alias("word"),
        )
        .groupBy("word", "doc")
        .agg(F.count(F.lit(1)).alias("__tf"))
    )
    w = Window.partitionBy("word").orderBy("doc")
    gaps = docs_words.withColumn(
        "__e", F.coalesce(F.col("doc") - F.lag("doc").over(w), F.col("doc"))
    )
    return (
        gaps.groupBy("word")
        .agg(
            F.count(F.lit(1)).cast("long").alias("df"),
            F.min("doc").alias("first_doc"),
            F.sum(varint_bytes(F.col("__e"))).cast("long")
            .alias("postings_bytes"),
        )
        .where(F.col("df") >= min_df)
        .withColumn("fixed_bytes", (F.col("df") * 8).cast("long"))
        .withColumn(
            "savings_permille",
            F.expr("(1000 * (fixed_bytes - postings_bytes))"
                   " div fixed_bytes"),
        )
    )


def docid_remap_savings(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    order_cols: "list[str] | None" = None,
    num_rows: "int | None" = None,
) -> DataFrame:
    """Doc-id assignment vs index size (Silvestri's document identifier
    assignment problem): reassign doc ids so similar documents get
    adjacent ids, then measure the d-gap varint postings size under the
    ORIGINAL ids and under the REMAPPED ids.  Similar docs share terms,
    so clustering them makes posting-list gaps small and small gaps
    make small varints — for a crawl corpus the cheap proxy orderings
    are language / host / URL, all available pre-index.

    Shape: one distinct (term, doc) build (map-side combined groupBy);
    the remap is :func:`crawlspark.ranks.global_rank` on
    ``order_cols + [id_col]`` — the two-phase range-partition rank, no
    single-partition window at scale; postings under both schemes go
    through ONE union so the gap window and the rollup are shared.
    The id-translation join is doc-keyed (uniform, no skew); per-term
    window partitions are posting lists — the same stopword caveat as
    :func:`postings_gap_stats` applies.

    Returns ONE row: (n_terms, n_postings, orig_bytes, remap_bytes,
    saved_bytes, savings_permille).
    """
    from pyspark.sql import Window

    from ..ranks import global_rank

    order_cols = list(order_cols or ["lang"])
    dw = (
        df.select(
            F.col(id_col).cast("long").alias("doc"),
            F.explode(
                F.filter(F.split(F.col(text_col), r"\s+"),
                         lambda w: w != "")
            ).alias("word"),
        )
        .groupBy("word", "doc")
        .agg(F.count(F.lit(1)).alias("__tf"))
        .select("word", "doc")
    )
    mapping = global_rank(
        df.select(F.col(id_col).cast("long").alias("doc"), *order_cols),
        [*order_cols, "doc"],
        out="new_doc",
        num_rows=num_rows,
    ).select("doc", "new_doc")
    both = dw.select(F.lit("orig").alias("scheme"), "word", "doc").unionAll(
        dw.join(mapping, "doc").select(
            F.lit("remap").alias("scheme"),
            "word",
            F.col("new_doc").alias("doc"),
        )
    )
    w = Window.partitionBy("scheme", "word").orderBy("doc")
    gaps = both.withColumn(
        "__e", F.coalesce(F.col("doc") - F.lag("doc").over(w), F.col("doc"))
    )
    tot = gaps.groupBy("scheme").agg(
        F.count(F.lit(1)).cast("long").alias("n_postings"),
        F.countDistinct("word").cast("long").alias("n_terms"),
        F.sum(varint_bytes(F.col("__e"))).cast("long").alias("bytes"),
    )
    return (
        tot.agg(
            F.max("n_terms").alias("n_terms"),
            F.max("n_postings").alias("n_postings"),
            F.max(F.when(F.col("scheme") == "orig", F.col("bytes")))
            .alias("orig_bytes"),
            F.max(F.when(F.col("scheme") == "remap", F.col("bytes")))
            .alias("remap_bytes"),
        )
        .withColumn(
            "saved_bytes", (F.col("orig_bytes") - F.col("remap_bytes"))
        )
        .withColumn(
            "savings_permille",
            F.expr("(1000 * saved_bytes) div orig_bytes"),
        )
    )


def calibration_bins(
    preds: DataFrame,
    pred_col: str = "pred_permille",
    label_col: str = "label",
    n_bins: int = 10,
) -> DataFrame:
    """Reliability diagram / calibration bins for any permille-scored
    predictor (quality classifier, host prior, soft-404 score): bucket
    predictions into ``n_bins`` equal-width bins over [0, 1000] and
    compare each bin's mean prediction with its empirical positive
    rate.  A filter whose 800-permille bucket is right only 500/1000 of
    the time is mis-calibrated — its threshold sweeps the wrong rows at
    corpus scale, and no amount of AUC hides that.  The per-bin
    |gap| column is the ECE integrand (weight by n over the total for
    the scalar ECE).

    One map-side-combined groupBy on the bin id; integer-exact
    (permille means via integer division) so a SQL oracle replays it.

    Returns (bin, n, mean_pred_permille, emp_permille,
    abs_gap_permille) ordered by bin.
    """
    width = 1000 // n_bins
    b = F.least(
        F.lit(n_bins - 1).cast("long"),
        F.expr(f"{pred_col} div {width}").cast("long"),
    )
    return (
        preds.select(
            b.alias("bin"),
            F.col(pred_col).cast("long").alias("p"),
            F.col(label_col).cast("long").alias("y"),
        )
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("p").cast("long").alias("sp"),
            F.sum("y").cast("long").alias("sy"),
        )
        .select(
            "bin", "n",
            F.expr("sp div n").alias("mean_pred_permille"),
            F.expr("(1000 * sy) div n").alias("emp_permille"),
            F.abs(F.expr("sp div n") - F.expr("(1000 * sy) div n"))
            .cast("long").alias("abs_gap_permille"),
        )
        .orderBy("bin")
    )


def pmi_collocations(
    docs: DataFrame,
    text_col: str = "text",
    min_count: int = 5,
) -> DataFrame:
    """Pointwise-mutual-information bigram mining over a text corpus —
    the collocation dictionary ("new york", "machine learning") a
    caption pipeline builds to stop tokenizers and dedup shinglers
    splitting multi-word entities (Church & Hanks, CL 1990).  High-PMI
    pairs are also a cheap boilerplate tell: templated captions repeat
    rare-word pairs far above chance.

    Tokenize = lowercase split on non-letters (same rule as vocab_stats
    so dictionaries line up).  pmi = log2((c12/NB) / ((c1/N)(c2/N)))
    with N total tokens, NB total bigrams, quantized to micro units.

    Plan: one explode per doc -> two map-side-combined counts (unigram,
    bigram); the unigram relation is vocabulary-sized, so BOTH lookup
    joins broadcast it; the scalar totals ride a broadcast literal
    cross-join.  Nothing shuffles except the two counts' own keys.
    Returns (w1, w2, c12, c1, c2, pmi_micro) for bigrams with c12 >=
    min_count.
    """
    toks = F.filter(
        F.split(F.lower(F.col(text_col)), "[^a-z]+"),
        lambda t: t != "",
    )
    base = docs.select(toks.alias("t"))
    uni = (
        base.select(F.explode("t").alias("w"))
        .groupBy("w").agg(F.count("*").cast("long").alias("c"))
    )
    bi = (
        # transform-with-index, NOT sequence(1, size-1): the latter is
        # a DESCENDING [1, 0] on empty/1-token docs and pads phantom
        # null bigrams.  The last element's w2 is null (t[i+1] out of
        # bounds) and is filtered; real tokens are never empty strings.
        base.select(F.explode(F.expr(
            "filter(transform(t, (x, i) -> struct(x AS w1,"
            " get(t, i + 1) AS w2)), p -> p.w2 IS NOT NULL)"
        )).alias("b"))
        .select("b.w1", "b.w2")
        .groupBy("w1", "w2").agg(F.count("*").cast("long").alias("c12"))
        .filter(F.col("c12") >= int(min_count))
    )
    totals = base.select(
        F.sum(F.size("t")).cast("long").alias("n_tok"),
        F.sum(F.greatest(F.size("t") - 1, F.lit(0))).cast("long")
        .alias("n_bi"),
    )
    joined = (
        bi.join(F.broadcast(uni.withColumnRenamed("w", "w1")
                            .withColumnRenamed("c", "c1")), "w1")
        .join(F.broadcast(uni.withColumnRenamed("w", "w2")
                          .withColumnRenamed("c", "c2")), "w2")
        .crossJoin(F.broadcast(totals))
    )
    pmi = (
        F.log(F.col("c12").cast("double") * F.col("n_tok")
              * F.col("n_tok")
              / (F.col("n_bi").cast("double") * F.col("c1")
                 * F.col("c2")))
        / F.log(F.lit(2.0))
    )
    return joined.select(
        "w1", "w2", "c12", "c1", "c2",
        F.round(pmi * 1e6).cast("long").alias("pmi_micro"),
    )


def tfidf_cosine_pairs(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """TF-IDF cosine similarity for candidate document pairs — the
    verification tier a near-dup pipeline runs on LSH/phash bucket
    collisions when byte-level Jaccard is too brittle (boilerplate
    swaps, word reorders) and embeddings are too expensive: classic
    Salton vector-space cosine over raw term counts weighted by
    idf = ln((N+1)/(df+1)) + 1 (the smoothed form, never negative).

    Tokenization matches :func:`pmi_collocations` / vocab_stats
    (lowercase, split on non-letters) so all text dictionaries line up.

    Weights are quantized to MILLI units (round(1e3 * tf * idf) as
    int64) BEFORE any aggregation: dot products and norms are then
    integer-exact, immune to float summation order — the one property
    a distributed sum cannot otherwise promise, and the reason the
    oracle can replay this bit-for-bit.  Only the final cosine divide
    touches doubles, on identical integer operands.

    Plan: one explode -> map-side-combined (doc, term, tf) counts; the
    document-frequency relation is vocabulary-sized and BROADCASTs onto
    the weights; per-doc norms are one more map-side groupBy.  The pair
    evaluation joins each side\'s weights on the pair id — candidate
    pairs are bucket collisions, orders of magnitude fewer than
    all-pairs — then matches terms with an equi-join on the term key.
    Nothing ever shuffles the corpus against itself.

    ``pairs`` must have (id_a, id_b).  Returns (id_a, id_b,
    n_shared_terms, cos_micro) with cos_micro = round(1e6 * cosine);
    pairs sharing no term score 0.
    """
    toks = F.filter(
        F.split(F.lower(F.col(text_col)), "[^a-z]+"),
        lambda t: t != "",
    )
    base = docs.select(F.col(id_col).alias("doc"), toks.alias("t"))
    tf = (
        base.select("doc", F.explode("t").alias("w"))
        .groupBy("doc", "w").agg(F.count("*").cast("long").alias("tf"))
    )
    n_docs = base.select(F.count("*").alias("n_docs"))
    df_rel = tf.groupBy("w").agg(F.count("*").cast("long").alias("df"))
    wgt = (
        tf.join(F.broadcast(df_rel), "w")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc", "w",
            F.round(
                1e3 * F.col("tf")
                * (F.log((F.col("n_docs") + 1.0) / (F.col("df") + 1.0))
                   + 1.0),
                0,
            ).cast("long").alias("wgt"),
        )
    )
    norms = wgt.groupBy("doc").agg(
        F.sum(F.col("wgt") * F.col("wgt")).cast("long").alias("norm2"))
    p = pairs.select(F.col("id_a").cast("long").alias("id_a"),
                     F.col("id_b").cast("long").alias("id_b"))
    wa = wgt.select(F.col("doc").alias("id_a"), "w",
                    F.col("wgt").alias("wa"))
    wb = wgt.select(F.col("doc").alias("id_b"), "w",
                    F.col("wgt").alias("wb"))
    dots = (
        p.join(wa, "id_a").join(wb, ["id_b", "w"])
        .groupBy("id_a", "id_b")
        .agg(F.sum(F.col("wa") * F.col("wb")).cast("long").alias("dot"),
             F.count("*").cast("long").alias("n_shared_terms"))
    )
    na = norms.select(F.col("doc").alias("id_a"),
                      F.col("norm2").alias("na"))
    nb = norms.select(F.col("doc").alias("id_b"),
                      F.col("norm2").alias("nb"))
    return (
        p.join(dots, ["id_a", "id_b"], "left")
        .join(na, "id_a").join(nb, "id_b")
        .select(
            "id_a", "id_b",
            F.coalesce("n_shared_terms", F.lit(0)).alias("n_shared_terms"),
            F.coalesce(
                F.round(
                    1e6 * F.col("dot").cast("double")
                    / (F.sqrt(F.col("na").cast("double"))
                       * F.sqrt(F.col("nb").cast("double"))), 0
                ).cast("long"),
                F.lit(0),
            ).alias("cos_micro"),
        )
    )


def flesch_reading_ease(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Flesch reading ease (Flesch 1948) — the classic readability
    score LLM-data pipelines bin corpora by (very-low FRE is usually
    tables/code/boilerplate, very-high is SEO filler; both tails get
    down-weighted):

        FRE = 206.835 - 1.015*(words/sentences) - 84.6*(syllables/words)

    All three counts are integer expressions (JVM codegen, no UDF):
    words are the letters-only tokens every textops dictionary uses,
    syllables the vowel-group count per word with a floor of 1 (the
    standard heuristic), sentences the [.!?]+ runs with a floor of 1.
    The two divisions run on integer-exact operands, so the milli
    quantization is deterministic and SQL-replayable.

    Returns (id, n_words, n_sentences, n_syllables, fre_milli);
    fre_milli NULL for wordless docs.
    """
    words = F.filter(
        F.split(F.lower(F.col(text_col)), "[^a-z]+"),
        lambda t: t != "",
    )
    syl = F.aggregate(
        words,
        F.lit(0).cast("long"),
        lambda acc, w: acc + F.greatest(
            F.size(F.split(w, "[aeiouy]+")) - 1, F.lit(1)).cast("long"),
    )
    n_sent = F.greatest(
        F.size(F.regexp_extract_all(F.col(text_col), F.lit("[.!?]+"), 0)),
        F.lit(1),
    ).cast("long")
    base = docs.select(
        F.col(id_col).alias("id"),
        F.size(words).cast("long").alias("n_words"),
        n_sent.alias("n_sentences"),
        syl.alias("n_syllables"),
    )
    fre = (
        F.lit(206.835)
        - 1.015 * F.col("n_words").cast("double") / F.col("n_sentences")
        - 84.6 * F.col("n_syllables").cast("double") / F.col("n_words")
    )
    return base.withColumn(
        "fre_milli",
        F.when(F.col("n_words") > 0,
               F.round(1e3 * fre, 0).cast("long")),
    )


def script_mix(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    mixed_permille: int = 200,
) -> DataFrame:
    """Unicode script composition of a document — the router in front
    of language-ID: n-gram langid models are per-script, CJK needs a
    different tokenizer, and a Latin page with a 30% Cyrillic tail is
    usually boilerplate injection or encoding damage worth flagging
    before training.

    Counts per script class by the length-difference trick (len(text)
    - len(text with the class removed) — one regex pass per class,
    JVM-side, no per-char explode): Latin, Cyrillic, Greek, Han,
    Arabic, ASCII digits.  ``dominant_script`` is the argmax with a
    fixed tie order (the listed order), ``mixed`` is true when the
    runner-up holds >= mixed_permille of the classified letters.

    Returns (id, n_latin, n_cyrillic, n_greek, n_han, n_arabic,
    n_digit, dominant_script, mixed); dominant NULL when no letters.
    """
    t = F.col(text_col)

    def cnt(pattern: str):
        return (F.length(t)
                - F.length(F.regexp_replace(t, pattern, ""))).cast("long")

    counts = {
        "latin": cnt(r"[A-Za-z]"),
        "cyrillic": cnt(r"\p{IsCyrillic}"),
        "greek": cnt(r"\p{IsGreek}"),
        "han": cnt(r"\p{IsHan}"),
        "arabic": cnt(r"\p{IsArabic}"),
    }
    base = docs.select(
        F.col(id_col).alias("id"),
        *[v.alias(f"n_{k}") for k, v in counts.items()],
        cnt(r"[0-9]").alias("n_digit"),
    )
    arr = F.array(*[
        F.struct(F.col(f"n_{k}").alias("n"),
                 F.lit(i).alias("ord"), F.lit(k).alias("s"))
        for i, k in enumerate(counts)
    ])
    # max_by over (n, -ord): largest count, first-listed wins ties
    best = F.aggregate(
        arr,
        F.struct(F.lit(-1).cast("long").alias("n"),
                 F.lit(99).alias("ord"), F.lit("").alias("s")),
        lambda acc, x: F.when(
            (x["n"] > acc["n"])
            | ((x["n"] == acc["n"]) & (x["ord"] < acc["ord"])), x
        ).otherwise(acc),
    )
    total = sum([F.col(f"n_{k}") for k in counts], F.lit(0).cast("long"))
    second = F.sort_array(
        F.transform(arr, lambda x: x["n"]), asc=False)[1]
    return base.withColumn("__best", best).select(
        "id", "n_latin", "n_cyrillic", "n_greek", "n_han", "n_arabic",
        "n_digit",
        F.when(F.col("__best.n") > 0, F.col("__best.s"))
        .alias("dominant_script"),
        F.coalesce(
            (second * 1000 >= F.lit(int(mixed_permille)) * total)
            & (second > 0),
            F.lit(False),
        ).alias("mixed"),
    )


def gram_novelty(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
) -> DataFrame:
    """Corpus-level n-gram novelty per document — what fraction of a
    doc's n-grams appear in NO other document: high novelty marks
    original content, near-zero novelty marks boilerplate assembled
    from corpus-common phrases (the inverse view of the dedup family —
    instead of finding the pair, score how templated each doc is).

    Plan: positioned shingles -> distinct per doc -> one map-side-
    combined document-frequency count; per-doc novelty is one more
    groupBy over the (doc, gram, df) relation.  The df relation is
    keyed by gram (vocabulary-scale), never a pair join.  Grams
    counted set-wise per doc (a doc repeating its own phrase does not
    make the phrase common).

    Returns (id, n_grams, n_novel, novelty_permille); docs shorter
    than n words report 0 grams and NULL novelty.
    """
    toks = F.filter(
        F.split(F.lower(F.col(text_col)), "[^a-z0-9]+"),
        lambda t: t != "",
    )
    base = docs.select(F.col(id_col).alias("doc"), toks.alias("t"))
    grams = base.select(
        "doc",
        F.explode_outer(
            F.when(
                F.size("t") >= n,
                F.array_distinct(F.transform(
                    F.sequence(F.lit(1), F.size("t") - (n - 1)),
                    lambda i: F.array_join(F.slice("t", i, n), " "),
                )),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("g"),
    )
    df_rel = (
        grams.filter(F.col("g").isNotNull())
        .groupBy("g").agg(F.count(F.lit(1)).cast("long").alias("df"))
    )
    return (
        grams.join(df_rel, "g", "left")
        .groupBy(F.col("doc").alias("id"))
        .agg(
            F.sum(F.when(F.col("g").isNotNull(), 1).otherwise(0))
            .cast("long").alias("n_grams"),
            F.sum(F.when(F.col("df") == 1, 1).otherwise(0))
            .cast("long").alias("n_novel"),
        )
        .withColumn(
            "novelty_permille",
            F.when(F.col("n_grams") > 0,
                   F.expr("(1000 * n_novel) div n_grams")),
        )
    )


def unigram_surprisal(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Unigram cross-entropy quality proxy (CCNet's KenLM filter
    reduced to its SQL-able core, Wenzek et al. LREC 2020): score each
    doc by the mean surprisal of its tokens under the corpus's own
    unigram distribution, -log2 p(w) with add-one smoothing.  Docs of
    ultra-common filler score LOW (SEO spam, boilerplate), docs of
    rare-token soup score HIGH (lexicon dumps, mojibake) — the
    training-data keep-band is the middle.

    Per-token surprisal is quantized to MICRO bits from integer
    (count, total) pairs — every per-doc sum is integer-exact and
    summation-order-proof; only the final mean divide is float.  The
    unigram table is vocabulary-sized and BROADCASTs onto the token
    relation; two map-side-combined groupBys otherwise.

    Returns (id, n_tokens, sum_surprisal_micro, mean_surprisal_milli);
    token-less docs report NULL mean.
    """
    toks = F.filter(
        F.split(F.lower(F.col(text_col)), "[^a-z]+"),
        lambda t: t != "",
    )
    base = docs.select(F.col(id_col).alias("id"), toks.alias("t"))
    tok = base.select("id", F.explode("t").alias("w"))
    uni = tok.groupBy("w").agg(F.count("*").cast("long").alias("c"))
    tot = tok.agg((F.count("*") + 1).cast("long").alias("n_total"))
    surp = F.round(
        1e6 * -F.log2((F.col("c") + 1.0) / F.col("n_total")), 0
    ).cast("long")
    scored = (
        tok.join(F.broadcast(uni), "w")
        .crossJoin(F.broadcast(tot))
        .groupBy("id")
        .agg(F.count("*").cast("long").alias("n_tokens"),
             F.sum(surp).cast("long").alias("sum_surprisal_micro"))
    )
    return (
        base.select("id").join(scored, "id", "left")
        .select(
            "id",
            F.coalesce("n_tokens", F.lit(0)).alias("n_tokens"),
            F.coalesce("sum_surprisal_micro", F.lit(0))
            .alias("sum_surprisal_micro"),
            F.when(
                F.col("n_tokens") > 0,
                F.round(F.col("sum_surprisal_micro").cast("double")
                        / F.col("n_tokens") / 1e3, 0).cast("long"),
            ).alias("mean_surprisal_milli"),
        )
    )


def lang_attr_mismatch(
    pages: DataFrame,
    id_col: str = "doc_id",
    body_col: str = "body",
    text_col: str = "text",
) -> DataFrame:
    """Declared-vs-detected language audit: the <html lang> attribute
    against the marker-count detector (:func:`lang_id`) — CMS
    templates routinely stamp ``lang="en"`` on every locale, and a
    mismatch (declared en, detected de) routes the page to re-ID
    before the language-stratified sampler trusts either.  BCP 47
    values compare on the primary subtag (``en-US`` -> ``en``).

    Returns (id, declared_lang — NULL when absent, pred_lang,
    mismatch) — mismatch only when BOTH sides are confident (declared
    present, prediction not 'other').
    """
    declared_raw = F.regexp_extract(
        F.col(body_col),
        r'(?is)<html\b[^>]*\blang\s*=\s*["\']([A-Za-z-]+)["\']', 1)
    declared = F.when(
        declared_raw != "",
        F.lower(F.substring_index(declared_raw, "-", 1)))
    ids = lang_id(
        pages.select(F.col(id_col).alias("doc_id"),
                     F.col(text_col).alias("text"))
    ).select(F.col("doc_id").alias("id"), "pred_lang")
    base = pages.select(F.col(id_col).alias("id"),
                        declared.alias("declared_lang"))
    return base.join(ids, "id").select(
        "id", "declared_lang", "pred_lang",
        (
            F.col("declared_lang").isNotNull()
            & (F.col("pred_lang") != "other")
            & (F.col("declared_lang") != F.col("pred_lang"))
        ).alias("mismatch"),
    )


def badwords_rate(
    docs: DataFrame,
    blocklist: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    block_permille: int = 10,
) -> DataFrame:
    """C4-style content word-blocklist gate (Raffel et al. 2020 drop
    pages containing any "bad word"; modern pipelines use a RATE so a
    medical page mentioning one term once survives): the share of a
    doc's tokens that hit the blocklist, and the binary gate at
    ``block_permille``.

    The blocklist is a literal broadcast array (policy-sized);
    matching is exact-token against the same letters-only
    tokenization every textops dictionary uses — substring matching
    (the original C4 mistake: 'class' contains...) is deliberately
    NOT done.  Returns (id, n_tokens, n_blocked, blocked_permille,
    blocked) — empty docs pass.
    """
    bl = F.array(*[F.lit(w.lower()) for w in blocklist])
    toks = F.filter(
        F.split(F.lower(F.col(text_col)), "[^a-z]+"),
        lambda t: t != "",
    )
    hits = F.size(F.filter(toks, lambda t: F.array_contains(bl, t)))
    n = F.size(toks)
    base = docs.select(
        F.col(id_col).alias("id"),
        n.cast("long").alias("n_tokens"),
        hits.cast("long").alias("n_blocked"),
    )
    return base.withColumn(
        "blocked_permille",
        F.when(F.col("n_tokens") > 0,
               F.expr("(1000 * n_blocked) div n_tokens")),
    ).withColumn(
        "blocked",
        F.coalesce(F.col("blocked_permille"), F.lit(0))
        >= int(block_permille),
    )


def ttr_windowed(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 50,
) -> DataFrame:
    """Windowed type-token ratio — lexical diversity that, unlike raw
    TTR, doesn't collapse with document length (the MTLD/MATTR
    family's core move, McCarthy & Jarvis 2010): distinct-token share
    inside each non-overlapping ``window``-token segment, averaged.
    Low values mark loops and boilerplate; implausibly high values
    mark word-salad spam.

    All inside JVM HOFs: slice windows from the token array, distinct
    per window, integer permille per window, exact integer mean of
    the per-window permilles.  Partial trailing windows are dropped
    (their inflated TTR is the artifact MATTR exists to avoid); docs
    shorter than one window report NULL.  Returns (id, n_tokens,
    n_windows, mattr_permille).
    """
    toks = F.filter(
        F.split(F.lower(F.col(text_col)), "[^a-z]+"),
        lambda t: t != "",
    )
    w = int(window)
    base = docs.select(F.col(id_col).alias("id"), toks.alias("t"))
    n = F.size("t")
    n_win = F.floor(n / w).cast("long")
    return base.select(
        "id", n.cast("long").alias("n_tokens"),
        F.when(n_win > 0, n_win).otherwise(F.lit(0)).alias("n_windows"),
        F.when(n_win > 0, F.expr(
            f"aggregate(transform(sequence(1, CAST(floor(size(t)/{w}) "
            f"AS INT)), i -> CAST(size(array_distinct(slice(t, (i-1)*{w}"
            f" + 1, {w}))) * 1000 div {w} AS BIGINT)), CAST(0 AS BIGINT),"
            " (a, x) -> a + x)"
        ) / n_win).cast("long").alias("mattr_permille"),
    )


def emoji_density(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Emoji/pictograph density — social-media copy and engagement
    bait are emoji-dense while reference text is emoji-free, so this
    one number routes "webtext" vs "social" styles before training
    mixes are balanced.  Counts code points in the main pictograph
    blocks (U+1F300-1F9FF), misc symbols (U+2600-27BF), and the
    regional-indicator pair range (flags), by the same
    length-difference trick as :func:`script_mix`.

    Returns (id, n_chars, n_emoji, emoji_permille) — permille of ALL
    characters; NULL for empty text.
    """
    t = F.col(text_col)
    pat = (r"[\x{1F300}-\x{1F9FF}\x{2600}-\x{27BF}"
           r"\x{1F1E6}-\x{1F1FF}]")
    n_chars = F.length(t).cast("long")
    n_emoji = (F.length(t)
               - F.length(F.regexp_replace(t, pat, ""))).cast("long")
    base = docs.select(
        F.col(id_col).alias("id"),
        n_chars.alias("n_chars"),
        n_emoji.alias("n_emoji"),
    )
    return base.withColumn(
        "emoji_permille",
        F.when(F.col("n_chars") > 0,
               F.expr("(1000 * n_emoji) div n_chars")),
    )


# ---------------------------------------------------------------------------
# RAKE keyword extraction
# ---------------------------------------------------------------------------

RAKE_STOPWORDS = [
    "a", "an", "and", "are", "as", "at", "be", "by", "for", "from", "in",
    "is", "it", "of", "on", "or", "that", "the", "to", "was", "with",
]
_RAKE_DELIM = "§"  # sentinel token injected for phrase-breaking punct


def rake_keywords(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    top_k: int = 3,
    stopwords: list[str] | None = None,
) -> DataFrame:
    """RAKE keyword extraction (Rose et al. 2010): candidate phrases are
    the maximal token runs between stopwords/punctuation; each word
    scores deg(w)/freq(w) where freq counts occurrences inside
    candidates and deg sums the lengths of the phrases containing it;
    a phrase scores the sum of its word scores.  Per-word scores are
    quantized to milli-units BEFORE the phrase sum
    (``(1000 * deg) div freq``) so every comparison is integer-exact
    and SQL-replayable.  Returns the ``top_k`` distinct phrases per doc:
    (id, rank, phrase, n_words, score_milli), rank by (score desc,
    phrase asc).

    Plan: phrase decomposition is doc-local Column HOFs (punct -> a
    sentinel token, one delimiter-bounds array, one slice-transform —
    the same bounds pattern as cdc_chunks); word stats and phrase sums
    are two map-side-combined groupBys partitioned by (id, word) /
    (id, phrase) — nothing wider than the doc's own rows ever shuffles.
    Keyword metadata at corpus scale (topic routing, dedup keys for
    syndicated titles) without a model artifact.
    """
    stops = stopwords if stopwords is not None else RAKE_STOPWORDS
    stop_arr = F.array(*[F.lit(s) for s in stops])
    norm = F.regexp_replace(
        F.lower(F.col(text_col)), r"[.,;:!?()\"']", f" {_RAKE_DELIM} "
    )
    toks = F.filter(F.split(norm, r"\s+"), lambda x: x != "")
    d = df.select(F.col(id_col), toks.alias("__tk"))
    n = F.size("__tk")
    is_delim = lambda t: (t == _RAKE_DELIM) | F.array_contains(  # noqa: E731
        stop_arr, t
    )
    delims = F.when(
        n >= 1,
        F.filter(
            F.sequence(F.lit(1), n),
            lambda i: is_delim(F.element_at(F.col("__tk"), i)),
        ),
    ).otherwise(F.array().cast("array<int>"))
    d = d.withColumn(
        "__b",
        F.concat(
            F.array(F.lit(0).cast("int")),
            delims.cast("array<int>"),
            F.array((n + 1).cast("int")),
        ),
    )
    b = F.col("__b")
    phrases = F.filter(
        F.transform(
            F.sequence(F.lit(1), F.size(b) - 1),
            lambda j: F.slice(
                F.col("__tk"),
                F.element_at(b, j) + 1,
                F.element_at(b, j + 1) - F.element_at(b, j) - 1,
            ),
        ),
        lambda p: F.size(p) >= 1,
    )
    ph = (
        d.select(F.col(id_col), F.posexplode(phrases).alias("__pord", "__pw"))
        .select(
            id_col,
            F.col("__pord").alias("phrase_ord"),
            F.concat_ws(" ", "__pw").alias("phrase"),
            F.size("__pw").cast("long").alias("n_words"),
            F.col("__pw").alias("__pw"),
        )
    )
    words = ph.select(
        id_col, "phrase_ord", "n_words", F.explode("__pw").alias("word")
    )
    wstats = words.groupBy(id_col, "word").agg(
        F.count(F.lit(1)).cast("long").alias("freq"),
        F.sum("n_words").cast("long").alias("deg"),
    ).withColumn("score_milli", F.expr("(1000 * deg) div freq"))
    phrase_scores = (
        words.join(wstats.select(id_col, "word", "score_milli"),
                   [id_col, "word"])
        .groupBy(id_col, "phrase_ord")
        .agg(F.sum("score_milli").cast("long").alias("score_milli"))
        .join(ph.select(id_col, "phrase_ord", "phrase", "n_words"),
              [id_col, "phrase_ord"])
        .groupBy(id_col, "phrase")
        .agg(
            F.max("n_words").alias("n_words"),
            F.max("score_milli").alias("score_milli"),
        )
    )
    from pyspark.sql import Window

    w_rank = Window.partitionBy(id_col).orderBy(
        F.col("score_milli").desc(), F.col("phrase").asc()
    )
    return (
        phrase_scores.withColumn(
            "rank", F.row_number().over(w_rank).cast("long")
        )
        .filter(F.col("rank") <= top_k)
        .select(id_col, "rank", "phrase", "n_words", "score_milli")
    )


# ---------------------------------------------------------------------------
# Stupid-backoff bigram LM scoring
# ---------------------------------------------------------------------------

BACKOFF_ALPHA_PERMILLE = 400  # Brants et al. 2007's 0.4
OOV_COST_MICRO = 20_000_000   # 20 nats — unseen-unigram floor


def bigram_backoff_score(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    train_filter=None,
) -> DataFrame:
    """Bigram LM fluency scoring with stupid backoff (Brants et al.
    2007, EMNLP — the web-scale LM recipe: no discounting, score
    S(w|v) = c(vw)/c(v) when the bigram was seen, else
    0.4 * c(w)/T, else an OOV floor).  The companion to
    :func:`unigram_logprob` one order up: transition costs catch
    shuffled-word gibberish and template soup that unigram frequency
    cannot (every word common, no two adjacent words ever co-occurring).

    ``train_filter`` (a Column predicate, e.g. ``F.col("doc_id") % 2 ==
    0``) selects the training slice; scoring runs over ALL docs, so
    held-out docs genuinely exercise the backoff and OOV paths.  Costs
    are -ln(S) quantized to integer micro-nats BEFORE the per-doc sum
    (float sums are partition-order-nondeterministic; integer sums are
    bit-stable and DuckDB-replayable, same discipline as
    unigram_logprob).

    Plan: per-doc bigram pairs derived array-side (one narrow map), one
    map-side-combined groupBy per count relation (bigram, unigram,
    scalar total), two equi-joins on the token stream.  At 100 TB the
    count relations are the heavy side: broadcast the top-V rows and
    floor the tail to OOV (same shape, bounded build).

    Returns (id, n_bigrams, cost_micro_mean) for docs with >= 1 bigram.
    """
    toks = F.split(F.col(text_col), " ")
    d = df.select(F.col(id_col), toks.alias("__tk"))
    pairs = F.when(
        F.size("__tk") >= 2,
        F.transform(
            F.sequence(F.lit(2), F.size("__tk")),
            lambda i: F.struct(
                F.element_at(F.col("__tk"), i - 1).alias("prev"),
                F.element_at(F.col("__tk"), i).alias("cur"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<prev:string,cur:string>>"))
    stream = d.select(F.col(id_col), F.explode(pairs).alias("p")).select(
        id_col, F.col("p.prev").alias("prev"), F.col("p.cur").alias("cur")
    )
    train = df.filter(train_filter) if train_filter is not None else df
    ttoks = train.select(F.explode(F.split(F.col(text_col), " ")).alias("w"))
    uni = ttoks.groupBy("w").agg(F.count("*").alias("c_uni"))
    tot = uni.agg(F.sum("c_uni").alias("t_tot"))
    tpairs = train.select(F.explode(
        F.when(
            F.size(F.split(F.col(text_col), " ")) >= 2,
            F.transform(
                F.sequence(F.lit(2), F.size(F.split(F.col(text_col), " "))),
                lambda i: F.struct(
                    F.element_at(F.split(F.col(text_col), " "), i - 1)
                    .alias("prev"),
                    F.element_at(F.split(F.col(text_col), " "), i)
                    .alias("cur"),
                ),
            ),
        ).otherwise(F.array().cast("array<struct<prev:string,cur:string>>"))
    ).alias("p")).select(F.col("p.prev").alias("prev"),
                         F.col("p.cur").alias("cur"))
    bi = tpairs.groupBy("prev", "cur").agg(F.count("*").alias("c_bi"))
    scored = (
        stream
        .join(bi, ["prev", "cur"], "left")
        .join(uni.withColumnRenamed("w", "prev")
                 .withColumnRenamed("c_uni", "c_prev"), ["prev"], "left")
        .join(uni.withColumnRenamed("w", "cur")
                 .withColumnRenamed("c_uni", "c_cur"), ["cur"], "left")
        .crossJoin(F.broadcast(tot))
    )
    cost = (
        F.when(
            F.col("c_bi").isNotNull() & F.col("c_prev").isNotNull(),
            F.floor(-F.log(F.col("c_bi") / F.col("c_prev")) * 1_000_000),
        )
        .when(
            F.col("c_cur").isNotNull(),
            F.floor(
                -F.log(
                    F.lit(BACKOFF_ALPHA_PERMILLE) / 1000.0
                    * F.col("c_cur") / F.col("t_tot")
                ) * 1_000_000
            ),
        )
        .otherwise(F.lit(OOV_COST_MICRO))
        .cast("long")
    )
    return scored.select(F.col(id_col), cost.alias("__cost")).groupBy(
        id_col
    ).agg(
        F.count("*").cast("long").alias("n_bigrams"),
        F.floor(F.sum("__cost") / F.count("*")).cast("long")
        .alias("cost_micro_mean"),
    )


# ---------------------------------------------------------------------------
# Per-source quality drift (integer least-squares trend)
# ---------------------------------------------------------------------------

def quality_drift(
    df: DataFrame,
    source_col: str = "source",
    day_col: str = "day",
    score_col: str = "score",
) -> DataFrame:
    """Quality drift per source over time — the monitoring question a
    continuously-fed training corpus has to answer ("did source X start
    rotting?") reduced to one map-side-combined aggregate: per (source,
    day) mean score, then per source the least-squares slope of mean
    score over day, kept in INTEGER form.  With n days, Sx = sum(day),
    Sy = sum(mean_milli), Sxy, Sxx, the slope numerator is
    n*Sxy - Sx*Sy and denominator n*Sxx - Sx^2; we emit the exact
    rational (num, den) plus a trend class — no quantized quotient at
    all, so consumers choose their own rounding.  (Both engines
    truncate signed integer division toward zero — measured: -7//2 is
    -3 in DuckDB and -7 div 2 is -3 in Spark — so a quantized slope
    WOULD replay exactly; the rational is still the better contract.)

    Two groupBys (both partial-aggregated), nothing wider than
    (source, day) shuffles.  Returns (source, n_days, mean_milli_overall,
    slope_num, slope_den, trend).
    """
    per_day = (
        df.groupBy(source_col, day_col)
        .agg(F.floor(F.sum(F.col(score_col).cast("long") * 1000)
                     / F.count(F.lit(1))).cast("long").alias("__m"))
    )
    x = F.col(day_col).cast("long")
    y = F.col("__m")
    agg = per_day.groupBy(source_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.sum(x).cast("long").alias("__sx"),
        F.sum(y).cast("long").alias("__sy"),
        F.sum(x * y).cast("long").alias("__sxy"),
        F.sum(x * x).cast("long").alias("__sxx"),
    )
    num = F.col("n_days") * F.col("__sxy") - F.col("__sx") * F.col("__sy")
    den = F.col("n_days") * F.col("__sxx") - F.col("__sx") * F.col("__sx")
    # slope sign plus the exact rational (num, den): the alert only
    # needs the sign, and the rational loses nothing to rounding
    trend = (
        F.when((F.col("n_days") < 2) | (den == 0), F.lit("insufficient"))
        .when(num > 0, F.lit("improving"))
        .when(num < 0, F.lit("declining"))
        .otherwise(F.lit("flat"))
    )
    return agg.select(
        F.col(source_col).alias("source"),
        "n_days",
        F.expr("__sy div n_days").alias("mean_milli_overall"),
        num.cast("long").alias("slope_num"),
        den.cast("long").alias("slope_den"),
        trend.alias("trend"),
    )


# ---------------------------------------------------------------------------
# Keyboard-mash / gibberish signals
# ---------------------------------------------------------------------------

def gibberish_signals(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Keyboard-mash detection — the spam-page tell the perplexity
    filter needs a whole LM for, reduced to three integer surface
    statistics over the letter stream: the LONGEST consonant run
    (natural English tops out around 6 — 'strengths'; mash like
    'asdfghjkl' runs far longer), vowel share in permille (natural
    text sits near 380-420‰; mash skews hard), and home-row
    concentration in permille ('asdfghjkl' rows near 1000‰).
    ``suspicious`` = consonant run >= 8 OR vowels outside [250, 600]
    OR home-row >= 700 on docs with >= 20 letters.

    Pure regexp/HOF integer arithmetic, narrow map.
    """
    t = F.lower(F.coalesce(F.col(text_col), F.lit("")))
    letters = F.regexp_replace(t, r"[^a-z]", "")
    n = F.length(letters).cast("long")
    vowels = F.length(F.regexp_replace(letters, r"[^aeiou]", "")) \
        .cast("long")
    home = F.length(F.regexp_replace(letters, r"[^asdfghjkl]", "")) \
        .cast("long")
    cons_runs = F.regexp_extract_all(
        letters, F.lit(r"([^aeiou]+)"), 1)
    max_run = F.coalesce(
        F.array_max(F.transform(cons_runs, lambda r: F.length(r))),
        F.lit(0),
    ).cast("long")
    d = df.select(
        F.col(id_col), n.alias("__n"), vowels.alias("__v"),
        home.alias("__h"), max_run.alias("max_consonant_run"),
    )
    vow_pm = F.when(F.col("__n") > 0,
                    F.expr("(1000 * __v) div __n")).otherwise(F.lit(0))
    home_pm = F.when(F.col("__n") > 0,
                     F.expr("(1000 * __h) div __n")).otherwise(F.lit(0))
    out = d.select(
        id_col,
        F.col("__n").alias("n_letters"),
        "max_consonant_run",
        vow_pm.cast("long").alias("vowel_permille"),
        home_pm.cast("long").alias("homerow_permille"),
    )
    return out.withColumn(
        "suspicious",
        (F.col("n_letters") >= 20)
        & (
            (F.col("max_consonant_run") >= 8)
            | (F.col("vowel_permille") < 250)
            | (F.col("vowel_permille") > 600)
            | (F.col("homerow_permille") >= 700)
        ),
    )
