"""Text-analysis operators for corpus curation: language ID, quality
scoring, token counting, document fingerprinting.

All JVM-side column expressions (no Python UDFs in the hot path), all
deterministic so the DuckDB oracle can reproduce them exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from datawave_spark.util import iter_checkpoint, spread

TOKEN_RE = "[^a-z0-9]+"

# Tiny stopword profiles for n-gram/stopword-hit language ID.  Order
# matters for deterministic argmax tie-breaks (first wins).
LANG_PROFILES: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "that", "it", "for"],
    "fr": ["le", "la", "de", "et", "les", "des", "un", "une", "est", "que"],
    "de": ["der", "die", "das", "und", "ist", "von", "den", "mit", "ein", "zu"],
    "es": ["el", "la", "de", "y", "los", "que", "un", "una", "es", "en"],
}


def tokens(col: Column) -> Column:
    return F.filter(F.split(F.lower(col), TOKEN_RE), lambda t: t != "")


def token_count(df: DataFrame, text_col: str) -> DataFrame:
    """Whitespace/punct token count + a BPE-ish subword estimate
    (≈ chars/4, the common LLM heuristic) per document."""
    df = spread(df)
    toks = tokens(F.col(text_col))
    return df.withColumn("n_tokens", F.size(toks)) \
             .withColumn("n_subwords_est",
                         F.ceil(F.length(F.col(text_col)) / 4).cast("bigint"))


def quality_score(df: DataFrame, text_col: str) -> DataFrame:
    """Heuristic quality features + composite score: mean word length,
    stopword ratio, alpha ratio.  Score = weighted sum, rounded —
    deterministic and oracle-reproducible.

    Plan shape: the token-level counts are emitted through an
    ``inline(array(struct(...)))`` generator.  A plain projection alias
    would be re-inlined into every consumer by CollapseProject,
    re-embedding the tokenizer per derived column — the duplicated
    higher-order subtrees made plan processing of the composite score
    ~8 s REGARDLESS of row count; a generator is a projection barrier,
    so each count is evaluated once and the arithmetic references real
    attributes (measured: cold plan cost drops ~6×, same values)."""
    df = spread(df)
    text = F.col(text_col)
    toks = tokens(text)
    stop = F.array(*[F.lit(w) for w in LANG_PROFILES["en"]])
    feats = F.struct(
        F.size(toks).alias("__n"),
        F.aggregate(toks, F.lit(0),
                    lambda acc, t: acc + F.length(t)).alias("__sumlen"),
        F.size(F.filter(toks, lambda t: F.array_position(stop, t) > 0))
        .alias("__stop"),
        F.length(F.regexp_replace(text, "[^a-zA-Z]", "")).alias("__alpha"),
        F.length(text).alias("__len"))
    base = df.select("*", F.inline(F.array(feats)))
    n = F.col("__n")
    mean_len = F.when(n > 0, F.col("__sumlen") / n).otherwise(F.lit(0.0))
    stop_ratio = F.when(n > 0, F.col("__stop") / n).otherwise(F.lit(0.0))
    alpha_ratio = F.when(F.col("__len") > 0,
                         F.col("__alpha") / F.col("__len")).otherwise(F.lit(0.0))
    score = F.round(0.4 * F.least(mean_len / 8, F.lit(1.0))
                    + 0.3 * F.least(stop_ratio * 4, F.lit(1.0))
                    + 0.3 * alpha_ratio, 4)
    return (base.withColumn("mean_word_len", F.round(mean_len, 4))
            .withColumn("stopword_ratio", F.round(stop_ratio, 4))
            .withColumn("alpha_ratio", F.round(alpha_ratio, 4))
            .withColumn("quality", score)
            .drop("__n", "__sumlen", "__stop", "__alpha", "__len"))


def lang_id(df: DataFrame, text_col: str) -> DataFrame:
    """Stopword-profile language ID: argmax over per-language hit
    counts; 'und' (undetermined) when nothing matches."""
    df = spread(df)
    toks = tokens(F.col(text_col))

    def profile_hits(words: list[str]) -> Column:
        prof = F.array(*[F.lit(w) for w in words])
        # NB: single-arg lambda — a second parameter would receive the
        # array INDEX from Spark's higher-order filter, not a closure.
        return F.size(F.filter(toks, lambda t: F.array_position(prof, t) > 0))

    langs = list(LANG_PROFILES)
    # Generator barrier (see quality_score): per-language hit counts
    # are each referenced ~3× below; as plain aliases the tokenizer
    # would be re-embedded into every reference.
    feats = F.struct(*[profile_hits(LANG_PROFILES[lang]).alias(f"__h_{lang}")
                       for lang in langs])
    base = df.select("*", F.inline(F.array(feats)))
    hit_cols = {lang: F.col(f"__h_{lang}") for lang in langs}
    score = F.greatest(*[hit_cols[l] for l in langs]) if len(langs) > 1 else hit_cols[langs[0]]
    expr = F.lit("und")
    for lang in reversed(langs):  # first language wins ties
        expr = F.when((hit_cols[lang] > 0) & (hit_cols[lang] == score), F.lit(lang)) \
            .otherwise(expr)
    return base.withColumn("lang_pred", expr) \
        .drop(*[f"__h_{lang}" for lang in langs])


def fingerprint(df: DataFrame, text_col: str, mod: int = 1_000_000_007) -> DataFrame:
    """Order-sensitive polynomial rolling hash over tokens (each token
    contributes its length and first/last char codes) — a compact
    content fingerprint for shift-detection and grouping.  Same fold is
    expressible in DuckDB's list_reduce for the oracle."""
    df = spread(df)
    toks = tokens(F.col(text_col))
    fp = F.aggregate(
        toks, F.lit(0).cast("bigint"),
        lambda acc, t: (acc * 131 + F.length(t) * 7
                        + F.ascii(F.substring(t, 1, 1))) % mod)
    return df.withColumn("fingerprint", fp)


def unigram_counts(df: DataFrame, text_col: str) -> DataFrame:
    """Corpus unigram table (token, n) + the corpus total as a column —
    the ingest-built language-model asset behind perplexity scoring
    (CCNet-style LM quality filtering, Wenzek et al. '19, with a
    unigram model standing in for KenLM).  One map-side-combinable
    aggregation."""
    tok = spread(df).select(F.explode(tokens(F.col(text_col))).alias("token"))
    counts = tok.groupBy("token").agg(F.count(F.lit(1)).alias("n"))
    total = counts.agg(F.sum("n").alias("total"))
    return counts.join(F.broadcast(total))


def perplexity_score(df: DataFrame, text_col: str, id_col: str,
                     lm: DataFrame) -> DataFrame:
    """Per-document unigram cross-entropy (mean ``-ln p(token)``) and
    perplexity under a corpus unigram model ``lm`` (token, n, total —
    from :func:`unigram_counts`): the classic LM quality signal — high
    perplexity = tokens the corpus distribution finds surprising
    (gibberish, boilerplate soup, wrong language).  OOV tokens take an
    add-half smoothed probability ``0.5 / total``.

    Shape: explode tokens → ONE join against the unigram table
    (broadcast when the vocabulary is small; at web scale the LM table
    shuffles on the token, bounded by vocabulary not corpus size) →
    one mean per doc.  Rounded to 4 decimals for engine-exact
    comparison."""
    tok = spread(df).select(F.col(id_col).alias("__id"),
                            F.explode(tokens(F.col(text_col))).alias("token"))
    # the total rides in on a 1-row broadcast (NOT taken from matched
    # lm rows — a document of entirely-OOV tokens would otherwise see a
    # NULL total and score NULL)
    tot = lm.select("total").limit(1)
    joined = tok.join(F.broadcast(lm.drop("total")), "token", "left")                 .join(F.broadcast(tot))
    neglogp = F.when(
        F.col("n").isNotNull(),
        -F.log(F.col("n").cast("double") / F.col("total"))
    ).otherwise(None)
    per_doc = (joined
               .withColumn("__nlp", neglogp)
               .groupBy("__id")
               .agg(F.count(F.lit(1)).alias("n_tokens"),
                    F.sum("__nlp").alias("__known_nlp"),
                    F.sum(F.when(F.col("n").isNull(), 1).otherwise(0))
                    .alias("__oov"),
                    F.first("total").alias("__total")))
    oov_nlp = F.col("__oov") * -F.log(F.lit(0.5) / F.col("__total"))
    ce = (F.coalesce(F.col("__known_nlp"), F.lit(0.0)) + oov_nlp) \
        / F.col("n_tokens")
    return per_doc.select(
        F.col("__id").alias(id_col), "n_tokens",
        F.round(ce, 4).alias("cross_entropy"),
        F.round(F.exp(ce), 4).alias("perplexity"))


# GPT-2-style pre-tokenizer pattern, restricted to constructs Java
# regex and RE2 (DuckDB) interpret IDENTICALLY: no lookahead (RE2 has
# none — the original's \\s+(?!\\S) trailing-space rule is dropped, a
# documented simplification), ASCII classes (\\p{L} Unicode-property
# semantics differ between engines).  Order matters: contractions,
# space-prefixed letter runs, digit runs, punctuation runs, whitespace.
BPE_PRETOKEN_RE = (r"'(?:[sdmt]|ll|ve|re)"
                   r"| ?[A-Za-z]+"
                   r"| ?[0-9]+"
                   r"| ?[^A-Za-z0-9\s']+"
                   r"|\s+")


def bpe_pretokenize(df: DataFrame, text_col: str,
                    out_col: str = "bpe_pretokens") -> DataFrame:
    """BPE PRE-tokenization (the GPT-2 regex split that precedes merge
    lookup): the token array every byte-pair tokenizer starts from.
    Pure JVM ``regexp_extract_all`` — no UDF; the count is the standard
    deterministic upper bound on real BPE token count (merges only
    fuse within a pre-token)."""
    return spread(df).withColumn(
        out_col, F.regexp_extract_all(F.col(text_col),
                                      F.lit(BPE_PRETOKEN_RE), F.lit(0)))


def bpe_token_count(df: DataFrame, text_col: str) -> DataFrame:
    """Per-document BPE pre-token count (n_bpe_pretokens) — replaces
    chars/4 guessing with the actual regex split count."""
    return bpe_pretokenize(df, text_col).withColumn(
        "n_bpe_pretokens", F.size(F.col("bpe_pretokens")).cast("bigint")) \
        .drop("bpe_pretokens")


def hashed_bucket(col: Column, n_buckets: int, salt: str = "f") -> Column:
    """Deterministic feature-hash bucket for a token column:
    md5-derived (not Spark's hash()) so an external engine reproduces
    every bucket id bit-for-bit."""
    return (F.conv(F.substring(F.md5(F.concat(F.lit(f"{salt}:"), col)),
                               1, 8), 16, 10)
            .cast("long") % n_buckets)


def linear_classifier_score(df: DataFrame, text_col: str, id_col: str,
                            weights: DataFrame, n_buckets: int | None = None,
                            bias: float = 0.0,
                            weight_scale: float = 1000.0) -> DataFrame:
    """MODEL-AS-TABLE inference — the fasttext-style linear text
    classifier (quality/langid filters in production data pipelines)
    restated as plan algebra: features are hashed token buckets, the
    trained weight vector is a STORED (bucket, weight) table, and
    scoring is explode → bucket → broadcast weight join → per-doc sum.
    No UDF, no model runtime in the scan; swapping models = swapping a
    tiny table.

    Weights are INTEGER (scaled by ``weight_scale``): integer sums are
    addition-order-exact, so the score is bit-identical across engines
    and partitionings (the rebalance_mix discipline); the single
    float division happens once per document at the end.
    Output: (id, n_feats, score, label) with
    score = round(bias + Σw/(scale·n), 4), label = score ≥ 0.

    ``n_buckets`` defaults to the weight table's row count (a bounded
    read — the table IS the model): passing a mismatching value would
    silently drop every feature hashed into a bucket the table lacks,
    skewing n_feats and score with no error."""
    if n_buckets is None:
        n_buckets = weights.count()
    toks = (spread(df).select(F.col(id_col).alias("id"),
                              F.explode(tokens(F.col(text_col))).alias("t")))
    feat = toks.withColumn("bucket", hashed_bucket(F.col("t"), n_buckets))
    scored = (feat.join(F.broadcast(weights), "bucket")
              .groupBy("id")
              .agg(F.count(F.lit(1)).alias("n_feats"),
                   F.sum("weight").alias("__sw")))
    # explicit round-half-up (floor(x·1e4 + 0.5)/1e4), NOT round():
    # Spark rounds half up, DuckDB half to even — a score landing on a
    # half-boundary (possible: the divisor is scale·n) would diverge
    # (the quantize_embeddings discipline)
    raw = F.lit(bias) + F.col("__sw") / (weight_scale * F.col("n_feats"))
    score = F.floor(raw * 10000 + F.lit(0.5)) / 10000.0
    return scored.select("id", "n_feats", score.alias("score"),
                         (score >= 0).alias("label"))


def bm25_topk(postings: DataFrame, query_terms: list[str],
              n_docs: int, total_len: int, k: int = 10,
              k1: float = 1.2, b: float = 0.75) -> DataFrame:
    """BM25-ranked top-k documents for a bag-of-terms query over the
    stored postings asset (sources/prepared.term_postings): the ranked
    full-text retrieval the reference approximates with
    content:scoredPhrase TermWeight sums (ContentFunctions.java:214),
    restated with the standard Okapi/Lucene scoring function.

    Shape: the term IN-filter prunes the range-clustered postings to
    the query's rows; per-term document frequencies are a tiny groupBy
    broadcast back; one groupBy doc_id sums contributions; top-k via
    ORDER BY ... LIMIT (Spark's TakeOrderedAndProject — a per-partition
    heap + driver merge of k rows, never a global sort materialization).

    Corpus stats (``n_docs``, ``total_len``) come from the ingest-side
    stats row; idf = ln((N - df + 0.5)/(df + 0.5) + 1) (Lucene's
    non-negative variant).  Scores round half-up at 4dp so the DuckDB
    oracle matches bit-for-bit (round() half-even would diverge)."""
    if not query_terms:
        raise ValueError("bm25_topk needs at least one query term")
    if n_docs <= 0 or total_len <= 0:
        # avgdl=0 would put a literal 0 divisor in every row's norm
        # (ANSI job abort); an empty corpus is a caller error
        raise ValueError(f"bm25_topk needs positive corpus stats "
                         f"(n_docs={n_docs}, total_len={total_len})")
    avgdl = F.lit(float(total_len) / float(n_docs))
    p = postings.filter(F.col("term").isin(list(query_terms)))
    dfreq = p.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    idf = F.log((F.lit(float(n_docs)) - F.col("df") + 0.5)
                / (F.col("df") + 0.5) + 1.0)
    tf = F.col("tf").cast("double")
    norm = tf + k1 * (1.0 - b + b * F.col("doc_len") / avgdl)
    contrib = idf * tf * (k1 + 1.0) / norm
    scored = (p.join(F.broadcast(dfreq), "term")
              .groupBy("doc_id")
              .agg(F.sum(contrib).alias("__s"),
                   F.count(F.lit(1)).alias("n_terms")))
    score = F.floor(F.col("__s") * 10000 + F.lit(0.5)) / 10000.0
    return (scored.select("doc_id", "n_terms", score.alias("score"))
            .orderBy(F.desc("score"), "doc_id").limit(k))


def collocations_pmi(df: DataFrame, text_col: str, id_col: str,
                     min_count: int = 5, k: int = 20) -> DataFrame:
    """Top-k bigram collocations by pointwise mutual information:
    (bigram, n, pmi) — the corpus-analysis companion to the n-gram
    repetition/decontamination operators (phrase mining, tokenizer-merge
    candidates, boilerplate discovery).

    PMI(a,b) = ln(P(ab) / (P(a)·P(b))) computed as
    ``ln(((c_ab/B) / (c_a/T)) / (c_b/T))`` in that exact association
    order so the DuckDB oracle replays the same IEEE operations;
    rounded half-up at 4dp.

    Shape: one bigram-count groupBy + one unigram-count groupBy; the
    corpus totals ride along as 1-row cross joins (no driver collect);
    unigram counts join back onto the bigram counts (vocabulary-sized —
    AQE broadcasts when small).  ``min_count`` prunes the long tail
    BEFORE the joins and the top-k heap.  At ingest the unigram/bigram
    count tables are stored assets (the unigram_lm discipline); this
    operator states the from-scratch plan."""
    t = tokens(F.col(text_col))
    toks = df.select(F.col(id_col).alias("id"), t.alias("t"))
    uni = (toks.select(F.explode("t").alias("w"))
           .groupBy("w").agg(F.count(F.lit(1)).alias("c")))
    n_t = F.size("t")
    bigrams = F.when(n_t >= 2, F.zip_with(
        F.slice("t", 1, n_t - 1), F.slice("t", 2, n_t - 1),
        lambda a, b: F.concat(a, F.lit(" "), b))
    ).otherwise(F.array().cast("array<string>"))
    bc = (toks.select(F.explode(bigrams).alias("b"))
          .groupBy("b").agg(F.count(F.lit(1)).alias("cab"))
          .filter(F.col("cab") >= min_count))
    tot = uni.agg(F.sum("c").cast("double").alias("__tot_t"))
    btot = toks.agg(F.sum(F.greatest(n_t - 1, F.lit(0)))
                    .cast("double").alias("__tot_b"))
    ua = uni.select(F.col("w").alias("__wa"), F.col("c").alias("ca"))
    ub = uni.select(F.col("w").alias("__wb"), F.col("c").alias("cb"))
    j = (bc.withColumn("__wa", F.split("b", " ").getItem(0))
         .withColumn("__wb", F.split("b", " ").getItem(1))
         .join(ua, "__wa").join(ub, "__wb")
         .crossJoin(tot).crossJoin(btot))
    pmi_raw = F.log(((F.col("cab") / F.col("__tot_b"))
                     / (F.col("ca") / F.col("__tot_t")))
                    / (F.col("cb") / F.col("__tot_t")))
    pmi = F.floor(pmi_raw * 10000 + F.lit(0.5)) / 10000.0
    return (j.select(F.col("b").alias("bigram"),
                     F.col("cab").alias("n"), pmi.alias("pmi"))
            .orderBy(F.desc("pmi"), "bigram").limit(k))


def bigram_counts(df: DataFrame, text_col: str) -> DataFrame:
    """Corpus bigram table (t1, t2, n): counts of ADJACENT token pairs
    under the same tokenizer as :func:`unigram_counts`.  The companion
    ingest-built asset for stupid-backoff scoring — bigram-type-bounded
    (vocabulary², sparse), not corpus-bounded.  One map-side-combinable
    aggregation; the pair array is built in-place per row (no
    positional self-join, no window shuffle)."""
    base = spread(df).select(tokens(F.col(text_col)).alias("__toks"))
    pairs = F.when(
        F.size("__toks") >= 2,
        F.expr("""transform(sequence(1, size(__toks) - 1),
                  i -> struct(element_at(__toks, i) AS t1,
                              element_at(__toks, i + 1) AS t2))""")
    ).otherwise(F.array().cast("array<struct<t1:string,t2:string>>"))
    ex = base.select(F.explode(pairs).alias("p")).select("p.t1", "p.t2")
    return ex.groupBy("t1", "t2").agg(F.count(F.lit(1)).alias("n12"))


def stupid_backoff_score(df: DataFrame, text_col: str, id_col: str,
                         lm: DataFrame, bigrams: DataFrame,
                         alpha: float = 0.4) -> DataFrame:
    """Per-document mean negative-log stupid-backoff bigram score
    (Brants et al. 2007, "Large Language Models in Machine
    Translation"): S(w_i | w_{i-1}) = count(w_{i-1} w_i) /
    count(w_{i-1}) when the bigram was observed, else
    alpha * S(w_i) with the unigram relative frequency (OOV tokens
    take the add-half floor 0.5/total).  The document's first token is
    scored by its unigram alone.  Stupid backoff skips the
    normalization that makes Katz/Kneser-Ney hard to distribute — the
    scores are not probabilities, which is exactly why it scales: both
    tables are plain counts, built in one pass each.

    A sharper fluency/quality signal than unigram perplexity: word-
    salad with a natural unigram mix (boilerplate soup, shuffled text)
    scores poorly because its ADJACENT pairs are unseen.

    Shape: one in-array pair construction per row (no positional
    self-join), one explode, three vocabulary-bounded joins (bigram
    table on (t_prev, t), unigram on t_prev and on t), one per-doc
    agg.  Rounded to 4 decimals for engine-exact comparison."""
    toks = tokens(F.col(text_col))
    base = spread(df).select(F.col(id_col).alias("__id"),
                             toks.alias("__toks"))
    items = F.when(
        F.size("__toks") >= 1,
        F.expr("""transform(sequence(1, size(__toks)),
                  i -> struct(
                      IF(i = 1, CAST(NULL AS STRING),
                         element_at(__toks, i - 1)) AS tp,
                      element_at(__toks, i) AS tk))""")
    ).otherwise(F.array().cast("array<struct<tp:string,tk:string>>"))
    it = (base.select("__id", F.explode(items).alias("p"))
              .select("__id", "p.tp", "p.tk"))

    tot = lm.select("total").limit(1)
    ug = lm.drop("total")
    j = (it.join(F.broadcast(bigrams),
                 (F.col("tp") == F.col("t1")) & (F.col("tk") == F.col("t2")),
                 "left")
           .join(F.broadcast(ug.select(F.col("token").alias("tp_tok"),
                                       F.col("n").alias("np"))),
                 F.col("tp") == F.col("tp_tok"), "left")
           .join(F.broadcast(ug.select(F.col("token").alias("tk_tok"),
                                       F.col("n").alias("nt"))),
                 F.col("tk") == F.col("tk_tok"), "left")
           .join(F.broadcast(tot)))
    uni = F.when(F.col("nt").isNotNull(),
                 F.col("nt").cast("double") / F.col("total")
                 ).otherwise(F.lit(0.5) / F.col("total"))
    score = (F.when(F.col("n12").isNotNull(),
                    F.col("n12").cast("double") / F.col("np"))
              .when(F.col("tp").isNull(), uni)
              .otherwise(F.lit(alpha) * uni))
    per_doc = (j.withColumn("__nlp", -F.log(score))
                .groupBy("__id")
                .agg(F.count(F.lit(1)).alias("n_tokens"),
                     F.sum("__nlp").alias("__s")))
    mean_nlp = F.col("__s") / F.col("n_tokens")
    return per_doc.select(
        F.col("__id").alias(id_col), "n_tokens",
        F.round(mean_nlp, 4).alias("backoff_nll"),
        F.round(F.exp(mean_nlp), 4).alias("backoff_ppl"))


def vocab_ids(lm: DataFrame, vocab_size: int | None = None) -> DataFrame:
    """(token, tid) id table from a stored unigram count asset
    (prepared.unigram_lm): ids are frequency-ranked (1 = most common;
    ties break on token text, so the mapping is deterministic across
    engines and runs).  0 is reserved for out-of-vocabulary.

    The global row_number window is single-partition ON PURPOSE: the
    input is the VOCABULARY table (bounded by distinct-token count,
    ~100k-1M rows at any corpus size), not the corpus — the same
    bounded-metadata shape as the reference's dictionary/model tables."""
    from pyspark.sql import Window
    w = Window.orderBy(F.desc("n"), F.asc("token"))
    out = lm.select("token", F.row_number().over(w).alias("tid"))
    if vocab_size is not None:
        out = out.filter(F.col("tid") <= vocab_size)
    return out


def token_ids(df: DataFrame, text_col: str, id_col: str,
              vocab: DataFrame, unk_id: int = 0) -> DataFrame:
    """Tokenize-to-ids: (doc, pos, tid) rows — the final map step of a
    training-data pipeline, turning curated text into model-ready id
    sequences against a FIXED stored vocabulary.

    Scale shape: tokenize in-plan (no UDF), posexplode to skinny rows,
    ONE broadcast join against the vocabulary-sized id table (never a
    shuffle of the corpus), OOV coalesced to ``unk_id``.  Row order
    within a document is carried by ``pos``, so downstream sequence
    assembly (``collect_list`` over a window, or pack_sequences) is
    order-independent of partitioning."""
    toks = df.select(F.col(id_col).alias("__id"),
                     F.posexplode(tokens(F.col(text_col)))
                     .alias("pos", "token"))
    return (toks.join(F.broadcast(vocab), "token", "left")
            .select(F.col("__id").alias(id_col), "pos",
                    F.coalesce(F.col("tid"), F.lit(unk_id)).alias("tid")))


def chunk_documents(df: DataFrame, text_col: str, id_col: str,
                    chunk_tokens: int = 256,
                    overlap: int = 32) -> DataFrame:
    """Fixed token-window chunking with overlap → (id, chunk_id,
    chunk_text, n_tokens): the unit-of-work step of an embedding/
    retrieval pipeline (each chunk is what gets embedded and indexed;
    the overlap keeps boundary-straddling phrases findable).

    Window i covers tokens ``[i*stride, i*stride + chunk_tokens)``
    with ``stride = chunk_tokens - overlap``; the chunk count is
    ``1 + ceil((n - chunk_tokens) / stride)`` (always ≥1, so empty and
    short documents still yield their one chunk).  All-integer
    arithmetic so the oracle replays exactly.

    Scale shape: ZERO shuffle — tokenize, window-count, and the
    per-chunk slice/join all run as codegen'd array expressions inside
    the scan stage, emitted through one ``inline(transform(sequence))``
    generator (the house projection barrier, see quality_score)."""
    if overlap < 0 or overlap >= chunk_tokens:
        raise ValueError(f"need 0 <= overlap < chunk_tokens, got "
                         f"overlap={overlap} chunk_tokens={chunk_tokens}")
    stride = chunk_tokens - overlap
    # tokenize ONCE into a named column below the generator — lambdas
    # get no common-subexpression elimination, so an inlined tokens()
    # would re-split the whole document per chunk element (the
    # bigram_counts/stupid_backoff __toks discipline)
    base = df.select(F.col(id_col), tokens(F.col(text_col)).alias("__toks"))
    toks = F.col("__toks")
    n = F.size(toks)
    # explicit floor: DuckDB CASTs float->int by ROUNDING while Spark
    # truncates, so the oracle mirrors this exact floor-div form
    n_chunks = F.when(n <= chunk_tokens, F.lit(1)).otherwise(
        F.floor((n - chunk_tokens + stride - 1) / stride) + 1).cast("int")
    chunks = F.inline(F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.struct(
            i.cast("long").alias("chunk_id"),
            F.array_join(F.slice(toks, i * stride + 1, chunk_tokens),
                         " ").alias("chunk_text"),
            F.size(F.slice(toks, i * stride + 1, chunk_tokens))
            .cast("long").alias("n_tokens"))))
    return base.select(F.col(id_col), chunks)


def pack_token_sequences(df: DataFrame, text_col: str, id_col: str,
                         vocab: DataFrame, seq_len: int,
                         strata_col: str | None = None,
                         bin_seqs: int = 8) -> DataFrame:
    """Token ids → fixed-length training sequences: documents are
    next-fit packed into ``bin_seqs * seq_len``-token bins (the
    pack_sequences discipline: id-ordered cumsum, reproducible), each
    bin concatenates its documents' id arrays in id order and emits
    ``floor(total/seq_len)`` sequences of exactly ``seq_len`` ids —
    the GPT-style concat-and-chunk assembly, with cross-document
    attention bounded by the bin instead of the whole corpus (bins
    are the distributed-stable analog of a global token order, which
    no 1000-executor job can maintain).

    Returns (strata, bin, seq_idx, seq_md5, first_tid, last_tid): the
    md5 of the space-joined ids identifies the sequence content
    deterministically without shipping ``seq_len``-wide arrays
    through the result set.

    Scale shape: one doc-keyed shuffle to re-assemble per-document id
    arrays (the vocab join itself is broadcast, see token_ids), one
    window cumsum on the stratum key, one bin-keyed groupBy.  A
    document is never split across bins, so a bin holds at most
    ``bin_seqs*seq_len + max_doc_tokens`` ids — the bin stage's skew
    equals the longest single document (the same bound the per-doc
    re-assembly stage already carries), not the corpus's hot-stratum
    size."""
    from pyspark.sql import Window
    strata = F.col(strata_col) if strata_col else F.lit("all")
    ids = token_ids(df.select(F.col(id_col), F.col(text_col)),
                    text_col, id_col, vocab)
    keys = df.select(F.col(id_col), strata.alias("__strata"))
    per_doc = (ids.groupBy(id_col)
               .agg(F.transform(
                   F.array_sort(F.collect_list(F.struct("pos", "tid"))),
                   lambda s: s["tid"]).alias("__ids"))
               .join(keys, id_col)
               .withColumn("__n", F.size("__ids")))
    budget = bin_seqs * seq_len
    w = Window.partitionBy("__strata").orderBy(id_col) \
        .rowsBetween(Window.unboundedPreceding, 0)
    binned = per_doc.withColumn(
        "__bin", F.floor((F.sum("__n").over(w) - F.col("__n")) / budget))
    packed = (binned.groupBy("__strata", "__bin")
              .agg(F.flatten(F.transform(
                  F.array_sort(F.collect_list(F.struct(id_col, "__ids"))),
                  lambda s: s["__ids"])).alias("__all")))
    seqs = F.inline(F.transform(
        F.sequence(F.lit(0),
                   F.floor(F.size("__all") / seq_len).cast("int") - 1),
        lambda s: F.struct(
            s.cast("long").alias("seq_idx"),
            F.md5(F.array_join(F.transform(
                F.slice(F.col("__all"), s * seq_len + 1, seq_len),
                lambda x: x.cast("string")), " ")).alias("seq_md5"),
            F.element_at(F.col("__all"), s * seq_len + 1)
            .cast("long").alias("first_tid"),
            F.element_at(F.col("__all"), (s + 1) * seq_len)
            .cast("long").alias("last_tid"))))
    return packed.filter(F.size("__all") >= seq_len).select(
        F.col("__strata").alias("strata"), F.col("__bin").alias("bin"), seqs)


def _bpe_train_driver(wordcounts: list, n_merges: int,
                      min_pair_count: int):
    """Driver-side BPE merge learning over a collected word-count
    table — EXACTLY the same greedy as the distributed loop (pair
    counts weighted by word count, best = count desc then
    lexicographic (a, b), merge applied as a left-to-right
    non-overlapping fold), so the cutover is invisible to results and
    to the replayed-training oracle.  Incremental pair-count updates
    (only words containing the merged pair are re-scanned — the
    Sennrich reference-implementation trick) keep a 32k-merge vocab at
    seconds, not hours.

    ``pair_words`` may hold stale word indices (a word that no longer
    contains the pair): harmless — the decrement-all / fold /
    increment-all sequence is a no-op for such words."""
    syms = [[c for c in w] for w, _ in wordcounts]
    cnts = [c for _, c in wordcounts]
    from collections import defaultdict
    pair_counts: dict = defaultdict(int)
    pair_words: dict = defaultdict(set)
    for i, s in enumerate(syms):
        c = cnts[i]
        for p in zip(s, s[1:]):
            pair_counts[p] += c
            pair_words[p].add(i)
    merges: list[tuple[int, str, str, int]] = []
    for step in range(1, n_merges + 1):
        # n > 0 mirrors the distributed loop exactly: its pair frame is
        # built from pairs PRESENT in words (counts strictly positive),
        # so a decremented-to-zero husk entry must never be selectable
        # even when min_pair_count <= 0
        live = [(p, n) for p, n in pair_counts.items()
                if n > 0 and n >= min_pair_count]
        if not live:
            break
        (a, b), n = min(live, key=lambda kv: (-kv[1], kv[0]))
        merges.append((step, a, b, int(n)))
        for i in sorted(pair_words[(a, b)]):
            s, c = syms[i], cnts[i]
            for p in zip(s, s[1:]):
                pair_counts[p] -= c
            out: list[str] = []
            for x in s:
                if out and out[-1] == a and x == b:
                    out[-1] = out[-1] + x
                else:
                    out.append(x)
            syms[i] = out
            for p in zip(out, out[1:]):
                pair_counts[p] += c
                pair_words[p].add(i)
        pair_words.pop((a, b), None)
    state = [(w, c, syms[i]) for i, (w, c) in enumerate(wordcounts)]
    return merges, state


def bpe_train(df: DataFrame, text_col: str, n_merges: int = 8,
              min_pair_count: int = 2, with_state: bool = False,
              reliable: bool = False,
              driver_threshold: int = 1_000_000):
    """Distributed BPE tokenizer training → the learned merge table
    (step, left, right, pair_count): the missing third of the
    tokenizer pipeline alongside :func:`vocab_ids` (apply) and
    bpe_token_counts (pre-tokenize).  Classic byte-pair encoding
    (Sennrich et al. 2016) trains on the WORD-COUNT table, not the
    corpus — the whole iteration runs over a vocabulary-bounded frame
    regardless of corpus size, exactly like the reference's
    dictionary/model tables.

    Per merge step: (1) adjacent symbol pairs weighted by word count,
    one map-side-combinable groupBy; (2) the single best pair
    (count desc, then lexicographic — deterministic under ties)
    fetched to the driver, ONE row per step (the k-means
    centroid-collect precedent: the merge rule must parametrize the
    next round's expressions); (3) the merge applied per word as a
    zero-shuffle left-to-right greedy array fold (``F.aggregate``),
    merging non-overlapping occurrences exactly as reference BPE
    does ('a a a' under (a,a) → ['aa','a']).  Each round's
    vocabulary-sized state is eagerly localCheckpoint'ed (the
    pagerank/connected-components discipline — fold expressions nest
    per round, so un-truncated lineage grows exponentially).

    Stops early when no pair reaches ``min_pair_count``.  Symbols are
    characters initially; no end-of-word marker (words are trained
    independently, so the marker adds nothing here — documented
    divergence from Sennrich's '</w>').

    ``with_state=True`` additionally returns the final per-word
    segmentation frame (w, cnt, syms) — training's end state IS the
    segmentation table :func:`bpe_encode` joins against (real BPE
    implementations cache exactly this).

    **Driver cutover** (the ``connected_components.driver_threshold``
    discipline, VERDICT r5 item 5): the iteration state is the
    word-count table — vocabulary-bounded, never corpus-bounded — so
    when its row count is ≤ ``driver_threshold`` (it essentially
    always is: a 100 TB corpus still has a language-sized vocabulary),
    training collects it ONCE and learns every merge driver-side with
    the identical greedy (equivalence pinned by test).  This turns the
    per-merge driver round-trip (1 ``limit(1).collect()`` + 1 eager
    checkpoint per rule — 32k sequential Spark jobs at a real vocab)
    into ONE Spark job total.  The distributed per-merge loop remains
    below for a genuinely unbounded symbol table
    (``driver_threshold=0`` forces it)."""
    words = (spread(df)
             .select(F.explode(tokens(F.col(text_col))).alias("w"))
             .groupBy("w").agg(F.count(F.lit(1)).alias("cnt")))
    spark = df.sparkSession
    # ONE job decides the cutover AND fetches the data: collecting the
    # bounded prefix (threshold + 1 rows) replaces a count() + collect()
    # pair that would scan the corpus twice, and caps driver memory at
    # the threshold even when the vocabulary is huge
    probe_rows = words.limit(driver_threshold + 1).collect()
    if len(probe_rows) <= driver_threshold:
        wc = [(r.w, int(r.cnt)) for r in probe_rows]
        merges, seg = _bpe_train_driver(wc, n_merges, min_pair_count)
        merges_df = spark.createDataFrame(
            merges, "step long, left string, right string, pair_count long")
        if not with_state:
            return merges_df
        state_df = spark.createDataFrame(
            seg, "w string, cnt long, syms array<string>")
        return merges_df, state_df
    state = iter_checkpoint(
        words.select(
            "w", "cnt",
            F.filter(F.split("w", ""), lambda c: c != "").alias("syms")),
        reliable)
    merges: list[tuple[int, str, str, int]] = []
    for step in range(1, n_merges + 1):
        pair_structs = F.when(
            F.size("syms") >= 2,
            F.transform(
                F.sequence(F.lit(1), F.size("syms") - 1),
                lambda i: F.struct(
                    F.element_at(F.col("syms"), i).alias("a"),
                    F.element_at(F.col("syms"), i + 1).alias("b")))
        ).otherwise(F.array().cast("array<struct<a:string,b:string>>"))
        pairs = (state.select("cnt", F.explode(pair_structs).alias("p"))
                 .groupBy("p.a", "p.b").agg(F.sum("cnt").alias("n")))
        best = pairs.orderBy(F.desc("n"), "a", "b").limit(1).collect()
        if not best or best[0].n < min_pair_count:
            break
        a, b = best[0].a, best[0].b
        merges.append((step, a, b, int(best[0].n)))
        # greedy left-to-right fold; F.get (never ANSI-throws) probes
        # the accumulator tail, so the empty-accumulator case is a
        # NULL condition, not an error
        fold = F.aggregate(
            F.col("syms"), F.array().cast("array<string>"),
            lambda acc, x: F.when(
                (F.get(acc, F.size(acc) - 1) == F.lit(a))
                & (x == F.lit(b)),
                F.concat(F.slice(acc, F.lit(1), F.size(acc) - 1),
                         F.array(F.concat(F.get(acc, F.size(acc) - 1), x)))
            ).otherwise(F.concat(acc, F.array(x))))
        state = iter_checkpoint(
            state.select("w", "cnt", fold.alias("syms")), reliable)
    merges_df = spark.createDataFrame(
        merges, "step long, left string, right string, pair_count long")
    return (merges_df, state) if with_state else merges_df


def bpe_encode(df: DataFrame, text_col: str, id_col: str,
               segments: DataFrame) -> DataFrame:
    """Apply a learned BPE segmentation to a corpus → (id, word_pos,
    sym_idx, subword): tokenize, join each word against the
    vocabulary-sized segmentation table (:func:`bpe_train`
    ``with_state=True``), fan out the subwords.  Words outside the
    table (new batches) fall back to character symbols in-plan.

    Scale shape: posexplode + ONE broadcast join against the
    vocabulary-sized table + a second posexplode — the corpus never
    shuffles, mirroring :func:`token_ids`.  (word_pos, sym_idx)
    carries deterministic order without any window."""
    toks = df.select(F.col(id_col).alias("__id"),
                     F.posexplode(tokens(F.col(text_col)))
                     .alias("word_pos", "w"))
    joined = toks.join(F.broadcast(segments.select("w", "syms")), "w", "left")
    syms = F.coalesce(
        F.col("syms"),
        F.filter(F.split("w", ""), lambda c: c != ""))
    return (joined.select(F.col("__id").alias(id_col), "word_pos",
                          F.posexplode(syms).alias("sym_idx", "subword")))
