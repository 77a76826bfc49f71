"""Similarity search over embedding columns (array<float>).

Two paths, as a 100 TB pipeline needs both:

- ``cosine_topk``      — exact brute-force top-k for one query vector.
  JVM-side: dot product via ``F.zip_with`` + ``F.aggregate`` (no Python
  in the row loop), one narrow scan + a driver-side top-k (``limit`` on
  an ordered frame → Spark's TakeOrdered, no full sort shuffle).
- ``lsh_cosine_topk``  — random-hyperplane LSH (Charikar '02): sign
  signature → probe only the query's bucket (optionally multi-probe by
  Hamming distance ≤ 1).  At scale the bucket join prunes the scan to
  ~N/2^bits candidates; the hyperplanes are seeded-deterministic.
- ``knn_join``         — exact k-NN for EVERY row of a query frame
  against a corpus (broadcast the smaller side; per-query top-k via
  window), the building block for dedup-by-embedding and retrieval
  eval sets.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window, functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, v: acc + v)


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_topk(df: DataFrame, vec_col: str, id_col: str,
                query: list[float], k: int = 10,
                round_to: int = 4) -> DataFrame:
    """Exact top-k by cosine to ``query``: (id, cos) — ties broken by id
    so the result set is deterministic."""
    q = F.array(*[F.lit(float(x)) for x in query])
    scored = df.select(
        F.col(id_col).alias("id"),
        F.round(cosine(F.col(vec_col).cast("array<double>"), q), round_to).alias("cos"))
    return scored.orderBy(F.col("cos").desc(), F.col("id")).limit(k)


def hyperplanes(dim: int, bits: int, seed: int = 42) -> np.ndarray:
    """Deterministic Gaussian hyperplanes with md5-derived randomness —
    the same hash-not-rng construction as every other derived asset in
    the repo, so an external oracle (DuckDB) consumes the identical
    inlined literals and the whole LSH pipeline is value-checkable.
    Box-Muller over two md5 uniforms per component gives the N(0,1)
    marginals random-projection LSH wants (Charikar '02)."""
    import hashlib
    import math

    def u(tag: str) -> float:
        h = hashlib.md5(tag.encode()).hexdigest()
        return (int(h[:8], 16) + 0.5) / 2.0 ** 32

    return np.array([
        [math.sqrt(-2.0 * math.log(u(f"{seed}:{b}:{j}:a")))
         * math.cos(2.0 * math.pi * u(f"{seed}:{b}:{j}:b"))
         for j in range(dim)]
        for b in range(bits)])


_hyperplanes = hyperplanes  # back-compat alias


def lsh_signature(vec: Column, planes: np.ndarray) -> Column:
    """Sign-bit signature string for a vector column.  The projection is
    rounded to 6 decimals before the sign test so an external engine
    summing in a different order lands on the same bit."""
    bits = []
    for row in planes:
        plane = F.array(*[F.lit(float(x)) for x in row])
        bits.append(F.when(F.round(_dot(vec, plane), 6) >= 0,
                           F.lit("1")).otherwise(F.lit("0")))
    return F.concat(*bits)


def query_signature(query: list[float], planes: np.ndarray) -> str:
    """The driver-side signature of a query vector, mirroring
    ``lsh_signature``'s fold order + rounding exactly."""
    sig = []
    for row in planes:
        acc = 0.0
        for v, p in zip(query, row):
            acc += float(v) * float(p)
        sig.append("1" if round(acc, 6) >= 0 else "0")
    return "".join(sig)


def probe_set(qsig: str, probe_radius: int = 2) -> list[str]:
    """All signatures within Hamming distance ≤ probe_radius (multiprobe
    LSH): the bucket keys the query scans."""
    from itertools import combinations
    bits = len(qsig)

    def flip(sig: str, idxs: tuple[int, ...]) -> str:
        out = list(sig)
        for i in idxs:
            out[i] = "0" if out[i] == "1" else "1"
        return "".join(out)

    probes = {qsig}
    for r in range(1, probe_radius + 1):
        for idxs in combinations(range(bits), r):
            probes.add(flip(qsig, idxs))
    return sorted(probes)


def lsh_cosine_topk(df: DataFrame, vec_col: str, id_col: str,
                    query: list[float], k: int = 10, bits: int = 8,
                    seed: int = 42, probe_radius: int = 2,
                    round_to: int = 4) -> DataFrame:
    """Approximate top-k: score only vectors whose LSH bucket is within
    Hamming distance ≤ probe_radius of the query's bucket (multiprobe).
    With bits=8, radius=2 this scans ~37/256 ≈ 14% of the corpus —
    recall/cost is tunable per deployment via (bits, probe_radius).
    Computes signatures in-plan; at scale use ``lsh_cosine_topk_stored``
    over an ingest-signed table (sources.prepared.embedding_lsh)."""
    planes = hyperplanes(len(query), bits, seed)
    vec = F.col(vec_col).cast("array<double>")
    signed = df.select(F.col(id_col), vec.alias(vec_col),
                       lsh_signature(vec, planes).alias("__sig"))
    return lsh_cosine_topk_stored(signed, vec_col, id_col, "__sig",
                                  query, planes, k=k,
                                  probe_radius=probe_radius,
                                  round_to=round_to)


def lsh_cosine_topk_stored(signed: DataFrame, vec_col: str, id_col: str,
                           sig_col: str, query: list[float],
                           planes: np.ndarray, k: int = 10,
                           probe_radius: int = 2,
                           round_to: int = 4) -> DataFrame:
    """Multiprobe LSH top-k over a table whose signature column was
    written at ingest: the probe is an IN filter on a short stored
    string (pushes to parquet, row-group-skips on the sig-clustered
    layout); only bucket members are scored."""
    qsig = query_signature(query, planes)
    probes = probe_set(qsig, probe_radius)
    cand = signed.filter(F.col(sig_col).isin(*probes))
    q = F.array(*[F.lit(float(x)) for x in query])
    scored = cand.select(
        F.col(id_col).alias("id"),
        F.round(cosine(F.col(vec_col).cast("array<double>"), q),
                round_to).alias("cos"))
    return scored.orderBy(F.col("cos").desc(), F.col("id")).limit(k)


def knn_join(queries: DataFrame, corpus: DataFrame, vec_col: str,
             id_col: str, k: int = 5, round_to: int = 4) -> DataFrame:
    """EXACT k-NN for every query row against the full corpus:
    (query_id, corpus_id, cos).  This is inherently a cartesian — use
    it ONLY for small eval sets (bounded query side); the corpus-scale
    paths are ``knn_join_blocked`` (equi-join on a stored block) and
    ``knn_join_lsh`` (stored-signature multiprobe).  Per-query top-k
    via window row_number (one shuffle on query_id)."""
    qs = queries.select(F.col(id_col).alias("query_id"),
                        F.col(vec_col).cast("array<double>").alias("__qv"))
    cs = corpus.select(F.col(id_col).alias("corpus_id"),
                       F.col(vec_col).cast("array<double>").alias("__cv"))
    scored = (qs.crossJoin(cs)
              .filter(F.col("query_id") != F.col("corpus_id"))
              .select("query_id", "corpus_id",
                      F.round(cosine(F.col("__qv"), F.col("__cv")), round_to).alias("cos")))
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("corpus_id"))
    return (scored.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") <= k).drop("__rn"))


def _sides(queries: DataFrame, corpus: DataFrame, vec_col: str,
           id_col: str, key_col: str) -> tuple[DataFrame, DataFrame]:
    """Shared prep for the blocked kNN joins: per-side (id, key, vec,
    norm) frames — norms computed ONCE per row before the join, never
    per candidate pair."""
    qv = F.col(vec_col).cast("array<double>")
    qs = queries.select(F.col(id_col).alias("query_id"),
                        F.col(key_col).alias("__key"),
                        qv.alias("__qv"), _norm(qv).alias("__qn"))
    cs = corpus.select(F.col(id_col).alias("corpus_id"),
                       F.col(key_col).alias("__key"),
                       qv.alias("__cv"), _norm(qv).alias("__cn"))
    return qs, cs


def _topk(scored: DataFrame, k: int) -> DataFrame:
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(),
                                               F.col("corpus_id"))
    return (scored.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") <= k)
            .select("query_id", "corpus_id", "cos"))


def knn_join_blocked(queries: DataFrame, corpus: DataFrame, vec_col: str,
                     id_col: str, block_col: str, k: int = 5,
                     round_to: int = 4,
                     max_block: int | None = None) -> DataFrame:
    """Blocked k-NN join — candidates come from the query's block (a
    label, an IVF cluster id from ``ivf_assign``, or any stored
    partition key), so the pair generation is ONE equi-join on the
    block key instead of a cartesian: (query_id, corpus_id, cos),
    top-k within block.  This is the corpus-scale default: cost is
    Σ_b |Q_b|·|C_b| instead of |Q|·|C|, and the join co-partitions on
    the block key (cluster-assigned tables written partitioned by the
    key shuffle only the query side).  Exact within the block;
    cross-block neighbors are the accepted approximation (IVF
    semantics — raise recall by assigning multiple probe clusters per
    query upstream, e.g. via ``knn_join_lsh``).

    ``max_block`` drops corpus blocks above that size before the join
    (the Uid.List cardinality-cap discipline): one skewed block —
    a dominant label, an over-full cluster — otherwise owns a
    quadratic reducer.  Queries in a dropped block return no
    neighbors; re-cluster or raise the cap rather than leaving a
    hot block in the join."""
    qs, cs = _sides(queries, corpus, vec_col, id_col, block_col)
    if max_block is not None:
        ok = (cs.groupBy("__key")
              .agg(F.count(F.lit(1)).alias("__n"))
              .filter(F.col("__n") <= max_block).select("__key"))
        cs = cs.join(ok, "__key", "left_semi")
    scored = (qs.join(cs, "__key")
              .filter(F.col("query_id") != F.col("corpus_id"))
              .select("query_id", "corpus_id",
                      F.round(_dot(F.col("__qv"), F.col("__cv"))
                              / (F.col("__qn") * F.col("__cn")),
                              round_to).alias("cos")))
    return _topk(scored, k)


def _probe_expr(sig: Column, idxs: tuple[int, ...], bits: int) -> Column:
    """Signature with the bits at ``idxs`` flipped — built FLAT from the
    original column (one substring per position), never by nesting
    flip-expressions: nesting multiplies the expression tree per flip
    and blows past the JVM method-size limit at probe_radius ≥ 3."""
    parts = []
    for i in range(bits):
        c = F.substring(sig, i + 1, 1)
        if i in idxs:
            c = F.when(c == "1", F.lit("0")).otherwise(F.lit("1"))
        parts.append(c)
    return F.concat(*parts)


def knn_join_lsh(signed_queries: DataFrame, signed_corpus: DataFrame,
                 vec_col: str, id_col: str, sig_col: str = "sig",
                 bits: int = 8, k: int = 5, probe_radius: int = 1,
                 round_to: int = 4,
                 max_bucket: int | None = None) -> DataFrame:
    """Approximate k-NN join over STORED LSH signatures
    (sources.prepared.embedding_lsh): every query row probes the
    buckets within Hamming distance ≤ probe_radius of its own stored
    signature — probe keys are built row-wise by bit-flip expressions
    and exploded, candidates come from ONE equi-join probe-key =
    corpus-signature, and only candidates pay the exact cosine
    re-score.  Cost per query is ~(1+bits·radius)/2^bits of the
    corpus, never a cartesian.  (Reference analog: the global-index
    bucket probe before document evaluation —
    query-core ShardQueryLogic's index lookup discipline.)

    ``max_bucket`` drops corpus signature buckets holding more than
    that many rows before the probe join — the same skew guard as
    every other LSH path (a degenerate bucket matching most of the
    corpus turns the equi-join quadratic in one reducer and
    identifies nothing).  Set it at corpus scale."""
    probes = [F.col("__sig")]
    from itertools import combinations
    for r in range(1, probe_radius + 1):
        for idxs in combinations(range(bits), r):
            probes.append(_probe_expr(F.col("__sig"), idxs, bits))
    qv = F.col(vec_col).cast("array<double>")
    qs = (signed_queries.select(F.col(id_col).alias("query_id"),
                                F.col(sig_col).alias("__sig"),
                                qv.alias("__qv"), _norm(qv).alias("__qn"))
          .select("query_id", "__qv", "__qn",
                  F.explode(F.array(*probes)).alias("__key")))
    cs = signed_corpus.select(F.col(id_col).alias("corpus_id"),
                              F.col(sig_col).alias("__key"),
                              qv.alias("__cv"), _norm(qv).alias("__cn"))
    if max_bucket is not None:
        ok = (cs.groupBy("__key")
              .agg(F.count(F.lit(1)).alias("__n"))
              .filter(F.col("__n") <= max_bucket).select("__key"))
        cs = cs.join(ok, "__key", "left_semi")
    scored = (qs.join(cs, "__key")
              .filter(F.col("query_id") != F.col("corpus_id"))
              .select("query_id", "corpus_id",
                      F.round(_dot(F.col("__qv"), F.col("__cv"))
                              / (F.col("__qn") * F.col("__cn")),
                              round_to).alias("cos")))
    # no distinct needed: probe keys differ pairwise (each flips a
    # different index set), so a corpus signature matches ≤1 probe key
    # per query — no duplicate candidate pairs exist to drop.
    return _topk(scored, k)


def quantize_embeddings(df: DataFrame, vec_col: str) -> DataFrame:
    """Int8 scalar quantization: per-vector ``q_scale`` = max|x|/127 and
    ``q_vec`` = round-half-up(x/scale) — 4× smaller at-rest/in-memory
    footprint for the ANN corpus, the standard first compression rung
    before product quantization.  Rounding is ``floor(x/s + 0.5)`` so
    an external engine reproduces every code exactly (no banker's-
    rounding divergence).  Run at ingest; queries score against the
    dequantized values (``x * q_scale``)."""
    v = F.col(vec_col).cast("array<double>")
    amax = F.array_max(F.transform(v, lambda x: F.abs(x)))
    scale = F.when(amax > 0, amax / 127.0).otherwise(F.lit(1.0))
    # dim is small (≤ a few hundred), so inlining `scale` into the
    # per-element lambda (O(dim²) per row at ingest) is cheaper than a
    # materialization barrier would be worth
    return (df.withColumn("q_scale", scale)
            .withColumn("q_vec", F.transform(
                v, lambda x: F.floor(x / F.col("q_scale") + 0.5)
                .cast("int"))))


def quantized_cosine_topk(quantized: DataFrame, id_col: str,
                          query: list[float], k: int = 10,
                          round_to: int = 4) -> DataFrame:
    """Exact top-k over the DEQUANTIZED int8 corpus: (id, cos) — the
    memory-bandwidth-bound scan reads 1/4 the bytes of float32; recall
    loss is bounded by the per-vector quantization error."""
    q = F.array(*[F.lit(float(x)) for x in query])
    dq = F.transform(F.col("q_vec"),
                     lambda x: x.cast("double") * F.col("q_scale"))
    scored = quantized.select(
        F.col(id_col).alias("id"),
        F.round(cosine(dq, q), round_to).alias("cos"))
    return scored.orderBy(F.col("cos").desc(), F.col("id")).limit(k)


# ----------------------------------------------------------------- IVF

def ivf_centroids(df: DataFrame, vec_col: str, id_col: str,
                  n_centroids: int = 16, refine_iters: int = 2,
                  sample_cap: int = 4096) -> np.ndarray:
    """Deterministic IVF codebook: seed centroids from a fixed id-ordered
    sample, refined with a few Lloyd iterations driver-side (numpy) —
    the codebook is tiny; the DATA never leaves the cluster except this
    bounded sample."""
    sample = np.array(
        [r[0] for r in df.select(vec_col).orderBy(id_col)
         .limit(sample_cap).collect()], dtype=float)
    sample /= np.maximum(np.linalg.norm(sample, axis=1, keepdims=True), 1e-12)
    cents = sample[:n_centroids].copy()
    for _ in range(refine_iters):
        sims = sample @ cents.T
        assign = sims.argmax(axis=1)
        for c in range(n_centroids):
            members = sample[assign == c]
            if len(members):
                m = members.mean(axis=0)
                cents[c] = m / max(np.linalg.norm(m), 1e-12)
    return cents


def ivf_assign(df: DataFrame, vec_col: str, centroids: np.ndarray,
               out_col: str = "ivf_cluster") -> DataFrame:
    """Assign each vector to its nearest (cosine) centroid — vectorized
    pandas UDF (one Arrow batch matmul per partition chunk).  Run at
    ingest; partition/sort the table by the cluster id so query-time
    probes prune to the probed clusters' files."""
    from pyspark.sql.functions import pandas_udf

    cents = centroids  # captured; broadcast automatically with the task

    @pandas_udf("int")
    def assign(vecs: pd.Series) -> pd.Series:
        m = np.array(vecs.tolist(), dtype=float)
        m /= np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
        return pd.Series((m @ cents.T).argmax(axis=1).astype("int32"))

    return df.withColumn(out_col, assign(F.col(vec_col).cast("array<double>")))


def ivf_cosine_topk(assigned: DataFrame, vec_col: str, id_col: str,
                    centroids: np.ndarray, query: list[float], k: int = 10,
                    n_probe: int = 4, cluster_col: str = "ivf_cluster",
                    round_to: int = 4) -> DataFrame:
    """IVF query: rank centroids against the query driver-side, scan
    only the ``n_probe`` nearest clusters, exact cosine within — scans
    ~n_probe/n_centroids of the corpus."""
    from pyspark.sql import functions as F
    q = np.asarray(query, dtype=float)
    qn = q / max(np.linalg.norm(q), 1e-12)
    order = (centroids @ qn).argsort()[::-1][:n_probe]
    probes = [int(c) for c in order]
    qcol = F.array(*[F.lit(float(x)) for x in query])
    cand = assigned.filter(F.col(cluster_col).isin(probes))
    scored = cand.select(
        F.col(id_col).alias("id"),
        F.round(cosine(F.col(vec_col).cast("array<double>"), qcol),
                round_to).alias("cos"))
    return scored.orderBy(F.col("cos").desc(), F.col("id")).limit(k)


# ------------------------------------------------- product quantization

def pq_codebooks(df: DataFrame, vec_col: str, id_col: str,
                 n_subspaces: int = 16, n_centroids: int = 16,
                 refine_iters: int = 3,
                 sample_cap: int = 4096) -> np.ndarray:
    """Product-quantization codebooks (Jégou et al. '11): the vector
    space splits into ``n_subspaces`` contiguous sub-vectors, each with
    its own ``n_centroids``-entry codebook learned by a few Lloyd
    iterations over a fixed id-ordered sample (driver-side numpy — the
    codebook is tiny; the data never leaves the cluster except this
    bounded sample, the same discipline as ``ivf_centroids``).
    Returns array [n_subspaces, n_centroids, sub_dim], L2-normalized
    input rows so PQ dot products approximate cosine."""
    sample = np.array(
        [r[0] for r in df.select(vec_col).orderBy(id_col)
         .limit(sample_cap).collect()], dtype=float)
    sample /= np.maximum(np.linalg.norm(sample, axis=1, keepdims=True), 1e-12)
    dim = sample.shape[1]
    if dim % n_subspaces:
        raise ValueError(f"dim {dim} not divisible by {n_subspaces}")
    sub = dim // n_subspaces
    books = np.zeros((n_subspaces, n_centroids, sub))
    for j in range(n_subspaces):
        s = sample[:, j * sub:(j + 1) * sub]
        cents = s[:n_centroids].copy()
        for _ in range(refine_iters):
            d2 = ((s[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
            assign = d2.argmin(axis=1)
            for c in range(n_centroids):
                members = s[assign == c]
                if len(members):
                    cents[c] = members.mean(axis=0)
        books[j] = cents
    return books


def pq_encode(df: DataFrame, vec_col: str, id_col: str,
              codebooks: np.ndarray,
              out_col: str = "pq_code") -> DataFrame:
    """Encode each (L2-normalized) vector as ``n_subspaces`` small
    codes — nearest centroid per subspace, vectorized per Arrow batch.
    At dim=64, m=8 the at-rest footprint is 8 bytes/vector vs 256
    (float32): a 32× compression, the memory rung below int8.  Run at
    ingest; store the code column clustered so ADC scans are
    sequential."""
    from pyspark.sql.functions import pandas_udf

    books = codebooks
    m, kc, sub = books.shape

    @pandas_udf("array<int>")
    def encode(vecs: pd.Series) -> pd.Series:
        x = np.array(vecs.tolist(), dtype=float)
        x /= np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
        codes = np.empty((len(x), m), dtype=np.int32)
        for j in range(m):
            s = x[:, j * sub:(j + 1) * sub]
            d2 = ((s[:, None, :] - books[j][None, :, :]) ** 2).sum(axis=2)
            codes[:, j] = d2.argmin(axis=1)
        return pd.Series(list(codes))

    return df.withColumn(out_col,
                         encode(F.col(vec_col).cast("array<double>")))


def pq_topk(encoded: DataFrame, id_col: str, codebooks: np.ndarray,
            query: list[float], k: int = 10, code_col: str = "pq_code",
            round_to: int = 4) -> DataFrame:
    """Approximate top-k by asymmetric distance computation (ADC): the
    query's dot product with every centroid is a driver-side
    [n_subspaces × n_centroids] lookup table, inlined as array
    literals; each row's score is m ``element_at`` fetches + a sum —
    pure JVM whole-stage-codegen, no vector math in the scan.  Score ≈
    cosine(query, vector) for normalized corpora."""
    q = np.asarray(query, dtype=float)
    qn = q / max(np.linalg.norm(q), 1e-12)
    m, kc, sub = codebooks.shape
    lut = np.einsum("mkd,md->mk",
                    codebooks, qn.reshape(m, sub))
    score = None
    for j in range(m):
        tbl = F.array(*[F.lit(round(float(v), 6)) for v in lut[j]])
        term = F.element_at(tbl, F.element_at(F.col(code_col), j + 1) + 1)
        score = term if score is None else score + term
    return (encoded.select(F.col(id_col).alias("id"),
                           F.round(score, round_to).alias("score"))
            .orderBy(F.col("score").desc(), F.col("id")).limit(k))


def pq_topk_rerank(encoded: DataFrame, raw: DataFrame, vec_col: str,
                   id_col: str, codebooks: np.ndarray,
                   query: list[float], k: int = 10, shortlist: int = 100,
                   code_col: str = "pq_code",
                   round_to: int = 4) -> DataFrame:
    """PQ with exact re-ranking — the production ANN shape: the ADC
    scan over the compressed codes produces a ``shortlist`` of
    candidates (bandwidth-bound, 32× fewer bytes), and ONLY those rows
    touch the float table for an exact cosine re-score (a semi-join
    that prunes the heavy scan to `shortlist` rows).  Recall ≈ exact
    for shortlist ≫ k; compute ≈ compressed scan + k-sized join."""
    cand = pq_topk(encoded, id_col, codebooks, query, k=shortlist,
                   code_col=code_col, round_to=6).select("id")
    pruned = raw.join(cand, raw[id_col] == cand["id"], "left_semi")
    return cosine_topk(pruned, vec_col, id_col, query, k=k,
                       round_to=round_to)


def kmeans_assign_expr(vec: Column, centroids) -> Column:
    """Nearest-centroid (cosine) assignment as a pure JVM expression:
    one ``cosine`` column per centroid (codegen'd fold over the array,
    no Python), argmax with FIRST-index tie-break via
    ``array_position(arr, array_max(arr))``.  The codebook rides into
    the plan as literals — broadcast with the task binary, no join.
    ``try_divide`` keeps a zero-norm (degenerate) vector a NULL
    assignment instead of an ANSI-mode divide-by-zero error; callers
    drop NULL clusters.

    Construction economics (r12): each centroid's literal array is
    built ONCE (the previous form built it twice — dot and norm — at
    k·dim py4j literal calls each, ~1 s of pure driver build time for
    k=8, dim=64), the centroid norm is a Python-computed CONSTANT
    (same left-to-right double fold then IEEE sqrt as the JVM
    ``aggregate``+``sqrt``, so the product norm_v·norm_c is
    bit-identical — and the JVM stops re-folding a 64-element constant
    per row), and the data-vector norm is one shared subtree."""
    import math
    nv = _norm(vec)
    cos = []
    for c in centroids:
        vals = [float(x) for x in c]
        acc = 0.0
        for x in vals:                # F.aggregate's fold order exactly
            acc += x * x
        cos.append(F.try_divide(_dot(vec, F.lit(vals)),
                                nv * F.lit(math.sqrt(acc))))
    arr = F.array(*cos)
    return (F.array_position(arr, F.array_max(arr)) - 1).cast("int")


def kmeans_step(df: DataFrame, vec_col: str, centroids) -> DataFrame:
    """One distributed Lloyd iteration over the FULL corpus:
    (cluster, dim, centroid_val, n_members).

    Assignment is ``kmeans_assign_expr`` (JVM-side, no UDF); the
    centroid update is ``posexplode`` to (cluster, dim, val) skinny
    rows and a single ``groupBy(cluster, dim).avg`` — partial (map-side)
    aggregation collapses every task's output to at most k*dim rows
    before the one shuffle, so a 100 TB corpus moves k*dim*tasks tiny
    rows per iteration, never the vectors.  Contrast
    ``ivf_centroids``, which trains on a bounded driver-side sample:
    this path trains on everything and never collects data rows.
    """
    v = F.col(vec_col).cast("array<double>")
    # Two projections on purpose: `select(assign, posexplode(v))` parks
    # the assignment expression in the Project ABOVE the Generate, so
    # the k cosine folds re-run once per EXPLODED row (dim× the work —
    # measured 6.4s vs 0.15s at sf0.1).  Evaluating it in a child
    # projection runs it once per input row; Catalyst has no rule that
    # collapses a Project through a Generate, so the split is stable.
    pre = df.select(kmeans_assign_expr(v, centroids).alias("cluster"),
                    v.alias("__v"))
    # a NULL or zero-norm vector yields 0/0 = NULL cosines -> NULL
    # cluster; drop such degenerate rows instead of crashing the
    # driver-side codebook rebuild on a None key
    pre = pre.filter(F.col("cluster").isNotNull())
    assigned = pre.select("cluster", F.posexplode("__v").alias("dim", "val"))
    return (assigned.groupBy("cluster", "dim")
            .agg(F.avg("val").alias("centroid_val"),
                 F.count(F.lit(1)).alias("n_members")))


def kmeans_fit(df: DataFrame, vec_col: str, id_col: str, k: int = 8,
               iters: int = 2) -> list[list[float]]:
    """Distributed k-means (Lloyd's): seeds are the first ``k`` vectors
    in id order (deterministic), then ``iters`` full-corpus
    ``kmeans_step`` rounds.  Per round only k*dim aggregated doubles
    come back to the driver (the codebook — same bounded-metadata
    footprint as the reference's metadata-table reads); the next
    round's assignment re-reads the source, so the lineage stays flat
    and no checkpoint is needed.  Empty clusters keep their previous
    centroid (standard Lloyd's fallback)."""
    seeds = [list(map(float, r[0])) for r in
             df.select(F.col(vec_col).cast("array<double>"))
             .orderBy(id_col).limit(k).collect()]
    cents = seeds
    for _ in range(iters):
        rows = kmeans_step(df, vec_col, cents).collect()
        nxt = [list(c) for c in cents]
        by_cluster: dict[int, dict[int, float]] = {}
        for r in rows:
            by_cluster.setdefault(r.cluster, {})[r.dim] = r.centroid_val
        for c, dims in by_cluster.items():
            nxt[c] = [dims[d] for d in range(len(dims))]
        cents = nxt
    return cents
