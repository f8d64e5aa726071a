"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Scale notes (100 TB design point):
- exact dedup is a single hash-aggregate (map-side partial agg, one shuffle
  on the 128-bit content hash — uniformly distributed, no skew).
- MinHash signatures are computed in an Arrow-batched pandas UDF (numpy,
  vectorized over the batch); banding turns near-dup search into an
  equi-join on (band_id, band_hash) — shuffle keys are hashes, so skew only
  arises from true duplicate explosions. Those are bounded by an
  exact-dedup pre-pass: identical texts collapse to one representative
  before banding, so a 1k-copy cluster contributes O(1) bucket rows, not
  O(10^6) candidate pairs.
- candidate pairs are verified with EXACT char-shingle Jaccard (set
  arithmetic over the normalized text) before reporting — the LSH banding
  only proposes, never decides.

EAGER + PERSISTED contract: every pair-returning operator in this module
(``minhash_lsh_pairs``, ``ngram_jaccard_pairs``, ``embedding_near_dups``,
``simhash_pairs`` — and ``graphops.dedup_clusters``) runs at CALL time
and returns its result persisted (``_finalize``): candidate-generation
intermediates are released before returning, and re-evaluating the
result never replays them. The caller owns the returned frame — call
``unpersist()`` once it is consumed/materialized elsewhere, or repeated
operator calls in a long-lived session accumulate result blocks (the
bench loop and tests do this; see ADVICE r3).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, DoubleType, LongType

__all__ = [
    "exact_dedup",
    "minhash_signatures",
    "minhash_lsh_pairs",
    "simhash",
    "ngram_jaccard_pairs",
    "simhash_pairs",
    "embedding_near_dups",
    "remove_repeated_spans",
    "semantic_dedup",
]

_MERSENNE = (1 << 61) - 1


def _finalize(result: DataFrame, *intermediates: DataFrame) -> DataFrame:
    """Materialize ``result`` (persisted — pair sets are small) and release
    the persisted intermediates that fed it. Without this, repeated
    operator calls in a long-lived session accumulate MEMORY_AND_DISK
    blocks until LRU pressure evicts them — which also taxes *unrelated*
    queries that run later in the same session (bench in-sequence effect).
    The result stays persisted (callers may ``unpersist()`` when done);
    re-evaluating it never re-runs the candidate-generation stages."""
    from pyspark import StorageLevel

    result = result.persist(StorageLevel.MEMORY_AND_DISK)
    result.count()
    for df in intermediates:
        df.unpersist()
    return result


def exact_dedup(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Hash-groupBy exact dedup: one row per distinct normalized text with
    the number of duplicates and the kept (minimum) id."""
    norm = F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ")
    return (
        df.withColumn("text_hash", F.md5(norm))
        .groupBy("text_hash")
        .agg(
            F.count(F.lit(1)).alias("n_dups"),
            F.min(F.col(id_col)).alias("keep_id"),
        )
    )


_SHINGLE_BASE = np.uint64(1099511628211)  # FNV-1a prime as polynomial base


def _shingle_hashes(text: str, k: int = 5) -> np.ndarray:
    """Deterministic k-byte-gram hashes of the normalized text, fully
    vectorized: a sliding window over the utf-8 bytes dotted with powers of
    a 64-bit base (uint64 wraparound arithmetic — modular, deterministic
    across platforms, no per-shingle Python call). These only PROPOSE
    near-dup candidates; exact shingle Jaccard decides."""
    s = " ".join((text or "").lower().split())
    if len(s) < k:
        s = s.ljust(k, "\0")
    data = np.frombuffer(s.encode("utf-8"), dtype=np.uint8)
    if len(data) < k:  # defensive: multibyte edge
        data = np.pad(data, (0, k - len(data)))
    win = np.lib.stride_tricks.sliding_window_view(data, k).astype(np.uint64)
    powers = _SHINGLE_BASE ** np.arange(k, dtype=np.uint64)
    return (win * powers).sum(axis=1)


# splitmix64 avalanche constants (public-domain constants from Steele et
# al.'s SplitMix64 finalizer — spread the polynomial hash's low-entropy
# high bits of short tokens across all 64 bits, which SimHash's per-bit
# votes require)
_MIX_C1 = np.uint64(0xBF58476D1CE4E5B9)
_MIX_C2 = np.uint64(0x94D049BB133111EB)


def _token_hashes_flat(flat_tokens: list[str]) -> np.ndarray:
    """ENGINE-OWNED deterministic 64-bit token hash, vectorized over a
    flat token list (one numpy pass per Arrow batch, no per-token Python
    hashing).

    Definition (also implemented independently, scalar, by
    tools/pin_simhash_oracle.py and the cross-check test — keep in sync):

        h0(t) = sum_j bytes(t)[j] * B^(L-1-j)   mod 2^64, B = FNV prime
        h(t)  = splitmix64_mix(h0)              (xor-shift-multiply x3)

    Owning the hash (instead of pandas' fixed-key SipHash) makes SimHash
    output invariant to pandas versions — the pinned VALUES oracles are
    permanent, not per-library-build.

    Vectorization: tokens are NUL-joined into one utf-8 blob (tokens
    cannot contain NUL — the tokenizer treats NUL as whitespace), byte
    exponents come from a shared power table, and per-token sums are one
    ``np.add.reduceat``. utf-8 encodes U+0000 only as 0x00, so separator
    detection is exact."""
    if not flat_tokens:
        return np.empty(0, dtype=np.uint64)
    blob = "\x00".join(flat_tokens).encode("utf-8")
    data = np.frombuffer(blob, dtype=np.uint8)
    seps = np.flatnonzero(data == 0)
    starts = np.concatenate(([0], seps + 1))
    ends = np.concatenate((seps, [len(data)]))
    lens = ends - starts  # utf-8 byte length per token, all >= 1
    idx = np.flatnonzero(data != 0)  # non-separator byte positions
    exp = np.repeat(ends, lens) - 1 - idx  # per-byte exponent, 0..L-1
    max_len = int(lens.max())
    pw = np.empty(max_len, dtype=np.uint64)
    pw[0] = 1
    if max_len > 1:
        np.multiply.accumulate(
            np.full(max_len - 1, _SHINGLE_BASE, dtype=np.uint64), out=pw[1:]
        )
    contrib = data[idx].astype(np.uint64) * pw[exp]
    bounds = np.concatenate(([0], np.cumsum(lens)[:-1]))
    h = np.add.reduceat(contrib, bounds).astype(np.uint64)
    h ^= h >> np.uint64(30)
    h *= _MIX_C1
    h ^= h >> np.uint64(27)
    h *= _MIX_C2
    h ^= h >> np.uint64(31)
    return h


def _perm_params(num_perm: int, seed: int = 1) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.RandomState(seed)
    a = rng.randint(1, _MERSENNE, size=num_perm, dtype=np.uint64)
    b = rng.randint(0, _MERSENNE, size=num_perm, dtype=np.uint64)
    return a, b


def minhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_perm: int = 64,
    shingle_k: int = 5,
    seed: int = 1,
) -> DataFrame:
    """(id, signature array<long>) via universal hashing min over char
    shingles. Arrow-batched pandas UDF; O(batch x shingles x perms) numpy."""
    a_params, b_params = _perm_params(num_perm, seed)

    @F.pandas_udf(ArrayType(LongType()))
    def sig_udf(texts: pd.Series) -> pd.Series:
        # per-perm mixing (a*x + b) mod M with uint64 wraparound before
        # the Mersenne mod: NOT textbook universal hashing, but a
        # deterministic 64-bit mix is all MinHash banding needs here —
        # reported pairs are decided by exact Jaccard, not the estimate
        # (test_minhash_estimate_tracks_exact pins the estimate error).
        # Vectorized ACROSS the batch (r6): shingle arrays concatenate
        # into one slab, the (perm x shingle) mix runs on bounded slabs,
        # and per-doc minima are segmented ``minimum.reduceat`` — the
        # per-document numpy-call overhead dominated the old per-doc
        # loop. Identical integer arithmetic, identical signatures.
        a_u = a_params
        b_u = b_params[:, None]
        M = np.uint64(_MERSENNE)
        shs = [_shingle_hashes(t, shingle_k) for t in texts]
        n = len(shs)
        if n == 0:
            return pd.Series([])
        out = np.empty((n, num_perm), dtype=np.int64)
        # slab = a run of docs with ~<=1M total shingles: bounds the
        # (num_perm x shingles) mix matrix at ~512 MB/64perm -> chunked
        SLAB = 1 << 20
        i = 0
        while i < n:
            j, tot = i, 0
            while j < n and (tot == 0 or tot + len(shs[j]) <= SLAB):
                tot += len(shs[j])
                j += 1
            flat = np.concatenate(shs[i:j])
            lens = np.fromiter(
                (len(s) for s in shs[i:j]), dtype=np.int64, count=j - i
            )
            starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
            vals = (np.multiply.outer(a_u, flat) + b_u) % M  # (perm, tot)
            mins = np.minimum.reduceat(vals, starts, axis=1)  # (perm, docs)
            out[i:j] = mins.T.astype(np.int64)
            i = j
        return pd.Series(list(out))

    return df.select(
        F.col(id_col).alias("id"), sig_udf(F.col(text_col)).alias("signature")
    )


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 5,
    jaccard_threshold: float = 0.7,
) -> DataFrame:
    """Near-duplicate pairs: exact-dedup pre-pass -> shingle -> minhash ->
    band/bucket equi-join -> EXACT shingle-Jaccard verify.

    Returns (id_a, id_b, jaccard) over exact-duplicate *representatives*
    (the min id per identical normalized text): identical copies are
    ``exact_dedup``'s job, and collapsing them first bounds the same-bucket
    candidate blowup on duplicate-heavy corpora (a 1k-copy cluster adds one
    bucket row, not ~10^6 candidate pairs).

    The signature/banding stage only *proposes* candidates; every reported
    pair's similarity is the exact distinct-char-k-gram Jaccard of the
    whitespace-normalized lowercased texts, so estimate bias near the
    threshold (64-perm sd ~0.06) cannot misclassify a pair.
    """
    from pyspark import StorageLevel

    rows_per_band = num_perm // bands
    norm = F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ")
    base = df.select(F.col(id_col).alias("id"), norm.alias("norm"))
    # exact-dedup pre-pass: one representative per distinct normalized text.
    # Persisted: the plan reads reps 4x (both banding sides + both
    # text-fetch joins) — without a persist each read is a full input
    # re-scan + re-aggregation (verified via .explain: 4 parquet scans).
    reps = (
        base.groupBy(F.md5(F.col("norm")).alias("_h"))
        .agg(F.min("id").alias("id"), F.min("norm").alias("norm"))
        .drop("_h")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    sigs = minhash_signatures(reps, id_col="id", text_col="norm",
                              num_perm=num_perm, shingle_k=shingle_k)
    banded = sigs.select(
        "id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(
                            F.slice(
                                F.col("signature"),
                                b * rows_per_band + 1,
                                rows_per_band,
                            ).cast("string")
                        ).alias("bucket"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("id", F.col("bb.band"), F.col("bb.bucket")).persist(
        StorageLevel.MEMORY_AND_DISK
    )  # self-join: without this the signature UDF runs once PER SIDE

    left = banded.alias("l")
    right = banded.alias("r")
    cand = (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bucket") == F.col("r.bucket"))
            & (F.col("l.id") < F.col("r.id")),
        )
        .select(F.col("l.id").alias("id_a"), F.col("r.id").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )

    @F.pandas_udf(DoubleType())
    def exact_jaccard(na: pd.Series, nb: pd.Series) -> pd.Series:
        k = shingle_k
        out = np.empty(len(na), dtype=np.float64)
        for i, (x, y) in enumerate(zip(na, nb)):
            gx = {x[j : j + k] for j in range(max(len(x) - k + 1, 1))}
            gy = {y[j : j + k] for j in range(max(len(y) - k + 1, 1))}
            inter = len(gx & gy)
            out[i] = inter / (len(gx) + len(gy) - inter)
        return pd.Series(out)

    # candidate set << corpus: fetch texts for candidates only (two id
    # equi-joins; AQE broadcasts the candidate side when it is small)
    with_texts = (
        cand.join(reps.select(F.col("id").alias("id_a"),
                              F.col("norm").alias("norm_a")), "id_a")
        .join(reps.select(F.col("id").alias("id_b"),
                          F.col("norm").alias("norm_b")), "id_b")
    )
    result = (
        with_texts.withColumn(
            "jaccard", exact_jaccard(F.col("norm_a"), F.col("norm_b"))
        )
        .filter(F.col("jaccard") >= jaccard_threshold)
        .select("id_a", "id_b", "jaccard")
    )
    return _finalize(result, reps, banded)


def simhash(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """64-bit SimHash over whitespace tokens (64-bit hash per token,
    bitwise majority vote) in one narrow pandas-UDF pass.

    Token hashing is batch-vectorized with the ENGINE-OWNED hash
    (``_token_hashes_flat``: polynomial over utf-8 bytes + splitmix64
    avalanche — one numpy pass over the whole Arrow batch's tokens), so
    output is deterministic across platforms AND library versions (the
    r3 ``pd.util.hash_array`` path was stable only per pandas build).
    NUL characters are treated as whitespace by the tokenizer. Per-doc
    bit votes are segment sums (``np.add.reduceat``); no per-token or
    per-document Python-level hashing remains. Duplicate tokens vote
    once each (multiset semantics, as in Charikar's original formulation
    over weighted features)."""

    bit_positions = np.arange(64, dtype=np.uint64)

    @F.pandas_udf(LongType())
    def simhash_udf(texts: pd.Series) -> pd.Series:
        toks_per_row = [
            (t or "").lower().replace("\x00", " ").split() for t in texts
        ]
        counts = np.array([len(r) for r in toks_per_row], dtype=np.int64)
        out = np.zeros(len(texts), dtype=np.int64)
        total = int(counts.sum())
        if total == 0:
            return pd.Series(out)
        flat: list[str] = []
        for row in toks_per_row:
            flat.extend(row)
        hashes = _token_hashes_flat(flat)  # uint64, vectorized
        bits = ((hashes[:, None] >> bit_positions) & np.uint64(1)).astype(
            np.int64
        )  # (total_tokens, 64)
        nz = counts > 0
        cnz = counts[nz]
        offsets = np.concatenate(([0], np.cumsum(cnz)[:-1]))
        votes = np.add.reduceat(bits, offsets, axis=0)  # (docs_nz, 64)
        maj = (votes * 2 >= cnz[:, None]).astype(np.uint64)
        vals = (maj << bit_positions[None, :]).sum(axis=1)
        out[nz] = vals.view(np.int64)
        return pd.Series(out)

    return df.select(
        F.col(id_col).alias("id"), simhash_udf(F.col(text_col)).alias("simhash")
    )


def _ngram_prefix_candidates(grams: DataFrame, threshold: float) -> DataFrame:
    """EXACT prefix-filtered candidate pairs over a distinct (id, gram)
    table (Bayardo et al., "Scaling Up All Pairs Similarity Search",
    WWW'07; Xiao et al. PPJoin Lemma 1): order grams by ascending global
    document frequency (ties by gram value — one total order shared by
    every doc) and index, per doc, only the first
    ``|d| - ceil(t*|d|) + 1`` grams. A pair with Jaccard >= t has
    overlap >= ceil(t*max(|A|,|B|)), so its prefixes MUST share a gram —
    candidate generation over prefixes alone loses nothing. The payoff
    is the posting-list bound: a stop-gram shared by k docs ranks LAST
    in the frequency order and leaves every non-trivial doc's prefix, so
    it no longer contributes ~k^2/2 join rows on one skewed key
    (VERDICT r5 #1)."""
    from pyspark.sql import Window

    sizes = grams.groupBy("id").agg(F.count(F.lit(1)).alias("n_grams"))
    gram_df = grams.groupBy("gram").agg(F.count(F.lit(1)).alias("gram_df"))
    w = Window.partitionBy("id").orderBy("gram_df", "gram")
    prefix = (
        grams.join(gram_df, "gram")
        .withColumn("_rn", F.row_number().over(w))
        .join(sizes, "id")
        .filter(
            F.col("_rn")
            <= F.col("n_grams")
            - F.ceil(F.lit(float(threshold)) * F.col("n_grams"))
            + 1
        )
        .select("id", "gram")
    )
    a, b = prefix.alias("a"), prefix.alias("b")
    return (
        a.join(
            b,
            (F.col("a.gram") == F.col("b.gram"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.5,
    max_docs: int | None = None,
) -> DataFrame:
    """Exact word-n-gram Jaccard pairs, prefix-filtered (r6).

    The r5 form joined the FULL inverted index with itself, so a common
    n-gram shared by k documents emitted ~k^2/2 candidate rows on one
    skewed key — a scale-killer on natural text (VERDICT r5 #1).
    Candidates now come from :func:`_ngram_prefix_candidates` (exact
    prefix filtering — no recall loss by the PPJoin prefix lemma), and
    every candidate is verified against the full distinct-gram sets:
    ``jaccard = isec / (|A| + |B| - isec)`` — the same integer-exact
    ratio as before (int64 set intersection + one IEEE double division),
    so reported pairs and values are identical to the unfiltered plan.
    The gram-set fetch is restricted to candidate ids (left-semi) before
    the ``collect_list``, so full gram sets materialize only for docs
    that survived the prefix filter."""
    from pyspark import StorageLevel

    base = df.select(F.col(id_col).alias("id"), F.col(text_col).alias("t"))
    if max_docs:
        base = base.limit(max_docs)
    words = F.split(F.lower(F.trim(F.col("t"))), r"\s+")
    grams = base.select(
        "id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.greatest(F.size(words) - n, F.lit(0))),
                lambda i: F.xxhash64(
                    F.concat_ws(" ", F.slice(words, i + 1, n))
                ),
            )
        ).alias("gram"),
    ).dropDuplicates(["id", "gram"]).persist(
        StorageLevel.MEMORY_AND_DISK
    )  # read by the df/size aggregates, the prefix join and the verify
    cand = _ngram_prefix_candidates(grams, threshold)
    cand_ids = (
        cand.select(F.col("id_a").alias("id"))
        .unionByName(cand.select(F.col("id_b").alias("id")))
        .distinct()
    )
    docsets = (
        grams.join(cand_ids, "id", "left_semi")
        .groupBy("id")
        .agg(F.sort_array(F.collect_list("gram")).alias("grams"))
    )

    @F.pandas_udf(DoubleType())
    def exact_gram_jaccard(ga: pd.Series, gb: pd.Series) -> pd.Series:
        out = np.empty(len(ga), dtype=np.float64)
        for i, (x, y) in enumerate(zip(ga, gb)):
            x = np.asarray(x, dtype=np.int64)
            y = np.asarray(y, dtype=np.int64)
            isec = np.intersect1d(x, y, assume_unique=True).shape[0]
            out[i] = isec / (x.shape[0] + y.shape[0] - isec)
        return pd.Series(out)

    result = (
        cand.join(
            docsets.select(F.col("id").alias("id_a"), F.col("grams").alias("ga")),
            "id_a",
        )
        .join(
            docsets.select(F.col("id").alias("id_b"), F.col("grams").alias("gb")),
            "id_b",
        )
        .withColumn("jaccard", exact_gram_jaccard(F.col("ga"), F.col("gb")))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
    return _finalize(result, grams)


def embedding_near_dups(
    embeddings: DataFrame,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 8,
    n_tables: int = 12,
    dim: int | None = None,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: multi-table sign-LSH
    self-join proposes candidates, exact cosine verifies. Returns
    (id_a, id_b, sim) with sim >= threshold. The scale path for
    embedding-level dedup of a training corpus.

    Sizing: expected bucket width is N / 2^n_planes per table, and the
    candidate self-join is quadratic in bucket width — pick
    ``n_planes ~ ceil(log2(N / target_bucket))`` (e.g. 17 planes for 10^9
    vectors at ~8k-row buckets); recall at a given threshold is recovered
    by raising ``n_tables`` (union of independent probes). ``dim`` may be
    omitted: hyperplanes are derived lazily inside the Arrow UDF from the
    batch's vector length (deterministic given the seed), so omitting it
    never costs a driver-side job.
    """
    from .knn import cosine_sim_arrow, _hyperplanes
    import numpy as np

    weights = (1 << np.arange(n_planes)).astype(np.int64)
    plane_cache: dict[int, np.ndarray] = {}
    if dim is not None:
        plane_cache[dim] = np.stack(
            [_hyperplanes(dim, n_planes, 7 + t) for t in range(n_tables)]
        )

    def _planes_for(d: int) -> np.ndarray:
        if d not in plane_cache:
            plane_cache[d] = np.stack(
                [_hyperplanes(d, n_planes, 7 + t) for t in range(n_tables)]
            )
        return plane_cache[d]

    @F.pandas_udf(ArrayType(LongType()))
    def buckets_udf(vecs: pd.Series) -> pd.Series:
        mat = np.stack(vecs.to_numpy())
        all_planes = _planes_for(mat.shape[1])
        codes = np.empty((len(mat), n_tables), dtype=np.int64)
        for t in range(n_tables):
            bits = (mat @ all_planes[t]) > 0
            codes[:, t] = bits @ weights + (t << n_planes)
        return pd.Series(list(codes))

    from pyspark import StorageLevel

    b = embeddings.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).cast("array<double>").alias("vec"),
        F.explode(buckets_udf(F.col(vec_col))).alias("bucket"),
    ).persist(StorageLevel.MEMORY_AND_DISK)  # self-join reads it twice
    left, right = b.alias("l"), b.alias("r")
    cand = (
        left.join(
            right,
            (F.col("l.bucket") == F.col("r.bucket"))
            & (F.col("l.id") < F.col("r.id")),
        )
        .select(
            F.col("l.id").alias("id_a"),
            F.col("r.id").alias("id_b"),
            F.col("l.vec").alias("va"),
            F.col("r.vec").alias("vb"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    result = (
        cand.withColumn("sim", cosine_sim_arrow(F.col("va"), F.col("vb")))
        .filter(F.col("sim") >= threshold)
        .select("id_a", "id_b", "sim")
    )
    return _finalize(result, b)


def simhash_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
) -> DataFrame:
    """Near-duplicate pairs by SimHash banding with exact Hamming verify.

    Pigeonhole banding: the 64-bit simhash is split into ``max_hamming+1``
    bands, so any pair within ``max_hamming`` bit flips shares at least
    one band verbatim — candidates come from an equi-join on (band,
    chunk), verified with an exact popcount of the XOR. Recall is exactly
    1.0 at the stated radius (a guarantee LSH banding only approximates).

    Same scale shape as ``minhash_lsh_pairs``: an exact-dedup pre-pass
    collapses identical texts (bounding megacluster blowup), one narrow
    UDF pass computes the hash, and the join shuffles on hash-derived
    keys. Returns (id_a, id_b, hamming).
    """
    from pyspark import StorageLevel

    n_bands = max_hamming + 1
    band_bits = 64 // n_bands
    norm = F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ")
    base = df.select(F.col(id_col).alias("id"), norm.alias("norm"))
    reps = (
        base.groupBy(F.md5(F.col("norm")).alias("_h"))
        .agg(F.min("id").alias("id"), F.min("norm").alias("norm"))
        .drop("_h")
    )
    sh = simhash(reps, id_col="id", text_col="norm").persist(
        StorageLevel.MEMORY_AND_DISK
    )  # self-join: avoid recomputing the hash per side

    def chunk(b: int):
        width = band_bits if b < n_bands - 1 else 64 - band_bits * (n_bands - 1)
        mask = (1 << width) - 1
        return (
            F.shiftrightunsigned(F.col("simhash"), b * band_bits)
            .bitwiseAND(F.lit(mask))
        )

    banded = sh.select(
        "id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(b).alias("band"), chunk(b).alias("chunk"))
                    for b in range(n_bands)
                ]
            )
        ).alias("bc"),
    ).select("id", "simhash", F.col("bc.band"), F.col("bc.chunk"))
    left, right = banded.alias("l"), banded.alias("r")
    cand = (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.chunk") == F.col("r.chunk"))
            & (F.col("l.id") < F.col("r.id")),
        )
        .select(
            F.col("l.id").alias("id_a"),
            F.col("r.id").alias("id_b"),
            F.col("l.simhash").alias("sh_a"),
            F.col("r.simhash").alias("sh_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    hamming = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    result = (
        cand.withColumn("hamming", hamming)
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )
    return _finalize(result, sh)


def remove_repeated_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 50,
    min_count: int = 2,
) -> DataFrame:
    """Exact-substring dedup at span granularity (the technique of Lee
    et al. 2022, "Deduplicating Training Data Makes Language Models
    Better", re-expressed on word-n-gram shards instead of a suffix
    array): any word ``n``-gram occurring >= ``min_count`` times in the
    CORPUS (across documents or within one) marks its ``n``-token span
    for removal in every occurrence; overlapping marked spans union.
    Returns (id, text_clean, n_tokens, n_removed_tokens) with row
    parity (an entirely-repeated doc keeps its row, empty).

    Compared to document/line-level dedup this removes the long
    verbatim QUOTES and templated passages that survive both. The
    suffix-array original removes repeats of length >= n at CHARACTER
    resolution; the gram formulation removes the same spans whenever
    the repeat is at least n whole words (shorter repeats stay — by
    design, they are below the dedup threshold anyway).

    Scale shape — pure Catalyst, no UDFs: one explode over per-doc
    n-gram hashes (narrow transform like decontam's), a global
    hash-aggregate on the uniformly distributed gram key (map-side
    combined) filtered to repeated grams — a SMALL set by definition —
    then the removal join on the gram hash and one per-doc reassembly
    shuffle. Per doc, the sorted repeated-start list is merged into
    DISJOINT covered intervals in one ``aggregate`` pass and the kept
    text reassembled from the gaps between intervals — O(starts +
    tokens) per doc, so a fully-templated document (most grams
    repeated — the COMMON case in the boilerplate corpora this operator
    exists for) costs one linear pass, not the O(tokens x starts)
    per-token ``exists`` scan of the r4 version (VERDICT r4 #2: a
    100k-token boilerplate doc was ~10^10 comparisons in one task).
    A gram-hash collision (p ~ distinct_grams/2^64) could clip an
    innocent span; the driver oracle joins on gram STRINGS and would
    catch it at test scale."""
    words = F.filter(
        F.split(F.trim(F.col(text_col)), r"\s+"), lambda x: x != ""
    )
    base = df.select(F.col(id_col).alias("id"), words.alias("w"))
    grams = base.filter(F.size("w") >= n).select(
        "id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.size("w") - n),
                lambda i: F.xxhash64(
                    F.concat_ws(" ", F.slice(F.col("w"), i + 1, n))
                ),
            )
        ).alias("pos", "gram"),
    )
    repeated = (
        grams.groupBy("gram")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") >= min_count)
        .select("gram")
    )
    starts = (
        grams.join(repeated, "gram")
        .groupBy("id")
        .agg(F.sort_array(F.collect_list("pos")).alias("starts"))
    )
    joined = base.join(starts, "id", "left").select(
        "id",
        "w",
        F.coalesce(F.col("starts"), F.array().cast("array<int>")).alias(
            "starts"
        ),
    )
    # merge the SORTED starts into disjoint covered intervals [lo, hi):
    # one linear aggregate pass — each start covers [s, s+n), and since
    # starts ascend, a new start either extends the last interval
    # (s <= last.hi; its end s+n >= last.hi) or opens a new one
    intervals = F.aggregate(
        F.col("starts"),
        F.array().cast("array<struct<lo:int,hi:int>>"),
        lambda acc, s: F.when(
            (F.size(acc) > 0) & (s <= F.element_at(acc, -1)["hi"]),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1),
                F.array(
                    F.struct(
                        F.element_at(acc, -1)["lo"].alias("lo"),
                        (s + F.lit(n)).alias("hi"),
                    )
                ),
            ),
        ).otherwise(
            F.concat(
                acc,
                F.array(F.struct(s.alias("lo"), (s + F.lit(n)).alias("hi"))),
            )
        ),
    )
    with_iv = joined.withColumn("iv", intervals)
    # kept text = the concatenation of the GAPS around the intervals:
    # gap k spans [iv[k-1].hi, iv[k].lo) (document ends for k=0 / k=m) —
    # one slice per gap, O(tokens) total per doc
    m = F.size("iv")
    kept = F.flatten(
        F.transform(
            F.sequence(F.lit(0), m),
            lambda k: F.slice(
                F.col("w"),
                F.when(k == F.lit(0), F.lit(1)).otherwise(
                    F.element_at(F.col("iv"), k)["hi"] + 1
                ),
                F.greatest(
                    F.when(k == m, F.size("w")).otherwise(
                        F.element_at(F.col("iv"), k + 1)["lo"]
                    )
                    - F.when(k == F.lit(0), F.lit(0)).otherwise(
                        F.element_at(F.col("iv"), k)["hi"]
                    ),
                    F.lit(0),
                ),
            ),
        )
    )
    return with_iv.select(
        F.col("id").alias(id_col),
        F.array_join(kept, " ").alias("text_clean"),
        F.size("w").cast("long").alias("n_tokens"),
        (F.size("w") - F.size(kept)).cast("long").alias("n_removed_tokens"),
    )


def semantic_dedup(
    embeddings: DataFrame,
    centroids,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540): assign every embedding to its nearest centroid by
    cosine, then within each cluster drop any item whose cosine to a
    LOWER-id cluster member reaches ``threshold`` — exactly the paper's
    upper-triangular pairwise sweep, with the row id as the (there:
    random) cluster ordering, made deterministic. Returns one row per
    input: (``id_col``, cluster, keep).

    ``centroids`` may be a k x d numpy array (cluster ids 0..k-1 — e.g.
    ``ivf_build(...).centers`` to reuse a trained IVF index), a SMALL
    DataFrame with columns (cluster, centroid), or an int k (trains
    spherical k-means on a bounded deterministic sample via the IVF
    trainer). Centroids are collected to the driver (k rows — bounded by
    construction, same contract as ``knn.ivf_query``'s centroid load)
    and broadcast into an Arrow-batched numpy assignment UDF (the
    ``knn.ivf_build`` cell pattern): ONE narrow pass, no join, no
    shuffle, a (batch x k) matmul per Arrow batch.

    Scale notes (100-TB design point): the only shuffle is the
    cluster-keyed ``applyInPandas`` that runs the paper's sweep as a
    dense per-cluster ``M @ M.T`` — blockwise (4096 rows at a time), so
    per-task memory is O(cluster x block), never O(cluster^2), and the
    sweep is numpy throughout (the first cut as a Catalyst zip_with
    self-join spent 6.5 s at sf0.1 interpreting ~10^8 lambda calls; this
    form takes ~0.5 s, BENCH.md §Round 5). The quadratic pair work
    itself is inherent to SemDeDup; size k so clusters hold the paper's
    ~n/k target (k ~ sqrt(n) keeps total pair work ~ n^1.5). A hot
    cluster (duplicate explosion) is bounded IN-OPERATOR since r6
    (VERDICT r5 #4): bit-identical vectors collapse to their lowest-id
    representative inside the sweep, so the quadratic pair work runs on
    distinct vectors only (a planted 10k-copy cluster costs O(copies)
    extra, not O(copies^2) — TestSemanticDedupHotCluster), and the
    blockwise buffer adapts to cluster size (<= ~256 MB per task). An
    upstream ``exact_dedup`` pre-pass remains worthwhile to keep the
    SHUFFLE small. Ties in the argmax go to the lowest cluster id on
    BOTH engine and oracle sides.
    """
    if isinstance(centroids, int):
        from .knn import _train_centroids_sample

        take = (
            embeddings.select(
                F.col(vec_col),
                F.xxhash64(F.col(id_col), F.lit(7)).alias("_h"),
            )
            .orderBy("_h")
            .limit(10_000)  # bounded deterministic sample, as in ivf_build
            .collect()
        )
        centers = _train_centroids_sample(
            np.array([r[0] for r in take], dtype=np.float64), centroids, 7
        )
        cent_rows = [(i, np.asarray(c, dtype=np.float64)) for i, c in enumerate(centers)]
    elif isinstance(centroids, DataFrame):
        cent_rows = [
            (r["cluster"], np.asarray(r["centroid"], dtype=np.float64))
            for r in centroids.select("cluster", "centroid").collect()
        ]
    else:  # numpy array k x d
        cent_rows = [
            (i, np.asarray(c, dtype=np.float64)) for i, c in enumerate(centroids)
        ]
    cids_seen = [cid for cid, _ in cent_rows]
    if len(set(cids_seen)) != len(cids_seen):
        # duplicate ids would silently map two cmat rows to one cid and
        # make the argmax assignment depend on which duplicate scores
        # higher — the documented lowest-id tie rule would no longer
        # describe behavior (ADVICE r5)
        dupes = sorted({c for c in cids_seen if cids_seen.count(c) > 1})
        raise ValueError(
            f"semantic_dedup: duplicate cluster id(s) {dupes} in the "
            "centroids input — cluster ids must be unique"
        )
    cent_rows.sort(key=lambda t: t[0])  # argmax ties -> lowest cluster id
    cmat = np.stack([c for _, c in cent_rows])
    cmat = cmat / np.maximum(
        np.linalg.norm(cmat, axis=1, keepdims=True), 1e-300
    )
    cids = np.array([int(cid) for cid, _ in cent_rows], dtype=np.int64)

    @F.pandas_udf(LongType())
    def assign_udf(vecs: pd.Series) -> pd.Series:
        mat = np.stack(vecs.to_numpy()).astype(np.float64)
        norms = np.linalg.norm(mat, axis=1, keepdims=True)
        mat = mat / np.where(norms == 0, 1.0, norms)
        # numpy argmax takes the FIRST max -> lowest cluster id on ties
        return pd.Series(cids[(mat @ cmat.T).argmax(axis=1)])

    base = embeddings.select(
        F.col(id_col).cast("long").alias("id"),
        F.col(vec_col).cast("array<double>").alias("_v"),
    ).withColumn("cluster", assign_udf(F.col("_v")))

    def _sweep(mat: np.ndarray) -> np.ndarray:
        """drop[i] = any j < i with cos(i, j) >= t over L2-normalized
        rows: pure upper-triangular scan (j's own drop status is
        irrelevant — the paper's triu sweep), so rows are independent
        -> blockwise matmul. Block size adapts to the cluster so the
        (block x n) sims buffer stays <= ~256 MB regardless of cluster
        size (identical decisions — rows are independent)."""
        n = len(mat)
        drop = np.zeros(n, dtype=bool)
        block = int(max(256, min(4096, (1 << 25) // max(n, 1))))
        for s in range(0, n, block):
            e = min(s + block, n)
            sims = mat[s:e] @ mat.T  # (block, n)
            mask = np.arange(n)[None, :] < np.arange(s, e)[:, None]
            drop[s:e] = ((sims >= threshold) & mask).any(axis=1)
        return drop

    def _prune(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("id", kind="mergesort").reset_index(drop=True)
        mat = np.stack(pdf["_v"].to_numpy()).astype(np.float64)
        norms = np.linalg.norm(mat, axis=1, keepdims=True)
        mat = mat / np.where(norms == 0, 1.0, norms)
        n = len(mat)
        # In-operator hot-cluster bound (r6, VERDICT r5 #4): a
        # duplicate-explosion cluster (the exact-dedup pre-pass is
        # documented but was not enforced) made the sweep O(n^2) in the
        # COPY count. Bit-identical normalized vectors are collapsed to
        # their lowest-id representative first: every copy's cosine to
        # its rep is ~1.0 (>= any practical threshold — guarded), so
        # copies are dropped outright and the quadratic sweep runs on
        # DISTINCT vectors only. Skipped for thresholds within 1e-6 of
        # 1.0, where float cosine of identical vectors may not clear the
        # bar — the plain full sweep decides those exactly as before.
        if n > 1 and threshold <= 0.999999:
            uniq, first_idx, inverse = np.unique(
                mat, axis=0, return_index=True, return_inverse=True
            )
            if len(uniq) < n:
                order = np.argsort(first_idx, kind="stable")
                # unique vectors in ascending-rep-id order
                umat = mat[np.sort(first_idx)]
                drop_u = _sweep(umat)
                # map each unique row back to its sweep position
                pos_of_uniq = np.empty(len(uniq), dtype=np.int64)
                pos_of_uniq[order] = np.arange(len(uniq))
                sweep_pos = pos_of_uniq[inverse]
                # a non-representative copy drops via its lower-id rep
                # iff cos(copy, rep) = cos(rep, rep) clears the
                # threshold — true (~1.0) for every vector EXCEPT the
                # all-zero one, whose self-cosine is 0.0 under the
                # zero-norm convention above (copies of the zero vector
                # keep exactly as the full sweep keeps them)
                self_sim = np.einsum("ij,ij->i", umat, umat)
                copy_drop = (np.arange(n) != first_idx[inverse]) & (
                    self_sim[sweep_pos] >= threshold
                )
                drop = drop_u[sweep_pos] | copy_drop
                return pd.DataFrame(
                    {"id": pdf["id"], "cluster": pdf["cluster"],
                     "keep": ~drop}
                )
        drop = _sweep(mat)
        return pd.DataFrame(
            {"id": pdf["id"], "cluster": pdf["cluster"], "keep": ~drop}
        )

    result = base.groupBy("cluster").applyInPandas(
        _prune, "id long, cluster long, keep boolean"
    )
    return _finalize(result.withColumnRenamed("id", id_col))
