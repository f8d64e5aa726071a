"""Tests for the training-data-pipeline operators: dedup, similarity
search, text analysis, multimodal plumbing."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").persist()


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").persist()


class TestDedup:
    def test_exact_dedup_counts(self, spark, docs):
        from aida_spark.operators.dedup import exact_dedup

        out = exact_dedup(docs)
        total = out.agg(F.sum("n_dups")).first()[0]
        assert total == docs.count()

    def test_exact_dedup_finds_planted_duplicate(self, spark):
        from aida_spark.operators.dedup import exact_dedup

        pdf = pd.DataFrame(
            {
                "doc_id": [1, 2, 3],
                "text": ["same  text here", "Same text HERE", "other"],
            }
        )
        # case+whitespace normalization collapses 1 and 2... no: case
        # differs -> lower() collapses; double space collapses
        out = exact_dedup(spark.createDataFrame(pdf)).collect()
        by_keep = {r["keep_id"]: r["n_dups"] for r in out}
        assert by_keep == {1: 2, 3: 1}

    def test_minhash_self_similarity(self, spark):
        from aida_spark.operators.dedup import minhash_lsh_pairs

        pdf = pd.DataFrame(
            {
                "doc_id": [1, 2, 3, 4],
                "text": [
                    "the quick brown fox jumps over the lazy dog again",
                    "the quick brown fox jumps over the lazy dog again!",
                    "a completely different document about spark pipelines",
                    "yet another unrelated piece of text goes right here",
                ],
            }
        )
        pairs = minhash_lsh_pairs(
            spark.createDataFrame(pdf), jaccard_threshold=0.5
        ).collect()
        found = {(r["id_a"], r["id_b"]) for r in pairs}
        assert (1, 2) in found
        assert all(p == (1, 2) for p in found)

    def test_simhash_near_dup_small_hamming(self, spark):
        from aida_spark.operators.dedup import simhash

        pdf = pd.DataFrame(
            {
                "doc_id": [1, 2, 3],
                "text": [
                    "the quick brown fox jumps over the lazy dog",
                    "the quick brown fox jumps over the lazy cat",
                    "completely unrelated text with other content entirely",
                ],
            }
        )
        rows = {r["id"]: r["simhash"] for r in simhash(spark.createDataFrame(pdf)).collect()}
        ham = lambda a, b: bin((a ^ b) & ((1 << 64) - 1)).count("1")  # noqa: E731
        assert ham(rows[1], rows[2]) < ham(rows[1], rows[3])

    def test_ngram_jaccard(self, spark):
        from aida_spark.operators.dedup import ngram_jaccard_pairs

        pdf = pd.DataFrame(
            {
                "doc_id": [1, 2, 3],
                "text": [
                    "alpha beta gamma delta epsilon zeta",
                    "alpha beta gamma delta epsilon eta",
                    "one two three four five six",
                ],
            }
        )
        pairs = ngram_jaccard_pairs(
            spark.createDataFrame(pdf), n=3, threshold=0.3
        ).collect()
        assert {(r["id_a"], r["id_b"]) for r in pairs} == {(1, 2)}

    def test_ngram_prefix_filter_bounds_hot_gram(self, spark):
        """Skew gate (VERDICT r5 #1): every doc shares one common
        trigram, so the r5 full-inverted-index self-join would emit
        ~n_docs^2/2 candidate rows on that single gram. With exact
        prefix filtering the hot gram ranks last in the global
        frequency order and leaves every doc's prefix: candidates must
        stay proportional to TRUE near-pairs, and the reported pair set
        must still exactly match a brute-force Jaccard check."""
        import itertools

        from aida_spark.operators.dedup import (
            _ngram_prefix_candidates,
            ngram_jaccard_pairs,
        )

        n_docs = 60
        texts = {}
        for i in range(n_docs):
            # unique body per doc + ONE shared trailing trigram
            body = f"w{i}a w{i}b w{i}c w{i}d w{i}e w{i}f w{i}g"
            texts[i] = body + " common shared tail"
        # two planted near-dup pairs (identical copies)
        texts[1000] = texts[0]
        texts[1001] = texts[7]
        pdf = pd.DataFrame(
            {"doc_id": list(texts), "text": [texts[k] for k in texts]}
        )
        df = spark.createDataFrame(pdf)
        t = 0.8
        out = ngram_jaccard_pairs(df, n=3, threshold=t)
        got = {(r["id_a"], r["id_b"]) for r in out.collect()}
        out.unpersist()
        assert got == {(0, 1000), (7, 1001)}

        # candidate volume: rebuild the operator's gram table and count
        # prefix candidates — must be O(true pairs), not O(n_docs^2)
        words = F.split(F.lower(F.trim(F.col("text"))), r"\s+")
        grams = df.select(
            F.col("doc_id").alias("id"),
            F.explode(
                F.transform(
                    F.sequence(
                        F.lit(0), F.greatest(F.size(words) - 3, F.lit(0))
                    ),
                    lambda i: F.xxhash64(
                        F.concat_ws(" ", F.slice(words, i + 1, 3))
                    ),
                )
            ).alias("gram"),
        ).dropDuplicates(["id", "gram"])
        n_cand = _ngram_prefix_candidates(grams, t).count()
        # unfiltered: the shared gram alone gives C(62, 2) = 1891 rows
        assert n_cand <= 10, n_cand

        # brute-force ground truth over all pairs confirms exactness
        def gramset(s):
            w = s.lower().split()
            return {
                " ".join(w[i : i + 3])
                for i in range(max(len(w) - 3 + 1, 1))
            }

        truth = set()
        for a, b in itertools.combinations(sorted(texts), 2):
            ga, gb = gramset(texts[a]), gramset(texts[b])
            j = len(ga & gb) / len(ga | gb)
            if j >= t:
                truth.add((a, b))
        assert got == truth


class TestKnn:
    def test_bruteforce_topk_agrees_with_numpy(self, spark, emb):
        import numpy as np

        from aida_spark.operators.knn import brute_force_topk

        queries = emb.filter(F.col("vec_id") < 3)
        got = brute_force_topk(emb, queries, k=5).collect()
        pdf = emb.toPandas()
        mat = np.stack(pdf["embedding"].map(np.asarray))
        ids = pdf["vec_id"].to_numpy()
        norms = np.linalg.norm(mat, axis=1)
        for q in range(3):
            qi = list(ids).index(q)
            sims = (mat @ mat[qi]) / (norms * norms[qi])
            order = sorted(
                [(-(sims[i]), ids[i]) for i in range(len(ids)) if ids[i] != q]
            )[:5]
            expected = [int(nid) for _, nid in order]
            mine = [
                r["neighbor_id"]
                for r in sorted(
                    (r for r in got if r["query_id"] == q),
                    key=lambda r: r["rank"],
                )
            ]
            assert mine == expected

    def test_lsh_recall_reasonable(self, spark, emb):
        from aida_spark.operators.knn import brute_force_topk, lsh_bucketed_topk

        queries = emb.filter(F.col("vec_id") < 10)
        exact = {
            (r["query_id"], r["neighbor_id"])
            for r in brute_force_topk(emb, queries, k=5).collect()
        }
        approx = {
            (r["query_id"], r["neighbor_id"])
            for r in lsh_bucketed_topk(emb, queries, k=5).collect()
        }
        recall = len(exact & approx) / len(exact)
        assert recall >= 0.6  # multi-table sign-LSH


class TestTextOps:
    def test_token_count(self, spark):
        from aida_spark.operators.textops import token_count

        pdf = pd.DataFrame({"text": ["one two three", "", "  padded  words "]})
        out = token_count(spark.createDataFrame(pdf)).collect()
        assert [r["n_tokens"] for r in out] == [3, 0, 2]

    def test_language_id(self, spark):
        from aida_spark.operators.textops import language_id

        pdf = pd.DataFrame(
            {
                "text": [
                    "the cat and the dog sat in the garden of the house",
                    "der hund und die katze sind nicht in das haus",
                    "le chat et la souris dans les jardins de la maison",
                    "xyzzy plugh qwerty",
                ]
            }
        )
        out = [r["lang_pred"] for r in language_id(spark.createDataFrame(pdf)).collect()]
        assert out == ["en", "de", "fr", "unknown"]

    def test_quality_and_fingerprint(self, spark, docs):
        from aida_spark.operators.textops import fingerprint, quality_metrics

        q = quality_metrics(docs).select("quality_score").collect()
        assert all(0.0 <= r["quality_score"] <= 1.0 for r in q)
        f = fingerprint(docs.limit(10)).collect()
        assert len({r["fingerprint"] for r in f}) >= 9  # distinct texts


class TestMultimodal:
    def _media(self, spark):
        pdf = pd.DataFrame(
            {
                "media_id": [1, 2, 3],
                "kind": ["image", "audio", "video"],
                "content": [b"img-bytes", b"audio-bytes", b"video-bytes"],
                "mime": ["image/png", "audio/wav", "video/mp4"],
            }
        )
        return spark.createDataFrame(pdf)

    def test_fake_decode_is_deterministic(self, spark):
        from aida_spark.operators.multimodal import decode_media

        a = decode_media(self._media(spark)).collect()
        b = decode_media(self._media(spark)).collect()
        assert sorted(map(tuple, a)) == sorted(map(tuple, b))
        img = next(r for r in a if r["kind"] == "image")
        assert img["duration_ms"] == 0 and img["width"] >= 64

    def test_real_decoder_raises(self, spark):
        from aida_spark.operators.multimodal import decode_media

        with pytest.raises(Exception, match="NotImplementedError|decoding"):
            decode_media(self._media(spark), decoder="real").collect()

    def test_frame_sampling(self, spark):
        from aida_spark.operators.multimodal import sample_frames

        frames = sample_frames(self._media(spark), every_ms=500).collect()
        assert all(r["media_id"] == 3 for r in frames)
        assert len(frames) >= 2


class TestCurate:
    def test_curation_reasons_and_precedence(self, spark):
        from aida_spark.operators.curate import curate_corpus

        pdf = pd.DataFrame(
            {
                "doc_id": [1, 2, 3, 4, 5],
                "text": [
                    "the cat and the dog sat in the garden of the old house by the river bank today",
                    "the cat and the dog sat in the garden of the old house by the river bank today",
                    "short",
                    "der hund und die katze sind nicht in das haus aber sie sind in dem garten heute",
                    "1234 5678 9999 0000 1111 2222 3333 4444 5555 6666 7777 8888",
                ],
            }
        )
        out = {
            r["id"]: (r["keep"], r["reason"])
            for r in curate_corpus(
                spark.createDataFrame(pdf), min_chars=20, min_quality=0.3
            ).collect()
        }
        assert out[1] == (True, "kept")
        assert out[2] == (False, "exact_dup")  # duplicate of 1, higher id
        assert out[3] == (False, "too_short")
        assert out[4] == (False, "wrong_lang")
        assert out[5][0] is False  # digit-heavy -> low_quality or wrong_lang
        assert out[5][1] in ("low_quality", "wrong_lang")

    def test_near_dup_gate(self, spark):
        from aida_spark.operators.curate import curate_corpus

        pdf = pd.DataFrame(
            {
                "doc_id": [1, 2],
                "text": [
                    "the quick brown fox jumps over the lazy dog and runs to the forest",
                    "the quick brown fox jumps over the lazy dog and runs to the forest!",
                ],
            }
        )
        out = {
            r["id"]: r["reason"]
            for r in curate_corpus(
                spark.createDataFrame(pdf),
                min_chars=10,
                min_quality=0.0,
                near_dup_threshold=0.5,
            ).collect()
        }
        assert out == {1: "kept", 2: "near_dup"}


class TestEmbeddingNearDup:
    def test_planted_near_duplicate_found(self, spark):
        import numpy as np

        from aida_spark.operators.dedup import embedding_near_dups

        rng = np.random.RandomState(0)
        v1 = rng.standard_normal(64)
        v2 = v1 + rng.standard_normal(64) * 0.05
        pdf = pd.DataFrame(
            {
                "vec_id": [1, 2, 3],
                "embedding": [
                    v1.tolist(),
                    v2.tolist(),
                    rng.standard_normal(64).tolist(),
                ],
            }
        )
        out = embedding_near_dups(
            spark.createDataFrame(pdf), threshold=0.9
        ).collect()
        assert [(r["id_a"], r["id_b"]) for r in out] == [(1, 2)]

    def test_random_embeddings_have_no_high_sim_pairs(self, spark, emb):
        from aida_spark.operators.dedup import embedding_near_dups

        assert embedding_near_dups(emb, threshold=0.8).count() == 0


def test_minhash_megacluster_candidates_bounded(spark):
    """Duplicate-heavy corpus: 1000 identical copies must collapse to one
    representative in the exact-dedup pre-pass, so the banding join emits
    O(cluster) rows instead of ~10^6 within-bucket candidate pairs, while
    a genuine near-dup pair is still found and exact-verified."""
    from aida_spark.operators.dedup import minhash_lsh_pairs

    filler = (
        "alpha beta gamma delta epsilon zeta eta theta iota kappa "
        "lambda mu nu xi omicron pi rho sigma tau upsilon phi chi"
    )
    near_a = "the quick brown fox jumps over the lazy dog " * 8
    near_b = near_a + "extra tail"
    rows = [(i, filler) for i in range(1000)]
    rows += [(2000, near_a), (2001, near_b)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = minhash_lsh_pairs(df, jaccard_threshold=0.8).collect()
    got = {(r["id_a"], r["id_b"]) for r in pairs}
    assert got == {(2000, 2001)}
    # no pair touches the duplicate cluster's non-representative copies
    assert all(not (0 < a < 1000 or 0 < b < 1000) for a, b in got)


def test_minhash_estimate_tracks_exact(spark):
    """The 64-perm signature Jaccard estimate must track exact shingle
    Jaccard within sampling error (~2/sqrt(64)=0.25 worst case; 0.15
    observed) on near-dup and far pairs — this pins the hash-mixing scheme
    as good enough for banding to propose with, independent of the exact
    verify that decides."""
    import numpy as np
    from aida_spark.operators.dedup import minhash_signatures, _shingle_hashes

    base = "the quick brown fox jumps over the lazy dog " * 6
    docs = [
        (0, base),
        (1, base + "tail one"),
        (2, "completely different content about spark shuffles " * 5),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    sigs = {
        r["id"]: np.array(r["signature"])
        for r in minhash_signatures(df).collect()
    }

    def exact(a, b):
        ga = set(_shingle_hashes(a).tolist())
        gb = set(_shingle_hashes(b).tolist())
        return len(ga & gb) / len(ga | gb)

    for i, j in [(0, 1), (0, 2)]:
        est = float((sigs[i] == sigs[j]).mean())
        exa = exact(docs[i][1], docs[j][1])
        assert abs(est - exa) <= 0.15, (i, j, est, exa)


def test_ivf_partial_probe_recall(spark):
    """IVF recall/probe tradeoff on the (unclustered) driver embeddings:
    probing half the cells must recover a solid majority of the exact
    top-5 — the measured floor on this seeded configuration is 0.82 mean
    recall; gate at 0.7 to absorb numerical wobble. Full probing is
    separately gated to EQUAL exact top-k by the knn_ivf driver oracle."""
    from pyspark.sql import functions as F
    from aida_spark.operators.knn import brute_force_topk, ivf_topk

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 10)
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in brute_force_topk(emb, queries, k=5).collect()
    }
    ivf = {
        (r["query_id"], r["neighbor_id"])
        for r in ivf_topk(
            emb, queries, k=5, n_centroids=16, n_probe=8, dim=64
        ).collect()
    }
    recall = len(exact & ivf) / len(exact)
    assert recall >= 0.7, recall


def test_ivf_centroids_cover_sorted_clusters(spark):
    """The centroid-training sample must not be first-partition-biased:
    on a corpus SORTED by cluster (all of cluster A before cluster B...),
    a limit()-style sample would train centroids on one region only and
    partial-probe recall would collapse for queries from the other
    clusters. With the hash-ordered deterministic sample, IVF with
    moderate probing must still find the exact top-k for queries drawn
    from EVERY cluster."""
    import numpy as np
    from pyspark.sql import functions as F
    from aida_spark.operators.knn import brute_force_topk, ivf_topk

    rng = np.random.RandomState(3)
    dim, per_cluster = 16, 400
    centers = rng.standard_normal((4, dim)) * 5
    rows = []
    vid = 0
    for c in range(4):  # sorted: cluster 0 rows first, then 1, 2, 3
        pts = centers[c] + rng.standard_normal((per_cluster, dim))
        for p in pts:
            rows.append((vid, [float(x) for x in p]))
            vid += 1
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    ).repartitionByRange(8, "vec_id")  # partition order == cluster order
    # one query per cluster, including the LAST cluster (the one a
    # first-partition-biased sample never sees)
    qids = [0, per_cluster, 2 * per_cluster, 3 * per_cluster]
    queries = df.filter(F.col("vec_id").isin(qids))
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in brute_force_topk(df, queries, k=5).collect()
    }
    ivf = {
        (r["query_id"], r["neighbor_id"])
        for r in ivf_topk(
            df, queries, k=5, n_centroids=8, n_probe=4,
            sample_size=600, dim=dim,
        ).collect()
    }
    per_query = {
        q: len({p for p in exact if p[0] == q} & ivf) / 5.0 for q in qids
    }
    assert all(r >= 0.8 for r in per_query.values()), per_query


def test_ann_build_query_split_reuses_one_index(spark, tmp_path):
    """A 100-TB corpus builds its ANN index ONCE and serves many query
    batches (VERDICT r3 missing #2): two ivf_query batches from one
    ivf_build must (a) match the one-shot results, (b) read the cached
    assignment (InMemoryTableScan in the plan — no second k-means or
    assignment scan), and (c) round-trip through save/ivf_load. Same
    reuse contract for lsh_build/lsh_query."""
    from pyspark.sql import functions as F
    from aida_spark.operators.knn import (
        ivf_build,
        ivf_load,
        ivf_query,
        ivf_topk,
        lsh_build,
        lsh_query,
        lsh_bucketed_topk,
    )

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    batch1 = emb.filter(F.col("vec_id") < 5)
    batch2 = emb.filter((F.col("vec_id") >= 5) & (F.col("vec_id") < 10))

    idx = ivf_build(emb, n_centroids=16)
    q2 = ivf_query(idx, batch2, k=5, n_probe=16)
    plan = q2._jdf.queryExecution().toString()
    assert "InMemoryTableScan" in plan or "InMemoryRelation" in plan

    got1 = sorted(map(tuple, ivf_query(idx, batch1, k=5, n_probe=16).collect()))
    got2 = sorted(map(tuple, q2.collect()))
    oneshot1 = sorted(map(tuple, ivf_topk(
        emb, batch1, k=5, n_centroids=16, n_probe=16
    ).collect()))
    assert got1 == oneshot1 and got1 and got2

    # save / load round-trip serves identical results
    path = str(tmp_path / "ivf_index")
    idx.save(path)
    loaded = ivf_load(spark, path)
    got1_loaded = sorted(
        map(tuple, ivf_query(loaded, batch1, k=5, n_probe=16).collect())
    )
    assert got1_loaded == got1
    idx.unpersist()

    lidx = lsh_build(emb, n_planes=4, n_tables=8)
    l1 = sorted(map(tuple, lsh_query(lidx, batch1, k=5).collect()))
    l1_oneshot = sorted(map(tuple, lsh_bucketed_topk(
        emb, batch1, k=5, n_planes=4, n_tables=8
    ).collect()))
    assert l1 == l1_oneshot and l1
    lidx.unpersist()


def test_simhash_matches_independent_implementation(spark):
    """The vectorized (NUL-join + reduceat + bit-pack) simhash must equal
    a naive pure-int second implementation of the ENGINE-OWNED hash
    definition (Horner polynomial over utf-8 bytes + splitmix64 — no
    numpy, no code shared with the operator), guarding both the
    batch-segmentation logic and the hash definition itself (the same
    cross-check gates tools/pin_simhash_oracle.py before re-pinning)."""
    from aida_spark.operators.dedup import simhash

    texts = [
        "the quick brown fox jumps over the lazy dog",
        "",
        "   ",
        "one",
        "a i xy",  # 1-2 byte tokens: avalanche must spread the high bits
        "Repeated repeated REPEATED tokens tokens vote as a multiset",
        "unicode tökens — ümlauts and dashes",
        "nul\x00separated",  # NUL is treated as whitespace
    ]
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = {r["id"]: r["simhash"] for r in simhash(df).collect()}

    M = (1 << 64) - 1

    def token_hash(tok: str) -> int:
        h = 0
        for byte in tok.encode("utf-8"):
            h = (h * 1099511628211 + byte) & M
        h ^= h >> 30
        h = (h * 0xBF58476D1CE4E5B9) & M
        h ^= h >> 27
        h = (h * 0x94D049BB133111EB) & M
        h ^= h >> 31
        return h

    def ref(text):
        tokens = (text or "").lower().replace("\x00", " ").split()
        if not tokens:
            return 0
        votes = [0] * 64
        for tok in tokens:
            h = token_hash(tok)
            for bit in range(64):
                votes[bit] += (h >> bit) & 1
        val = sum(1 << b for b in range(64) if votes[b] * 2 >= len(tokens))
        return val - (1 << 64) if val >= (1 << 63) else val

    for i, t in enumerate(texts):
        assert got[i] == ref(t), (i, t, got[i], ref(t))


def test_operators_have_no_driver_side_row_fetch():
    """Scale guard: no operator may fetch rows to the driver outside the
    two documented bounded paths (the IVF training sample and operator
    _finalize counts) — `.first()` / `.toPandas()` / unordered
    `.limit().collect()` are the anti-patterns VERDICT r2 flagged."""
    import pathlib
    import re

    ops_dir = pathlib.Path(__file__).parent.parent / "aida_spark" / "operators"
    for path in ops_dir.glob("*.py"):
        src = path.read_text()
        assert ".first()" not in src, f"driver row-fetch in {path.name}"
        assert ".toPandas()" not in src, f"driver toPandas in {path.name}"
        # limit(...).collect() is only legal immediately after an orderBy
        # (distributed top-n); a bare limit().collect() is partition-biased
        for m in re.finditer(r"limit\(\w+\)\s*\.collect\(\)", src):
            ctx = src[max(0, m.start() - 120) : m.start()]
            assert ".orderBy(" in ctx, (
                f"unordered limit().collect() in {path.name}"
            )


def test_simhash_pairs_pigeonhole_and_prepass(spark):
    """simhash_pairs: (a) a pair within the hamming radius is always found
    (pigeonhole banding guarantees recall 1.0 at the radius), (b) identical
    copies collapse to one representative before banding, (c) unrelated
    text produces no pair."""
    from aida_spark.operators.dedup import simhash_pairs

    near_a = "the quick brown fox jumps over the lazy dog " * 6
    near_b = near_a.replace("lazy", "sleepy")
    other = "entirely different words about columnar shuffles " * 6
    rows = [(i, near_a) for i in range(50)]  # 50 identical copies
    rows += [(100, near_b), (200, other)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in simhash_pairs(df, max_hamming=16).collect()
    }
    # only the representative (min id 0) of the copy-cluster may pair
    assert all(a == 0 or a >= 100 for (a, _b) in got), got
    assert any(pair == (0, 100) for pair in got), got
    assert all((200 not in pair) for pair in got), got


def test_redact_pii_masks_and_counts(spark):
    from aida_spark.operators.textops import redact_pii

    df = spark.createDataFrame(
        [
            (1, "mail me at alice.smith+x@corp.example.org or 555-867-5309"),
            (2, "server 192.168.001.17 is fine, server2 10.0.0.1 too"),
            (3, "no pii here at all"),
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in redact_pii(df).collect()}
    assert rows[1]["n_email"] == 1 and rows[1]["n_phone"] == 1
    assert "<EMAIL>" in rows[1]["text_redacted"]
    assert "<PHONE>" in rows[1]["text_redacted"]
    assert "alice" not in rows[1]["text_redacted"]
    assert rows[2]["n_ipv4"] == 2
    assert rows[2]["text_redacted"].count("<IPV4>") == 2
    assert rows[3]["text_redacted"] == "no pii here at all"


def test_stratified_sample_deterministic_and_proportional(spark):
    from pyspark.sql import functions as F
    from aida_spark.operators.textops import stratified_sample

    df = spark.range(20_000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 2 == 0, "keep_all").otherwise("keep_tenth").alias(
            "source"
        ),
    )
    out = stratified_sample(
        df, {"keep_all": 1.0, "keep_tenth": 0.1}, default_fraction=0.0
    )
    counts = {
        r["source"]: r["n"]
        for r in out.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert counts["keep_all"] == 10_000  # fraction 1.0 keeps everything
    assert 800 <= counts["keep_tenth"] <= 1_200  # ~10% of 10k
    # deterministic: the same call returns the same rows
    a = {r["doc_id"] for r in out.collect()}
    b = {r["doc_id"] for r in stratified_sample(
        df, {"keep_all": 1.0, "keep_tenth": 0.1}, default_fraction=0.0
    ).collect()}
    assert a == b


def test_media_decode_real_stdlib_formats(spark):
    """decoder='real' must REALLY decode stdlib-parseable formats: a
    synthesized WAV's channel count / sample rate / true duration, and a
    binary PGM's dimensions — no fake fallback (strict mode raises on
    undecodable payloads, proven by the JPEG-ish blob)."""
    import io
    import wave as wave_mod

    import pytest as _pytest
    from aida_spark.operators.multimodal import decode_media

    buf = io.BytesIO()
    with wave_mod.open(buf, "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(8000)
        w.writeframes(b"\x01\x02" * 2 * 4000)  # 4000 frames = 500 ms
    wav_bytes = buf.getvalue()
    pgm_bytes = b"P5\n4 3\n255\n" + bytes(range(12))

    df = spark.createDataFrame(
        [(1, "audio", bytearray(wav_bytes), "audio/wav"),
         (2, "image", bytearray(pgm_bytes), "image/x-portable-graymap")],
        "media_id long, kind string, content binary, mime string",
    )
    rows = {r["media_id"]: r for r in decode_media(df, decoder="real").collect()}
    assert rows[1]["width"] == 2          # channels
    assert rows[1]["height"] == 8000      # sample rate
    assert rows[1]["duration_ms"] == 500  # true frame math
    assert rows[2]["width"] == 4 and rows[2]["height"] == 3
    assert rows[2]["duration_ms"] == 0

    undecodable = spark.createDataFrame(
        [(3, "image", bytearray(b"\xff\xd8\xff\xe0 fake jpeg"), "image/jpeg")],
        "media_id long, kind string, content binary, mime string",
    )
    with _pytest.raises(Exception, match="PIL/ffmpeg|PythonException"):
        decode_media(undecodable, decoder="real").collect()


class TestGraphOps:
    def test_connected_components_chain_and_singletons(self, spark):
        """A 4-node chain, a 2-clique and an isolated node: labels must
        converge to the min id of each component (chain diameter 3 >
        one propagation round, so the loop must actually iterate)."""
        from aida_spark.operators.graphops import connected_components

        nodes = spark.createDataFrame([(i,) for i in range(7)], "id long")
        edges = spark.createDataFrame(
            [(1, 2), (2, 3), (3, 4), (5, 6)], "id_a long, id_b long"
        )
        got = {
            r["node"]: r["component"]
            for r in connected_components(nodes, edges).collect()
        }
        assert got == {0: 0, 1: 1, 2: 1, 3: 1, 4: 1, 5: 5, 6: 5}

    def test_dedup_clusters_from_minhash_pairs(self, spark):
        from aida_spark.operators.dedup import minhash_lsh_pairs
        from aida_spark.operators.graphops import dedup_clusters

        base = "the quick brown fox jumps over the lazy dog " * 8
        rows = [
            (1, base),
            (2, base.replace("dog", "cat")),
            (3, base.replace("dog", "rat")),
            (4, "completely different content about database shuffles " * 8),
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        pairs = minhash_lsh_pairs(df, jaccard_threshold=0.5)
        got = {
            r["doc_id"]: (r["cluster_id"], r["keep"])
            for r in dedup_clusters(df, pairs).collect()
        }
        assert got[1] == (1, True)
        assert got[2] == (1, False) and got[3] == (1, False)
        assert got[4] == (4, True)  # singleton keeps itself

    def test_star_agrees_with_propagation_and_union_find(self, spark):
        """Star contraction and min-label propagation must produce
        identical labels, both equal to a pure-python union-find, on a
        seeded random graph with chains, cliques and singletons."""
        import random

        from aida_spark.operators.graphops import connected_components

        rng = random.Random(7)
        n = 300
        edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(260)]
        edges = [(a, b) for a, b in edges if a != b]

        parent = list(range(n))

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        expected = {i: find(i) for i in range(n)}
        # normalize to min-id-of-component labels
        comp_min: dict[int, int] = {}
        for i, r in expected.items():
            comp_min[r] = min(comp_min.get(r, i), i)
        expected = {i: comp_min[find(i)] for i in range(n)}

        nodes = spark.createDataFrame([(i,) for i in range(n)], "id long")
        edf = spark.createDataFrame(edges, "id_a long, id_b long")
        for method in ("propagation", "star"):
            labels = connected_components(nodes, edf, method=method)
            got = {r["node"]: r["component"] for r in labels.collect()}
            labels.unpersist()
            assert got == expected, method

    def test_star_converges_on_long_chain(self, spark):
        """A 10k-node path graph (diameter 9999): propagation would need
        ~10k rounds, star contraction collapses it in O(log n) rounds
        under the default cap — the ADVICE r3 long-chain scenario."""
        from aida_spark.operators.graphops import connected_components

        n = 10_000
        nodes = spark.range(n).withColumnRenamed("id", "id")
        edges = (
            spark.range(n - 1)
            .selectExpr("id as id_a", "id + 1 as id_b")
        )
        labels = connected_components(nodes, edges, method="star")
        dist = labels.groupBy("component").count().collect()
        labels.unpersist()
        assert len(dist) == 1
        assert dist[0]["component"] == 0 and dist[0]["count"] == n

    def test_propagation_unconverged_raises_not_silent(self, spark):
        """Exhausting max_iter before a stable round must raise (wrong
        labels must never flow silently into keep/drop decisions);
        on_unconverged='warn' downgrades to a warning."""
        import pytest as _pytest

        from aida_spark.operators.graphops import connected_components

        n = 40
        nodes = spark.createDataFrame([(i,) for i in range(n)], "id long")
        edges = spark.createDataFrame(
            [(i, i + 1) for i in range(n - 1)], "id_a long, id_b long"
        )
        with _pytest.raises(RuntimeError, match="NOT converged"):
            connected_components(
                nodes, edges, max_iter=3, method="propagation"
            )
        with _pytest.warns(UserWarning, match="NOT converged"):
            labels = connected_components(
                nodes,
                edges,
                max_iter=3,
                method="propagation",
                on_unconverged="warn",
            )
            labels.unpersist()


class TestLineDedup:
    def test_boilerplate_lines_removed_order_preserved(self, spark):
        """RefinedWeb-style line dedup: a line in >= min_df distinct
        docs disappears from ALL of them; short lines are exempt; line
        order is preserved; an entirely-boilerplate doc keeps its row
        with empty text (row parity)."""
        from aida_spark.operators.textops import dedup_repeated_lines

        banner = "SUBSCRIBE TO OUR NEWSLETTER TODAY"
        rows = [
            (1, f"unique first line one\n{banner}\nunique tail one"),
            (2, f"{banner}\nunique middle two\n{banner}"),
            (3, f"unique alpha three\nunique beta three\n{banner}"),
            (4, "no boilerplate here at all\njust regular prose lines"),
            (5, banner),  # entirely boilerplate -> emptied, row kept
            (6, "==\nshort line doc\n=="),  # '==' repeats but is exempt
            (7, "==\nanother short-line doc\n=="),
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {
            r["doc_id"]: (r["text_clean"], r["n_lines"], r["n_removed"])
            for r in dedup_repeated_lines(
                df, min_df=3, min_line_chars=10
            ).collect()
        }
        assert got[1] == ("unique first line one\nunique tail one", 3, 1)
        assert got[2] == ("unique middle two", 3, 2)
        assert got[3] == ("unique alpha three\nunique beta three", 3, 1)
        assert got[4] == (rows[3][1], 2, 0)
        assert got[5] == ("", 1, 1)
        # '==' appears in 4 lines across 2 docs but is under
        # min_line_chars -> exempt
        assert got[6] == (rows[5][1], 3, 0)
        assert got[7] == (rows[6][1], 3, 0)
        assert len(got) == 7

    def test_plan_has_no_python_udf(self, spark):
        from aida_spark.operators.textops import dedup_repeated_lines

        df = spark.createDataFrame([(1, "a\nb")], "doc_id long, text string")
        plan = dedup_repeated_lines(df)._jdf.queryExecution().toString()
        assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan

    def test_random_corpus_matches_python_reference_and_idempotent(
        self, spark
    ):
        """Seeded random multi-line corpus vs a pure-python reference;
        and IDEMPOTENCE: removal deletes ALL copies of a boilerplate
        line while kept lines keep their original doc frequency, so a
        second pass at the same threshold changes nothing."""
        import random
        from collections import defaultdict

        from aida_spark.operators.textops import dedup_repeated_lines

        rng = random.Random(99)
        pool = [
            f"shared boilerplate line number {i} for reuse" for i in range(6)
        ] + ["=="]  # short line, exempt
        docs = []
        for d in range(40):
            lines = []
            for _ in range(rng.randint(1, 6)):
                if rng.random() < 0.4:
                    lines.append(rng.choice(pool))
                else:
                    lines.append(f"unique line {d}/{rng.randrange(10**6)}")
            docs.append((d, "\n".join(lines)))
        min_df, min_chars = 3, 10

        by_line = defaultdict(set)
        for d, text in docs:
            for ln in text.split("\n"):
                if len(ln.strip()) >= min_chars:
                    by_line[ln.strip()].add(d)
        bl = {ln for ln, ds in by_line.items() if len(ds) >= min_df}
        expected = {}
        for d, text in docs:
            kept = [
                ln
                for ln in text.split("\n")
                if len(ln.strip()) < min_chars or ln.strip() not in bl
            ]
            n_lines = len(text.split("\n"))
            expected[d] = ("\n".join(kept), n_lines, n_lines - len(kept))

        df = spark.createDataFrame(docs, "doc_id long, text string")
        out1 = dedup_repeated_lines(df, min_df=min_df, min_line_chars=min_chars)
        got = {
            r["doc_id"]: (r["text_clean"], r["n_lines"], r["n_removed"])
            for r in out1.collect()
        }
        assert got == expected

        again = dedup_repeated_lines(
            out1.select(F.col("doc_id"), F.col("text_clean").alias("text")),
            min_df=min_df,
            min_line_chars=min_chars,
        )
        got2 = {r["doc_id"]: r["text_clean"] for r in again.collect()}
        assert got2 == {d: t for d, (t, _n, _r) in expected.items()}


class TestKeyphrases:
    def test_pattern_families_on_explicit_tags(self, spark):
        """Pattern fidelity independent of the tagger: feed KNOWN tag
        sequences (what a real POS tagger would emit) and check the
        extracted spans per family — the machinery the reference runs
        over Stanford tags (KeyphraseExtractor.java:120-250)."""
        from aida_spark.operators.keyphrases import extract_noun_phrases

        words = "The University of Southern California announced results".split()
        tags = ["DT", "NNP", "IN", "NNP", "NNP", "NN", "NNS"]
        got = extract_noun_phrases(words, tags)
        by_family = {}
        for phrase, start, n, family in got:
            by_family.setdefault(family, []).append((phrase, start, n))
        assert ("University", 1, 1) in by_family["proper"]
        # the reference's nounPhrase pattern extends an NNP run across
        # trailing common nouns (KeyphraseExtractor.java:37)
        assert (
            "Southern California announced results",
            3,
            4,
        ) in by_family["proper"]
        assert (
            "University of Southern California",
            1,
            4,
        ) in by_family["proper_of"]
        # DT + NNP (title style) requires the post-DT word capitalized
        assert ("The University", 0, 2) in by_family["dt_proper"]

    def test_heuristic_tagger_and_guards(self, spark):
        from aida_spark.operators.keyphrases import (
            extract_noun_phrases,
            heuristic_pos_tags,
        )

        words = "statistical inference models beat manual rules".split()
        tags = heuristic_pos_tags(words)
        assert tags[0] == "JJ" and tags[2] == "NNS"
        tech = [
            (p, s, n)
            for p, s, n, f in extract_noun_phrases(words)
            if f == "technical"
        ]
        # greedy like the reference TT regex: the run absorbs trailing
        # noun units, so the phrase STARTS at the technical term
        assert tech and tech[0][0].startswith("statistical inference models")

        # date-shaped proper nouns are filtered
        assert extract_noun_phrases("January 15 2024".split()) == []

        # lowercase adjective cannot start an adj_proper phrase
        fams = {
            f
            for _p, _s, _n, f in extract_noun_phrases(
                "musical Kashmir".split(), ["JJ", "NNP"]
            )
        }
        assert "adj_proper" not in fams  # 'musical' is lowercase

    def test_spark_operator_explodes_rows(self, spark):
        from aida_spark.operators.keyphrases import extract_keyphrases

        df = spark.createDataFrame(
            [
                (1, "Jimmy Page played Kashmir at the Knebworth Festival"),
                (2, ""),
            ],
            "doc_id long, text string",
        )
        rows = extract_keyphrases(df).collect()
        phrases = {(r["doc_id"], r["phrase"]) for r in rows}
        assert ("1", "Jimmy Page") in phrases
        assert ("1", "Knebworth Festival") in phrases
        assert all(r["doc_id"] != "2" for r in rows)
        plan_cols = {r["family"] for r in rows}
        assert plan_cols <= {
            "proper", "proper_of", "adj_proper", "dt_proper", "technical"
        }


class TestDecontam:
    def test_find_contaminated_planted_overlap(self, spark):
        from aida_spark.operators.decontam import find_contaminated

        secret = "alpha bravo charlie delta echo foxtrot golf hotel india"
        corpus = spark.createDataFrame(
            [
                (1, f"prefix words here {secret} and suffix padding words"),
                (2, "entirely unrelated text with no benchmark overlap at all"),
                (3, secret),
            ],
            "doc_id long, text string",
        )
        evals = spark.createDataFrame(
            [(100, secret), (200, "nothing from this appears in the corpus text")],
            "eval_id long, text string",
        )
        got = {
            (r["doc_id"], r["eval_id"]): r["n_matched_grams"]
            for r in find_contaminated(corpus, evals, n=8).collect()
        }
        # the 9-word secret has two 8-grams; docs 1 and 3 contain both
        assert got == {(1, 100): 2, (3, 100): 2}

    def test_min_matches_threshold(self, spark):
        from aida_spark.operators.decontam import find_contaminated

        secret = "alpha bravo charlie delta echo foxtrot golf hotel"
        corpus = spark.createDataFrame(
            [(1, f"x {secret} y")], "doc_id long, text string"
        )
        evals = spark.createDataFrame(
            [(9, secret)], "eval_id long, text string"
        )
        assert (
            find_contaminated(corpus, evals, n=8, min_matches=2).count() == 0
        )
        assert (
            find_contaminated(corpus, evals, n=8, min_matches=1).count() == 1
        )

    def test_fuzzy_catches_reworded_eval_item(self, spark):
        """A lightly reworded benchmark item shares NO verbatim word
        8-gram with the eval set (the exact rule misses it) but keeps
        high char-shingle jaccard (the fuzzy rule flags it); unrelated
        text is flagged by neither."""
        from aida_spark.operators.decontam import (
            find_contaminated,
            find_contaminated_fuzzy,
        )

        item = (
            "the quick brown fox jumps over the lazy dog while the "
            "curious cat watches from the tall garden fence as evening "
            "light settles across the quiet village square where "
            "children play near the old stone well"
        )
        # a comma attached to every 7th word: every word 8-gram is
        # broken (the token differs), but the character shingle set
        # barely moves (jaccard ~0.79)
        words = item.split()
        for i in range(6, len(words), 7):
            words[i] = words[i] + ","
        reworded = " ".join(words)
        corpus = spark.createDataFrame(
            [
                (1, reworded),
                (2, "entirely unrelated text about shuffle partitions"),
                (3, item),
            ],
            "doc_id long, text string",
        )
        evals = spark.createDataFrame(
            [(100, item)], "eval_id long, text string"
        )
        exact = {
            r["doc_id"]
            for r in find_contaminated(corpus, evals, n=8).collect()
        }
        fuzzy = {
            r["doc_id"]: r["jaccard"]
            for r in find_contaminated_fuzzy(
                corpus, evals, jaccard_threshold=0.7
            ).collect()
        }
        assert exact == {3}  # verbatim copy only
        assert set(fuzzy) == {1, 3}  # reworded copy caught too
        assert fuzzy[3] == 1.0 and 0.7 <= fuzzy[1] < 1.0


class TestPacking:
    def test_pack_sequences_matches_reference_greedy(self, spark):
        """Spark packing equals a pure-Python greedy fill per shard,
        including the oversized-document case (own overflowing pack)."""
        import numpy as np
        from aida_spark.operators.packing import pack_sequences

        rng = np.random.RandomState(5)
        docs = [(int(i), int(rng.randint(1, 300))) for i in range(500)]
        docs.append((500, 5000))  # longer than capacity
        df = spark.createDataFrame(docs, "doc_id long, n_tokens long")
        got = {
            r["doc_id"]: (r["shard"], r["pack_no"], r["pack_fill"])
            for r in pack_sequences(df, capacity=512, n_shards=8).collect()
        }
        assert len(got) == 501

        # reference: greedy fill in doc_id order within each shard
        shards: dict[int, list[tuple[int, int]]] = {}
        for did, n in docs:
            shards.setdefault(got[did][0], []).append((did, n))
        for shard, members in shards.items():
            pack_no, fill, first = 0, 0, True
            for did, n in sorted(members):
                if not first and fill + n > 512:
                    pack_no += 1
                    fill = 0
                fill += n
                first = False
                assert got[did] == (shard, pack_no, fill), (did, got[did])

    def test_packs_respect_capacity(self, spark):
        from pyspark.sql import functions as F
        from aida_spark.operators.packing import pack_sequences

        df = spark.range(400).select(
            F.col("id").alias("doc_id"), (F.col("id") % 100 + 1).alias("n_tokens")
        )
        packed = pack_sequences(df, capacity=128, n_shards=4)
        # every pack's final fill <= capacity (no doc here exceeds it)
        over = packed.groupBy("shard", "pack_no").agg(
            F.max("pack_fill").alias("fill")
        ).filter(F.col("fill") > 128)
        assert over.count() == 0


def test_token_count_bpe_pretokenizer_boundaries(spark):
    """The BPE-ish regex counter follows GPT-2 pre-tokenizer boundaries:
    contraction suffixes split off, letter/digit/symbol runs are single
    tokens each (with a leading space absorbed), whitespace is free."""
    from aida_spark.operators.textops import token_count_bpe

    df = spark.createDataFrame(
        [
            (1, "hello world"),        # 2 letter runs
            (2, "don't stop"),          # don + 't + stop
            (3, "abc123 x-y"),          # abc + 123 + x + - + y
            (4, ""),                    # nothing
            (5, "it's we'll they've"),  # 3 words + 3 suffixes
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["n_bpe_tokens"] for r in token_count_bpe(df).collect()}
    assert got == {1: 2, 2: 3, 3: 5, 4: 0, 5: 6}


def test_repetition_metrics_gopher_rules(spark):
    from aida_spark.operators.textops import repetition_metrics

    df = spark.createDataFrame(
        [
            (1, "spam spam spam spam"),          # top word 1.0; bigrams all "spam spam" -> dup 2/3
            (2, "all words are fully distinct"), # 1/5; no dup bigrams
            (3, ""),                              # degenerate -> zeros
            (4, "one"),                           # single word: top 1.0, no bigrams
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["top_word_frac"], r["dup_bigram_frac"])
        for r in repetition_metrics(df).collect()
    }
    assert got[1] == (1.0, 1.0 - 1.0 / 3.0)
    assert got[2] == (0.2, 0.0)
    assert got[3] == (0.0, 0.0)
    assert got[4] == (1.0, 0.0)


def test_mix_by_token_budget(spark):
    """Token-budget mixing: per-source keep fraction = min(1, budget /
    total_tokens); deterministic hash selection; unbudgeted sources
    dropped; a budget above the source total keeps every doc."""
    from pyspark.sql import functions as F
    from aida_spark.operators.textops import mix_by_token_budget

    rows = [
        (i, "a" if i < 40 else ("b" if i < 60 else "c"),
         "ten words of text padding out this tiny document here")
        for i in range(80)
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    # a: 40 docs x 10 tokens = 400 total, budget 100 -> keep ~25%
    # b: budget above total -> all 20 docs kept
    # c: unbudgeted -> dropped
    out = mix_by_token_budget(df, {"a": 100, "b": 10_000}).collect()
    by_src = {}
    for r in out:
        by_src.setdefault(r["source"], []).append(r["doc_id"])
    assert set(by_src) == {"a", "b"}
    assert len(by_src["b"]) == 20
    a_tokens = 10 * len(by_src["a"])
    assert 0 < a_tokens <= 200  # ~budget, doc-granularity slack
    # deterministic: same selection on a second call
    out2 = mix_by_token_budget(df, {"a": 100, "b": 10_000}).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, out2))


def test_driver_contract_every_query_has_an_oracle():
    """The correctness gate is only as wide as the oracle map: every
    queries() entry must have an oracle_sql() entry and vice versa (32
    as of round 3 — new operators must ship with their oracle)."""
    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))
    import __spark_entry__ as e

    q = set(e.queries())
    o = set(e.oracle_sql())
    assert q == o, (sorted(q - o), sorted(o - q))
    assert len(q) >= 33


class TestUnigramNll:
    def test_matches_python_reference_and_ranks_noise_higher(self, spark):
        """Closed-form add-k unigram NLL vs a pure-python recomputation;
        a rare-token doc must score strictly higher (worse) than a
        common-token doc from the same corpus."""
        import math
        from collections import Counter

        from aida_spark.operators.textops import unigram_nll_scores

        rows = [
            (1, "the cat sat on the mat"),
            (2, "the dog sat on the mat"),
            (3, "zxqv wmbrt kjpol qqzz"),  # rare-token noise
            (4, ""),  # degenerate
        ]
        k = 0.5
        toks = {i: t.lower().split() for i, t in rows}
        counts = Counter(w for ws in toks.values() for w in ws)
        n_total, v = sum(counts.values()), len(counts)

        def nll(ws):
            if not ws:
                return 0.0
            return -sum(
                math.log((counts[w] + k) / (n_total + k * v)) for w in ws
            ) / len(ws)

        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {
            r["id"]: (r["n_tokens"], r["mean_nll"])
            for r in unigram_nll_scores(df, add_k=k).collect()
        }
        for i, ws in toks.items():
            assert got[i][0] == len(ws)
            assert abs(got[i][1] - nll(ws)) < 1e-9, (i, got[i], nll(ws))
        assert got[3][1] > got[1][1]  # noise scores worse
        assert got[4] == (0, 0.0)

    def test_plan_is_catalyst_only(self, spark):
        from aida_spark.operators.textops import unigram_nll_scores

        df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
        plan = unigram_nll_scores(df)._jdf.queryExecution().toString()
        assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


class TestRepeatedSpans:
    def test_repeated_span_removed_everywhere_and_matches_reference(
        self, spark
    ):
        """Exact-substring span dedup (Lee et al. 2022, gram-based): a
        repeated n-word passage disappears from EVERY occurrence (incl.
        within one doc), overlapping marked spans union, short docs and
        unique text pass through — all vs a pure-python reference."""
        from aida_spark.operators.dedup import remove_repeated_spans

        quote = "to be or not to be that is the question"  # 10 words
        rows = [
            (1, f"alpha beta {quote} gamma delta"),
            (2, f"intro words here {quote} and a tail"),
            (3, f"{quote} {quote}"),  # twice in ONE doc
            (4, "totally unique words that repeat nowhere else at all"),
            (5, "short doc"),
            (6, ""),
        ]
        n, min_count = 10, 2
        # pure-python reference
        texts = {i: t.split() for i, t in rows}
        from collections import Counter

        cnt = Counter(
            " ".join(ws[i : i + n])
            for ws in texts.values()
            for i in range(len(ws) - n + 1)
        )
        expected = {}
        for d, ws in texts.items():
            cut = set()
            for i in range(max(len(ws) - n + 1, 0)):
                if cnt[" ".join(ws[i : i + n])] >= min_count:
                    cut.update(range(i, i + n))
            keptw = [w for t, w in enumerate(ws) if t not in cut]
            expected[d] = (" ".join(keptw), len(ws), len(ws) - len(keptw))

        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {
            r["doc_id"]: (r["text_clean"], r["n_tokens"], r["n_removed_tokens"])
            for r in remove_repeated_spans(
                df, n=n, min_count=min_count
            ).collect()
        }
        assert got == expected
        # sanity on the semantics themselves
        assert got[1] == ("alpha beta gamma delta", 14, 10)
        assert got[3][0] == "" and got[3][2] == 20
        assert got[4][0] == rows[3][1]
        assert got[5] == ("short doc", 2, 0)
        assert got[6] == ("", 0, 0)

    def test_plan_is_catalyst_only(self, spark):
        from aida_spark.operators.dedup import remove_repeated_spans

        df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
        plan = remove_repeated_spans(df, n=2)._jdf.queryExecution().toString()
        assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


class TestPageRank:
    def test_matches_pure_python_power_iteration(self, spark):
        """Distributed PageRank (undirected, dangling-mass
        redistribution, fixed iterations) vs a dense pure-python power
        iteration on a seeded random graph with a dangling node."""
        import random

        from aida_spark.operators.graphops import pagerank

        rng = random.Random(5)
        n, damping, iters = 30, 0.85, 10
        edges = list(
            {
                (a, b)
                for a, b in (
                    (rng.randrange(n), rng.randrange(n)) for _ in range(45)
                )
                if a != b
            }
        )
        # node n-1 isolated -> dangling under the undirected expansion
        edges = [(a, b) for a, b in edges if n - 1 not in (a, b)]

        sym = {(a, b) for a, b in edges} | {(b, a) for a, b in edges}
        out = {}
        for a, b in sym:
            out.setdefault(a, set()).add(b)
        ranks = {i: 1.0 / n for i in range(n)}
        for _ in range(iters):
            dangling = sum(r for i, r in ranks.items() if i not in out)
            base = (1 - damping) / n + damping * dangling / n
            new = {i: base for i in range(n)}
            for a, nbrs in out.items():
                share = ranks[a] / len(nbrs)
                for b in nbrs:
                    new[b] += damping * share
            ranks = new

        nodes = spark.createDataFrame([(i,) for i in range(n)], "id long")
        edf = spark.createDataFrame(edges, "id_a long, id_b long")
        got = {
            r["node"]: r["rank"]
            for r in pagerank(
                nodes, edf, damping=damping, n_iter=iters
            ).collect()
        }
        assert set(got) == set(ranks)
        for i in range(n):
            assert abs(got[i] - ranks[i]) < 1e-9, (i, got[i], ranks[i])
        assert abs(sum(got.values()) - 1.0) < 1e-9  # mass conserved


class TestSemanticDedup:
    def _two_cluster_corpus(self):
        import numpy as np

        rng = np.random.RandomState(0)
        c0, c1 = np.eye(8)[0], np.eye(8)[1]
        rows = []
        for i in range(10):
            base = c0 if i % 2 == 0 else c1
            rows.append((i, (base + 0.05 * rng.standard_normal(8)).tolist()))
        rows.append((100, list(rows[0][1])))  # exact dup of id 0
        return rows, np.stack([c0, c1])

    def test_matches_numpy_brute_force(self, spark):
        """Planted two-cluster corpus + exact dup: assignment and the
        lowest-id-greedy keep set must equal an independent dense numpy
        sweep (the paper's algorithm verbatim)."""
        import numpy as np

        from aida_spark.operators.dedup import semantic_dedup

        rows, cents = self._two_cluster_corpus()
        out = {
            r["vec_id"]: (r["cluster"], r["keep"])
            for r in semantic_dedup(
                spark.createDataFrame(
                    rows, "vec_id long, embedding array<double>"
                ),
                cents,
                threshold=0.95,
            ).collect()
        }
        ids = [r[0] for r in rows]
        mat = np.stack([np.array(r[1]) for r in rows])
        mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
        cn = cents / np.linalg.norm(cents, axis=1, keepdims=True)
        assign = (mat @ cn.T).argmax(axis=1)
        expected = {}
        for i, vid in enumerate(ids):
            drop = any(
                ids[j] < vid
                and assign[j] == assign[i]
                and float(mat[i] @ mat[j]) >= 0.95
                for j in range(len(ids))
            )
            expected[vid] = (int(assign[i]), not drop)
        assert out == expected
        assert out[100] == (0, False)  # the planted dup is dropped

    def test_int_k_trains_centroids_and_keeps_uniques(self, spark, emb):
        from aida_spark.operators.dedup import semantic_dedup

        out = semantic_dedup(emb, 4, threshold=0.99)
        n = emb.count()
        assert out.count() == n
        # random 64-dim vectors: nothing reaches cosine 0.99
        assert out.filter(~F.col("keep")).count() == 0
        assert out.select("cluster").distinct().count() <= 4

    def test_duplicate_cluster_ids_raise(self, spark):
        """ADVICE r5: duplicate centroid ids would silently make the
        argmax tie rule undefined — must raise loudly."""
        import numpy as np
        import pytest as _pytest

        from aida_spark.operators.dedup import semantic_dedup

        emb = spark.createDataFrame(
            [(0, [1.0, 0.0]), (1, [0.0, 1.0])],
            "vec_id long, embedding array<double>",
        )
        cents = spark.createDataFrame(
            [(0, [1.0, 0.0]), (0, [0.0, 1.0])],
            "cluster long, centroid array<double>",
        )
        with _pytest.raises(ValueError, match="duplicate cluster id"):
            semantic_dedup(emb, cents, threshold=0.9)

    def test_hot_cluster_bounded(self, spark):
        """VERDICT r5 #4: a planted 10k-copy cluster must complete with
        the sweep bounded by DISTINCT vectors (the in-operator collapse),
        and the keep decisions must equal the paper's full sweep: rep of
        the copy pile keeps (lowest id), every copy drops, distinct
        near-vectors decided by cosine as usual."""
        import numpy as np

        from aida_spark.operators.dedup import semantic_dedup

        rng = np.random.RandomState(3)
        v = rng.standard_normal(16)
        rows = [(i, v.tolist()) for i in range(10_000)]  # 10k exact copies
        # a few distinct vectors in the same cluster region
        for j in range(5):
            rows.append((20_000 + j, (v + 2.0 * rng.standard_normal(16)).tolist()))
        emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        out = semantic_dedup(emb, np.stack([v]), threshold=0.9)
        got = {r["vec_id"]: r["keep"] for r in out.collect()}
        out.unpersist()
        assert got[0] is True
        assert all(got[i] is False for i in range(1, 10_000))
        # distinct tail vectors: compare against a dense sweep
        mat = np.stack([np.asarray(r[1]) for r in rows])
        mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
        for j in range(5):
            i = 10_000 + j
            drop = any(float(mat[i] @ mat[k]) >= 0.9 for k in range(i))
            assert got[20_000 + j] == (not drop)

    def test_zero_vector_copies_keep_like_full_sweep(self, spark):
        """The collapse's 'copies always drop' shortcut must NOT apply
        to the all-zero vector, whose self-cosine is 0.0 under the
        zero-norm convention: zero copies keep exactly as the full
        sweep keeps them."""
        import numpy as np

        from aida_spark.operators.dedup import semantic_dedup

        rows = [
            (0, [0.0, 0.0, 0.0]),
            (1, [0.0, 0.0, 0.0]),
            (2, [1.0, 0.0, 0.0]),
            (3, [1.0, 0.0, 0.0]),
        ]
        emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        out = semantic_dedup(emb, np.array([[1.0, 0.0, 0.0]]), threshold=0.9)
        got = {r["vec_id"]: r["keep"] for r in out.collect()}
        out.unpersist()
        assert got == {0: True, 1: True, 2: True, 3: False}


class TestR5PlanShapes:
    """Plan-shape regression gates for the r5 operators: shapes that
    silently degrade at 100 TB must fail tests instead (the
    plans/inspect.py pattern used for the KG pipeline)."""

    def test_semantic_dedup_single_exchange_no_join(self, spark):
        import numpy as np

        from aida_spark.operators.dedup import semantic_dedup
        from aida_spark.plans.inspect import physical_plan

        rng = np.random.RandomState(0)
        emb = spark.createDataFrame(
            [(i, rng.standard_normal(8).tolist()) for i in range(50)],
            "vec_id long, embedding array<double>",
        )
        out = semantic_dedup(emb, np.eye(8)[:2], threshold=0.99)
        plan = physical_plan(out)
        # assignment is a narrow Arrow pass + ONE cluster shuffle into
        # the grouped sweep — any join is a regression (the persisted
        # result prints the plan twice, initial + AQE-final, so the
        # single exchange may appear once per copy)
        assert plan.count("Exchange") <= 2, plan[:2000]
        assert "Join" not in plan, plan[:2000]
        assert "FlatMapGroupsInPandas" in plan
        out.unpersist()

    def test_decontam_fuzzy_broadcasts_eval_side(self, spark):
        from aida_spark.operators.decontam import find_contaminated_fuzzy
        from aida_spark.plans.inspect import physical_plan

        corpus = spark.createDataFrame(
            [(i, f"corpus doc number {i} with some filler words") for i in range(30)],
            "doc_id long, text string",
        )
        evals = spark.createDataFrame(
            [(1, "corpus doc number 7 with some filler words")],
            "eval_id long, text string",
        )
        out = find_contaminated_fuzzy(corpus, evals, jaccard_threshold=0.9)
        plan = physical_plan(out)
        # the eval side must broadcast on the banding keys (corpus
        # filtered before any shuffle); a sort-merge join THERE means
        # the corpus stream shuffled on banding output — a 100-TB
        # regression. (The small candidate-side text-fetch join on
        # doc_id may print as SMJ in the initial plan; AQE converts it
        # at runtime — not asserted.)
        assert "BroadcastHashJoin [band" in plan, plan[:2000]
        assert "SortMergeJoin [band" not in plan, plan[:2000]
        out.unpersist()
