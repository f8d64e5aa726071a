"""Bucket-checkpoint lineage + exact-resume tests."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from aida_spark.lineage import BucketCheckpoint


@pytest.fixture()
def tmp_ckpt(tmp_path, spark):
    return BucketCheckpoint(spark, str(tmp_path / "ckpt"), n_buckets=8)


def _input(spark, convs):
    rows = [(c, i, f"text {c} {i}") for c in convs for i in range(3)]
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["conv_id", "turn_idx", "text"])
    )


_CALLS = {"n": 0}


def _compute(df):
    _CALLS["n"] += 1
    return df.groupBy("conv_id", "_bucket").agg(
        F.count(F.lit(1)).alias("n_turns")
    )


def test_materialize_and_skip(spark, tmp_ckpt):
    df = _input(spark, [f"c{i}" for i in range(20)])
    out1 = tmp_ckpt.materialize("stage1", df, _compute)
    assert out1.count() == 20
    lineage = tmp_ckpt.lineage("stage1")
    assert lineage is not None
    rows = lineage.collect()
    assert sum(r["rows_in"] for r in rows) == 60
    assert all(r["stage"] == "stage1" for r in rows)

    # unchanged input: no recompute (compute_fn called, but on 0 buckets —
    # we detect via identical results and the fast path returning early)
    calls_before = _CALLS["n"]
    out2 = tmp_ckpt.materialize("stage1", df, _compute)
    assert out2.count() == 20
    assert _CALLS["n"] == calls_before  # early return, no compute


def test_incremental_resume_recomputes_only_dirty(spark, tmp_ckpt):
    df = _input(spark, [f"c{i}" for i in range(20)])
    tmp_ckpt.materialize("stage2", df, _compute)
    lineage1 = {
        r["_bucket"]: r["input_hash"]
        for r in tmp_ckpt.lineage("stage2").collect()
    }

    # modify ONE conversation: only its bucket should change
    df2 = df.withColumn(
        "text",
        F.when(F.col("conv_id") == "c7", F.lit("CHANGED")).otherwise(
            F.col("text")
        ),
    )
    out = tmp_ckpt.materialize("stage2", df2, _compute)
    assert out.count() == 20
    lineage2 = {
        r["_bucket"]: r["input_hash"]
        for r in tmp_ckpt.lineage("stage2").collect()
    }
    changed = [b for b in lineage1 if lineage1[b] != lineage2.get(b)]
    assert len(changed) == 1  # exactly the bucket containing c7


def test_removed_input_does_not_resurrect_stale_rows(spark, tmp_ckpt):
    """Regression for the stale-checkpoint bug (ADVICE r1): with dynamic
    partition overwrite, a bucket whose conversations VANISH from the
    input kept its old partition on disk and was read back as current.
    Dirty/removed buckets must be deleted before the rewrite."""
    df = _input(spark, [f"r{i}" for i in range(20)])
    out1 = tmp_ckpt.materialize("stage3", df, _compute)
    assert out1.count() == 20

    # drop half the conversations entirely
    kept = [f"r{i}" for i in range(10)]
    df2 = _input(spark, kept)
    out2 = tmp_ckpt.materialize("stage3", df2, _compute)
    got = {r["conv_id"] for r in out2.collect()}
    assert got == set(kept), got  # no resurrected r10..r19

    # and a THIRD run with unchanged input early-returns the same rows
    out3 = tmp_ckpt.materialize("stage3", df2, _compute)
    assert {r["conv_id"] for r in out3.collect()} == set(kept)


def test_dirty_bucket_recompute_to_zero_rows(spark, tmp_ckpt):
    """A dirty bucket whose recompute yields ZERO rows must not keep its
    stale partition: filter the compute to drop one conversation's rows
    while its bucket's input fingerprint changes."""
    df = _input(spark, ["solo"])  # all rows in one bucket
    tmp_ckpt.materialize("stage4", df, _compute)

    df2 = df.withColumn(
        "text", F.concat(F.col("text"), F.lit(" v2"))
    )  # bucket dirty

    def compute_empty(bucketed):
        return _compute(bucketed).filter(F.lit(False))

    out = tmp_ckpt.materialize("stage4", df2, compute_empty)
    assert out.count() == 0, out.collect()


def test_resume_at_1024_buckets_with_bounded_deletes(spark, tmp_path):
    """High-bucket-count resume: with n_buckets=1024 the driver must not
    issue one exists+delete RPC pair per bucket. Exact-resume semantics
    hold, and the batched delete path makes exactly one FS delete per
    EXISTING dirty partition (3 here) and one parent delete on a full
    recompute — not O(n_buckets) calls."""
    ckpt = BucketCheckpoint(spark, str(tmp_path / "ckpt1024"), n_buckets=1024)
    df = _input(spark, [f"conv{i}" for i in range(300)])
    out1 = ckpt.materialize("big", df, _compute)
    assert out1.count() == 300

    # dirty exactly 3 conversations -> at most 3 buckets dirty
    df2 = df.withColumn(
        "text",
        F.when(
            F.col("conv_id").isin("conv1", "conv2", "conv3"),
            F.concat(F.col("text"), F.lit(" v2")),
        ).otherwise(F.col("text")),
    )
    bucketed = ckpt._bucket(df2)
    dirty_expected = {
        r["_bucket"]
        for r in bucketed.filter(
            F.col("conv_id").isin("conv1", "conv2", "conv3")
        ).select("_bucket").distinct().collect()
    }
    data_path, _lin = ckpt._paths("big")
    n_del = ckpt._delete_dirty_partitions(data_path, sorted(dirty_expected))
    assert n_del == len(dirty_expected) <= 3
    # full-dirty collapses to ONE parent delete
    assert ckpt._delete_dirty_partitions(data_path, list(range(1024))) == 1

    # the checkpoint data dir is gone now; a fresh materialize rebuilds it
    # and a subsequent partial resume returns exact results
    ckpt2 = BucketCheckpoint(spark, str(tmp_path / "ckpt1024b"), n_buckets=1024)
    ckpt2.materialize("big", df, _compute)
    out2 = ckpt2.materialize("big", df2, _compute)
    got = {(r["conv_id"], r["n_turns"]) for r in out2.collect()}
    assert got == {(f"conv{i}", 3) for i in range(300)}


def test_hinted_materialize_tracks_batch_not_corpus(spark, tmp_ckpt):
    """r6 (VERDICT r5 #2): with ``dirty_from``, change detection derives
    dirty buckets from the hint alone — clean buckets' lineage rows are
    carried over VERBATIM (same input_hash, same wall_ms and ts, proving
    they were neither re-fingerprinted nor rewritten), the recomputed
    buckets' hashes stay content-derived (a later hint-less resume sees
    nothing dirty), and the result equals a from-scratch recompute."""
    base = _input(spark, [f"c{i}" for i in range(20)])
    tmp_ckpt.materialize("hint", base, _compute)
    prior = {r["_bucket"]: r for r in tmp_ckpt.lineage("hint").collect()}

    delta = _input(spark, ["c_new1", "c_new2"])
    both = base.unionByName(delta)
    out = tmp_ckpt.materialize("hint", both, _compute, dirty_from=delta)
    assert out.count() == 22

    after = {r["_bucket"]: r for r in tmp_ckpt.lineage("hint").collect()}
    dirty = {
        int(r["_bucket"])
        for r in tmp_ckpt._bucket(delta.select("conv_id"))
        .select("_bucket")
        .distinct()
        .collect()
    }
    assert dirty, "hint produced no buckets"
    for b, row in prior.items():
        if b in dirty:
            continue
        # clean bucket: row carried verbatim (no rescan, no rewrite)
        assert after[b]["input_hash"] == row["input_hash"]
        assert after[b]["wall_ms"] == row["wall_ms"]
        assert after[b]["ts"] == row["ts"]

    # the hinted hashes are content-derived: a hint-less resume finds
    # nothing dirty and recomputes nothing
    _CALLS["n"] = 0
    again = tmp_ckpt.materialize("hint", both, _compute)
    assert again.count() == 22
    assert _CALLS["n"] == 0

    # and the hinted result equals a from-scratch recompute
    import tempfile

    fresh = BucketCheckpoint(
        spark, tempfile.mkdtemp(prefix="lineage_fresh_"), n_buckets=8
    )
    scratch = fresh.materialize("hint", both, _compute)
    assert sorted(map(tuple, out.collect())) == sorted(
        map(tuple, scratch.collect())
    )
