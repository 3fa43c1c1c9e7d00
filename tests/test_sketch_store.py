"""Epoch-partitioned sketch store gates (spark/sketch_store.py):

- merging all stored epochs is BIT-IDENTICAL to sketching the whole
  corpus in one pass (HLL/CMS/Bloom monoid grouping-independence now
  extended across the persistence boundary);
- a sub-range merge equals sketching only that range's rows;
- quantile kinds (t-digest) hold their rank bounds through the store;
- per-epoch re-writes are idempotent (dynamic partition overwrite);
- the marker refuses mismatched params / kinds / unmarked directories;
- the range scan is partition-pruned on the epoch directory column.
"""

import shutil

import pytest
from pyspark.sql import functions as F

from filterz_spark.sources.pages import synth_pages
from filterz_spark.spark.merge import sketch_column
from filterz_spark.spark.sketch_store import (merge_sketch_range,
                                              read_sketch_store,
                                              write_sketch_epoch)

N = 24_000
EPOCHS = ("2024-01-01", "2024-01-02", "2024-01-03")


@pytest.fixture(scope="module")
def pages(spark):
    df = (synth_pages(spark, N, 8)
          .withColumn("epoch", F.element_at(
              F.array(*[F.lit(e) for e in EPOCHS]),
              ((F.xxhash64("url") % 3 + 3) % 3 + 1).cast("int")))
          .cache())
    df.count()
    yield df
    df.unpersist()


@pytest.fixture()
def store(tmp_path):
    p = str(tmp_path / "sketch_store")
    yield p
    shutil.rmtree(p, ignore_errors=True)


def _write_all(pages, store, kind, params):
    for e in EPOCHS:
        write_sketch_epoch(pages.where(F.col("epoch") == e), "url", store, e,
                           kind=kind, params=params)


class TestBitIdentity:
    @pytest.mark.parametrize("kind,params", [
        ("hll", {"p": 12}),
        ("cms", {"depth": 4, "width": 2048}),
        ("bloom", {"capacity": N, "bits_per_key": 16}),
    ])
    def test_full_range_equals_single_pass(self, spark, pages, store,
                                           kind, params):
        _write_all(pages, store, kind, params)
        merged = merge_sketch_range(spark, store)
        whole = sketch_column(pages, "url", kind, params)
        assert merged.serialize() == whole.serialize()

    def test_subrange_equals_subset_sketch(self, spark, pages, store):
        _write_all(pages, store, "hll", {"p": 12})
        merged = merge_sketch_range(spark, store,
                                    epoch_min=EPOCHS[0], epoch_max=EPOCHS[1])
        subset = sketch_column(
            pages.where(F.col("epoch").isin(*EPOCHS[:2])), "url",
            "hll", {"p": 12})
        assert merged.serialize() == subset.serialize()

    def test_epoch_rewrite_idempotent(self, spark, pages, store):
        _write_all(pages, store, "hll", {"p": 12})
        before = merge_sketch_range(spark, store).serialize()
        # re-run day 2 (crash-replay): replaces ONLY that partition
        write_sketch_epoch(pages.where(F.col("epoch") == EPOCHS[1]), "url",
                           store, EPOCHS[1], kind="hll", params={"p": 12})
        after = merge_sketch_range(spark, store).serialize()
        assert after == before
        rows = read_sketch_store(spark, store).count()
        assert rows == len(EPOCHS)  # one state per epoch, no duplicates


class TestMergeExisting:
    def test_chunked_merge_equals_single_write(self, spark, pages, store):
        """Micro-batch accumulation: 3 chunks folded into one epoch via
        merge_existing must be BIT-IDENTICAL to one whole-epoch write
        (HLL merge is a commutative idempotent monoid)."""
        day = pages.where(F.col("epoch") == EPOCHS[0])
        for i in range(3):
            chunk = day.where((F.xxhash64(F.concat(F.lit("c"), "url"))
                               % 3 + 3) % 3 == i)
            write_sketch_epoch(chunk, "url", store, EPOCHS[0], kind="hll",
                               params={"p": 12}, merge_existing=True)
        merged = merge_sketch_range(spark, store).serialize()
        whole = sketch_column(day, "url", "hll", {"p": 12}).serialize()
        assert merged == whole
        assert read_sketch_store(spark, store).count() == 1

    def test_replay_idempotent_for_hll(self, spark, pages, store):
        day = pages.where(F.col("epoch") == EPOCHS[0])
        write_sketch_epoch(day, "url", store, EPOCHS[0],
                           kind="hll", params={"p": 12})
        before = merge_sketch_range(spark, store).serialize()
        write_sketch_epoch(day, "url", store, EPOCHS[0], kind="hll",
                           params={"p": 12}, merge_existing=True)
        assert merge_sketch_range(spark, store).serialize() == before

    def test_streaming_foreachbatch_rollup(self, spark, pages, store,
                                           tmp_path):
        """The streaming face of the rollup tier: micro-batches arrive via
        readStream, foreachBatch folds each into its day's epoch state;
        the final store answers exactly like the batch build."""
        src = str(tmp_path / "stream_src")
        data = pages.select("url", "epoch")
        for i in range(3):
            data.where((F.xxhash64("url") % 3 + 3) % 3 == i) \
                .coalesce(1).write.mode("append").parquet(src)

        def fold(batch_df, batch_id):
            for r in batch_df.select("epoch").distinct().collect():
                write_sketch_epoch(
                    batch_df.where(F.col("epoch") == r["epoch"]), "url",
                    store, r["epoch"], kind="hll", params={"p": 12},
                    merge_existing=True)

        q = (spark.readStream.schema(data.schema)
             .option("maxFilesPerTrigger", 1).parquet(src)
             .writeStream.foreachBatch(fold).trigger(availableNow=True)
             .option("checkpointLocation", str(tmp_path / "ckpt"))
             .start())
        q.awaitTermination(300)
        merged = merge_sketch_range(spark, store).serialize()
        whole = sketch_column(pages, "url", "hll", {"p": 12}).serialize()
        assert merged == whole
        assert read_sketch_store(spark, store).count() == len(EPOCHS)


class TestQuantileThroughStore:
    def test_tdigest_rank_bound(self, spark, pages, store):
        ntok = pages.withColumn(
            "ntok", F.size(F.split("text", " ")).cast("double"))
        for e in EPOCHS:
            write_sketch_epoch(ntok.where(F.col("epoch") == e), "ntok",
                               store, e, kind="tdigest", params={"delta": 200})
        s = merge_sketch_range(spark, store)
        exact = ntok.selectExpr(
            "percentile(ntok, array(0.1, 0.5, 0.9)) AS p").collect()[0]["p"]
        for q, ex in zip((0.1, 0.5, 0.9), exact):
            assert abs(s.quantile(q) - ex) <= 2.0, q


class TestMarkerContract:
    def test_params_mismatch_raises(self, spark, pages, store):
        write_sketch_epoch(pages, "url", store, EPOCHS[0],
                           kind="hll", params={"p": 12})
        with pytest.raises(RuntimeError, match="do not merge"):
            write_sketch_epoch(pages, "url", store, EPOCHS[1],
                               kind="hll", params={"p": 14})
        with pytest.raises(RuntimeError, match="do not merge"):
            write_sketch_epoch(pages, "url", store, EPOCHS[1],
                               kind="cms", params={"depth": 4, "width": 64})

    def test_read_validates_kind_and_params(self, spark, pages, store):
        write_sketch_epoch(pages, "url", store, EPOCHS[0],
                           kind="hll", params={"p": 12})
        with pytest.raises(RuntimeError, match="expects"):
            read_sketch_store(spark, store, kind="cms")
        with pytest.raises(RuntimeError, match="do not merge"):
            read_sketch_store(spark, store, kind="hll", params={"p": 14})
        read_sketch_store(spark, store, kind="hll", params={"p": 12})

    def test_unmarked_data_refused(self, spark, pages, tmp_path):
        p = str(tmp_path / "foreign")
        pages.limit(10).select("url").write.parquet(p)
        with pytest.raises(RuntimeError, match="no _filterz_sketch_meta"):
            write_sketch_epoch(pages, "url", p, EPOCHS[0],
                               kind="hll", params={"p": 12})
        with pytest.raises(RuntimeError, match="no _filterz_sketch_meta"):
            read_sketch_store(spark, p)

    def test_empty_range_raises(self, spark, pages, store):
        write_sketch_epoch(pages, "url", store, EPOCHS[0],
                           kind="hll", params={"p": 12})
        with pytest.raises(ValueError, match="no states"):
            merge_sketch_range(spark, store, epoch_min="2030-01-01")


class TestPlan:
    def test_range_scan_is_partition_pruned(self, spark, pages, store):
        _write_all(pages, store, "hll", {"p": 12})
        states = read_sketch_store(spark, store) \
            .where(F.col("epoch") == EPOCHS[0])
        plan = states._jdf.queryExecution().executedPlan().toString()
        assert "PartitionFilters" in plan and "epoch" in plan, plan
        # the epoch predicate must sit in PartitionFilters (pruned at file
        # listing), not as a post-scan Filter over all partitions
        pf = plan.split("PartitionFilters:", 1)[1].split("]", 1)[0]
        assert EPOCHS[0] in pf or "epoch" in pf, pf
