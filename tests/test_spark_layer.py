"""Spark-layer integration tests (SURVEY.md §7.1 v1 spine + north-rule gates):

- partition filter build -> probe: zero false negatives, FPR within
  S-filter aggregate bound;
- deterministic text extraction (input_hint per-row invariant) across
  parallelism levels;
- mergeable sketch aggregation: estimate within bound AND merged state
  bit-identical across different partition counts (grouping-independence of
  the monoid);
- checkpoint/resume: kill after k partitions, resume, final state identical
  to an uninterrupted build;
- salted two-phase aggregation equals plain groupBy.
"""

import shutil
import tempfile

import numpy as np
import pytest
from pyspark.sql import functions as F

from filterz_spark.sources.pages import extract_text, synth_pages
from filterz_spark.spark.build import build_filter_index
from filterz_spark.spark.checkpoint import checkpointed_build
from filterz_spark.spark.merge import partial_states, sketch_column, tree_merge
from filterz_spark.spark.probe import collect_index, probe_membership
from filterz_spark.spark.skew import two_phase_count

N_PAGES = 30_000


@pytest.fixture(scope="module")
def pages(spark):
    df = synth_pages(spark, N_PAGES, 8).cache()
    df.count()
    yield df
    df.unpersist()


class TestFilterIndex:
    def test_build_probe_zero_fn(self, spark, pages):
        idx = collect_index(
            build_filter_index(pages, "url", "xorf", {"arity": 3, "fp_bits": 16}, 8)
        )
        assert len(idx) == 8
        assert sum(r["num_keys"] for r in idx) == N_PAGES  # urls unique
        probed = probe_membership(pages.select("url"), "url", idx)
        assert probed.filter("NOT maybe_present").count() == 0

    def test_fpr_within_aggregate_bound(self, spark, pages):
        idx = collect_index(
            build_filter_index(pages, "url", "xorf", {"arity": 3, "fp_bits": 16}, 8)
        )
        absent = pages.selectExpr("concat(url, '#absent') AS url")
        fp = probe_membership(absent, "url", idx).filter("maybe_present").count()
        bound = len(idx) * 2.0 ** -16 * N_PAGES
        assert fp <= bound + 4 * np.sqrt(bound) + 4

    def test_sbbf_and_ribbon_kinds(self, spark, pages):
        for kind, params in [("sbbf", {"bits_per_key": 16}),
                             ("ribbon", {"coeff_bits": 64, "result_bits": 16})]:
            idx = collect_index(build_filter_index(pages, "url", kind, params, 4))
            probed = probe_membership(pages.select("url").limit(2000), "url", idx)
            assert probed.filter("NOT maybe_present").count() == 0

    def test_index_metrics_recorded(self, spark, pages):
        rows = build_filter_index(pages, "url", "xorf", {"arity": 3, "fp_bits": 16}, 4).collect()
        for r in rows:
            assert r["build_ns"] > 0 and r["mem_usage"] >= r["ideal_mem_usage"] > 0
            assert r["attempts"] >= 1

    def test_probe_through_prebroadcast_handle(self, spark, pages):
        from filterz_spark.spark.probe import broadcast_index
        idx = collect_index(
            build_filter_index(pages, "url", "xorf", {"arity": 3, "fp_bits": 16}, 8))
        bc = broadcast_index(spark, idx)
        try:
            probed = probe_membership(pages.select("url"), "url", bc)
            assert probed.filter("NOT maybe_present").count() == 0
            # the handle is reusable across probe calls
            absent = pages.selectExpr("concat(url, '#absent') AS url")
            fp = probe_membership(absent, "url", bc).filter("maybe_present").count()
            bound = len(idx) * 2.0 ** -16 * N_PAGES
            assert fp <= bound + 4 * np.sqrt(bound) + 4
        finally:
            bc.unpersist()

    def test_cogrouped_probe_zero_fn_and_single_filter_fpr(self, spark, pages):
        """Distributed probe: index stays a DataFrame, each key is routed to
        the partition that built its filter. Zero FN; FPR at the
        SINGLE-filter bound (not S x p) because only one partition's
        filters see each key."""
        from filterz_spark.spark.probe import probe_membership_cogrouped
        parts = 8
        idx_df = build_filter_index(pages, "url", "xorf",
                                    {"arity": 3, "fp_bits": 16}, parts)
        probed = probe_membership_cogrouped(pages.select("url"), "url",
                                            idx_df, parts)
        assert probed.filter("NOT maybe_present").count() == 0
        absent = pages.selectExpr("concat(url, '#absent') AS url")
        fp = probe_membership_cogrouped(absent, "url", idx_df, parts) \
            .filter("maybe_present").count()
        bound = 2.0 ** -16 * N_PAGES  # per-filter bound, no S multiplier
        assert fp <= bound + 4 * np.sqrt(bound) + 4

    def test_cogrouped_probe_agrees_with_broadcast_probe_on_present(self, spark, pages):
        """On inserted keys the two probe strategies must agree exactly
        (both are FN-free); the cogrouped path may only ever have FEWER
        false positives on absent keys."""
        from filterz_spark.spark.probe import probe_membership_cogrouped
        parts = 4
        idx_df = build_filter_index(pages, "url", "xorf",
                                    {"arity": 3, "fp_bits": 16}, parts)
        idx = collect_index(idx_df)
        mixed = pages.select("url").limit(3000).unionAll(
            pages.selectExpr("concat(url, '#a') AS url").limit(3000))
        a = set(r["url"] for r in probe_membership(mixed, "url", idx)
                .filter("maybe_present").collect())
        b = set(r["url"] for r in probe_membership_cogrouped(mixed, "url", idx_df, parts)
                .filter("maybe_present").collect())
        assert b <= a  # targeted probe is a subset (fewer FPs, same inserted keys)
        present = set(r["url"] for r in pages.select("url").limit(3000).collect())
        assert present <= b


class TestExtraction:
    def test_text_extraction_invariant(self, spark, pages):
        ext = extract_text(pages)
        bad = ext.join(pages.select("url", "text"), "url") \
                 .filter("extracted_text != text").count()
        assert bad == 0

    def test_byte_identical_across_parallelism(self, spark):
        """Same rows at 2 vs 8 partitions -> identical url->text mapping
        (the two-cluster-size determinism requirement)."""
        a = synth_pages(spark, 5_000, 2).select("url", "text")
        b = synth_pages(spark, 5_000, 8).select("url", "text")
        diff = a.join(b.withColumnRenamed("text", "t2"), "url") \
                .filter("text != t2").count()
        assert diff == 0 and a.count() == b.count() == 5_000

    def test_zipf_vocab_leg_deterministic_and_long_tailed(self, spark):
        """The round-6 realistic-vocabulary leg: parallelism-invariant like
        the default leg, distinct from it, and actually long-tailed (many
        more token types than the 5,000-token uniform vocabulary would
        ever produce on the same row count)."""
        from pyspark.sql import functions as F
        z1 = synth_pages(spark, 5_000, 2, vocab="zipf").select("url", "text")
        z2 = synth_pages(spark, 5_000, 8, vocab="zipf").select("url", "text")
        diff = z1.join(z2.withColumnRenamed("text", "t2"), "url") \
                 .filter("text != t2").count()
        assert diff == 0
        u = synth_pages(spark, 5_000, 2).select("url", "text")
        same = z1.join(u.withColumnRenamed("text", "t2"), "url") \
                 .filter("text = t2").count()
        assert same == 0, "zipf leg must not reproduce the uniform leg"
        n_types = (z1.select(F.explode(F.split("text", " ")).alias("t"))
                   .distinct().count())
        assert n_types > 20_000, n_types  # uniform leg caps at 5,000
        with pytest.raises(ValueError, match="unknown vocab"):
            synth_pages(spark, 10, vocab="nope")


class TestSketchAggregation:
    def test_hll_within_bound(self, spark, pages):
        s = sketch_column(pages, "url", "hll", {"p": 14})
        assert abs(s.estimate() - N_PAGES) / N_PAGES < 3 * s.std_error()

    def test_state_independent_of_partitioning(self, spark, pages):
        """HLL/CMS/Bloom merged state must be bit-identical whether built
        from 2 or 16 partitions (monoid grouping-independence)."""
        for kind, params in [("hll", {"p": 12}),
                             ("cms", {"depth": 4, "width": 2048}),
                             ("bloom", {"capacity": N_PAGES, "bits_per_key": 16})]:
            few = tree_merge(partial_states(pages.repartition(2), "url", kind, params))
            many = tree_merge(partial_states(pages.repartition(16), "url", kind, params))
            assert few.serialize() == many.serialize(), kind

    def test_cms_lang_counts_exact_side(self, spark, pages):
        s = sketch_column(pages, "lang", "cms", {"depth": 5, "width": 8192})
        truth = {r["lang"]: r["cnt"] for r in
                 pages.groupBy("lang").agg(F.count("*").alias("cnt")).collect()}
        hashes = {r["lang"]: r["h"] for r in
                  pages.select("lang").distinct()
                  .withColumn("h", F.xxhash64("lang")).collect()}
        for lang, cnt in truth.items():
            est = int(s.query(np.array([hashes[lang]], dtype=np.int64).view(np.uint64))[0])
            assert cnt <= est <= cnt + s.error_bound(), lang

    def test_quantile_sketches(self, spark, pages):
        ntok = pages.select(F.size(F.split("text", " ")).cast("double").alias("v"))
        exact = ntok.selectExpr(
            "percentile(v, array(0.1, 0.5, 0.9)) AS p").collect()[0]["p"]
        for kind, params, tol in [("tdigest", {"delta": 200}, 2.0),
                                  ("kll", {"k": 200}, 4.0)]:
            s = sketch_column(ntok, "v", kind, params)
            for q, ex in zip((0.1, 0.5, 0.9), exact):
                assert abs(s.quantile(q) - ex) <= tol, (kind, q)


class TestCheckpointResume:
    def test_resume_equivalence(self, spark, pages):
        base = tempfile.mkdtemp(prefix="fz_ckpt_")
        try:
            # uninterrupted build
            full = checkpointed_build(
                spark, pages, "url", f"{base}/full", "xorf",
                {"arity": 3, "fp_bits": 16}, num_partitions=8,
            ).orderBy("partition_id").collect()
            # crash after 3 partitions, then resume
            partial = checkpointed_build(
                spark, pages, "url", f"{base}/resumed", "xorf",
                {"arity": 3, "fp_bits": 16}, num_partitions=8, fail_after=3,
            )
            assert partial.count() == 3
            resumed = checkpointed_build(
                spark, pages, "url", f"{base}/resumed", "xorf",
                {"arity": 3, "fp_bits": 16}, num_partitions=8,
            ).orderBy("partition_id").collect()
            assert len(resumed) == len(full) == 8
            for a, b in zip(full, resumed):
                assert a["partition_id"] == b["partition_id"]
                assert bytes(a["payload"]) == bytes(b["payload"]), \
                    "resumed partition state differs from uninterrupted build"
        finally:
            shutil.rmtree(base, ignore_errors=True)

    def test_snapshot_history(self, spark, pages):
        """Lineage carries one snapshot per epoch with build metrics; a
        completed checkpoint re-run is a no-op (no new snapshot)."""
        import json as _json
        base = tempfile.mkdtemp(prefix="fz_ckpt_")
        try:
            kw = dict(kind="xorf", params={"arity": 3, "fp_bits": 16},
                      num_partitions=8)
            checkpointed_build(spark, pages, "url", base, fail_after=3, **kw)
            checkpointed_build(spark, pages, "url", base, **kw)
            checkpointed_build(spark, pages, "url", base, **kw)  # no-op
            with open(f"{base}/_lineage.json") as f:
                lineage = _json.load(f)
            snaps = lineage["snapshots"]
            assert [s["epoch"] for s in snaps] == [1, 2]
            assert len(snaps[0]["new_partitions"]) == 3
            assert sorted(snaps[0]["new_partitions"]
                          + snaps[1]["new_partitions"]) == list(range(8))
            total_keys = sum(s["keys"] for s in snaps)
            assert total_keys == pages.select("url").distinct().count()
            assert all(s["build_ns"] > 0 and s["wall_s"] > 0 and s["shards"]
                       >= len(s["new_partitions"]) for s in snaps)
        finally:
            shutil.rmtree(base, ignore_errors=True)

    def test_param_mismatch_rejected(self, spark, pages):
        base = tempfile.mkdtemp(prefix="fz_ckpt_")
        try:
            checkpointed_build(spark, pages, "url", base, "xorf",
                               {"arity": 3, "fp_bits": 16}, num_partitions=4)
            with pytest.raises(ValueError, match="different parameters"):
                checkpointed_build(spark, pages, "url", base, "xorf",
                                   {"arity": 4, "fp_bits": 16}, num_partitions=4)
        finally:
            shutil.rmtree(base, ignore_errors=True)


class TestSkew:
    def test_two_phase_count_equals_plain(self, spark, pages):
        plain = {r["lang"]: r["cnt"] for r in
                 pages.groupBy("lang").agg(F.count("*").alias("cnt")).collect()}
        salted = {r["lang"]: r["cnt"] for r in
                  two_phase_count(pages.select("lang"), "lang").collect()}
        assert plain == salted


class TestConstructionRetry:
    def test_failed_partition_resplits_into_shards(self, spark, pages):
        """A kind whose construction fails above a size threshold must
        re-split into shard filters with intact probe semantics
        (ConstructError is a real code path, ref src/xorf.zig:52-56)."""
        import numpy as np

        from filterz_spark.filters import FILTER_KINDS, XorFilter
        from filterz_spark.spark.build import build_filter_index
        from filterz_spark.spark.probe import collect_index, probe_membership

        class FlakyFilter(XorFilter):
            kind = "flaky"
            LIMIT = 2200

            @classmethod
            def build(cls, hashes, **params):
                if hashes.size > cls.LIMIT:
                    from filterz_spark.filters.xorf import ConstructError
                    raise ConstructError("synthetic construction failure")
                f = XorFilter.build(hashes, **params)
                return cls(f.header, f.fingerprints, f.arity, f.fp_bits, f.num_keys)

        FILTER_KINDS["flaky"] = FlakyFilter
        try:
            # 30k rows / 8 partitions = ~3750 keys/partition > LIMIT -> every
            # partition must split once (2 shards of ~1875)
            idx_df = build_filter_index(
                pages, "url", "flaky", {"arity": 3, "fp_bits": 16}, 8)
            rows = idx_df.collect()
            by_pid = {}
            for r in rows:
                by_pid.setdefault(r["partition_id"], []).append(r)
            assert all(len(v) >= 2 for v in by_pid.values()), \
                "expected re-split shards per partition"
            assert all(r["attempts"] >= 3 for r in rows)  # 1 fail + 2 builds
            # register deserializer under the flaky kind for the probe side
            idx = collect_index(idx_df)
            for r in idx:
                r["kind"] = "xorf"  # payload layout is xorf's
            probed = probe_membership(pages.select("url"), "url", idx)
            assert probed.filter("NOT maybe_present").count() == 0
        finally:
            FILTER_KINDS.pop("flaky", None)


class TestGroupedSketches:
    def test_per_group_hll_within_bound(self, spark, pages):
        from filterz_spark.spark.merge import grouped_estimates, grouped_sketch_states
        states = grouped_sketch_states(pages, "lang", "url", "hll", {"p": 12})
        ests = dict(grouped_estimates(states))
        exact = {r["lang"]: r["n"] for r in
                 pages.groupBy("lang").agg(F.countDistinct("url").alias("n")).collect()}
        assert set(ests) == set(exact)
        for lang, n in exact.items():
            assert abs(ests[lang] - n) / max(n, 1) < 3 * 1.04 / np.sqrt(1 << 12), lang

    def test_sparse_rollup_matches_dense_with_smaller_payloads(self, spark, pages):
        """Sparse per-group HLL states give the same estimates as dense and
        ship (much) smaller payloads for small groups — the shuffle-bytes
        property per-group rollups at corpus scale depend on."""
        from filterz_spark.sketches import deserialize_sketch
        from filterz_spark.spark.merge import grouped_estimates, grouped_sketch_states
        import json as _json
        dense = grouped_sketch_states(pages, "lang", "url", "hll", {"p": 14})
        sparse = grouped_sketch_states(pages, "lang", "url", "hll",
                                       {"p": 14, "sparse": True})
        assert dict(grouped_estimates(sparse)) == dict(grouped_estimates(dense))
        srows = {r["g"]: r for r in sparse.collect()}
        for g, r in srows.items():
            sk = deserialize_sketch("hll", bytes(r["payload"]),
                                    _json.loads(r["params"]))
            n = pages.filter(F.col("lang") == g).select("url").distinct().count()
            if n <= (1 << 14) >> 4:  # clearly-small group stays sparse
                assert sk.is_sparse and len(bytes(r["payload"])) < (1 << 14), g

    def test_states_partition_independent(self, spark, pages):
        from filterz_spark.spark.merge import grouped_sketch_states
        a = {r["g"]: bytes(r["payload"]) for r in
             grouped_sketch_states(pages.repartition(3), "lang", "url", "hll", {"p": 10}).collect()}
        b = {r["g"]: bytes(r["payload"]) for r in
             grouped_sketch_states(pages.repartition(11), "lang", "url", "hll", {"p": 10}).collect()}
        assert a == b


class TestCheckpointAtomicity:
    def test_fail_after_is_partition_atomic_with_shards(self, spark):
        """A partition whose construction re-splits into shards must persist
        all-or-nothing under a simulated crash (a half-persisted partition
        would resume as done with a missing shard = probe false negatives)."""
        import json as _json
        # tiny fp space + enough keys per partition to force re-splits is
        # hard to trigger deterministically; instead verify the invariant on
        # the persisted state: every persisted partition has a contiguous
        # shard set starting at 0 matching the uninterrupted build
        base = tempfile.mkdtemp(prefix="fz_atomic_")
        try:
            keys = spark.range(4000).selectExpr("concat('k', id) AS url")
            full = checkpointed_build(
                spark, keys, "url", f"{base}/full", "xorf",
                {"arity": 3, "fp_bits": 16}, num_partitions=6,
            ).collect()
            shards_full = {}
            for r in full:
                shards_full.setdefault(r["partition_id"], set()).add(r["shard"])
            partial = checkpointed_build(
                spark, keys, "url", f"{base}/crash", "xorf",
                {"arity": 3, "fp_bits": 16}, num_partitions=6, fail_after=2,
            ).collect()
            by_pid = {}
            for r in partial:
                by_pid.setdefault(r["partition_id"], set()).add(r["shard"])
            assert len(by_pid) == 2
            for pid, shards in by_pid.items():
                assert shards == shards_full[pid], \
                    "crash persisted a partial shard set for a partition"
            # lineage only marks the persisted partitions complete
            with open(f"{base}/crash/_lineage.json") as f:
                lin = _json.load(f)
            assert sorted(lin["completed_partitions"]) == sorted(by_pid)
        finally:
            shutil.rmtree(base, ignore_errors=True)

    def test_rerun_after_completion_is_noop_even_with_empty_partitions(self, spark):
        """Empty partitions must be recorded complete: a finished checkpoint
        re-run must not inflate the epoch (re-executing the build forever)."""
        import json as _json
        base = tempfile.mkdtemp(prefix="fz_noop_")
        try:
            # 3 distinct keys across 16 partitions -> most partitions empty
            keys = spark.range(3).selectExpr("concat('k', id) AS url")
            checkpointed_build(spark, keys, "url", base, "sbbf",
                               {"bits_per_key": 16}, num_partitions=16)
            with open(f"{base}/_lineage.json") as f:
                epoch1 = _json.load(f)["epoch"]
            out = checkpointed_build(spark, keys, "url", base, "sbbf",
                                     {"bits_per_key": 16}, num_partitions=16)
            with open(f"{base}/_lineage.json") as f:
                epoch2 = _json.load(f)["epoch"]
            assert epoch1 == epoch2 == 1, "rerun was not a no-op"
            assert out.count() >= 1
        finally:
            shutil.rmtree(base, ignore_errors=True)


class TestPackedSource:
    def test_packed_roundtrip_and_distributed_read(self, spark, pages):
        """The reference's fixed-width packed key file reads back
        distributed with every key intact (ref src/bench.zig:16,26-31)."""
        import tempfile
        from filterz_spark.sources.packed import (read_packed_keys,
                                                  write_packed_keys)
        with tempfile.TemporaryDirectory(prefix="fz_packed_") as d:
            path = f"{d}/keys.bin"
            urls = pages.select("url").limit(500)
            n = write_packed_keys(urls, "url", path, record_len=20)
            back = read_packed_keys(spark, path, record_len=20)
            assert back.rdd.getNumPartitions() >= 1
            got = sorted(bytes(r["key"]) for r in back.collect())
            want = sorted(str(r["url"]).encode()[:20].ljust(20, b"\x00")
                          for r in urls.collect())
            assert len(got) == n and got == want
            # the legacy per-record Hadoop reader must agree with the
            # round-7 bulk range reader key-for-key
            legacy = sorted(bytes(r["key"]) for r in read_packed_keys(
                spark, path, record_len=20,
                reader="binary_records").collect())
            assert legacy == got
            # a mis-sized record width fails loudly, never silently shears
            import pytest as _pytest
            with _pytest.raises(Exception, match="multiple of"):
                read_packed_keys(spark, path, record_len=13).collect()

    def test_packed_feeds_filter_build(self, spark, pages):
        """Packed keys drive the normal hash->build->probe spine."""
        import tempfile
        from filterz_spark.sources.packed import (read_packed_keys,
                                                  write_packed_keys)
        from filterz_spark.spark.build import build_filter_index
        from filterz_spark.spark.probe import collect_index, probe_membership
        with tempfile.TemporaryDirectory(prefix="fz_packed_") as d:
            path = f"{d}/keys.bin"
            write_packed_keys(pages.select("url").limit(300), "url", path)
            keys = read_packed_keys(spark, path)
            idx = collect_index(build_filter_index(
                keys, "key", "xorf", {"arity": 3, "fp_bits": 16}, 4))
            hits = probe_membership(keys, "key", idx)
            assert hits.filter("maybe_present").count() == 300  # zero FN


class TestTreeMergePartitionCount:
    def test_public_fallback_when_private_path_breaks(self, spark, pages):
        """tree_merge's partition count reads a PRIVATE Spark API
        (_jdf.queryExecution().toRdd()); a version bump removing it must
        degrade to the public .rdd.getNumPartitions(), not crash — gated
        by proxying the states frame so only the private attribute dies."""

        class BrokenPrivateApi:
            def __init__(self, df):
                object.__setattr__(self, "_df", df)

            def __getattr__(self, name):
                if name == "_jdf":
                    raise AttributeError("private API removed")
                return getattr(self._df, name)

        states = partial_states(pages.repartition(4), "url", "hll", {"p": 12})
        want = tree_merge(states).estimate()
        got = tree_merge(BrokenPrivateApi(states)).estimate()
        assert got == want
