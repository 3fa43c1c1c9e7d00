"""Sequence packing for LLM training-data emission.

A training run doesn't consume documents — it consumes FIXED-LENGTH token
sequences. The standard GPT-style emission concatenates every document
(in some deterministic order) into one logical token stream and chunks
that stream every ``seq_len`` tokens, letting documents straddle sequence
boundaries. The two operators here compute that layout as a pure function
of (seed, doc ids, token counts), so any executor — or a re-run months
later — materializes byte-identical shards:

- ``token_offsets``: each document's global start offset in the
  concatenated stream — a distributed prefix sum;
- ``pack_sequences``: the (sequence, document-slice) manifest derived
  from those offsets with map-only arithmetic.

The prefix sum is the part that is easy to get WRONG at scale: a window
over a global ORDER BY with no PARTITION BY collapses the corpus onto a
single reducer. Instead this module does the classic two-phase scan:
range-partition by the order key, per-partition local cumsums (one
Arrow-vectorized map pass, zero shuffle), per-partition totals (a
partition-count-sized aggregate) broadcast back as prefix offsets. No
stage ever sees more than its own partition plus a KB-sized offsets map.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pyarrow as pa
from pyspark.sql import DataFrame, functions as F


def token_offsets(docs: DataFrame, id_col: str = "doc_id",
                  token_col: str | None = None, text_col: str = "text",
                  seed: str = "42") -> DataFrame:
    """(id, n_tokens, start_offset): each document's start position in
    the logical concatenation of all documents ordered by
    (md5(seed:id), id) — the same deterministic hash order as
    ``per_key_quota`` / ``token_budget_sample``, so the stream layout is
    reproducible across engines, partitionings, and re-runs, and
    uncorrelated with crawl order (adjacent training tokens should not
    be adjacent crawl pages).

    ``token_col`` names a precomputed token-count column; otherwise
    whitespace tokens of ``text_col`` are counted inline. Zero-token
    rows (NULL text) are excluded — they occupy no stream positions.

    Scale shape — a distributed prefix sum, NOT a global window (a
    window with ORDER BY and no PARTITION BY funnels the corpus through
    ONE reducer; Spark even warns): range-partition + local sort on the
    order key (one shuffle of (id, n, hash) triples — bytes per row, not
    text), then per-partition totals via spark_partition_id (an
    aggregate of partition-count rows collected to the driver), then one
    Arrow map pass that adds each partition's broadcast prefix to its
    local exclusive cumsum. The sorted projection is persisted so the
    totals pass and the offsets pass share one shuffle; like
    ``ivf_index`` it stays cached for plan reuse (~24 bytes/row — at
    10^10 docs budget ~240 GB of executor storage across the cluster,
    or ``spark.catalog.clearCache()`` after the manifest materializes).
    """
    n_tok = (F.col(token_col).cast("long") if token_col
             else F.size(F.split(F.col(text_col), " ")).cast("long"))
    h = F.md5(F.concat_ws(":", F.lit(seed), F.col(id_col)))
    base = (docs.select(F.col(id_col), n_tok.alias("n_tokens"),
                        h.alias("__h"))
            .filter(F.col("n_tokens") > 0)
            .repartitionByRange("__h", id_col)
            .sortWithinPartitions("__h", id_col)
            .persist())
    totals = {r["pid"]: r["t"] for r in
              base.groupBy(F.spark_partition_id().alias("pid"))
                  .agg(F.sum("n_tokens").alias("t")).collect()}
    prefix: dict[int, int] = {}
    acc = 0
    for pid in sorted(totals):
        prefix[pid] = acc
        acc += totals[pid]

    def add_offsets(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        from pyspark import TaskContext
        run = prefix.get(TaskContext.get().partitionId(), 0)
        for batch in batches:
            n = batch.column(1).to_numpy(zero_copy_only=False).astype(np.int64)
            ends = np.cumsum(n)
            starts = ends - n + run
            run += int(ends[-1]) if len(ends) else 0
            yield pa.RecordBatch.from_arrays(
                [batch.column(0), batch.column(1), pa.array(starts)],
                names=[batch.schema.names[0], "n_tokens", "start_offset"])

    out_schema = f"{id_col} long, n_tokens long, start_offset long"
    return base.mapInArrow(add_offsets, out_schema)


def pack_sequences(docs: DataFrame, seq_len: int, id_col: str = "doc_id",
                   token_col: str | None = None, text_col: str = "text",
                   seed: str = "42") -> DataFrame:
    """The packed-sequence manifest: one row per (sequence, document
    slice), the exact recipe a shard writer follows to emit fixed-length
    training sequences from variable-length documents with NO padding
    between them (documents straddle boundaries; the final sequence of
    the stream may be short).

    Columns: (seq_id, <id_col>, seq_pos, doc_begin, slice_len) — tokens
    [doc_begin, doc_begin + slice_len) of the document land at position
    ``seq_pos`` of sequence ``seq_id``. Every sequence except the last
    packs exactly ``seq_len`` tokens; per document, slices are
    contiguous and sum to its token count (both test-gated).

    Scale shape: ``token_offsets`` (see its docstring) plus map-only
    arithmetic — the boundary-straddle fan-out is an explode over
    ``sequence(first_seq, last_seq)``, i.e. 1 + floor(n/seq_len)-ish
    rows per document, never a shuffle. Writers then group by seq_id
    (or repartitionByRange on it) to emit shards.
    """
    if seq_len <= 0:
        raise ValueError("seq_len must be positive")
    offs = token_offsets(docs, id_col, token_col, text_col, seed)
    s, n = F.col("start_offset"), F.col("n_tokens")
    L = F.lit(seq_len).cast("long")
    # EXACT integer division (`div`): long/long with `/` yields a double,
    # whose 53-bit mantissa can round the floor UP at extreme stream
    # offsets (~4e15+ tokens) and misalign every downstream slice — the
    # DuckDB twin uses exact '//'; `div` keeps both engines bit-identical
    # at any offset.
    spans = offs.select(
        id_col, "n_tokens", "start_offset",
        F.explode(F.sequence(
            F.expr(f"start_offset div {int(seq_len)}"),
            F.expr(f"(start_offset + n_tokens - 1) div {int(seq_len)}")))
        .alias("seq_id"))
    b = F.col("seq_id") * L  # this sequence's stream-global start
    begin_g = F.greatest(s, b)
    end_g = F.least(s + n, b + L)
    return spans.select(
        "seq_id", id_col,
        (begin_g - b).cast("long").alias("seq_pos"),
        (begin_g - s).cast("long").alias("doc_begin"),
        (end_g - begin_g).cast("long").alias("slice_len"))
