"""Distributed reader for the reference's packed fixed-width key format.

The reference benchmark reads a flat binary file of back-to-back 20-byte
keys (``const Address = [20]u8``, file mmap'd and reinterpreted —
/root/reference/src/bench.zig:16,26-31; produced by bench-data/bench_data.py
as packed Arrow fixed-width buffers). This module reads the same layout
DISTRIBUTED: ``sc.binaryRecords`` splits the file into fixed-length records
across executors (Hadoop FixedLengthInputFormat — each split is
record-aligned), so a 50M-key file scans in parallel instead of through
one driver mmap.

The output column is the raw key bytes; hash with ``xxhash64`` downstream
exactly like any other key column (documented XxHash3 deviation, SURVEY
§8.2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import BinaryType, StructField, StructType

RECORD_LEN = 20  # the reference's Address width (src/bench.zig:16)


def read_packed_keys(spark: SparkSession, path: str,
                     record_len: int = RECORD_LEN,
                     key_col: str = "key") -> DataFrame:
    """(key binary) — one row per fixed-width record in the packed file."""
    if record_len <= 0:
        raise ValueError("record_len must be positive")
    rdd = spark.sparkContext.binaryRecords(path, record_len)
    schema = StructType([StructField(key_col, BinaryType(), False)])
    return spark.createDataFrame(rdd.map(lambda b: (bytes(b),)), schema)


def write_packed_keys(df: DataFrame, key_col: str, path: str,
                      record_len: int = RECORD_LEN) -> int:
    """Test/fixture helper: write a key column as one packed binary file
    (driver-side — fixtures only; the read path is the distributed one).
    Keys are right-padded with zeros / truncated to ``record_len``.
    Returns the number of records written."""
    rows = df.select(key_col).collect()
    with open(path, "wb") as f:
        for r in rows:
            b = r[0] if isinstance(r[0], (bytes, bytearray)) else str(r[0]).encode()
            f.write(bytes(b[:record_len]).ljust(record_len, b"\x00"))
    return len(rows)
