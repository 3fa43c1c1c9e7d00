"""Driver-side small-file IO through the JVM Hadoop FileSystem API.

Store markers (sketch/signature family pins) are ONE KB-sized JSON row.
Writing them as a Spark job (``createDataFrame(...).coalesce(1).write
.json``) costs a full job submission — measured 4.5 s per marker on the
round-6 sketch-store bench, dominating a fresh store's first epoch write.
The Hadoop FileSystem API reaches the same storage Spark writes to
(local, HDFS, S3A — whatever the session's Hadoop conf resolves for the
path), costs no job, and produces a plain ``<name>.json`` file that
``spark.read.json(dir)`` reads exactly like the old part-file layout, so
stores written by earlier rounds stay readable and vice versa.

Driver-side by design: markers are metadata, not data — nothing here is
ever on a per-row path.
"""

from __future__ import annotations


def overwrite_json_marker(spark, dir_path: str, payload: str,
                          filename: str = "marker.json") -> None:
    """(Re)create ``dir_path`` holding a single ``filename`` with
    ``payload`` (one JSON object per line, the json-lines layout Spark's
    reader expects). Replaces the directory atomically enough for a
    metadata marker: delete + mkdirs + create-overwrite."""
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(dir_path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    fs.delete(jpath, True)
    fs.mkdirs(jpath)
    out = fs.create(
        jvm.org.apache.hadoop.fs.Path(f"{dir_path.rstrip('/')}/{filename}"),
        True)
    try:
        out.write(bytearray(payload.encode("utf-8")))
    finally:
        out.close()
