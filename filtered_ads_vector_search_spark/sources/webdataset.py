"""WebDataset-style tar-shard source for multimodal corpora.

The de-facto large-scale multimodal input layout (the public WebDataset
convention: a corpus is a directory of .tar shards; each sample is a group
of members sharing a basename — `000123.jpg`, `000123.txt`, `000123.json`).
At 100 TB the SHARD is the unit of parallelism: Spark's `binaryFile` source
splits work shard-per-task, and each task iterates its tar in-stream with
the stdlib `tarfile` module — no seeks, no temp files, no external deps.

Two layers:

* ``read_tar_members`` — raw member relation:
  (shard, member_name, size, payload binary).
* ``read_webdataset`` — grouped sample relation: one row per sample key with
  a map<extension, payload> column (the WebDataset grouping rule: key =
  member name minus its extension, applied per shard).

Plans downstream are ordinary DataFrame ops (the payload column feeds the
`multimodal` decode/feature UDFs). Writing shards back out is
``write_tar_shards`` — one tar per partition via the same stdlib module,
deterministic member order (sorted by name) for reproducible artifacts.
"""

from __future__ import annotations

import io
import tarfile
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["read_tar_members", "read_webdataset", "write_tar_shards"]

_MEMBER_SCHEMA = (
    "shard string, member_seq long, member_name string, size long, payload binary"
)


def read_tar_members(spark: SparkSession, path: str) -> DataFrame:
    """(shard, member_name, size, payload) — one row per regular tar member.

    `binaryFile` hands each task whole shard bytes (shards are the split
    unit by construction — a tar is not block-splittable, and WebDataset
    sizes shards accordingly, typically 100 MB-1 GB); `tarfile` streams
    members out of the in-memory buffer. Arrow-batched, no Python per-row
    loop beyond the members themselves.
    """
    raw = spark.read.format("binaryFile").load(path)

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {
                "shard": [],
                "member_seq": [],
                "member_name": [],
                "size": [],
                "payload": [],
            }
            for shard_path, content in zip(pdf["path"], pdf["content"]):
                seq = 0
                with tarfile.open(
                    fileobj=io.BytesIO(content), mode="r:*"
                ) as tf:
                    for m in tf:
                        if not m.isfile():
                            continue
                        fh = tf.extractfile(m)
                        if fh is None:
                            continue
                        out["shard"].append(shard_path.rsplit("/", 1)[-1])
                        # file order within the tar — the tar convention is
                        # last-occurrence-wins for duplicate names, and the
                        # grouping layer needs the order to honor it
                        out["member_seq"].append(seq)
                        seq += 1
                        out["member_name"].append(m.name)
                        out["size"].append(m.size)
                        out["payload"].append(fh.read())
            yield pd.DataFrame(out)

    return raw.select("path", "content").mapInPandas(extract, _MEMBER_SCHEMA)


def read_webdataset(spark: SparkSession, path: str) -> DataFrame:
    """One row per WebDataset sample: (shard, key, parts map<ext, payload>).

    Grouping is the public WebDataset rule — key = member name up to the
    FIRST dot, extension = the rest — applied with a map-combinable
    groupBy(shard, key); samples never span shards, so the group fits one
    partition's slice of one tar. Duplicate member names within a shard
    (legal in tar; last occurrence wins by the format's convention) keep
    the highest member_seq payload instead of crashing map construction.
    """
    # The split point is the first dot of the BASENAME, with any directory
    # prefix kept in the key (the published WebDataset rule) — splitting on
    # the first dot of the full path would collapse distinct samples under a
    # dotted directory ('v1.0/000123.jpg' must key as 'v1.0/000123', not 'v1')
    members = read_tar_members(spark, path).withColumn(
        "_base", F.substring_index(F.col("member_name"), "/", -1)
    ).withColumn("_dot", F.instr(F.col("_base"), "."))
    prefix = F.expr(
        "substring(member_name, 1, length(member_name) - length(_base))"
    )
    key = F.when(
        F.col("_dot") > 0,
        F.concat(prefix, F.expr("substring(_base, 1, _dot - 1)")),
    ).otherwise(F.col("member_name"))
    ext = F.when(
        F.col("_dot") > 0, F.expr("substring(_base, _dot + 1)")
    ).otherwise(F.lit(""))
    latest = (
        members.select(
            "shard", key.alias("key"), ext.alias("ext"), "member_seq", "payload"
        )
        .groupBy("shard", "key", "ext")
        .agg(F.max_by("payload", "member_seq").alias("payload"))
    )
    return latest.groupBy("shard", "key").agg(
        F.map_from_entries(
            F.array_sort(F.collect_list(F.struct("ext", "payload")))
        ).alias("parts")
    )


def write_tar_shards(
    df: DataFrame, out_dir: str, n_shards: int, name_col: str = "member_name",
    payload_col: str = "payload",
) -> int:
    """Write (member_name, payload) rows as n_shards tar files under
    out_dir/shard-NNNNN.tar. Shard assignment is a deterministic hash of the
    member name (stable across partitioning); member order inside a shard is
    sorted by name, so byte-identical reruns produce byte-identical shards
    (modulo tar mtime fields, which are zeroed). Returns shards written.

    Shard bytes are written FROM THE EXECUTORS through a scheme-dispatched
    filesystem — plain POSIX I/O for local paths, `pyarrow.fs` for remote
    URIs (s3://, gs://, hdfs:// where libhdfs is available) — never a
    driver-side collect of shard bytes. An out_dir whose scheme pyarrow
    cannot resolve raises in the task rather than silently landing shards
    on executor-local disks (executors have no JVM gateway, so the Hadoop
    FileSystem route the layout-maintenance code uses is driver-only)."""
    assigned = df.select(
        F.pmod(F.xxhash64(F.col(name_col)), F.lit(n_shards)).alias("_s"),
        F.col(name_col).alias("n"),
        F.col(payload_col).alias("p"),
    ).repartition(n_shards, "_s")

    def _open_shard(fname: str):
        from urllib.parse import urlparse

        parsed = urlparse(out_dir)
        # single-letter schemes are Windows drive letters, not URIs
        if len(parsed.scheme) <= 1 or parsed.scheme == "file":
            import os

            # urlparse handles both URI renderings Hadoop/Java emit:
            # file:/tmp/x and file:///tmp/x both yield path='/tmp/x'
            local = parsed.path if parsed.scheme == "file" else out_dir
            os.makedirs(local, exist_ok=True)
            return open(f"{local}/{fname}", "wb")
        import pyarrow.fs as pafs

        fs, root = pafs.FileSystem.from_uri(out_dir)
        fs.create_dir(root, recursive=True)
        return fs.open_output_stream(f"{root}/{fname}")

    def write_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        rows = []
        for pdf in batches:
            rows.extend(zip(pdf["_s"], pdf["n"], pdf["p"]))
        if not rows:
            yield pd.DataFrame({"shard_id": [], "n_members": []})
            return
        by_shard: dict[int, list] = {}
        for s, n, p in rows:
            by_shard.setdefault(int(s), []).append((str(n), bytes(p)))
        out: dict[str, list] = {"shard_id": [], "n_members": []}
        for s, members in by_shard.items():
            with _open_shard(f"shard-{s:05d}.tar") as fh:
                # "w|" (stream mode): strictly sequential writes, no
                # seek/tell — required for remote output streams
                with tarfile.open(fileobj=fh, mode="w|") as tf:
                    for n, p in sorted(members):
                        info = tarfile.TarInfo(name=n)
                        info.size = len(p)
                        info.mtime = 0
                        tf.addfile(info, io.BytesIO(p))
            out["shard_id"].append(s)
            out["n_members"].append(len(members))
        yield pd.DataFrame(out)

    res = assigned.mapInPandas(
        write_partition, "shard_id long, n_members long"
    ).collect()
    return len(res)
