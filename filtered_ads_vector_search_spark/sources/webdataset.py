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
    members = read_tar_members(spark, path)
    dot = F.instr(F.col("member_name"), ".")
    key = F.when(dot > 0, F.expr("substring(member_name, 1, instr(member_name, '.') - 1)")).otherwise(
        F.col("member_name")
    )
    ext = F.when(dot > 0, F.expr("substring(member_name, instr(member_name, '.') + 1)")).otherwise(
        F.lit("")
    )
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
    (modulo tar mtime fields, which are zeroed). Returns shards written."""
    import os

    os.makedirs(out_dir, exist_ok=True)
    assigned = df.select(
        F.pmod(F.xxhash64(F.col(name_col)), F.lit(n_shards)).alias("_s"),
        F.col(name_col).alias("n"),
        F.col(payload_col).alias("p"),
    ).repartition(n_shards, "_s")

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
            with tarfile.open(f"{out_dir}/shard-{s:05d}.tar", "w") as tf:
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
