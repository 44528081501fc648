"""WebDataset-style tar shard sink for image training export.

The standard contract for feeding web-scale image corpora (the
input_hint table shape: image_id/bytes/w/h/fmt/caption/phash) into
training loaders is one tar file per shard, each sample a pair of
members `<key>.<ext>` (payload) + `<key>.json` (metadata) — the layout
webdataset / torchdata / NVIDIA DALI consume sequentially. This sink
closes the loop behind operators/bucketing.ar_bucket_shards: bucket +
shard assignment up-stream (deterministic, partition-invariant), tar
materialization down here.

Scale design: ONE applyInPandas group per shard — each executor
streams its own shard's rows into its own tar and writes it directly
to `path` (a shared filesystem / object-store mount on a real
cluster), so the driver never sees sample bytes and shard count ==
task count scales with the cluster. Shard size is bounded upstream
(~shard_size rows), so a group always fits an executor. The returned
manifest (one row per shard: member count, byte size, sha256) is the
only thing that leaves the executors.

Determinism: members are written in (pos, key) order with zeroed
mtime/uid/gid/uname (USTAR), so a re-run — any partitioning, any
cluster size — produces byte-identical tars with identical digests;
the manifest sha256 doubles as the resume/verify checksum for
checkpointed exports.
"""

from __future__ import annotations

import hashlib
import io
import json
import os
import tarfile

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


MANIFEST_SCHEMA = (
    "shard_name string, n_samples long, tar_bytes long, sha256 string"
)


def _tar_add(tar: tarfile.TarFile, name: str, payload: bytes) -> None:
    info = tarfile.TarInfo(name=name)
    info.size = len(payload)
    info.mtime = 0
    info.uid = info.gid = 0
    info.uname = info.gname = ""
    tar.addfile(info, io.BytesIO(payload))


def write_webdataset(
    df: DataFrame,
    path: str,
    key_col: str = "image_id",
    data_col: str = "bytes",
    ext_col: str | None = "fmt",
    shard_cols: tuple[str, ...] = ("bucket_id", "shard"),
    order_col: str = "pos",
) -> DataFrame:
    """Write one `<bucket>-<shard>.tar` per shard group under `path`;
    returns the collected shard manifest as a DataFrame (small: one
    row per shard). Metadata members carry every column except the
    payload, JSON-encoded with sorted keys.

    `df` is typically `ar_bucket_shards(corpus, ...)` output; any
    grouping columns work via `shard_cols`, and `order_col=None`
    falls back to key order.
    """
    os.makedirs(path, exist_ok=True)
    meta_cols = [
        c for c in df.columns if c not in (data_col,)
    ]
    order = [order_col] if order_col else []
    shard_cols = list(shard_cols)

    def pack(key, pdf):
        import pandas as pd

        shard_name = "-".join(f"{int(k):05d}" for k in key) + ".tar"
        pdf = pdf.sort_values(order + [key_col]).reset_index(drop=True)
        buf = io.BytesIO()
        with tarfile.open(fileobj=buf, mode="w", format=tarfile.USTAR_FORMAT) as tar:
            for i in range(len(pdf)):
                k = str(pdf[key_col].iloc[i])
                ext = str(pdf[ext_col].iloc[i]) if ext_col else "bin"
                _tar_add(tar, f"{k}.{ext}", bytes(pdf[data_col].iloc[i]))
                meta = {}
                for c in meta_cols:
                    v = pdf[c].iloc[i]
                    if hasattr(v, "item"):
                        v = v.item()
                    meta[c] = v
                _tar_add(
                    tar,
                    f"{k}.json",
                    json.dumps(meta, sort_keys=True).encode(),
                )
        blob = buf.getvalue()
        # atomic publish: a killed task never leaves a torn tar for the
        # resume pass to trust
        tmp = os.path.join(path, f".{shard_name}.tmp-{os.getpid()}")
        with open(tmp, "wb") as f:
            f.write(blob)
        os.replace(tmp, os.path.join(path, shard_name))
        return pd.DataFrame(
            {
                "shard_name": [shard_name],
                "n_samples": [len(pdf)],
                "tar_bytes": [len(blob)],
                "sha256": [hashlib.sha256(blob).hexdigest()],
            }
        )

    return (
        df.groupBy(*shard_cols)
        .applyInPandas(pack, MANIFEST_SCHEMA)
        .orderBy("shard_name")
    )


def read_webdataset_manifest(spark, path: str) -> DataFrame:
    """Independent verify pass: re-scan the written tars (names, member
    counts, digests) without trusting the writer's return value."""
    rows = []
    for name in sorted(os.listdir(path)):
        if not name.endswith(".tar"):
            continue
        full = os.path.join(path, name)
        with open(full, "rb") as f:
            blob = f.read()
        with tarfile.open(full) as tar:
            members = tar.getnames()
        rows.append(
            (
                name,
                sum(1 for m in members if not m.endswith(".json")),
                len(blob),
                hashlib.sha256(blob).hexdigest(),
            )
        )
    return spark.createDataFrame(
        rows, "shard_name string, n_samples long, tar_bytes long, sha256 string"
    )
