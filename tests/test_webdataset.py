"""WebDataset tar shard sink: byte-determinism across partitionings,
independent manifest verification, sample round-trip."""

from __future__ import annotations

import io
import json
import os
import tarfile

from dea_coastlines_spark.operators.bucketing import ar_bucket_shards
from dea_coastlines_spark.sources.webdataset import (
    read_webdataset_manifest,
    write_webdataset,
)
from dea_coastlines_spark.synth import corpus


def _sharded(spark, parts):
    spec = corpus.CorpusSpec(tile_px=64, halo_px=4, tiles_x=3, tiles_y=2,
                             year0=2000, year1=2002, obs_per_year=4,
                             cloud_frac=0.05, seed=9)
    pdf = corpus.generate_pandas(spec)
    tiles = spark.createDataFrame(pdf).repartition(parts)
    return pdf, ar_bucket_shards(tiles, "image_id", shard_size=16, seed=3)


def test_write_webdataset_roundtrip_and_manifest(spark, tmp_path):
    pdf, sharded = _sharded(spark, 4)
    out = str(tmp_path / "wds")
    manifest = write_webdataset(sharded, out).toPandas()
    assert manifest.n_samples.sum() == len(pdf)
    assert len(manifest) >= 2  # 72 rows / shard_size 16 -> several tars

    # independent verify pass agrees with the writer's manifest
    check = read_webdataset_manifest(spark, out).toPandas()
    assert manifest.sort_values("shard_name").reset_index(drop=True).equals(
        check.sort_values("shard_name").reset_index(drop=True)
    )

    # round-trip one tar: payload bytes and caption metadata intact
    name = manifest.shard_name.iloc[0]
    src = pdf.set_index("image_id")
    with tarfile.open(os.path.join(out, name)) as tar:
        members = tar.getnames()
        data = {m: tar.extractfile(m).read() for m in members}
    keys = [m[:-5] for m in members if m.endswith(".json")]
    assert keys
    for k in keys:
        meta = json.loads(data[f"{k}.json"])
        assert meta["caption"] == src.loc[k, "caption"]
        ext = meta["fmt"]
        assert data[f"{k}.{ext}"] == bytes(src.loc[k, "bytes"])


def test_write_webdataset_byte_deterministic(spark, tmp_path):
    _, a = _sharded(spark, 3)
    _, b = _sharded(spark, 17)
    ma = write_webdataset(a, str(tmp_path / "a")).toPandas()
    mb = write_webdataset(b, str(tmp_path / "b")).toPandas()
    ka = ma.sort_values("shard_name").reset_index(drop=True)
    kb = mb.sort_values("shard_name").reset_index(drop=True)
    assert ka.equals(kb)  # same names, counts, sizes, sha256 digests
