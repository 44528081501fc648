"""JSONL corpus source/sink (sources/jsonl.py)."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from dea_coastlines_spark.sources.jsonl import (
    DEFAULT_CORRUPT_COL,
    read_jsonl_corpus,
    split_corrupt,
    write_jsonl,
)

SCHEMA = "doc_id bigint, lang string, text string"


def _stage(spark, tmp_path, bad_lines=()):
    pdf = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4],
            "lang": ["en", "de", None, "zh"],
            # newline + quote + CJK: the characters JSON encoding must
            # escape or carry as UTF-8
            "text": ['a "quoted" line\nsecond', "straße", None, "你好，世界"],
        }
    )
    path = str(tmp_path / "docs")
    write_jsonl(spark.createDataFrame(pdf).repartition(2), path)
    if bad_lines:
        with open(path + "/part-extra-corrupt.json", "w") as f:
            f.write("\n".join(bad_lines) + "\n")
    return pdf, path


def test_roundtrip_values_exact(spark, tmp_path):
    pdf, path = _stage(spark, tmp_path)
    got = (
        read_jsonl_corpus(spark, path, SCHEMA)
        .drop(DEFAULT_CORRUPT_COL)
        .orderBy("doc_id")
        .toPandas()
    )
    want = pdf.sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_malformed_lines_quarantined_not_dropped(spark, tmp_path):
    bad = ['{"doc_id": 9, "lang": "en', "not json", "}{"]
    _, path = _stage(spark, tmp_path, bad_lines=bad)
    df = read_jsonl_corpus(spark, path, SCHEMA)
    good, quarantine = split_corrupt(df)
    assert good.count() == 4
    # quarantine-only queries work (split_corrupt materializes past
    # Spark's corrupt-column-only scan restriction) and carry the raw
    # line text verbatim
    rows = sorted(r.raw_line for r in quarantine.collect())
    assert rows == sorted(bad)
    # data columns are NULL on quarantined rows
    assert (
        df.filter(F.col(DEFAULT_CORRUPT_COL).isNotNull())
        .filter(F.col("doc_id").isNotNull())
        .count()
        == 0
    )


def test_missing_and_extra_fields_are_permissive(spark, tmp_path):
    path = str(tmp_path / "j")
    import os

    os.makedirs(path)
    with open(path + "/part-0.json", "w") as f:
        f.write('{"doc_id": 1}\n')  # missing fields -> NULL
        f.write('{"doc_id": 2, "lang": "en", "text": "t", "extra": 5}\n')
    df = read_jsonl_corpus(spark, path, SCHEMA)
    got = df.orderBy("doc_id").collect()
    assert [r.doc_id for r in got] == [1, 2]
    assert got[0].lang is None and got[0].text is None
    assert got[1].lang == "en"  # extra field ignored, not corrupt
    assert all(r[DEFAULT_CORRUPT_COL] is None for r in got)


def test_corrupt_col_collision_raises(spark, tmp_path):
    with pytest.raises(ValueError, match="collides"):
        read_jsonl_corpus(
            spark, str(tmp_path), "a bigint, b string", corrupt_col="b"
        )
