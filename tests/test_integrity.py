"""Corpus ingest-gate validation (operators/integrity.py): each planted
corruption class is caught by exactly the intended flag; clean rows
pass end-to-end; summary counts agree with per-row flags."""

import numpy as np
import pandas as pd
import pytest

from dea_coastlines_spark.codecs import image as ic
from dea_coastlines_spark.operators import integrity
from dea_coastlines_spark.synth import corpus


@pytest.fixture(scope="module")
def clean_pdf():
    spec = corpus.CorpusSpec(tile_px=32, halo_px=4, tiles_x=2, tiles_y=2,
                             year0=2000, year1=2000, obs_per_year=2,
                             cloud_frac=0.05, seed=21, fmt="mixed")
    return corpus.generate_pandas(spec)


def _flags(spark, pdf, **kw):
    df = spark.createDataFrame(pdf)
    return (
        integrity.validate_corpus(df, **kw)
        .toPandas()
        .set_index("image_id")
        .sort_index()
    )


def test_clean_corpus_fully_valid(spark, clean_pdf):
    out = _flags(spark, clean_pdf)
    assert bool(out.is_valid.all()), out[~out.is_valid]


def test_each_corruption_caught_by_its_flag(spark, clean_pdf):
    pdf = clean_pdf.copy().reset_index(drop=True)
    ids = pdf.image_id.tolist()
    pdf.loc[0, "w"] = int(pdf.loc[0, "w"]) + 1            # dims
    pdf.loc[1, "fmt"] = "tiff" if pdf.loc[1, "fmt"] != "tiff" else "png"
    pdf.loc[2, "bytes"] = bytes(pdf.loc[2, "bytes"])[:32]  # truncation
    pdf.loc[3, "caption"] = "{broken"                      # bad JSON
    pdf.loc[4, "caption"] = '{"year": 2000}'               # missing keys
    pdf.loc[5, "phash"] = int(pdf.loc[5, "phash"]) ^ ((1 << 40) - 1)
    out = _flags(spark, pdf)
    r = out.loc[ids[0]]
    assert not r.dims_ok and r.decode_ok and r.fmt_ok and not r.is_valid
    r = out.loc[ids[1]]
    assert not r.fmt_ok and not r.is_valid
    r = out.loc[ids[2]]
    assert r.fmt_ok and not r.decode_ok and not r.is_valid  # magic intact
    r = out.loc[ids[3]]
    assert not r.caption_ok and r.decode_ok and not r.is_valid
    r = out.loc[ids[4]]
    assert not r.caption_ok and not r.is_valid
    r = out.loc[ids[5]]
    assert r.decode_ok and r.dims_ok and not r.phash_ok and not r.is_valid
    # untouched rows stay valid
    assert bool(out.loc[ids[6:]].is_valid.all())


def test_phash_tolerance_modes(spark, clean_pdf):
    pdf = clean_pdf.copy().reset_index(drop=True)
    pdf.loc[0, "phash"] = int(pdf.loc[0, "phash"]) ^ 0b11  # 2-bit drift
    iid = pdf.loc[0, "image_id"]
    assert bool(_flags(spark, pdf, phash_tol=2).loc[iid].phash_ok)
    assert not bool(_flags(spark, pdf, phash_tol=1).loc[iid].phash_ok)
    # check_phash=False: column NULL, validity ignores it
    off = _flags(spark, pdf, check_phash=False)
    assert off.phash_ok.isna().all()
    assert bool(off.loc[iid].is_valid)


def test_summary_matches_per_row(spark, clean_pdf):
    pdf = integrity.plant_corruptions(clean_pdf)
    df = spark.createDataFrame(pdf)
    flags = integrity.validate_corpus(df)
    per_row = flags.toPandas()
    s = integrity.integrity_summary(flags).collect()[0].asDict()
    assert s["n_rows"] == len(per_row)
    assert s["bad_fmt"] == int((~per_row.fmt_ok).sum())
    assert s["bad_caption"] == int((~per_row.caption_ok).sum())
    assert s["bad_decode"] == int((~per_row.decode_ok).sum())
    assert s["bad_dims"] == int((~per_row.dims_ok).sum())
    assert s["bad_phash"] == int((~per_row.phash_ok.fillna(True)).sum())
    assert s["n_valid"] == int(per_row.is_valid.sum())


def test_sniff_fmt_is_jvm_only(spark, clean_pdf):
    # the sniff must stay a codegen expression: no BatchEvalPython /
    # ArrowEvalPython node in the plan of a sniff-only projection
    from pyspark.sql import functions as F

    df = spark.createDataFrame(clean_pdf)
    proj = df.select("image_id", integrity.sniff_fmt(F.col("bytes")).alias("s"))
    plan = proj._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan
    got = proj.toPandas().set_index("image_id").s
    want = df.select("image_id", "fmt").toPandas().set_index("image_id").fmt
    assert (got == want).all()
