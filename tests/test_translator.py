"""Translator DSL tests — behaviors from client/test/test_translator.py:20-82."""

from __future__ import annotations

import pytest

from datalake_spark.translator import Translator, TranslatorError


def test_named_group():
    t = Translator(r".*job-(?P<job_id>[0-9]+)\.log$~job{job_id}")
    assert t.translate("/var/log/job-123.log") == "job123"


def test_multiple_groups():
    t = Translator(r"(?P<a>[a-z]+)-(?P<b>[0-9]+)~{b}_{a}")
    assert t.translate("abc-42") == "42_abc"


def test_numbered_group():
    t = Translator(r"([a-z]+)-([0-9]+)~{2}")
    assert t.translate("abc-42") == "42"


def test_literal_text():
    t = Translator(r"(?P<x>[0-9]+)~prefix-{x}-suffix")
    assert t.translate("99") == "prefix-99-suffix"


def test_missing_tilde():
    with pytest.raises(TranslatorError):
        Translator("no-tilde-here")


def test_bad_regex():
    with pytest.raises(TranslatorError):
        Translator("([unclosed~x")


def test_unknown_field():
    with pytest.raises(TranslatorError):
        Translator(r"(?P<a>x)~{b}")


def test_no_match_raises():
    t = Translator(r"^x(?P<a>[0-9]+)~{a}")
    with pytest.raises(TranslatorError):
        t.translate("yyy")


def test_column_expression(spark):
    t = Translator(r".*job-(?P<job_id>[0-9]+)\.log$~job{job_id}")
    from pyspark.sql import functions as F

    df = spark.createDataFrame([("/var/log/job-7.log",)], ["path"])
    out = df.select(t.column("path").alias("w")).collect()
    assert out[0]["w"] == "job7"


def test_column_matches_python(spark):
    expr = r"(?P<h>[a-z]+)\.(?P<d>[a-z]+)\.com~{d}-{h}"
    t = Translator(expr)
    paths = ["web.example.com", "db.corp.com"]
    df = spark.createDataFrame([(p,) for p in paths], ["path"])
    got = [r["w"] for r in df.select(t.column("path").alias("w")).collect()]
    assert got == [t.translate(p) for p in paths]
