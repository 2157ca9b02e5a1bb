"""CSV grammar edge cases (reference CsvParser.hs:12-45; FIXTURES.md §A5)."""

from __future__ import annotations

import pytest

from kevinlang_spark.errors import KevinValueError
from kevinlang_spark.sources.csv import read_csv
from kevinlang_spark.traits import DataRole, KType


def _write(tmp_path, name, text):
    p = tmp_path / name
    p.write_text(text)
    return str(p)


def test_quoted_strings_with_escapes(spark, tmp_path):
    # RFC-4180 `""` escaping inside quoted fields (CsvParser.hs:33-36)
    path = _write(
        tmp_path,
        "q.csv",
        'name,notes\nalice,"said ""hi"", left"\nbob,"one,two"\n',
    )
    kf = read_csv(spark, path)
    rows = kf.collect()
    assert rows[0]["notes"] == 'said "hi", left'
    assert rows[1]["notes"] == "one,two"


def test_scientific_notation_numbers(spark, tmp_path):
    # Scientific numbers parse as exact decimals (CsvParser.hs:27-28)
    path = _write(tmp_path, "s.csv", "x\n1.5e3\n2E2\n0.5e-1\n")
    kf = read_csv(spark, path)
    assert kf.traits["x"].ktype == KType.NUMBER
    vals = [r["x"] for r in kf.collect()]
    assert vals == [1500.0, 200.0, 0.05]


def test_trailing_whitespace_trimmed(spark, tmp_path):
    # whole-file trim before parse (DataFrame.hs:184-185)
    path = _write(tmp_path, "t.csv", "a,b\n1,x\n2,y\n\n\n")
    kf = read_csv(spark, path)
    assert kf.height() == 2


def test_numeric_column_with_text(spark, tmp_path):
    # mixed numbers and words: the reference's makeField hits the
    # otherwise-guard and ERRORS (DataFrame.hs:237-238); lenient mode
    # keeps the column as Text
    path = _write(tmp_path, "m.csv", "a\n1\nx\n2\n")
    with pytest.raises(KevinValueError, match="Invalid data"):
        read_csv(spark, path)
    kf = read_csv(spark, path, strict=False)
    assert kf.traits["a"].ktype == KType.TEXT
    assert kf.traits["a"].role == DataRole.DIMENSION


def test_missing_values_strict_vs_lenient(spark, tmp_path):
    path = _write(tmp_path, "miss.csv", "A,B\n100,200\n200,200\n200,100\n3,\n,5\n")
    with pytest.raises(KevinValueError, match="Invalid data"):
        read_csv(spark, path)
    kf = read_csv(spark, path, strict=False)
    assert kf.height() == 5
    # lenient: numeric-where-present stays a numeric measure
    assert kf.traits["A"].ktype == KType.NUMBER
    # NULL semantics: filter drops the missing row (Empty → False)
    assert kf.filter("A", lambda c: c > 0).height() == 4


def test_year_rule_only_for_exact_name(spark, tmp_path):
    path = _write(tmp_path, "y.csv", "year,years\n2001,2001\n2002,2002\n")
    kf = read_csv(spark, path)
    assert kf.traits["year"].role == DataRole.DIMENSION
    assert kf.traits["years"].role == DataRole.MEASURE


def test_write_csv_roundtrips_reference_grammar(spark, tmp_path):
    """write_csv output must re-read through read_csv (quotes, escaped
    quotes, commas-in-fields, NULL as blank) with values intact."""
    from kevinlang_spark.sources.csv import read_csv, write_csv

    df = spark.createDataFrame(
        [
            ('plain', 1.5),
            ('with,comma', 2.0),
            ('with "quotes" inside', 3.25),
            (None, 4.0),
        ],
        ["label", "x"],
    )
    path = str(tmp_path / "out_csv")
    write_csv(df, path)
    back = read_csv(spark, path, strict=False, ordered=False)
    got = {(r.label, r.x) for r in back.df.collect()}
    assert got == {
        ("plain", 1.5),
        ("with,comma", 2.0),
        ('with "quotes" inside', 3.25),
        (None, 4.0),
    }


def test_write_csv_partitioned_dirs(spark, tmp_path):
    import glob

    from kevinlang_spark.sources.csv import write_csv

    df = spark.createDataFrame(
        [("a", 1), ("a", 2), ("b", 3)], ["g", "v"]
    )
    path = str(tmp_path / "part_csv")
    write_csv(df, path, partition_by=["g"])
    assert glob.glob(f"{path}/g=a/*.csv") and glob.glob(f"{path}/g=b/*.csv")
    back = spark.read.option("header", True).csv(path)
    assert back.count() == 3
