"""Span search/filter operators (F2-F5, O1) + S1 format dispatch."""

from __future__ import annotations

import pytest

from text_extractor_for_bioeconomic_products_spark.operators.extract import (
    explode_spans,
    extract_turns,
)
from text_extractor_for_bioeconomic_products_spark.operators.search import (
    filter_by_category,
    filter_by_confidence,
    filter_by_country,
    search_spans,
)


@pytest.fixture(scope="module")
def spans(transcripts_df):
    df = explode_spans(extract_turns(transcripts_df))
    df.cache()
    df.count()
    return df


def test_filter_by_confidence(spans):
    hi = filter_by_confidence(spans, 0.9)
    assert hi.count() > 0
    assert hi.filter("confianca < 0.9").count() == 0


def test_filter_by_country_case_insensitive(spans):
    got = filter_by_country(spans, ["BRAZIL"])
    assert got.count() > 0
    rows = got.limit(50).collect()
    assert all(any(p.lower() == "brazil" for p in r["paises"]) for r in rows)


def test_filter_by_category_exists(spans):
    med = filter_by_category(spans, "medicinal")
    assert med.count() > 0
    assert all("medicinal" in r["tipos_uso"] for r in med.limit(50).collect())


def test_search_spans_composed(spans):
    got = search_spans(
        spans, name_like="maca", country="Peru", min_confidence=0.5, limit=10
    ).collect()
    assert 0 < len(got) <= 10
    assert all("maca" in r["nome_canonico"] for r in got)
    # ordered by confidence desc
    confs = [r["confianca"] for r in got]
    assert confs == sorted(confs, reverse=True)


def test_search_spans_no_filters_topk(spans):
    got = search_spans(spans, limit=5).collect()
    assert len(got) == 5


def test_format_dispatch_roundtrip(spark, transcripts_df, tmp_path):
    """S1: json and csv transcript scans produce the same rows as parquet."""
    from pyspark.sql import functions as F

    from text_extractor_for_bioeconomic_products_spark.sources.transcripts import (
        read_transcripts,
    )

    sample = transcripts_df.limit(200).cache()
    n = sample.count()
    pq, js = str(tmp_path / "pq"), str(tmp_path / "js")
    sample.write.parquet(pq)
    sample.write.json(js)
    assert read_transcripts(spark, pq, "parquet").count() == n
    back = read_transcripts(spark, js, "json")
    assert back.count() == n
    # value fidelity on the key + text columns
    a = sample.select(F.sum(F.xxhash64("conv_id", "turn_idx", "text").cast("decimal(38,0)"))).collect()
    b = back.select(F.sum(F.xxhash64("conv_id", "turn_idx", "text").cast("decimal(38,0)"))).collect()
    assert a == b
    with pytest.raises(ValueError, match="unsupported"):
        read_transcripts(spark, pq, "xml")


def test_avro_ocf_roundtrip_and_dispatch(spark, transcripts_df, tmp_path):
    """Pure-stdlib Avro OCF source/sink: distributed write (one file
    per Arrow batch, content-hash names) then distributed read returns
    EXACTLY the input rows and schema — including timestamps and
    nullable nulls — and the S1 dispatch routes fmt='avro'."""
    from pyspark.sql import functions as F

    from text_extractor_for_bioeconomic_products_spark.sources.avro import (
        read_avro,
        write_avro_distributed,
    )
    from text_extractor_for_bioeconomic_products_spark.sources.transcripts import (
        read_transcripts,
    )

    sample = transcripts_df.limit(300).cache()
    n = sample.count()
    adir = str(tmp_path / "avro")
    manifest = write_avro_distributed(sample.repartition(3), adir)
    mrows = manifest.collect()
    assert sum(r["n_rows"] for r in mrows) == n
    assert all(r["file"].endswith(".avro") for r in mrows)

    back = read_avro(spark, adir)
    assert back.schema == sample.schema
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, sample.collect()))

    # S1 dispatch routes avro; foreign-schema avro dirs are refused
    assert read_transcripts(spark, adir, "avro").count() == n
    foreign = str(tmp_path / "foreign_avro")
    write_avro_distributed(
        spark.range(5).selectExpr("id AS k", "CAST(id AS STRING) AS v"),
        foreign,
    )
    with pytest.raises(ValueError, match="not a transcripts table"):
        read_transcripts(spark, foreign, "avro")

    # idempotent rerun: content-hash names → same file set, no dupes
    files_before = sorted(__import__("os").listdir(adir))
    write_avro_distributed(sample.repartition(3), adir)
    assert sorted(__import__("os").listdir(adir)) == files_before

    # null handling survives: inject NULL text/tool rows and roundtrip
    nulled = sample.withColumn(
        "text", F.when(F.col("turn_idx") % 5 == 0, None).otherwise(F.col("text"))
    )
    ndir = str(tmp_path / "nulled")
    write_avro_distributed(nulled, ndir)
    got = read_avro(spark, ndir)
    assert got.filter("text IS NULL").count() == nulled.filter("text IS NULL").count()
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, nulled.collect()))


def test_avro_bad_file_quarantine_and_audit(spark, transcripts_df, tmp_path):
    """Per-file error tolerance (the S5 discipline applied to the OCF
    scan): a torn file fails the strict default, bad_files='skip'
    keeps the scan alive with exactly the intact files' rows, and
    audit_avro names the quarantined file with its error — skipping
    without the audit trail would be silent data loss."""
    import os

    from text_extractor_for_bioeconomic_products_spark.sources.avro import (
        audit_avro,
        read_avro,
        write_avro_distributed,
    )

    sample = transcripts_df.limit(200).cache()
    n = sample.count()
    adir = str(tmp_path / "avro")
    write_avro_distributed(sample.repartition(2), adir)
    files = sorted(f for f in os.listdir(adir) if f.endswith(".avro"))
    assert len(files) >= 2
    # tear the first file mid-block
    victim = os.path.join(adir, files[0])
    blob = open(victim, "rb").read()
    open(victim, "wb").write(blob[: len(blob) // 2])

    with pytest.raises(Exception):
        read_avro(spark, adir).count()

    audit = {r["file"]: r for r in audit_avro(spark, adir).collect()}
    assert not audit[files[0]]["ok"]
    assert audit[files[0]]["error"] and "Avro" in audit[files[0]]["error"]
    assert all(audit[f]["ok"] for f in files[1:])
    survivors = sum(audit[f]["n_rows"] for f in files[1:])
    assert survivors < n

    got = read_avro(spark, adir, bad_files="skip")
    assert got.count() == survivors

    with pytest.raises(ValueError, match="bad_files"):
        read_avro(spark, adir, bad_files="maybe")


def test_avro_nested_extraction_output_roundtrip(spark, transcripts_df, tmp_path):
    """The recursive codec closes the OUTPUT side: the extraction
    result — spans array<struct<..., array<string>>> — persists to
    Avro and reads back EXACTLY (schema and every nested value), so a
    pipeline can hand its extracted spans to Kafka-ecosystem consumers
    without a lossy flattening step."""
    from text_extractor_for_bioeconomic_products_spark.operators.extract import (
        extract_turns,
    )
    from text_extractor_for_bioeconomic_products_spark.sources.avro import (
        read_avro,
        write_avro_distributed,
    )

    out = extract_turns(transcripts_df.limit(400)).cache()
    n = out.count()
    adir = str(tmp_path / "x")
    write_avro_distributed(out.repartition(3), adir)
    back = read_avro(spark, adir)
    assert back.schema == out.schema
    assert sorted(map(str, back.collect())) == sorted(map(str, out.collect()))
    assert (back.agg({"n_spans": "sum"}).collect()
            == out.agg({"n_spans": "sum"}).collect())
    assert n == back.count()


def test_avro_ocf_bytes_level_contracts():
    """The OCF walk is real: deflate and null codecs roundtrip
    byte-deterministically; sync-marker corruption, block-count lies,
    truncation, unknown codecs, and non-flat schemas all refuse."""
    import pytest as _pytest

    from text_extractor_for_bioeconomic_products_spark.sources.avro import (
        read_avro_bytes,
        read_avro_header,
        write_avro_bytes,
    )

    schema = {
        "type": "record", "name": "row", "fields": [
            {"name": "k", "type": "long"},
            {"name": "s", "type": ["null", "string"]},
            {"name": "d", "type": "double"},
            {"name": "b", "type": "boolean"},
            {"name": "y", "type": "bytes"},
        ],
    }
    recs = [
        (i, None if i % 3 == 0 else f"s{i}é", i * 0.5, i % 2 == 0,
         bytes([i % 256, 255 - i % 256]))
        for i in range(500)
    ]
    for codec in ("null", "deflate"):
        p = write_avro_bytes(recs, schema, codec=codec)
        assert p == write_avro_bytes(recs, schema, codec=codec)
        got_schema, got = read_avro_bytes(p)
        assert got == recs and got_schema == schema

    p = write_avro_bytes(recs, schema, codec="deflate")
    _schema, codec, sync, first = read_avro_header(p)
    assert codec == "deflate"
    # corrupt the trailing sync marker of the last block
    corrupted = p[:-16] + bytes(16)
    with _pytest.raises(ValueError, match="sync"):
        read_avro_bytes(corrupted)
    # truncation mid-block
    with _pytest.raises(ValueError):
        read_avro_bytes(p[: len(p) - 20])
    # bad magic
    with _pytest.raises(ValueError, match="magic"):
        read_avro_bytes(b"Nope" + p[4:])
    # unknown codec refuses rather than guessing
    with _pytest.raises(NotImplementedError):
        write_avro_bytes(recs, schema, codec="snappy")
    # maps stay out of scope — error, never silent coercion
    from text_extractor_for_bioeconomic_products_spark.sources.avro import (
        spark_schema_of,
    )
    with _pytest.raises(NotImplementedError):
        spark_schema_of({
            "type": "record", "name": "r", "fields": [
                {"name": "a", "type": {"type": "map", "values": "long"}},
            ],
        })


def test_avro_varint_property():
    """Hypothesis battery: zigzag-varint encode→decode is identity over
    the full signed-64 range, and record roundtrip holds for arbitrary
    content including empty strings/bytes and extreme longs."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from text_extractor_for_bioeconomic_products_spark.sources.avro import (
        _dec_long,
        _enc_long,
        read_avro_bytes,
        write_avro_bytes,
    )

    @settings(max_examples=200, deadline=None)
    @given(st.integers(min_value=-(2 ** 63), max_value=2 ** 63 - 1))
    def varint_identity(n):
        v, pos = _dec_long(memoryview(_enc_long(n)), 0)
        assert v == n and pos == len(_enc_long(n))

    varint_identity()

    schema = {
        "type": "record", "name": "row", "fields": [
            {"name": "n", "type": "long"},
            {"name": "s", "type": ["null", "string"]},
            {"name": "y", "type": "bytes"},
        ],
    }

    @settings(max_examples=30, deadline=None)
    @given(st.lists(
        st.tuples(
            st.integers(min_value=-(2 ** 63), max_value=2 ** 63 - 1),
            st.one_of(st.none(), st.text(max_size=40)),
            st.binary(max_size=40),
        ),
        max_size=30,
    ))
    def record_roundtrip(recs):
        _s, got = read_avro_bytes(write_avro_bytes(recs, schema))
        assert got == recs

    record_roundtrip()


def test_read_transcripts_rejects_foreign_parquet(spark, tmp_path):
    """S1 guard: a parquet dir with NONE of the transcript columns must
    error instead of reading as all-NULL phantom rows (the explicit
    read schema would otherwise silently null-fill every column — the
    round-5 README audit flowed 9,890 such rows through the whole
    extraction job before this guard)."""
    from text_extractor_for_bioeconomic_products_spark.sources.transcripts import (
        read_transcripts,
    )

    foreign = str(tmp_path / "foreign")
    spark.range(10).selectExpr(
        "id AS some_key", "CAST(id AS STRING) AS some_value"
    ).write.parquet(foreign)
    with pytest.raises(ValueError, match="not a transcripts table"):
        read_transcripts(spark, foreign, "parquet")
    # a table carrying the key columns still reads (extra cols ignored,
    # missing optional cols null-filled — per-row quarantine's job)
    partial = str(tmp_path / "partial")
    spark.range(10).selectExpr(
        "CAST(id AS STRING) AS conv_id",
        "CAST(id AS STRING) AS text",
        "id AS extra_col",
    ).write.parquet(partial)
    assert read_transcripts(spark, partial, "parquet").count() == 10


def test_connected_components_long_chain(spark):
    """A 60-node chain (diameter 59) must converge within the iteration
    cap — pointer jumping gives O(log d) rounds — and collapse to one
    component labeled by the minimum node."""
    from text_extractor_for_bioeconomic_products_spark.operators.dedup import (
        connected_components,
    )
    edges = [(i, i + 1) for i in range(59)] + [(100, 101), (103, 101)]
    pairs = spark.createDataFrame(edges, "doc_a long, doc_b long")
    rows = {r["component"]: r for r in connected_components(pairs).collect()}
    assert set(rows) == {0, 100}
    assert rows[0]["n_docs"] == 60
    assert rows[0]["members"] == ",".join(str(i) for i in range(60))
    assert rows[100]["n_docs"] == 3
    assert rows[100]["members"] == "100,101,103"


def test_approx_distinct_tolerance(spark, sf01_dir):
    """HLL++ sketch within its declared 2% rsd (allow 3σ) of exact — the
    query now carries the bound check in its hashed output, so the oracle
    verifies it per-group; this test pins that the flag is computed and
    actually TRUE on the sf0.01 corpus (non-vacuous)."""
    import __spark_entry__ as e
    rows = e.queries()["approx_distinct_users"](spark, sf01_dir).collect()
    assert rows
    for r in rows:
        assert r["approx_within_bound"] is True, r


def test_span_validation_columns_equal_scalar(spark):
    """X3 vectorized validator (pure column expressions) produces exactly
    the scalar rules.validate_product_span outputs on branch-covering
    fixtures."""
    from pyspark.sql import functions as F

    from text_extractor_for_bioeconomic_products_spark import rules
    from text_extractor_for_bioeconomic_products_spark.operators.normalize import (
        span_validation_columns,
    )

    cases = [
        ("acai berry", "Brazil", "Euterpe oleracea", ["alimentar", "medicinal"]),
        ("Extracts Ltd Company", "", None, []),
        ("oil company", "Peru", "Genus species", ["x", "y"]),
        ("x", "brasil", "euterpe Oleracea", [" a ", "", "b"]),
        (None, None, "NotABinomialHere", None),
        ("maca", "peru", "", ["medicinal"]),
        ("Something SPA", "bolivia", "Q", ["  "]),
        ("natural extract", "colombia", "Abc def ghi", ["one"]),
        ("tea", "french guiana", "ABC", ["u1", "u2", "u3"]),
        ("", "xx", None, ["ok"]),
        # whitespace-padded fields: scalar and column twins must strip
        # the identical ASCII class (review-confirmed divergence before
        # _ascii_trim: tab-padded name lengths differed)
        ("a\t", "peru", "Genus species", ["u1", "u2"]),
        ("maca ", "\tbrazil\n", "Genus species\t", ["\tu1", "u2"]),
        (" herb\n", "peru", "\n genus SPECIES ", ["x\ty"]),
    ]
    df = spark.createDataFrame(
        cases, "name string, country string, sci string, uses array<string>"
    )
    v = span_validation_columns(
        F.col("name"), F.col("country"), F.col("sci"), F.col("uses")
    )
    got = df.select(
        "name", "country", "sci", "uses",
        v["is_valid"].alias("is_valid"),
        v["confidence"].alias("confidence"),
        v["n_issues"].alias("n_issues"),
        v["n_corrections"].alias("n_corrections"),
        v["country_corrected"].alias("country_corrected"),
        v["scientific_corrected"].alias("scientific_corrected"),
    ).collect()
    for row in got:
        exp = rules.validate_product_span(
            row["name"], row["country"], row["sci"], row["uses"]
        )
        for k in ("is_valid", "n_issues", "n_corrections",
                  "country_corrected", "scientific_corrected"):
            assert row[k] == exp[k], (row["name"], k, row[k], exp[k])
        assert row["confidence"] == pytest.approx(exp["confidence"]), row["name"]


def test_span_validation_columns_equal_scalar_randomized(spark):
    """One Spark job over 300 pseudo-random inputs (deterministic seed):
    names/countries/scis/uses drawn from vocab fragments, whitespace,
    punctuation, unicode accents, and Nones — scalar and column twins
    must agree on every output field."""
    import random

    from pyspark.sql import functions as F

    from text_extractor_for_bioeconomic_products_spark import rules
    from text_extractor_for_bioeconomic_products_spark.operators.normalize import (
        span_validation_columns,
    )

    rng = random.Random(42)
    frags = ["acai", "oil", "ltd", "spa", "café", "maca", "xyz", "Genus",
             "species", "SHOUT", "q", "", " ", "\t", "\n", "perú", "brazil",
             "dominican republic", "nut", "12", "ñandú"]

    def rand_str():
        if rng.random() < 0.1:
            return None
        return rng.choice(["", " ", "\t"]).join(
            rng.choices(frags, k=rng.randint(0, 4))
        )

    def rand_uses():
        if rng.random() < 0.15:
            return None
        return [rand_str() or "" for _ in range(rng.randint(0, 3))]

    cases = [(rand_str(), rand_str(), rand_str(), rand_uses())
             for _ in range(300)]
    df = spark.createDataFrame(
        [(i, *c) for i, c in enumerate(cases)],
        "i int, name string, country string, sci string, uses array<string>",
    )
    v = span_validation_columns(
        F.col("name"), F.col("country"), F.col("sci"), F.col("uses")
    )
    got = {r["i"]: r for r in df.select(
        "i",
        v["is_valid"].alias("is_valid"),
        v["confidence"].alias("confidence"),
        v["n_issues"].alias("n_issues"),
        v["n_corrections"].alias("n_corrections"),
        v["scientific_corrected"].alias("scientific_corrected"),
    ).collect()}
    for i, (name, country, sci, uses) in enumerate(cases):
        exp = rules.validate_product_span(name, country, sci, uses)
        row = got[i]
        for k in ("is_valid", "n_issues", "n_corrections", "scientific_corrected"):
            assert row[k] == exp[k], (i, k, (name, country, sci, uses), row[k], exp[k])
        assert row["confidence"] == pytest.approx(exp["confidence"]), (i, cases[i])


def test_span_validation_query_nonvacuous(spark):
    """The end-to-end census finds BOTH valid and invalid spans on the
    transcript corpus (the tagger emits some one-word-name / no-use
    spans), so the validator's reject path is exercised for real."""
    import __spark_entry__ as entry_mod

    rows = {r["is_valid"]: r for r in
            entry_mod.queries()["span_validation"](spark, "/root/testdata/sf0.001").collect()}
    assert set(rows) == {True, False}
    assert rows[True]["n_spans"] > 0 and rows[False]["total_issues"] > 0


def test_bench_headline_selection():
    """bench.py's scaling-headline rule: max over plausible (≤1.0) pairs;
    when EVERY pair is superlinear the RAW value ships under the
    'all_pairs_superlinear' label (never a fabricated 1.0 clamp — an
    inflated reading is not a lower bound)."""
    import bench

    def pair(name, eff):
        return {"pair": name, "scaling_efficiency": eff}

    best, sel = bench.select_scaling_headline(
        [pair("2->8", 1.04), pair("4->16", 0.86), pair("8->32", 0.5)]
    )
    assert (best["pair"], best["scaling_efficiency"], sel) == (
        "4->16", 0.86, "max_over_plausible_pairs",
    )
    best, sel = bench.select_scaling_headline(
        [pair("2->8", 1.04), pair("4->16", 1.21)]
    )
    assert sel == "all_pairs_superlinear"
    assert best["scaling_efficiency"] == 1.21  # raw, labeled — not clamped
    best, sel = bench.select_scaling_headline([])
    assert sel == "none" and best["scaling_efficiency"] is None


def test_bench_pair_efficiency():
    """Interleaved-schedule pair efficiency: per-position ratios cancel
    time-correlated interference; min-of-level cancels independent
    outliers; selection = max over plausible (≤1.0) candidates."""
    import bench

    def runs(secs):
        return [{"extract_sec": s} for s in secs]

    # A slow co-tenancy window covering round 0 hits BOTH lo_0 and hi_0:
    # position 0's ratio stays clean (160/40=4.0 ⇒ eff 1.0 — excluded as
    # implausible boundary? no: ≤1.0 is plausible), while min-of-level
    # pairs the clean lo min (100) with the clean hi min (25) ⇒ 1.0 too.
    cand = bench.pair_efficiency_candidates(
        runs([160.0, 100.0, 104.0]), runs([40.0, 25.0, 26.0]), 4, 16
    )
    assert cand["scaling_efficiency"] == 1.0
    assert cand["efficiency_by_position"] == [1.0, 1.0, 1.0]

    # r4 failure mode, interleaved: a slow window inflates ONLY lo_0
    # (asymmetric hit).  Position 0 reads superlinear (excluded); the
    # clean positions and min-of-level agree at 0.85.
    cand = bench.pair_efficiency_candidates(
        runs([180.0, 136.0, 136.0]), runs([40.0, 40.0, 40.0]), 4, 16
    )
    assert cand["efficiency_basis"] in (
        "min_of_level", "position_1", "position_2",
    )
    assert cand["scaling_efficiency"] == 0.85

    # every candidate superlinear → raw max ships (labeled upstream by
    # select_scaling_headline), never a fabricated clamp
    cand = bench.pair_efficiency_candidates(
        runs([200.0]), runs([40.0]), 4, 16
    )
    assert cand["scaling_efficiency"] == 1.25

    # BRACKETED mode (len(hi) == len(lo)+1: schedule hi,lo,hi,…,hi):
    # r5 live failure shape — lo level tight, hi level noisy.  Position 1
    # pairs lo_1 with an inflated trailing hi (88 s) and reads 0.55;
    # its bracket takes the cleaner LEADING neighbor (60 s) and recovers
    # 0.8.  A bracket can never use a hi that wasn't time-adjacent.
    cand = bench.pair_efficiency_candidates(
        runs([192.0, 192.0]), runs([120.0, 60.0, 88.0]), 4, 16
    )
    assert cand["efficiency_by_position"] == [0.8, 0.545]
    assert cand["efficiency_by_bracket"] == [0.8, 0.8]
    assert cand["scaling_efficiency"] == 0.8
    assert cand["efficiency_basis"] in (
        "min_of_level", "position_0", "bracket_0", "bracket_1",
    )
    # min_of_level in bracketed mode still uses ALL hi runs incl. the
    # prepended one (120 is slowest so it changes nothing here)
    assert cand["efficiency_min_of_level"] == 0.8

    # bracket stays plausibility-filtered: an inflated lo between two
    # clean his reads superlinear on BOTH estimators and is excluded
    cand = bench.pair_efficiency_candidates(
        runs([300.0, 192.0]), runs([60.0, 60.0, 60.0]), 4, 16
    )
    assert cand["scaling_efficiency"] == 0.8
    assert cand["efficiency_basis"] in ("min_of_level", "position_1", "bracket_1")


# --- temporal.asof_join (distributed as-of; union-merge formulation) ------

def _asof_fixture(spark):
    from datetime import datetime as dt
    probe = spark.createDataFrame(
        [
            (100, 1, dt(2024, 1, 10)),   # normal: two earlier touches
            (101, 1, dt(2024, 1, 2)),    # touch AT the same instant counts (<=)
            (102, 2, dt(2024, 1, 5)),    # tie on touch ts -> max event_id wins
            (103, 3, dt(2024, 1, 5)),    # key with no touches -> nulls
            (104, 4, dt(2024, 1, 1)),    # touches exist but all AFTER -> nulls
        ],
        "purchase_id long, user_id long, purchase_ts timestamp",
    )
    build = spark.createDataFrame(
        [
            (10, 1, dt(2024, 1, 1), "view"),
            (11, 1, dt(2024, 1, 2), "click"),
            (20, 2, dt(2024, 1, 4), "view"),
            (21, 2, dt(2024, 1, 4), "click"),  # same ts as 20: id 21 wins
            (40, 4, dt(2024, 2, 1), "view"),
        ],
        "event_id long, user_id long, ts timestamp, event_type string",
    )
    return probe, build


def test_asof_join_semantics(spark):
    """<= boundary, deterministic same-ts tie-break, and left-null rows."""
    from text_extractor_for_bioeconomic_products_spark.operators.temporal import (
        asof_join,
    )
    probe, build = _asof_fixture(spark)
    out = asof_join(
        probe, build, key="user_id", probe_time="purchase_ts",
        build_time="ts", payload_cols=["event_id", "event_type"],
        tiebreak_col="event_id",
    )
    rows = {r["purchase_id"]: r["asof"] for r in out.collect()}
    assert rows[100]["event_id"] == 11          # most recent of two
    assert rows[101]["event_id"] == 11          # ts == probe instant included
    assert rows[102]["event_id"] == 21          # same-ts tie -> max event_id
    assert rows[103] is None                    # key never seen on build side
    assert rows[104] is None                    # only future touches
    assert out.count() == 5                     # every probe row survives


def test_asof_join_single_shuffle(spark):
    """The union-merge as-of is exactly ONE Exchange (on the key) — no
    join explosion, no extra shuffle for the window."""
    from text_extractor_for_bioeconomic_products_spark.operators.temporal import (
        asof_join,
    )
    probe, build = _asof_fixture(spark)
    out = asof_join(
        probe, build, key="user_id", probe_time="purchase_ts",
        build_time="ts", payload_cols=["event_id"], tiebreak_col="event_id",
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    n_exchanges = plan.count("Exchange hashpartitioning")
    assert n_exchanges == 1, plan


def test_interval_join_subsecond_boundary(spark):
    """Boundary semantics of the bucketized interval join with
    MICROSECOND timestamps: strict > at the lower bound, <= at the
    upper, and a match in the NEXT time bucket (probe late in its
    bucket, build just past midnight) proving the 2-bucket candidate
    explode covers bucket-crossing windows even though bucketing
    truncates to whole seconds."""
    from datetime import datetime as dt

    from text_extractor_for_bioeconomic_products_spark.operators.temporal import (
        interval_join,
    )

    t0 = dt(2024, 1, 10, 23, 30, 0, 250000)  # late in its day-bucket
    probe = spark.createDataFrame(
        [(1, 7, t0)], "purchase_id long, user_id long, purchase_ts timestamp"
    )
    build = spark.createDataFrame(
        [
            (10, 7, t0),                                   # == t0: excluded (strict >)
            (11, 7, dt(2024, 1, 10, 23, 30, 0, 250001)),   # t0+1µs: included
            (12, 7, dt(2024, 1, 11, 0, 30, 0)),            # next bucket, in window
            (13, 7, dt(2024, 1, 11, 23, 30, 0, 250000)),   # == t0+24h: included (<=)
            (14, 7, dt(2024, 1, 11, 23, 30, 0, 250001)),   # t0+24h+1µs: excluded
            (15, 8, dt(2024, 1, 11, 0, 0, 0)),             # other key: excluded
        ],
        "event_id long, user_id long, ts timestamp",
    )
    out = interval_join(
        probe, build, key="user_id", probe_time="purchase_ts",
        build_time="ts", lower_exclusive_s=0, upper_inclusive_s=86400,
        payload_cols=["event_id"],
    )
    matched = sorted(r["match"]["event_id"] for r in out.collect())
    assert matched == [11, 12, 13]


def test_interval_join_rejects_empty_window():
    from text_extractor_for_bioeconomic_products_spark.operators.temporal import (
        interval_join,
    )
    import pytest as _pytest
    with _pytest.raises(ValueError):
        interval_join(
            None, None, key="k", probe_time="t", build_time="t",
            lower_exclusive_s=60, upper_inclusive_s=60, payload_cols=[],
        )


# --- clustering.kmeans (Lloyd's, driver state O(k·dim)) -------------------

def test_semantic_dedup_planted_fixture(spark):
    """Two clean clusters with one planted near-duplicate pair: the
    higher-id twin is dropped, its lower-id original and everything
    merely same-topic (cosine below threshold) is kept, and
    max_sim_lower reports the deciding similarity.  Exercises the
    keep-the-first rule, the NULL path (cluster-minimum vec_ids), and
    the cluster_size ledger on a corpus where the answer is derivable
    by hand."""
    from text_extractor_for_bioeconomic_products_spark.operators.clustering import (
        semantic_dedup,
    )

    emb = spark.createDataFrame(
        [
            (0, [1.0, 0.0, 0.0, 0.0], 0),   # cluster A seed
            (1, [0.0, 1.0, 0.0, 0.0], 1),   # cluster B seed
            (2, [0.99, 0.14, 0.0, 0.0], 0),  # near-dup of 0 (cos ≈ .99)
            (3, [0.0, 0.7, 0.7, 0.0], 1),    # same topic as 1, cos = .7
        ],
        "vec_id long, embedding array<double>, label int",
    )
    rows = {
        r["vec_id"]: r
        for r in semantic_dedup(emb, k=2, iters=2, threshold=0.9).collect()
    }
    assert len(rows) == 4
    assert [rows[i]["keep"] for i in range(4)] == [1, 1, 0, 1]
    # cluster-minimum ids have no lower-id mate → NULL ledger entry
    assert rows[0]["max_sim_lower"] is None
    assert rows[1]["max_sim_lower"] is None
    assert rows[2]["max_sim_lower"] > 0.99  # the deciding similarity
    # cos = 0.7 / √(0.7² + 0.7²) = 1/√2 — kept: < 0.9
    assert abs(rows[3]["max_sim_lower"] - 0.7071) < 1e-3
    assert all(r["cluster_size"] == 2 for r in rows.values())
    assert rows[0]["cluster"] == rows[2]["cluster"]
    assert rows[1]["cluster"] == rows[3]["cluster"]
    assert rows[0]["cluster"] != rows[1]["cluster"]
    # empty corpus (no vectors to seed centroids) → empty, typed result,
    # not an unevaluable array_min(array()) plan
    empty = semantic_dedup(emb.filter("vec_id < 0"), k=2, iters=2)
    assert empty.count() == 0
    assert [f.name for f in empty.schema.fields] == [
        "vec_id", "cluster", "cluster_size", "max_sim_lower", "keep",
    ]


def test_kmeans_sse_monotone_and_full_clusters(spark, sf001_dir):
    """Lloyd's invariant: mean squared distance to the assigned centroid
    is non-increasing across assignment passes; with the smallest-vec_id
    init on this corpus every cluster stays populated."""
    from pyspark.sql import functions as F

    from text_extractor_for_bioeconomic_products_spark.operators.clustering import (
        assign_clusters, update_centroids,
    )
    from text_extractor_for_bioeconomic_products_spark.sources.tables import load

    emb = load(spark, sf001_dir, "embeddings")
    init = emb.filter(F.col("vec_id") < 8).select("vec_id", "embedding").collect()
    cents = {int(r["vec_id"]): [float(x) for x in r["embedding"]] for r in init}
    sses = []
    asg = assign_clusters(emb, cents)
    for _ in range(3):
        sses.append(asg.agg(F.avg("dist")).collect()[0][0])
        cents = update_centroids(emb, asg)
        asg = assign_clusters(emb, cents)
    assert sses[0] >= sses[1] >= sses[2]
    assert sses[2] < sses[0]  # it actually moved
    assert len(cents) == 8  # no cluster died on this corpus


def test_kmeans_assignment_is_argmin(spark, sf001_dir):
    """Spot-check the struct-array argmin against numpy on the final
    centroids (tolerance-based: numpy's summation order differs)."""
    import numpy as np
    from pyspark.sql import functions as F

    from text_extractor_for_bioeconomic_products_spark.operators.clustering import (
        assign_clusters, kmeans_fit_predict, update_centroids,
    )
    from text_extractor_for_bioeconomic_products_spark.sources.tables import load

    emb = load(spark, sf001_dir, "embeddings")
    init = emb.filter(F.col("vec_id") < 8).select("vec_id", "embedding").collect()
    cents = {int(r["vec_id"]): [float(x) for x in r["embedding"]] for r in init}
    for _ in range(2):
        cents = update_centroids(emb, assign_clusters(emb, cents))
    final = {r["vec_id"]: r["cluster"] for r in kmeans_fit_predict(emb).collect()}
    cids = sorted(cents)
    C = np.array([cents[c] for c in cids])
    sample = emb.filter(F.col("vec_id") % 17 == 0).collect()
    assert sample
    for r in sample:
        v = np.array(r["embedding"], dtype=np.float64)
        d = ((C - v) ** 2).sum(axis=1)
        best = d.min()
        # every centroid strictly better than the chosen one would
        # contradict argmin beyond float-order noise
        chosen = d[cids.index(final[r["vec_id"]])]
        assert chosen <= best + 1e-9


def test_kmeans_assignment_stage_is_narrow(spark, sf001_dir):
    """The assignment pass is a pure map (centroids are literals): no
    Exchange of any kind in its plan."""
    from pyspark.sql import functions as F

    from text_extractor_for_bioeconomic_products_spark.operators.clustering import (
        assign_clusters,
    )
    from text_extractor_for_bioeconomic_products_spark.sources.tables import load

    emb = load(spark, sf001_dir, "embeddings")
    init = emb.filter(F.col("vec_id") < 8).select("vec_id", "embedding").collect()
    cents = {int(r["vec_id"]): [float(x) for x in r["embedding"]] for r in init}
    p = assign_clusters(emb, cents)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in p, p


def test_source_mix_weights_normalized(spark, sf001_dir):
    """Temperature mix: weights sum to 1, expected counts sum to N, and
    the temperature tempers dominance (max source's weight share < its
    raw doc share; min's weight share > raw share)."""
    from text_extractor_for_bioeconomic_products_spark.operators.curation import (
        q_source_mix_weights,
    )
    rows = q_source_mix_weights(spark, sf001_dir).collect()
    total_docs = sum(r["n_docs"] for r in rows)
    assert abs(sum(r["mix_weight"] for r in rows) - 1.0) < 1e-4
    assert abs(sum(r["expected_docs"] for r in rows) - total_docs) < 1e-2
    if len(rows) > 1 and len({r["n_docs"] for r in rows}) > 1:
        hi = max(rows, key=lambda r: r["n_docs"])
        lo = min(rows, key=lambda r: r["n_docs"])
        assert hi["mix_weight"] < hi["n_docs"] / total_docs
        assert lo["mix_weight"] > lo["n_docs"] / total_docs


def test_tfidf_top_terms_shape(spark, sf001_dir):
    """<=3 terms per doc, scores non-increasing within a doc, and a
    corpus-ubiquitous term (df == N -> idf = 0) never ranks."""
    from text_extractor_for_bioeconomic_products_spark.operators.textstats import (
        q_tfidf_top_terms,
    )
    rows = q_tfidf_top_terms(spark, sf001_dir).collect()
    per_doc: dict[int, list] = {}
    for r in rows:
        per_doc.setdefault(r["doc_id"], []).append(r)
    for doc_id, rs in per_doc.items():
        assert 1 <= len(rs) <= 3
        scores = [r["tfidf"] for r in rs]
        assert scores == sorted(scores, reverse=True)
        assert all(s > 0 for s in scores)  # idf==0 terms can never appear


def test_driver_window_invariant():
    """The driver correctness gate samples queries()[:50]; every
    non-staple (= every never-yet-green query) must sit inside that
    window, the back must be exactly the deferred staples, and every
    staple must still exist."""
    import __spark_entry__ as entry_mod

    names = list(entry_mod.queries())
    staples = entry_mod._DEFERRED_STAPLES
    assert len(names) - len(staples) == 50, (
        f"front window is {len(names) - len(staples)}, not 50 — "
        "defer one more both-rounds-green staple per added query"
    )
    assert names[50:] == [s for s in staples if s in names]
    assert set(staples) <= set(names)


def test_lm_score_oov_and_surprisal_behavior(spark, sf001_dir):
    """The 20-term vocab cap binds (vocab is 31 terms): some tokens are
    OOV everywhere, and OOV-heavier documents carry higher mean
    surprisal on average (the quality-filter signal)."""
    import statistics

    import __spark_entry__ as entry_mod

    rows = entry_mod.queries()["doc_lm_score"](spark, sf001_dir).collect()
    assert rows and all(r["lm_score"] > 0 for r in rows)
    fracs = [r["oov_frac"] for r in rows]
    assert 0 < statistics.mean(fracs) < 1
    med = statistics.median(fracs)
    hi = [r["lm_score"] for r in rows if r["oov_frac"] > med]
    lo = [r["lm_score"] for r in rows if r["oov_frac"] <= med]
    assert hi and lo and statistics.mean(hi) > statistics.mean(lo)


def test_train_val_test_split_stable_and_proportioned(spark, sf001_dir, tmp_path):
    """The split is a pure function of doc_id: identical under different
    input partitionings (the no-leakage-over-time property), covers all
    three splits, and lands near 80/10/10."""
    import __spark_entry__ as entry_mod
    from text_extractor_for_bioeconomic_products_spark.sources.tables import load

    q = entry_mod.queries()["train_val_test_split"]
    base = q(spark, sf001_dir).collect()
    # ACTUALLY reshuffle the source on disk and recompute from the new
    # layout — byte-identical census.  (An in-memory repartition the
    # query never reads would make this check vacuous: the query loads
    # from sf_dir, so the differently-partitioned copy must BE an sf dir.)
    alt = str(tmp_path / "alt_sf")
    load(spark, sf001_dir, "documents").repartition(7, "lang").write.parquet(
        alt + "/documents.parquet"
    )
    again = q(spark, alt).collect()
    assert base == again
    totals = {}
    for r in base:
        totals[r["split"]] = totals.get(r["split"], 0) + r["n_docs"]
    assert set(totals) == {"train", "val", "test"}
    n = sum(totals.values())
    assert 0.7 < totals["train"] / n < 0.9
    assert totals["val"] / n < 0.2 and totals["test"] / n < 0.2


def test_kmeans_survives_empty_cluster(spark):
    """A duplicate init vector makes every point tie toward the smaller
    cid (struct-argmin tie-break), so cluster 1 empties after pass 1 —
    the rebuild must simply drop it (same semantics as the SQL oracle's
    regrouping) and converge on the survivors without error."""
    from text_extractor_for_bioeconomic_products_spark.operators.clustering import (
        kmeans_fit_predict,
    )

    base = [0.0] * 8
    far = [5.0] * 8
    rows = [
        (0, 0, base),
        (1, 0, list(base)),          # exact duplicate of the init centroid 0
        (2, 1, far),
        (3, 1, [5.1] * 8),
        (4, 0, [0.1] * 8),
    ]
    emb = spark.createDataFrame(
        rows, "vec_id long, label int, embedding array<float>"
    )
    out = {r["vec_id"]: r["cluster"] for r in
           kmeans_fit_predict(emb, k=3, iters=3).collect()}
    # init: c0 = c1 = base (duplicate), c2 = far.  Every near point ties
    # between c0 and c1 and takes the smaller cid, so cluster 1 empties
    # after pass 1 and must drop out cleanly.
    assert out[0] == out[1] == out[4] == 0
    assert out[2] == out[3] == 2
    assert 1 not in out.values()


def test_gopher_rules_keep_path(spark):
    """The corpus-wide query honestly rejects word salad (stopword
    poverty), so the keep=1 branch is driven by a planted realistic doc
    here; each failing flag is exercised by a targeted counter-doc."""
    from text_extractor_for_bioeconomic_products_spark.operators.textstats import (
        gopher_flags,
    )

    realistic = (
        "the quick brown fox jumps over the lazy dog and runs with great "
        "speed to have fun that day of summer "
    ) * 3
    df = spark.createDataFrame(
        [
            (0, realistic.strip()),
            (1, " ".join(["word"] * 30)),          # too short + no stop set hits
            (2, " ".join(["1234"] * 60)),          # no alphabetic words
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in gopher_flags(df).collect()}
    assert rows[0]["keep"] == 1 and all(
        rows[0][f] == 1 for f in ("flag_words", "flag_mwl", "flag_alpha", "flag_stop")
    )
    assert rows[1]["keep"] == 0
    assert rows[1]["flag_words"] == 0 and rows[1]["flag_stop"] == 0
    assert rows[2]["keep"] == 0 and rows[2]["flag_alpha"] == 0
    # keep is exactly the conjunction of the four flags
    for r in rows.values():
        assert r["keep"] == min(
            r["flag_words"], r["flag_mwl"], r["flag_alpha"], r["flag_stop"]
        )


def test_gopher_rules_corpus_nonvacuous(spark, sf001_dir):
    """On the shared corpus the word-count flag must split the corpus
    (bounds actually bind) and the stopword flag must be all-zero — the
    documented word-salad property this battery correctly detects."""
    import __spark_entry__ as entry_mod

    rows = entry_mod.queries()["doc_gopher_rules"](spark, sf001_dir).collect()
    flags = {r["flag_words"] for r in rows}
    assert flags == {0, 1}
    assert all(r["flag_stop"] == 0 for r in rows)


def test_ann_lsh_recall_invariants(spark, sf001_dir):
    """recall@k is a true ratio of the exact top-k found by the LSH path:
    full exact sets, hits bounded by k, ratio consistent — and <1 recall
    actually occurs (otherwise the ledger is vacuous on this corpus)."""
    import __spark_entry__ as entry_mod
    from text_extractor_for_bioeconomic_products_spark.operators.similarity import (
        K_RECALL,
        N_BATCH_QUERIES,
    )

    rows = entry_mod.queries()["ann_lsh_recall"](spark, sf001_dir).collect()
    assert len(rows) == N_BATCH_QUERIES
    for r in rows:
        assert r["n_exact"] == K_RECALL
        assert 0 <= r["n_hits_one_band"] <= K_RECALL
        assert 0 <= r["n_hits_two_band"] <= K_RECALL
        # OR-ing a second band can only add candidates: recall monotone.
        assert r["n_hits_two_band"] >= r["n_hits_one_band"]
        assert (
            abs(r["recall_one_band"] - round(r["n_hits_one_band"] / r["n_exact"], 4))
            < 1e-12
        )
        assert (
            abs(r["recall_two_band"] - round(r["n_hits_two_band"] / r["n_exact"], 4))
            < 1e-12
        )
        assert 0 <= r["n_hits_multiprobe"] <= K_RECALL
        # Hamming-1 probes include the exact bucket, so the multiprobe
        # candidate set is a superset of the one-band set; with a fixed k
        # and true-score ranking, recall@k is monotone in the candidate
        # set (anything that displaces a hit scores higher, so it is
        # itself an exact-top-k member).
        assert r["n_hits_multiprobe"] >= r["n_hits_one_band"]
        assert (
            abs(
                r["recall_multiprobe"]
                - round(r["n_hits_multiprobe"] / r["n_exact"], 4)
            )
            < 1e-12
        )
    assert any(r["recall_one_band"] < 1.0 for r in rows)
    # The second band must actually lift recall somewhere on this corpus,
    # otherwise the multi-band lever is vacuous here.
    assert sum(r["n_hits_two_band"] for r in rows) > sum(
        r["n_hits_one_band"] for r in rows
    )
    # ... and so must the probe fan-out, else multiprobe is vacuous here.
    assert sum(r["n_hits_multiprobe"] for r in rows) > sum(
        r["n_hits_one_band"] for r in rows
    )


def test_duplicate_passage_planted_fixture(spark):
    """Two docs sharing a 6-word passage are both flagged for exactly the
    two 5-grams inside that passage; the disjoint doc stays at zero, and
    a doc shorter than the gram width survives with n_grams == 0 (the
    explode-loss regression this operator guards against)."""
    from text_extractor_for_bioeconomic_products_spark.operators.dedup import (
        duplicate_passage_stats,
    )

    shared = "the quick brown fox jumps high"
    docs = spark.createDataFrame(
        [
            (1, f"intro one {shared} tail alpha"),
            (2, f"other beginning {shared} closing words"),
            (3, "completely unrelated text with many different words here"),
            (4, "tiny doc"),
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in duplicate_passage_stats(docs).collect()}
    # the 6-word shared passage contributes exactly 2 shared 5-grams
    assert rows[1]["n_dup_grams"] == 2 and rows[2]["n_dup_grams"] == 2
    assert rows[3]["n_dup_grams"] == 0 and rows[3]["dup_frac"] == 0.0
    assert rows[4]["n_grams"] == 0 and rows[4]["dup_frac"] == 0.0
    for r in (rows[1], rows[2]):
        assert r["dup_frac"] == round(r["n_dup_grams"] / r["n_grams"], 4)


def test_gram_novelty_planted_fixture(spark):
    """First-occurrence attribution, planted: the first doc owns every
    one of its grams (novelty 1.0); an exact re-ingest of it owns none
    (novelty 0.0); a doc sharing a 6-word passage with doc 1 loses
    exactly the 2 grams inside that passage; a gram-less doc is
    vacuously novel; and total attributed grams across docs equals the
    number of distinct grams in the corpus (mass conservation)."""
    from text_extractor_for_bioeconomic_products_spark.operators.dedup import (
        gram_novelty_stats,
    )

    shared = "the quick brown fox jumps high"
    docs = spark.createDataFrame(
        [
            (1, f"intro one {shared} tail alpha"),
            (2, f"intro one {shared} tail alpha"),
            (3, f"other beginning {shared} closing words"),
            (4, "tiny doc"),
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in gram_novelty_stats(docs).collect()}
    assert rows[1]["novelty"] == 1.0 and rows[1]["n_novel"] == rows[1]["n_grams"]
    assert rows[2]["novelty"] == 0.0 and rows[2]["n_novel"] == 0
    assert rows[3]["n_grams"] - rows[3]["n_novel"] == 2
    assert rows[4]["n_grams"] == 0 and rows[4]["novelty"] == 1.0
    # corpus distinct grams = doc1's ∪ doc3's, overlapping in the 2
    # shared-passage grams (doc2 adds nothing); every one attributed once
    assert (
        sum(r["n_novel"] for r in rows.values())
        == rows[1]["n_grams"] + rows[3]["n_grams"] - 2
    )


def test_incremental_dedup_planted_fixture(spark):
    """Batch admission outcomes, planted: a corpus copy is dropped as
    dup_vs_corpus (even when normalization differs by whitespace), the
    second of two identical new arrivals drops as dup_within_batch, and
    the genuinely new doc is kept."""
    from text_extractor_for_bioeconomic_products_spark.operators.dedup import (
        incremental_dedup_census,
    )

    corpus = spark.createDataFrame(
        [(1, "standing corpus doc one"), (2, "another old doc")],
        "doc_id long, text string",
    )
    batch = spark.createDataFrame(
        [
            (10, "Standing   corpus doc ONE"),   # normalizes to corpus #1
            (11, "brand new arrival"),
            (12, "brand new arrival"),            # within-batch dup of 11
            (13, "totally distinct content"),
        ],
        "doc_id long, text string",
    )
    r = incremental_dedup_census(corpus, batch).collect()[0]
    assert r["n_batch"] == 4
    assert r["n_dup_vs_corpus"] == 1
    assert r["n_dup_within"] == 1
    assert r["n_kept"] == 2


def test_quality_weighted_sample_deterministic_extremes(spark, tmp_path):
    """p = min(1, words/100): a 100+-word doc is ALWAYS kept (u < 1 by
    construction), a word-less doc NEVER is — and the census is
    byte-identical under a different input partitioning (no rand() in
    the coin; a reshuffled rerun must select the same corpus)."""
    import __spark_entry__ as entry_mod
    from pyspark.sql import functions as F

    docs = spark.createDataFrame(
        [
            (i, "w " * 120 if i % 3 == 0 else ("###" if i % 3 == 1 else "short doc here"), f"s{i % 2}")
            for i in range(60)
        ],
        "doc_id long, text string, source string",
    ).withColumn("lang", F.lit("en")).withColumn("n_chars", F.length("text"))
    p1 = str(tmp_path / "p1")
    docs.repartition(1).write.parquet(str(tmp_path / "p1" / "documents.parquet"))
    p8 = str(tmp_path / "p8")
    docs.repartition(8, "source").write.parquet(str(tmp_path / "p8" / "documents.parquet"))
    q = entry_mod.queries()["quality_weighted_sample"]
    a = sorted(map(tuple, q(spark, p1).collect()))
    b = sorted(map(tuple, q(spark, p8).collect()))
    assert a == b

    from text_extractor_for_bioeconomic_products_spark.operators.curation import (
        q_quality_weighted_sample,
    )
    # extremes via the census: sources hold mixed docs, so check via a
    # dedicated frame — all-long docs => kept_frac 1.0; all-empty => 0.0
    long_docs = docs.filter(F.col("doc_id") % 3 == 0)
    empty_docs = docs.filter(F.col("doc_id") % 3 == 1)
    pl = str(tmp_path / "long"); pe = str(tmp_path / "empty")
    long_docs.write.parquet(pl + "/documents.parquet")
    empty_docs.write.parquet(pe + "/documents.parquet")
    for r in q_quality_weighted_sample(spark, pl).collect():
        assert r["kept_frac"] == 1.0 and r["mean_keep_prob"] == 1.0
    for r in q_quality_weighted_sample(spark, pe).collect():
        assert r["kept_frac"] == 0.0 and r["n_kept"] == 0


def test_dsir_importance_prefers_target_like_docs(spark, tmp_path):
    """DSIR semantics: a raw-pool document written in the target slice's
    vocabulary must out-score one written in the raw pool's own
    vocabulary (that is the whole point of the importance weight), and
    the selected set must be byte-identical under a different input
    partitioning (Gumbel coin is a pure function of doc_id)."""
    from pyspark.sql import functions as F

    import __spark_entry__ as entry_mod

    rows = []
    for i in range(15):  # target slice: 'alpha beta' profile
        rows.append((i, "alpha beta alpha beta alpha", "en", "tgt"))
    for i in range(15, 30):  # raw-only slice: 'omega gamma' profile
        rows.append((i, "omega gamma omega gamma omega", "fr", "raw"))
    rows.append((100, "alpha beta alpha beta alpha", "fr", "probe"))  # target-like
    rows.append((101, "omega gamma omega gamma omega", "fr", "probe"))  # raw-like
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    ).withColumn("n_chars", F.length("text"))
    p1 = str(tmp_path / "p1")
    docs.repartition(1).write.parquet(p1 + "/documents.parquet")
    p8 = str(tmp_path / "p8")
    docs.repartition(8, "source").write.parquet(p8 + "/documents.parquet")

    q = entry_mod.queries()["dsir_importance"]
    a = sorted(map(tuple, q(spark, p1).collect()))
    b = sorted(map(tuple, q(spark, p8).collect()))
    assert a == b  # partitioning-independent selection

    by_id = {r["doc_id"]: r for r in q(spark, p1).collect()}
    # 32 docs < top-40 cap, so both probes are present
    assert by_id[100]["logw"] > by_id[101]["logw"]
    # and the target-like probe scores like the target slice itself
    assert by_id[100]["logw"] > 0 > by_id[101]["logw"]


def test_misra_gries_bounds_and_summary_size(spark):
    """Per-partition summaries are ≤ k rows; merged estimates obey the
    proven MG bounds (est ≤ true, est ≥ true − n/k) under different
    partitionings; a key heavier than n/(k+1) always surfaces."""
    from pyspark.sql import functions as F

    from text_extractor_for_bioeconomic_products_spark.operators.relational import (
        misra_gries_partition_summaries,
    )

    k = 4
    # 600 rows: key 0 ×300 (heavy, > n/(k+1)=120), keys 1..30 ×10 each
    vals = [0] * 300 + [i for i in range(1, 31) for _ in range(10)]
    df = spark.createDataFrame([(v,) for v in vals], "key long")
    n = len(vals)
    exact = {0: 300, **{i: 10 for i in range(1, 31)}}
    for parts in (1, 3, 8):
        keyed = df.repartition(parts)
        summaries = misra_gries_partition_summaries(keyed, k=k)
        per_part = (
            summaries.withColumn("pid", F.spark_partition_id())
            .groupBy("pid").count().collect()
        )
        assert all(r["count"] <= k for r in per_part), per_part
        merged = {
            r["key"]: r["est"]
            for r in summaries.groupBy("key").agg(F.sum("est").alias("est")).collect()
        }
        assert merged.get(0, 0) > 0, f"heavy key evicted at parts={parts}"
        for key, true in exact.items():
            est = merged.get(key, 0)
            assert est <= true, (parts, key, est, true)
            assert est >= true - n // k, (parts, key, est, true)


def test_heavy_keys_sketch_query_detects_planted_key(spark, sf001_dir):
    """The folded sentinel key 0 is the only is_heavy row and every
    bound check holds (the TRUE the oracle asserts is earned)."""
    import __spark_entry__ as entry_mod

    rows = entry_mod.queries()["heavy_keys_sketch"](spark, sf001_dir).collect()
    assert rows[0]["key"] == 0 and rows[0]["is_heavy"]
    assert all(r["within_bound"] for r in rows)
    # the sentinel fold concentrates ~1/5 of all rows on key 0 — it must
    # dominate every natural key by a wide margin
    assert rows[0]["n_exact"] > 2 * rows[1]["n_exact"]


def test_salted_join_equals_plain_join_and_spreads_hot_key(spark):
    """The salt is output-invisible (salted == plain join exactly) and
    the hot key's fact rows really scatter over >1 salt while non-heavy
    keys stay on salt 0 (no dim blow-up for the cold tail)."""
    from pyspark.sql import functions as F

    from text_extractor_for_bioeconomic_products_spark.operators.relational import (
        _SALT_COL,
        salted_equi_join,
    )

    rows = [(0, i, float(i)) for i in range(200)] + [
        (k, 1000 + k, float(k)) for k in range(1, 20)
    ]
    fact = spark.createDataFrame(rows, "key long, event_id long, value double")
    dim = fact.select("key").distinct().withColumn(
        "segment", F.col("key") % 3
    )
    salted = salted_equi_join(fact, dim, "key", "event_id", heavy_keys=[0])
    plain = fact.join(dim, "key")
    cols = sorted(plain.columns)
    assert salted.select(cols).exceptAll(plain.select(cols)).count() == 0
    assert plain.select(cols).exceptAll(salted.select(cols)).count() == 0

    heavy = F.col("key").isin([0])
    f_s = fact.withColumn(
        _SALT_COL,
        F.when(heavy, F.pmod(F.xxhash64(F.col("event_id")), F.lit(8)))
        .otherwise(F.lit(0)).cast("int"),
    )
    spread = f_s.groupBy("key").agg(
        F.countDistinct(_SALT_COL).alias("n_salts")
    ).collect()
    by_key = {r["key"]: r["n_salts"] for r in spread}
    assert by_key[0] > 4, by_key[0]
    assert all(v == 1 for k, v in by_key.items() if k != 0)


def test_percentile_approx_bounds_nonvacuous(spark, sf01_dir):
    """The GK sketch's bound flags must be computed from a real sketch
    (not constants): all TRUE on the corpus, and the approx value is a
    genuine element (not the interpolated exact), proven by tightening
    accuracy until approx != exact at some quantile on a known-gappy
    planted distribution."""
    from pyspark.sql import functions as F

    import __spark_entry__ as entry_mod

    row = entry_mod.queries()["order_price_percentiles_approx"](
        spark, sf01_dir
    ).collect()[0]
    for q in (25, 50, 75, 95):
        assert row[f"p{q}_within_bound"] is True, row

    # planted: 0..999 — approx at accuracy 100 may deviate from the
    # interpolated exact but must stay within the rank window
    df = spark.createDataFrame([(float(i),) for i in range(1000)], "v double")
    got = df.agg(
        F.percentile_approx("v", [0.5], F.lit(100)).alias("apx"),
        F.percentile("v", [0.48]).alias("lo"),
        F.percentile("v", [0.52]).alias("hi"),
    ).collect()[0]
    assert got["lo"][0] <= got["apx"][0] <= got["hi"][0], got


def test_event_streaks_gaps_and_islands(spark):
    """Hand-computed streaks: runs split on type change, resume later
    (gaps-and-islands, not global counts), ties broken by event_id."""
    import datetime as dt

    from pyspark.sql import functions as F  # noqa: F401

    base = dt.datetime(2024, 1, 1)
    rows = []
    # user 1: A A A B A A  -> max streak 3 (As split by the B)
    for i, et in enumerate(["a", "a", "a", "b", "a", "a"]):
        rows.append((i, base + dt.timedelta(seconds=i), 1, et, 0.0, "{}"))
    # user 2: B B  -> max streak 2
    for i, et in enumerate(["b", "b"]):
        rows.append((10 + i, base + dt.timedelta(seconds=i), 2, et, 0.0, "{}"))
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    pq = df  # q_event_streaks loads from dir; test the same logic inline
    from text_extractor_for_bioeconomic_products_spark.operators import (
        relational,
    )
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        pq.write.mode("overwrite").parquet(f"{d}/events.parquet")
        got = {
            r["max_streak"]: r["n_users"]
            for r in relational.q_event_streaks(spark, d).collect()
        }
    assert got == {3: 1, 2: 1}, got


def test_referential_integrity_detects_planted_orphans(spark, sf001_dir):
    """The simulated dim loss must surface as orphans on exactly the
    orders->customer edge; the intact edges must pass clean."""
    import __spark_entry__ as entry_mod

    rows = {
        r["fk"]: r
        for r in entry_mod.queries()["referential_integrity"](
            spark, sf001_dir
        ).collect()
    }
    assert rows["orders->customer"]["n_orphans"] > 0
    assert rows["lineitem->orders"]["n_orphans"] == 0
    assert rows["customer->nation"]["n_orphans"] == 0
    assert all(r["n_child_rows"] > 0 for r in rows.values())


def test_mad_outliers_flag_spikes_not_noise(spark, tmp_path):
    """A user with tight values + one spike flags exactly the spike; a
    constant-value user flags nothing (MAD=0 edge)."""
    import datetime as dt

    from text_extractor_for_bioeconomic_products_spark.operators.relational import (
        q_user_value_outliers,
    )

    base = dt.datetime(2024, 1, 1)
    rows = []
    vals_u1 = [10.0, 10.5, 9.5, 10.2, 9.8, 500.0]  # spike at the end
    for i, v in enumerate(vals_u1):
        rows.append((i, base + dt.timedelta(seconds=i), 1, "a", v, "{}"))
    for i in range(5):  # constant user
        rows.append((100 + i, base + dt.timedelta(seconds=i), 2, "b", 7.0, "{}"))
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        df.write.mode("overwrite").parquet(f"{d}/events.parquet")
        got = {
            r["event_type"]: (r["n_events"], r["n_outliers"])
            for r in q_user_value_outliers(spark, d).collect()
        }
    assert got == {"a": (6, 1), "b": (5, 0)}, got


def test_token_pmi_planted_collocation_ranks_first(spark, tmp_path):
    """Two tokens that always co-occur (and appear in half the docs)
    must out-PMI the background tokens present everywhere."""
    import pandas as pd

    from text_extractor_for_bioeconomic_products_spark.operators.textstats import (
        q_token_pmi,
    )

    texts = []
    for i in range(20):
        base = "alpha beta gamma delta epsilon"
        texts.append(base + (" zig zag" if i % 2 == 0 else ""))
    rows = pd.DataFrame({
        "doc_id": range(20),
        "text": texts,
        "lang": ["en"] * 20,
        "source": ["s"] * 20,
        "n_chars": [len(t) for t in texts],
    })
    rows.to_parquet(str(tmp_path / "documents.parquet"))
    got = q_token_pmi(spark, str(tmp_path)).collect()
    top = got[0]
    assert (top["t1"], top["t2"]) == ("zag", "zig")
    # pmi = ln(20·10/(10·10)) = ln 2
    assert abs(top["pmi"] - 0.6931) < 1e-9
    assert all(r["pmi"] <= top["pmi"] for r in got)


def test_snapshot_diff_accounts_every_row(spark, sf001_dir):
    """Every old-snapshot row is deleted|updated|unchanged, every new-only
    key is added, and all four paths are non-vacuous."""
    import __spark_entry__ as entry_mod
    from text_extractor_for_bioeconomic_products_spark.sources.tables import load

    rows = entry_mod.queries()["snapshot_diff"](spark, sf001_dir).collect()
    tot = {k: sum(r[k] for r in rows)
           for k in ("n_added", "n_deleted", "n_updated", "n_unchanged")}
    n_old = load(spark, sf001_dir, "documents").count()
    assert tot["n_deleted"] + tot["n_updated"] + tot["n_unchanged"] == n_old
    assert all(v > 0 for v in tot.values()), tot


def test_lang_confusion_shares_sum_to_one(spark, sf001_dir):
    """Structural contract: per-label shares sum to 1 and every labeled
    language appears (the synthetic corpus's labels are random, so the
    matrix honestly shows off-diagonal mass — the point is the census
    shape, not detector accuracy on word salad)."""
    from collections import defaultdict

    import __spark_entry__ as entry_mod

    rows = entry_mod.queries()["lang_confusion"](spark, sf001_dir).collect()
    shares = defaultdict(float)
    for r in rows:
        shares[r["lang_label"]] += r["share_of_label"]
    assert shares and all(abs(v - 1.0) < 0.001 for v in shares.values()), shares


def test_weighted_sample_favors_heavy_docs(spark, sf001_dir):
    """Efraimidis-Spirakis property on the deterministic corpus: the
    selected docs' mean weight exceeds the corpus mean, and the sample
    is a pure function of doc_id (identical under repartition)."""
    from pyspark.sql import functions as F

    import __spark_entry__ as entry_mod
    from text_extractor_for_bioeconomic_products_spark.sources.tables import load

    got = entry_mod.queries()["weighted_sample_topk"](spark, sf001_dir).collect()
    sel_mean = sum(r["n_words"] for r in got) / len(got)
    corpus_mean = (
        load(spark, sf001_dir, "documents")
        .select(F.avg(F.size(F.split("text", " "))))
        .collect()[0][0]
    )
    assert sel_mean > corpus_mean, (sel_mean, corpus_mean)
    again = entry_mod.queries()["weighted_sample_topk"](spark, sf001_dir).collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in again]


def test_orc_dispatch_and_text_corpus_ingest(spark, transcripts_df, tmp_path):
    """S1 widened: ORC roundtrips through the dispatch with value
    fidelity, and whole-file text ingest yields one row per file with
    the exact bytes (the reference's file-per-document shape)."""
    from pyspark.sql import functions as F

    from text_extractor_for_bioeconomic_products_spark.sources.transcripts import (
        read_text_corpus,
        read_transcripts,
    )

    sample = transcripts_df.limit(150).cache()
    n = sample.count()
    orc = str(tmp_path / "orc")
    sample.write.orc(orc)
    back = read_transcripts(spark, orc, "orc")
    assert back.count() == n
    a = sample.select(
        F.sum(F.xxhash64("conv_id", "turn_idx", "text").cast("decimal(38,0)"))
    ).collect()
    b = back.select(
        F.sum(F.xxhash64("conv_id", "turn_idx", "text").cast("decimal(38,0)"))
    ).collect()
    assert a == b

    txt_dir = tmp_path / "txt"
    txt_dir.mkdir()
    contents = {
        "a.txt": "first document\nwith two lines",
        "b.txt": "second document — unicode café ñ",
    }
    for name, text in contents.items():
        (txt_dir / name).write_text(text, encoding="utf-8")
    docs = {r["file_name"]: r for r in read_text_corpus(spark, str(txt_dir)).collect()}
    assert set(docs) == set(contents)
    for name, text in contents.items():
        assert docs[name]["text"] == text
        assert docs[name]["doc_id"] is not None
    assert len({r["doc_id"] for r in docs.values()}) == 2

    # repeated basenames across subdirectories (recursive ingest) must
    # get DISTINCT doc_ids — the id hashes the full path, not the
    # basename (r3 ADVICE: a basename hash silently merged documents)
    for sub in ("2023", "2024"):
        (txt_dir / sub).mkdir()
        (txt_dir / sub / "report.txt").write_text(
            f"annual report {sub}", encoding="utf-8"
        )
    rows = read_text_corpus(spark, str(txt_dir)).collect()
    assert len(rows) == 4  # recursive lookup found the nested files
    reports = [r for r in rows if r["file_name"] == "report.txt"]
    assert len(reports) == 2
    assert reports[0]["doc_id"] != reports[1]["doc_id"]
    assert len({r["doc_id"] for r in rows}) == 4

    # location independence (r4 ADVICE): the SAME corpus ingested from a
    # different root (relocated/remounted) must yield identical doc_ids —
    # the id hashes the root-RELATIVE path, not the full URI
    import shutil as _shutil

    moved = tmp_path / "mounted_elsewhere" / "txt"
    moved.parent.mkdir()
    _shutil.copytree(str(txt_dir), str(moved))
    ids_orig = {
        (r["file_name"], r["doc_id"])
        for r in rows
    }
    rel_ids = lambda rs: {(r["file_name"], r["doc_id"]) for r in rs}  # noqa: E731
    assert rel_ids(read_text_corpus(spark, str(moved)).collect()) == ids_orig


def test_bpe_matches_reference(spark, sf001_dir):
    """Distributed BPE == pure-Python reference, byte-exact: the full
    merge sequence (pairs, order, weighted counts) AND every word's
    final tokenization."""
    from text_extractor_for_bioeconomic_products_spark.operators.bpe import (
        bpe_train,
        reference_bpe,
        word_frequencies,
    )
    from text_extractor_for_bioeconomic_products_spark.sources.tables import load

    vocab = word_frequencies(load(spark, sf001_dir, "documents"))
    wf = {r["w"]: r["freq"] for r in vocab.collect()}
    merges, tokenized = bpe_train(vocab)
    ref_merges, ref_toks = reference_bpe(wf)
    assert merges == ref_merges
    got_toks = {r["w"]: list(r["syms"]) for r in tokenized.collect()}
    assert got_toks == ref_toks
    # tokenization is lossless: concatenating symbols restores the word
    assert all("".join(syms) == w for w, syms in got_toks.items())


def test_bpe_greedy_overlap_semantics(spark):
    """'aaa' under merge (a,a): greedy left-to-right gives [aa, a] — the
    overlap case where a naive regex replace diverges."""
    from text_extractor_for_bioeconomic_products_spark.operators.bpe import (
        bpe_train,
    )

    vocab = spark.createDataFrame([("aaa", 5), ("aab", 3)], "w string, freq long")
    merges, tokenized = bpe_train(vocab, n_merges=1)
    assert merges[0][:2] == ("a", "a")
    toks = {r["w"]: list(r["syms"]) for r in tokenized.collect()}
    assert toks["aaa"] == ["aa", "a"]
    assert toks["aab"] == ["aa", "b"]


def test_bpe_encode_matches_reference(spark, sf001_dir):
    """Encoding the corpus with the learned merges must agree with the
    pure-Python reference word-by-word: each doc's token count equals
    the sum of its words' reference tokenizations."""
    from text_extractor_for_bioeconomic_products_spark.operators.bpe import (
        bpe_encode,
        bpe_train,
        reference_bpe,
        word_frequencies,
    )
    from text_extractor_for_bioeconomic_products_spark.sources.tables import load

    docs = load(spark, sf001_dir, "documents").limit(40).cache()
    vocab = word_frequencies(docs)
    wf = {r["w"]: r["freq"] for r in vocab.collect()}
    merges, _ = bpe_train(vocab)
    _ref_merges, ref_toks = reference_bpe(wf)
    got = {r["doc_id"]: r for r in
           bpe_encode(docs, [(a, b) for a, b, _n in merges]).collect()}

    import re

    for d in docs.select("doc_id", "text").collect():
        words = [w for w in re.split(r"[^a-z0-9]+", d["text"].lower()) if w]
        want_tokens = sum(len(ref_toks[w]) for w in words)
        assert got[d["doc_id"]]["n_words"] == len(words)
        assert got[d["doc_id"]]["n_tokens"] == want_tokens
    # merges bind: tokens strictly fewer than characters overall
    total_chars = sum(
        len(w) for d in docs.select("text").collect()
        for w in re.split(r"[^a-z0-9]+", d["text"].lower()) if w
    )
    assert sum(r["n_tokens"] for r in got.values()) < total_chars


def test_bpe_encode_query_contract(spark, sf001_dir):
    """Driver-query shape: per-source rows, 1 <= tokens_per_word and
    tokens never exceed raw characters-per-word bound."""
    import __spark_entry__ as entry_mod

    rows = entry_mod.queries()["bpe_encode"](spark, sf001_dir).collect()
    assert rows
    for r in rows:
        assert r["n_docs"] > 0 and r["total_words"] > 0
        assert r["total_tokens"] >= r["total_words"]  # every word ≥1 token
        assert 1.0 <= r["tokens_per_word"]


def test_gapfilled_series_is_continuous(spark, sf001_dir):
    """The spine closes every hole: consecutive hour_starts differ by
    exactly 1 hour, zero-filled gap rows exist (sparse tier), and the
    non-gap rows equal the plain rollup."""
    import datetime as dt

    import __spark_entry__ as entry_mod

    rows = entry_mod.queries()["events_hourly_gapfilled"](
        spark, sf001_dir
    ).collect()
    assert rows
    hours = [r["hour_start"] for r in rows]
    assert all(
        (b - a) == dt.timedelta(hours=1) for a, b in zip(hours, hours[1:])
    )
    assert any(r["was_gap"] for r in rows), "no gap rows — vacuous spine"
    assert all(r["n_events"] == 0 for r in rows if r["was_gap"])
    assert all(r["n_events"] > 0 for r in rows if not r["was_gap"])


def test_retention_cohorts_invariants(spark, sf001_dir):
    """Offset-0 retention is exactly 1.0 per cohort, n_active never
    exceeds cohort_size, and offsets stay within the configured week."""
    import __spark_entry__ as entry_mod

    rows = entry_mod.queries()["user_retention_cohorts"](
        spark, sf001_dir
    ).collect()
    assert rows
    for r in rows:
        assert 0 <= r["offset"] <= 7
        assert r["n_active"] <= r["cohort_size"]
        if r["offset"] == 0:
            assert r["retention_rate"] == 1.0


def test_compression_signal_byte_exact_and_ordered(spark):
    """The zlib signal must be byte-exact vs the same CPython zlib on
    every doc, score a repeated-phrase doc far below prose, and treat
    null/empty text as vacuously incompressible (ratio 1.0)."""
    import zlib

    from text_extractor_for_bioeconomic_products_spark.operators.textstats import (
        doc_compression_signal,
    )

    prose = (
        "Quinoa cultivation in the Andean highlands supports thousands "
        "of smallholder farms with distinct rotations and varieties."
    )
    spam = "buy now " * 40
    docs = spark.createDataFrame(
        [(1, prose), (2, spam), (3, None), (4, "")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in doc_compression_signal(docs).collect()}
    for doc_id, text in [(1, prose), (2, spam)]:
        raw = text.encode("utf-8")
        assert rows[doc_id]["n_bytes"] == len(raw)
        assert rows[doc_id]["n_compressed"] == len(zlib.compress(raw, 6))
        assert rows[doc_id]["compress_ratio"] == round(
            len(zlib.compress(raw, 6)) / len(raw), 4
        )
    assert rows[2]["compress_ratio"] < 0.2 < rows[1]["compress_ratio"]
    for doc_id in (3, 4):
        assert rows[doc_id]["n_bytes"] == 0
        assert rows[doc_id]["compress_ratio"] == 1.0


def test_doc_compress_ratio_query_contract(spark, sf001_dir):
    """Driver-query shape: one row per source, ratios in (0, 1] after
    rounding, totals consistent, repetitive count bounded by n_docs."""
    import __spark_entry__ as entry_mod

    rows = entry_mod.queries()["doc_compress_ratio"](spark, sf001_dir).collect()
    assert rows
    for r in rows:
        assert 0 < r["mean_ratio"] <= 1.0
        assert 0 <= r["n_repetitive"] <= r["n_docs"]
        assert r["total_compressed"] <= max(r["total_bytes"], 1)


def test_table_profile_planted_exact(spark):
    """One-pass profile on a planted frame: null counts, distinct
    cardinalities, numeric ranges, string mean lengths — all exact."""
    from text_extractor_for_bioeconomic_products_spark.operators.profiling import (
        profile_table,
    )

    df = spark.createDataFrame(
        [
            (1, 10.5, "aa", None),
            (2, None, "bbbb", None),
            (2, -3.0, None, None),
            (None, 7.25, "cc", None),
        ],
        "k long, x double, s string, ts timestamp",
    )
    rows = {r["column"]: r for r in
            profile_table(df, ["k", "x"], ["s"], ["ts"]).collect()}
    assert rows["k"]["n_rows"] == 4 and rows["k"]["n_nulls"] == 1
    assert rows["k"]["n_distinct"] == 2
    assert rows["k"]["min_num"] == 1.0 and rows["k"]["max_num"] == 2.0
    assert rows["x"]["n_nulls"] == 1 and rows["x"]["n_distinct"] == 3
    assert rows["x"]["min_num"] == -3.0 and rows["x"]["max_num"] == 10.5
    assert rows["s"]["n_nulls"] == 1 and rows["s"]["n_distinct"] == 3
    assert rows["s"]["avg_len"] == round((2 + 4 + 2) / 3, 4)
    assert rows["s"]["min_num"] is None and rows["s"]["max_num"] is None
    assert rows["ts"]["n_nulls"] == 4 and rows["ts"]["n_distinct"] == 0


def test_table_profile_single_scan_plan(spark, sf001_dir):
    """The profile must plan exactly ONE scan of the table (the whole
    point vs per-column scans): a single FileScan over orders feeding
    one Expand for the distinct aggregates."""
    import __spark_entry__ as entry_mod

    df = entry_mod.queries()["table_profile"](spark, sf001_dir)
    df.collect()
    # AQE prints Final + Initial sections; count scans in the final only
    p = df._jdf.queryExecution().executedPlan().toString()
    final = p.split("== Initial Plan ==")[0]
    assert final.count("Scan parquet") == 1, final
    assert "Expand" in final


# --- round-5 final-session additions: rollup / bigram LM / set-similarity --


def test_revenue_rollup_levels_consistent(spark, sf001_dir):
    """ROLLUP's three levels must agree with each other: the grand total
    (lvl 3) equals the sum of region subtotals (lvl 1) equals the sum of
    detail rows (lvl 0), for both the count and (within the per-row 4dp
    rounding) the revenue."""
    import __spark_entry__ as entry_mod

    rows = entry_mod.queries()["revenue_rollup"](spark, sf001_dir).collect()
    by_lvl: dict[int, list] = {}
    for r in rows:
        by_lvl.setdefault(r["lvl"], []).append(r)
    assert set(by_lvl) == {0, 1, 3}
    assert len(by_lvl[3]) == 1
    assert len(by_lvl[1]) == 5  # 5 regions
    grand = by_lvl[3][0]
    assert grand["r_name"] is None and grand["n_name"] is None
    assert grand["n_orders"] == sum(r["n_orders"] for r in by_lvl[0])
    assert grand["n_orders"] == sum(r["n_orders"] for r in by_lvl[1])
    for lvl in (0, 1):
        tol = 0.0001 * len(by_lvl[lvl]) + 0.0001
        assert abs(grand["revenue"] - sum(r["revenue"] for r in by_lvl[lvl])) < tol
    # every detail row's region appears as a subtotal row
    assert {r["r_name"] for r in by_lvl[0]} == {r["r_name"] for r in by_lvl[1]}


def test_revenue_rollup_single_fact_scan_plan(spark, sf001_dir):
    """The whole point of ROLLUP vs three GROUP BY scans: the orders
    fact table is scanned exactly ONCE, the grouping sets come from one
    Expand, and all three dim joins are broadcasts."""
    import __spark_entry__ as entry_mod

    df = entry_mod.queries()["revenue_rollup"](spark, sf001_dir)
    df.collect()
    p = df._jdf.queryExecution().executedPlan().toString()
    final = p.split("== Initial Plan ==")[0]
    assert final.count("orders.parquet") == 1, final
    assert "Expand" in final
    assert "SortMergeJoin" not in final, final


def test_doc_bigram_lm_hand_computed(spark):
    """Exact bigram surprisal on a corpus small enough to grade by hand:
    add-one-smoothed −ln p(w2|w1) with the corpus's own counts."""
    import math

    from text_extractor_for_bioeconomic_products_spark.operators import (
        textstats,
    )

    docs = spark.createDataFrame(
        [(0, "a b a b c"), (1, "c c c"), (2, "a")],
        "doc_id long, text string",
    )
    # q_doc_bigram_lm loads from sf_dir; drive the same pipeline by
    # writing the toy corpus to a temp dir
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        docs.write.mode("overwrite").parquet(f"{td}/documents.parquet")
        rows = {
            r["doc_id"]: r
            for r in textstats.q_doc_bigram_lm(spark, td).collect()
        }
    # corpus bigrams: doc0 -> (a,b),(b,a),(a,b),(b,c); doc1 -> (c,c)x2
    # c(a,b)=2 c(b,a)=1 c(b,c)=1 c(c,c)=2 ; left counts a=2 b=2 c=2 ; V=3
    def nl(n_w1, n_xy):
        return round(math.log(n_w1 + 3) - math.log(n_xy + 1), 6)

    assert 2 not in rows  # single-token doc has no bigrams
    exp0 = (nl(2, 2) + nl(2, 1) + nl(2, 2) + nl(2, 1)) / 4
    exp1 = (nl(2, 2) + nl(2, 2)) / 2
    assert rows[0]["n_bigrams"] == 4 and rows[1]["n_bigrams"] == 2
    assert abs(rows[0]["bigram_ce"] - exp0) < 5e-4
    assert abs(rows[1]["bigram_ce"] - exp1) < 5e-4
    # repetitive text is more predictable than alternating text
    assert rows[1]["bigram_ce"] < rows[0]["bigram_ce"]


def _ssj_toy_corpus(spark, n=40, vocab=24):
    """Deterministic overlapping token sets with varied Jaccard."""
    words = [f"w{i:02d}" for i in range(vocab)]
    rows = []
    for i in range(n):
        start = (i * 3) % vocab
        size = 8 + (i % 5)
        toks = [words[(start + j) % vocab] for j in range(size)]
        if i % 7 == 0 and i > 0:  # near-duplicates of the previous doc
            prev = rows[-1][1].split(" ")
            toks = prev[:-1] + [words[(start + size + 1) % vocab]]
        rows.append((i, " ".join(toks)))
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_set_similarity_prefix_filter_is_exact(spark):
    """The PPJoin-style prefix filter must produce IDENTICAL pairs (and
    jaccard values) to the brute-force all-pairs join — zero false
    negatives — at a tau low enough that prefixes really bind."""
    import itertools

    from text_extractor_for_bioeconomic_products_spark.operators.dedup import (
        set_similarity_pairs,
    )

    docs = _ssj_toy_corpus(spark)
    tau = 0.6
    got = {
        (r["d1"], r["d2"]): round(r["jac"], 6)
        for r in set_similarity_pairs(docs, tau=tau).collect()
    }
    sets = {
        r["doc_id"]: frozenset(r["text"].split(" "))
        for r in docs.collect()
    }
    want = {}
    for a, b in itertools.combinations(sorted(sets), 2):
        inter = len(sets[a] & sets[b])
        jac = inter / (len(sets[a]) + len(sets[b]) - inter)
        if jac >= tau:
            want[(a, b)] = round(jac, 6)
    assert want, "toy corpus produced no qualifying pairs — fix the fixture"
    assert got == want


def test_set_similarity_tau_boundary_pair_included(spark):
    """A pair with jaccard EXACTLY tau must be kept (>= semantics):
    |A∩B| = 6, |A∪B| = 10 → 0.6."""
    from text_extractor_for_bioeconomic_products_spark.operators.dedup import (
        set_similarity_pairs,
    )

    a = " ".join(f"t{i}" for i in range(8))            # t0..t7
    b = " ".join([f"t{i}" for i in range(6)] + ["u1", "u2"])  # 6 shared
    docs = spark.createDataFrame(
        [(0, a), (1, b), (2, "z1 z2 z3")], "doc_id long, text string"
    )
    rows = set_similarity_pairs(docs, tau=0.6).collect()
    pairs = {(r["d1"], r["d2"]): r["jac"] for r in rows}
    assert pairs == {(0, 1): 0.6}


def test_set_similarity_join_plan_no_global_window(spark, sf001_dir):
    """The global token order comes from in-row struct sorting, NOT a
    rank window — the plan must contain no Window operator (a global
    row_number would serialize on one partition at scale) and the df
    table must broadcast into the token stream."""
    import __spark_entry__ as entry_mod

    df = entry_mod.queries()["set_similarity_join"](spark, sf001_dir)
    df.collect()
    p = df._jdf.queryExecution().executedPlan().toString()
    final = p.split("== Initial Plan ==")[0]
    assert "Window" not in final, final
    assert "BroadcastHashJoin" in final, final


def test_containment_catches_quote_jaccard_misses(spark):
    """The asymmetric case that motivates containment: a short doc fully
    quoted inside a long one has containment 1.0 but Jaccard well below
    any dedup threshold — the symmetric join must miss it, the directed
    join must find it (direction: contained -> container)."""
    from text_extractor_for_bioeconomic_products_spark.operators.dedup import (
        containment_pairs,
        set_similarity_pairs,
    )

    quote = " ".join(f"q{i}" for i in range(5))
    host = quote + " " + " ".join(f"h{i}" for i in range(20))
    docs = spark.createDataFrame(
        [(0, quote), (1, host), (2, "x1 x2 x3 x4")],
        "doc_id long, text string",
    )
    cont = {
        (r["d1"], r["d2"]): r["containment"]
        for r in containment_pairs(docs, theta=0.9).collect()
    }
    assert cont == {(0, 1): 1.0}  # directed: quote contained in host only
    jac = set_similarity_pairs(docs, tau=0.9).collect()
    assert jac == []  # jaccard 5/25 = 0.2 — symmetric join blind to it


def test_containment_prefix_filter_is_exact(spark):
    """Asymmetric prefix filtering must equal the directed brute force
    (every ordered pair, exact |A∩B|/|A|) — zero false negatives."""
    import itertools

    from text_extractor_for_bioeconomic_products_spark.operators.dedup import (
        containment_pairs,
    )

    docs = _ssj_toy_corpus(spark)
    theta = 0.75
    got = {
        (r["d1"], r["d2"]): round(r["containment"], 6)
        for r in containment_pairs(docs, theta=theta).collect()
    }
    sets = {
        r["doc_id"]: frozenset(r["text"].split(" ")) for r in docs.collect()
    }
    want = {}
    for a, b in itertools.permutations(sorted(sets), 2):
        c = len(sets[a] & sets[b]) / len(sets[a])
        if c >= theta:
            want[(a, b)] = round(c, 6)
    assert want, "toy corpus produced no qualifying directed pairs"
    assert got == want


def test_source_token_divergence_toy_corpus(spark):
    """Two symmetric single-token sources: hand-computable JSD
    (= ½·1·ln(1/m₁) + ½·½·ln(½/m₁) + ½·½·ln(½/m₂) with m₁=¾, m₂=¼),
    equal across the two sources by symmetry, within (0, ln 2)."""
    import math
    import tempfile

    from text_extractor_for_bioeconomic_products_spark.operators.textstats import (
        q_source_token_divergence,
    )

    docs = spark.createDataFrame(
        [(0, "a a a", "en", "X", 5), (1, "b b b", "en", "Y", 5)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    with tempfile.TemporaryDirectory() as td:
        docs.write.mode("overwrite").parquet(f"{td}/documents.parquet")
        rows = {
            r["source"]: r
            for r in q_source_token_divergence(spark, td).collect()
        }
    expected = (
        0.5 * 1.0 * math.log(1.0 / 0.75)
        + 0.5 * 0.5 * math.log(0.5 / 0.75)
        + 0.5 * 0.5 * math.log(0.5 / 0.25)
    )
    assert set(rows) == {"X", "Y"}
    for r in rows.values():
        assert r["n_tokens"] == 3
        assert abs(r["jsd"] - expected) < 1e-5
        assert 0 < r["jsd"] < math.log(2)
    assert rows["X"]["jsd"] == rows["Y"]["jsd"]  # symmetric by construction


def test_source_token_divergence_zero_for_identical_sources(spark):
    """A source whose token distribution equals the corpus distribution
    must score exactly 0 (p == q == m → every log term vanishes)."""
    import tempfile

    from text_extractor_for_bioeconomic_products_spark.operators.textstats import (
        q_source_token_divergence,
    )

    docs = spark.createDataFrame(
        [(0, "a b c", "en", "X", 5), (1, "a b c", "en", "Y", 5)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    with tempfile.TemporaryDirectory() as td:
        docs.write.mode("overwrite").parquet(f"{td}/documents.parquet")
        rows = q_source_token_divergence(spark, td).collect()
    assert [r["jsd"] for r in rows] == [0.0, 0.0]


def test_prefix_filter_exactness_property(spark):
    """Hypothesis battery: on random corpora (varied vocab, doc sizes,
    duplicates, singleton-token docs) and random thresholds, BOTH
    prefix-filtered joins must equal their brute-force duals exactly —
    the zero-false-negative guarantee is structural, not corpus-luck."""
    import itertools

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from text_extractor_for_bioeconomic_products_spark.operators.dedup import (
        containment_pairs,
        set_similarity_pairs,
    )

    @settings(max_examples=6, deadline=None)
    @given(
        data=st.lists(
            st.sets(
                st.integers(min_value=0, max_value=17),
                min_size=1, max_size=9,
            ),
            min_size=3, max_size=14,
        ),
        tau=st.sampled_from([0.5, 0.6, 0.75, 0.9, 1.0]),
    )
    def check(data, tau):
        rows = [
            (i, " ".join(f"w{t}" for t in sorted(s)))
            for i, s in enumerate(data)
        ]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        sets = {i: frozenset(f"w{t}" for t in s) for i, s in enumerate(data)}

        got_j = {
            (r["d1"], r["d2"]): round(r["jac"], 6)
            for r in set_similarity_pairs(docs, tau=tau).collect()
        }
        want_j = {}
        for a, b in itertools.combinations(sorted(sets), 2):
            inter = len(sets[a] & sets[b])
            j = inter / (len(sets[a]) + len(sets[b]) - inter)
            if j >= tau:
                want_j[(a, b)] = round(j, 6)
        assert got_j == want_j

        got_c = {
            (r["d1"], r["d2"]): round(r["containment"], 6)
            for r in containment_pairs(docs, theta=tau).collect()
        }
        want_c = {}
        for a, b in itertools.permutations(sorted(sets), 2):
            c = len(sets[a] & sets[b]) / len(sets[a])
            if c >= tau:
                want_c[(a, b)] = round(c, 6)
        assert got_c == want_c

    check()


def test_per_source_cap_deterministic_and_binding(spark, sf001_dir):
    """The domain cap must (a) bind: no source keeps more than
    CAP_PER_SOURCE docs; (b) select the SAME documents regardless of
    physical layout — kept_id_sum (the census checksum of selected ids)
    must be identical when the input arrives with a different partition
    count, because the coin is a pure function of doc_id."""
    import __spark_entry__ as entry_mod
    from text_extractor_for_bioeconomic_products_spark.operators.curation import (
        CAP_PER_SOURCE,
    )

    rows = entry_mod.queries()["per_source_cap"](spark, sf001_dir).collect()
    assert rows
    for r in rows:
        assert r["n_kept"] == min(CAP_PER_SOURCE, r["n_docs"])

    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "2")
        rows2 = entry_mod.queries()["per_source_cap"](
            spark, sf001_dir
        ).collect()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    key = lambda rs: sorted((r["source"], r["kept_id_sum"]) for r in rs)  # noqa: E731
    assert key(rows) == key(rows2)


def test_cms_point_estimates_match_hashlib_recomputation(spark):
    """Count-min estimates under a deliberately collision-heavy fixture
    (256 cells, CMS_HEX=2 construction) equal a pure-hashlib
    recomputation of the identical md5 sketch, and every estimate is
    >= the true count (an occurrence can never vanish from its cell)."""
    import hashlib
    from collections import Counter

    from text_extractor_for_bioeconomic_products_spark.operators.relational import (
        CMS_DEPTH,
        CMS_HEX,
        cms_point_estimates,
    )

    # zipf-ish stream over 40 keys: key i occurs (41 - i) times
    keys = list(range(1, 41))
    stream_rows = [(k,) for k in keys for _ in range(41 - k)]
    true = Counter(k for (k,) in stream_rows)

    def cell(k, j):
        return hashlib.md5(f"cms{j}:{k}".encode()).hexdigest()[:CMS_HEX]

    sketch = Counter(
        (j, cell(k, j)) for (k,) in stream_rows for j in range(CMS_DEPTH)
    )
    expected = {
        k: min(sketch[(j, cell(k, j))] for j in range(CMS_DEPTH))
        for k in keys
    }

    stream = spark.createDataFrame(stream_rows, "user_id long")
    probe = spark.createDataFrame([(k,) for k in keys], "user_id long")
    got = {
        r["user_id"]: r["cms_est"]
        for r in cms_point_estimates(stream, probe, key="user_id").collect()
    }
    assert got == expected
    assert all(got[k] >= true[k] for k in keys)


def test_cms_query_plan_broadcasts_sketch(spark, sf001_dir):
    """The probe join must broadcast the constant-size cell table — the
    raw key space never hash-partitions for the estimate, and no window
    or cartesian appears anywhere."""
    import __spark_entry__ as entry_mod

    df = entry_mod.queries()["cms_user_frequency"](spark, sf001_dir)
    df.collect()
    final = (
        df._jdf.queryExecution().executedPlan().toString()
        .split("== Initial Plan ==")[0]
    )
    assert "BroadcastHashJoin" in final, final
    assert "CartesianProduct" not in final, final
    assert "Window" not in final, final


def test_kmv_exhaustive_pair_is_exact(spark):
    """When both groups' distinct sets fit under k, the Theta-sketch
    union/intersection estimates ARE the exact values — the exhaustive
    branch, the base case every scale-up must still satisfy."""
    from text_extractor_for_bioeconomic_products_spark.operators.relational import (
        kmv_set_estimates,
        kmv_sketches,
    )

    rows = [("a", k) for k in range(20)] + [("b", k) for k in range(10, 40)]
    keyed = spark.createDataFrame(rows, "g string, key long")
    sk = kmv_sketches(keyed, group="g", key="key")
    got = kmv_set_estimates(sk, group="g").collect()
    assert len(got) == 1
    r = got[0]
    assert (r["exact_a"], r["exact_b"]) == (20, 30)
    assert r["union_est"] == 40.0          # |0..39| exactly
    assert r["inter_est"] == 10.0          # |10..19| exactly
    assert r["jaccard_est"] == 0.25


def test_kmv_estimates_match_hashlib_recomputation(spark):
    """Above k the estimator path engages: the sketch rows, the merged
    k-minimum set, and the (k-1)/h_k estimate all equal a pure-hashlib
    recomputation of the identical md5 construction, and the union
    estimate lands within the KMV error envelope of the truth."""
    import hashlib

    from text_extractor_for_bioeconomic_products_spark.operators.relational import (
        KMV_K,
        _KMV_DENOM,
        kmv_set_estimates,
        kmv_sketches,
    )

    a_keys = list(range(100))            # 100 distinct
    b_keys = list(range(50, 200))        # 150 distinct, overlap 50
    rows = [("a", k) for k in a_keys] + [("b", k) for k in b_keys]
    keyed = spark.createDataFrame(rows, "g string, key long")

    def h(k):
        return hashlib.md5(f"kmv:{k}".encode()).hexdigest()

    sk_a = sorted(h(k) for k in set(a_keys))[:KMV_K]
    sk_b = sorted(h(k) for k in set(b_keys))[:KMV_K]
    kmin = sorted(set(sk_a) | set(sk_b))[:KMV_K]
    n_both = sum(1 for x in kmin if x in set(sk_a) and x in set(sk_b))
    h_k = kmin[-1]
    union_exp = (KMV_K - 1) / (int(h_k[:15], 16) / _KMV_DENOM)
    jac_exp = n_both / KMV_K

    sk = kmv_sketches(keyed, group="g", key="key")
    # Spark's per-group sketch IS the hashlib sketch
    spark_a = sorted(r["h"] for r in sk.filter("g = 'a'").collect())
    assert spark_a == sk_a

    r = kmv_set_estimates(sk, group="g").collect()[0]
    assert (r["exact_a"], r["exact_b"]) == (100, 150)
    assert abs(r["union_est"] - union_exp) < 1e-3
    assert abs(r["jaccard_est"] - jac_exp) < 1e-5
    assert abs(r["inter_est"] - jac_exp * union_exp) < 1e-3
    # estimator quality: true union is 200; k=64 gives ~12.7% std error
    assert abs(r["union_est"] - 200) / 200 < 0.5


def test_kmv_sketch_rows_bounded_by_k(spark, sf001_dir):
    """The pair comparison never touches more than k rows per group —
    the property that lets two petabyte corpora compare via broadcast."""
    import __spark_entry__ as entry_mod
    from text_extractor_for_bioeconomic_products_spark.operators.relational import (
        KMV_K,
        kmv_sketches,
    )
    from text_extractor_for_bioeconomic_products_spark.sources.tables import load
    from pyspark.sql import functions as F

    events = load(spark, sf001_dir, "events")
    keyed = events.select(
        "event_type", F.col("user_id").cast("string").alias("k")
    )
    sk = kmv_sketches(keyed, group="event_type", key="k")
    per_group = {
        r["event_type"]: r["n"]
        for r in sk.groupBy("event_type").agg(F.count("*").alias("n")).collect()
    }
    assert per_group and all(n <= KMV_K for n in per_group.values())
    # and the driver query runs end to end on the small tier
    out = entry_mod.queries()["kmv_type_overlap"](spark, sf001_dir).collect()
    assert len(out) == 10  # C(5,2) event-type pairs
    for row in out:
        assert row["union_est"] >= row["exact_a"] * 0.3  # sane scale


def test_markov_transitions_hand_computed(spark):
    """Transition matrix over a hand-built two-user sequence equals the
    enumerated pairs, probabilities condition on from_state, and no
    transition crosses a user boundary."""
    from datetime import datetime

    from text_extractor_for_bioeconomic_products_spark.operators.temporal import (
        markov_transitions,
    )

    def t(s):
        return datetime(2026, 1, 1, 0, 0, s)

    # u1: a a b ; u2: b a   — pairs: (a,a) (a,b) from u1, (b,a) from u2
    rows = [
        (1, t(0), 1, "a"), (1, t(1), 2, "a"), (1, t(2), 3, "b"),
        (2, t(0), 4, "b"), (2, t(5), 5, "a"),
    ]
    events = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long, event_type string"
    )
    got = {
        (r["from_state"], r["to_state"]): (r["n_transitions"], r["prob"])
        for r in markov_transitions(
            events, key="user_id", time_col="ts",
            tiebreak_col="event_id", state="event_type",
        ).collect()
    }
    assert got == {
        ("a", "a"): (1, 0.5),
        ("a", "b"): (1, 0.5),
        ("b", "a"): (1, 1.0),
    }
    # the u1-end → u2-start pair ("b","b") must NOT exist
    assert ("b", "b") not in got


def test_burstiness_periodic_user_hits_minus_one_bin(spark):
    """A perfectly periodic user (σ=0 ⇒ B=−1) lands in bin −10; a user
    with < 2 gaps is excluded; the histogram sums are exact integers."""
    from datetime import datetime, timedelta

    from text_extractor_for_bioeconomic_products_spark.operators.temporal import (
        interarrival_burstiness,
    )

    base = datetime(2026, 1, 1)
    rows = []
    # user 1: 5 events exactly 60 s apart — periodic, B = -1
    rows += [(1, base + timedelta(seconds=60 * i), i) for i in range(5)]
    # user 2: gaps 1 s, 1 s, 3598 s — bursty, B > 0
    for i, off in enumerate([0, 1, 2, 3600]):
        rows.append((2, base + timedelta(seconds=off), 10 + i))
    # user 3: only two events (one gap) — excluded (sample σ undefined)
    rows += [(3, base, 20), (3, base + timedelta(seconds=9), 21)]
    events = spark.createDataFrame(rows, "user_id long, ts timestamp, event_id long")
    got = {
        r["burst_bin"]: (r["n_users"], r["n_gaps"], r["total_gap_s"])
        for r in interarrival_burstiness(
            events, key="user_id", time_col="ts", tiebreak_col="event_id"
        ).collect()
    }
    assert got.get(-10) == (1, 4, 240)          # the periodic user
    # the bursty user: gaps (1,1,3598) ⇒ μ=1200, σ≈2076.7,
    # B≈0.2676 ⇒ bin 2
    assert got.get(2) == (1, 3, 3600)
    assert sum(v[0] for v in got.values()) == 2  # user 3 excluded


def test_ams_f2_matches_hashlib_recomputation(spark):
    """The AMS F2 estimate equals a pure-hashlib recomputation of the
    identical md5-signed counters (sum → square → group mean → exact
    5-way median), and the exact F2 column is the true self-join size."""
    import hashlib
    import statistics
    from collections import Counter

    from text_extractor_for_bioeconomic_products_spark.operators.relational import (
        AMS_GROUPS,
        AMS_PER_GROUP,
        ams_f2_estimate,
    )

    # zipf-ish stream over 30 keys: key i occurs (31 - i) times
    keys = list(range(1, 31))
    stream_rows = [(k,) for k in keys for _ in range(31 - k)]
    true_f2 = sum(c * c for c in Counter(k for (k,) in stream_rows).values())

    def sign(k, j):
        nib = hashlib.md5(f"ams{j}:{k}".encode()).hexdigest()[0]
        return 1 if nib in "01234567" else -1

    n = AMS_GROUPS * AMS_PER_GROUP
    sums = [
        sum(sign(k, j) for (k,) in stream_rows) for j in range(n)
    ]
    gmeans = [
        statistics.mean(
            float(sums[j] * sums[j])
            for j in range(n)
            if j % AMS_GROUPS == g
        )
        for g in range(AMS_GROUPS)
    ]
    expected = statistics.median(gmeans)

    stream = spark.createDataFrame(stream_rows, "user_id long")
    got = ams_f2_estimate(stream, key="user_id").collect()[0]["ams_est"]
    assert got == expected
    # estimator sanity: within the ~2σ envelope of the truth
    # (σ ≈ F2·√(2/AMS_PER_GROUP) per group mean)
    import math
    assert abs(got - true_f2) <= 2.5 * true_f2 * math.sqrt(2 / AMS_PER_GROUP)


def test_ams_query_plan_is_constant_width(spark, sf001_dir):
    """The AMS census never hash-partitions the key space: the only
    aggregates are over the 80 counter ids (partial map-side), the
    single-row estimate broadcasts, and no window or cartesian product
    appears anywhere in the physical plan."""
    import __spark_entry__ as entry_mod

    df = entry_mod.queries()["ams_selfjoin_size"](spark, sf001_dir)
    rows = df.collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["exact_f2"] > 0 and r["ams_est"] > 0 and r["n_counters"] == 80
    final = (
        df._jdf.queryExecution().executedPlan().toString()
        .split("== Initial Plan ==")[0]
    )
    assert "partial_sum" in final, final
    assert "CartesianProduct" not in final, final
    assert "Window" not in final, final
