"""Checkpoint/resume, lineage, sinks, streaming, and multimodal plumbing."""

from __future__ import annotations

import os

import pytest

from text_extractor_for_bioeconomic_products_spark.operators.extract import (
    explode_spans,
    extract_turns,
)
from text_extractor_for_bioeconomic_products_spark.plans.pipeline import (
    run_extraction,
)


@pytest.fixture()
def out_dir(tmp_path):
    return str(tmp_path / "out")


def test_run_extraction_full_and_resume(spark, transcripts_df, out_dir):
    r1 = run_extraction(spark, transcripts_df, out_dir, run_id="r1", n_buckets=8)
    assert r1.buckets_processed > 0
    assert r1.n_turns == transcripts_df.count()
    turns = spark.read.parquet(os.path.join(out_dir, "turns_extracted"))
    assert turns.count() == r1.n_turns
    spans = spark.read.parquet(os.path.join(out_dir, "product_spans"))
    assert spans.count() == r1.n_spans > 0

    # resume: everything already processed → nothing recomputed
    r2 = run_extraction(spark, transcripts_df, out_dir, run_id="r2", n_buckets=8)
    assert r2.buckets_processed == 0
    assert r2.buckets_skipped == r1.buckets_processed
    assert spark.read.parquet(os.path.join(out_dir, "turns_extracted")).count() == r1.n_turns


def test_run_extraction_partial_resume(spark, transcripts_df, out_dir):
    """Simulate a crash after half the buckets: preload a partial manifest;
    the rerun must process exactly the missing buckets, idempotently."""
    from pyspark.sql import functions as F

    full = run_extraction(spark, transcripts_df, out_dir + "_ref", run_id="ref", n_buckets=8)

    # process only buckets 0..3 first (filter the input to simulate)
    part_df = transcripts_df.filter(
        F.pmod(F.xxhash64("conv_id"), F.lit(8)).cast("int") < 4
    )
    r1 = run_extraction(spark, part_df, out_dir, run_id="r1", n_buckets=8)
    # now run over the full input — only the remaining buckets execute
    r2 = run_extraction(spark, transcripts_df, out_dir, run_id="r2", n_buckets=8)
    assert r1.buckets_processed + r2.buckets_processed == full.buckets_processed
    total = spark.read.parquet(os.path.join(out_dir, "turns_extracted")).count()
    assert total == full.n_turns


def test_lineage_counters(spark, transcripts_df, out_dir):
    r = run_extraction(spark, transcripts_df, out_dir, run_id="lin", n_buckets=8)
    lineage = spark.read.parquet(os.path.join(out_dir, "lineage"))
    rows = lineage.collect()
    assert {row["run_id"] for row in rows} == {"lin"}
    assert sum(row["n_turns"] for row in rows) == r.n_turns
    assert sum(row["n_spans"] for row in rows) == r.n_spans
    assert all(row["n_errors"] == 0 for row in rows)


def test_csv_sink_explode_outer_semantics(spark, transcripts_df, tmp_path):
    """S9: a span with empty tipos_uso still emits one CSV row
    (batch_process.py:162-171 explode_outer contract)."""
    from text_extractor_for_bioeconomic_products_spark.sources.sinks import (
        write_spans_csv,
    )
    spans = explode_spans(extract_turns(transcripts_df))
    n_spans = spans.count()
    from pyspark.sql import functions as F
    n_uses = spans.select(F.sum(F.greatest(F.size("tipos_uso"), F.lit(1)))).collect()[0][0]
    path = str(tmp_path / "csv")
    write_spans_csv(spans, path)
    back = spark.read.option("header", True).csv(path)
    assert back.count() == n_uses >= n_spans


def test_json_sink(spark, transcripts_df, tmp_path):
    from text_extractor_for_bioeconomic_products_spark.sources.sinks import (
        write_spans_json,
    )
    spans = explode_spans(extract_turns(transcripts_df))
    path = str(tmp_path / "json")
    write_spans_json(spans, path)
    back = spark.read.json(path)
    assert back.count() == spans.count()
    assert "_meta" in back.columns


def test_streaming_matches_batch(spark, transcripts_df, tmp_path):
    """availableNow stream over the same input == batch output (row counts
    and span totals)."""
    from text_extractor_for_bioeconomic_products_spark.sources.transcripts import (
        write_transcripts,
    )
    from text_extractor_for_bioeconomic_products_spark.streaming.pipeline import (
        run_streaming_extraction,
    )
    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "stream_out")
    write_transcripts(transcripts_df, in_dir)
    run_streaming_extraction(spark, in_dir, out_dir, timeout_sec=180)
    got = spark.read.parquet(os.path.join(out_dir, "turns_extracted_stream"))
    batch = extract_turns(transcripts_df).drop("spans")
    assert got.count() == batch.count()
    from pyspark.sql import functions as F
    assert (
        got.agg(F.sum("n_spans")).collect()[0][0]
        == batch.agg(F.sum("n_spans")).collect()[0][0]
    )


def test_multimodal_plumbing(spark):
    from text_extractor_for_bioeconomic_products_spark.operators.multimodal import (
        extract_media_features,
        frame_sample_stub,
        resize_media,
        synthesize_media,
    )
    media = synthesize_media(spark, n=60)
    feats = extract_media_features(media).collect()
    assert len(feats) == 60
    assert all(f["valid"] for f in feats)
    by_kind = {}
    for f in feats:
        by_kind.setdefault(f["kind"], []).append(f)
    # images are REAL BMPs/PNGs/JPEGs (cycling): real dims, real pixel
    # mean in (0, 255); all three codecs must actually appear
    assert {f["codec"] for f in by_kind["image"]} == {"bmp", "png", "jpeg"}
    assert all(16 <= f["width"] <= 64 and 16 <= f["height"] <= 64
               for f in by_kind["image"])
    assert all(0.0 < f["mean_level"] < 255.0 for f in by_kind["image"])
    # audio is REAL PCM WAV: width=sample rate, height=frames, |amp| mean
    assert all(f["codec"] == "wav" for f in by_kind["audio"])
    assert all(f["width"] >= 8000 and f["height"] >= 500
               for f in by_kind["audio"])
    assert all(0.0 < f["mean_level"] < 1.0 for f in by_kind["audio"])
    # video is REAL containers now, cycling raw-AVI / MJPEG-AVI /
    # MJPEG-MP4: real dims, real pixel means, all three must appear
    assert {f["codec"] for f in by_kind["video"]} == {
        "avi", "mjpeg_avi", "mjpeg_mp4"}
    assert all(8 <= f["width"] <= 32 and 8 <= f["height"] <= 32
               for f in by_kind["video"])
    assert all(0.0 < f["mean_level"] < 255.0 for f in by_kind["video"])
    # determinism: same synth → same hashes
    feats2 = extract_media_features(synthesize_media(spark, n=60)).collect()
    assert sorted(f["sha256"] for f in feats) == sorted(f["sha256"] for f in feats2)
    # REAL resize: image dims clamp (re-encoded BMP still decodes, mean
    # stays a real pixel statistic); audio/video payloads byte-unchanged
    resized = {f["media_id"]: f for f in
               extract_media_features(resize_media(media, max_dim=32)).collect()}
    orig = {f["media_id"]: f for f in feats}
    for mid, f in resized.items():
        if f["kind"] == "image":
            assert max(f["width"], f["height"]) <= 32 and f["valid"]
            assert 0.0 < f["mean_level"] < 255.0
        else:
            assert f["sha256"] == orig[mid]["sha256"]
    # REAL frame sampling: only video rows, real per-frame pixel means
    frames = frame_sample_stub(media).collect()
    video_ids = {f["media_id"] for f in frames}
    assert video_ids and all(mid % 3 == 2 for mid in video_ids)
    assert all(
        f["frame_mean"] is not None and 0.0 < f["frame_mean"] < 255.0
        for f in frames
    )


def test_bmp_wav_codec_roundtrip():
    """The stdlib codecs are real: encode → decode returns the exact
    pixels/frames (including the 4-byte BMP row-padding path)."""
    import numpy as np

    from text_extractor_for_bioeconomic_products_spark.operators.multimodal import (
        decode_bmp,
        decode_wav,
        encode_bmp,
        encode_wav,
    )

    for w, h in [(3, 2), (4, 4), (17, 5)]:  # odd widths exercise padding
        pixels = bytes((i * 37) % 256 for i in range(w * h * 3))
        payload = encode_bmp(w, h, pixels)
        rw, rh, mean_level, arr = decode_bmp(payload)
        assert (rw, rh) == (w, h)
        assert arr.tobytes() == pixels  # exact pixel roundtrip
        expect = round(float(np.frombuffer(pixels, np.uint8).astype(np.float64).mean()), 4)
        assert mean_level == expect
    frames = np.arange(-500, 500, dtype="<i2").tobytes()
    rate, n, mean_level = decode_wav(encode_wav(11025, frames))
    assert rate == 11025 and n == 1000
    assert mean_level == round(float(np.abs(np.arange(-500, 500)).mean()) / 32768.0, 4)


def test_png_codec_roundtrip():
    """The stdlib-zlib PNG codec is real: encode → decode returns the
    exact pixels through ALL FIVE scanline filters (encoder assigns
    filter r%5, so height ≥ 5 exercises None/Sub/Up/Average/Paeth);
    CRC corruption and truncation are detected; unsupported PNG flavors
    raise NotImplementedError (the documented boundary)."""
    import struct as _struct

    import numpy as np
    import pytest as _pytest

    from text_extractor_for_bioeconomic_products_spark.operators.multimodal import (
        decode_media,
        decode_png,
        encode_png,
    )

    for w, h in [(1, 1), (3, 7), (17, 6)]:  # h≥5 covers all 5 filters
        pixels = bytes((i * 37 + i // 7) % 256 for i in range(w * h * 3))
        payload = encode_png(w, h, pixels)
        rw, rh, mean_level, arr = decode_png(payload)
        assert (rw, rh) == (w, h)
        assert arr.tobytes() == pixels  # exact pixel roundtrip
        expect = round(
            float(np.frombuffer(pixels, np.uint8).astype(np.float64).mean()), 4
        )
        assert mean_level == expect
        # dispatch integration: decode_media routes by the PNG signature
        assert decode_media(payload)[0] == "png"

    good = encode_png(4, 6, bytes(range(72)))
    # flip one IDAT byte -> CRC check must fire
    idat_pos = good.index(b"IDAT") + 4
    bad = bytearray(good)
    bad[idat_pos] ^= 0xFF
    with _pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(bad))
    with _pytest.raises(ValueError):
        decode_png(good[:30])  # truncated chunk stream
    # unsupported flavor: grayscale (color type 0) is out of scope
    ihdr = _struct.pack(">IIBBBBB", 4, 6, 8, 0, 0, 0, 0)
    from text_extractor_for_bioeconomic_products_spark.operators.multimodal import (
        _PNG_SIG, _png_chunk,
    )
    gray = _PNG_SIG + _png_chunk(b"IHDR", ihdr) + _png_chunk(b"IEND", b"")
    with _pytest.raises(NotImplementedError):
        decode_png(gray)


def test_decoder_allocation_bounds():
    """Untrusted-header allocation guards: crafted huge IHDR/SOF0
    dimensions and zlib-bomb IDATs are REFUSED before any
    dimension-sized allocation (a malicious row must raise ValueError
    in the worker, not OOM it)."""
    import struct as _struct
    import zlib as _zlib

    import pytest as _pytest

    from text_extractor_for_bioeconomic_products_spark.operators.multimodal import (
        _PNG_SIG,
        _png_chunk,
        decode_jpeg,
        decode_png,
        encode_jpeg,
    )

    # PNG declaring 1 billion pixels: rejected at the IHDR, instantly
    ihdr = _struct.pack(">IIBBBBB", 40000, 30000, 8, 2, 0, 0, 0)
    huge = _PNG_SIG + _png_chunk(b"IHDR", ihdr) + _png_chunk(b"IEND", b"")
    with _pytest.raises(ValueError, match="refusing to allocate"):
        decode_png(huge)

    # zlib bomb: sane 10x10 dims but an IDAT inflating to ~50 MB from
    # ~50 KB — the bounded inflate stops at expected+1 bytes and raises
    ihdr = _struct.pack(">IIBBBBB", 10, 10, 8, 2, 0, 0, 0)
    bomb = _zlib.compress(b"\x00" * 50_000_000, 9)
    assert len(bomb) < 100_000
    payload = (
        _PNG_SIG + _png_chunk(b"IHDR", ihdr) + _png_chunk(b"IDAT", bomb)
        + _png_chunk(b"IEND", b"")
    )
    with _pytest.raises(ValueError, match="size mismatch"):
        decode_png(payload)

    # JPEG SOF0 declaring 1.2 billion pixels: rejected at the header
    good = bytearray(encode_jpeg(8, 8, bytes(range(8 * 8 * 3))))
    sof_at = good.index(b"\xff\xc0")
    _struct.pack_into(">HH", good, sof_at + 5, 30000, 40000)  # h, w
    with _pytest.raises(ValueError, match="refusing to allocate"):
        decode_jpeg(bytes(good))


def test_jpeg_codec_roundtrip():
    """The numpy+stdlib baseline JPEG codec is real: dims exact, solid
    colors near-exact (DC-only path through quant/Huffman/IDCT), smooth
    gradients within a tight error bound (JPEG is lossy BY DESIGN — the
    contract is bounded error, not byte equality), encode deterministic,
    and non-baseline flavors refuse (the documented scope)."""
    import numpy as np
    import pytest as _pytest

    from text_extractor_for_bioeconomic_products_spark.operators.multimodal import (
        decode_jpeg,
        decode_media,
        encode_jpeg,
    )

    # DC-only path: a solid block has ONE nonzero coefficient, so this
    # independently pins huffman + dequant + IDCT without encoder bugs
    # being able to cancel decoder bugs on the AC path
    for color in [(0, 0, 0), (255, 255, 255), (120, 33, 200)]:
        px = np.tile(np.array(color, np.uint8), (12, 20, 1))
        w, h, mean, out = decode_jpeg(encode_jpeg(20, 12, px.tobytes()))
        assert (w, h) == (20, 12)
        assert np.abs(out.astype(int) - px.astype(int)).max() <= 4
        assert abs(mean - float(np.mean(color))) <= 4

    # gradient (non-multiple-of-8 dims exercise edge padding + crop)
    gx = np.linspace(0, 255, 33)
    gy = np.linspace(0, 255, 17)
    px = np.round(np.stack([
        np.tile(gx, (17, 1)),
        np.tile(gy[:, None], (1, 33)),
        np.full((17, 33), 128.0),
    ], axis=-1)).astype(np.uint8)
    w, h, _mean, out = decode_jpeg(encode_jpeg(33, 17, px.tobytes()))
    assert (w, h) == (33, 17)
    diff = np.abs(out.astype(int) - px.astype(int))
    assert diff.max() <= 40 and diff.mean() <= 6

    payload = encode_jpeg(33, 17, px.tobytes())
    assert payload == encode_jpeg(33, 17, px.tobytes())  # deterministic
    assert decode_media(payload)[0] == "jpeg"  # dispatch integration

    # progressive JPEG (SOF2) is out of scope and must say so
    sof0 = payload.index(b"\xff\xc0")
    progressive = payload[:sof0] + b"\xff\xc2" + payload[sof0 + 2:]
    with _pytest.raises(NotImplementedError):
        decode_jpeg(progressive)
    with _pytest.raises(ValueError):
        decode_jpeg(b"\xff\xd8\xff\xd9")  # no SOF/SOS


def test_multimodal_invalid_payload_quarantined(spark):
    """Non-FAKE payload (the real-codec NotImplementedError path) is
    flagged valid=false, never fails the job."""
    from text_extractor_for_bioeconomic_products_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        extract_media_features,
    )
    rows = [(0, "image", b"\x89PNG not really", ("s", "image/png"))]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = extract_media_features(media).collect()
    assert len(out) == 1 and out[0]["valid"] is False


def test_lineage_no_duplicates_after_crash_resume(spark, transcripts_df, out_dir):
    """Crash-after-data-before-manifest: rerun must overwrite the bucket's
    lineage row, not append a duplicate."""
    import shutil

    r1 = run_extraction(spark, transcripts_df, out_dir, run_id="c1", n_buckets=8)
    # simulate the crash window: drop the manifest (data + lineage durable)
    shutil.rmtree(os.path.join(out_dir, "manifest"))
    r2 = run_extraction(spark, transcripts_df, out_dir, run_id="c2", n_buckets=8)
    assert r2.buckets_processed == r1.buckets_processed  # full rerun
    lineage = spark.read.parquet(os.path.join(out_dir, "lineage"))
    per_bucket = lineage.groupBy("bucket").count().filter("count > 1").count()
    assert per_bucket == 0  # one lineage row per bucket, last attempt wins
    assert sum(r["n_turns"] for r in lineage.collect()) == r1.n_turns


def test_watermarked_streaming_agg(spark, transcripts_df, tmp_path):
    """streaming_conversation_counts: watermark + event-time window agg over
    the stream; availableNow totals == batch windowed totals."""
    from pyspark.sql import functions as F

    from text_extractor_for_bioeconomic_products_spark.sources.transcripts import (
        write_transcripts,
    )
    from text_extractor_for_bioeconomic_products_spark.streaming.pipeline import (
        streaming_conversation_counts,
    )

    in_dir, out_dir = str(tmp_path / "in"), str(tmp_path / "out")
    write_transcripts(transcripts_df, in_dir)
    streaming_conversation_counts(spark, in_dir, out_dir, timeout_sec=180)
    got = spark.read.parquet(os.path.join(out_dir, "conv_counts_stream"))
    batch = (
        extract_turns(transcripts_df)
        .groupBy(F.window("ts", "10 minutes"), F.col("conv_id"))
        .agg(F.count("*").alias("n_turns"), F.sum("n_spans").alias("n_spans"))
    )
    # append mode emits only windows closed by the watermark; every emitted
    # row must match its batch twin exactly
    got_rows = {
        (r["window"]["start"], r["conv_id"]): (r["n_turns"], r["n_spans"])
        for r in got.collect()
    }
    batch_rows = {
        (r["window"]["start"], r["conv_id"]): (r["n_turns"], r["n_spans"])
        for r in batch.collect()
    }
    assert len(got_rows) > 0
    for k, v in got_rows.items():
        assert batch_rows[k] == v


def test_quality_observations_strings(spark, transcripts_df):
    """A4 observations (response_parser.py:429-437): threshold strings."""
    from text_extractor_for_bioeconomic_products_spark.operators.extract import (
        quality_metrics,
    )
    qm = quality_metrics(explode_spans(extract_turns(transcripts_df))).collect()
    assert len(qm) > 0
    for r in qm:
        if r["confianca_media"] >= 0.8:
            assert "Boa qualidade geral dos dados" in r["observacoes"]
        for o in r["observacoes"]:
            assert o in {
                "Muitos produtos com baixa confiança",
                "Poucos nomes científicos identificados",
                "Boa qualidade geral dos dados",
            }


def test_cap_chunks_explicit_truncation(spark):
    from text_extractor_for_bioeconomic_products_spark.operators.extract import (
        cap_chunks,
    )
    df = spark.createDataFrame(
        [(1, list("abcdefg")), (2, list("ab")), (3, [])],
        "id int, chunks array<string>",
    )
    rows = {r["id"]: r for r in cap_chunks(df, max_chunks=5).collect()}
    assert rows[1]["chunks"] == list("abcde") and rows[1]["n_chunks_dropped"] == 2
    assert rows[2]["chunks"] == list("ab") and rows[2]["n_chunks_dropped"] == 0
    assert rows[3]["chunks"] == [] and rows[3]["n_chunks_dropped"] == 0


def test_merge_turns_keyed_upsert(spark, transcripts_df, tmp_path):
    """Row-granular MERGE semantics: updates replace matched keys, inserts
    add new keys, rows outside the new key set survive, and only buckets
    holding new keys are rewritten."""
    from pyspark.sql import functions as F
    from text_extractor_for_bioeconomic_products_spark.plans.pipeline import (
        merge_turns,
    )

    turns_dir = str(tmp_path / "turns")
    base = extract_turns(transcripts_df).drop("spans")
    merge_turns(spark, turns_dir, base, n_buckets=8)
    n_base = spark.read.parquet(turns_dir).count()

    # update 3 existing turns (same keys, new lang value) + insert 2 new
    upd = (
        base.orderBy("conv_id", "turn_idx").limit(3)
        .withColumn("lang", F.lit("MERGED"))
    )
    ins = (
        base.orderBy("conv_id", "turn_idx").limit(2)
        .withColumn("turn_idx", F.col("turn_idx") + 100000)
    )
    stats = merge_turns(spark, turns_dir, upd.unionByName(ins), n_buckets=8)

    after = spark.read.parquet(turns_dir)
    assert after.count() == n_base + 2
    assert after.filter(F.col("lang") == "MERGED").count() == 3
    # key uniqueness preserved
    assert after.groupBy("conv_id", "turn_idx").count().filter("count > 1").count() == 0
    # only the buckets holding new keys were rewritten
    assert 0 < len(stats["buckets_rewritten"]) <= 8
    # the dynamic-overwrite conf is scoped to the write, not left on the
    # shared session (a later plain partitioned overwrite elsewhere would
    # silently become per-partition)
    assert (
        spark.conf.get("spark.sql.sources.partitionOverwriteMode").lower()
        == "static"
    )


def test_streaming_dedup_exactly_once_per_key(spark, transcripts_df, tmp_path):
    """At-least-once input (every turn delivered twice across two files)
    → exactly one output row per (conv_id, turn_idx)."""
    from text_extractor_for_bioeconomic_products_spark.streaming.pipeline import (
        run_streaming_dedup_extraction,
    )

    src = transcripts_df.limit(200)
    in_dir = str(tmp_path / "in")
    src.write.mode("overwrite").parquet(in_dir)
    src.write.mode("append").parquet(in_dir)  # duplicate delivery
    out_dir = str(tmp_path / "out")
    run_streaming_dedup_extraction(spark, in_dir, out_dir)
    got = spark.read.parquet(str(tmp_path / "out" / "turns_dedup_stream"))
    assert got.count() == src.count()
    assert got.groupBy("conv_id", "turn_idx").count().filter("count > 1").count() == 0


def test_merge_turns_rejects_bad_inputs(spark, transcripts_df, tmp_path):
    """MERGE contract guards: duplicate source keys error (Iceberg's
    'multiple matching rows'), and a mismatched bucket modulus errors
    instead of silently duplicating matched keys."""
    import pytest as _pytest
    from text_extractor_for_bioeconomic_products_spark.plans.pipeline import (
        merge_turns,
    )

    turns_dir = str(tmp_path / "turns")
    base = extract_turns(transcripts_df).drop("spans").limit(50)
    merge_turns(spark, turns_dir, base, n_buckets=8)
    with _pytest.raises(ValueError, match="duplicate"):
        merge_turns(spark, turns_dir, base.unionByName(base.limit(1)), n_buckets=8)
    with _pytest.raises(ValueError, match="n_buckets"):
        merge_turns(spark, turns_dir, base.limit(1), n_buckets=16)


def test_xml_html_excel_sinks(spark, transcripts_df, tmp_path):
    """S10/S11 export surface: XML parses back with matching counts, the
    HTML report carries the census, and the Excel sink writes a REAL
    3-sheet workbook through the built-in stdlib OOXML writer (round 3 —
    previously an import-gated NotImplementedError), validated by
    unzipping and parsing the parts back."""
    import xml.etree.ElementTree as ET
    import zipfile
    from text_extractor_for_bioeconomic_products_spark.sources.sinks import (
        write_products_excel, write_report_html, write_spans_xml,
    )

    spans = explode_spans(extract_turns(transcripts_df.limit(300)))
    n = spans.count()
    assert n > 0

    xml_path = str(tmp_path / "spans.xml")
    write_spans_xml(spans, xml_path)
    root = ET.parse(xml_path).getroot()
    assert int(root.get("count")) == n and root.get("truncated") == "false"
    assert len(root.findall("product")) == n

    html_path = str(tmp_path / "report.html")
    write_report_html(spans, html_path)
    doc = open(html_path, encoding="utf-8").read()
    assert f"Total spans: {n}" in doc and "<table" in doc

    xlsx_path = str(tmp_path / "x.xlsx")
    write_products_excel(spans, xlsx_path)
    ns = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
    with zipfile.ZipFile(xlsx_path) as z:
        assert z.testzip() is None
        wb = ET.fromstring(z.read("xl/workbook.xml"))
        names = [s.get("name") for s in wb.iter(f"{ns}sheet")]
        assert names == ["Products", "Uses", "Summary"]
        sheet1 = ET.fromstring(z.read("xl/worksheets/sheet1.xml"))
        rows = sheet1.findall(f"{ns}sheetData/{ns}row")
        assert len(rows) == n + 1  # header + one row per span
        header = [t.text for t in rows[0].iter(f"{ns}t")]
        assert "nome_popular" in header and "conv_id" in header
        # a known gazetteer surface appears as an inline string somewhere
        body_texts = {t.text for t in sheet1.iter(f"{ns}t")}
        assert any(x in body_texts for x in ("cacao", "açaí", "tagua", "maca"))
        summary = ET.fromstring(z.read("xl/worksheets/sheet3.xml"))
        srows = summary.findall(f"{ns}sheetData/{ns}row")
        assert len(srows) >= 2  # header + ≥1 category census row


def test_compact_buckets(spark, transcripts_df, tmp_path):
    """Fragmented buckets (high write parallelism) compact to one file
    each with byte-identical content."""
    import glob
    from pyspark.sql import functions as F
    from text_extractor_for_bioeconomic_products_spark.plans.pipeline import (
        compact_buckets,
    )

    # the directory name contains a space: input_file_name()-style URIs
    # percent-encode it, which broke the old per-file getsize path — the
    # _metadata aggregate must be encoding-agnostic
    data_dir = str(tmp_path / "frag out")
    turns = extract_turns(transcripts_df.limit(400)).drop("spans")
    bucketed = turns.withColumn(
        "bucket", F.pmod(F.xxhash64("conv_id"), F.lit(4)).cast("int")
    )
    bucketed.repartition(16).write.partitionBy("bucket").parquet(data_dir)
    before_files = glob.glob(f"{data_dir}/bucket=*/*.parquet")
    before = {tuple(r) for r in spark.read.parquet(data_dir).collect()}
    assert len(before_files) > 8  # genuinely fragmented

    stats = compact_buckets(spark, data_dir, target_file_bytes=1 << 30)
    after_files = glob.glob(f"{data_dir}/bucket=*/*.parquet")
    after = {tuple(r) for r in spark.read.parquet(data_dir).collect()}
    assert after == before
    assert len(after_files) == stats["files_after"] <= 4
    assert stats["files_before"] == len(before_files)


def test_streaming_microbatch_rate(spark, transcripts_df, tmp_path):
    """Continuous-trigger micro-batches sustain a real per-batch cadence:
    one file per trigger, all rows delivered exactly once, steady-state
    batch latency bounded (measured ~0.8-1.0 s median on 4 cores for
    ~450-turn batches; the bound leaves headroom for VM noise)."""
    from text_extractor_for_bioeconomic_products_spark.streaming.pipeline import (
        measure_streaming_rate,
    )

    in_dir = str(tmp_path / "rate_in")
    transcripts_df.repartition(8).write.parquet(in_dir)
    stats = measure_streaming_rate(
        spark, in_dir, str(tmp_path / "rate_out"), timeout_sec=120
    )
    assert stats["complete"]
    assert stats["n_rows"] == transcripts_df.count()
    assert stats["n_batches"] >= 5  # genuinely incremental, not one gulp
    assert stats["median_batch_ms"] is not None
    # wall-clock latency asserted only when the env opts in: this VM's
    # co-tenancy swings the same job ±40% (BENCH.md), so an unconditional
    # tight bound is flake, not signal; correctness assertions above stay
    # unconditional
    if os.environ.get("SPARK_GRAFT_ASSERT_LATENCY"):
        assert stats["median_batch_ms"] < 2500
    # parquet sink holds exactly the streamed rows (exactly-once manifest)
    out = spark.read.parquet(str(tmp_path / "rate_out" / "rate_stream"))
    assert out.count() == stats["n_rows"]


def test_star_contraction_matches_pointer_jumping(spark):
    """connected_components_star (large-star/small-star, the 100 TB
    variant) produces identical components to the pointer-jumping
    implementation on adversarial graph shapes."""
    from text_extractor_for_bioeconomic_products_spark.operators.dedup import (
        connected_components,
        connected_components_star,
    )

    chain = [(i, i + 1) for i in range(0, 40)]          # long diameter
    star = [(100, 100 + i) for i in range(1, 20)]        # hub
    clique = [(200 + i, 200 + j) for i in range(6) for j in range(i + 1, 6)]
    pairs2 = [(300, 301), (302, 303)]                    # isolated pairs
    rev = [(401, 400), (402, 401)]                       # edges given high->low
    selfp = [(500, 500), (501, 502), (502, 502)]         # self-pair singleton
    for name, edges in [
        ("chain", chain), ("star", star), ("clique", clique),
        ("pairs", pairs2), ("rev", rev), ("selfp", selfp),
        ("all", chain + star + clique + pairs2 + rev + selfp),
    ]:
        df = spark.createDataFrame(edges, "doc_a long, doc_b long")
        a = {(r["component"], r["n_docs"], r["members"])
             for r in connected_components(df).collect()}
        # hybrid default (driver union-find finish) AND forced
        # all-distributed star rounds must both match pointer jumping
        b = {(r["component"], r["n_docs"], r["members"])
             for r in connected_components_star(df).collect()}
        c = {(r["component"], r["n_docs"], r["members"])
             for r in connected_components_star(
                 df, driver_finish_max_edges=0).collect()}
        assert a == b, f"{name} hybrid: {a ^ b}"
        assert a == c, f"{name} distributed: {a ^ c}"


def test_star_contraction_matches_on_real_candidates(spark):
    """Same equivalence on the actual sf0.001 near-dup candidate edges."""
    from pyspark.sql import functions as F

    from text_extractor_for_bioeconomic_products_spark.operators.dedup import (
        DUP_EDGE_THRESHOLD,
        _banded_docs,
        _jaccard_pairs_from,
        connected_components,
        connected_components_star,
        load,
    )

    sf = "/root/testdata/sf0.001"
    docs = load(spark, sf, "documents")
    pairs = (
        _jaccard_pairs_from(docs, _banded_docs(spark, sf))
        .filter(F.col("jaccard") >= DUP_EDGE_THRESHOLD)
        .select("doc_a", "doc_b")
    )
    a = {tuple(r) for r in connected_components(pairs).collect()}
    b = {tuple(r) for r in connected_components_star(pairs).collect()}
    c = {tuple(r) for r in connected_components_star(
        pairs, driver_finish_max_edges=0).collect()}
    assert a == b == c and len(a) > 0


def test_minhash_second_band_recall(spark):
    """Multi-band LSH recall: a planted near-dup pair whose FIRST band
    diverges (sig_0 prefix flips) but whose second band agrees must
    surface in the census — the single-band key silently missed exactly
    this class.  The extra word 'ember' was searched offline to flip the
    seed-0 min-hash while preserving seeds 2 and 3."""
    import hashlib

    from text_extractor_for_bioeconomic_products_spark.operators.dedup import (
        minhash_band_census,
    )

    base = "cacao beans are harvested by river communities for food and trade"
    variant = base + " ember"

    def prefix(text, seed):
        return min(
            hashlib.md5((str(seed) + w).encode()).hexdigest()
            for w in set(text.lower().split())
        )[:8]

    # planted-pair preconditions (the fixture itself must stay adversarial)
    assert prefix(base, 0) != prefix(variant, 0)  # band 0 misses the pair
    assert prefix(base, 2) == prefix(variant, 2)
    assert prefix(base, 3) == prefix(variant, 3)  # band 1 catches it

    docs = spark.createDataFrame(
        [(1, base), (2, variant), (3, "totally unrelated words only here")],
        "doc_id long, text string",
    )
    census = {r["band"]: r["n_docs"] for r in minhash_band_census(docs).collect()}
    band1_key = f"1:{prefix(base, 2)}|{prefix(base, 3)}"
    assert census == {band1_key: 2}  # caught by band 1, and ONLY band 1


def test_near_dup_fine_split_drop_is_observable(spark):
    """Two-level capped LSH intentionally skips same-coarse-bucket pairs
    that straddle fine buckets; this pins the behavior on a constructed
    pair AND checks the stats query reports the loss (the recall ledger
    the pair output can't show).  va = coarse plane 0 + 0.5·coarse plane 3
    (every plane dot ≥ 3 from zero, so float summation-order noise can't
    flip a bucket bit — a pure plane-0 base has an exactly-zero dot with
    plane 3 and rounding decides the bit); vb = va nudged along fine
    plane 0 just enough to flip that fine bit (same coarse bucket,
    cos ≈ 0.97 ≫ threshold); 60 scalar multiples of va make the coarse
    bucket hot (> MAX_BUCKET_VECS) so refinement triggers."""
    from pyspark.sql import functions as F

    from text_extractor_for_bioeconomic_products_spark.operators.similarity import (
        MAX_BUCKET_VECS,
        N_PLANES,
        N_PLANES_FINE,
        NEAR_DUP_THRESHOLD,
        _hyperplanes,
        embedding_near_dup_stats,
        embedding_near_dups,
    )

    coarse = _hyperplanes(N_PLANES)
    fine = _hyperplanes(N_PLANES_FINE, seed_prefix="plane2")

    def dot(a, b):
        return sum(x * y for x, y in zip(a, b))

    def bucket(v, planes):
        return sum((1 << p) for p, pl in enumerate(planes) if dot(v, pl) > 0)

    va = [float(a) + 0.5 * float(b) for a, b in zip(coarse[0], coarse[3])]
    s = 1.0 if dot(va, fine[0]) > 0 else -1.0
    vb = [x - s * 0.25 * f for x, f in zip(va, fine[0])]
    cos = dot(va, vb) / (dot(va, va) ** 0.5 * dot(vb, vb) ** 0.5)
    # fixture preconditions: same coarse bucket, different fine bucket,
    # similarity well above the near-dup threshold
    assert bucket(va, coarse) == bucket(vb, coarse)
    assert bucket(va, fine) != bucket(vb, fine)
    assert cos > NEAR_DUP_THRESHOLD
    rows = [(1000, "a", va), (1001, "b", vb)] + [
        (i, "fill", [x * (1.0 + 0.01 * i) for x in va])
        for i in range(1, MAX_BUCKET_VECS + 20)
    ]
    emb = spark.createDataFrame(
        rows, "vec_id long, label string, embedding array<double>"
    )
    pair_rows = {
        (r["vec_a"], r["vec_b"]) for r in embedding_near_dups(emb).collect()
    }
    assert (1000, 1001) not in pair_rows  # the documented recall loss...
    stats = embedding_near_dup_stats(emb).collect()[0]
    assert stats["n_hot_buckets"] >= 1  # ...now observable:
    assert stats["refined_vecs"] >= MAX_BUCKET_VECS + 1
    assert stats["candidate_pairs_skipped"] >= 1
    # sanity: the skipped count is exactly C(n,2) - sum_fine C(m,2) for
    # the one hot bucket in this fixture
    from collections import Counter

    fine_sizes = Counter(bucket(v, fine) for _, _, v in rows)
    n = len(rows)
    expected = n * (n - 1) // 2 - sum(m * (m - 1) // 2 for m in fine_sizes.values())
    assert stats["candidate_pairs_skipped"] == expected


def test_xlsx_writer_edge_cases(tmp_path):
    """Built-in OOXML writer unit surface: column letters past Z, sheet
    name sanitization/uniquing, every cell type, XML-hostile strings."""
    import xml.etree.ElementTree as ET
    import zipfile

    from text_extractor_for_bioeconomic_products_spark.sources.xlsx import (
        column_letter,
        sanitize_sheet_name,
        write_xlsx,
    )

    assert [column_letter(i) for i in (0, 25, 26, 51, 701, 702)] == [
        "A", "Z", "AA", "AZ", "ZZ", "AAA",
    ]
    taken: set = set()
    assert sanitize_sheet_name("bad[name]/with:chars", taken) == "bad_name__with_chars"
    assert sanitize_sheet_name("x" * 40, taken) == "x" * 31
    assert sanitize_sheet_name("x" * 40, taken) == "x" * 29 + "_1"  # unique

    path = str(tmp_path / "edge.xlsx")
    write_xlsx(path, {
        "t[1]": (
            ["s", "i", "f", "b", "none", "lst", "hostile"],
            [["plain", 7, 2.5, True, None, ["a", 1],
              "a<b&c>\"d\x00\x01é"]],
        ),
    })
    ns = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
    with zipfile.ZipFile(path) as z:
        assert z.testzip() is None
        wb = ET.fromstring(z.read("xl/workbook.xml"))
        assert [s.get("name") for s in wb.iter(f"{ns}sheet")] == ["t_1_"]
        sheet = ET.fromstring(z.read("xl/worksheets/sheet1.xml"))
        rows = sheet.findall(f"{ns}sheetData/{ns}row")
        assert len(rows) == 2
        cells = rows[1].findall(f"{ns}c")
        by_ref = {c.get("r"): c for c in cells}
        assert by_ref["A2"].find(f"{ns}is/{ns}t").text == "plain"
        assert by_ref["B2"].find(f"{ns}v").text == "7"
        assert float(by_ref["C2"].find(f"{ns}v").text) == 2.5
        assert by_ref["D2"].get("t") == "b"
        assert "E2" not in by_ref  # None → cell omitted
        assert by_ref["F2"].find(f"{ns}is/{ns}t").text == "a, 1"
        # control chars stripped, markup escaped (parses back cleanly)
        assert by_ref["G2"].find(f"{ns}is/{ns}t").text == 'a<b&c>"dé'


def test_stream_stream_interval_join_matches_batch(spark, sf001_dir, tmp_path):
    """Watermarked stream-stream interval join == batch interval_join on
    the same input: the events fixture is split into 4 files (4
    micro-batches at maxFilesPerTrigger=1) so purchases and touches
    genuinely arrive in different batches and must meet in the join
    state store; the 30-day watermark covers the fixture span so nothing
    is dropped."""
    from pyspark.sql import functions as F

    from text_extractor_for_bioeconomic_products_spark.operators.temporal import (
        interval_join,
    )
    from text_extractor_for_bioeconomic_products_spark.streaming.pipeline import (
        streaming_purchase_followups,
    )

    events = spark.read.parquet(f"{sf001_dir}/events.parquet")
    in_dir = str(tmp_path / "events_in")
    events.repartition(4).write.parquet(in_dir)

    out_dir = str(tmp_path / "out")
    streaming_purchase_followups(spark, in_dir, out_dir)
    streamed = spark.read.parquet(f"{out_dir}/followups_stream")

    purchases = events.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("purchase_ts"),
    )
    batch = interval_join(
        purchases, events, key="user_id", probe_time="purchase_ts",
        build_time="ts", lower_exclusive_s=0, upper_inclusive_s=86400,
        payload_cols=["event_id"],
    )
    got = {(r["purchase_id"], r["event_id"]) for r in streamed.collect()}
    want = {(r["purchase_id"], r["match"]["event_id"]) for r in batch.collect()}
    assert got == want and len(want) > 100


def test_spark_submit_pyfiles_job(spark, transcripts_df, tmp_path):
    """North-rule submission mechanics, evidenced with the REAL path: the
    extraction job runs under ``spark-submit --py-files engine.zip`` with
    the job script COPIED outside the repo tree, cwd outside the repo,
    and PYTHONPATH stripped — so the package is importable ONLY from the
    zip, for the driver and the forked Python workers alike (the cluster
    analog of session.py's local PYTHONPATH export).  A second submission
    into the same output proves the manifest resume contract survives
    full process death: a fresh driver JVM skips every completed bucket."""
    import json
    import shutil
    import subprocess
    import sys

    from text_extractor_for_bioeconomic_products_spark.sources.transcripts import (
        write_transcripts,
    )

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    input_dir = str(tmp_path / "transcripts")
    write_transcripts(transcripts_df, input_dir)
    n_turns_expected = transcripts_df.count()

    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "package_pyfiles", os.path.join(repo, "jobs", "package_pyfiles.py"))
    pkg_mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(pkg_mod)
    zip_path = pkg_mod.build(str(tmp_path / "engine.zip"))

    job_copy = tmp_path / "jobs_copy"
    job_copy.mkdir()
    shutil.copy(os.path.join(repo, "jobs", "run_extraction.py"),
                job_copy / "run_extraction.py")

    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    env.setdefault("PYSPARK_PYTHON", sys.executable)
    out_dir = str(tmp_path / "warehouse")

    def submit(run_id: str) -> dict:
        cmd = [
            "spark-submit", "--master", "local[4]",
            "--py-files", zip_path,
            str(job_copy / "run_extraction.py"),
            "--input", input_dir, "--output", out_dir,
            "--run-id", run_id, "--buckets", "8", "--master", "local[4]",
        ]
        out = subprocess.run(
            cmd, capture_output=True, text=True, env=env,
            cwd=str(tmp_path), timeout=420,
        )
        assert out.returncode == 0, out.stderr[-4000:]
        return json.loads(out.stdout.strip().splitlines()[-1])

    first = submit("sub1")
    # only non-empty buckets are processed (20 convs over 8 hash buckets)
    assert first["buckets_processed"] > 0 and first["buckets_skipped"] == 0
    assert first["n_turns"] == n_turns_expected

    second = submit("sub2")
    assert second["buckets_processed"] == 0
    assert second["buckets_skipped"] == first["buckets_processed"]

    got = spark.read.parquet(f"{out_dir}/turns_extracted")
    assert got.count() == n_turns_expected


def test_streaming_merge_upsert_restart_effectively_once(
    spark, transcripts_df, tmp_path
):
    """Stream → foreachBatch keyed MERGE, crash injected AFTER a merge
    commits but BEFORE its streaming offset commit — the replay window.
    On restart the batch re-applies; the keyed upsert makes that a
    no-op, so the final table equals the batch pipeline exactly and
    holds no duplicate keys."""
    from pyspark.sql import functions as F
    from text_extractor_for_bioeconomic_products_spark.sources.transcripts import (
        write_transcripts,
    )
    from text_extractor_for_bioeconomic_products_spark.streaming.pipeline import (
        run_streaming_merge_upsert,
    )

    in_dir = str(tmp_path / "in")
    turns_dir = str(tmp_path / "turns_merged")
    ckpt = str(tmp_path / "ckpt")
    # several input files → several micro-batches (maxFilesPerTrigger=1);
    # shuffled=False keeps the explicit 4-way repartition (the default
    # global sort lets AQE coalesce back to one file = one batch)
    write_transcripts(transcripts_df.repartition(4), in_dir, shuffled=False)

    total = transcripts_df.count()
    with pytest.raises(Exception) as exc_info:
        run_streaming_merge_upsert(
            spark, in_dir, turns_dir, ckpt, crash_after_batches=2
        )
    assert "InjectedCrash" in str(exc_info.value) or "after batch" in str(
        exc_info.value
    )
    partial = spark.read.parquet(turns_dir).count()
    assert 0 < partial < total, (partial, total)

    # restart with the same checkpoint: replays the uncommitted batch
    # (double-merge) then drains the rest
    stats = run_streaming_merge_upsert(
        spark, in_dir, turns_dir, ckpt, allowed_lateness_sec=60
    )
    assert stats["batches"] >= 1
    # lateness census: round-robin files interleave the whole ts range,
    # so every post-first batch carries rows older than the prior
    # high-water minus 60 s — the telemetry must SEE them (a watermark
    # with that delay would have dropped them; this path drops nothing,
    # as the exact-equality checks below prove)
    assert len(stats["late_by_batch"]) == stats["batches"]
    assert stats["late_by_batch"][0] == 0  # no prior high-water yet
    assert stats["late_rows"] == sum(stats["late_by_batch"])
    if stats["batches"] > 1:
        assert stats["late_rows"] > 0

    got = spark.read.parquet(turns_dir).drop("bucket")
    batch = extract_turns(transcripts_df).drop("spans")
    assert got.count() == total
    assert (
        got.groupBy("conv_id", "turn_idx").count().filter("count > 1").count()
        == 0
    )
    # full content equality, both directions
    cols = [c for c in batch.columns]
    assert got.select(cols).exceptAll(batch.select(cols)).count() == 0
    assert batch.select(cols).exceptAll(got.select(cols)).count() == 0


def test_streaming_dedup_admission_replay_idempotent(
    spark, transcripts_df, tmp_path
):
    """Content-hash corpus admission over micro-batches: the admitted
    table holds exactly one row per distinct normalized content hash —
    across batches AND across a crash-replay (append committed, offset
    not; the replayed batch's anti-join rejects what the dead attempt
    already admitted)."""
    from pyspark.sql import functions as F
    from text_extractor_for_bioeconomic_products_spark.sources.transcripts import (
        write_transcripts,
    )
    from text_extractor_for_bioeconomic_products_spark.streaming.pipeline import (
        run_streaming_dedup_admission,
    )

    in_dir = str(tmp_path / "in")
    admitted = str(tmp_path / "corpus_admitted")
    ckpt = str(tmp_path / "ckpt")
    # 4 files → 4 micro-batches; template-generated turns repeat content
    # across conversations, so cross-batch duplicates are guaranteed
    write_transcripts(transcripts_df.repartition(4), in_dir, shuffled=False)

    norm = F.md5(F.lower(F.trim(F.regexp_replace("text", r"\s+", " "))))
    n_total = transcripts_df.count()
    n_distinct = transcripts_df.select(norm.alias("h")).distinct().count()
    assert n_distinct < n_total  # the fixture must actually contain dups

    with pytest.raises(Exception) as exc_info:
        run_streaming_dedup_admission(
            spark, in_dir, admitted, ckpt, crash_after_batches=2
        )
    assert "InjectedCrash" in str(exc_info.value) or "after batch" in str(
        exc_info.value
    )
    partial = spark.read.parquet(admitted).count()
    assert 0 < partial <= n_distinct

    # restart with the same checkpoint: the crashed batch REPLAYS (its
    # append committed, its offset did not) then the rest drains
    stats = run_streaming_dedup_admission(spark, in_dir, admitted, ckpt)
    assert stats["batches"] >= 1

    got = spark.read.parquet(admitted)
    # one row per distinct content hash — the replayed batch added none
    # of its already-admitted rows back
    assert got.count() == n_distinct
    assert (
        got.groupBy("content_hash").count().filter("count > 1").count() == 0
    )
    # batch-twin equality: the admitted HASH SET is exactly the corpus's
    # distinct hash set (which representative won is arrival-order
    # dependent across batches, so equality is on hashes, not rows)
    stream_h = got.select("content_hash")
    batch_h = transcripts_df.select(norm.alias("content_hash")).distinct()
    assert stream_h.exceptAll(batch_h).count() == 0
    assert batch_h.exceptAll(stream_h).count() == 0
    # within any one batch the kept representative IS deterministic:
    # every admitted row must be the (conv_id, turn_idx)-minimal holder
    # of its hash within that row's own source... cheapest global check:
    # no admitted row's text normalizes to a hash it doesn't carry
    recomputed = got.withColumn("h2", norm).filter(
        F.col("h2") != F.col("content_hash")
    )
    assert recomputed.count() == 0


def test_centroid_similarity_planted_geometry(spark):
    """Label-centroid cosine census on hand-built geometry: centroids
    along orthogonal axes read 0.0, an identical-direction pair reads
    1.0, and an opposed pair reads -1.0; per-label counts survive."""
    from text_extractor_for_bioeconomic_products_spark.operators.clustering import (
        centroid_similarity_census,
    )

    def vec(axis, scale, dim=4):
        v = [0.0] * dim
        v[axis] = scale
        return v

    rows = (
        # label 0: x-axis (2 vectors, mean direction +x)
        [(0, vec(0, 1.0)), (0, vec(0, 3.0))]
        # label 1: y-axis — orthogonal to 0
        + [(1, vec(1, 2.0)), (1, vec(1, 4.0))]
        # label 2: also +x — parallel to 0
        + [(2, vec(0, 5.0))]
        # label 3: -x — opposed to 0
        + [(3, vec(0, -2.0)), (3, vec(0, -6.0))]
    )
    emb = spark.createDataFrame(
        [(i, l, v) for i, (l, v) in enumerate(rows)],
        "vec_id long, label int, embedding array<float>",
    ).select("label", "embedding")
    got = {
        (r["label_a"], r["label_b"]): (r["cos_sim"], r["n_a"], r["n_b"])
        for r in centroid_similarity_census(emb, dim=4).collect()
    }
    assert len(got) == 6  # C(4,2)
    assert got[(0, 1)][0] == 0.0
    assert got[(0, 2)][0] == 1.0
    assert got[(0, 3)][0] == -1.0
    assert got[(1, 2)][0] == 0.0
    assert got[(2, 3)][0] == -1.0
    assert got[(0, 1)][1:] == (2, 2)
    assert got[(0, 2)][2] == 1


def test_bloom_membership_forced_false_positives(spark):
    """Bloom census semantics under a deliberately tiny cell space
    (hex_chars=1 ⇒ 16 cells): every count — members, might-contains,
    false positives, cells set — equals a pure-hashlib recomputation of
    the identical md5 construction, and a true member can never be a
    false negative (positions are deterministic)."""
    import hashlib
    import re

    from pyspark.sql import functions as F
    from text_extractor_for_bioeconomic_products_spark.operators.dedup import (
        bloom_membership_census,
    )

    corpus_texts = [f"corpus doc number {i} with some words" for i in range(8)]
    probes = [f"probe text variant {j} entirely different" for j in range(30)]
    batch_texts = [corpus_texts[0]] + probes  # one true member + probes

    def h(t):
        return hashlib.md5(
            re.sub(r"\s+", " ", t).strip().lower().encode()
        ).hexdigest()

    def cells_of(t, k=3, hexc=1):
        return [
            hashlib.md5(f"bloom{i}:{h(t)}".encode()).hexdigest()[:hexc]
            for i in range(k)
        ]

    cellset = {c for t in corpus_texts for c in cells_of(t)}
    corpus_hs = {h(t) for t in corpus_texts}
    exp_exact = sum(h(t) in corpus_hs for t in batch_texts)
    exp_might = sum(
        all(c in cellset for c in cells_of(t)) for t in batch_texts
    )
    exp_fp = sum(
        all(c in cellset for c in cells_of(t)) and h(t) not in corpus_hs
        for t in batch_texts
    )
    assert exp_fp > 0  # the fixture must actually force collisions

    corpus = spark.createDataFrame(
        [(i, t) for i, t in enumerate(corpus_texts)], "doc_id long, text string"
    )
    batch = spark.createDataFrame(
        [(100 + i, t) for i, t in enumerate(batch_texts)],
        "doc_id long, text string",
    )
    row = bloom_membership_census(corpus, batch, hex_chars=1).collect()[0]
    assert row["n_batch"] == len(batch_texts)
    assert row["n_exact_members"] == exp_exact == 1
    assert row["n_might_contain"] == exp_might
    assert row["n_false_positives"] == exp_fp
    assert row["cells_set"] == len(cellset)
    assert row["fp_rate"] == round(
        exp_fp / (len(batch_texts) - exp_exact), 4
    )
    assert row["load_factor"] == round(len(cellset) / 16, 4)
    # no false negatives, ever: a member's cells are set by construction
    assert row["n_might_contain"] >= row["n_exact_members"]
    # default cell space on an empty-overlap pair: zero members and a
    # fp_expected consistent with the measured load
    clean = bloom_membership_census(corpus, batch).collect()[0]
    assert clean["n_exact_members"] == 1
    assert clean["load_factor"] < 0.001


def test_streaming_near_dup_admission(spark, tmp_path):
    """NEAR-dup admission: within one micro-batch a near cluster (exact
    copy + one-word variant) collapses to its (conv_id, turn_idx)-min;
    across batches a later variant is rejected against the standing band
    index; crash-replay admits nothing twice.  Fixture texts are chosen
    so the planted variants share LSH bands deterministically (md5 is
    fixed) and the premise is asserted before the semantics."""
    import datetime

    from pyspark.sql import functions as F
    from text_extractor_for_bioeconomic_products_spark.operators.dedup import (
        minhash_signatures,
    )
    from text_extractor_for_bioeconomic_products_spark.streaming.pipeline import (
        run_streaming_near_dup_admission,
    )

    A = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    A_near = A + " lambda"     # same-batch near variant of A
    A2 = A + " sigma"          # later-batch near variant of A
    C = "one two three four five six seven eight nine ten"
    D = "red orange yellow green blue indigo violet pink brown black"
    ts = datetime.datetime(2026, 1, 1)

    def tdf(rows):
        return spark.createDataFrame(
            [(c, i, "user", t, None, ts) for c, i, t in rows],
            "conv_id string, turn_idx int, role string, text string, "
            "tool string, ts timestamp",
        )

    # premise: the variants collide on >=1 band; the unique docs don't
    def band_set(text):
        one = tdf([("x", 0, text)])
        sig = minhash_signatures(one, id_col="conv_id").collect()[0]
        return {
            f"{b}:{sig[f'sig_{2 * b}'][:8]}|{sig[f'sig_{2 * b + 1}'][:8]}"
            for b in range(2)
        }

    assert band_set(A) & band_set(A_near)
    assert band_set(A) & band_set(A2)
    assert not (band_set(A) & band_set(C))
    assert not (band_set(C) & band_set(D))

    in_dir = tmp_path / "in"
    in_dir.mkdir()
    admitted = str(tmp_path / "corpus_near")
    ckpt = str(tmp_path / "ckpt")

    # file-per-batch (maxFilesPerTrigger=1): each mini-DF becomes one
    # part file placed directly in the stream dir
    def add_batch(name, rows):
        import shutil

        scratch = tmp_path / f"scratch_{name}"
        tdf(rows).coalesce(1).write.parquet(str(scratch))
        part = next(scratch.glob("part-*.parquet"))
        shutil.move(str(part), str(in_dir / f"{name}.parquet"))

    # batch 1 carries the within-batch cluster {A, A_exact, A_near} +
    # unique C; batch 2 the cross-batch variant A2 + unique D
    add_batch("b1", [("c1", 0, A), ("c1", 1, A), ("c2", 0, A_near), ("c3", 0, C)])
    add_batch("b2", [("c4", 0, A2), ("c5", 0, D)])

    with pytest.raises(Exception) as exc_info:
        run_streaming_near_dup_admission(
            spark, str(in_dir), admitted, ckpt, crash_after_batches=1
        )
    assert "InjectedCrash" in str(exc_info.value) or "after batch" in str(
        exc_info.value
    )
    # restart: the crashed batch replays (append committed, offset not)
    stats = run_streaming_near_dup_admission(spark, str(in_dir), admitted, ckpt)
    assert stats["batches"] >= 1

    got = spark.read.parquet(admitted)
    texts = {r["text"] for r in got.collect()}
    # exactly one member of the A-family survives, plus the two uniques —
    # regardless of which file the source scheduled first
    assert len(texts & {A, A_near, A2}) == 1
    assert C in texts and D in texts
    assert got.count() == 3
    # within the batch that held the cluster, the survivor is the
    # (conv_id, turn_idx) minimum of ITS batch's members
    if A in texts or A_near in texts:
        surv = got.filter(F.col("text").isin([A, A_near])).collect()[0]
        assert (surv["conv_id"], surv["turn_idx"]) == ("c1", 0)
    # admitted rows carry their bands (the standing index column)
    assert "bands" in got.columns
    assert got.filter(F.size("bands") != 2).count() == 0


def test_fuzzy_dedup_apply_drops_non_canonical(spark, tmp_path):
    """Census → action: in a planted near-dup pair only the higher
    doc_id drops; the unique doc and the canonical survive."""
    import pandas as pd

    from text_extractor_for_bioeconomic_products_spark.operators.dedup import (
        q_fuzzy_dedup_apply,
    )

    dup = "the quick brown fox jumps over the lazy dog again and again"
    rows = pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": [dup, dup, "completely different words entirely unrelated content here"],
        "lang": ["en"] * 3,
        "source": ["s0", "s0", "s1"],
        "n_chars": [len(dup), len(dup), 59],
    })
    rows.to_parquet(str(tmp_path / "documents.parquet"))
    got = {
        r["source"]: (r["n_docs"], r["n_dropped"], r["n_kept"])
        for r in q_fuzzy_dedup_apply(spark, str(tmp_path)).collect()
    }
    assert got == {"s0": (2, 1, 1), "s1": (1, 0, 1)}, got


def test_pca_matches_numpy_oracle(spark, sf001_dir):
    """The distributed moment pipeline + driver eigh must equal plain
    numpy PCA on the collected corpus: eigenvalues, trace, and the
    projection (up to per-component sign, which eigh leaves free)."""
    import numpy as np

    from text_extractor_for_bioeconomic_products_spark.operators.clustering import (
        PCA_K,
        pca_fit,
        pca_project,
    )

    emb = spark.read.parquet(os.path.join(sf001_dir, "embeddings.parquet"))
    fit = pca_fit(emb)
    rows = emb.select("vec_id", "embedding").collect()
    m = np.array([r["embedding"] for r in rows], dtype=np.float64)
    cov = np.cov(m, rowvar=False, bias=True)
    ref_vals = np.sort(np.linalg.eigvalsh(cov))[::-1]
    assert fit["n"] == len(rows)
    assert abs(fit["trace"] - float(np.trace(cov))) < 1e-8 * fit["trace"]
    np.testing.assert_allclose(
        fit["eigvals"][:PCA_K], ref_vals[:PCA_K], rtol=1e-8, atol=1e-12
    )
    # projection: centered @ components.T, sign-free per component
    got = {r["vec_id"]: np.array(r["pc"]) for r in pca_project(emb, fit).collect()}
    centered = m - m.mean(axis=0)
    ref = centered @ fit["components"].T
    ids = [r["vec_id"] for r in rows]
    got_m = np.stack([got[i] for i in ids])
    np.testing.assert_allclose(got_m, ref, rtol=1e-8, atol=1e-10)
    # variance captured along PC1 equals the top eigenvalue
    assert abs(got_m[:, 0].var() - fit["eigvals"][0]) < 1e-6 * fit["eigvals"][0]


def test_run_curation_end_to_end(spark, sf001_dir, tmp_path):
    """The composed job: every input row is accounted to exactly one
    fate (quality-dropped, dedup-dropped, or written to one split), the
    written splits are disjoint and deterministic, and re-running
    yields the identical assignment."""
    import glob
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "jobs"))
    from run_curation import run_curation

    out = str(tmp_path / "curated")
    lineage = run_curation(spark, sf001_dir, out)
    assert lineage["n_in"] > 0
    assert (
        lineage["dropped_quality"] + lineage["dropped_dedup"]
        + lineage["n_written"] == lineage["n_in"]
    )
    ids = {}
    for split in ("train", "val", "test"):
        files = glob.glob(os.path.join(out, split, "*.parquet"))
        assert files, split
        ids[split] = {
            r["doc_id"]
            for r in spark.read.parquet(os.path.join(out, split)).collect()
        }
        assert len(ids[split]) == lineage["splits"][split]["n_rows"]
    assert not (ids["train"] & ids["val"]) and not (ids["train"] & ids["test"])
    # determinism: a second run lands every doc in the same split
    out2 = str(tmp_path / "curated2")
    lineage2 = run_curation(spark, sf001_dir, out2)
    assert lineage2["splits"]["train"]["n_rows"] == lineage["splits"]["train"]["n_rows"]
    ids2_val = {
        r["doc_id"]
        for r in spark.read.parquet(os.path.join(out2, "val")).collect()
    }
    assert ids2_val == ids["val"]


def test_pq_codes_shape_and_adc_sanity(spark, sf001_dir):
    """PQ encoding: every vector gets M in-range codes, the code table
    is deterministic across repartitionings, and the ADC ledger reports
    recall in [0,1] with the exact side always k rows."""
    from text_extractor_for_bioeconomic_products_spark.operators.clustering import (
        PQ_CODEBOOK_K,
        PQ_SUB,
        pq_encode,
        pq_fit,
        q_ann_pq_recall,
    )

    emb = spark.read.parquet(os.path.join(sf001_dir, "embeddings.parquet"))
    books = pq_fit(emb)
    assert len(books) == PQ_SUB
    codes = pq_encode(emb, books).collect()
    assert len(codes) == emb.count()
    for r in codes:
        for m in range(PQ_SUB):
            assert 0 <= r[f"code_{m}"] < PQ_CODEBOOK_K
    codes2 = pq_encode(emb.repartition(7), books).collect()
    assert sorted(map(tuple, codes)) == sorted(map(tuple, codes2))
    ledger = q_ann_pq_recall(spark, sf001_dir).collect()
    assert ledger and all(r["n_exact"] == 10 for r in ledger)
    assert all(0.0 <= r["recall_at_k"] <= 1.0 for r in ledger)


def test_avi_codec_roundtrip():
    """The stdlib AVI container is real: encode → decode returns exact
    frame count, dims, fps, and per-frame means of the real pixels
    (odd-size frames exercise RIFF even-padding); malformed payloads
    raise instead of returning garbage."""
    import numpy as np
    import pytest as _pytest

    from text_extractor_for_bioeconomic_products_spark.operators.multimodal import (
        decode_avi,
        encode_avi,
    )

    for w, h, n in [(3, 3, 2), (5, 4, 3), (7, 7, 1)]:  # 27/60/147 bytes — odd sizes pad
        frames = [
            bytes(((i * 31 + f * 7) % 256) for i in range(w * h * 3))
            for f in range(n)
        ]
        payload = encode_avi(w, h, frames, fps=12)
        rw, rh, rn, fps, mean_level, frame_means, codec = decode_avi(payload)
        assert (rw, rh, rn, fps, codec) == (w, h, n, 12, "rawvideo")
        for f, fm in zip(frames, frame_means):
            assert fm == round(float(np.frombuffer(f, np.uint8).mean()), 4)
        assert mean_level == round(float(np.mean(frame_means)), 4)
    with _pytest.raises(ValueError):
        decode_avi(b"RIFF\x10\x00\x00\x00AVI " + b"\x00" * 16)


def test_avi_mjpeg_roundtrip():
    """Motion-JPEG in AVI: '00dc' frames are complete baseline JPEGs
    decoded by the repo's own JPEG codec; dimensions validate against
    the avih header and per-frame means come from the DECODED pixels
    (lossy: close to, not equal to, the raw means).  Mixed raw+mjpeg
    streams are rejected."""
    import struct

    import numpy as np
    import pytest as _pytest

    from text_extractor_for_bioeconomic_products_spark.operators.multimodal import (
        decode_avi,
        decode_media,
        encode_avi,
    )

    w, h, n = 16, 8, 3
    frames = [
        bytes(((i * 31 + f * 7) % 256) for i in range(w * h * 3))
        for f in range(n)
    ]
    payload = encode_avi(w, h, frames, fps=12, codec="mjpeg")
    rw, rh, rn, fps, mean_level, frame_means, codec = decode_avi(payload)
    assert (rw, rh, rn, fps, codec) == (w, h, n, 12, "mjpeg")
    assert len(frame_means) == n
    for f, fm in zip(frames, frame_means):
        raw_mean = float(np.frombuffer(f, np.uint8).mean())
        assert abs(fm - raw_mean) < 16.0  # lossy but in the neighborhood
    assert decode_media(payload)[0] == "mjpeg_avi"

    # mixed-stream refusal: splice a raw 00db chunk into the mjpeg movi
    raw_chunk = b"00db" + struct.pack("<I", w * h * 3) + frames[0]
    movi_at = payload.index(b"movi")
    # extend the movi LIST and RIFF sizes to cover the spliced chunk
    list_at = payload.rindex(b"LIST", 0, movi_at)
    list_size = struct.unpack("<I", payload[list_at + 4:list_at + 8])[0]
    riff_size = struct.unpack("<I", payload[4:8])[0]
    mixed = (
        payload[:4]
        + struct.pack("<I", riff_size + len(raw_chunk))
        + payload[8:list_at + 4]
        + struct.pack("<I", list_size + len(raw_chunk))
        + payload[list_at + 8:movi_at + 4]
        + raw_chunk
        + payload[movi_at + 4:]
    )
    # header frame count now disagrees too — either guard may fire first
    with _pytest.raises(ValueError):
        decode_avi(mixed)


def test_mp4_mjpeg_roundtrip_and_probe():
    """ISO BMFF: encode_mp4 writes a spec-shaped ftyp+mdat+moov tree
    whose samples are baseline JPEGs; decode_mp4 walks the real box
    tree (stsd/stts/stsc/stsz/stco), slices samples out of mdat, and
    the per-frame means equal decoding the same JPEGs directly.
    probe_mp4 reads container metadata out of ANY codec (avc1 too);
    only the non-JPEG entropy decode refuses — the honest boundary."""
    import pytest as _pytest

    from text_extractor_for_bioeconomic_products_spark.operators.multimodal import (
        decode_jpeg,
        decode_media,
        decode_mp4,
        encode_jpeg,
        encode_mp4,
        probe_mp4,
    )

    w, h, n = 16, 8, 4
    frames = [
        bytes(((i * 31 + f * 7) % 256) for i in range(w * h * 3))
        for f in range(n)
    ]
    payload = encode_mp4(w, h, frames, fps=12)
    meta = probe_mp4(payload)
    assert (meta["codec"], meta["width"], meta["height"],
            meta["n_samples"], meta["fps"]) == ("jpeg", w, h, n, 12)
    rw, rh, rn, fps, mean_level, frame_means, codec = decode_mp4(payload)
    assert (rw, rh, rn, fps, codec) == (w, h, n, 12, "mjpeg")
    # sample slicing is exact: means equal the direct JPEG decode of
    # the same frames (byte-identical samples, not merely similar)
    direct = [decode_jpeg(encode_jpeg(w, h, f))[2] for f in frames]
    assert frame_means == direct
    assert decode_media(payload) == ("mjpeg_mp4", w, h, mean_level)

    # avc1: container parses (probe), pixel decode refuses — patch the
    # stsd sample-entry fourcc (last 'jpeg' occurrence, inside moov)
    at = payload.rindex(b"jpeg")
    avc = payload[:at] + b"avc1" + payload[at + 4:]
    m2 = probe_mp4(avc)
    assert (m2["codec"], m2["width"], m2["n_samples"]) == ("avc1", w, n)
    with _pytest.raises(NotImplementedError):
        decode_mp4(avc)

    # real walk: truncation and a sample-count lie both raise
    with _pytest.raises(ValueError):
        probe_mp4(payload[: len(payload) // 2])
    at = payload.rindex(b"stsz")
    lied = (payload[:at + 12]
            + (n + 1).to_bytes(4, "big") + payload[at + 16:])
    with _pytest.raises(ValueError):
        probe_mp4(lied)


def test_versioned_table_time_travel_and_rollback(spark, transcripts_df, tmp_path):
    """The Iceberg metadata-layer analog: immutable files + versioned
    manifests give time travel (read any snapshot), metadata-only
    rollback, keyed-merge semantics per commit, and CAS conflict
    refusal."""
    from pyspark.sql import functions as F

    from text_extractor_for_bioeconomic_products_spark.plans.versioned import (
        CommitConflict,
        commit_merge,
        read_version,
        rollback,
    )

    table = str(tmp_path / "vtable")
    turns = extract_turns(transcripts_df).drop("spans").cache()
    first = turns.filter("turn_idx < 2")
    r1 = commit_merge(spark, table, first, run_id="r1")
    assert r1["version"] == 1
    v1_count = read_version(spark, table).count()
    assert v1_count == first.count()

    # second commit: updates (overlapping keys) + inserts
    second = turns.filter("turn_idx < 4").withColumn(
        "n_tokens", F.col("n_tokens") + 1000
    )
    r2 = commit_merge(spark, table, second, run_id="r2")
    assert r2["version"] == 2
    v2 = read_version(spark, table)
    assert v2.count() == turns.filter("turn_idx < 4").count()
    # keyed merge: overlapping keys took the new values
    assert v2.filter("turn_idx < 2").filter("n_tokens < 1000").count() == 0
    assert (
        v2.groupBy("conv_id", "turn_idx").count().filter("count > 1").count()
        == 0
    )
    # time travel: v1 still reads exactly as committed
    assert read_version(spark, table, version=1).count() == v1_count
    assert (
        read_version(spark, table, version=1)
        .filter("n_tokens >= 1000").count() == 0
    )

    # rollback is metadata-only and reversible
    rollback(table, 1)
    assert read_version(spark, table).count() == v1_count
    rollback(table, 2)
    assert read_version(spark, table).count() == v2.count()

    # CAS: a writer whose base moved must refuse
    import text_extractor_for_bioeconomic_products_spark.plans.versioned as V

    real_current = V._current_version
    _calls = {"n": 0}

    def stale_current(d):
        # first read (the writer's base) is stale v1; the CAS-time read
        # sees the true pointer (v2) — i.e. someone committed under us.
        # (A CONSISTENT v1 reading is now a legitimate rollback state:
        # versions are allocated above the historical max, so such a
        # writer correctly lands a new branch instead of colliding.)
        _calls["n"] += 1
        return 1 if _calls["n"] == 1 else real_current(d)

    V._current_version = stale_current
    try:
        with pytest.raises((CommitConflict, Exception)) as ei:
            commit_merge(spark, table, first, run_id="r3")
    finally:
        V._current_version = real_current
    # either the pointer check or the manifest hard-link check fired
    assert "Conflict" in type(ei.value).__name__ or "published" in str(ei.value) or "base was" in str(ei.value)


def test_versioned_table_history_and_immutability(spark, transcripts_df, tmp_path):
    """Five commits: every historical version stays readable with its
    exact row count, and the files backing version 1 are byte-identical
    after four later commits (immutability — the property snapshot
    isolation rests on)."""
    import glob
    import hashlib

    from text_extractor_for_bioeconomic_products_spark.plans.versioned import (
        commit_merge,
        read_version,
    )

    table = str(tmp_path / "vt")
    turns = extract_turns(transcripts_df).drop("spans").cache()
    counts = {}
    for v in range(1, 6):
        batch = turns.filter(f"turn_idx < {v}")
        r = commit_merge(spark, table, batch, run_id=f"r{v}")
        assert r["version"] == v
        counts[v] = read_version(spark, table).count()
        assert counts[v] == batch.count()
        if v == 1:
            v1_files = sorted(glob.glob(f"{table}/data/part-r1-*/*.parquet"))
            v1_hashes = [
                hashlib.sha256(open(f, "rb").read()).hexdigest()
                for f in v1_files
            ]
    # history: every version still reads its own snapshot
    for v in range(1, 6):
        assert read_version(spark, table, version=v).count() == counts[v]
    # immutability: v1's physical files never changed
    now = [
        hashlib.sha256(open(f, "rb").read()).hexdigest()
        for f in sorted(glob.glob(f"{table}/data/part-r1-*/*.parquet"))
    ]
    assert now == v1_hashes and v1_files


def test_versioned_table_rollback_then_commit(spark, transcripts_df, tmp_path):
    """The r3-ADVICE failure mode: after rollback() the next commit must
    NOT collide with the abandoned branch's manifest.  Versions are
    allocated above the historical max (Iceberg-monotonic), parent
    records the rolled-back base, and the table stays writable."""
    from text_extractor_for_bioeconomic_products_spark.plans.versioned import (
        commit_merge,
        read_version,
        rollback,
    )

    table = str(tmp_path / "vt_rb")
    turns = extract_turns(transcripts_df).drop("spans").cache()
    commit_merge(spark, table, turns.filter("turn_idx < 1"), run_id="a")
    commit_merge(spark, table, turns.filter("turn_idx < 3"), run_id="b")
    rb = rollback(table, 1)
    # rollback is itself a FORWARD metadata-only commit (v3 carrying
    # v1's files by reference) — versions never regress, so the r3
    # failure mode (post-rollback commit colliding with the abandoned
    # branch's manifest) is unrepresentable
    assert rb == 3
    r = commit_merge(spark, table, turns.filter("turn_idx = 4"), run_id="c")
    assert r["version"] == 4 and r["parent"] == 3
    got = read_version(spark, table)
    assert got.count() == (
        turns.filter("turn_idx < 1").count() + turns.filter("turn_idx = 4").count()
    )
    # the abandoned branch is still time-travel readable
    assert read_version(spark, table, version=2).count() == turns.filter(
        "turn_idx < 3"
    ).count()


def test_versioned_table_concurrent_committers_rebase(
    spark, transcripts_df, tmp_path
):
    """Two interleaved committers with DISJOINT key sets: the loser
    rebases and both land (Iceberg's commit-retry); with OVERLAPPING
    keys the loser raises CommitConflict even with retries — a genuine
    write-write race is never silently merged."""
    import text_extractor_for_bioeconomic_products_spark.plans.versioned as V
    from text_extractor_for_bioeconomic_products_spark.plans.versioned import (
        CommitConflict,
        commit_merge,
        read_version,
    )

    table = str(tmp_path / "vt_cc")
    turns = extract_turns(transcripts_df).drop("spans").cache()
    base_rows = turns.filter("turn_idx < 1")
    commit_merge(spark, table, base_rows, run_id="base")

    # interleave: A reads base=1, then B commits v2 under it.  Simulate
    # A's stale read by monkeypatching the FIRST _current_version call.
    a_rows = turns.filter("turn_idx = 2")
    b_rows = turns.filter("turn_idx = 3")
    commit_b = commit_merge(spark, table, b_rows, run_id="B")
    assert commit_b["version"] == 2

    real_current = V._current_version
    calls = {"n": 0}

    def stale_once(d):
        calls["n"] += 1
        return 1 if calls["n"] == 1 else real_current(d)

    V._current_version = stale_once
    try:
        r = commit_merge(spark, table, a_rows, run_id="A", retries=2)
    finally:
        V._current_version = real_current
    assert r["version"] == 3 and r["rebases"] == 1 and r["parent"] == 2
    got = read_version(spark, table)
    assert got.count() == base_rows.count() + a_rows.count() + b_rows.count()

    # overlapping keys: same interleave shape, but the concurrent commit
    # (B2, landing v4) writes exactly the keys A2 wants to write — the
    # rebase validation must refuse no matter how many retries remain
    import pytest as _pytest

    commit_merge(spark, table, turns.filter("turn_idx = 3"), run_id="B2")

    def stale_at_3_once(d):
        calls["n"] += 1
        return 3 if calls["n"] == 1 else real_current(d)

    calls["n"] = 0
    V._current_version = stale_at_3_once
    try:
        with _pytest.raises(CommitConflict, match="overlapping keys"):
            commit_merge(
                spark, table, turns.filter("turn_idx = 3"), run_id="A2",
                retries=5,
            )
    finally:
        V._current_version = real_current


def test_versioned_table_loser_cleanup_and_vacuum(
    spark, transcripts_df, tmp_path
):
    """A terminally-conflicted writer deletes every data file it wrote
    (no orphans), and vacuum() removes crash debris without touching any
    manifest-referenced file — including rolled-back branches."""
    import glob
    import os

    import pytest as _pytest

    import text_extractor_for_bioeconomic_products_spark.plans.versioned as V
    from text_extractor_for_bioeconomic_products_spark.plans.versioned import (
        CommitConflict,
        commit_merge,
        read_version,
        vacuum,
    )

    table = str(tmp_path / "vt_vac")
    turns = extract_turns(transcripts_df).drop("spans").cache()
    commit_merge(spark, table, turns.filter("turn_idx < 2"), run_id="a")
    before = set(glob.glob(f"{table}/data/*"))

    real_current = V._current_version
    calls = {"n": 0}

    def stale_base_once(d):  # stale base read; retries=0 -> terminal
        calls["n"] += 1
        return 0 if calls["n"] == 1 else real_current(d)

    V._current_version = stale_base_once
    try:
        with _pytest.raises(CommitConflict):
            commit_merge(spark, table, turns.filter("turn_idx = 3"), run_id="x")
    finally:
        V._current_version = real_current
    # loser cleaned up after itself
    assert set(glob.glob(f"{table}/data/*")) == before

    # crash debris: a data dir no manifest references + a stranded
    # manifest temp (crashed mid-_publish)
    orphan = os.path.join(table, "data", "part-crashed-deadbeef-0.parquet")
    os.makedirs(orphan)
    open(os.path.join(orphan, "junk"), "w").write("x")
    tmp_manifest = os.path.join(table, "meta", "v99.json.tmp.deadbeef")
    open(tmp_manifest, "w").write("{}")
    # default grace window: a FRESH unreferenced file is treated as a
    # possibly-in-flight writer's and NOT swept (sweeping it would
    # corrupt a commit that links right after)
    rep = vacuum(table)
    assert rep["orphans_removed"] == 0 and os.path.exists(orphan)
    # past the grace window both debris kinds go
    rep = vacuum(table, min_age_sec=0)
    assert rep["orphans_removed"] == 2
    assert not os.path.exists(orphan) and not os.path.exists(tmp_manifest)
    assert set(glob.glob(f"{table}/data/*")) == before
    assert read_version(spark, table).count() == turns.filter("turn_idx < 2").count()


def test_versioned_vacuum_cwd_independent(spark, transcripts_df, tmp_path):
    """Manifests store table_dir-RELATIVE paths, so vacuum computes the
    same live-file set from any cwd (the r4 ADVICE medium: manifests
    stored paths as written, and realpath resolved relative spellings
    against the CALLER's cwd — vacuuming from a different cwd missed
    every live file and swept them after the grace)."""
    import json as _json
    import os

    from text_extractor_for_bioeconomic_products_spark.plans.versioned import (
        commit_merge,
        read_version,
        vacuum,
    )

    table = str(tmp_path / "vt_cwd")
    turns = extract_turns(transcripts_df).drop("spans")
    commit_merge(spark, table, turns.filter("turn_idx < 2"), run_id="a")
    commit_merge(spark, table, turns.filter("turn_idx = 2"), run_id="b")
    n = read_version(spark, table).count()

    # every manifest path is relative to the table root
    for f in os.listdir(os.path.join(table, "meta")):
        man = _json.load(open(os.path.join(table, "meta", f)))
        paths = [p for fs in man["buckets"].values() for p in fs]
        paths += man["key_files"] + man["new_files"]
        assert paths and not any(os.path.isabs(p) for p in paths)

    # vacuum with zero grace from a DIFFERENT cwd: nothing live is swept
    old_cwd = os.getcwd()
    os.chdir("/")
    try:
        rep = vacuum(table, min_age_sec=0)
    finally:
        os.chdir(old_cwd)
    assert rep["orphans_removed"] == 0
    assert read_version(spark, table).count() == n


def test_versioned_legacy_manifest_conflict_fallback(
    spark, transcripts_df, tmp_path
):
    """Rebase conflict-validation never silently skips a commit: for a
    pre-key_files manifest (neither key_files nor new_files — the
    round-3 format) the validator falls back to the bucket files that
    commit introduced (diff vs its parent), so a rebasing writer still
    sees the legacy commit's keys.  Conservative: survivor rows in
    those files count as conflicts."""
    import json as _json
    import os

    import pytest as _pytest

    import text_extractor_for_bioeconomic_products_spark.plans.versioned as V
    from text_extractor_for_bioeconomic_products_spark.plans.versioned import (
        CommitConflict,
        commit_merge,
    )

    table = str(tmp_path / "vt_legacy")
    turns = extract_turns(transcripts_df).drop("spans").cache()
    commit_merge(spark, table, turns.filter("turn_idx < 2"), run_id="a")
    # strip v1 down to the legacy (round-3) manifest shape
    mpath = os.path.join(table, "meta", "v1.json")
    man = _json.load(open(mpath))
    del man["key_files"], man["new_files"]
    os.unlink(mpath)  # _publish hard-links; rewrite in place
    _json.dump(man, open(mpath, "w"))
    assert V._upserted_key_files_between(table, 0, 1)  # diff vs v0 = all

    # a stale-base writer whose keys OVERLAP the legacy commit must
    # raise CommitConflict even with retries available
    real_current, calls = V._current_version, {"n": 0}

    def stale_once(d):
        calls["n"] += 1
        return 0 if calls["n"] == 1 else real_current(d)

    V._current_version = stale_once
    try:
        with _pytest.raises(CommitConflict, match="overlapping keys"):
            commit_merge(
                spark, table, turns.filter("turn_idx < 1"),
                run_id="x", retries=2,
            )
    finally:
        V._current_version = real_current

    # disjoint keys still rebase fine across the legacy manifest
    calls["n"] = 0
    V._current_version = stale_once
    try:
        res = commit_merge(
            spark, table, turns.filter("turn_idx = 3"),
            run_id="y", retries=2,
        )
    finally:
        V._current_version = real_current
    assert res["version"] == 2 and res["rebases"] == 1


def test_versioned_vacuum_during_inflight_commit(
    spark, transcripts_df, tmp_path
):
    """Vacuum racing a slow commit: the writer's data files exist but
    its manifest is not yet linked when vacuum runs.  Under the default
    grace window the fresh unreferenced files survive and the in-flight
    writer still lands; its snapshot reads back complete."""
    import text_extractor_for_bioeconomic_products_spark.plans.versioned as V
    from text_extractor_for_bioeconomic_products_spark.plans.versioned import (
        commit_merge,
        read_version,
        vacuum,
    )

    table = str(tmp_path / "vt_race")
    turns = extract_turns(transcripts_df).drop("spans").cache()
    commit_merge(spark, table, turns.filter("turn_idx < 2"), run_id="a")

    real_publish, swept = V._publish, {}

    def vacuum_then_publish(table_dir, version, doc):
        # the race: a retention sweep fires between the writer's data
        # write and its commit link
        swept.update(vacuum(table_dir))
        return real_publish(table_dir, version, doc)

    V._publish = vacuum_then_publish
    try:
        res = commit_merge(spark, table, turns.filter("turn_idx = 3"), run_id="b")
    finally:
        V._publish = real_publish
    assert swept["orphans_removed"] == 0  # grace protected the in-flight files
    assert res["version"] == 2
    expect = turns.filter("turn_idx < 2").count() + turns.filter("turn_idx = 3").count()
    assert read_version(spark, table).count() == expect


def test_versioned_history_query(spark, sf001_dir):
    """The driver-gate query: deterministic census of 3 commits + 1
    rollback + 1 rebased racer, with time-travel row counts."""
    import __spark_entry__ as entry_mod

    rows = entry_mod.queries()["versioned_table_history"](
        spark, sf001_dir
    ).collect()
    assert [
        (r["version"], r["parent"], r["run_id"], r["is_rollback"],
         r["n_upserted"], r["n_rows_at_version"])
        for r in rows
    ] == [
        (1, 0, "ingest", False, 8, 8),
        (2, 1, "append", False, 5, 13),
        (3, 2, "revise", False, 2, 14),
        (4, 3, "rollback-to-2", True, 0, 13),
        (5, 4, "racer", False, 1, 14),
    ]


def test_png_roundtrip_property():
    """Hypothesis battery: PNG encode→decode is EXACT for arbitrary
    pixel content and dimensions (the lossless contract), including the
    1-pixel-wide/tall degenerate shapes where the left-neighbor filters
    have no left neighbor."""
    import numpy as np
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from text_extractor_for_bioeconomic_products_spark.operators.multimodal import (
        decode_png,
        encode_png,
    )

    @settings(max_examples=40, deadline=None)
    @given(
        w=st.integers(min_value=1, max_value=24),
        h=st.integers(min_value=1, max_value=24),
        seed=st.integers(min_value=0, max_value=2**31 - 1),
    )
    def roundtrip(w, h, seed):
        rng = np.random.default_rng(seed)
        pixels = rng.integers(0, 256, w * h * 3, dtype=np.uint8).tobytes()
        rw, rh, _mean, arr = decode_png(encode_png(w, h, pixels))
        assert (rw, rh) == (w, h)
        assert arr.tobytes() == pixels

    roundtrip()


def test_jpeg_roundtrip_property():
    """Hypothesis battery for the lossy codec's INVARIANTS: arbitrary
    dims/content always decode to the exact dimensions, pixel values in
    range, and byte-deterministic encoding; smooth (solid) content stays
    within the DC error bound."""
    import numpy as np
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from text_extractor_for_bioeconomic_products_spark.operators.multimodal import (
        decode_jpeg,
        encode_jpeg,
    )

    @settings(max_examples=25, deadline=None)
    @given(
        w=st.integers(min_value=1, max_value=20),
        h=st.integers(min_value=1, max_value=20),
        seed=st.integers(min_value=0, max_value=2**31 - 1),
        solid=st.booleans(),
    )
    def roundtrip(w, h, seed, solid):
        rng = np.random.default_rng(seed)
        if solid:
            color = rng.integers(0, 256, 3, dtype=np.uint8)
            px = np.tile(color, (h, w, 1))
        else:
            px = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        payload = encode_jpeg(w, h, px.tobytes())
        assert payload == encode_jpeg(w, h, px.tobytes())
        rw, rh, mean, arr = decode_jpeg(payload)
        assert (rw, rh) == (w, h)
        assert arr.dtype == np.uint8 and arr.shape == (h, w, 3)
        assert 0.0 <= mean <= 255.0
        if solid:
            assert np.abs(arr.astype(int) - px.astype(int)).max() <= 4

    roundtrip()


def test_mp4_roundtrip_property():
    """Hypothesis battery for the ISO BMFF walk: arbitrary dims, frame
    counts, fps, and content always probe back the exact container
    metadata, and the sample slicing is byte-exact — each frame's
    decoded mean equals decoding the same JPEG standalone (so mdat
    offsets/sizes from stsc/stco/stsz are provably correct, not merely
    plausible)."""
    import numpy as np
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from text_extractor_for_bioeconomic_products_spark.operators.multimodal import (
        decode_jpeg,
        decode_mp4,
        encode_jpeg,
        encode_mp4,
        probe_mp4,
    )

    @settings(max_examples=20, deadline=None)
    @given(
        w=st.integers(min_value=1, max_value=16),
        h=st.integers(min_value=1, max_value=16),
        n=st.integers(min_value=1, max_value=6),
        fps=st.integers(min_value=1, max_value=60),
        seed=st.integers(min_value=0, max_value=2**31 - 1),
    )
    def roundtrip(w, h, n, fps, seed):
        rng = np.random.default_rng(seed)
        frames = [
            rng.integers(0, 256, w * h * 3, dtype=np.uint8).tobytes()
            for _ in range(n)
        ]
        payload = encode_mp4(w, h, frames, fps=fps)
        assert payload == encode_mp4(w, h, frames, fps=fps)  # deterministic
        meta = probe_mp4(payload)
        assert (meta["codec"], meta["width"], meta["height"],
                meta["n_samples"], meta["fps"]) == ("jpeg", w, h, n, fps)
        rw, rh, rn, rfps, _mean, means, codec = decode_mp4(payload)
        assert (rw, rh, rn, rfps, codec) == (w, h, n, fps, "mjpeg")
        direct = [decode_jpeg(encode_jpeg(w, h, f))[2] for f in frames]
        assert means == direct

    roundtrip()


def test_versioned_rebase_ignores_survivor_rows(spark, transcripts_df, tmp_path):
    """Conflict validation is against the keys a concurrent commit
    UPSERTED (the manifest's key_files), not the full rewritten bucket
    files: a bucket file also carries the bucket's untouched survivor
    rows, and counting those as conflicts would spuriously refuse any
    update of an existing key that merely shares a bucket with
    concurrent activity."""
    import text_extractor_for_bioeconomic_products_spark.plans.versioned as V
    from text_extractor_for_bioeconomic_products_spark.plans.versioned import (
        commit_merge,
        read_version,
    )
    from pyspark.sql import functions as F

    table = str(tmp_path / "vt_sv")
    turns = extract_turns(transcripts_df).drop("spans").cache()
    # v1: the existing key set (turn_idx = 0) — one bucket per conv_id
    base_rows = turns.filter("turn_idx = 0")
    commit_merge(spark, table, base_rows, run_id="base")

    # B upserts brand-new keys (turn_idx = 5) that land in the SAME
    # buckets (same conv_ids); its bucket files therefore carry the
    # turn_idx=0 survivors
    commit_merge(spark, table, turns.filter("turn_idx = 5"), run_id="B")

    # A concurrently UPDATES the existing turn_idx=0 keys from base v1.
    # B never wrote those keys — A must rebase and land, not conflict.
    real_current = V._current_version
    calls = {"n": 0}

    def stale_once(d):
        calls["n"] += 1
        return 1 if calls["n"] == 1 else real_current(d)

    updated = base_rows.withColumn("n_tokens", F.col("n_tokens") + 7777)
    V._current_version = stale_once
    try:
        r = commit_merge(spark, table, updated, run_id="A", retries=2)
    finally:
        V._current_version = real_current
    assert r["rebases"] == 1 and r["version"] == 3
    got = read_version(spark, table)
    # A's update applied, B's inserts intact, no duplicate keys
    assert got.filter("turn_idx = 0").filter("n_tokens < 7777").count() == 0
    assert got.filter("turn_idx = 5").count() == turns.filter("turn_idx = 5").count()
    assert got.groupBy("conv_id", "turn_idx").count().filter("count > 1").count() == 0


def test_jpeg_rejects_non_ycbcr():
    """Grayscale (1-component) baseline JPEG must refuse loudly — the
    YCbCr math would otherwise silently decode it green-tinted."""
    import struct as _struct

    import pytest as _pytest

    from text_extractor_for_bioeconomic_products_spark.operators.multimodal import (
        decode_jpeg,
    )

    sof_body = _struct.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0])
    sof = _struct.pack(">HH", 0xFFC0, len(sof_body) + 2) + sof_body
    gray = b"\xff\xd8" + sof + b"\xff\xd9"
    with _pytest.raises(NotImplementedError, match="3-component"):
        decode_jpeg(gray)


def test_versioned_schema_evolution_add_and_missing_columns(spark, tmp_path):
    """Iceberg add-column semantics: a commit carrying a NEW column
    null-fills survivors and untouched buckets; a later commit MISSING a
    column null-fills its own rows instead of dropping the column; time
    travel to a pre-evolution snapshot still returns the old schema; and
    the manifest records each commit's written column list."""
    from text_extractor_for_bioeconomic_products_spark.plans.versioned import (
        _manifest,
        commit_merge,
        read_version,
    )

    table = str(tmp_path / "vtable_evo")

    def df(rows, schema):
        return spark.createDataFrame(rows, schema)

    base = [(f"c{i}", t, f"c{i} turn {t}") for i in range(6) for t in (0, 1)]
    commit_merge(
        spark, table,
        df(base, "conv_id string, turn_idx int, text string"),
        run_id="v1", n_buckets=4,
    )
    assert set(read_version(spark, table, 1).columns) == {
        "conv_id", "turn_idx", "text"
    }

    # v2 adds `lang`, touching only conv c0 (other buckets keep v1 files)
    commit_merge(
        spark, table,
        df([("c0", 0, "c0 revised", "en")],
           "conv_id string, turn_idx int, text string, lang string"),
        run_id="v2", n_buckets=4,
    )
    cur = read_version(spark, table)
    assert set(cur.columns) == {"conv_id", "turn_idx", "text", "lang"}
    rows = {(r["conv_id"], r["turn_idx"]): r for r in cur.collect()}
    assert rows[("c0", 0)]["lang"] == "en"
    assert rows[("c0", 0)]["text"] == "c0 revised"
    # survivor in the same bucket and rows in untouched buckets: lang null
    assert rows[("c0", 1)]["lang"] is None
    assert all(
        r["lang"] is None for k, r in rows.items() if k != ("c0", 0)
    )
    assert len(rows) == len(base)

    # v3 lacks `text`: the column must survive with nulls for v3's rows
    commit_merge(
        spark, table,
        df([("c0", 0, "fr"), ("c9", 5, "de")],
           "conv_id string, turn_idx int, lang string"),
        run_id="v3", n_buckets=4,
    )
    cur3 = {(r["conv_id"], r["turn_idx"]): r
            for r in read_version(spark, table).collect()}
    assert set(read_version(spark, table).columns) == {
        "conv_id", "turn_idx", "text", "lang"
    }
    assert cur3[("c0", 0)]["lang"] == "fr" and cur3[("c0", 0)]["text"] is None
    assert cur3[("c9", 5)]["lang"] == "de" and cur3[("c9", 5)]["text"] is None
    assert cur3[("c1", 0)]["text"] == "c1 turn 0"

    # time travel: pre-evolution snapshots keep their old schema
    assert set(read_version(spark, table, 1).columns) == {
        "conv_id", "turn_idx", "text"
    }
    # manifests record what each commit wrote
    assert _manifest(table, 2)["columns"] == [
        "conv_id", "turn_idx", "text", "lang"
    ]
    assert _manifest(table, 3)["columns"] == ["conv_id", "turn_idx", "lang"]


def test_versioned_bucket_count_guard_and_rebucketing_compaction(
    spark, transcripts_df, tmp_path,
):
    """n_buckets is a TABLE property: before the guard, one 8-bucket
    plus one 3-bucket commit duplicated 67 keys (same key hashed into
    two bucket numberings).  Now the manifest records it, later commits
    auto-resolve it, an explicit disagreeing value refuses, and
    compact(to_buckets=...) is the sanctioned re-bucketing — content-
    identical, recorded, and terminal for any in-flight stale-keyed
    rebase."""
    from pyspark.sql import functions as F

    from text_extractor_for_bioeconomic_products_spark.plans.versioned import (
        CommitConflict,
        _manifest,
        commit_merge,
        compact,
        read_version,
        version_changes,
    )

    table = str(tmp_path / "vt_bk")
    turns = extract_turns(transcripts_df.limit(400)).drop("spans").cache()
    commit_merge(spark, table, turns.filter("turn_idx < 3"), run_id="a",
                 n_buckets=8)
    assert _manifest(table, 1)["n_buckets"] == 8

    # the exact pre-guard corruption recipe now refuses
    with pytest.raises(ValueError, match="duplicate keys across buckets"):
        commit_merge(spark, table, turns.limit(50), run_id="bad", n_buckets=3)

    # None auto-resolves to the recorded count; no duplicates ever
    commit_merge(spark, table, turns, run_id="b")
    assert _manifest(table, 2)["n_buckets"] == 8
    v2 = read_version(spark, table)
    assert v2.count() == turns.count()
    assert v2.groupBy("conv_id", "turn_idx").count() \
             .filter("count > 1").count() == 0

    # re-bucketing compaction: 8 -> 2 buckets, content identical
    out = compact(spark, table, to_buckets=2)
    assert out["version"] == 3 and out["n_buckets"] == 2
    assert out["files_after"] <= 2 < out["files_before"]
    assert _manifest(table, 3)["n_buckets"] == 2
    v3 = read_version(spark, table)
    assert sorted(map(str, v3.collect())) == sorted(map(str, v2.collect()))
    # CDC agrees: compaction is a content no-op
    assert version_changes(spark, table, 2, 3).count() == 0

    # later merges auto-resolve the NEW count and stay duplicate-free
    commit_merge(
        spark, table,
        turns.limit(100).withColumn("n_tokens", F.col("n_tokens") + 5),
        run_id="c",
    )
    assert _manifest(table, 4)["n_buckets"] == 2
    v4 = read_version(spark, table)
    assert v4.count() == turns.count()
    assert v4.groupBy("conv_id", "turn_idx").count() \
             .filter("count > 1").count() == 0

    # an in-flight writer keyed under a STALE bucket count must fail its
    # rebase terminally: simulate by making the writer read base v4
    # while a concurrent compaction re-buckets to 4
    import text_extractor_for_bioeconomic_products_spark.plans.versioned as V
    real_current = V._current_version
    state = {"n": 0}

    def stale_then_real(d):
        state["n"] += 1
        if state["n"] == 1:  # writer resolves base BEFORE the compaction
            return 4
        return real_current(d)

    # deterministic sequencing: compact first, then a writer whose base
    # was resolved before it (stale_then_real returns 4 exactly once)
    compact(spark, table, to_buckets=4)
    V._current_version = stale_then_real
    try:
        with pytest.raises(CommitConflict, match="re-bucketing"):
            commit_merge(
                spark, table, turns.limit(10), run_id="stale", retries=3,
            )
    finally:
        V._current_version = real_current


def test_version_changes_cdc_and_as_of_timestamp(spark, transcripts_df, tmp_path):
    """Snapshot changelog (Delta-CDF analog): the keyed diff between
    snapshots classifies inserts / update-postimages / deletes exactly
    against hand-derivable expectations, a rollback surfaces as the
    inverse change set, and version_at resolves AS-OF timestamps to the
    manifest commit clock."""
    import os
    import time

    from pyspark.sql import functions as F

    from text_extractor_for_bioeconomic_products_spark.plans.versioned import (
        commit_merge,
        read_version,
        rollback,
        version_at,
        version_changes,
    )

    table = str(tmp_path / "vt_cdc")
    turns = extract_turns(transcripts_df.limit(400)).drop("spans").cache()
    first = turns.filter("turn_idx < 2").cache()
    commit_merge(spark, table, first, run_id="a")
    second = turns.filter("turn_idx < 4").withColumn(
        "n_tokens", F.col("n_tokens") + 1000).cache()
    commit_merge(spark, table, second, run_id="b")

    # v1 -> v2: every turn_idx<2 key updated (+1000 tokens), every
    # 2<=turn_idx<4 key inserted, nothing deleted
    ch = version_changes(spark, table, 1, 2).cache()
    census = {r["change_type"]: r["n"] for r in
              ch.groupBy("change_type").agg(F.count("*").alias("n")).collect()}
    n_upd = first.count()
    n_ins = turns.filter("turn_idx >= 2 AND turn_idx < 4").count()
    assert census == {"insert": n_ins, "update_postimage": n_upd}
    # postimages carry the TO-snapshot content
    assert ch.filter("change_type = 'update_postimage'") \
             .filter("n_tokens < 1000").count() == 0
    assert ch.filter("change_type = 'insert'") \
             .filter("turn_idx < 2").count() == 0

    # rollback to v1 → v3; v2 -> v3 is the exact inverse: the inserted
    # keys delete, the updated keys update back to pre-1000 values
    rollback(table, 1)
    inv = version_changes(spark, table, 2, 3).cache()
    icensus = {r["change_type"]: r["n"] for r in
               inv.groupBy("change_type").agg(F.count("*").alias("n")).collect()}
    assert icensus == {"delete": n_ins, "update_postimage": n_upd}
    assert inv.filter("change_type = 'update_postimage'") \
              .filter("n_tokens >= 1000").count() == 0
    # v1 -> v3 is a no-op changelog (rollback restored v1's content)
    assert version_changes(spark, table, 1, 3).count() == 0

    import pytest as _pytest
    with _pytest.raises(ValueError, match="empty changelog"):
        version_changes(spark, table, 2, 2)

    # AS-OF timestamp resolves on the manifest commit clock
    meta = os.path.join(table, "meta")
    t_v2 = os.path.getmtime(os.path.join(meta, "v2.json"))
    assert version_at(table, t_v2) == 2
    assert version_at(table, time.time() + 60) == 3
    with _pytest.raises(ValueError, match="no snapshot"):
        version_at(table, 1.0)
    # the resolved snapshot reads exactly as that version
    assert read_version(spark, table, version_at(table, t_v2)).count() == \
        read_version(spark, table, version=2).count()


def test_iceberg_metadata_export_structure(spark, transcripts_df, tmp_path):
    """The versioned chain exports in the Iceberg v2 metadata LAYOUT:
    per-snapshot metadata.json (format-version 2, snapshot list,
    refs/main), a manifest-list Avro whose single manifest_file row
    carries spec field-ids, and a manifest Avro whose manifest_entry
    rows resolve to the real data files with footer-true record counts
    — the current snapshot's total equals read_version().count().
    Re-export of an unchanged table is byte-identical."""
    import hashlib
    import json
    import os

    from pyspark.sql import functions as F

    from text_extractor_for_bioeconomic_products_spark.plans.iceberg_export import (
        MANIFEST_ENTRY_SCHEMA,
        export_iceberg_metadata,
    )
    from text_extractor_for_bioeconomic_products_spark.plans.versioned import (
        commit_merge,
        read_version,
        rollback,
    )
    from text_extractor_for_bioeconomic_products_spark.sources.avro import (
        read_avro_bytes,
        read_avro_header,
    )

    table = str(tmp_path / "vt_ice")
    turns = extract_turns(transcripts_df.limit(300)).drop("spans").cache()
    commit_merge(spark, table, turns.filter("turn_idx < 2"), run_id="a")
    commit_merge(
        spark, table,
        turns.filter("turn_idx < 4").withColumn(
            "n_tokens", F.col("n_tokens") + 1000),
        run_id="b",
    )
    rollback(table, 1)

    census = export_iceberg_metadata(table)
    md = census["metadata_dir"]
    assert census["n_snapshots"] == 3 and census["current_snapshot_id"] == 3

    doc = json.load(open(os.path.join(md, "v3.metadata.json")))
    assert doc["format-version"] == 2
    assert doc["current-snapshot-id"] == 3
    assert doc["refs"]["main"]["snapshot-id"] == 3
    assert [s["snapshot-id"] for s in doc["snapshots"]] == [1, 2, 3]
    assert doc["snapshots"][1]["parent-snapshot-id"] == 1
    # the rollback snapshot is metadata-only: summary op 'replace'
    assert doc["snapshots"][2]["summary"]["operation"] == "replace"
    # earlier metadata files exist too (one per snapshot)
    assert {"v1.metadata.json", "v2.metadata.json"} <= set(os.listdir(md))
    # schema carries ids for every column incl. key cols
    names = {f["name"] for f in doc["schemas"][0]["fields"]}
    assert {"conv_id", "turn_idx"} <= names

    # manifest-list → manifest → data files chain resolves with real
    # counts; the avro schemas embed the spec field-ids
    ml = open(os.path.join(md, doc["snapshots"][-1]["manifest-list"]), "rb").read()
    mf_schema, mf_rows = read_avro_bytes(ml)
    assert {f.get("field-id") for f in mf_schema["fields"]} >= {500, 501, 503}
    assert len(mf_rows) == 1
    manifest_path = mf_rows[0][0]
    mbytes = open(os.path.join(md, manifest_path), "rb").read()
    assert mf_rows[0][1] == len(mbytes)  # manifest_length is real
    me_schema, entries = read_avro_bytes(mbytes)
    assert me_schema == MANIFEST_ENTRY_SCHEMA
    assert all(e[4]["file_format"] == "PARQUET" for e in entries)
    total = sum(e[4]["record_count"] for e in entries)
    assert total == read_version(spark, table).count()
    # v3 is the rollback: zero ADDED files, all EXISTING
    assert all(e[0] == 0 for e in entries)
    # OCF header parses standalone (magic, codec, sync) and carries
    # the spec's required manifest header keys
    _s, codec, _sync, _pos = read_avro_header(mbytes)
    assert codec == "deflate"
    raw_head = mbytes[:4096]
    for key in (b"schema", b"partition-spec", b"format-version", b"content"):
        assert key in raw_head
    _s, codec_ml, _sync, _pos = read_avro_header(ml)
    assert b"snapshot-id" in ml[:4096] and b"sequence-number" in ml[:4096]

    # deterministic re-export
    h1 = {f: hashlib.md5(open(os.path.join(md, f), "rb").read()).hexdigest()
          for f in census["files"]}
    export_iceberg_metadata(table)
    h2 = {f: hashlib.md5(open(os.path.join(md, f), "rb").read()).hexdigest()
          for f in census["files"]}
    assert h1 == h2

    # the metadata is COMPLETE, not just well-formed: reading every
    # snapshot THROUGH the exported chain equals the versioned reader
    from text_extractor_for_bioeconomic_products_spark.plans.iceberg_export import (
        read_iceberg_snapshot,
    )
    for v in (1, 2, 3):
        via_ice = read_iceberg_snapshot(spark, md, snapshot_id=v)
        direct = read_version(spark, table, version=v)
        assert sorted(map(str, via_ice.collect())) == sorted(
            map(str, direct.collect()))
    # default = current snapshot; unknown snapshot refuses
    assert read_iceberg_snapshot(spark, md).count() == \
        read_version(spark, table).count()
    import pytest as _pytest
    with _pytest.raises(ValueError, match="not in the metadata chain"):
        read_iceberg_snapshot(spark, md, snapshot_id=99)


def test_snm_finds_prefix_neighbors_and_bounds_pairs(spark):
    """Sorted-neighborhood: near-identical docs adjacent in prefix-sort
    order pair up; total candidates never exceed (W-1)·n; and a doc in
    a different 4-char block is structurally unreachable (the sorted-
    blocks tradeoff, asserted so it stays a documented decision)."""
    from text_extractor_for_bioeconomic_products_spark.operators.dedup import (
        SNM_WINDOW,
        snm_candidate_pairs,
    )

    near_a = "the quick brown fox jumps over the lazy dog once more"
    near_b = "the quick brown fox jumps over the lazy dog once mere"
    rows = [
        (1, near_a),
        (2, near_b),                                # 1 edit from near_a
        (3, "zebra " + near_a),                     # same content, other block
        (4, "an entirely different document about supply chains"),
        (5, "yet another unrelated text body for padding the corpus"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = {(r["doc_a"], r["doc_b"]): r["lev"]
             for r in snm_candidate_pairs(docs).collect()}
    assert (1, 2) in pairs and pairs[(1, 2)] == 1
    # the 'zebra '-prefixed twin sorts into block 'zebr' — never compared
    assert not any(3 in p for p in pairs)
    assert len(pairs) <= (SNM_WINDOW - 1) * len(rows)


def test_snm_plan_single_window_no_cartesian(spark, sf001_dir):
    """The candidate generation is one block-partitioned window — no
    self-join, no cartesian, no second exchange after the sort."""
    import __spark_entry__ as entry_mod

    df = entry_mod.queries()["snm_candidates"](spark, sf001_dir)
    df.collect()
    final = (
        df._jdf.queryExecution().executedPlan().toString()
        .split("== Initial Plan ==")[0]
    )
    assert final.count("Window") >= 1
    assert "CartesianProduct" not in final, final
    assert "SortMergeJoin" not in final, final


def test_source_overlap_hand_computed(spark):
    """Two sources sharing exactly one 5-word passage: gram counts and
    Jaccard equal the enumerated values; a disjoint third source
    produces no row."""
    from text_extractor_for_bioeconomic_products_spark.operators.dedup import (
        source_overlap_matrix,
    )

    shared = "alpha beta gamma delta epsilon"          # 5 words → 1 gram
    rows = [
        (1, "s1", shared + " zeta"),                   # grams: 2
        (2, "s2", "intro words first " + shared),      # grams: 4
        (3, "s3", "one two three four five six"),      # grams: 2, disjoint
    ]
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
    got = {
        (r["source_a"], r["source_b"]): r
        for r in source_overlap_matrix(docs).collect()
    }
    assert list(got) == [("s1", "s2")]
    r = got[("s1", "s2")]
    # s1: {alpha..epsilon, beta..zeta} = 2; s2: 4 grams; shared: the
    # 'alpha beta gamma delta epsilon' gram and 'beta gamma delta
    # epsilon zeta'? no — s2 ends at epsilon, so exactly 1 shared gram
    assert (r["grams_a"], r["grams_b"], r["n_shared"]) == (2, 4, 1)
    assert r["jaccard"] == round(1 / (2 + 4 - 1), 6)


def _winnow_ref(text, k, w):
    """Pure-Python robust winnowing (Schleimer et al. 2003, Fig. 5
    semantics): windowed rightmost-minimum over md5-prefix gram hashes
    of the normalized text — the independent oracle for the in-row
    lambda-fold implementation."""
    import hashlib
    import re as _re

    s = _re.sub(r"[^a-z0-9]", "", text.lower())
    n = len(s) - k + 1
    if n < 1:
        return set()
    hs = [
        hashlib.md5(s[i : i + k].encode()).hexdigest()[:8] for i in range(n)
    ]
    out = set()
    for wi in range(max(n - w + 1, 1)):
        lo, hi = wi, min(wi + w, n)
        best = lo
        for j in range(lo + 1, hi):
            if hs[j] <= hs[best]:          # rightmost on ties (robust)
                best = j
        out.add((hs[best], best + 1))       # engine positions are 1-based
    return out


def test_winnowing_matches_pure_python_reference(spark):
    """Engine fingerprints byte-equal the pure-Python robust-winnowing
    reference on mixed-case/punctuated text, a doc shorter than one
    window (still yields ≥1 fingerprint), a doc shorter than k (zero),
    and a run of identical grams (the robust-variant tie case: one
    fingerprint for the run, not w)."""
    from text_extractor_for_bioeconomic_products_spark.operators.dedup import (
        WINNOW_K,
        WINNOW_W,
        winnow_fingerprints,
    )

    rows = [
        (1, "The Quick, Brown Fox -- jumps over 2 lazy dogs!"),
        (2, "abcdefghij"),                  # 3 grams < w windows
        (3, "abcdefg"),                     # len 7 < k=8 → no grams
        (4, "a" * 40),                      # all grams identical
        (5, ""),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (
            r["n_grams"],
            {(f["h"], f["p"]) for f in r["fingerprints"]},
        )
        for r in winnow_fingerprints(docs).collect()
    }
    for doc_id, text in rows:
        want = _winnow_ref(text, WINNOW_K, WINNOW_W)
        assert got[doc_id][1] == want, doc_id
    assert got[3] == (0, set()) and got[5] == (0, set())
    assert got[2][1] != set()
    # robust tie-break: the 33 identical grams of doc 4 select exactly
    # one distinct (hash, pos) per *rightmost* window position change —
    # far fewer than one per window; the reference set pins exact count
    assert len(got[4][1]) == len(_winnow_ref("a" * 40, WINNOW_K, WINNOW_W))


def test_winnowing_guarantee_and_plan(spark):
    """The t = k+w-1 guarantee: two documents sharing a normalized
    substring of ≥ 11 chars share at least one fingerprint HASH —
    winnowing's whole point vs sampling sketches.  And the plan is one
    narrow projection: no Exchange, no Generate (selection is in-row)."""
    from text_extractor_for_bioeconomic_products_spark.operators.dedup import (
        winnow_fingerprints,
    )

    core = "photosynthesis"                 # 14 normalized chars ≥ 11
    rows = [
        (1, "left filler text " + core + " right filler"),
        (2, "completely different framing: " + core + "?!"),
        (3, "no shared content here at all whatsoever"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    fp = winnow_fingerprints(docs)
    sets = {
        r["doc_id"]: {f["h"] for f in r["fingerprints"]}
        for r in fp.collect()
    }
    assert sets[1] & sets[2], "guarantee violated: shared 14-char substring"
    plan = fp._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    assert "Generate" not in plan, plan


def test_winnowing_pairs_hand_computed(spark):
    """Two docs sharing two long verbatim passages pair up with the
    enumerated shared-fingerprint count and overlap coefficient; a doc
    sharing nothing produces no pair; and the plan self-joins on the
    fingerprint bucket (no CartesianProduct)."""
    from text_extractor_for_bioeconomic_products_spark.operators.dedup import (
        WINNOW_MIN_SHARED,
        winnow_fingerprints,
        winnowing_candidate_pairs,
    )

    pass1 = "the mitochondria is the powerhouse of the cell"
    pass2 = "photosynthesis converts light into chemical energy"
    rows = [
        (1, pass1 + " and also " + pass2),
        (2, "intro text. " + pass1 + " outro. " + pass2 + " end."),
        (3, "entirely unrelated content about orbital mechanics"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["doc_a"], r["doc_b"]): r
        for r in winnowing_candidate_pairs(docs).collect()
    }
    assert list(got) == [(1, 2)]
    r = got[(1, 2)]
    assert r["n_shared"] >= WINNOW_MIN_SHARED
    # recompute the expected values from the fingerprint sets directly
    sets = {
        row["doc_id"]: {f["h"] for f in row["fingerprints"]}
        for row in winnow_fingerprints(docs).collect()
    }
    shared = sets[1] & sets[2]
    assert r["n_shared"] == len(shared)
    assert r["overlap"] == round(len(shared) / min(len(sets[1]), len(sets[2])), 4)
    plan = (
        winnowing_candidate_pairs(docs)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan, plan
