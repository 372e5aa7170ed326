"""WARC source: parser units, Spark reader, end-to-end extraction
parity against the serial kernel."""

import gzip
import os

from pyspark.sql import functions as F


def test_parse_warc_units():
    from inxs_spark.sources.warc import (
        _build_record,
        parse_http_response,
        parse_warc,
    )

    body = b"<html><p>hello</p></html>"
    raw = _build_record("https://x.test/a", "2026-01-01T00:00:00Z", body)
    # body containing the literal record marker must not split records
    tricky = _build_record("https://x.test/b", "2026-01-01T00:00:00Z",
                           b"<p>WARC/1.0 inline</p>")
    recs = list(parse_warc(raw + tricky))
    assert len(recs) == 2
    assert recs[0]["headers"]["warc-target-uri"] == "https://x.test/a"
    status, http_headers, got = parse_http_response(recs[0]["block"])
    assert status == 200 and got == body
    assert http_headers["content-type"] == "text/html"
    assert b"WARC/1.0 inline" in recs[1]["block"]


def test_read_warc_plain_and_gzip(spark, tmp_out):
    from inxs_spark.sources.warc import read_warc, synth_warc_file

    d = os.path.join(tmp_out, "warc_in")
    os.makedirs(d, exist_ok=True)
    urls_a = synth_warc_file(os.path.join(d, "a.warc"), 20, seed=1)
    urls_b = synth_warc_file(os.path.join(d, "b.warc.gz"), 15, seed=2,
                             compress=True)
    df = read_warc(spark, d)
    rows = df.collect()
    assert len(rows) == 35
    assert {r.url for r in rows} == set(urls_a) | set(urls_b)
    assert all(r.http_status == 200 and r.failure is None for r in rows)
    assert all(r.content_type == "text/html" for r in rows)


def test_warc_non_text_content_gated(spark, tmp_out):
    """Binary payloads (image/pdf content types) must be flagged
    failure='non_text' with no mojibake html, and must NOT reach the
    extraction input via warc_to_turns; records WITHOUT a content-type
    header stay (tolerant default)."""
    from inxs_spark.sources.warc import _build_record, read_warc, warc_to_turns

    d = os.path.join(tmp_out, "warc_bin")
    os.makedirs(d, exist_ok=True)
    recs = [
        _build_record("https://x.test/html", "2026-01-01T00:00:00Z",
                      b"<html><p>keep me</p></html>"),
        _build_record("https://x.test/png", "2026-01-01T00:00:00Z",
                      b"\x89PNG\r\n\x1a\n\x00binary", ctype="image/png"),
        _build_record("https://x.test/pdf", "2026-01-01T00:00:00Z",
                      b"%PDF-1.4 \xff\xfebinary", ctype="application/pdf"),
        _build_record("https://x.test/xhtml", "2026-01-01T00:00:00Z",
                      b"<html><p>xhtml ok</p></html>",
                      ctype="application/xhtml+xml; charset=utf-8"),
    ]
    with open(os.path.join(d, "mix.warc"), "wb") as fh:
        fh.write(b"".join(recs))
    rows = {r.url: r for r in read_warc(spark, d).collect()}
    assert rows["https://x.test/png"].failure == "non_text"
    assert rows["https://x.test/png"].html is None
    assert rows["https://x.test/pdf"].failure == "non_text"
    assert rows["https://x.test/html"].failure is None
    assert rows["https://x.test/xhtml"].failure is None
    kept = {r.conv_id for r in warc_to_turns(read_warc(spark, d)).collect()}
    assert kept == {"https://x.test/html", "https://x.test/xhtml"}


def test_warc_extraction_parity(spark, tmp_out):
    """WARC → turns → extract_df must byte-match the serial kernel on
    every page (the north-rule invariant on the web-archive source)."""
    from inxs_spark.extract import extract_turn
    from inxs_spark.plans.extract_pipeline import extract_df
    from inxs_spark.sources import synth
    from inxs_spark.sources.warc import read_warc, synth_warc_file, warc_to_turns

    d = os.path.join(tmp_out, "warc_e2e")
    os.makedirs(d, exist_ok=True)
    synth_warc_file(os.path.join(d, "c.warc.gz"), 40, seed=3, compress=True)
    turns = warc_to_turns(read_warc(spark, d))
    got = {
        r.conv_id: (r.extracted_text, r.failure)
        for r in extract_df(turns, num_partitions=4).collect()
    }
    assert len(got) == 40
    for i in range(40):
        url = f"https://example.org/3/{i}"
        payload = synth.payload(3000 + i, i % 4) or ""
        want_text, _spans, want_fail = extract_turn(payload)
        assert got[url] == (want_text, want_fail), url


def test_read_warc_corrupt_gzip_degrades(spark, tmp_out):
    from inxs_spark.sources.warc import read_warc

    d = os.path.join(tmp_out, "warc_bad")
    os.makedirs(d, exist_ok=True)
    with open(os.path.join(d, "bad.warc.gz"), "wb") as fh:
        fh.write(gzip.compress(b"WARC/1.0\r\n\r\n")[:10])  # truncated member
    rows = read_warc(spark, d).collect()
    assert len(rows) == 1 and rows[0].failure == "gzip_error"


def test_jsonl_transcripts_permissive(spark, tmp_out):
    """JSONL ingestion: clean rows parse into the transcripts schema,
    malformed lines surface in _corrupt_record instead of failing."""
    import json as _json

    from inxs_spark.plans.extract_pipeline import extract_df
    from inxs_spark.sources.transcripts import read_transcripts_jsonl

    path = os.path.join(tmp_out, "turns.jsonl")
    with open(path, "w") as fh:
        for i in range(10):
            fh.write(_json.dumps({
                "conv_id": f"c{i % 3}", "turn_idx": i, "role": "user",
                "text": f"<p>turn {i}</p>", "tool": None,
                "ts": "2026-01-01T00:00:05",
            }) + "\n")
        fh.write('{"conv_id": "broken", "turn_idx": NOT_JSON}\n')
        fh.write("total garbage line\n")
    # Spark disallows queries touching ONLY the corrupt column on raw
    # JSON — cache first (documented in the reader)
    df = read_transcripts_jsonl(spark, path).cache()
    try:
        clean = df.filter(F.col("_corrupt_record").isNull())
        corrupt = df.filter(F.col("_corrupt_record").isNotNull())
        assert clean.count() == 10 and corrupt.count() == 2
        # feeds the pipeline directly
        out = extract_df(clean.drop("_corrupt_record"), num_partitions=2)
        texts = {(r.conv_id, r.turn_idx): r.extracted_text for r in out.collect()}
        assert texts[("c0", 0)] == "turn 0" and len(texts) == 10
    finally:
        df.unpersist()
