"""Streaming parity (batch == streaming result) + multimodal plumbing."""

import os

import pytest
from pyspark.sql import functions as F


def test_windowed_counts_stream_equals_batch(spark, sf_dir, tmp_path):
    from indexlab_spark.streaming.events import (
        read_events_stream,
        run_stream_to_memory,
        windowed_event_counts,
    )
    from indexlab_spark.session import load_tables

    # stage the events parquet in a stream-source dir
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    src = str(tmp_path / "events_src")
    ev.write.parquet(src)

    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 2)
        .parquet(src)
    )
    agg = windowed_event_counts(stream, "1 day", "1 hour")
    run_stream_to_memory(agg, "win_counts", output_mode="complete")
    got = {
        (str(r["window_start"]), r["event_type"]): (r["n"], round(r["sum_value"], 6))
        for r in spark.sql("select * from win_counts").collect()
    }
    expect = {
        (str(r["ws"]), r["event_type"]): (r["n"], round(r["sum_value"], 6))
        for r in ev.groupBy(
            F.window("ts", "1 day").alias("w"), "event_type"
        )
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("sum_value"))
        .select(F.col("w.start").alias("ws"), "event_type", "n", "sum_value")
        .collect()
    }
    assert got == expect


def test_dedup_stream_drops_duplicates(spark, sf_dir, tmp_path):
    from indexlab_spark.streaming.events import dedup_stream, run_stream_to_memory
    from indexlab_spark.session import load_tables

    ev = load_tables(spark, sf_dir, ("events",))["events"].limit(200)
    src = str(tmp_path / "dup_src")
    ev.unionAll(ev).repartition(2).write.parquet(src)  # every event twice
    stream = spark.readStream.schema(ev.schema).parquet(src)
    deduped = dedup_stream(stream, ["event_id"])
    run_stream_to_memory(deduped, "dedup_ev", output_mode="append")
    n = spark.sql("select count(distinct event_id) c, count(*) n from dedup_ev").collect()[0]
    assert n["c"] == n["n"] == 200


def test_multimodal_feature_pipeline(spark, tmp_path):
    from indexlab_spark.operators.multimodal import (
        FEATURE_DIM,
        read_binary_assets,
        with_image_features,
    )

    d = tmp_path / "imgs"
    d.mkdir()
    payloads = {f"img{i}.bin": bytes([i] * (100 + i)) for i in range(5)}
    for name, data in payloads.items():
        (d / name).write_bytes(data)

    assets = read_binary_assets(spark, str(d), "image", glob="*.bin")
    feats = with_image_features(assets)
    rows = feats.collect()
    assert len(rows) == 5
    for r in rows:
        assert r["modality"] == "image"
        assert len(r["embedding"]) == FEATURE_DIM
        assert abs(sum(x * x for x in r["embedding"]) - 1.0) < 1e-5
    # determinism: same bytes -> same features on re-run
    rows2 = with_image_features(assets).collect()
    m1 = {r["asset_id"]: list(r["embedding"]) for r in rows}
    m2 = {r["asset_id"]: list(r["embedding"]) for r in rows2}
    assert m1 == m2


def test_multimodal_dedup_composes(spark, tmp_path):
    from indexlab_spark.operators.dedup import embedding_dup_pairs
    from indexlab_spark.operators.multimodal import (
        read_binary_assets,
        with_image_features,
    )

    d = tmp_path / "imgs2"
    d.mkdir()
    (d / "a.bin").write_bytes(b"identical-bytes-payload")
    (d / "b.bin").write_bytes(b"identical-bytes-payload")
    (d / "c.bin").write_bytes(b"completely different data here")
    assets = read_binary_assets(spark, str(d), "image", glob="*.bin")
    feats = with_image_features(assets).select(
        F.col("asset_id").alias("vec_id"), "embedding"
    )
    pairs = embedding_dup_pairs(feats, id_col="vec_id", threshold=0.999)
    got = {(os.path.basename(r["id_a"]), os.path.basename(r["id_b"]))
           for r in pairs.collect()}
    assert got == {("a.bin", "b.bin")}


def _make_avi(frames: list[bytes]) -> bytes:
    """Minimal RIFF/AVI: one movi LIST holding 00db (raw DIB) chunks."""
    import struct as _s

    chunks = b""
    for f in frames:
        chunks += b"00db" + _s.pack("<I", len(f)) + f + (b"\x00" if len(f) & 1 else b"")
    movi = b"LIST" + _s.pack("<I", 4 + len(chunks)) + b"movi" + chunks
    return b"RIFF" + _s.pack("<I", 4 + len(movi)) + b"AVI " + movi


def test_video_avi_demux_and_sampling(spark):
    """Real AVI demux: every_n sampling keeps frames 0, n, 2n... with
    frame bytes + fourcc surfaced; non-AVI content emits an error row
    instead of failing the job."""
    from indexlab_spark.operators.multimodal import (
        demux_avi_frames,
        sample_video_frames,
    )

    frames = [bytes([i]) * 10 for i in range(7)]
    avi = _make_avi(frames)
    assert [f for _, f in demux_avi_frames(avi)] == frames
    assets = spark.createDataFrame(
        [("v1", "video", avi, {"src": "t"}), ("bad", "video", b"nope", None)],
        "asset_id string, modality string, content binary, "
        "meta map<string,string>",
    )
    out = sample_video_frames(assets, every_n=3).collect()
    got = {r["asset_id"]: r for r in out}
    assert set(got) == {"v1#frame0", "v1#frame3", "v1#frame6", "bad#error"}
    assert bytes(got["v1#frame3"]["content"]) == frames[3]
    assert got["v1#frame3"]["meta"]["fourcc"] == "00db"
    assert got["v1#frame0"]["meta"]["src"] == "t"
    assert "unsupported container" in got["bad#error"]["meta"]["error"]


def test_audio_wav_real_decode_and_features(spark):
    """WAV PCM16 decodes to the exact written samples via stdlib; audio
    features are real DSP over them (stable, L2-normalized, and
    sensitive to the waveform); unknown formats get the deterministic
    fake."""
    import io
    import wave

    import numpy as np

    from indexlab_spark.operators.multimodal import (
        _audio_features,
        decode_audio,
    )

    t = np.arange(8000)
    sine = (np.sin(t * 0.1) * 3000).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(8000)
        w.writeframes(sine.tobytes())
    wav = buf.getvalue()
    samples, rate = decode_audio(wav)
    assert rate == 8000 and samples.shape == (8000, 1)
    np.testing.assert_array_equal(samples[:, 0], sine)
    f1, f2 = _audio_features(wav), _audio_features(wav)
    np.testing.assert_array_equal(f1, f2)
    assert abs(float(np.linalg.norm(f1)) - 1.0) < 1e-6
    noise = (np.sign(np.sin(t * 1.7)) * 3000).astype("<i2")
    buf2 = io.BytesIO()
    with wave.open(buf2, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(8000)
        w.writeframes(noise.tobytes())
    assert not np.array_equal(f1, _audio_features(buf2.getvalue()))
    fake_s, fake_r = decode_audio(b"not audio at all")
    assert fake_r == 8000 and fake_s.shape == (8000, 1)


def test_reader_formats(spark, tmp_path):
    from indexlab_spark.sources.reader import read_any, sniff_format

    csv = tmp_path / "t.csv"
    csv.write_text("a,b\n1,x\n2,y\n")
    df = read_any(spark, str(csv))
    assert df.count() == 2 and set(df.columns) == {"a", "b"}

    js = tmp_path / "t.json"
    js.write_text('[{"a": 1, "b": "x"}, {"a": 2, "b": "y"}]')
    assert read_any(spark, str(js)).count() == 2

    md = tmp_path / "t.md"
    md.write_text("# Title\nbody text\n")
    rows = read_any(spark, str(md)).collect()
    assert len(rows) == 1 and "body text" in rows[0]["text"]

    html = tmp_path / "t.html"
    html.write_text(
        "<html><head><script>var x=1;</script><style>.a{}</style></head>"
        "<body><h1>Head</h1><p>Para one</p></body></html>"
    )
    rows = read_any(spark, str(html)).collect()
    assert "Para one" in rows[0]["text"] and "var x" not in rows[0]["text"]

    assert sniff_format("f.bin", b"PK\x03\x04") == "excel"
    assert sniff_format("f.bin", b'{"a": 1}') == "json"
    assert sniff_format("f.bin", b"a,b\n1,2\n") == "csv"
    assert sniff_format("f.bin", b"hello") == "text"


def _write_minimal_xlsx(path, header, rows):
    """Handcraft a genuine minimal ECMA-376 xlsx (zip of XML) — what
    Excel/openpyxl would produce, with shared + inline strings and
    numerics, so the stdlib fallback parser is tested against the real
    container format without needing openpyxl to author it."""
    import zipfile

    ns = 'xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"'
    rel = "http://schemas.openxmlformats.org/officeDocument/2006/relationships"
    shared: list[str] = []

    def cell(ref, v):
        if isinstance(v, str):
            if v not in shared:
                shared.append(v)
            return f'<c r="{ref}" t="s"><v>{shared.index(v)}</v></c>'
        if isinstance(v, bool):
            return f'<c r="{ref}" t="b"><v>{int(v)}</v></c>'
        return f'<c r="{ref}"><v>{v}</v></c>'

    body = []
    for i, row in enumerate([header] + rows, start=1):
        cs = "".join(
            cell(f"{chr(65 + j)}{i}", v) for j, v in enumerate(row) if v is not None
        )
        body.append(f'<row r="{i}">{cs}</row>')
    sheet = f'<worksheet {ns}><sheetData>{"".join(body)}</sheetData></worksheet>'
    sst = f'<sst {ns}>' + "".join(
        f"<si><t>{s}</t></si>" for s in shared
    ) + "</sst>"
    wb = (
        f'<workbook {ns} xmlns:r="{rel}"><sheets>'
        '<sheet name="Sheet1" sheetId="1" r:id="rId1"/></sheets></workbook>'
    )
    rels = (
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
        f'<Relationship Id="rId1" Type="{rel}/worksheet" Target="worksheets/sheet1.xml"/>'
        "</Relationships>"
    )
    with zipfile.ZipFile(path, "w") as z:
        z.writestr("xl/workbook.xml", wb)
        z.writestr("xl/_rels/workbook.xml.rels", rels)
        z.writestr("xl/sharedStrings.xml", sst)
        z.writestr("xl/worksheets/sheet1.xml", sheet)


def test_excel_reader_roundtrip_stdlib(spark, tmp_path):
    """S2: xlsx ingestion works WITHOUT openpyxl — the stdlib OOXML
    fallback parses a genuine minimal xlsx container (shared strings,
    numerics, sparse cells) with pandas.read_excel header semantics."""
    from indexlab_spark.sources.reader import _read_excel_driver

    xlsx = tmp_path / "t.xlsx"
    _write_minimal_xlsx(
        xlsx,
        ["a", "b", "c"],
        [[1, "x", 2.5], [2, "y", None], [3, "z", 7]],
    )
    df = _read_excel_driver(spark, str(xlsx))
    rows = sorted(df.collect(), key=lambda r: r["a"])
    assert set(df.columns) == {"a", "b", "c"}
    assert [r["a"] for r in rows] == [1, 2, 3]
    assert [r["b"] for r in rows] == ["x", "y", "z"]
    assert rows[0]["c"] == 2.5 and rows[1]["c"] is None


def test_excel_reader_corrupt_xls_gated(spark, tmp_path):
    """A CORRUPT .xls (truncated OLE2) stays gated with a message naming
    the dependency to install; valid BIFF8 parses via the stdlib path
    (covered below)."""
    from indexlab_spark.sources.reader import _read_excel_driver

    try:
        import openpyxl  # noqa: F401

        pytest.skip("openpyxl present; pandas path handles gating")
    except ImportError:
        pass
    xls = tmp_path / "t.xls"
    xls.write_bytes(b"\xd0\xcf\x11\xe0" + b"\x00" * 64)  # OLE2 magic only
    with pytest.raises(NotImplementedError, match="openpyxl|xlrd"):
        _read_excel_driver(spark, str(xls))


def test_excel_reader_legacy_xls_stdlib(spark, tmp_path):
    """S2 closed: a REAL BIFF8 .xls (OLE2 compound file, SST shared
    strings, NUMBER/BOOLERR cells) parses through the stdlib reader —
    same contract as the xlsx path (first sheet, first row = header,
    numeric coercion)."""
    from indexlab_spark.sources.reader import _read_excel_driver
    from indexlab_spark.sources.xls import write_xls

    xls = tmp_path / "t.xls"
    write_xls(
        str(xls),
        ["a", "b", "c"],
        [[1, "x", 2.5], [2, "y", None], [3, "z", 7.25]],
    )
    df = _read_excel_driver(spark, str(xls))
    rows = sorted(df.collect(), key=lambda r: r["a"])
    assert set(df.columns) == {"a", "b", "c"}
    assert [r["a"] for r in rows] == [1, 2, 3]
    assert [r["b"] for r in rows] == ["x", "y", "z"]
    assert rows[0]["c"] == 2.5 and rows[1]["c"] is None and rows[2]["c"] == 7.25


def test_xls_codec_roundtrip_paths():
    """sources/xls: both the mini-stream (<4096B) and main-FAT layouts
    round-trip; RK decoding handles the int/x100/float encodings."""
    import struct as _struct
    import tempfile

    from indexlab_spark.sources.xls import _decode_rk, parse_xls, write_xls

    # mini-stream case
    p = tempfile.mktemp(suffix=".xls")
    write_xls(p, ["n", "v"], [["r1", 1.5], ["r2", True]])
    h, rows = parse_xls(p)
    assert h == ["n", "v"] and rows == [["r1", 1.5], ["r2", True]]
    # FAT case (>4096 bytes)
    p2 = tempfile.mktemp(suffix=".xls")
    big = [[f"item{i}", i * 0.5] for i in range(400)]
    h2, rows2 = parse_xls_after_write(p2, ["name", "half"], big, write_xls)
    assert len(rows2) == 400 and rows2[3] == ["item3", 1.5]
    # RK encodings: integer, integer/100, float-high-bits
    assert _decode_rk((7 << 2) | 0x02) == 7
    assert _decode_rk((250 << 2) | 0x03) == 2.5  # 250/100, int flag + x100
    (as_q,) = _struct.unpack("<Q", _struct.pack("<d", 8.0))
    assert _decode_rk((as_q >> 32) & ~0x3) == 8.0


def parse_xls_after_write(path, header, rows, write_xls):
    write_xls(path, header, rows)
    from indexlab_spark.sources.xls import parse_xls

    return parse_xls(path)


def test_stateful_sessionization_matches_batch(spark, sf_dir, tmp_path):
    """Closed sessions from the stateful stream == batch sessions minus
    each user's final (still-open) session."""
    from indexlab_spark.session import load_tables
    from indexlab_spark.streaming.events import (
        run_stream_to_memory,
        sessionize_with_state,
    )
    from pyspark.sql.window import Window

    import time as _time

    ev = load_tables(spark, sf_dir, ("events",))["events"]
    src = str(tmp_path / "sess_src")
    # multiple files ARRIVING IN EVENT-TIME ORDER (the operator's
    # documented contract — log-shipper pattern): quartile files written
    # sequentially so FileStreamSource (mtime order) replays them in
    # order, with sessions spanning micro-batch boundaries
    ts_q = [r[0] for r in ev.selectExpr(
        "percentile(unix_micros(ts), array(0.25, 0.5, 0.75)) as q"
    ).select(F.explode("q")).collect()]
    lo = [None] + ts_q
    hi = ts_q + [None]
    for i, (a, b) in enumerate(zip(lo, hi)):
        part = ev
        if a is not None:
            part = part.filter(F.unix_micros("ts") > a)
        if b is not None:
            part = part.filter(F.unix_micros("ts") <= b)
        part.coalesce(1).write.mode("append").parquet(src)
        _time.sleep(1.1)  # distinct mtimes -> deterministic replay order
    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", False)
        .parquet(src)
    )
    sess = sessionize_with_state(stream, gap_seconds=1800)
    run_stream_to_memory(sess, "sess_out", output_mode="append")
    got = {
        (r["user_id"], str(r["session_start"]), str(r["session_end"]), r["n_events"])
        for r in spark.sql("select * from sess_out").collect()
    }

    # batch truth: sessionize then drop each user's last session
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    with_gap = ev.select(
        "user_id", "event_id", "ts",
        (F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))).alias("gap_us"),
    )
    sess_b = (
        with_gap.withColumn(
            "new_session",
            (F.col("gap_us").isNull() | (F.col("gap_us") > 1800 * 1_000_000)).cast("int"),
        )
        .withColumn(
            "session_id",
            F.sum("new_session").over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
        .groupBy("user_id", "session_id")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).cast("int").alias("n_events"),
        )
    )
    last = sess_b.groupBy("user_id").agg(F.max("session_id").alias("last_id"))
    closed_b = sess_b.join(last, "user_id").filter(
        F.col("session_id") != F.col("last_id")
    )
    expect = {
        (r["user_id"], str(r["session_start"]), str(r["session_end"]), r["n_events"])
        for r in closed_b.collect()
    }
    assert got == expect


def test_curation_ops_compose_with_streaming(spark, sf_dir, tmp_path):
    """The curation maps (quality_flags, redact_pii) are stateless Catalyst
    expressions, so they run unchanged on a streaming DataFrame — the
    streaming ingest-filter path of a training pipeline. Stream output
    must equal the batch result on the same files."""
    from indexlab_spark.operators.curation import quality_flags, redact_pii
    from indexlab_spark.session import load_tables
    from indexlab_spark.streaming.events import run_stream_to_memory

    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    src = str(tmp_path / "docs_src")
    docs.write.parquet(src)

    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    run_stream_to_memory(
        quality_flags(stream), "curation_flags_stream", output_mode="append"
    )
    run_stream_to_memory(
        redact_pii(stream), "curation_pii_stream", output_mode="append"
    )
    got_flags = {r["id"]: r["keep"]
                 for r in spark.sql("select * from curation_flags_stream").collect()}
    expect_flags = {r["id"]: r["keep"] for r in quality_flags(docs).collect()}
    assert got_flags == expect_flags and len(got_flags) > 0
    got_pii = {r["id"]: r["redacted"]
               for r in spark.sql("select * from curation_pii_stream").collect()}
    expect_pii = {r["id"]: r["redacted"] for r in redact_pii(docs).collect()}
    assert got_pii == expect_pii


def test_streaming_ingest_appends_index(spark, tmp_path):
    """Streaming INGEST end-to-end: readStream over a document directory
    -> foreachBatch(append_to_index) — each micro-batch commits a new
    copy-on-write version with explicit deterministic version ids; the
    final version contains seed + all streamed docs and is searchable.
    This is the streaming face of the X1 pipeline: micro-batch commit ==
    version, so exactly-once at the version level."""
    from indexlab_spark.config import EngineConfig, IngestConfig
    from indexlab_spark.pipeline import append_to_index, build_index, load_index

    engine = EngineConfig(warehouse_dir=str(tmp_path / "wh"))
    seed = spark.createDataFrame([("seed document about spark engines",)], ["text"])
    build_index(
        spark, seed, IngestConfig(index_name="streamidx"), engine, version="v0"
    )

    src = str(tmp_path / "incoming")
    batch1 = spark.createDataFrame(
        [("first streamed doc about vector search",)], ["text"]
    )
    batch2 = spark.createDataFrame(
        [("second streamed doc about bm25 ranking",)], ["text"]
    )
    batch1.write.parquet(src)                  # file 1
    batch2.write.mode("append").parquet(src)   # file 2

    stream = (
        spark.readStream.schema(batch1.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )

    def commit(batch_df, batch_id):
        if batch_df.isEmpty():
            return
        append_to_index(
            spark, batch_df, "streamidx", engine, version=f"v{batch_id + 1:03d}"
        )

    q = stream.writeStream.foreachBatch(commit).trigger(availableNow=True).start()
    q.awaitTermination(120)

    chunks, manifest = load_index(spark, "streamidx", engine)
    texts = [r["text"] for r in chunks.select("text").collect()]
    assert manifest["count"] == 3
    assert any("seed document" in t for t in texts)
    assert any("first streamed" in t for t in texts)
    assert any("second streamed" in t for t in texts)
    # doc numbering continued across versions (no collisions)
    doc_nos = sorted(r["doc_no"] for r in chunks.select("doc_no").collect())
    assert doc_nos == [0, 1, 2]


def test_stream_stream_interval_join_matches_batch(spark, sf_dir, tmp_path):
    """view⋈click interval join over the stream == the same join in
    batch (inner stream-stream joins emit exactly the matched pairs once
    both sides' watermarks allow)."""
    from indexlab_spark.session import load_tables
    from indexlab_spark.streaming.events import (
        run_stream_to_memory,
        view_click_join_stream,
    )

    ev = load_tables(spark, sf_dir, ("events",))["events"]
    src = str(tmp_path / "ssj_src")
    ev.coalesce(2).write.mode("overwrite").parquet(src)
    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = view_click_join_stream(stream, within_seconds=600)
    run_stream_to_memory(out, "ssj_out", output_mode="append")
    got = {
        (r["view_id"], r["click_id"])
        for r in spark.sql("SELECT * FROM ssj_out").collect()
    }

    v = ev.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("v_user"), F.col("event_id").alias("view_id"),
        F.col("ts").alias("view_ts"),
    )
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"), F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    want = {
        (r["view_id"], r["click_id"])
        for r in v.join(
            c,
            F.expr(
                "v_user = c_user AND click_ts > view_ts "
                "AND click_ts <= view_ts + interval 600 seconds"
            ),
        ).collect()
    }
    assert got == want and len(want) > 0


def _session_batch_truth(df):
    return {
        tuple(r)
        for r in df.groupBy(
            "user_id", F.session_window("ts", "30 minutes").alias("sw")
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
        .selectExpr(
            "user_id", "unix_micros(sw.start)", "unix_micros(sw.end)",
            "n_events", "sum_value",
        )
        .collect()
    }


def test_session_window_stream_single_batch_exact(spark, sf_dir, tmp_path):
    """Native session_window on a stream, one micro-batch, complete mode:
    exactly the batch session_window result."""
    from indexlab_spark.session import load_tables
    from indexlab_spark.streaming.events import (
        run_stream_to_memory,
        session_window_stream,
    )

    ev = load_tables(spark, sf_dir, ("events",))["events"]
    src = str(tmp_path / "swin_one")
    ev.repartition(3).write.parquet(src)
    stream = spark.readStream.schema(ev.schema).parquet(src)
    run_stream_to_memory(
        session_window_stream(stream, gap="30 minutes"), "swin_one",
        output_mode="complete",
    )
    got = {
        tuple(r)
        for r in spark.sql(
            "select user_id, unix_micros(session_start),"
            " unix_micros(session_end), n_events, sum_value from swin_one"
        ).collect()
    }
    expect = _session_batch_truth(spark.read.parquet(src))
    assert got == expect and len(got) > 100


def test_session_window_stream_append_watermark(spark, sf_dir, tmp_path):
    """Production shape — append mode + watermark over event-time-ordered
    micro-batches (complete mode does NOT merge session state across
    batches in this Spark build, and update mode is rejected outright;
    append+watermark is the supported contract). Emitted sessions must be
    a subset of batch truth, and every session provably final before the
    last batch's watermark MUST have been emitted."""
    import time as _time

    from indexlab_spark.session import load_tables
    from indexlab_spark.streaming.events import (
        run_stream_to_memory,
        session_window_stream,
    )

    ev = load_tables(spark, sf_dir, ("events",))["events"]
    src = str(tmp_path / "swin_app")
    ts_q = [
        r[0]
        for r in ev.selectExpr(
            "percentile(unix_micros(ts), array(0.25, 0.5, 0.75)) as q"
        ).select(F.explode("q")).collect()
    ]
    lo = [None] + ts_q
    hi = ts_q + [None]
    for a, b in zip(lo, hi):
        part = ev
        if a is not None:
            part = part.filter(F.unix_micros("ts") > a)
        if b is not None:
            part = part.filter(F.unix_micros("ts") <= b)
        part.coalesce(1).write.mode("append").parquet(src)
        _time.sleep(1.1)  # distinct mtimes -> deterministic replay order

    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", False)
        .parquet(src)
    )
    run_stream_to_memory(
        session_window_stream(stream, gap="30 minutes", watermark="1 hour"),
        "swin_app", output_mode="append",
    )
    got = {
        tuple(r)
        for r in spark.sql(
            "select user_id, unix_micros(session_start),"
            " unix_micros(session_end), n_events, sum_value from swin_app"
        ).collect()
    }
    truth = _session_batch_truth(spark.read.parquet(src))
    assert got <= truth
    # watermark visible to the final batch: max ts of the first 3 files
    # minus 1h; sessions whose end (= last event + gap) precedes it got
    # no further events (any file-4 event is > gap away) and must emit
    wm_floor = ts_q[2] - 3_600_000_000
    must_emit = {t for t in truth if t[2] <= wm_floor}
    assert must_emit and must_emit <= got


def test_drop_duplicates_within_watermark(spark, tmp_path):
    """dropDuplicatesWithinWatermark — the streaming dedup that tolerates
    REPEATED ids with different timestamps (dropDuplicates would keep
    both if ts differs): duplicates arriving within the watermark delta
    of the first sighting are dropped, and state for an id expires once
    the watermark passes — bounded even with infinitely many distinct
    ids. Batch-file replay: same id twice, 10 minutes apart, inside a
    30-minute watermark -> exactly one survivor per id."""
    import time as _time

    import pandas as pd

    src = str(tmp_path / "ddw_src")
    base = pd.Timestamp("2026-01-01 00:00:00")
    rows1 = pd.DataFrame(
        {
            "event_id": [1, 2, 3],
            "ts": [base, base + pd.Timedelta(minutes=1), base + pd.Timedelta(minutes=2)],
            "value": [1.0, 2.0, 3.0],
        }
    )
    # file 2: ids 1 and 2 again, 10 min later (dup within watermark),
    # plus a genuinely new id 4
    rows2 = pd.DataFrame(
        {
            "event_id": [1, 2, 4],
            "ts": [
                base + pd.Timedelta(minutes=10),
                base + pd.Timedelta(minutes=11),
                base + pd.Timedelta(minutes=12),
            ],
            "value": [10.0, 20.0, 4.0],
        }
    )
    for i, rows in enumerate([rows1, rows2]):
        spark.createDataFrame(rows).coalesce(1).write.mode("append").parquet(src)
        _time.sleep(1.1)

    from indexlab_spark.streaming.events import run_stream_to_memory

    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", False)
        .parquet(src)
    )
    deduped = stream.withWatermark("ts", "30 minutes").dropDuplicatesWithinWatermark(
        ["event_id"]
    )
    run_stream_to_memory(deduped, "ddw_out", output_mode="append")
    got = {
        (r["event_id"], r["value"])
        for r in spark.sql("select event_id, value from ddw_out").collect()
    }
    # first sighting survives for 1 and 2; 3 and 4 pass through
    assert got == {(1, 1.0), (2, 2.0), (3, 3.0), (4, 4.0)}


def test_stream_checkpoint_restart_is_incremental(spark, sf_dir, tmp_path):
    """Exactly-once file-source semantics across restarts: a second run
    with the SAME checkpoint processes only files added since the first
    run (offsets persisted), and the final state equals the batch
    answer over all files — the property that makes the streaming
    rollup a safe replacement for a nightly batch job."""
    from indexlab_spark.session import load_tables

    ev = load_tables(spark, sf_dir, ("events",))["events"]
    half_a = ev.filter(F.col("event_id") % 2 == 0)
    half_b = ev.filter(F.col("event_id") % 2 == 1)

    src = str(tmp_path / "incr_src")
    ckpt = str(tmp_path / "incr_ckpt")
    out = str(tmp_path / "incr_out")
    half_a.coalesce(1).write.mode("append").parquet(src)

    def run_once():
        stream = spark.readStream.schema(ev.schema).parquet(src)
        q = (
            stream.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        q.stop()

    run_once()
    n_first = spark.read.parquet(out).count()
    assert n_first == half_a.count()

    # add the second half; restart from the same checkpoint
    half_b.coalesce(1).write.mode("append").parquet(src)
    run_once()
    sunk = spark.read.parquet(out)
    # incremental: no reprocessing of the first file's rows
    assert sunk.count() == ev.count()
    assert sunk.select("event_id").distinct().count() == ev.count()


try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    _HAVE_HYP = True
except ImportError:  # pragma: no cover
    _HAVE_HYP = False

if _HAVE_HYP:
    _cell = st.one_of(
        st.none(),
        st.booleans(),
        st.integers(-1_000_000, 1_000_000),
        st.floats(
            allow_nan=False, allow_infinity=False, width=32,
        ).map(float),
        st.text(
            alphabet=st.characters(
                blacklist_categories=("Cs",), max_codepoint=0x2FFF
            ),
            max_size=12,
        ),
    )

    @settings(max_examples=25, deadline=None)
    @given(
        n_cols=st.integers(1, 6),
        rows=st.lists(st.lists(_cell, min_size=1, max_size=6), max_size=8),
        seed=st.integers(0, 10**6),
    )
    def test_xls_roundtrip_property(n_cols, rows, seed):
        """Arbitrary small grids (mixed types, unicode strings, Nones)
        survive write_xls -> parse_xls: same grid shape and values
        (rows padded/truncated to header width, float column-width
        caveats excluded by construction)."""
        import tempfile

        from indexlab_spark.sources.xls import parse_xls, write_xls

        header = [f"c{i}" for i in range(n_cols)]
        norm = [(r + [None] * n_cols)[:n_cols] for r in rows]
        # drop all-None rows at the END (trailing BLANK rows have no
        # cell records, so the parsed grid is shorter — same behavior
        # as real writers) and ensure at least one non-None cell per
        # remaining row for a well-defined grid
        while norm and all(v is None for v in norm[-1]):
            norm.pop()
        p = tempfile.mktemp(suffix=".xls")
        write_xls(p, header, norm)
        h, got = parse_xls(p)
        assert h == header
        assert len(got) == len(norm)
        for exp_row, got_row in zip(norm, got):
            g = (got_row + [None] * n_cols)[:n_cols]
            for e, o in zip(exp_row, g):
                if isinstance(e, float) and not isinstance(e, bool):
                    if e == int(e):
                        assert o == int(e) or o == e
                    else:
                        assert o is not None and abs(float(o) - e) < 1e-9
                elif isinstance(e, str):
                    assert o == e
                else:
                    assert o == e


def test_reader_compressed_sources(spark, tmp_path):
    """S1/S3/S4 through gzip/bzip2/xz: csv+json ride Spark's native
    codec support, text decompresses driver-side, and a gzipped BIFF8
    .xls goes through decompress -> stdlib parser."""
    import bz2
    import gzip
    import lzma

    from indexlab_spark.sources.reader import read_any
    from indexlab_spark.sources.xls import write_xls

    gz = tmp_path / "t.csv.gz"
    gz.write_bytes(gzip.compress(b"a,b\n1,x\n2,y\n"))
    df = read_any(spark, str(gz))
    assert df.count() == 2 and set(df.columns) == {"a", "b"}

    bz = tmp_path / "t.json.bz2"
    bz.write_bytes(bz2.compress(b'[{"a": 1}, {"a": 2}, {"a": 3}]'))
    assert read_any(spark, str(bz)).count() == 3

    xz = tmp_path / "t.md.xz"
    xz.write_bytes(lzma.compress("# Title\ncompressed body\n".encode()))
    rows = read_any(spark, str(xz)).collect()
    assert len(rows) == 1 and "compressed body" in rows[0]["text"]

    plain_xls = tmp_path / "t.xls"
    write_xls(str(plain_xls), ["a", "b"], [[1, "x"], [2, "y"]])
    gz_xls = tmp_path / "t.xls.gz"
    gz_xls.write_bytes(gzip.compress(plain_xls.read_bytes()))
    df2 = read_any(spark, str(gz_xls))
    assert sorted(r["a"] for r in df2.collect()) == [1, 2]


def test_reader_columnar_formats(spark, tmp_path):
    """read_any handles Spark-native columnar files: parquet and ORC by
    extension AND by magic bytes (PAR1 / ORC) with extensionless
    names."""
    from indexlab_spark.sources.reader import read_any, sniff_format

    src = spark.createDataFrame([(1, "x"), (2, "y")], "a int, b string")
    pdir = tmp_path / "p"
    odir = tmp_path / "o"
    src.coalesce(1).write.parquet(str(pdir))
    src.coalesce(1).write.orc(str(odir))
    pfile = next(p for p in pdir.iterdir() if p.suffix == ".parquet")
    ofile = next(p for p in odir.iterdir() if p.suffix == ".orc")
    assert read_any(spark, str(pfile)).count() == 2
    df = read_any(spark, str(ofile))
    assert df.count() == 2 and set(df.columns) == {"a", "b"}
    # magic-byte sniffing for extensionless files
    for f, expect in ((pfile, "parquet"), (ofile, "orc")):
        head = f.read_bytes()[:4096]
        assert sniff_format("datafile", head) == expect


def test_dedup_within_watermark_catches_ts_drifted_replays(spark, sf_dir, tmp_path):
    """A replayed event whose ts drifted by a few seconds is caught by
    dropDuplicatesWithinWatermark (key-only dedup) but MISSED by the
    classic dropDuplicates-with-ts-in-key — the exact gap the new
    operator exists for."""
    from indexlab_spark.session import load_tables
    from indexlab_spark.streaming.events import (
        dedup_stream,
        dedup_stream_within_watermark,
        run_stream_to_memory,
    )

    ev = load_tables(spark, sf_dir, ("events",))["events"].limit(100)
    drifted = ev.withColumn(
        "ts", F.col("ts") + F.expr("INTERVAL 3 SECONDS")
    )
    src = str(tmp_path / "drift_src")
    ev.unionByName(drifted).repartition(2).write.parquet(src)
    stream = spark.readStream.schema(ev.schema).parquet(src)
    run_stream_to_memory(
        dedup_stream_within_watermark(stream, ["event_id"]),
        "dedup_wm", output_mode="append",
    )
    got = spark.sql(
        "select count(distinct event_id) c, count(*) n from dedup_wm"
    ).collect()[0]
    assert got["c"] == got["n"] == 100  # drifted replays deduped
    stream2 = spark.readStream.schema(ev.schema).parquet(src)
    run_stream_to_memory(
        dedup_stream(stream2, ["event_id"]), "dedup_classic",
        output_mode="append",
    )
    classic = spark.sql("select count(*) n from dedup_classic").collect()[0]
    assert classic["n"] == 200  # classic key includes ts -> replays pass
    spark.catalog.dropTempView("dedup_wm")
    spark.catalog.dropTempView("dedup_classic")


def test_xls_rk_mulrk_label_record_branches(spark, tmp_path):
    """Reader branches the minimal writer never emits, exercised via a
    hand-built BIFF stream in the real OLE container: RK (int, int/100,
    float-bits, float/100), MULRK runs, and inline LABEL strings
    (compressed and wide)."""
    import struct as _s

    from indexlab_spark.sources.xls import (
        parse_xls,
        write_ole_workbook,
    )

    def rec(rt, body):
        return _s.pack("<HH", rt, len(body)) + body

    def rk_int(v):
        return ((v << 2) | 0x02) & 0xFFFFFFFF

    def rk_float(x):
        (q,) = _s.unpack("<Q", _s.pack("<d", x))
        return (q >> 32) & ~0x3

    bof_g = rec(0x0809, _s.pack("<HHHHII", 0x0600, 0x0005, 0, 0, 0, 0))
    bof_s = rec(0x0809, _s.pack("<HHHHII", 0x0600, 0x0010, 0, 0, 0, 0))
    name = b"S1"
    # header row via LABEL (inline): compressed 'a', 'b', 'c', 'd'
    sheet = bof_s
    for col, txt in enumerate([b"a", b"b", b"c", b"d"]):
        sheet += rec(
            0x0204,
            _s.pack("<HHHH", 0, col, 15, len(txt)) + b"\x00" + txt,
        )
    # row 1: RK variants
    sheet += rec(0x027E, _s.pack("<HHHI", 1, 0, 15, rk_int(7)))        # 7
    sheet += rec(0x027E, _s.pack("<HHHI", 1, 1, 15, rk_int(250) | 1))  # 2.5
    sheet += rec(0x027E, _s.pack("<HHHI", 1, 2, 15, rk_float(8.0)))    # 8.0
    sheet += rec(0x027E, _s.pack("<HHHI", 1, 3, 15, rk_float(500.0) | 1))  # 5.0
    # row 2: one MULRK covering cols 0-2 + a WIDE inline label at col 3
    mul = _s.pack("<HH", 2, 0)
    for v in (1, 2, 3):
        mul += _s.pack("<HI", 15, rk_int(v))
    mul += _s.pack("<H", 2)  # colLast
    sheet += rec(0x00BD, mul)
    wide = "é✓".encode("utf-16-le")
    sheet += rec(0x0204, _s.pack("<HHHH", 2, 3, 15, 2) + b"\x01" + wide)
    sheet += rec(0x000A, b"")

    bs_body = _s.pack("<IHBB", 0, 0, len(name), 0) + name
    glb = bof_g + rec(0x0085, bs_body) + rec(0x000A, b"")
    # patch lbPlyPos now that globals length is known
    glb = bof_g + rec(
        0x0085, _s.pack("<IHBB", len(glb), 0, len(name), 0) + name
    ) + rec(0x000A, b"")
    p = str(tmp_path / "branches.xls")
    write_ole_workbook(p, glb + sheet)
    header, rows = parse_xls(p)
    assert header == ["a", "b", "c", "d"]
    assert rows[0] == [7, 2.5, 8.0, 5.0]
    assert rows[1] == [1, 2, 3, "é✓"]


def test_stream_stream_left_outer_join_matches_batch(spark, sf_dir, tmp_path):
    """LEFT OUTER view⋈click: matched rows equal the inner join, and
    every unmatched view emits exactly one NULL-click row — but only
    after the watermark passes its expiry, so the drain plants two
    far-future sentinel files (one to advance the watermark, one to
    run the flushing batch under availableNow)."""
    import datetime as dt

    from indexlab_spark.session import load_tables
    from indexlab_spark.streaming.events import (
        run_stream_to_memory,
        view_click_left_join_stream,
    )

    ev = load_tables(spark, sf_dir, ("events",))["events"]
    src = str(tmp_path / "ssl_src")
    ev.coalesce(2).write.mode("overwrite").parquet(src)
    # watermark-advancing sentinels: a view+click pair far beyond
    # max(ts) + within + watermark, on a user id outside the data
    max_ts = ev.agg(F.max("ts").alias("m")).first()["m"]
    far = max_ts + dt.timedelta(days=30)
    far2 = far + dt.timedelta(seconds=1)
    sent = spark.createDataFrame(
        [(10_000_001, far, -1, "view", 0.0, "{}"),
         (10_000_002, far, -1, "click", 0.0, "{}")],
        ev.schema,
    )
    sent.coalesce(1).write.mode("append").parquet(src)
    sent2 = spark.createDataFrame(
        [(10_000_003, far2, -1, "view", 0.0, "{}"),
         (10_000_004, far2, -1, "click", 0.0, "{}")],
        ev.schema,
    )
    sent2.coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = view_click_left_join_stream(stream, within_seconds=600)
    run_stream_to_memory(out, "ssl_out", output_mode="append")
    rows = spark.sql("SELECT * FROM ssl_out").filter(
        F.col("user_id") != -1
    ).collect()
    got_matched = {
        (r["view_id"], r["click_id"]) for r in rows
        if r["click_id"] is not None
    }
    got_unmatched = {r["view_id"] for r in rows if r["click_id"] is None}

    v = ev.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("v_user"), F.col("event_id").alias("view_id"),
        F.col("ts").alias("view_ts"),
    )
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"), F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    batch = v.join(
        c,
        F.expr(
            "v_user = c_user AND click_ts > view_ts "
            "AND click_ts <= view_ts + interval 600 seconds"
        ),
        "left_outer",
    )
    want_matched = {
        (r["view_id"], r["click_id"])
        for r in batch.filter(F.col("click_id").isNotNull()).collect()
    }
    want_unmatched = {
        r["view_id"]
        for r in batch.filter(F.col("click_id").isNull()).collect()
    }
    assert got_matched == want_matched and len(want_matched) > 0
    assert got_unmatched == want_unmatched and len(want_unmatched) > 0
    # every real view emitted exactly once per match (or once if none)
    assert len(rows) == batch.count()
