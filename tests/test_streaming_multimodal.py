"""Streaming windows (tumbling/sliding/session, availableNow → memory
sink) and multimodal binary-column plumbing."""

from __future__ import annotations

import shutil

import pytest

from gramene_mongodb_spark.io import load_table
from gramene_mongodb_spark.operators import multimodal as MM
from gramene_mongodb_spark.streaming import windows as SW


@pytest.fixture(scope="module")
def events_stream_dir(spark, sf_dir, tmp_path_factory):
    # stage the events table as a parquet dir the file stream can watch
    # (load_table converts the nanos-as-long ts to a real timestamp)
    out = str(tmp_path_factory.mktemp("stream") / "events")
    load_table(spark, sf_dir, "events").write.parquet(out)
    yield out
    shutil.rmtree(out, ignore_errors=True)


def _run_to_memory(spark, sdf, name):
    q = (
        sdf.writeStream.format("memory")
        .queryName(name)
        .outputMode("append" if name != "x" else "complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.sql(f"SELECT * FROM {name}")


def test_tumbling_stream_matches_batch(spark, sf_dir, events_stream_dir):
    stream = SW.read_events_stream(spark, events_stream_dir, max_files_per_trigger=4)
    out = _run_to_memory(spark, SW.tumbling_counts(stream, watermark="0 seconds"), "tumbling_t")
    batch = (
        load_table(spark, sf_dir, "events")
        .groupBy(
            __import__("pyspark.sql.functions", fromlist=["window"]).window("ts", "1 hour"),
            "event_type",
        )
        .count()
    )
    # append-mode emits only watermark-finalized windows; with availableNow
    # + 0s watermark every window except the open last one is final
    assert out.count() >= batch.count() - 5
    total_stream = out.agg({"n_events": "sum"}).collect()[0][0]
    assert total_stream > 0


def test_session_stream_runs(spark, events_stream_dir):
    stream = SW.read_events_stream(spark, events_stream_dir)
    out = _run_to_memory(
        spark, SW.session_aggregates(stream, gap="30 minutes", watermark="0 seconds"),
        "sessions_t",
    )
    rows = out.collect()
    assert len(rows) > 0
    assert all(r.session_end >= r.session_start for r in rows)


def test_sliding_stream_runs(spark, events_stream_dir):
    stream = SW.read_events_stream(spark, events_stream_dir)
    out = _run_to_memory(spark, SW.sliding_rates(stream, watermark="0 seconds"), "sliding_t")
    assert out.count() > 0


def test_multimodal_features(spark):
    media = spark.createDataFrame(
        [(1, b"\x89PNG fake bytes"), (2, b"RIFF fake wav"), (3, b"\x89PNG fake bytes")],
        "media_id BIGINT, payload BINARY",
    )
    feats = {r.media_id: r for r in MM.extract_features(media).collect()}
    assert len(feats[1].features) == MM.FEATURE_DIM
    assert feats[1].sha256 == feats[3].sha256  # deterministic
    assert feats[1].features == feats[3].features
    assert feats[1].sha256 != feats[2].sha256
    assert feats[2].n_bytes == 13


def test_multimodal_real_codec_stubbed(spark):
    media = spark.createDataFrame([(1, b"x")], "media_id BIGINT, payload BINARY")
    with pytest.raises(NotImplementedError):
        MM.extract_features(media, decoder="pillow")


def test_frame_sampling_grid(spark):
    media = spark.createDataFrame(
        [(1, ("video", "mp4", 640, 480, 3500, None)), (2, ("image", "png", 8, 8, None, None))],
        "media_id BIGINT, meta STRUCT<media_type STRING, format STRING, "
        "width INT, height INT, duration_ms BIGINT, sample_rate INT>",
    )
    frames = MM.sample_frames(media.filter("meta.media_type = 'video'"), every_ms=1000)
    got = sorted(r.frame_ms for r in frames.collect())
    assert got == [0, 1000, 2000, 3000]


def test_stream_dedup_drops_replayed_rows(spark, sf_dir, tmp_path):
    """dedup_stream: an at-least-once source (the same file listed twice)
    yields each event_id exactly once downstream."""
    import shutil

    from pyspark.sql import functions as F

    src = str(tmp_path / "dup_events")
    ev = load_table(spark, sf_dir, "events").limit(200)
    ev.write.parquet(src)
    # replay: copy one part file so some rows arrive twice
    import glob, os
    part = glob.glob(os.path.join(src, "part-*"))[0]
    shutil.copy(part, os.path.join(src, "replay-" + os.path.basename(part) + ".parquet"))

    stream = SW.read_events_stream(spark, src)
    deduped = SW.dedup_stream(stream, ["event_id"], watermark_delay="10 minutes")
    out = _run_to_memory(spark, deduped, "dedup_t")
    n_distinct_src = ev.select("event_id").distinct().count()
    ids = [r.event_id for r in out.select("event_id").collect()]
    assert len(ids) == len(set(ids))          # no duplicates emitted
    assert len(set(ids)) >= n_distinct_src    # nothing lost either


def test_resize_images_plumbing(spark):
    media = spark.createDataFrame(
        [(1, b"\x89PNG fake bytes"), (2, b"\x89PNG other image")],
        "media_id BIGINT, payload BINARY",
    )
    out = {r.media_id: r for r in MM.resize_images(media, 64, 32).collect()}
    assert out[1].width == 64 and out[1].height == 32
    assert out[1].n_bytes == (64 * 32) // 64          # size ∝ target dims
    assert out[1].payload != out[2].payload           # content-derived
    # deterministic: same input → same resized bytes
    again = {r.media_id: r for r in MM.resize_images(media, 64, 32).collect()}
    assert again[1].payload == out[1].payload
    with pytest.raises(NotImplementedError):
        MM.resize_images(media, 8, 8, resampler="vips")


def test_stream_stream_attribution_matches_batch(spark, sf_dir, events_stream_dir):
    """The stream-stream attribution join emits exactly the pairs the
    identical batch join produces (availableNow drains the backlog and
    the final watermark passes every buffered row)."""
    batch_ev = load_table(spark, sf_dir, "events")
    b_clicks = batch_ev.filter("event_type = 'click'")
    b_purch = batch_ev.filter("event_type = 'purchase'")
    expected = {
        (r.click_id, r.purchase_id)
        for r in SW.attribute_conversions(b_clicks, b_purch).collect()
    }
    assert expected  # the synthetic events contain attributable pairs

    stream = SW.read_events_stream(spark, events_stream_dir)
    s_out = SW.attribute_conversions(
        stream.filter("event_type = 'click'"),
        stream.filter("event_type = 'purchase'"),
    )
    got_df = _run_to_memory(spark, s_out, "attrib_t")
    got = {(r.click_id, r.purchase_id) for r in got_df.collect()}
    # append mode emits joined rows once both watermarks allow; with
    # availableNow + bounded input the inner join emits every match
    assert got == expected


def test_parse_media_header_real_formats():
    import io
    import struct
    import wave

    # PNG: header parse matches the requested dimensions
    png = MM.parse_media_header(MM.make_png(640, 480))
    assert (png["format"], png["width"], png["height"]) == ("png", 640, 480)

    # WAV: cross-checked against the stdlib wave module on the same bytes
    raw = MM.make_wav(44100, 44100, channels=2)
    wav = MM.parse_media_header(raw)
    ref = wave.open(io.BytesIO(raw))
    assert wav["sample_rate"] == ref.getframerate() == 44100
    assert wav["duration_ms"] == ref.getnframes() * 1000 // ref.getframerate() == 1000

    # GIF logical screen
    gif = b"GIF89a" + struct.pack("<HH", 320, 200) + b"\x00" * 10
    got = MM.parse_media_header(gif)
    assert (got["format"], got["width"], got["height"]) == ("gif", 320, 200)

    # JPEG: APP0 skipped by declared length, SOF0 yields dimensions
    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x02\x00" + b"\x00" * 6
    sof = b"\xff\xc0" + struct.pack(">H", 17) + b"\x08" + struct.pack(">HH", 99, 123) + b"\x03" + b"\x00" * 9
    got = MM.parse_media_header(b"\xff\xd8" + app0 + sof)
    assert (got["format"], got["width"], got["height"]) == ("jpeg", 123, 99)

    # garbage and truncated payloads → None, never an exception
    assert MM.parse_media_header(b"garbage") is None
    assert MM.parse_media_header(b"\x89PNG\r\n\x1a\n\x00\x00") is None


def test_probe_metadata_through_spark(spark):
    rows = [
        (1, MM.make_png(32, 16)),
        (2, MM.make_wav(8000, 4000)),
        (3, b"not media"),
        (4, None),
    ]
    df = spark.createDataFrame(rows, "media_id BIGINT, payload BINARY")
    got = {r["media_id"]: r["meta"] for r in MM.probe_metadata(df).collect()}
    assert got[1]["format"] == "png" and got[1]["width"] == 32 and got[1]["height"] == 16
    assert got[2]["format"] == "wav" and got[2]["sample_rate"] == 8000
    assert got[2]["duration_ms"] == 500
    assert got[3] is None and got[4] is None
