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

    # PPM corrupt header: 0xB2 is a Latin-1 superscript digit that
    # chr().isdigit() accepts but int(bytes) rejects — must quarantine
    # to None, not raise (one bad payload would fail the whole task)
    assert MM.parse_media_header(b"P6\xb2\xb2 \xb2 255 ") is None
    # truncated RIFF/WAVE fmt chunk → struct.error path → None
    assert MM.parse_media_header(b"RIFF\x10\x00\x00\x00WAVEfmt \x10\x00\x00\x00\x01") is None


def test_parse_media_header_mp3():
    """MP3 header probe (round-9): frame-header field decode, syncsafe
    ID3v2 skip, CBR duration estimate — all against spec arithmetic."""
    # 10 frames at 128 kbps / 44100 Hz: frame_len = 144000*128//44100 =
    # 417 bytes; duration = 4170*8//128 = 260 ms
    raw = MM.make_mp3(bitrate_kbps=128, sample_rate=44100, n_frames=10)
    got = MM.parse_media_header(raw)
    assert (got["media_type"], got["format"]) == ("audio", "mp3")
    assert got["sample_rate"] == 44100
    assert len(raw) == 4170 and got["duration_ms"] == 4170 * 8 // 128 == 260
    assert got["width"] is None and got["height"] is None

    # ID3v2 tag: syncsafe size (200 = 0x00 0x00 0x01 0x48) is skipped
    # and excluded from the CBR byte count — same duration as untagged
    tagged = MM.make_mp3(bitrate_kbps=128, sample_rate=44100, n_frames=10, id3_size=200)
    got_t = MM.parse_media_header(tagged)
    assert len(tagged) == 4170 + 210
    assert got_t["duration_ms"] == 260 and got_t["sample_rate"] == 44100

    # other bitrate/rate (MPEG1 table rows) — 192 kbps / 32000 Hz
    raw2 = MM.make_mp3(bitrate_kbps=192, sample_rate=32000, n_frames=3)
    got2 = MM.parse_media_header(raw2)
    flen = 144000 * 192 // 32000
    assert got2["sample_rate"] == 32000
    assert got2["duration_ms"] == 3 * flen * 8 // 192

    # reserved/invalid fields quarantine to None: bad version bits (01),
    # free-format bitrate (0), reserved sample-rate index (3)
    assert MM.parse_media_header(b"\xff\xeb\x94\x00" + b"\x00" * 40) is None
    assert MM.parse_media_header(b"\xff\xfb\x04\x00" + b"\x00" * 40) is None
    assert MM.parse_media_header(b"\xff\xfb\x9c\x00" + b"\x00" * 40) is None
    # ID3 tag with nothing after it → None (no frame sync)
    assert MM.parse_media_header(b"ID3\x04\x00\x00\x00\x00\x00\x05" + b"\x00" * 5) is None


def test_parse_media_header_mp4():
    """ISO-BMFF box walk (round-11): mvhd duration arithmetic across
    version-0/1 layouts, 16.16 tkhd dims, audio-trak (0x0) skip, and
    quarantine on truncated/degenerate boxes."""
    import struct

    got = MM.parse_media_header(MM.make_mp4(1920, 1080, 9000, timescale=600))
    assert (got["media_type"], got["format"]) == ("video", "mp4")
    assert (got["width"], got["height"]) == (1920, 1080)
    assert got["duration_ms"] == 9000 * 1000 // 600 == 15000
    assert got["sample_rate"] is None

    # version-1 mvhd (64-bit times) and an audio trak ahead of the video
    # one — dims must come from the first NON-zero trak
    got = MM.parse_media_header(
        MM.make_mp4(640, 360, 123456, timescale=90000,
                    audio_trak_first=True, wide_mvhd=True)
    )
    assert (got["width"], got["height"]) == (640, 360)
    assert got["duration_ms"] == 123456 * 1000 // 90000

    # largesize (size==1) top-level box before moov is stepped over
    raw = MM.make_mp4(64, 48, 600)
    free_body = b"\x00" * 4
    large = (
        struct.pack(">I", 1) + b"free" + struct.pack(">Q", 16 + len(free_body))
        + free_body
    )
    ftyp_end = struct.unpack(">I", raw[:4])[0]
    spliced = raw[:ftyp_end] + large + raw[ftyp_end:]
    got = MM.parse_media_header(spliced)
    assert (got["width"], got["height"], got["duration_ms"]) == (64, 48, 1000)

    # truncated mid-box, ftyp-only (no moov), and a nonsense size → None
    assert MM.parse_media_header(raw[:20]) is None
    assert MM.parse_media_header(b"\x00\x00\x00\x08ftyp") is None
    bad = raw[:ftyp_end] + struct.pack(">I", 3) + b"moov"
    assert MM.parse_media_header(bad) is None


def test_make_jpeg_roundtrip():
    got = MM.parse_media_header(MM.make_jpeg(321, 77))
    assert (got["media_type"], got["format"]) == ("image", "jpeg")
    assert (got["width"], got["height"]) == (321, 77)


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


# --------------------------------------------------------------------------
# REAL pixel codec (PNG zlib+unfilter, BMP, PPM) — stdlib only
# --------------------------------------------------------------------------


def test_png_roundtrip_all_channel_counts():
    import random

    rng = random.Random(42)
    for channels in (1, 2, 3, 4):
        w, h = 7, 5
        px = bytes(rng.randrange(256) for _ in range(w * h * channels))
        got = MM.decode_pixels(MM.encode_png(w, h, px, channels))
        assert got == (w, h, channels, px)


def test_png_unfilter_every_filter_type():
    """Forward-filter known pixels with each of the five PNG filter types,
    build a spec-valid PNG by hand, and require decode to recover the
    original — exercises Sub/Up/Average/Paeth, not just our encoder's
    filter-0 output."""
    import random
    import struct
    import zlib

    rng = random.Random(7)
    w, h, c = 6, 4, 3
    px = [rng.randrange(256) for _ in range(w * h * c)]
    stride = w * c

    def paeth(a, b, cc):
        p = a + b - cc
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
        return a if pa <= pb and pa <= pc else (b if pb <= pc else cc)

    for ftype in range(5):
        raw = bytearray()
        prev = [0] * stride
        for y in range(h):
            row = px[y * stride : (y + 1) * stride]
            raw.append(ftype)
            for i in range(stride):
                left = row[i - c] if i >= c else 0
                up = prev[i]
                up_left = prev[i - c] if i >= c else 0
                if ftype == 0:
                    f = row[i]
                elif ftype == 1:
                    f = (row[i] - left) & 0xFF
                elif ftype == 2:
                    f = (row[i] - up) & 0xFF
                elif ftype == 3:
                    f = (row[i] - ((left + up) >> 1)) & 0xFF
                else:
                    f = (row[i] - paeth(left, up, up_left)) & 0xFF
                raw.append(f)
            prev = row
        ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
        png = (
            b"\x89PNG\r\n\x1a\n"
            + MM._png_chunk(b"IHDR", ihdr)
            + MM._png_chunk(b"IDAT", zlib.compress(bytes(raw)))
            + MM._png_chunk(b"IEND", b"")
        )
        gw, gh, gc, gpx = MM.decode_pixels(png)
        assert (gw, gh, gc) == (w, h, c), ftype
        assert list(gpx) == px, f"filter type {ftype} mis-decoded"


def test_bmp_and_ppm_decode():
    import struct

    # 3x2 24-bit BMP, bottom-up, row padding to 4 bytes (3*3=9 -> pad 3)
    rgb_rows = [
        [(255, 0, 0), (0, 255, 0), (0, 0, 255)],   # top row
        [(1, 2, 3), (4, 5, 6), (7, 8, 9)],          # bottom row
    ]
    stride_pad = b"\x00" * 3
    pixel_data = b""
    for row in reversed(rgb_rows):  # BMP stores bottom-up
        for r, g, b in row:
            pixel_data += bytes((b, g, r))           # BGR on disk
        pixel_data += stride_pad
    off = 14 + 40
    hdr = b"BM" + struct.pack("<IHHI", off + len(pixel_data), 0, 0, off)
    dib = struct.pack("<IiiHHIIiiII", 40, 3, 2, 1, 24, 0, len(pixel_data), 0, 0, 0, 0)
    w, h, c, px = MM.decode_pixels(hdr + dib + pixel_data)
    assert (w, h, c) == (3, 2, 3)
    flat = [tuple(px[3 * i : 3 * i + 3]) for i in range(6)]
    assert flat == [p for row in rgb_rows for p in row]  # top-down RGB

    # PPM P6 with a comment
    body = bytes(range(2 * 2 * 3))
    ppm = b"P6\n# test comment\n2 2\n255\n" + body
    assert MM.decode_pixels(ppm) == (2, 2, 3, body)


def test_pixel_resample_identity_and_downsample():
    # identity resize returns the same pixels
    px = bytes(range(4 * 2 * 3))
    png = MM.encode_png(4, 2, px, 3)
    same = MM.decode_pixels(MM.pixel_resample(png, 4, 2))
    assert same == (4, 2, 3, px)
    # 2x downsample picks pixels (0,0),(2,0),(0,1)... per the floor grid
    down = MM.decode_pixels(MM.pixel_resample(png, 2, 1))
    assert down[:3] == (2, 1, 3)
    expect = px[0:3] + px[6:9]  # sx = (0*4)//2=0, (1*4)//2=2 at sy=0
    assert down[3] == expect


def test_pixel_stats_through_spark(spark):
    gray = MM.encode_png(3, 1, bytes([10, 20, 30]), 1)
    rgb = MM.encode_png(2, 2, bytes(range(12)), 3)
    df = spark.createDataFrame(
        [(1, gray), (2, rgb)], "media_id BIGINT, payload BINARY"
    )
    got = {r.media_id: r for r in MM.pixel_stats(df).collect()}
    assert got[1].sum_r == 60 and got[1].sum_g is None and got[1].channels == 1
    # rgb sums: channel0 = 0+3+6+9, channel1 = 1+4+7+10, channel2 = 2+5+8+11
    assert (got[2].sum_r, got[2].sum_g, got[2].sum_b) == (18, 22, 26)


def test_decode_pixels_rejects_unsupported():
    with pytest.raises(ValueError):
        MM.decode_pixels(b"garbage")
    # palette PNG (color type 3) is declared unsupported, not mis-decoded
    import struct
    import zlib

    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 3, 0, 0, 0)
    png = (
        b"\x89PNG\r\n\x1a\n"
        + MM._png_chunk(b"IHDR", ihdr)
        + MM._png_chunk(b"IDAT", zlib.compress(b"\x00" * 6))
        + MM._png_chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError):
        MM.decode_pixels(png)


def test_wav_ramp_roundtrip_and_audio_stats(spark):
    # decoder recovers the exact ramp the builder wrote
    raw = MM.make_wav_ramp(8000, 100, seed=3)
    rate, channels, samples = MM.decode_wav_samples(raw)
    assert (rate, channels, len(samples)) == (8000, 1, 100)
    assert samples[0] == (3 % 65536) - 32768
    assert samples[1] == (7 + 3) % 65536 - 32768
    # cross-check against the stdlib wave module on the same bytes
    import io
    import wave

    ref = wave.open(io.BytesIO(raw))
    assert ref.getframerate() == 8000 and ref.getnframes() == 100
    # through Spark: exact integer stats
    df = spark.createDataFrame([(1, raw)], "media_id BIGINT, payload BINARY")
    r = MM.audio_stats(df).collect()[0]
    expect = [((i * 7 + 3) % 65536) - 32768 for i in range(100)]
    assert (r.n_samples, r.sum_samples) == (100, sum(expect))
    assert (r.min_sample, r.max_sample) == (min(expect), max(expect))


def test_decode_wav_samples_rejects_non_pcm():
    import struct

    fmt = struct.pack("<HHIIHH", 85, 1, 44100, 88200, 2, 16)  # codec 85 = MP3
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", 4) + b"\x00" * 4
    payload = b"RIFF" + struct.pack("<I", len(body)) + body
    with pytest.raises(ValueError):
        MM.decode_wav_samples(payload)
    with pytest.raises(ValueError):
        MM.decode_wav_samples(b"not audio at all")


def test_encode_bmp_ppm_roundtrip():
    px = bytes(range(5 * 3 * 3))  # 5x3 RGB
    assert MM.decode_pixels(MM.encode_bmp(5, 3, px)) == (5, 3, 3, px)
    assert MM.decode_pixels(MM.encode_ppm(5, 3, px)) == (5, 3, 3, px)
    # width 4: BMP stride needs no padding — exercise both branches
    px4 = bytes(range(4 * 2 * 3))
    assert MM.decode_pixels(MM.encode_bmp(4, 2, px4)) == (4, 2, 3, px4)


def test_tumbling_foreachbatch_exact_batch_equality(spark, sf_dir, tmp_path):
    """A REAL incremental StreamingQuery (file source split across
    multiple micro-batches via maxFilesPerTrigger + foreachBatch sink)
    must converge to EXACTLY the batch twin's aggregate — not the
    looser >=count-5 check the append-mode test settles for. Update
    mode + a beyond-horizon watermark means no row is ever dropped, so
    last-write-wins per (window, event_type) is the final aggregate."""
    from pyspark.sql import functions as F

    staged = str(tmp_path / "events_mb")
    load_table(spark, sf_dir, "events").repartition(6).write.parquet(staged)

    stream = SW.read_events_stream(spark, staged, max_files_per_trigger=2)
    agg = SW.tumbling_counts(stream, watermark="366 days")

    state: dict = {}
    epochs: list[int] = []

    def sink(df, epoch_id):
        rows = df.collect()
        if rows:
            epochs.append(epoch_id)
        for r in rows:
            state[(r.window_start, r.window_end, r.event_type)] = (
                r.n_events,
                r.total_value,
            )

    q = (
        agg.writeStream.foreachBatch(sink)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    assert len(epochs) >= 2, f"expected multiple micro-batches, got {epochs}"

    expect = {
        (r.window_start, r.window_end, r.event_type): (r.n_events, r.total_value)
        for r in (
            load_table(spark, sf_dir, "events")
            .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                F.sum("value").alias("total_value"),
            )
            .select(
                F.col("w.start").alias("window_start"),
                F.col("w.end").alias("window_end"),
                "event_type",
                "n_events",
                "total_value",
            )
        ).collect()
    }
    assert state.keys() == expect.keys()
    for k, (n, tv) in expect.items():
        sn, stv = state[k]
        assert sn == n, k
        # float sum order differs between incremental and one-shot plans
        assert abs(stv - tv) < 1e-6 * max(1.0, abs(tv)), k


def test_session_stream_foreachbatch_matches_batch_sessionize(spark, sf_dir, tmp_path):
    """Native session_window streaming (the A3 twin) driven through a
    real incremental micro-batch run. Session-window aggregation
    rejects update mode (sessions merge), so run complete mode: each
    epoch re-emits the full merged state and the LAST epoch must equal
    the batch session_window aggregation exactly."""
    from pyspark.sql import functions as F

    staged = str(tmp_path / "events_sess")
    load_table(spark, sf_dir, "events").repartition(4).write.parquet(staged)

    stream = SW.read_events_stream(spark, staged, max_files_per_trigger=2)
    agg = SW.session_aggregates(stream, gap="30 minutes", watermark="366 days")

    finals: list[dict] = []

    def sink(df, epoch_id):
        finals.append(
            {
                (r.user_id, r.session_start): (
                    r.session_end,
                    r.n_events,
                    r.session_value,
                )
                for r in df.collect()
            }
        )

    q = (
        agg.writeStream.foreachBatch(sink)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    assert len(finals) >= 2, "expected multiple micro-batches"
    state = finals[-1]

    expect = {
        (r.user_id, r.session_start): (r.session_end, r.n_events, r.session_value)
        for r in (
            load_table(spark, sf_dir, "events")
            .groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                F.sum("value").alias("session_value"),
            )
            .select(
                "user_id",
                F.col("w.start").alias("session_start"),
                F.col("w.end").alias("session_end"),
                "n_events",
                "session_value",
            )
        ).collect()
    }
    assert state.keys() == expect.keys()
    for k, (end, n, sv) in expect.items():
        send, sn, ssv = state[k]
        assert (send, sn) == (end, n), k
        assert abs(ssv - sv) < 1e-6 * max(1.0, abs(sv)), k


def test_incremental_agg_maintenance_via_foreachbatch(spark, sf_dir, tmp_path):
    """relational.merge_partial_aggregates driven by a REAL
    StreamingQuery: each micro-batch's per-user partials (sum, count,
    min, max in int64 micros) are folded into an accumulating state
    table inside foreachBatch; after the stream drains, the state must
    EQUAL the direct aggregate over all events — the materialized-view
    maintenance contract exercised through the actual streaming path,
    not just the any-split property test."""
    from pyspark.sql import functions as F

    from gramene_mongodb_spark.operators.relational import (
        merge_partial_aggregates,
    )

    staged = str(tmp_path / "events_inc")
    load_table(spark, sf_dir, "events").repartition(6).write.parquet(staged)
    schema = spark.read.parquet(staged).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 2)
        .parquet(staged)
    )
    quant = stream.select(
        "user_id",
        F.round(F.col("value") * 1000000).cast("long").alias("vm"),
    )

    def partial(df):
        return df.groupBy("user_id").agg(
            F.sum("vm").alias("s"),
            F.count(F.lit(1)).cast("long").alias("c"),
            F.min("vm").alias("mn"),
            F.max("vm").alias("mx"),
        )

    state = {"df": None}
    epochs: list[int] = []

    def sink(df, epoch_id):
        if df.isEmpty():
            return
        epochs.append(epoch_id)
        part = partial(df).localCheckpoint(eager=True)
        if state["df"] is None:
            state["df"] = part
        else:
            state["df"] = merge_partial_aggregates(
                state["df"], part, ["user_id"],
                sums=["s"], counts=["c"], mins=["mn"], maxs=["mx"],
            ).localCheckpoint(eager=True)

    q = (
        quant.writeStream.foreachBatch(sink)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    assert len(epochs) >= 2, f"expected multiple micro-batches, got {epochs}"
    got = {r.user_id: (r.s, r.c, r.mn, r.mx) for r in state["df"].collect()}
    direct = partial(
        load_table(spark, sf_dir, "events").select(
            "user_id",
            F.round(F.col("value") * 1000000).cast("long").alias("vm"),
        )
    )
    want = {r.user_id: (r.s, r.c, r.mn, r.mx) for r in direct.collect()}
    assert got == want  # integer micros: exact, no float tolerance needed


def test_quality_gate_stream_foreachbatch_matches_batch(spark, sf_dir, tmp_path):
    """The attrition funnel (pipeline_quality_gate) run INCREMENTALLY:
    documents arrive in real micro-batches (maxFilesPerTrigger=2 over a
    6-file staging), each epoch computes the four gate signals map-side
    and emits per-source partial funnel counts, and a foreachBatch sink
    merges partials by addition — counts are trivially mergeable, which
    is exactly why a curation funnel can run as a stream. The merged
    state must equal the one-shot batch entry EXACTLY (all-integer, so
    no float-order tolerance needed)."""
    from pyspark.sql import functions as F

    from gramene_mongodb_spark.catalog import REGISTRY
    from gramene_mongodb_spark.operators import textops as T

    staged = str(tmp_path / "docs_mb")
    load_table(spark, sf_dir, "documents").repartition(6).write.parquet(staged)

    stream = spark.readStream.schema(
        "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT"
    ).option("maxFilesPerTrigger", "2").parquet(staged)

    s = T.classifier_score(T.token_stats(stream))
    f1 = F.col("lang") == "en"
    f2 = f1 & F.col("n_tokens").cast("long").between(10, 100000)
    f3 = f2 & (F.col("punct_ratio") <= 0.2)
    f4 = f3 & (F.col("clf_score") >= 0)
    flagged = s.select(
        "source",
        f1.cast("long").alias("after_lang"),
        f2.cast("long").alias("after_len"),
        f3.cast("long").alias("after_punct"),
        f4.cast("long").alias("kept"),
    )

    state: dict = {}
    epochs: list[int] = []

    def sink(df, epoch_id):
        # per-epoch partial funnel counts, merged into state by addition
        rows = (
            df.groupBy("source")
            .agg(
                F.count(F.lit(1)).alias("n_docs"),
                F.sum("after_lang").alias("after_lang"),
                F.sum("after_len").alias("after_len"),
                F.sum("after_punct").alias("after_punct"),
                F.sum("kept").alias("kept"),
            )
            .collect()
        )
        if rows:
            epochs.append(epoch_id)
        for r in rows:
            prev = state.get(r.source, (0, 0, 0, 0, 0))
            state[r.source] = tuple(
                p + v
                for p, v in zip(
                    prev, (r.n_docs, r.after_lang, r.after_len, r.after_punct, r.kept)
                )
            )

    q = (
        flagged.writeStream.foreachBatch(sink)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    assert len(epochs) >= 2, f"expected multiple micro-batches, got {epochs}"

    expect = {
        r.source: (r.n_docs, r.after_lang, r.after_len, r.after_punct, r.kept)
        for r in REGISTRY["pipeline_quality_gate"].fn(spark, sf_dir).collect()
    }
    assert state == expect


def test_quantile_sketch_stream_foreachbatch_matches_batch(spark, sf_dir, tmp_path):
    """The mergeable quantile sketch maintained INCREMENTALLY: order
    files arrive in real micro-batches, each epoch emits its partial
    value histogram, and the sink merges by addition (the sketch's
    commutative-monoid contract). Quantiles read off the final merged
    state must EQUAL the one-shot batch sketch's reads — integer-exact,
    no tolerance."""
    from pyspark.sql import functions as F

    from gramene_mongodb_spark.operators.relational import (
        histogram_quantiles,
        value_histogram_sketch,
    )

    staged = str(tmp_path / "orders_mb")
    load_table(spark, sf_dir, "orders").select(
        "o_orderkey", F.floor("o_totalprice").cast("long").alias("val")
    ).repartition(6).write.parquet(staged)

    stream = spark.readStream.schema("o_orderkey BIGINT, val BIGINT").option(
        "maxFilesPerTrigger", "2"
    ).parquet(staged)

    state: dict[int, int] = {}
    epochs: list[int] = []

    def sink(df, epoch_id):
        rows = value_histogram_sketch(df, "val", 100).collect()
        if rows:
            epochs.append(epoch_id)
        for r in rows:
            state[r.bucket] = state.get(r.bucket, 0) + r.cnt

    q = (
        stream.writeStream.foreachBatch(sink)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    assert len(epochs) >= 2, f"expected multiple micro-batches, got {epochs}"

    batch = load_table(spark, sf_dir, "orders").select(
        F.floor("o_totalprice").cast("long").alias("val")
    )
    expect_hist = {
        r.bucket: r.cnt for r in value_histogram_sketch(batch, "val", 100).collect()
    }
    assert state == expect_hist

    merged = spark.createDataFrame(
        [(b, c) for b, c in state.items()], "bucket: long, cnt: long"
    )
    got = {r.q: r.est for r in histogram_quantiles(merged, [50, 90, 99], 100).collect()}
    want = {
        r.q: r.est
        for r in histogram_quantiles(
            value_histogram_sketch(batch, "val", 100), [50, 90, 99], 100
        ).collect()
    }
    assert got == want


def test_perceptual_hash_matches_reference_and_survives_noise(spark):
    """aHash equals a pure-python replay (floor grid, gray //3,
    floor-mean strict threshold, row-major bit packing) through all
    three real codecs, is container-invariant, and unifies a one-pixel
    perturbation that changes the exact channel sums."""
    import numpy as np

    rng = np.random.RandomState(7)
    base = rng.randint(0, 256, size=(12, 16, 3)).astype(np.uint8)
    bumped = base.copy()
    bumped[0, 0, 0] = (int(bumped[0, 0, 0]) + 1) % 256

    rows = [
        (1, MM.encode_png(16, 12, base.tobytes(), 3)),
        (2, MM.encode_bmp(16, 12, base.tobytes())),
        (3, MM.encode_ppm(16, 12, base.tobytes())),
        (4, MM.encode_png(16, 12, bumped.tobytes(), 3)),
    ]
    df = spark.createDataFrame(rows, "media_id BIGINT, payload BINARY")
    got = {r.media_id: r.phash for r in MM.perceptual_hash(df, 8, 6).collect()}

    def ref(img):
        h, w, _ = img.shape
        gray = np.zeros(48, dtype=np.int64)
        for j in range(48):
            y, x = divmod(j, 8)
            sx, sy = (x * w) // 8, (y * h) // 6
            gray[j] = int(img[sy, sx].astype(np.int64).sum()) // 3
        mean = int(gray.sum()) // 48
        return sum(1 << j for j in range(48) if gray[j] > mean)

    assert got[1] == ref(base)
    assert got[1] == got[2] == got[3]  # container-invariant
    assert got[4] == ref(bumped)
    # the bump changed the exact sums but (for this fixture) not the hash
    sums = {r.media_id: r.sum_r for r in MM.pixel_stats(df).collect()}
    assert sums[4] == sums[1] + 1
    assert bin(got[1] ^ got[4]).count("1") <= 1


def test_perceptual_hash_rejects_oversized_grid(spark):
    with pytest.raises(ValueError):
        MM.perceptual_hash(spark.range(1), 8, 8)


def test_shot_boundaries_segments_by_hamming_cuts(spark):
    """Three true shots (distinct random images), three frames each with
    a one-pixel within-shot jitter, two videos interleaved — shots must
    recover the true structure, and mixed containers must not matter."""
    import numpy as np

    rng = np.random.RandomState(11)
    scenes = [rng.randint(0, 256, size=(12, 16, 3)).astype(np.uint8) for _ in range(3)]
    encoders = [
        lambda a: MM.encode_png(16, 12, a.tobytes(), 3),
        lambda a: MM.encode_bmp(16, 12, a.tobytes()),
        lambda a: MM.encode_ppm(16, 12, a.tobytes()),
    ]
    rows = []
    for vid in (10, 20):
        for t in range(9):
            img = scenes[t // 3].copy()
            img[t % 12, t % 16, 0] = (int(img[t % 12, t % 16, 0]) + 1) % 256
            rows.append((vid, t, encoders[t % 3](img)))
    df = spark.createDataFrame(rows, "media_id BIGINT, frame_idx BIGINT, payload BINARY")
    out = MM.shot_boundaries(df, threshold_bits=4).collect()
    by_vid = {}
    for r in out:
        by_vid.setdefault(r.media_id, []).append(
            (r.shot_id, r.start_frame, r.end_frame, r.n_frames)
        )
    for vid in (10, 20):
        got = sorted(by_vid[vid])
        assert got == [(1, 0, 2, 3), (2, 3, 5, 3), (3, 6, 8, 3)], got
    # first shot opens with cut_bits 0; later shots with a real jump
    firsts = [r for r in out if r.shot_id == 1]
    others = [r for r in out if r.shot_id > 1]
    assert all(r.cut_bits == 0 for r in firsts)
    assert all(r.cut_bits > 4 for r in others)


def test_shot_boundaries_empty(spark):
    df = spark.createDataFrame([], "media_id BIGINT, frame_idx BIGINT, payload BINARY")
    assert MM.shot_boundaries(df).count() == 0


def test_audio_segments_splits_on_silence(spark):
    """Two recordings with known loud/quiet frame structure through real
    WAV bytes: islands of consecutive active frames become segments,
    sub-threshold frames split them, and a trailing partial frame is
    dropped by the frame fold."""
    import numpy as np

    def wav(frame_amps, tail_samples=0):
        # one 4-sample frame per amplitude; constant |amplitude| == energy
        samples = np.repeat(np.asarray(frame_amps, dtype=np.int64), 4)
        if tail_samples:
            samples = np.concatenate([samples, np.full(tail_samples, 9999)])
        return MM.encode_wav(16000, samples.astype("<i2"))

    rows = [
        # frames: loud loud quiet loud -> segments [0,1] and [3,3]
        (1, wav([500, 700, 3, 900], tail_samples=3)),
        # all quiet -> no segments at all
        (2, wav([3, 2, 1])),
    ]
    df = spark.createDataFrame(rows, "media_id BIGINT, payload BINARY")
    out = MM.audio_segments(df, threshold=100, frame_len=4).collect()
    got = sorted(
        (r.media_id, r.segment_id, r.start_frame, r.end_frame, r.n_frames, r.peak_energy)
        for r in out
    )
    assert got == [(1, 1, 0, 1, 2, 700), (1, 2, 3, 3, 1, 900)], got


def test_frame_energy_matches_numpy_reference(spark):
    import numpy as np

    rng = np.random.RandomState(5)
    samples = rng.randint(-32768, 32768, size=23).astype(np.int64)
    df = spark.createDataFrame(
        [(7, MM.encode_wav(8000, samples.astype("<i2")))],
        "media_id BIGINT, payload BINARY",
    )
    out = {r.frame_idx: r.energy for r in MM.frame_energy(df, frame_len=5).collect()}
    expect = {
        f: int(np.abs(samples[f * 5 : (f + 1) * 5]).sum()) // 5 for f in range(4)
    }
    assert out == expect


def test_audio_segments_empty(spark):
    df = spark.createDataFrame([], "media_id BIGINT, payload BINARY")
    assert MM.audio_segments(df).count() == 0


def test_exactly_once_sink_replay_is_noop(spark, sf_dir, tmp_path):
    """The idempotent batch writer must turn at-least-once replays into
    exactly-once results: re-delivering a committed batch_id is a
    skip; a torn batch (no marker) is overwritten whole; the committed
    filter hides the torn one from readers."""
    import os

    from gramene_mongodb_spark.io import load_table
    from gramene_mongodb_spark.streaming import sinks

    out = str(tmp_path / "sink")
    events = load_table(spark, sf_dir, "events").filter("user_id < 8").coalesce(1)

    # batch 0 delivered, then REPLAYED (the post-crash at-least-once case)
    assert sinks.write_batch_idempotent(events, 0, out) is True
    n0 = spark.read.parquet(os.path.join(out, "batch_id=0")).count()
    assert sinks.write_batch_idempotent(events, 0, out) is False  # no-op
    assert spark.read.parquet(os.path.join(out, "batch_id=0")).count() == n0

    # torn batch 1: data written but no marker -> replay overwrites whole
    torn_dir = os.path.join(out, "batch_id=1")
    events.limit(3).write.mode("overwrite").parquet(torn_dir)
    assert sinks.committed_ids(out) == [0]  # reader never sees the torn one
    assert sinks.write_batch_idempotent(events, 1, out) is True
    assert sinks.committed_ids(out) == [0, 1]
    assert spark.read.parquet(torn_dir).count() == n0  # whole, not 3

    # end-to-end: stream the same rows through the sink; totals match
    src = str(tmp_path / "src")
    events.write.parquet(src)
    stream = spark.readStream.schema(events.schema).parquet(src)
    q = sinks.exactly_once_parquet_sink(
        stream, str(tmp_path / "sink2"), str(tmp_path / "ckpt")
    )
    q.awaitTermination(120)
    q.stop()
    got = spark.read.parquet(str(tmp_path / "sink2"))
    assert got.drop("batch_id").count() == events.count()

    # restart from the SAME checkpoint with no new data: engine replays
    # nothing, sink unchanged (exactly-once across restarts)
    q2 = sinks.exactly_once_parquet_sink(
        stream, str(tmp_path / "sink2"), str(tmp_path / "ckpt")
    )
    q2.awaitTermination(120)
    q2.stop()
    assert spark.read.parquet(str(tmp_path / "sink2")).drop("batch_id").count() == events.count()


def test_gif_codec_roundtrip_and_dispatch():
    """GIF LZW codec (round-11): palette build, variable-width code
    growth through 12 bits with mid-stream table reset, KwKwK case,
    interlace undo, extension-block skip — all through the one
    decode_pixels dispatcher. Palette formats are lossless, so the
    round trip is exact equality."""
    import struct

    import numpy as np

    rng = np.random.default_rng(11)
    # random-palette image: exercises code-width growth
    w, h = 37, 23
    pal = rng.integers(0, 256, size=(100, 3), dtype=np.uint8)
    px = pal[rng.integers(0, 100, size=(h, w))].tobytes()
    gif = MM.encode_gif(w, h, px)
    got = MM.decode_pixels(gif)
    assert got == (w, h, 3, px)
    # header probe agrees on dims
    meta = MM.parse_media_header(gif)
    assert (meta["format"], meta["width"], meta["height"]) == ("gif", w, h)

    # big enough to hit the 4096-entry table reset
    w2, h2 = 180, 140
    pal2 = rng.integers(0, 256, size=(256, 3), dtype=np.uint8)
    px2 = pal2[rng.integers(0, 256, size=(h2, w2))].tobytes()
    assert MM.decode_pixels(MM.encode_gif(w2, h2, px2))[3] == px2

    # interlaced: encode rows pre-permuted into pass order, flip the
    # interlace flag, and the decoder must reassemble the original
    rows = np.frombuffer(px, np.uint8).reshape(h, w * 3)
    order = [y for s, t in ((0, 8), (4, 8), (2, 4), (1, 2)) for y in range(s, h, t)]
    inter = MM.encode_gif(w, h, rows[order].tobytes())
    gct = 2 << (inter[10] & 7)
    flag_at = 13 + gct * 3 + 9
    inter = inter[:flag_at] + bytes([inter[flag_at] | 0x40]) + inter[flag_at + 1:]
    assert MM.decode_pixels(inter)[3] == px

    # extension blocks (graphic control) before the descriptor are
    # skipped; trailing second frame is ignored (first-frame rule)
    gce = b"\x21\xf9\x04\x00\x00\x00\x00\x00"
    with_ext = gif[:13 + gct * 3] + gce + gif[13 + gct * 3:]
    assert MM.decode_pixels(with_ext)[3] == px

    # corrupt: truncated LZW stream and >256 colors on encode
    with pytest.raises(ValueError):
        MM.decode_pixels(gif[: len(gif) // 2])
    big = np.arange(300, dtype=np.int64)
    rgb300 = np.stack([big % 256, big // 256, big * 0], axis=1).astype(np.uint8)
    with pytest.raises(ValueError):
        MM.encode_gif(300, 1, rgb300.tobytes())


def test_png_palette_and_adam7_roundtrip():
    """PNG color type 3 (PLTE expansion) and Adam7 interlace (per-pass
    unfilter + scatter) — lossless, exact round trips through the one
    decode_pixels dispatcher, including 1x1 and pass-degenerate sizes."""
    import numpy as np

    rng = np.random.default_rng(9)
    for (w, h) in [(1, 1), (2, 3), (7, 7), (8, 8), (9, 5), (23, 17)]:
        ncol = min(256, w * h)
        pal = rng.integers(0, 256, size=(ncol, 3), dtype=np.uint8)
        px = pal[rng.integers(0, ncol, size=(h, w))].tobytes()
        assert MM.decode_pixels(MM.encode_png_palette(w, h, px)) == (w, h, 3, px)
        for c in (1, 3, 4):
            raw = rng.integers(0, 256, size=h * w * c, dtype=np.uint8).tobytes()
            assert MM.decode_pixels(MM.encode_png_interlaced(w, h, raw, c)) == (
                w, h, c, raw,
            )
    # palette PNG without PLTE quarantines
    broken = MM.encode_png_palette(4, 4, bytes(48))
    # strip the PLTE chunk (header(8) + IHDR(25) + PLTE(12+len))
    plte_len = int.from_bytes(broken[33:37], "big")
    stripped = broken[:33] + broken[33 + 12 + plte_len:]
    with pytest.raises(ValueError):
        MM.decode_pixels(stripped)
