"""MPEG Layer III codec (operators/mp3.py) — VERDICT r11 ask #2.

Gates, per the ask: (a) encode→decode round-trips on real Layer III
bitstreams with the reconstruction error bounded by the bundled-table
quantizer (|q| ≤ 3 — a deliberately coarse but spec-valid codec), with
EXACT stream geometry (frame/byte/sample counts) and exact
``part2_3_length`` bit accounting, (b) real-file interop against the
one MP3 on this disk (MPEG-2 LSF): full structural walk — every frame
header, side info, scalefactor-bit accounting, bit-reservoir
bookkeeping — AND full sample decode (the file is digital silence, so
it sits inside the supported LSF subset and must produce exactly-zero
PCM), (c) import-time Huffman table validation (Kraft completeness +
prefix-freeness), and (d) a ValueError-only error contract under
mutation/truncation fuzz, same contract as the other codecs in
multimodal.py.
"""

from __future__ import annotations

import numpy as np
import pytest

from gramene_mongodb_spark.operators import mp3 as M

REAL_MP3 = "/usr/lib/google-cloud-sdk/platform/gsutil/gslib/tests/test_data/test.mp3"


# ---------------------------------------------------------------------------
# Huffman tables
# ---------------------------------------------------------------------------

def test_bundled_tables_validate():
    """Every bundled code table passed the import-time Kraft +
    prefix-freeness validator (the module would not import otherwise);
    pin the bundled set so a silent regression in coverage is loud."""
    assert sorted(M._PAIR_DECODE) == [1, 2, 3, 5, 6]
    assert sorted(M._QUAD_DECODE) == [0, 1]
    for tid, (xlen, table) in M._PAIR_DECODE.items():
        assert len(table) == xlen * xlen
    assert len(M._QUAD_DECODE[0]) == 16
    # count1 table B is the fixed 4-bit complement code
    assert all(M._QUAD_DECODE[1][(4, 15 - i)] == i for i in range(16))


def test_unbundled_tables_raise_by_name():
    for tid in (7, 13, 15, 16, 24, 31):
        with pytest.raises(ValueError, match=f"table {tid} not bundled"):
            M._require_table(tid)
    for tid in (4, 14):
        with pytest.raises(ValueError, match="not used"):
            M._require_table(tid)


def test_polyphase_window_near_pr():
    """The ALS/Gauss-Newton-derived tied window pair (d = 32·a family)
    reconstructs through the spec's exact analysis+synthesis structure
    at better than 100 dB SNR with the documented 481-sample delay."""
    a, d = M._window_pair()
    assert np.allclose(d, 32 * a)
    an, syn = M._Analyzer(), M._Synthesizer()
    rng = np.random.default_rng(7)
    x = rng.normal(size=32 * 18 * 20) * 0.5
    S = np.stack([an.run(x[t * 32:(t + 1) * 32]) for t in range(18 * 20)])
    y = np.concatenate([syn.run(S[b * 18:(b + 1) * 18]) for b in range(20)])
    delay = 481
    xs, ys = x[: len(y) - delay], y[delay:]
    seg = slice(512, len(xs) - 512)
    err = xs[seg] - ys[seg]
    snr = 10 * np.log10((xs[seg] @ xs[seg]) / (err @ err))
    assert snr > 100.0


# ---------------------------------------------------------------------------
# encode → decode round trips
# ---------------------------------------------------------------------------

def test_silence_roundtrips_to_exact_zero():
    raw = M.encode_mp3(np.zeros(1152 * 3), 48000, 128)
    assert len(raw) == 3 * 384  # 144·128000/48000 exactly, no padding
    rate, nch, pcm = M.decode_mp3(raw)
    assert (rate, nch) == (48000, 1)
    assert pcm.shape == (3 * 1152, 1)
    assert np.abs(pcm).max() == 0.0


#: total codec delay: 481 (polyphase) + 576 (MDCT granule overlap)
CODEC_DELAY = 1057


def _roundtrip_snr(x: np.ndarray, rate: int, kbps: int) -> tuple[float, float]:
    raw = M.encode_mp3(x, rate, kbps)
    r, nch, pcm = M.decode_mp3(raw)
    assert r == rate and nch == 1
    y = pcm[:, 0]
    xs, ys = x[: len(y) - CODEC_DELAY], y[CODEC_DELAY:]
    seg = slice(1152, len(xs) - 1152)
    err = xs[seg] - ys[seg]
    snr = 10 * np.log10((xs[seg] @ xs[seg]) / (err @ err))
    ratio = (ys[seg] @ ys[seg]) / (xs[seg] @ xs[seg])
    return snr, ratio


@pytest.mark.parametrize("rate", [32000, 44100, 48000])
@pytest.mark.parametrize("kbps", [96, 128, 320])
def test_sine_roundtrip_all_rates(rate, kbps):
    t = np.arange(1152 * 5)
    x = 0.4 * np.sin(2 * np.pi * 440 * t / rate)
    snr, ratio = _roundtrip_snr(x, rate, kbps)
    # the 3-level quantizer's inherent fidelity: ~9-11 dB, energy kept
    # within [0.6, 1.2] — one broken stage (gain, window, butterfly,
    # reorder, bit packing) drops SNR far below this floor
    assert snr > 6.0, snr
    assert 0.6 < ratio < 1.2, ratio


def test_broadband_roundtrip():
    rng = np.random.default_rng(5)
    x = rng.normal(size=1152 * 6) * 0.1
    snr, ratio = _roundtrip_snr(x, 48000, 128)
    assert snr > 8.0
    assert 0.8 < ratio < 1.1


def test_sweep_roundtrip_exercises_table0_regions():
    """A frequency sweep walks the spectral envelope through region
    splits where region0/region2 are all-zero (table 0, ZERO bits) —
    the encoder/decoder must agree a table-0 region consumes nothing."""
    n = 1152 * 6
    t = np.arange(n)
    x = 0.5 * np.sin(2 * np.pi * (200 + 3000 * t / n) * t / 48000)
    snr, ratio = _roundtrip_snr(x, 48000, 128)
    assert snr > 6.0
    assert 0.6 < ratio < 1.2


def test_stereo_roundtrip():
    n = 1152 * 4
    t = np.arange(n)
    x = np.stack(
        [0.3 * np.sin(2 * np.pi * 440 * t / 44100),
         0.3 * np.sin(2 * np.pi * 660 * t / 44100)], axis=1
    )
    raw = M.encode_mp3(x, 44100, 192)
    rate, nch, pcm = M.decode_mp3(raw)
    assert (rate, nch) == (44100, 2)
    for ch in range(2):
        xs = x[: len(pcm) - CODEC_DELAY, ch]
        ys = pcm[CODEC_DELAY:, ch]
        seg = slice(1152, len(xs) - 1152)
        err = xs[seg] - ys[seg]
        snr = 10 * np.log10((xs[seg] @ xs[seg]) / (err @ err))
        assert snr > 6.0


def test_part2_3_bit_accounting_is_exact():
    """Re-walk an encoded stream and check each granule's Huffman data
    decodes to EXACTLY part2_3_length bits — the spec's self-checksum
    (any table/sign/region drift desyncs and fails loudly here)."""
    rng = np.random.default_rng(11)
    x = rng.normal(size=1152 * 4) * 0.2
    raw = M.encode_mp3(x, 48000, 128)
    frames = M.walk_frames(raw)
    sfb = M._SFB_LONG[48000]
    for hdr in frames:
        side = M.parse_side_info(hdr, raw)
        off = hdr["offset"] + 4 + side["side_bytes"]
        r = M._BitReader(raw[off:hdr["offset"] + hdr["frame_len"]])
        for chans in side["granules"]:
            for g in chans:
                end = r.pos + g["part2_3_length"]
                M._read_scalefactors_mpeg1(r, g, side["scfsi"][0], None)
                before = r.pos
                M._decode_spectrum(r, g, sfb, end)
                assert r.pos == end
                assert g["count1_end"] >= g["big_values"] * 2
                assert before <= end


def test_count1_quad_starting_past_572_roundtrips():
    """Directed regression (round-13 advice): big_end ≡ 2 (mod 4) near the
    spectrum top — xs[573]=2 forces big_end=574, so the single count1 quad
    STARTS at 574 and its last two lines fall past the 576-line spectrum.
    The encoder zero-pads those (quad cap at _encode_granule_bits); the
    decoder must accept the quad and keep the in-range ±1 lines instead of
    skipping the whole quad (the old `idx <= 572` loop bound zeroed
    xs[574] silently)."""
    sfb = M._SFB_LONG[48000]
    for sign in (1, -1):
        xs = np.zeros(576, dtype=np.int64)
        xs[573] = 2
        xs[574] = sign  # count1 line inside a quad that starts at 574
        w, fields = M._encode_granule_bits(xs.copy(), sfb)
        g = dict(fields)
        g["window_switching"] = 0
        nbits = w.bit_length()
        r = M._BitReader(w.getvalue())
        out = M._decode_spectrum(r, g, sfb, nbits)
        np.testing.assert_array_equal(out, xs)
        assert g["count1_end"] == 576


def test_frame_geometry_is_closed_form():
    for kbps, nfr in ((96, 2), (128, 3), (192, 5)):
        x = np.zeros(1152 * nfr - 100)  # ragged tail → padded up
        raw = M.encode_mp3(x, 48000, kbps)
        flen = 144 * kbps * 1000 // 48000
        assert len(raw) == nfr * flen
        frames = M.walk_frames(raw)
        assert len(frames) == nfr
        _, _, pcm = M.decode_mp3(raw)
        assert pcm.shape[0] == nfr * 1152


# ---------------------------------------------------------------------------
# real-file interop (MPEG-2 LSF)
# ---------------------------------------------------------------------------

@pytest.mark.skipif(
    not __import__("os").path.exists(REAL_MP3),
    reason="real-world MP3 fixture not present on this host",
)
def test_real_world_mp3_interop():
    """INTEROP gate against a real MPEG-2 LSF file we did not produce:
    ID3v2 skip, all 45 frame headers, LSF side info, scalefactor-bit
    and bit-reservoir accounting — then FULL sample decode (the file is
    digital silence, inside the supported LSF subset) to exactly-zero
    PCM with the closed-form sample count."""
    data = open(REAL_MP3, "rb").read()
    assert M.skip_id3v2(data) == 32
    frames = M.walk_frames(data)
    assert len(frames) >= 10
    hdr = frames[0]
    assert not hdr["mpeg1"] and hdr["sample_rate"] == 22050 and hdr["channels"] == 1
    reservoir = 0
    for hdr in frames:
        side = M.parse_side_info(hdr, data)
        assert side["main_data_begin"] <= reservoir
        for chans in side["granules"]:
            for g in chans:
                assert M.lsf_scalefac_bits(g) <= max(g["part2_3_length"], 0)
        md = (hdr["frame_len"] - 4 - (2 if hdr["crc"] else 0)
              - side["side_bytes"])
        reservoir = min(reservoir + md, 511)
    rate, nch, pcm = M.decode_mp3(data)
    assert (rate, nch) == (22050, 1)
    assert pcm.shape == (len(frames) * 576, 1)
    assert np.abs(pcm).max() == 0.0


def test_lsf_beyond_subset_raises():
    """An LSF granule that would need the missing sfb tables must raise
    (not silently mis-decode): synthesize one by patching a nonzero
    big_values into a silent LSF frame's side info."""
    data = bytearray(open(REAL_MP3, "rb").read()) if __import__("os").path.exists(
        REAL_MP3) else None
    if data is None:
        pytest.skip("real-world MP3 fixture not present")
    frames = M.walk_frames(bytes(data))
    hdr = frames[0]
    # side info starts after the 4-byte header; LSF mono layout:
    # main_data_begin(8) private(1) part2_3_length(12) big_values(9)...
    off = hdr["offset"] + 4
    # big_values occupies side-info bits 21..29; byte off+2 carries bits
    # 16..23 MSB-first, so 0x04 sets bit 21 (big_values MSB)
    data[off + 2] |= 0x04
    data[off + 1] |= 0x04  # and a nonzero part2_3_length so it's read
    with pytest.raises(ValueError):
        M.decode_mp3(bytes(data))


# ---------------------------------------------------------------------------
# error contract
# ---------------------------------------------------------------------------

def test_error_contract_valueerror_only():
    good = M.encode_mp3(
        0.3 * np.sin(2 * np.pi * 440 * np.arange(1152 * 2) / 48000), 48000, 128)
    rng = np.random.default_rng(3)
    # random garbage
    for n in (0, 1, 3, 10, 100):
        try:
            M.decode_mp3(bytes(rng.integers(0, 256, n, dtype=np.uint8)))
        except ValueError:
            pass
    # truncations
    for cut in (1, 4, 17, 100, len(good) - 1):
        try:
            M.decode_mp3(good[:cut])
        except ValueError:
            pass
    # single-byte mutations: must either decode or raise ValueError —
    # never IndexError/KeyError/struct.error
    for _ in range(120):
        buf = bytearray(good)
        buf[rng.integers(0, len(buf))] ^= 1 << rng.integers(0, 8)
        try:
            M.decode_mp3(bytes(buf))
        except ValueError:
            pass


def test_encoder_input_contract():
    with pytest.raises(ValueError, match="sample rate"):
        M.encode_mp3(np.zeros(1152), 22050, 128)
    with pytest.raises(ValueError, match="bitrate"):
        M.encode_mp3(np.zeros(1152), 48000, 123)
    with pytest.raises(ValueError, match="PCM"):
        M.encode_mp3(np.zeros((10, 3)), 48000, 128)
    with pytest.raises(ValueError):
        M.walk_frames(b"")
    with pytest.raises(ValueError, match="free-format"):
        M.parse_frame_header(bytes([0xFF, 0xFB, 0x00, 0x00]), 0)


def test_header_fixture_from_multimodal_decodes_as_silence():
    """multimodal.make_mp3 builds zero-side-info frames — a REAL decoder
    must read them as digital silence, tying the r8 header-probe fixture
    family to the new sample decoder."""
    from gramene_mongodb_spark.operators import multimodal as MM

    raw = MM.make_mp3(bitrate_kbps=128, sample_rate=44100, n_frames=4,
                      id3_size=37)
    rate, nch, pcm = M.decode_mp3(raw)
    assert rate == 44100 and nch == 2
    assert pcm.shape == (4 * 1152, 2)
    assert np.abs(pcm).max() == 0.0


# ---------------------------------------------------------------------------
# Spark surface (mp3_stats + the unified VAD/energy path)
# ---------------------------------------------------------------------------

def test_mp3_stats_operator(spark):
    import pandas as pd

    clips = []
    for k in range(4):
        t = np.arange(1152 * (1 + k % 2))
        x = 0.3 * np.sin(2 * np.pi * (300 + 100 * k) * t / 48000)
        clips.append((k, bytearray(M.encode_mp3(x, 48000, 128))))
    df = spark.createDataFrame(clips, "media_id LONG, payload BINARY")
    out = {r["media_id"]: r.asDict() for r in M.mp3_stats(df).collect()}
    for k in range(4):
        r = out[k]
        assert r["sample_rate"] == 48000 and r["channels"] == 1
        assert r["n_samples"] == r["n_frames"] * 1152
        assert r["n_bytes"] == r["n_frames"] * 384
        assert 0.0 < r["peak"] <= 1.05
        assert r["energy"] > 0.0


def test_audio_segments_work_on_mp3_and_wav_mixed(spark):
    """The round-11 verdict's stated user impact — 'VAD/energy stats
    currently require WAV' — closed: frame_energy/audio_segments now
    route MP3 through the real decoder, and a MIXED corpus (WAV + MP3
    in one payload column) segments correctly in one pass."""
    from gramene_mongodb_spark.operators import multimodal as MM

    # loud burst / silence / loud burst, identical shape in both codecs
    n = 1152 * 4
    x = np.zeros(n)
    x[:1152] = 0.5 * np.sin(2 * np.pi * 440 * np.arange(1152) / 48000)
    x[-1152:] = 0.5 * np.sin(2 * np.pi * 440 * np.arange(1152) / 48000)
    wav = MM.encode_wav(48000, np.floor(x * 32767 + 0.5).astype("<i2"))
    mp3_raw = M.encode_mp3(np.concatenate([x, np.zeros(1152)]), 48000, 128)
    df = spark.createDataFrame(
        [(1, bytearray(wav)), (2, bytearray(mp3_raw))],
        "media_id LONG, payload BINARY",
    )
    segs = MM.audio_segments(df, threshold=2000, frame_len=576).collect()
    by_media = {}
    for r in segs:
        by_media.setdefault(r["media_id"], []).append(r)
    assert len(by_media[1]) == 2          # WAV: two bursts, silence between
    assert len(by_media[2]) == 2          # MP3: same shape (codec delay shifts
    #                                       frames but not the segment count)


def test_decode_audio_pcm_contract():
    from gramene_mongodb_spark.operators import multimodal as MM

    with pytest.raises(ValueError, match="unsupported audio container"):
        MM.decode_audio_pcm(b"\x00\x01\x02\x03" * 4)
    # WAV passthrough int16
    wav = MM.encode_wav(16000, np.array([0, 100, -100], "<i2"))
    rate, nch, s = MM.decode_audio_pcm(wav)
    assert rate == 16000 and list(s) == [0, 100, -100]
    # MP3 silence → all-zero int16
    raw = M.encode_mp3(np.zeros(1152), 48000, 128)
    rate, nch, s = MM.decode_audio_pcm(raw)
    assert rate == 48000 and len(s) == 1152 and int(np.abs(s).max()) == 0


# ---------------------------------------------------------------------------
# ID3v2 metadata
# ---------------------------------------------------------------------------

def test_id3_real_file_ffmpeg_tag():
    """The MPEG-2 fixture on this disk carries an ffmpeg-written ID3v2.4
    UTF-8 TSSE frame — a tag we did not produce must parse exactly."""
    if not __import__("os").path.exists(REAL_MP3):
        pytest.skip("real-world MP3 fixture not present")
    tags = M.id3_tags(open(REAL_MP3, "rb").read())
    assert tags == {"version": "ID3v2.4", "TSSE": "Lavf53.5.0"}


@pytest.mark.parametrize("major", [3, 4])
def test_id3_roundtrip_both_versions(major):
    frames = {"TIT2": "Hello Wörld", "TPE1": "Artist π", "TRCK": "7"}
    tag = M.make_id3v2(frames, major)
    payload = tag + M.encode_mp3(np.zeros(1152), 48000, 96)
    got = M.id3_tags(payload)
    assert got.pop("version") == f"ID3v2.{major}"
    assert got == frames
    # the audio after the tag still syncs and decodes
    assert M.skip_id3v2(payload) == len(tag)
    assert len(M.walk_frames(payload)) == 1
    _, _, pcm = M.decode_mp3(payload)
    assert pcm.shape[0] == 1152


def test_id3_skips_non_text_frames_and_padding():
    # hand-build a v2.4 tag: APIC (binary, skipped) + TIT2 + padding
    apic = b"APIC" + bytes([0, 0, 0, 4]) + b"\x00\x00" + b"\x89PNG"
    tit2 = b"TIT2" + bytes([0, 0, 0, 3]) + b"\x00\x00" + b"\x03ab"
    body = apic + tit2 + b"\x00" * 10
    size = len(body)
    tag = (b"ID3\x04\x00\x00"
           + bytes([(size >> 21) & 0x7F, (size >> 14) & 0x7F,
                    (size >> 7) & 0x7F, size & 0x7F]) + body)
    got = M.id3_tags(tag)
    assert got == {"version": "ID3v2.4", "TIT2": "ab"}


def test_id3_error_contract():
    assert M.id3_tags(b"\xff\xfbxx") == {"version": "none"}
    with pytest.raises(ValueError, match="truncated"):
        M.id3_tags(b"ID3\x04\x00\x00\x00\x00\x00\x10ABC")
    with pytest.raises(ValueError, match="not syncsafe"):
        M.id3_tags(b"ID3\x04\x00\x00\x80\x00\x00\x00")
    with pytest.raises(ValueError, match="unsupported ID3v2"):
        M.id3_tags(b"ID3\x07\x00\x00\x00\x00\x00\x00")
    with pytest.raises(ValueError, match="text frame id"):
        M.make_id3v2({"APIC": "x"})
    rng = np.random.default_rng(9)
    for _ in range(60):
        n = int(rng.integers(10, 60))
        buf = bytearray(b"ID3\x04\x00\x00")
        buf += bytes(int(b) & 0x7F for b in rng.integers(0, 128, 4))
        buf += bytes(int(b) for b in rng.integers(0, 256, n))
        try:
            M.id3_tags(bytes(buf))
        except ValueError:
            pass


def test_crc_protected_frames():
    """Protected streams (CRC-16 over header bytes 2-3 + side info)
    round-trip; a flipped side-info bit is caught by the CRC gate
    instead of desyncing the bit reservoir."""
    t = np.arange(1152 * 3)
    x = 0.4 * np.sin(2 * np.pi * 440 * t / 48000)
    raw = M.encode_mp3(x, 48000, 128, protection=True)
    frames = M.walk_frames(raw)
    assert all(h["crc"] for h in frames) and len(raw) == 3 * 384
    rate, nch, pcm = M.decode_mp3(raw)
    assert pcm.shape == (3 * 1152, 1)
    # flip one side-info bit in frame 0 (header 4B + CRC 2B + side[3])
    bad = bytearray(raw)
    bad[4 + 2 + 3] ^= 0x10
    with pytest.raises(ValueError, match="CRC-16 mismatch"):
        M.decode_mp3(bytes(bad))
    # the unprotected encode of the same signal is byte-identical after
    # stripping header flag + CRC (protection must not change the audio)
    plain = M.encode_mp3(x, 48000, 128)
    assert plain[4:4 + 17] == raw[6:6 + 17]  # same side info


# ---------------------------------------------------------------------------
# window-switching granules (block types 1/2/3) — hand-built bitstream
# differential (our encoder emits long blocks only, so these decoder
# paths need third-party-shaped streams: we craft them bit by bit)
# ---------------------------------------------------------------------------

def _build_ws_frame(block_type, subblock_gain, values, gg, ct=0):
    """One MPEG-1 mono 48 kHz 320 kbps frame (960 bytes): granule 0 is a
    window-switching granule with count1-only spectrum (big_values=0,
    ±1 at the given indices), granule 1 silent."""
    quad_end = 0
    vals = dict(values)
    if vals:
        quad_end = ((max(vals) // 4) + 1) * 4
    w = M._BitWriter()
    entries = M._QUAD_CODES[ct]
    for base in range(0, quad_end, 4):
        q = [vals.get(base + j, 0) for j in range(4)]
        pat = ((q[0] != 0) << 3) | ((q[1] != 0) << 2) | ((q[2] != 0) << 1) | (q[3] != 0)
        hlen, hcod = entries[pat]
        w.write(hcod, hlen)
        for v in q:
            if v:
                w.write(1 if v < 0 else 0, 1)
    p23 = w.bit_length()

    sw = M._BitWriter()
    sw.write(0, 9)   # main_data_begin
    sw.write(0, 5)   # private (mono)
    sw.write(0, 4)   # scfsi
    # granule 0: window switching
    sw.write(p23, 12)
    sw.write(0, 9)          # big_values
    sw.write(gg, 8)
    sw.write(0, 4)          # scalefac_compress
    sw.write(1, 1)          # window_switching
    sw.write(block_type, 2)
    sw.write(0, 1)          # mixed_block
    for t in (1, 1):
        sw.write(t, 5)      # table_select x2 (unused: big_values=0)
    for g in subblock_gain:
        sw.write(g, 3)
    sw.write(0, 1)          # preflag
    sw.write(0, 1)          # scalefac_scale
    sw.write(ct, 1)
    # granule 1: silent long
    sw.write(0, 12); sw.write(0, 9); sw.write(210, 8); sw.write(0, 4)
    sw.write(0, 1)
    for t in (0, 0, 0):
        sw.write(t, 5)
    sw.write(0, 4); sw.write(0, 3)
    sw.write(0, 1); sw.write(0, 1); sw.write(0, 1)
    side = sw.getvalue()
    assert len(side) == 17
    header = bytes([0xFF, 0xFB, (0xE << 4) | (0x1 << 2), 3 << 6])  # 320k, 48k, mono
    main = w.getvalue()
    frame_len = 144 * 320000 // 48000
    pad = frame_len - 4 - 17 - len(main)
    return header + side + main + b"\x00" * pad


def _ref_ws_granule(block_type, subblock_gain, values, gg):
    """Spec-literal reference for one window-switching granule's subband
    samples, written independently of operators/mp3.py: requantize with
    per-window subblock gain (short), short reorder, the 12/36-point
    IMDCT sums as explicit loops, window shapes from the spec text, and
    frequency inversion. Long types (1/3) include the aliasing
    butterflies."""
    xs = np.zeros(576)
    for idx, v in dict(values).items():
        xs[idx] = v
    sfb_s = M._SFB_SHORT[48000]
    xr = np.zeros(576)
    if block_type == 2:
        for sfb in range(len(sfb_s) - 1):
            lo, hi = sfb_s[sfb], sfb_s[sfb + 1]
            width = hi - lo
            for win in range(3):
                a = lo * 3 + win * width
                for i in range(width):
                    g = 2.0 ** (0.25 * (gg - 210 - 8 * subblock_gain[win]))
                    xr[a + i] = np.sign(xs[a + i]) * abs(xs[a + i]) ** (4 / 3) * g
        # reorder (sfb, win, line) -> (subband, win, line)
        ro = np.zeros(576)
        for sfb in range(len(sfb_s) - 1):
            lo, hi = sfb_s[sfb], sfb_s[sfb + 1]
            width = hi - lo
            for win in range(3):
                for i in range(width):
                    line = lo + i
                    ro[(line // 6) * 18 + win * 6 + line % 6] = xr[lo * 3 + win * width + i]
        xr = ro
    else:
        g = 2.0 ** (0.25 * (gg - 210))
        xr = np.sign(xs) * np.abs(xs) ** (4 / 3) * g
        # aliasing butterflies (long types only)
        ci = (-0.6, -0.535, -0.33, -0.185, -0.095, -0.041, -0.0142, -0.0037)
        for sb in range(1, 32):
            for i in range(8):
                cs = 1 / np.sqrt(1 + ci[i] ** 2)
                ca = ci[i] * cs
                a, b = xr[18 * sb - 1 - i], xr[18 * sb + i]
                xr[18 * sb - 1 - i] = a * cs - b * ca
                xr[18 * sb + i] = b * cs + a * ca
    # hybrid IMDCT + windows, overlap from zero state
    out = np.zeros((32, 18))
    for sb in range(32):
        spec = xr[sb * 18:(sb + 1) * 18]
        z = np.zeros(36)
        if block_type == 2:
            for win in range(3):
                for i in range(12):
                    s = 0.0
                    for k in range(6):
                        s += spec[win * 6 + k] * np.cos(
                            np.pi / 24 * (2 * i + 1 + 6) * (2 * k + 1))
                    z[6 + win * 6 + i] += np.sin(np.pi / 12 * (i + 0.5)) * s
        else:
            for i in range(36):
                s = 0.0
                for k in range(18):
                    s += spec[k] * np.cos(np.pi / 72 * (2 * i + 1 + 18) * (2 * k + 1))
                if block_type == 1:  # start window
                    wv = (np.sin(np.pi / 36 * (i + 0.5)) if i < 18
                          else 1.0 if i < 24
                          else np.sin(np.pi / 12 * (i - 18 + 0.5)) if i < 30
                          else 0.0)
                else:  # stop window
                    wv = (0.0 if i < 6
                          else np.sin(np.pi / 12 * (i - 6 + 0.5)) if i < 12
                          else 1.0 if i < 18
                          else np.sin(np.pi / 36 * (i + 0.5)))
                z[i] = wv * s
        out[sb] = z[:18]  # zero overlap state: first half only
    out[1::2, 1::2] *= -1.0
    return out


@pytest.mark.parametrize("block_type,sbg", [
    (2, (0, 0, 0)), (2, (1, 0, 2)), (1, (0, 0, 0)), (3, (0, 0, 0)),
])
def test_window_switching_granule_differential(block_type, sbg):
    """Decode a hand-built window-switching frame and check granule 0's
    PCM equals a spec-literal reference pipeline (independent requantize
    + reorder + O(N²) IMDCT sums + windows + inversion) pushed through
    the same synthesis filterbank."""
    values = {0: 1, 2: -1, 5: 1, 9: -1, 14: 1}
    gg = 180
    frame = _build_ws_frame(block_type, sbg, values, gg)
    rate, nch, pcm = M.decode_mp3(frame)
    assert (rate, nch) == (48000, 1) and pcm.shape == (1152, 1)
    ref_sub = _ref_ws_granule(block_type, sbg, values, gg)
    syn = M._Synthesizer()
    ref_pcm = syn.run(ref_sub.T)
    assert np.allclose(pcm[:576, 0], ref_pcm, atol=1e-12), (
        np.abs(pcm[:576, 0] - ref_pcm).max())
    assert np.abs(pcm[:576, 0]).max() > 0  # the granule is not silent


# ---------------------------------------------------------------------------
# Xing/Info VBR header + mixed-bitrate stream walk
# ---------------------------------------------------------------------------

def test_xing_header_roundtrip_and_vbr_walk():
    """A VBR-shaped stream (Xing frame + frames of DIFFERENT bitrates)
    walks with per-frame length arithmetic, and the Xing geometry wins
    over CBR arithmetic (which is wrong for VBR by definition)."""
    f96 = M.encode_mp3(np.zeros(1152), 48000, 96)
    f192 = M.encode_mp3(
        0.3 * np.sin(2 * np.pi * 440 * np.arange(1152) / 48000), 48000, 192)
    xing = M.make_xing_frame(3, 0, kind=b"Xing")
    stream = xing + f96 + f192
    stream = M.make_xing_frame(3, len(stream), kind=b"Xing") + f96 + f192
    frames = M.walk_frames(stream)
    assert [h["bitrate"] for h in frames] == [128000, 96000, 192000]
    got = M.parse_xing(stream)
    assert got["kind"] == "Xing" and got["frames"] == 3
    assert got["bytes"] == len(stream)
    assert len(got["toc"]) == 100 and got["toc"][0] == 0
    assert got["quality"] == 57  # flags bit 8 — fixture twin of the parse path
    assert got["encoder"] == "GMSPARK12"
    # the Xing frame itself still sample-decodes as silence
    rate, nch, pcm = M.decode_mp3(stream)
    assert pcm.shape[0] == 3 * 1152
    assert np.abs(pcm[:1152]).max() == 0.0


def test_xing_absent_and_error_contract():
    plain = M.encode_mp3(np.zeros(1152), 48000, 128)
    assert M.parse_xing(plain) == {"kind": "none"}
    # a truncated Xing body must raise, not misparse
    xing = bytearray(M.make_xing_frame(1, 1))
    probe = 4 + 17
    xing[probe + 4:probe + 8] = (0xF).to_bytes(4, "big")  # claim all fields
    short = bytes(xing[:probe + 10])
    with pytest.raises(ValueError):
        M.parse_xing(short + b"\x00")


# ---------------------------------------------------------------------------
# window switching (r16): transient encode, pre-echo confinement
# ---------------------------------------------------------------------------

def _burst_signal(seed: int, n_frames: int, rate: int) -> np.ndarray:
    """The property test's 'bursts' generator, verbatim."""
    rng = np.random.default_rng(seed)
    n = 1152 * n_frames
    x = np.zeros(n)
    for _ in range(int(rng.integers(1, 4))):
        a = int(rng.integers(0, max(1, n - 600)))
        ln = min(int(rng.integers(200, 1500)), n - a)
        x[a:a + ln] = 0.4 * np.sin(2 * np.pi * 500 * np.arange(ln) / rate)
    return x


def test_r15_driver_counterexample_meets_snr_bound():
    """The r15 driver's Hypothesis counterexample (seed 1911833517:
    bursts, 32 kHz, 96 kbps, 4 frames) failed the 3 dB segment-SNR bound
    at 2.70 dB under the long-block-only encoder — the burst onset sat
    near the segment edge, so pre-echo dominated a sliver of signal.
    Window switching confines the noise; the directed pin keeps the
    STRICT bound on this exact case (measured ~7 dB after the fix)."""
    rate, kbps, n_frames = 32000, 96, 4
    x = _burst_signal(1911833517, n_frames, rate)
    n = len(x)
    raw = M.encode_mp3(x, rate, kbps)
    # the stream really switched windows: start/short/stop present
    bts = []
    for h in M.walk_frames(raw):
        side = M.parse_side_info(h, raw)
        bts.extend(g["block_type"] for chans in side["granules"] for g in chans)
    # the onset granules switched to short, entered via a start window
    # (this burst runs to the stream end, so no stop window appears)
    assert 2 in bts and 1 in bts, bts
    assert all(bts[i] == 1 for i in range(len(bts) - 1)
               if bts[i + 1] == 2 and bts[i] not in (1, 2)), bts
    _, _, pcm = M.decode_mp3(raw)
    d = 1057
    xs, ys = x[: n - d], pcm[d:, 0]
    seg = slice(min(1152, len(xs) // 4), len(xs) - min(1152, len(xs) // 4))
    err = xs[seg] - ys[seg]
    snr = 10 * np.log10((xs[seg] @ xs[seg]) / max(err @ err, 1e-18))
    assert snr > 3.0, snr


def test_short_blocks_confine_pre_echo():
    """Temporal-confinement contract of the window-switching encoder: a
    burst onset deep inside a long silence leaks essentially no
    quantization noise into the silence more than 1152 samples before
    the onset (short windows bound the spread to ~one window support +
    the analysis filterbank's 512 taps; the long-block encoder smeared
    ~1e-1 energy across the full 1152-sample window and would fail this
    by orders of magnitude)."""
    rate, kbps = 44100, 128
    n = 1152 * 4
    onset = 2304
    x = np.zeros(n)
    x[onset:onset + 1200] = 0.5 * np.sin(
        2 * np.pi * 700 * np.arange(1200) / rate)
    raw = M.encode_mp3(x, rate, kbps)
    _, _, pcm = M.decode_mp3(raw)
    d = 1057
    ys = pcm[d:, 0]
    far = slice(576, onset - 1152)          # silence, >1152 before onset
    near_sig = float(x[onset:onset + 1200] @ x[onset:onset + 1200])
    leak = float(ys[far] @ ys[far])
    assert leak < 1e-4 * near_sig, (leak, near_sig)
    # and the burst itself still reconstructs above the product bound
    body = slice(onset, onset + 1200)
    err = x[body] - ys[body]
    snr = 10 * np.log10(near_sig / max(float(err @ err), 1e-18))
    assert snr > 3.0, snr
