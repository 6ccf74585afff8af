"""Multimodal binary-column plumbing."""

import pytest
from pyspark.sql import functions as F

from data_misc_tools_spark.operators import multimodal as M


def _df(spark):
    return spark.createDataFrame(
        [(1, "hello"), (2, "a longer text payload with more bytes")],
        "doc_id long, text string",
    )


def test_binary_payload_and_meta(spark):
    out = M.extract_meta(M.with_binary_payload(_df(spark), "text"))
    rows = {r.doc_id: r for r in out.collect()}
    assert bytes(rows[1].payload) == b"hello"
    assert rows[1].media_meta.n_bytes == 5
    assert rows[1].media_meta.width is None  # decoder-owned fields stay null
    assert rows[1].payload_md5 == "5d41402abc4b2a76b9719d911017c592"


def test_decode_batches_fake_is_deterministic(spark):
    b = M.with_binary_payload(_df(spark), "text")
    r1 = sorted(map(tuple, M.decode_batches(b, fake=True).collect()))
    r2 = sorted(map(tuple, M.decode_batches(b, fake=True).collect()))
    assert r1 == r2
    for _, w, h, px in r1:
        assert px == w * h  # schema + row alignment are real


def test_decode_stub_raises(spark):
    with pytest.raises(NotImplementedError):
        M.decode_stub("image")
    b = M.with_binary_payload(_df(spark), "text")
    with pytest.raises(Exception):  # surfaces from the executor as PythonException
        M.decode_batches(b, fake=False).collect()


def test_udtf_probe_lifecycle(spark):
    from data_misc_tools_spark.operators.probes import udtf_probe

    df = spark.range(1000).repartition(4)
    out = udtf_probe(df).collect()
    assert len(out) == 1000
    parts = {r.partition_id for r in out}
    assert len(parts) == 4  # one "client scope" per partition
    # batch sizes are consistent with Arrow batching and rows align
    for r in out[:5]:
        assert r.batch_rows >= 1 and r.batch_index >= 0


def test_resize_contract(spark):
    b = M.with_binary_payload(_df(spark), "text")
    out = {r.doc_id: r for r in M.resize_batches(b, 8, 8, fake=True).collect()}
    assert out[1].width == 8 and out[1].height == 8
    assert len(bytes(out[1].payload)) <= 8 * 8 // 8
    with pytest.raises(Exception):
        M.resize_batches(b, 8, 8, fake=False).collect()  # codec stub raises


def test_frame_sample_fanout(spark):
    long_doc = spark.createDataFrame(
        [(1, "x" * 640), (2, "y" * 64)], "doc_id long, text string"
    )
    b = M.with_binary_payload(long_doc, "text")
    rows = M.frame_sample_batches(b, every_nth=2, fake=True).collect()
    per_doc = {}
    for r in rows:
        per_doc.setdefault(r.doc_id, []).append(r.frame_index)
    assert per_doc[1] == [0, 2, 4, 6, 8]  # 10 frames, every 2nd
    assert per_doc[2] == [0]
    assert all(len(bytes(r.frame)) <= 64 for r in rows)


class TestImageDimensions:
    def test_png_gif_and_unknown(self, spark):
        import struct

        from data_misc_tools_spark.operators.multimodal import image_dimensions

        def png(w, h):
            sig = bytes.fromhex("89504E470D0A1A0A")
            ihdr = struct.pack(">I", 13) + b"IHDR" + struct.pack(">II", w, h)
            return sig + ihdr + b"\x08\x02\x00\x00\x00"

        def gif(w, h):
            return b"GIF89a" + struct.pack("<HH", w, h) + b"\x00\x00\x00"

        rows = [
            (1, png(640, 480)),
            (2, gif(320, 200)),
            (3, b"plain text, not an image"),
        ]
        df = spark.createDataFrame(rows, "id long, payload binary")
        out = {
            r.id: (r.dims.format, r.dims.width, r.dims.height)
            for r in df.select("id", image_dimensions("payload").alias("dims")).collect()
        }
        assert out[1] == ("png", 640, 480)
        assert out[2] == ("gif", 320, 200)
        assert out[3] == (None, None, None)

    def test_header_parse_is_jvm_only(self, spark):
        from data_misc_tools_spark.operators.multimodal import image_dimensions

        df = spark.createDataFrame([(1, b"x")], "id long, payload binary")
        plan = (
            df.select(image_dimensions("payload"))
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "Python" not in plan


class TestWavAudioMeta:
    def _wav(self, channels, rate, bits, n_samples):
        import struct

        data_len = n_samples * channels * (bits // 8)
        return (
            b"RIFF"
            + struct.pack("<I", 36 + data_len)
            + b"WAVE"
            + b"fmt "
            + struct.pack("<IHHIIHH", 16, 1, channels, rate,
                          rate * channels * bits // 8,
                          channels * bits // 8, bits)
            + b"data"
            + struct.pack("<I", data_len)
            + b"\x00" * data_len
        )

    def test_wav_header_fields(self, spark):
        from data_misc_tools_spark.operators.multimodal import wav_audio_meta

        rows = [
            (1, self._wav(2, 44100, 16, 44100)),   # 1 s stereo CD
            (2, self._wav(1, 16000, 16, 8000)),    # 0.5 s mono
            (3, b"RIFFxxxxAVI LIST"),              # RIFF but not WAVE
            (4, b"not audio at all"),
        ]
        df = spark.createDataFrame(rows, "id long, payload binary")
        out = {
            r.id: (r.m.format, r.m.channels, r.m.sample_rate,
                   r.m.bits_per_sample, r.m.duration_ms)
            for r in df.select("id", wav_audio_meta("payload").alias("m")).collect()
        }
        assert out[1] == ("wav", 2, 44100, 16, 1000)
        assert out[2] == ("wav", 1, 16000, 16, 500)
        assert out[3][0] is None and out[4][0] is None

    def test_wav_parse_is_jvm_only(self, spark):
        from data_misc_tools_spark.operators.multimodal import wav_audio_meta

        df = spark.createDataFrame([(1, b"x")], "id long, payload binary")
        plan = (
            df.select(wav_audio_meta("payload"))
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "Python" not in plan


class TestJpegDimensions:
    def test_round_trip_via_catalyst_writer(self, spark):
        from data_misc_tools_spark.operators.multimodal import (
            image_dimensions,
            synthetic_jpeg,
        )

        df = spark.createDataFrame(
            [(1, 640, 480), (2, 1, 1), (3, 65535, 2)], "i long, w long, h long"
        )
        out = df.select(
            "i", "w", "h",
            image_dimensions(synthetic_jpeg(F.col("w"), F.col("h"))).alias("m"),
        ).select("i", "w", "h", "m.format", "m.width", "m.height").collect()
        for r in out:
            assert (r.format, r.width, r.height) == ("jpeg", r.w, r.h), r

    def test_real_header_with_many_leading_segments(self, spark):
        """Hand-built JPEG bytes: APP0 + APP1(Exif-ish) + COM + DQT
        before SOF2 — the walk must hop four segments; SOS data after
        SOF must not confuse it."""
        import struct

        def seg(marker, body):
            return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

        blob = (
            b"\xff\xd8"
            + seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
            + seg(0xE1, b"Exif\x00\x00" + b"\x00" * 20)
            + seg(0xFE, b"a comment")
            + seg(0xDB, b"\x00" + bytes(64))
            + seg(0xC2, b"\x08" + struct.pack(">HH", 900, 1440) + b"\x03")
            + seg(0xDA, b"\x01\x01\x00")
            + b"\x12\x34\x56"
            + b"\xff\xd9"
        )
        from data_misc_tools_spark.operators.multimodal import jpeg_dimensions

        df = spark.createDataFrame([(blob,)], "payload binary")
        r = df.select(jpeg_dimensions("payload").alias("m")).first().m
        assert (r.width, r.height) == (1440, 900)

    def test_non_jpeg_and_truncated_yield_nulls(self, spark):
        from data_misc_tools_spark.operators.multimodal import jpeg_dimensions

        rows = [
            (b"\x89PNG\r\n\x1a\x0a" + bytes(30),),   # PNG magic
            (b"\xff\xd8\xff\xe0\x00\x10JF",),         # truncated mid-APP0
            (b"\xff\xd8\xff\xd9",),                   # SOI+EOI, no SOF
            (bytes(10),),
        ]
        df = spark.createDataFrame(rows, "payload binary")
        for r in df.select(jpeg_dimensions("payload").alias("m")).collect():
            assert r.m.width is None and r.m.height is None


def test_mp4_round_trip_and_rejects(spark):
    from pyspark.sql import functions as F

    from data_misc_tools_spark.operators.multimodal import (
        mp4_video_meta,
        synthetic_mp4,
    )

    df = spark.range(8).select(
        F.col("id"),
        (1000 + F.col("id") * 111).alias("ts"),
        (90000 + F.col("id") * 1234).alias("dur"),
        (128 + F.col("id") * 8).alias("w"),
        (96 + F.col("id") * 4).alias("h"),
    )
    out = df.select(
        "id", "ts", "dur", "w", "h",
        mp4_video_meta(synthetic_mp4(F.col("ts"), F.col("dur"), F.col("w"), F.col("h"))).alias("m"),
    ).collect()
    for r in out:
        assert r.m.timescale == r.ts and r.m.duration == r.dur
        assert r.m.width == r.w and r.m.height == r.h

    # not an MP4 / truncated payload -> all-null struct, no error
    bad = spark.createDataFrame(
        [(1, b"RIFFxxxxWAVE"), (2, b"\x00\x00"), (3, b"")],
        "id long, payload binary",
    )
    for r in bad.select(mp4_video_meta("payload").alias("m")).collect():
        assert r.m.timescale is None and r.m.width is None

    # ftyp present but moov missing within the walk bound -> nulls
    no_moov = spark.range(1).select(
        F.unhex(F.lit("000000146674797069736F6D0000020069736F6D" + "00000010667265650000000000000000")).alias("payload")
    )
    r = no_moov.select(mp4_video_meta("payload").alias("m")).collect()[0]
    assert r.m.timescale is None and r.m.width is None


def test_mp4_skips_leading_free_box(spark):
    from pyspark.sql import functions as F

    from data_misc_tools_spark.operators.multimodal import (
        mp4_video_meta,
        synthetic_mp4,
    )

    # splice a 16-byte 'free' box between ftyp and moov: the top-level
    # walk must hop over it to find moov.
    blob = synthetic_mp4(F.lit(600), F.lit(1200), F.lit(320), F.lit(240))
    spliced = F.concat(
        F.substring(blob, 1, 20),
        F.unhex(F.lit("0000001066726565" + "00" * 8)),
        F.substring(blob, 21, 1000),
    )
    r = spark.range(1).select(mp4_video_meta(spliced).alias("m")).collect()[0]
    assert (r.m.timescale, r.m.duration, r.m.width, r.m.height) == (600, 1200, 320, 240)


def test_png_real_codec_roundtrip(spark):
    from pyspark.sql import functions as F

    from data_misc_tools_spark.operators.multimodal import (
        image_dimensions,
        png_decode_features,
        png_encode_batches,
    )

    src = spark.createDataFrame(
        [(1, 8, 5, 0), (2, 32, 16, 7), (3, 64, 64, 255)],
        "doc_id long, width int, height int, seed int",
    )
    encoded = png_encode_batches(src).cache()
    # the Catalyst header reader agrees with the real decoder
    dims = {r.doc_id: r.d for r in encoded.select(
        "doc_id", image_dimensions("payload").alias("d")
    ).collect()}
    feats = {r.doc_id: r for r in png_decode_features(encoded).collect()}
    for i, w, h, s in [(1, 8, 5, 0), (2, 32, 16, 7), (3, 64, 64, 255)]:
        assert (dims[i].width, dims[i].height) == (w, h)
        f = feats[i]
        assert (f.width, f.height, f.n_pixels) == (w, h, w * h)
        px = [(s + 31 * x + 17 * y) % 256 for y in range(h) for x in range(w)]
        assert f.mean_pixel_e4 == (sum(px) * 10000) // (w * h)
        assert f.min_pixel == min(px) and f.max_pixel == max(px)


def test_png_stdlib_matches_external_decoder_shape(spark):
    # decode bytes directly (no Spark) to validate against a known tiny image
    from data_misc_tools_spark.operators.multimodal import (
        png_decode_gray8_bytes,
        png_encode_gray8_bytes,
    )

    b = png_encode_gray8_bytes(3, 2, 10)
    w, h, px = png_decode_gray8_bytes(b)
    assert (w, h) == (3, 2)
    assert list(px) == [10, 41, 72, 27, 58, 89]  # (10 + 31x + 17y) % 256
    import pytest as _pt
    with _pt.raises(ValueError):
        png_decode_gray8_bytes(b"\x89PNG\r\n\x1a\njunk")
    with _pt.raises(ValueError):
        png_decode_gray8_bytes(b"nope")


def test_png_resize_nearest(spark):
    from data_misc_tools_spark.operators.multimodal import (
        png_decode_features,
        png_decode_gray8_bytes,
        png_encode_batches,
        png_resize_nearest,
    )

    src = spark.createDataFrame(
        [(1, 16, 16, 3)], "doc_id long, width int, height int, seed int"
    )
    small = png_resize_nearest(png_encode_batches(src), 4, 4)
    f = png_decode_features(small).collect()[0]
    assert (f.width, f.height) == (4, 4)
    # nearest-neighbor: out(x,y) == src(4x, 4y)
    payload = bytes(small.collect()[0].payload)
    _, _, px = png_decode_gray8_bytes(payload)
    want = [(3 + 31 * (4 * x) + 17 * (4 * y)) % 256 for y in range(4) for x in range(4)]
    assert list(px) == want


def test_image_dhash_end_to_end_and_banding_exactness(spark):
    from data_misc_tools_spark.operators.multimodal import (
        dhash_neardup_pairs,
        image_dhash_bands,
        png_encode_batches,
    )
    import pyspark.sql.functions as F
    import pytest as _pt

    # identical images -> hamming 0; a slightly different seed -> few
    # bits; a very different seed -> many bits (dropped by the gate)
    spec = spark.createDataFrame(
        [
            (1, 16, 16, 10),
            (2, 16, 16, 10),    # exact duplicate of 1
            (3, 16, 16, 11),    # near: +1 brightness shifts few bits
            (4, 16, 16, 137),   # unrelated
        ],
        "doc_id long, width int, height int, seed int",
    )
    hashes = image_dhash_bands(png_encode_batches(spec))
    hs = {r.doc_id: (r.b0, r.b1, r.b2, r.b3) for r in hashes.collect()}
    assert hs[1] == hs[2]
    assert all(0 <= v < 65536 for t in hs.values() for v in t)
    # python reference of the dhash over the known synthesis formula
    def ref(seed, w, h):
        grid = [
            (seed + 31 * (x * w // 9) + 17 * (y * h // 8)) % 256
            for y in range(8)
            for x in range(9)
        ]
        bits = [
            1 if grid[y * 9 + x + 1] > grid[y * 9 + x] else 0
            for y in range(8)
            for x in range(8)
        ]
        return tuple(
            sum(bits[16 * k + j] << j for j in range(16)) for k in range(4)
        )

    assert hs[1] == ref(10, 16, 16)
    assert hs[4] == ref(137, 16, 16)
    pairs = {
        (r.id_a, r.id_b): r.hamming
        for r in dhash_neardup_pairs(hashes, max_hamming=3).collect()
    }
    assert pairs[(1, 2)] == 0
    # banded result == quadratic ground truth at the exact threshold
    def ham(a, b):
        return sum(bin(x ^ y).count("1") for x, y in zip(a, b))

    truth = {
        (a, b): ham(hs[a], hs[b])
        for a in hs
        for b in hs
        if a < b and ham(hs[a], hs[b]) <= 3
    }
    assert pairs == truth
    with _pt.raises(ValueError, match="max_hamming"):
        dhash_neardup_pairs(hashes, max_hamming=4)


class TestAudioEnergyFingerprint:
    def _wav_df(self, spark, n_docs=6, n=1024):
        import pyspark.sql.functions as F

        from data_misc_tools_spark.operators.multimodal import synthetic_wav_pcm

        df = spark.createDataFrame([(d,) for d in range(n_docs)], "doc_id long")
        samples = F.transform(
            F.sequence(F.lit(0), F.lit(n - 1)),
            lambda i: ((F.col("doc_id") * 37 + i * i) % 4001 - 2000).cast("int"),
        )
        return df.select(
            "doc_id", synthetic_wav_pcm(samples, F.lit(16000)).alias("payload")
        )

    def _ref(self, d, n=1024, frame=128):
        ss = [((d * 37 + i * i) % 4001) - 2000 for i in range(n)]
        es = [sum(v * v for v in ss[f * frame:(f + 1) * frame])
              for f in range(n // frame)]
        fp = sum((1 << (i - 1)) for i in range(1, len(es)) if es[i] > es[i - 1])
        return es, fp

    def test_roundtrip_matches_arithmetic_reference(self, spark):
        from data_misc_tools_spark.operators.multimodal import (
            audio_energy_fingerprint,
        )

        wav = self._wav_df(spark)
        got = {r.doc_id: r
               for r in audio_energy_fingerprint(wav, frame_size=128).collect()}
        for d in range(6):
            es, fp = self._ref(d)
            r = got[d]
            assert (r.n_frames, r.fingerprint) == (len(es), fp), d
            assert (r.energy_first, r.energy_last) == (es[0], es[-1]), d

    def test_stdlib_wave_reads_identical_samples(self, spark):
        """The bytes are REAL WAV: python's wave module must decode
        the exact samples the Catalyst writer encoded (incl. negative
        two's complement)."""
        import io
        import struct
        import wave

        blob = self._wav_df(spark).where("doc_id = 3").collect()[0].payload
        w = wave.open(io.BytesIO(bytes(blob)))
        assert (w.getnchannels(), w.getsampwidth(), w.getframerate()) == (
            1, 2, 16000,
        )
        vals = struct.unpack("<1024h", w.readframes(1024))
        assert list(vals) == [((3 * 37 + i * i) % 4001) - 2000
                              for i in range(1024)]

    def test_volume_scaling_changes_energy_not_direction_bits(self, spark):
        """Doubling amplitude scales every frame energy 4x — the
        delta-sign fingerprint is invariant (the Haitsma–Kalker
        robustness property the bit rule exists for)."""
        import pyspark.sql.functions as F

        from data_misc_tools_spark.operators.multimodal import (
            audio_energy_fingerprint,
            synthetic_wav_pcm,
        )

        df = spark.createDataFrame([(1, 1), (2, 2)], "doc_id long, amp long")
        samples = F.transform(
            F.sequence(F.lit(0), F.lit(511)),
            lambda i: (F.col("amp") * ((i * i * 13) % 1000 - 500)).cast("int"),
        )
        wav = df.select(
            "doc_id", synthetic_wav_pcm(samples, F.lit(8000)).alias("payload")
        )
        out = {r.doc_id: r
               for r in audio_energy_fingerprint(wav, frame_size=64).collect()}
        assert out[1].fingerprint == out[2].fingerprint
        assert out[2].energy_first == 4 * out[1].energy_first

    def test_non_wav_and_short_blobs_yield_empty(self, spark):
        import pyspark.sql.functions as F

        from data_misc_tools_spark.operators.multimodal import (
            wav_pcm_frame_energies,
        )

        df = spark.createDataFrame(
            [(0, bytearray(b"not a wav at all, just bytes" * 3))],
            "doc_id long, payload binary",
        )
        got = df.select(
            wav_pcm_frame_energies("payload", 128).alias("e")
        ).collect()[0]
        assert got.e == []

    def test_max_frames_guard(self, spark):
        import pytest as _pytest

        from data_misc_tools_spark.operators.multimodal import (
            audio_energy_fingerprint,
        )

        with _pytest.raises(ValueError, match="BIGINT"):
            audio_energy_fingerprint(self._wav_df(spark), max_frames=65)


class TestBmpRoundTrip:
    def test_struct_verified_writer_and_reader(self, spark):
        import struct

        import pyspark.sql.functions as FF

        from data_misc_tools_spark.operators.multimodal import (
            bmp_image_meta,
            synthetic_bmp,
        )

        df = spark.createDataFrame(
            [(13, 7, False), (16, 9, True), (1, 1, False)],
            "w int, h int, td boolean",
        )
        blobs = df.select(
            "w", "h", "td",
            synthetic_bmp(FF.col("w"), FF.col("h"), FF.col("td")).alias("p"),
        )
        for r in blobs.collect():
            b = bytes(r.p)
            assert b[:2] == b"BM"
            size, _, off = struct.unpack("<III", b[2:14])
            bisize, w, h = struct.unpack("<Iii", b[14:26])
            planes, bpp = struct.unpack("<HH", b[26:30])
            comp, simg = struct.unpack("<II", b[30:38])
            row = ((r.w * 3 + 3) // 4) * 4
            assert (size, off, bisize, planes, bpp, comp) == (
                54 + row * r.h, 54, 40, 1, 24, 0,
            )
            assert w == r.w and h == (-r.h if r.td else r.h)
            assert simg == row * r.h and len(b) == size
        got = blobs.select("w", "h", "td", bmp_image_meta("p").alias("m")).collect()
        for r in got:
            assert r.m.format == "bmp"
            assert r.m.width == r.w and r.m.height == r.h
            assert r.m.bits_per_pixel == 24 and r.m.data_offset == 54
            assert r.m.is_topdown == r.td

    def test_non_bmp_yields_nulls(self, spark):
        import pyspark.sql.functions as FF

        from data_misc_tools_spark.operators.multimodal import bmp_image_meta

        df = spark.createDataFrame([("not a bitmap at all",)], "s string")
        r = df.select(
            bmp_image_meta(FF.encode("s", "utf-8")).alias("m")
        ).collect()[0]
        assert r.m.format is None and r.m.width is None


class TestGifRoundTrip:
    def test_writer_reader_and_struct_bytes(self, spark):
        import struct

        import pyspark.sql.functions as FF

        from data_misc_tools_spark.operators.multimodal import (
            gif_image_meta,
            synthetic_gif,
        )

        df = spark.createDataFrame(
            [(320, 200, "89a"), (13, 7, "87a")], "w int, h int, v string"
        )
        blobs = df.select(
            "w", "h", "v",
            synthetic_gif(FF.col("w"), FF.col("h"), FF.col("v")).alias("p"),
        )
        for r in blobs.collect():
            b = bytes(r.p)
            assert b[:3] == b"GIF" and b[3:6] == r.v.encode()
            w, h = struct.unpack("<HH", b[6:10])
            assert (w, h) == (r.w, r.h)
            assert b[10] == 0 and b[-1] == 0x3B
        got = blobs.select("w", "h", "v", gif_image_meta("p").alias("m")).collect()
        for r in got:
            assert r.m.format == "gif" and r.m.version == r.v
            assert r.m.width == r.w and r.m.height == r.h
            assert r.m.gct_size == 0

    def test_gct_size_decodes_packed_field(self, spark):
        """Craft the packed byte directly: GCT flag set with size bits
        n -> 2^(n+1) entries (the classic packed-field decode)."""
        import pyspark.sql.functions as FF

        from data_misc_tools_spark.operators.multimodal import gif_image_meta

        rows = []
        for bits in range(8):
            packed = 0x80 | bits
            hexs = "474946383961" + "4000" + "3000" + f"{packed:02X}" + "0000"
            rows.append((bits, hexs))
        df = spark.createDataFrame(rows, "bits int, hexs string")
        got = df.select(
            "bits", gif_image_meta(FF.unhex("hexs")).alias("m")
        ).collect()
        for r in got:
            assert r.m.format == "gif"
            assert r.m.gct_size == 2 << r.bits  # 2^(bits+1)

    def test_non_gif_nulls(self, spark):
        import pyspark.sql.functions as FF

        from data_misc_tools_spark.operators.multimodal import gif_image_meta

        df = spark.createDataFrame([("JIF89a????",)], "s string")
        r = df.select(gif_image_meta(FF.encode("s", "utf-8")).alias("m")).collect()[0]
        assert r.m.format is None and r.m.width is None


class TestExifRoundTrip:
    def test_struct_verified_writer_and_pointer_walk(self, spark):
        """synthetic_exif's bytes verified with python struct
        (independent of the reader), then exif_image_meta's
        two-pointer walk (ExifIFD entry -> sub-IFD, ASCII entry ->
        string offset) against the same blobs."""
        import struct

        import pyspark.sql.functions as FF

        from data_misc_tools_spark.operators.multimodal import (
            exif_image_meta,
            synthetic_exif,
        )

        rows = [
            (100, 50, 1, "2024:01:02 03:04:05"),
            (65540, 2, 8, "1999:12:31 23:59:59"),
            (7, 7, 6, "2026:08:16 00:00:00"),
        ]
        df = spark.createDataFrame(rows, "w long, h long, o long, dt string")
        blobs = df.select(
            "w", "h", "o", "dt",
            synthetic_exif(
                FF.col("w"), FF.col("h"), FF.col("o"), FF.col("dt")
            ).alias("payload"),
        ).collect()

        def walk(b: bytes):
            assert b[:4] == b"II*\x00"
            off = struct.unpack("<I", b[4:8])[0]
            cnt = struct.unpack("<H", b[off:off + 2])[0]
            tags = {}
            for j in range(cnt):
                tag, typ, count, val = struct.unpack(
                    "<HHII", b[off + 2 + j * 12: off + 14 + j * 12]
                )
                tags[tag] = (typ, count, val)
            assert sorted(tags) == [256, 257, 274, 34665]
            assert tags[274][0] == 3  # Orientation is SHORT
            exo = tags[34665][2]
            cnt2 = struct.unpack("<H", b[exo:exo + 2])[0]
            assert cnt2 == 1
            tag, typ, count, val = struct.unpack(
                "<HHII", b[exo + 2: exo + 14]
            )
            assert (tag, typ, count) == (36867, 2, 20)
            assert b[val + 19] == 0  # NUL-terminated
            return tags[256][2], tags[257][2], tags[274][2], b[val:val + 19].decode()

        for r in blobs:
            assert walk(bytes(r.payload)) == (r.w % 2**32, r.h, r.o, r.dt)

        got = (
            df.select(
                "w", "h", "o", "dt",
                exif_image_meta(
                    synthetic_exif(
                        FF.col("w"), FF.col("h"), FF.col("o"), FF.col("dt")
                    )
                ).alias("m"),
            )
            .collect()
        )
        for r in got:
            assert r.m.format == "tiff"
            assert (r.m.width, r.m.height) == (r.w % 2**32, r.h)
            assert r.m.orientation == r.o
            assert r.m.dt_original == r.dt

    def test_missing_exif_and_non_tiff_yield_nulls(self, spark):
        import pyspark.sql.functions as FF

        from data_misc_tools_spark.operators.multimodal import (
            exif_image_meta,
            synthetic_tiff,
        )

        # plain TIFF (no Orientation, no ExifIFD): dims read, rest null
        t = spark.range(1).select(
            exif_image_meta(
                synthetic_tiff(FF.lit(20), FF.lit(10))
            ).alias("m")
        ).collect()[0].m
        assert (t.format, t.width, t.height) == ("tiff", 20, 10)
        assert t.orientation is None and t.dt_original is None

        nt = spark.createDataFrame([("hello",)], "x string").select(
            exif_image_meta(FF.encode("x", "utf-8")).alias("m")
        ).collect()[0].m
        assert all(v is None for v in nt.asDict().values())


class TestTiffRoundTrip:
    def test_struct_verified_writer_and_chain_walk(self, spark):
        """The writer's bytes verified with python struct (independent
        of the reader), then the reader's IFD-chain walk against the
        same blobs — any stride/pointer/LE slip fails one of the two."""
        import struct

        import pyspark.sql.functions as FF

        from data_misc_tools_spark.operators.multimodal import (
            synthetic_tiff,
            tiff_image_meta,
        )

        df = spark.createDataFrame(
            [(13, 7, 1), (300, 9, 3), (65540, 2, 5)], "w long, h int, n int"
        )
        blobs = df.select(
            "w", "h", "n",
            synthetic_tiff(FF.col("w"), FF.col("h"), FF.col("n")).alias("p"),
        )
        for r in blobs.collect():
            b = bytes(r.p)
            assert b[:4] == b"II*\x00"
            off = struct.unpack("<I", b[4:8])[0]
            assert off == 8
            pages, widths = 0, []
            while off and pages < 10:
                cnt = struct.unpack("<H", b[off:off + 2])[0]
                assert cnt == 5
                ent = {}
                for j in range(cnt):
                    tag, typ, c, val = struct.unpack(
                        "<HHII", b[off + 2 + 12 * j:off + 14 + 12 * j]
                    )
                    assert c == 1
                    ent[tag] = (typ, val)
                assert ent[256][0] == 4 and ent[257][0] == 4
                assert ent[258] == (3, 8) and ent[259] == (3, 1)
                assert ent[277] == (3, 1)
                assert ent[256][1] == r.w + pages and ent[257][1] == r.h
                widths.append(ent[256][1])
                off = struct.unpack(
                    "<I", b[off + 2 + 12 * cnt:off + 6 + 12 * cnt]
                )[0]
                pages += 1
            assert pages == r.n and len(b) == 8 + 66 * r.n
        got = blobs.select(
            "w", "h", "n", tiff_image_meta("p").alias("m")
        ).collect()
        for r in got:
            assert r.m.format == "tiff"
            assert r.m.pages == r.n
            assert r.m.width == r.w and r.m.height == r.h
            assert r.m.bits_per_sample == 8 and r.m.compression == 1
            assert r.m.last_width == r.w + r.n - 1

    def test_non_tiff_and_bigendian_yield_nulls(self, spark):
        import pyspark.sql.functions as FF

        from data_misc_tools_spark.operators.multimodal import tiff_image_meta

        # 'MM' big-endian TIFF magic is out of the LE reader's contract
        df = spark.createDataFrame(
            [("not a tiff",), ("MM\x00*ABCDEFG",)], "s string"
        )
        for r in df.select(
            tiff_image_meta(FF.encode("s", "utf-8")).alias("m")
        ).collect():
            assert r.m.format is None and r.m.pages is None
            assert r.m.width is None and r.m.last_width is None

    def test_max_pages_bounds_the_walk(self, spark):
        import pyspark.sql.functions as FF

        from data_misc_tools_spark.operators.multimodal import (
            synthetic_tiff,
            tiff_image_meta,
        )

        df = spark.createDataFrame([(10, 5, 6)], "w int, h int, n int")
        blobs = df.select(
            synthetic_tiff(FF.col("w"), FF.col("h"), FF.col("n")).alias("p")
        )
        r = blobs.select(tiff_image_meta("p", max_pages=3).alias("m")).collect()[0]
        assert r.m.pages == 3           # walk stops at the bound
        assert r.m.last_width == 12     # width of the 3rd page only

    def test_parse_is_jvm_only(self, spark):
        import pyspark.sql.functions as FF

        from data_misc_tools_spark.operators.multimodal import (
            synthetic_tiff,
            tiff_image_meta,
        )

        df = spark.createDataFrame([(9, 4, 2)], "w int, h int, n int")
        plan = (
            df.select(
                synthetic_tiff(FF.col("w"), FF.col("h"), FF.col("n")).alias("p")
            )
            .select(tiff_image_meta("p").alias("m"))
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        for marker in ("ArrowEvalPython", "BatchEvalPython", "FlatMapGroupsInPandas"):
            assert marker not in plan


class TestIcoRoundTrip:
    def test_struct_verified_writer_and_directory_walk(self, spark):
        """synthetic_ico's bytes verified with python struct, then the
        reader's directory walk (entry stride, offset math, payload
        peeks) against the same blobs — including the 0-means-256
        dims gotcha."""
        import struct

        import pyspark.sql.functions as FF

        from data_misc_tools_spark.operators.multimodal import (
            ico_image_meta,
            synthetic_ico,
        )

        df = spark.createDataFrame(
            [(1, 16), (3, 40), (2, 256), (5, 100)], "n int, base int"
        )
        blobs = df.select(
            "n", "base",
            synthetic_ico(FF.col("n"), FF.col("base")).alias("payload"),
        ).collect()
        for r in blobs:
            b = bytes(r.payload)
            res, typ, cnt = struct.unpack("<HHH", b[:6])
            assert (res, typ, cnt) == (0, 1, r.n)
            for k in range(cnt):
                w, h, col, rsv, planes, bpp, nb, off = struct.unpack(
                    "<BBBBHHII", b[6 + 16 * k: 6 + 16 * (k + 1)]
                )
                want = (r.base * (2 ** k)) % 256
                assert (w, h, planes, bpp, nb) == (
                    want, want, 1, 32, 100 + k,
                )
                magic = b[off:off + 4]
                assert magic == (b"\x89PNG" if k % 2 == 0 else b"\x28\x00\x00\x00")

        got = df.select(
            "n", "base",
            ico_image_meta(
                synthetic_ico(FF.col("n"), FF.col("base"))
            ).alias("m"),
        ).collect()
        for r in got:
            assert r.m.format == "ico"
            assert r.m.n_images == r.n
            want0 = r.base % 256 or 256
            assert (r.m.width, r.m.height) == (want0, want0)
            assert r.m.bits_per_pixel == 32
            assert r.m.n_png == (r.n + 1) // 2
            assert r.m.n_dib == r.n // 2
            assert r.m.max_bytes == 100 + r.n - 1

    def test_non_ico_yields_nulls(self, spark):
        import pyspark.sql.functions as FF

        from data_misc_tools_spark.operators.multimodal import ico_image_meta

        nt = spark.createDataFrame([("nope",)], "x string").select(
            ico_image_meta(FF.encode("x", "utf-8")).alias("m")
        ).collect()[0].m
        assert all(v is None for v in nt.asDict().values())


class TestMediaMetaDispatcher:
    """media_meta: one magic-byte CASE over all nine format walkers
    (VERDICT r9 #6)."""

    def _blobs(self, spark):
        import pyspark.sql.functions as FF

        from data_misc_tools_spark.operators import multimodal as M

        png_hdr = FF.unhex(
            FF.concat(
                FF.lit("89504E470D0A1A0A0000000D49484452"),
                FF.lpad(FF.hex(FF.lit(777)), 8, "0"),
                FF.lpad(FF.hex(FF.lit(333)), 8, "0"),
            )
        )
        return spark.range(1).select(
            FF.array(
                M.synthetic_jpeg(FF.lit(640), FF.lit(480)),
                M.synthetic_gif(FF.lit(32), FF.lit(16)),
                M.synthetic_bmp(FF.lit(100), FF.lit(50)),
                M.synthetic_tiff(FF.lit(200), FF.lit(80), FF.lit(3)),
                M.synthetic_exif(
                    FF.lit(300), FF.lit(150), FF.lit(6),
                    FF.lit("2024:01:02 03:04:05"),
                ),
                M.synthetic_ico(FF.lit(2), FF.lit(16)),
                M.synthetic_wav(FF.lit(8000), FF.lit(8000), FF.lit(1)),
                M.synthetic_mp4(
                    FF.lit(1000), FF.lit(2500), FF.lit(1920), FF.lit(1080)
                ),
                png_hdr,
                FF.unhex(FF.lit("DEADBEEF")),
            ).alias("blobs")
        ).select(
            FF.posexplode("blobs").alias("i", "payload")
        ).localCheckpoint(eager=True)

    def test_routes_all_nine_formats(self, spark):
        from data_misc_tools_spark.operators.multimodal import media_meta

        rows = {
            r.i: r.m
            for r in self._blobs(spark)
            .select("i", media_meta("payload").alias("m"))
            .collect()
        }
        assert (rows[0].format, rows[0].width, rows[0].height) == ("jpeg", 640, 480)
        assert (rows[1].format, rows[1].width, rows[1].height) == ("gif", 32, 16)
        assert (rows[2].format, rows[2].width, rows[2].height) == ("bmp", 100, 50)
        assert (rows[3].format, rows[3].width, rows[3].height, rows[3].n_frames) == (
            "tiff", 200, 80, 3,
        )
        # EXIF-in-TIFF shares the II*\0 magic: routes as tiff by design
        assert (rows[4].format, rows[4].width, rows[4].height, rows[4].n_frames) == (
            "tiff", 300, 150, 1,
        )
        assert (rows[5].format, rows[5].width, rows[5].n_frames) == ("ico", 16, 2)
        assert (rows[6].format, rows[6].sample_rate, rows[6].duration_ms) == (
            "wav", 8000, 1000,
        )
        assert rows[6].width is None
        # mp4: duration_ms = (1000 * 2500) div 1000
        assert (rows[7].format, rows[7].width, rows[7].height, rows[7].duration_ms) == (
            "mp4", 1920, 1080, 2500,
        )
        assert (rows[8].format, rows[8].width, rows[8].height) == ("png", 777, 333)
        # unknown magic -> all-null struct, never an error
        assert rows[9] == type(rows[9])(
            format=None, width=None, height=None, n_frames=None,
            sample_rate=None, duration_ms=None,
        )

    def test_dispatch_is_jvm_only_and_bounded_tree(self, spark):
        """No Python eval in the dispatcher plan, and the let-binding
        holds: each walker fold appears ONCE (the naive formulation
        re-inlined the 6-walker coalesce per field reference — 43 s of
        Catalyst analysis per query construction)."""
        import time

        from data_misc_tools_spark.operators.multimodal import media_meta

        blobs = self._blobs(spark)
        t0 = time.time()
        plan = (
            blobs.select(media_meta("payload").alias("m"))
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        construct_s = time.time() - t0
        for marker in (
            "ArrowEvalPython", "BatchEvalPython", "FlatMapGroupsInPandas",
        ):
            assert marker not in plan
        # naive tree took ~43 s; the let-bound one ~4 s. 20 s is the
        # loose regression ceiling (shared-host headroom included)
        assert construct_s < 20, f"dispatcher construction took {construct_s:.1f}s"


class TestCheckpointInterpreted:
    def test_equal_to_codegen_checkpoint_and_confs_restored(self, spark):
        """r11: checkpoint_interpreted must produce bit-identical rows
        to a plain eager localCheckpoint (it only disables codegen for
        the one job) and must restore both codegen confs even though
        the job ran under the override."""
        from pyspark.sql import functions as F

        from data_misc_tools_spark.operators.multimodal import (
            synthetic_bmp,
            synthetic_gif,
        )
        from data_misc_tools_spark.session import checkpoint_interpreted

        prev_ws = spark.conf.get("spark.sql.codegen.wholeStage", "true")
        prev_fm = spark.conf.get("spark.sql.codegen.factoryMode", "FALLBACK")
        d = spark.range(0, 50).select(F.col("id").cast("long").alias("i"))
        payload = F.when(
            F.col("i") % 2 == 0,
            synthetic_bmp(F.lit(16) + F.col("i"), F.lit(8) + F.col("i")),
        ).otherwise(synthetic_gif(F.lit(4) + F.col("i"), F.lit(3)))
        df = d.select("i", payload.alias("p"))
        a = checkpoint_interpreted(df)
        b = df.localCheckpoint(eager=True)
        assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
        assert spark.conf.get("spark.sql.codegen.wholeStage", "true") == prev_ws
        assert (
            spark.conf.get("spark.sql.codegen.factoryMode", "FALLBACK")
            == prev_fm
        )
