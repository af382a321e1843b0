"""Pure-NumPy JPEG codec: Huffman tables against the spec's canonical
codes, IDCT against the naive O(N^4) definition, round trips at 4:4:4 /
4:2:0 / grayscale / restart markers, scope rejections, the Spark
decode+resize path with deterministic=False, and PROGRESSIVE (SOF2)
decode — progressive streams must reproduce the baseline pixels
bit-for-bit (same quantized coefficients), plus a real libjpeg-produced
progressive file when one is present on the host."""

import struct
import zlib  # noqa: F401  (parallel structure with the PNG tests)

import numpy as np
import pytest

from usgs_geomag_algorithms_spark.operators.jpeg_codec import (
    DC_LUMA,
    _A,
    build_huffman,
    jpeg_decode,
    jpeg_encode,
)


def smooth_img(h=41, w=55):
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack(
        [
            (128 + 100 * np.sin(xx / 15)).astype(np.uint8),
            (128 + 100 * np.cos(yy / 11)).astype(np.uint8),
            (128 + 60 * np.sin((xx + yy) / 13)).astype(np.uint8),
        ],
        axis=-1,
    )


class TestJpegMath:
    def test_huffman_canonical_matches_spec(self):
        # Annex K DC luminance: the well-known canonical codewords
        t = build_huffman(*DC_LUMA)
        inv = {sym: (ln, code) for (ln, code), sym in t.items()}
        assert inv[0] == (2, 0b00)
        assert inv[1] == (3, 0b010)
        assert inv[5] == (3, 0b110)
        assert inv[6] == (4, 0b1110)
        assert inv[11] == (9, 0b111111110)

    def test_idct_matches_naive_definition(self):
        # x[n,m] = sum_{u,v} c(u)c(v)/4 X[u,v] cos((2n+1)u pi/16) cos(...)
        rng = np.random.default_rng(2)
        X = rng.normal(0, 50, (8, 8))
        fast = _A.T @ X @ _A
        naive = np.zeros((8, 8))
        for n in range(8):
            for m in range(8):
                s = 0.0
                for u in range(8):
                    for v in range(8):
                        cu = 1 / np.sqrt(2) if u == 0 else 1.0
                        cv = 1 / np.sqrt(2) if v == 0 else 1.0
                        s += (
                            cu * cv / 4 * X[u, v]
                            * np.cos((2 * n + 1) * u * np.pi / 16)
                            * np.cos((2 * m + 1) * v * np.pi / 16)
                        )
                naive[n, m] = s
        assert np.allclose(fast, naive, atol=1e-10)


class TestJpegRoundTrip:
    def test_rgb_444_quality_ladder(self):
        img = smooth_img()
        prev_size = None
        for q, max_err in ((100, 4), (90, 12), (75, 24)):
            enc = jpeg_encode(img, quality=q)
            dec = jpeg_decode(enc)
            assert dec is not None and dec.shape == img.shape
            err = np.abs(dec.astype(int) - img.astype(int))
            assert err.max() <= max_err, (q, err.max())
            if prev_size is not None:
                assert len(enc) < prev_size  # lower quality, fewer bytes
            prev_size = len(enc)

    def test_420_and_restart_markers(self):
        img = smooth_img()
        base = jpeg_decode(jpeg_encode(img, quality=92, subsampling="420"))
        with_rst = jpeg_decode(
            jpeg_encode(img, quality=92, subsampling="420", restart_interval=3)
        )
        # restart markers change the byte stream, not the pixels
        assert np.array_equal(base, with_rst)
        err = np.abs(base.astype(int) - img.astype(int))
        assert err.mean() < 8 and err.max() < 40  # chroma-subsample loss

    def test_grayscale(self):
        g = smooth_img()[..., 0]
        dec = jpeg_decode(jpeg_encode(g, quality=95))
        assert dec.shape == (*g.shape, 3)
        assert np.abs(dec[..., 0].astype(int) - g.astype(int)).max() <= 8
        # gray replicated into all three channels
        assert np.array_equal(dec[..., 0], dec[..., 1])

    def test_odd_dimensions_edge_padding(self):
        img = smooth_img(h=9, w=13)  # forces partial MCUs in both axes
        dec = jpeg_decode(jpeg_encode(img, quality=98, subsampling="420"))
        assert dec.shape == img.shape


class TestJpegScope:
    def test_non_jpeg_and_truncated(self):
        img = smooth_img(16, 16)
        good = jpeg_encode(img)
        assert jpeg_decode(b"not a jpeg") is None
        assert jpeg_decode(good[: len(good) // 3]) is None
        corrupt = bytearray(good)
        corrupt[10] = 0x00  # break the APP0 walk
        assert jpeg_decode(bytes(corrupt[:20])) is None

    def test_arithmetic_and_lossless_rejected(self):
        # SOF9 (arithmetic) / SOF3 (lossless): out of scope -> None
        sof = struct.pack(">BHHB", 8, 16, 16, 1) + bytes([1, 0x11, 0])
        for marker in (b"\xff\xc9", b"\xff\xc3"):
            payload = (
                b"\xff\xd8"
                + marker + struct.pack(">H", len(sof) + 2) + sof
                + b"\xff\xd9"
            )
            assert jpeg_decode(payload) is None

    def test_progressive_headers_only_rejected(self):
        # SOF2 with no DQT and no scans: nothing to reconstruct -> None
        sof2 = struct.pack(">BHHB", 8, 16, 16, 1) + bytes([1, 0x11, 0])
        payload = (
            b"\xff\xd8"
            + b"\xff\xc2" + struct.pack(">H", len(sof2) + 2) + sof2
            + b"\xff\xd9"
        )
        assert jpeg_decode(payload) is None


#: libjpeg-produced progressive files that ship with toolchains commonly
#: present on dev hosts — used for external validation when available
REAL_PROGRESSIVE = [
    "/root/.rustup/toolchains/stable-x86_64-unknown-linux-gnu/share/doc/"
    "rust/html/embedded-book/assets/f3.jpg",
    "/root/.rustup/toolchains/nightly-x86_64-unknown-linux-gnu/share/doc/"
    "rust/html/embedded-book/assets/f3.jpg",
]


class TestJpegProgressive:
    """Progressive (SOF2) decode + the progressive encoder. The load-
    bearing property: jpeg_encode_progressive emits the SAME quantized
    coefficients as jpeg_encode, so decoding either stream must produce
    bit-identical pixels — any drift in the four scan-type codecs
    (DC/AC x first/refine), EOB-run handling, or successive-
    approximation bit bookkeeping breaks the equality."""

    @pytest.mark.parametrize("sub", ["444", "420"])
    @pytest.mark.parametrize("quality", [75, 92])
    def test_matches_baseline_bit_for_bit(self, sub, quality):
        from usgs_geomag_algorithms_spark.operators.jpeg_codec import (
            jpeg_encode_progressive,
        )

        img = smooth_img(43, 61)
        base = jpeg_decode(jpeg_encode(img, quality=quality, subsampling=sub))
        prog_bytes = jpeg_encode_progressive(
            img, quality=quality, subsampling=sub
        )
        assert prog_bytes[3] == 0xE0 and b"\xff\xc2" in prog_bytes
        prog = jpeg_decode(prog_bytes)
        assert prog is not None
        np.testing.assert_array_equal(base, prog)

    def test_grayscale_matches_baseline(self):
        from usgs_geomag_algorithms_spark.operators.jpeg_codec import (
            jpeg_encode_progressive,
        )

        g = smooth_img(30, 34)[..., 0]
        base = jpeg_decode(jpeg_encode(g, quality=85))
        prog = jpeg_decode(jpeg_encode_progressive(g, quality=85))
        np.testing.assert_array_equal(base, prog)

    def test_spectral_selection_only_script(self):
        """A custom script with no successive approximation (Al=0
        everywhere) exercises the plain spectral-selection paths."""
        from usgs_geomag_algorithms_spark.operators.jpeg_codec import (
            jpeg_encode_progressive,
        )

        img = smooth_img(25, 33)
        script = [
            ((0, 1, 2), 0, 0, 0, 0),
            ((0,), 1, 20, 0, 0),
            ((1,), 1, 63, 0, 0),
            ((2,), 1, 63, 0, 0),
            ((0,), 21, 63, 0, 0),
        ]
        base = jpeg_decode(jpeg_encode(img, quality=88))
        prog = jpeg_decode(
            jpeg_encode_progressive(img, quality=88, scans=script)
        )
        np.testing.assert_array_equal(base, prog)

    def test_truncated_progressive_degrades_gracefully(self):
        from usgs_geomag_algorithms_spark.operators.jpeg_codec import (
            jpeg_encode_progressive,
        )

        full = jpeg_encode_progressive(smooth_img(24, 24), quality=80)
        for frac in (0.3, 0.6, 0.9):
            out = jpeg_decode(full[: int(len(full) * frac)])
            # never raises; either cleanly refused or a partial render
            assert out is None or (
                out.dtype == np.uint8 and out.shape == (24, 24, 3)
            )

    def test_real_libjpeg_progressive_file(self):
        """External validation: a progressive JPEG produced by a REAL
        encoder (libjpeg standard script, 4:2:2, per-scan optimal
        tables) must decode deterministically to its SOF dimensions
        with a plausible pixel distribution."""
        import os

        path = next((p for p in REAL_PROGRESSIVE if os.path.exists(p)), None)
        if path is None:
            pytest.skip("no real progressive fixture on this host")
        payload = open(path, "rb").read()
        out = jpeg_decode(payload)
        assert out is not None and out.shape == (477, 720, 3)
        assert 40 < out.mean() < 215 and out.std() > 20
        out2 = jpeg_decode(payload)
        np.testing.assert_array_equal(out, out2)


class TestJpegSpark:
    def test_spark_decode_and_resize_real_path(self, spark):
        from usgs_geomag_algorithms_spark.operators.jpeg_codec import (
            jpeg_decode as jd,
        )
        from usgs_geomag_algorithms_spark.operators.multimodal import (
            attach_media_metadata,
            bilinear_resize,
            decode_media,
            resize_media,
            synthetic_jpeg,
        )

        media = attach_media_metadata(synthetic_jpeg(spark, n=6, w=32, h=24))
        dec = decode_media(media, deterministic=False).collect()
        assert len(dec) == 6
        for r in dec:
            assert (r.width, r.height, r.n_frames) == (32, 24, 1)
            assert 0.2 < r.feature[0] < 0.8  # real pixel stats
        out = resize_media(
            decode_media(media, deterministic=False).join(
                media.select("media_id", "payload"), "media_id"
            ),
            target_w=8,
            target_h=8,
            deterministic=False,
        ).collect()
        local = {
            r.media_id: bilinear_resize(jd(bytes(r.payload)), 8, 8)
            for r in media.select("media_id", "payload").collect()
        }
        for r in out:
            img = jd(bytes(r.resized))  # format preserved: still a JPEG
            assert img is not None and img.shape == (8, 8, 3)
            # resize -> re-encode(q90) -> decode: near the local kernel
            # (the re-encode is honestly lossy; smooth content stays close)
            diff = np.abs(img.astype(int) - local[r.media_id].astype(int))
            # two lossy hops for 4:2:0 sources (decode-upsample + q90
            # re-encode); bound the mean, and tighter on luma-ish green
            assert diff.mean() < 16, (r.media_id, diff.mean())
            assert diff[..., 1].mean() < 12, (r.media_id, diff[..., 1].mean())


class TestMjpegAvi:
    """MJPEG/AVI container: the video modality's real path — RIFF walk,
    per-frame JPEG decode, frame sampling to lossless PNG rows."""

    def test_container_roundtrip(self):
        from usgs_geomag_algorithms_spark.operators.multimodal import (
            avi_mjpeg_encode,
            avi_mjpeg_frames,
        )

        frames = [jpeg_encode(smooth_img(16, 16), quality=90) for _ in range(5)]
        payload = avi_mjpeg_encode(frames, 16, 16, fps=8.0)
        parsed = avi_mjpeg_frames(payload)
        assert parsed is not None
        got, fps = parsed
        assert got == frames  # byte-identical frame payloads
        assert abs(fps - 8.0) < 1e-6

    def test_non_avi_and_truncated_return_none(self):
        from usgs_geomag_algorithms_spark.operators.multimodal import (
            avi_mjpeg_encode,
            avi_mjpeg_frames,
        )

        frames = [jpeg_encode(smooth_img(16, 16))]
        good = avi_mjpeg_encode(frames, 16, 16)
        assert avi_mjpeg_frames(b"RIFF\x00\x00\x00\x00WAVE") is None
        assert avi_mjpeg_frames(good[: len(good) - 10]) is None
        assert avi_mjpeg_frames(b"junk") is None

    def test_spark_decode_and_frame_sample_real_path(self, spark):
        from usgs_geomag_algorithms_spark.operators.multimodal import (
            attach_media_metadata,
            decode_media,
            extract_frames,
            png_decode,
            synthetic_avi,
        )

        media = attach_media_metadata(synthetic_avi(spark, n=3, frames=12))
        dec = decode_media(media, deterministic=False).collect()
        assert len(dec) == 3
        for r in dec:
            # real container metadata: true frame count + frame dims
            assert (r.width, r.height, r.n_frames) == (32, 24, 12)
            assert 0.2 < r.feature[0] < 0.8
        out = extract_frames(
            media, every_n=4, deterministic=False
        ).collect()
        # 12 frames sampled every 4 -> indices 0, 4, 8 per clip
        by_id = {}
        for r in out:
            by_id.setdefault(r.media_id, []).append(r.frame_idx)
            img = png_decode(bytes(r.frame))  # sampled frames are PNG
            assert img is not None and img.shape == (24, 32, 3)
        assert all(sorted(v) == [0, 4, 8] for v in by_id.values())


class TestAviDib:
    """Uncompressed (BI_RGB 24-bit) AVI: DIB frames are bottom-up BGR
    with 4-byte-padded rows — decode must unpad, flip, and reorder
    channels exactly."""

    def _frames(self, n=3, w=5, h=4):
        rng = np.random.default_rng(11)
        return [
            rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
            for _ in range(n)
        ]

    def test_roundtrip_odd_width_padding(self):
        from usgs_geomag_algorithms_spark.operators.multimodal import (
            avi_dib_encode,
            avi_dib_frames,
        )

        frames = self._frames(n=3, w=5, h=4)  # stride 15 -> padded to 16
        payload = avi_dib_encode(frames, fps=12.0)
        parsed = avi_dib_frames(payload)
        assert parsed is not None
        got, fps = parsed
        assert abs(fps - 12.0) < 0.01 and len(got) == 3
        for a, b in zip(got, frames):
            assert np.array_equal(a, b)

    def test_rejects_mjpeg_and_malformed(self):
        from usgs_geomag_algorithms_spark.operators.multimodal import (
            avi_dib_encode,
            avi_dib_frames,
            avi_mjpeg_frames,
        )

        frames = self._frames(n=2, w=4, h=4)
        payload = avi_dib_encode(frames)
        # the MJPEG walker refuses DIB payloads and vice versa
        assert avi_mjpeg_frames(payload) is None
        assert avi_dib_frames(b"RIFF\x00\x00\x00\x00WAVE") is None
        assert avi_dib_frames(payload[:-20]) is None  # truncated frame

    def test_extract_frames_dib_path(self, spark):
        from usgs_geomag_algorithms_spark.operators.multimodal import (
            avi_dib_encode,
            extract_frames,
            png_decode,
        )

        frames = self._frames(n=5, w=6, h=4)
        payload = avi_dib_encode(frames, fps=10.0)
        df = spark.createDataFrame(
            [(7, bytearray(payload))], "media_id long, payload binary"
        )
        rows = extract_frames(df, every_n=2).collect()
        assert sorted(r.frame_idx for r in rows) == [0, 2, 4]
        for r in rows:
            assert (r.width, r.height) == (6, 4)
            assert np.array_equal(
                png_decode(bytes(r.frame)), frames[r.frame_idx]
            )
