"""FLAC codec (operators/flac_codec.py): encoder/decoder round-trips,
spec features the encoder doesn't emit (hand-crafted streams), CRC/MD5
integrity checks, and the Spark audio_decode dispatch."""

import struct

import numpy as np
import pytest

from usgs_geomag_algorithms_spark.operators import flac_codec as FC


def rt(pcm, rate=8000, bits=16):
    enc = FC.flac_encode(np.asarray(pcm), rate, bits=bits)
    dec = FC.flac_decode_int(enc)
    assert dec is not None
    out, r, b = dec
    assert r == rate and b == bits
    return enc, out


class TestRoundTrip:
    def test_stereo_smooth_compresses_and_is_bitexact(self):
        rng = np.random.default_rng(7)
        t = np.arange(10_000)
        sig = (3000 * np.sin(t / 50) + rng.normal(0, 60, t.size)).astype(
            np.int64
        )
        st = np.stack([sig, sig // 2 + 100], axis=1)
        enc, out = rt(st, rate=44_100)
        assert (out == st).all()
        assert len(enc) < 0.75 * st.size * 2  # genuinely compresses

    def test_mono_noise(self):
        rng = np.random.default_rng(3)
        x = rng.integers(-32768, 32767, size=5000, dtype=np.int64)
        _, out = rt(x)
        assert (out[:, 0] == x).all()

    def test_multiblock_and_partial_tail(self):
        # 3 blocks: 4096 + 4096 + 808
        x = (np.arange(9000) % 7919 - 4000).astype(np.int64)
        _, out = rt(x)
        assert (out[:, 0] == x).all()

    def test_constant_and_tiny(self):
        _, out = rt(np.full(100, -5, dtype=np.int64))
        assert (out[:, 0] == -5).all()
        _, out = rt(np.array([1, -2, 3], dtype=np.int64))
        assert list(out[:, 0]) == [1, -2, 3]

    def test_8bit(self):
        x = (np.arange(300) % 200 - 100).astype(np.int64)
        _, out = rt(x, bits=8)
        assert (out[:, 0] == x).all()

    def test_float_entry_scaling(self):
        x = np.array([16384, -16384, 0], dtype=np.int64)
        enc = FC.flac_encode(x, 8000)
        f, rate = FC.flac_decode(enc)
        assert rate == 8000
        assert np.allclose(f[:, 0], [0.5, -0.5, 0.0])


class TestIntegrity:
    def setup_method(self):
        x = (np.arange(2000) % 997 - 400).astype(np.int64)
        self.pcm = x
        self.enc = bytearray(FC.flac_encode(x, 8000))

    def test_frame_crc16_tamper_detected(self):
        self.enc[-3] ^= 0x40  # inside the last frame body
        assert FC.flac_decode_int(bytes(self.enc)) is None

    def test_header_crc8_tamper_detected(self):
        # frame header starts right after 4 magic + 4 block hdr + 34 info
        self.enc[42 + 2] ^= 0x01  # channel/bps nibble byte
        assert FC.flac_decode_int(bytes(self.enc)) is None

    def test_md5_mismatch_detected(self):
        # corrupt the STREAMINFO MD5 (bytes 8+18 .. of the 34-byte body)
        self.enc[8 + 18] ^= 0xFF
        assert FC.flac_decode_int(bytes(self.enc)) is None

    def test_not_flac(self):
        assert FC.flac_decode_int(b"RIFFxxxxWAVE") is None
        assert FC.flac_decode_int(b"") is None

    def test_reserved_sample_size_code_rejected(self):
        # set the first frame's sample-size code to the reserved value 3
        # and re-sign the header CRC-8 so ONLY the reserved code trips
        # (ADVICE r3: it used to fall back to the STREAMINFO depth)
        import pytest

        f = 42  # frame start: 4 magic + 4 block hdr + 34 STREAMINFO
        enc = bytearray(self.enc)
        enc[f + 3] = (enc[f + 3] & ~0x0E) | (3 << 1)
        enc[f + 5] = FC.crc8(bytes(enc[f : f + 5]))
        with pytest.raises(ValueError, match="reserved"):
            FC._flac_decode_int(bytes(enc))
        assert FC.flac_decode_int(bytes(enc)) is None

    def test_encode_range_guards(self):
        import pytest

        with pytest.raises(ValueError, match="20 bits"):
            FC.flac_encode(self.pcm, 1 << 20)
        with pytest.raises(ValueError, match="20 bits"):
            FC.flac_encode(self.pcm, 0)
        # broadcast view: 2^36 logical rows without allocating them
        huge = np.broadcast_to(np.int64(0), (1 << 36,))
        with pytest.raises(ValueError, match="36 bits"):
            FC.flac_encode(huge, 8000)


# --------------------------------------------------- hand-crafted streams
def craft(n_ch, bits, bs, write_subframes, pcm, rate=8000, ch_code=None):
    """One-frame stream exercising decoder paths the encoder never emits."""
    w = FC._BitWriter()
    w.write(0b11111111111110, 14)
    w.write(0, 2)
    w.write(7, 4)  # 16-bit block size follows
    w.write(0, 4)  # rate from STREAMINFO
    w.write(ch_code if ch_code is not None else n_ch - 1, 4)
    w.write({8: 1, 16: 4}.get(bits, 0), 3)
    w.write(0, 1)
    w.write(0, 8)  # frame number 0
    w.write(bs - 1, 16)
    hdr = bytes(w.buf)
    w.write(FC.crc8(hdr), 8)
    write_subframes(w)
    w.align()
    body = w.bytes()
    frame = body + struct.pack(">H", FC.crc16(body))

    si = bytearray()
    si += struct.pack(">H", bs) * 2
    si += b"\0\0\0" * 2
    packed = (rate << 44) | ((n_ch - 1) << 41) | ((bits - 1) << 36) | bs
    si += struct.pack(">Q", packed)
    si += FC._pcm_md5(np.asarray(pcm, dtype=np.int64), bits)
    return FC.MAGIC + bytes([0x80]) + struct.pack(">I", 34)[1:] + bytes(si) + frame


def write_verbatim(w, vals, bits):
    w.write(0, 1)
    w.write(1, 6)
    w.write(0, 1)
    for v in vals:
        w.write(int(v), bits)


class TestDecoderFeatures:
    def test_constant_subframe(self):
        pcm = np.full((16, 1), 9, dtype=np.int64)

        def subs(w):
            w.write(0, 1)
            w.write(0, 6)  # CONSTANT
            w.write(0, 1)
            w.write(9, 16)

        out, rate, bits = FC.flac_decode_int(craft(1, 16, 16, subs, pcm))
        assert (out[:, 0] == 9).all()

    def test_verbatim_subframe(self):
        vals = [5, -6, 100, -32768, 32767, 0, 1, -1]
        pcm = np.array(vals, dtype=np.int64)[:, None]
        out, _, _ = FC.flac_decode_int(
            craft(1, 16, len(vals), lambda w: write_verbatim(w, vals, 16), pcm)
        )
        assert list(out[:, 0]) == vals

    def test_left_side_stereo(self):
        L = np.array([100, 120, 90, 80], dtype=np.int64)
        R = np.array([90, 110, 100, 70], dtype=np.int64)
        pcm = np.stack([L, R], axis=1)

        def subs(w):
            write_verbatim(w, L, 16)
            write_verbatim(w, L - R, 17)  # side gets +1 bit

        out, _, _ = FC.flac_decode_int(craft(2, 16, 4, subs, pcm, ch_code=8))
        assert (out == pcm).all()

    def test_right_side_stereo(self):
        L = np.array([-5, 7, 3], dtype=np.int64)
        R = np.array([2, -9, 3], dtype=np.int64)
        pcm = np.stack([L, R], axis=1)

        def subs(w):
            write_verbatim(w, L - R, 17)  # side first, +1 bit
            write_verbatim(w, R, 16)

        out, _, _ = FC.flac_decode_int(craft(2, 16, 3, subs, pcm, ch_code=9))
        assert (out == pcm).all()

    def test_mid_side_stereo(self):
        L = np.array([1001, -350, 77, 0], dtype=np.int64)
        R = np.array([999, -351, -77, 3], dtype=np.int64)
        pcm = np.stack([L, R], axis=1)
        mid, side = (L + R) >> 1, L - R

        def subs(w):
            write_verbatim(w, mid, 16)
            write_verbatim(w, side, 17)

        out, _, _ = FC.flac_decode_int(craft(2, 16, 4, subs, pcm, ch_code=10))
        assert (out == pcm).all()

    def test_lpc_subframe(self):
        # x[i] = ((3*x[i-1] - 1*x[i-2]) >> 1) + e[i]
        warm = [10, 14]
        coefs = [3, -1]
        shift = 1
        resid = [2, -1, 0, 3]
        x = list(warm)
        for e in resid:
            x.append(((coefs[0] * x[-1] + coefs[1] * x[-2]) >> shift) + e)
        pcm = np.array(x, dtype=np.int64)[:, None]

        def subs(w):
            w.write(0, 1)
            w.write(32 + len(coefs) - 1, 6)  # LPC order 2
            w.write(0, 1)
            for v in warm:
                w.write(v, 16)
            w.write(15 - 1, 4)  # precision 15
            w.write(shift, 5)
            for c in coefs:
                w.write(c, 15)
            w.write(0, 2)  # rice method 0
            w.write(0, 4)  # one partition
            w.write(2, 4)  # rice param 2
            for e in resid:
                u = (e << 1) ^ (e >> 63) if e >= 0 else ((-e) << 1) - 1
                w.write_unary(u >> 2)
                w.write(u, 2)

        out, _, _ = FC.flac_decode_int(craft(1, 16, len(x), subs, pcm))
        assert list(out[:, 0]) == x

    def test_rice2_and_partitions_and_escape(self):
        # FIXED order 0, method 1 (5-bit params), 2 partitions:
        # partition 0 rice2 param 3, partition 1 escaped raw 6-bit
        vals = [3, -4, 10, -1, 31, -31, 17, -9]
        pcm = np.array(vals, dtype=np.int64)[:, None]

        def subs(w):
            w.write(0, 1)
            w.write(8, 6)  # FIXED order 0
            w.write(0, 1)
            w.write(1, 2)  # rice2
            w.write(1, 4)  # partition order 1 -> 2 partitions
            w.write(3, 5)  # param 3
            for e in vals[:4]:
                u = (e << 1) ^ (e >> 63) if e >= 0 else ((-e) << 1) - 1
                w.write_unary(u >> 3)
                w.write(u, 3)
            w.write(31, 5)  # escape
            w.write(6, 5)  # 6 raw bits
            for e in vals[4:]:
                w.write(e, 6)

        out, _, _ = FC.flac_decode_int(craft(1, 16, len(vals), subs, pcm))
        assert list(out[:, 0]) == vals

    def test_wasted_bits(self):
        vals = [8, -16, 24, 0]  # all divisible by 8 -> 3 wasted bits
        pcm = np.array(vals, dtype=np.int64)[:, None]

        def subs(w):
            w.write(0, 1)
            w.write(1, 6)  # VERBATIM
            w.write(1, 1)  # wasted flag
            w.write_unary(2)  # unary 2 -> wasted = 3
            for v in vals:
                w.write(v >> 3, 13)  # 16 - 3 wasted

        out, _, _ = FC.flac_decode_int(craft(1, 16, len(vals), subs, pcm))
        assert list(out[:, 0]) == vals

    def test_fixed_order_4_restore(self):
        # pure decoder math check across all fixed orders
        rng = np.random.default_rng(11)
        x = np.cumsum(np.cumsum(rng.integers(-3, 4, 64))) + 17
        for order in range(5):
            resid = FC._fixed_residual(x, order)
            back = FC._fixed_restore(x[:order], resid, order)
            assert (back == x).all(), order


class TestSparkDispatch:
    def test_waveform_stats_flac_equals_wav(self, spark):
        from usgs_geomag_algorithms_spark.operators.multimodal import (
            waveform_stats,
            wav_encode,
        )

        rng = np.random.default_rng(5)
        t = np.arange(4000)
        sig = 0.4 * np.sin(2 * np.pi * 220 * t / 8000) + rng.normal(
            0, 0.01, t.size
        )
        st = np.stack([sig, 0.5 * sig], axis=1)
        wav = wav_encode(st, 8000)
        pcm16 = np.clip(np.rint(st * 32768.0), -32768, 32767).astype(np.int64)
        flac = FC.flac_encode(pcm16, 8000)
        assert len(flac) < len(wav)  # the lossless win is real
        df = spark.createDataFrame(
            [(0, bytearray(wav)), (1, bytearray(flac))],
            "media_id long, payload binary",
        )
        rows = {
            r.media_id: r for r in waveform_stats(df).collect()
        }
        a, b = rows[0], rows[1]
        for f in ("n_samples", "n_channels", "sample_rate", "sum_v",
                  "sum_abs", "min_v", "max_v", "zero_crossings"):
            assert getattr(a, f) == getattr(b, f), f

    def test_resample_flac_payload(self, spark):
        from usgs_geomag_algorithms_spark.operators.multimodal import (
            resample_audio,
            wav_decode,
        )

        x = np.rint(
            10000 * np.sin(2 * np.pi * 110 * np.arange(8000) / 8000)
        ).astype(np.int64)
        flac = FC.flac_encode(x, 8000)
        df = spark.createDataFrame(
            [(0, bytearray(flac))], "media_id long, payload binary"
        )
        out = resample_audio(df, target_rate=4000).collect()[0]
        assert out.sample_rate == 8000
        dec = wav_decode(bytes(out.resampled))
        assert dec is not None
        assert dec[0].shape[0] == pytest.approx(4000, rel=0.01)
