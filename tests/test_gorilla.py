"""Gorilla codec round-trip properties (FIXTURES F8) + segment operators."""

import numpy as np
from hypothesis import given, settings, strategies as st

from usgs_geomag_algorithms_spark.functions import gorilla as G
from usgs_geomag_algorithms_spark.operators.segments import (
    pack_segments,
    unpack_segments,
)
from usgs_geomag_algorithms_spark.tiers import US

T0 = 1577836800 * US


class TestCodecProperties:
    @given(
        st.lists(
            st.one_of(
                st.floats(allow_nan=True, allow_infinity=True, width=64),
                st.just(float("nan")),
                st.just(0.0),
                st.just(-0.0),
                st.just(5e-324),  # denormal
            ),
            max_size=300,
        )
    )
    @settings(max_examples=200, deadline=None)
    def test_values_roundtrip_bit_exact(self, vals):
        arr = np.array(vals, dtype=np.float64)
        dec = G.decode_values(G.encode_values(arr), len(arr))
        assert np.array_equal(arr.view(np.uint64), dec.view(np.uint64))

    @given(
        st.lists(
            st.integers(min_value=1, max_value=10**9), max_size=200
        ),
        st.integers(min_value=0, max_value=2**50),
    )
    @settings(max_examples=200, deadline=None)
    def test_timestamps_roundtrip(self, deltas, t0):
        ts = (t0 + np.cumsum([0] + deltas)).astype(np.int64)
        dec = G.decode_timestamps(G.encode_timestamps(ts), len(ts))
        assert np.array_equal(ts, dec)

    def test_regular_grid_compression_ratio(self):
        ts = T0 + np.arange(3600, dtype=np.int64) * US
        enc = G.encode_timestamps(ts)
        assert len(enc) < 3600 * 0.2  # ~1 bit/sample + header
        vals = np.full(3600, 20821.5)
        assert len(G.encode_values(vals)) < 3600 * 0.2

    def test_center_stamped_grids(self):
        # hour grid stamped HH:29:30 and day grid 11:59:30 (F8)
        hour = T0 + (29 * 60 + 30) * US + np.arange(48, dtype=np.int64) * 3600 * US
        day = T0 + (11 * 3600 + 59 * 60 + 30) * US + np.arange(30, dtype=np.int64) * 86400 * US
        for ts in (hour, day):
            assert np.array_equal(
                G.decode_timestamps(G.encode_timestamps(ts), len(ts)), ts
            )


class TestSegments:
    def test_pack_unpack_roundtrip(self, spark):
        rng = np.random.default_rng(12)
        rows = []
        for url in ("u1", "u2"):
            for i in range(300):
                v = None if rng.random() < 0.05 else float(rng.normal(100, 3))
                rows.append((url, "text_len", T0 + i * 60 * US, v))
        df = spark.createDataFrame(
            rows, schema="url string, channel string, t_us long, value double"
        )
        segs = pack_segments(df, segment_us=3600 * US)
        seg_rows = segs.collect()
        assert all(r.n > 0 for r in seg_rows)
        assert {r.seg_start_us % (3600 * US) for r in seg_rows} == {0}
        back = unpack_segments(segs)
        a = sorted(map(tuple, df.collect()))
        b = sorted(map(tuple, back.collect()))
        assert a == b

    def test_compression_beats_raw(self, spark):
        rows = [
            ("u", "c", T0 + i * 60 * US, 42.0) for i in range(3600)
        ]
        df = spark.createDataFrame(
            rows, schema="url string, channel string, t_us long, value double"
        )
        segs = pack_segments(df, segment_us=86400 * US).collect()
        packed = sum(len(r.ts_codec) + len(r.val_codec) for r in segs)
        assert packed < 3600 * 16 * 0.1  # >10x vs raw (ts+val = 16 B/row)
