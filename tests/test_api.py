"""Web-service request contract (plans/api.py): DataApiQuery-parity
validation, /data dispatch to the tier store with both renderings, and
the element/observatory metadata registries."""

import json

import pytest
from pyspark.sql import functions as F  # noqa: F401

from usgs_geomag_algorithms_spark.plans.api import (
    DEFAULT_ELEMENTS,
    DataRequest,
    ELEMENTS,
    OBSERVATORIES,
    parse_data_request,
    elements_df,
    observatories_df,
    observatory_geojson,
    serve_data_request,
)
from usgs_geomag_algorithms_spark.sources.store import TierStore
from usgs_geomag_algorithms_spark.tiers import US

T0 = 1577836800 * US  # 2020-01-01T00:00:00Z
MIN = 60 * US
NOW = T0 + 7 * 3600 * US  # mid-day "now" for default-time tests


class TestParseDataRequest:
    def test_defaults(self):
        req = parse_data_request({"id": "BOU"}, now_us=NOW)
        assert req.observatory == "BOU"
        assert req.elements == DEFAULT_ELEMENTS
        assert req.sampling_period == 60.0
        assert req.data_type == "variation"
        assert req.format == "iaga2002"
        # start of current UTC day; end = start + 86400 - 0.001 s
        assert req.start_us == T0
        assert req.end_us == T0 + 86_400_000_000 - 1_000

    def test_comma_separated_elements(self):
        req = parse_data_request(
            {"id": "BOU", "elements": "H, E ,Z"}, now_us=NOW
        )
        assert req.elements == ("H", "E", "Z")

    def test_unknown_param_rejected(self):
        with pytest.raises(ValueError, match="Invalid query parameter"):
            parse_data_request({"id": "BOU", "bogus": 1}, now_us=NOW)

    def test_bad_observatory(self):
        with pytest.raises(ValueError, match="Bad observatory id 'XXX'"):
            parse_data_request({"id": "XXX"}, now_us=NOW)

    def test_bad_element_but_3letter_codes_pass(self):
        with pytest.raises(ValueError, match="Bad element 'Q'"):
            parse_data_request({"id": "BOU", "elements": "Q"}, now_us=NOW)
        # raw 3-letter EDGE channel codes are allowed
        req = parse_data_request(
            {"id": "BOU", "elements": "MVH"}, now_us=NOW
        )
        assert req.elements == ("MVH",)

    def test_edge_location_code_as_type(self):
        req = parse_data_request(
            {"id": "BOU", "type": "R0"}, now_us=NOW
        )
        assert req.data_type == "R0"
        with pytest.raises(ValueError, match="Bad data type"):
            parse_data_request({"id": "BOU", "type": "bogus"}, now_us=NOW)

    def test_iaga2002_element_ceiling(self):
        with pytest.raises(ValueError, match="four elements"):
            parse_data_request(
                {"id": "BOU", "elements": "H,E,Z,F,G"}, now_us=NOW
            )
        # json format allows more
        req = parse_data_request(
            {"id": "BOU", "elements": "H,E,Z,F,G", "format": "json"},
            now_us=NOW,
        )
        assert len(req.elements) == 5

    def test_time_order_and_sample_cap(self):
        with pytest.raises(ValueError, match="Starttime must be before"):
            parse_data_request(
                {
                    "id": "BOU",
                    "starttime": "2020-01-02T00:00:00Z",
                    "endtime": "2020-01-01T00:00:00Z",
                },
                now_us=NOW,
            )
        # 4 elements x 7 days at 1 s >> 345600
        with pytest.raises(ValueError, match="exceeds limit"):
            parse_data_request(
                {
                    "id": "BOU",
                    "starttime": "2020-01-01T00:00:00Z",
                    "endtime": "2020-01-08T00:00:00Z",
                    "sampling_period": 1,
                },
                now_us=NOW,
            )

    def test_sampling_period_enum(self):
        for sp, ok in ((0.1, True), (1, True), (7, False)):
            if ok:
                parse_data_request(
                    {
                        "id": "BOU",
                        "sampling_period": sp,
                        "starttime": "2020-01-01T00:00:00Z",
                        "endtime": "2020-01-01T00:10:00Z",
                    },
                    now_us=NOW,
                )
            else:
                with pytest.raises(ValueError, match="Bad sampling_period"):
                    parse_data_request(
                        {"id": "BOU", "sampling_period": sp}, now_us=NOW
                    )


class TestServeDataRequest:
    def seed(self, spark, tmp_path):
        store = TierStore(spark, str(tmp_path / "t"), n_buckets=2)
        rows = []
        for i in range(5):
            rows += [
                ("BOU", "H", T0 + i * MIN, 20000.0 + i),
                ("BOU", "E", T0 + i * MIN, -100.0 + i),
                ("BOU", "Z", T0 + i * MIN, 47000.0 + i),
            ]
        df = spark.createDataFrame(
            rows, schema="url string, channel string, t_us long, value double"
        )
        store.write(df, "minute")
        return store

    def _req(self, fmt, elements="H,E,Z"):
        return parse_data_request(
            {
                "id": "BOU",
                "starttime": "2020-01-01T00:00:00Z",
                "endtime": "2020-01-01T00:04:00Z",
                "elements": elements,
                "format": fmt,
            },
            now_us=NOW,
        )

    def test_json_rendering(self, spark, tmp_path):
        store = self.seed(spark, tmp_path)
        df, media = serve_data_request(store, self._req("json"))
        assert media == "application/json"
        rows = {r["channel"]: json.loads(r["json"]) for r in df.collect()}
        assert set(rows) == {"H", "E", "Z"}
        assert rows["H"]["values"] == [20000.0 + i for i in range(5)]

    def test_iaga2002_rendering(self, spark, tmp_path):
        store = self.seed(spark, tmp_path)
        df, media = serve_data_request(store, self._req("iaga2002"))
        assert media == "text/plain"
        lines = [r["value"] for r in df.collect()]
        assert lines[0].startswith(" Format                 IAGA-2002")
        data = [ln for ln in lines if ln.startswith("2020-01-01")]
        assert len(data) == 5
        assert "20000.00" in data[0] and "99999.00" not in data[0]

    def test_derive_missing_channel_on_read(self, spark, tmp_path):
        """Request X,Y over an H,D store: the derive-on-read path (the
        DerivedTimeseriesFactory wrap) computes them in the serve plan
        (X/Y derive from H/D per DerivedTimeseriesFactory's rules)."""
        store = TierStore(spark, str(tmp_path / "hd"), n_buckets=2)
        rows = []
        for i in range(5):
            rows += [
                ("BOU", "H", T0 + i * MIN, 20000.0 + i),
                ("BOU", "D", T0 + i * MIN, 0.01 + i * 1e-4),
            ]
        store.write(
            spark.createDataFrame(
                rows,
                schema="url string, channel string, t_us long, value double",
            ),
            "minute",
        )
        req = parse_data_request(
            {
                "id": "BOU",
                "starttime": "2020-01-01T00:00:00Z",
                "endtime": "2020-01-01T00:04:00Z",
                "elements": "X,Y",
                "format": "json",
            },
            now_us=NOW,
        )
        df, _ = serve_data_request(store, req)
        rows = {r["channel"]: json.loads(r["json"]) for r in df.collect()}
        assert set(rows) == {"X", "Y"}
        assert all(v is not None for v in rows["X"]["values"])

    def test_gap_rows_render_as_sentinels(self, spark, tmp_path):
        store = self.seed(spark, tmp_path)
        req = parse_data_request(
            {
                "id": "BOU",
                "starttime": "2020-01-01T00:00:00Z",
                "endtime": "2020-01-01T00:06:00Z",  # 2 slots past data
                "elements": "H,E,Z",
            },
            now_us=NOW,
        )
        df, _ = serve_data_request(store, req)
        data = [
            r["value"] for r in df.collect()
            if r["value"].startswith("2020-01-01")
        ]
        assert len(data) == 7
        assert "99999.00" in data[-1]  # padded gap -> IAGA sentinel


class TestRegistries:
    def test_elements_and_observatories_queryable(self, spark):
        el = elements_df(spark)
        assert el.count() == len(ELEMENTS)
        assert el.where("id = 'G'").first()["abbreviation"] == "ΔF"
        obs = observatories_df(spark)
        assert obs.count() == len(OBSERVATORIES)
        row = obs.where("id = 'BOU'").first()
        assert row["agency_name"].startswith("United States")
        assert row["sensor_orientation"] == "HDZF"
        # GSC default orientation differs
        assert (
            obs.where("id = 'OTT'").first()["sensor_orientation"] == "XYZF"
        )

    def test_geojson_feature(self):
        g = observatory_geojson("BOU")
        assert g["type"] == "Feature" and g["id"] == "BOU"
        assert g["geometry"]["coordinates"] == [254.763, 40.137, 1682]
        assert g["properties"]["declination_base"] == 5527
        with pytest.raises(ValueError):
            observatory_geojson("nope")

    def test_request_dataclass_frozen(self):
        req = DataRequest("BOU", 0, 1)
        with pytest.raises(Exception):
            req.observatory = "XXX"


class TestAlgorithmsEndpoints:
    """/algorithms/dbdt and /algorithms/residual contract parity."""

    def seed(self, spark, tmp_path):
        store = TierStore(spark, str(tmp_path / "t"), n_buckets=2)
        rows = []
        for i in range(5):
            rows += [
                ("BOU", "H", T0 + i * MIN, 20000.0 + i * i),
                ("BOU", "E", T0 + i * MIN, -100.0 + 2 * i),
            ]
        store.write(
            spark.createDataFrame(
                rows,
                schema="url string, channel string, t_us long, value double",
            ),
            "minute",
        )
        return store

    def _req(self, fmt="json"):
        return parse_data_request(
            {
                "id": "BOU",
                "starttime": "2020-01-01T00:00:00Z",
                "endtime": "2020-01-01T00:04:00Z",
                "elements": "H,E",
                "format": fmt,
            },
            now_us=NOW,
        )

    def test_dbdt_json(self, spark, tmp_path):
        from usgs_geomag_algorithms_spark.plans.api import serve_dbdt_request

        store = self.seed(spark, tmp_path)
        df, media = serve_dbdt_request(store, self._req("json"))
        assert media == "application/json"
        rows = {r["channel"]: json.loads(r["json"]) for r in df.collect()}
        # reference naming: <element>_DT; first slot dropped (diff)
        assert set(rows) == {"H_DT", "E_DT"}
        assert rows["H_DT"]["values"] == [1.0, 3.0, 5.0, 7.0]
        assert rows["E_DT"]["values"] == [2.0, 2.0, 2.0, 2.0]

    def test_dbdt_iaga_lines(self, spark, tmp_path):
        from usgs_geomag_algorithms_spark.plans.api import serve_dbdt_request

        store = self.seed(spark, tmp_path)
        df, media = serve_dbdt_request(store, self._req("iaga2002"))
        assert media == "text/plain"
        lines = [r["value"] for r in df.collect()]
        assert any("BOUH_DT" in ln for ln in lines)
        data = [ln for ln in lines if ln.startswith("2020-01-01")]
        assert len(data) == 4

    def test_residual_endpoint_roundtrip(self):
        """POST /algorithms/residual contract over a real recorded
        session: absolutes repopulated, scale/diagnostics present, other
        reading fields shallow-copied, ValueError on missing types."""
        import os

        from usgs_geomag_algorithms_spark.plans.api import residual_request

        fixture = "/root/reference/etc/residual/BOU20191001.json"
        if not os.path.exists(fixture):
            pytest.skip("reference fixtures not available")
        raw = json.load(open(fixture))
        session = next(
            r for r in raw
            if all(
                a.get("valid")
                for a in r["absolutes"]
            )
        )
        out = residual_request(dict(session), adjust_reference=False)
        got = {a["element"]: a for a in out["absolutes"]}
        exp = {a["element"]: a for a in session["absolutes"]}
        for el in ("D", "Z"):
            assert got[el]["absolute"] == pytest.approx(
                exp[el]["absolute"], abs=2e-4
            )
        assert got["H"]["absolute"] == pytest.approx(
            exp["H"]["absolute"], abs=2e-4
        )
        assert out["diagnostics"]["inclination"] is not None
        assert out["azimuth"] == session["azimuth"]  # shallow copy
        # missing measurement types -> ValueError (the endpoint's 400)
        broken = dict(session)
        broken["measurements"] = [
            m for m in session["measurements"]
            if m["measurement_type"] != "WestDown"
        ]
        with pytest.raises(ValueError, match="Missing"):
            residual_request(broken)


class TestMetadataEndpoint:
    """GET /metadata search contract (geomagio/api/ws/metadata.py) over
    the MetadataStore relation."""

    @pytest.fixture()
    def store(self, spark, tmp_path):
        from usgs_geomag_algorithms_spark.sources.metadata import (
            MetadataStore,
        )

        st = MetadataStore(spark, str(tmp_path / "m"))
        st.create([
            {"station": "BOU", "network": "NT", "channel": "BEU",
             "category": "flag", "data_valid": False,
             "starttime_us": 0, "endtime_us": 10_000_000},
            {"station": "BOU", "network": "NT", "category": "instrument",
             "starttime_us": None, "endtime_us": None},
            {"station": "FRD", "network": "NT", "category": "flag",
             "status": "reviewed"},
        ])
        return st

    def test_search_filters(self, store):
        from usgs_geomag_algorithms_spark.plans.api import (
            serve_metadata_request,
        )

        md = store.read()
        got = serve_metadata_request(md, {"station": "BOU"}).collect()
        assert len(got) == 2
        got = serve_metadata_request(
            md, {"category": "flag", "data_valid": "false"}
        ).collect()
        assert len(got) == 1 and got[0].channel == "BEU"
        got = serve_metadata_request(md, {"status": "reviewed"}).collect()
        assert len(got) == 1 and got[0].station == "FRD"
        # open-bound overlap: starttime after the flag's end drops it but
        # keeps NULL-ended rows
        got = serve_metadata_request(
            md, {"starttime": "1970-01-01T00:00:20"}
        ).collect()
        assert {r.category for r in got} == {"instrument", "flag"}
        assert all(r.endtime_us is None for r in got)

    def test_bad_params_rejected(self, store):
        from usgs_geomag_algorithms_spark.plans.api import (
            serve_metadata_request,
        )

        md = store.read()
        with pytest.raises(ValueError, match="Unknown query"):
            serve_metadata_request(md, {"id": 3})
        with pytest.raises(ValueError, match="Bad category"):
            serve_metadata_request(md, {"category": "bogus"})
        with pytest.raises(ValueError, match="Bad data_valid"):
            serve_metadata_request(md, {"data_valid": "maybe"})


# ------------------- /observatories + /elements endpoint contracts (r5)
REF_WS = "/root/reference/geomagio/api/ws"


def _ref_calls(path, cls):
    """Parse the reference's in-code pydantic tables (``Observatory(...)``
    / ``Element(...)`` literal calls) into keyword dicts — the fixture
    the endpoint contract is checked against, read straight from the
    reference source rather than re-transcribed."""
    import ast

    tree = ast.parse(open(path).read())
    out = []
    for node in ast.walk(tree):
        if (
            isinstance(node, ast.Call)
            and isinstance(node.func, ast.Name)
            and node.func.id == cls
            and node.keywords
        ):
            out.append(
                {kw.arg: ast.literal_eval(kw.value) for kw in node.keywords}
            )
    return out


@pytest.mark.skipif(
    not __import__("os").path.isdir(REF_WS), reason="reference not present"
)
class TestObservatoriesElementsEndpoints:
    def _ref_observatory_geojson(self, o):
        """The reference's Observatory validators + geojson
        (Observatory.py:16-70) applied to a parsed literal."""
        agency = o["agency"]
        names = {
            "USGS": "United States Geological Survey (USGS)",
            "GSC": "Geological Survey of Canada (GSC)",
            "BGS": "British Geological Survey (BGS)",
            "SANSA": "South African National Space Agency (SANSA)",
            "JMA": "Japan Meteorological Agency (JMA)",
        }
        return {
            "type": "Feature",
            "id": o["id"],
            "properties": {
                "name": o["name"],
                "agency": agency,
                "agency_name": o.get("agency_name") or names.get(agency),
                "sensor_orientation": o.get("sensor_orientation")
                or ("XYZF" if agency == "GSC" else "HDZF"),
                "sensor_sampling_rate": 0.01,
                "declination_base": o["declination_base"],
            },
            "geometry": {
                "type": "Point",
                "coordinates": [o["longitude"], o["latitude"], o["elevation"]],
            },
        }

    def test_get_observatories_matches_reference_table(self):
        from usgs_geomag_algorithms_spark.plans.api import get_observatories

        ref = _ref_calls(f"{REF_WS}/Observatory.py", "Observatory")
        expected = {
            "type": "FeatureCollection",
            "features": [self._ref_observatory_geojson(o) for o in ref],
        }
        got = get_observatories()
        assert {f["id"] for f in got["features"]} == {
            f["id"] for f in expected["features"]
        }
        by_id = {f["id"]: f for f in got["features"]}
        for f in expected["features"]:
            assert by_id[f["id"]] == f, f["id"]

    def test_get_observatory_by_id(self):
        from usgs_geomag_algorithms_spark.plans.api import (
            get_observatory_by_id,
        )

        bou = get_observatory_by_id("BOU")
        assert bou["properties"]["name"] == "Boulder"
        assert bou["geometry"]["coordinates"] == [254.763, 40.137, 1682]
        assert get_observatory_by_id("XXX") is None  # the router's 404

    def test_get_elements_matches_reference_table(self):
        from usgs_geomag_algorithms_spark.plans.api import get_elements

        ref = _ref_calls(f"{REF_WS}/Element.py", "Element")
        expected = []
        for e in ref:
            f = {
                "type": "Feature",
                "id": e["id"],
                "properties": {"name": e["name"], "units": e["units"]},
                "geometry": None,
            }
            if e.get("abbreviation"):
                f["properties"]["abbreviation"] = e["abbreviation"]
            expected.append(f)
        got = get_elements()
        assert got == {"type": "FeatureCollection", "features": expected}


class TestObservatoryDim:
    def test_store_rows_override_registry(self, spark, tmp_path):
        from usgs_geomag_algorithms_spark.plans.api import (
            get_observatories,
            observatory_dim,
        )
        from usgs_geomag_algorithms_spark.sources.metadata import (
            MetadataStore,
        )

        st = MetadataStore(spark, str(tmp_path / "m"))
        st.create([
            {
                "category": "observatory",
                "station": "BOU",
                "metadata": json.dumps({"name": "Boulder (renamed)",
                                        "elevation": 1700}),
            },
            {
                "category": "observatory",
                "station": "ZZZ",
                "metadata": json.dumps({
                    "name": "New Site", "agency": "GSC",
                    "latitude": 1.5, "longitude": 2.5, "elevation": 3,
                    "declination_base": 7,
                }),
            },
            # invalid rows are ignored
            {
                "category": "observatory", "station": "TUC",
                "data_valid": False,
                "metadata": json.dumps({"name": "nope"}),
            },
        ])
        dim = observatory_dim(spark, st.read())
        rows = {r.id: r for r in dim.collect()}
        assert rows["BOU"].name == "Boulder (renamed)"
        assert rows["BOU"].elevation == 1700
        assert rows["BOU"].latitude == 40.137  # absent key falls back
        assert rows["BOU"].in_registry and rows["BOU"].overridden
        assert rows["ZZZ"].agency_name == "Geological Survey of Canada (GSC)"
        assert rows["ZZZ"].sensor_orientation == "XYZF"  # GSC default
        assert not rows["ZZZ"].in_registry
        assert rows["TUC"].name == "Tucson"  # invalid override ignored
        assert not rows["TUC"].overridden
        # endpoint rendering over the merged dim
        doc = get_observatories(dim)
        feats = {f["id"]: f for f in doc["features"]}
        assert feats["BOU"]["properties"]["name"] == "Boulder (renamed)"
        assert feats["ZZZ"]["geometry"]["coordinates"] == [2.5, 1.5, 3]

    def test_latest_valid_row_wins(self, spark, tmp_path):
        from usgs_geomag_algorithms_spark.plans.api import observatory_dim
        from usgs_geomag_algorithms_spark.sources.metadata import (
            MetadataStore,
        )

        st = MetadataStore(spark, str(tmp_path / "m"))
        st.create(
            [{"category": "observatory", "station": "BOU",
              "metadata": json.dumps({"name": "old"})}],
            now_us=1_000,
        )
        st.create(
            [{"category": "observatory", "station": "BOU",
              "metadata": json.dumps({"name": "new"})}],
            now_us=2_000,
        )
        dim = observatory_dim(spark, st.read())
        assert dim.where(F.col("id") == "BOU").first().name == "new"
