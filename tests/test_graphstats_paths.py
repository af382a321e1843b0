"""Graph structure stats (triangles, degrees) and event-path analytics
(Markov transitions, conversion latency)."""

from usgs_geomag_algorithms_spark.operators.graphstats import (
    degree_histogram,
    triangle_participation,
    undirected_edges,
)
from usgs_geomag_algorithms_spark.operators.paths import (
    conversion_latency,
    event_transitions,
)


def _graph(spark):
    # triangle {1,2,3}; pendant 4; reversed duplicate + self-loop to
    # exercise canonicalization
    rows = [(1, 2), (2, 3), (1, 3), (3, 4), (2, 1), (2, 2)]
    return spark.createDataFrame(rows, "src long, dst long")


class TestGraphStats:
    def test_undirected_canonicalization(self, spark):
        und = {
            (r.u, r.v) for r in undirected_edges(_graph(spark)).collect()
        }
        assert und == {(1, 2), (2, 3), (1, 3), (3, 4)}

    def test_triangle_participation(self, spark):
        got = {
            r.id: r.n_triangles
            for r in triangle_participation(_graph(spark)).collect()
        }
        assert got == {1: 1, 2: 1, 3: 1}  # node 4 is triangle-free

    def test_two_triangles_share_edge(self, spark):
        rows = [(1, 2), (2, 3), (1, 3), (1, 4), (3, 4)]
        df = spark.createDataFrame(rows, "src long, dst long")
        got = {
            r.id: r.n_triangles
            for r in triangle_participation(df).collect()
        }
        # triangles {1,2,3} and {1,3,4} share edge (1,3)
        assert got == {1: 2, 3: 2, 2: 1, 4: 1}

    def test_degree_histogram(self, spark):
        got = {
            r.degree: r.n_nodes
            for r in degree_histogram(_graph(spark)).collect()
        }
        assert got == {1: 1, 2: 2, 3: 1}


def _stream(spark):
    rows = [
        ("A", 10, 1, "signup"),
        ("A", 15, 2, "purchase"),
        ("A", 16, 3, "view"),
        ("B", 20, 4, "signup"),
        ("B", 5, 5, "purchase"),  # purchase BEFORE signup: no conversion
        ("C", 7, 6, "purchase"),  # never signed up: not in any cohort
        ("D", 30, 7, "signup"),
        ("D", 30, 8, "purchase"),  # same timestamp: converts with lat 0
        ("D", 50, 9, "purchase"),
    ]
    return spark.createDataFrame(
        rows, "user_id string, t_us long, event_id long, event_type string"
    )


class TestPaths:
    def test_transitions(self, spark):
        got = {
            (r.state, r.next_state): (r.n, r.p)
            for r in event_transitions(
                _stream(spark),
                ("user_id",),
                "t_us",
                "event_type",
                ("event_id",),
            ).collect()
        }
        # A: signup->purchase->view; B: purchase->signup (t_us order!);
        # D: signup->purchase (tie broken by event_id) ->purchase
        assert got[("signup", "purchase")] == (2, 1.0)
        assert got[("purchase", "view")][0] == 1
        assert got[("purchase", "signup")][0] == 1
        assert got[("purchase", "purchase")][0] == 1
        assert abs(got[("purchase", "view")][1] - 1 / 3) < 1e-15

    def test_conversion_latency(self, spark):
        out = conversion_latency(
            _stream(spark), "signup", "purchase", day_us=1000
        ).collect()
        assert len(out) == 1
        r = out[0]
        assert r.cohort_day == 0
        assert r.n_triggered == 3  # A, B, D (C never triggered)
        assert r.n_converted == 2  # A (lat 5), D (lat 0); B's was earlier
        assert r.med_latency_us == 0  # LOW median of [0, 5]
        assert r.mean_latency_us == 2.5

    def test_no_converters_cohort(self, spark):
        rows = [("X", 10, 1, "signup")]
        df = spark.createDataFrame(
            rows,
            "user_id string, t_us long, event_id long, event_type string",
        )
        out = conversion_latency(df, "signup", "purchase", 1000).collect()
        assert len(out) == 1
        r = out[0]
        assert (r.n_triggered, r.n_converted) == (1, 0)
        assert r.med_latency_us is None and r.mean_latency_us is None
