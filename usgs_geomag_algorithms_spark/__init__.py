"""usgs_geomag_algorithms_spark — a from-scratch PySpark-native time-series
rollup + downsample + retention engine.

Re-imagines the query/data-processing capabilities of
sthagen/usgs-geomag-algorithms (reference at /root/reference, studied for
*what* it computes, not *how*) as continuous aggregates over long-format
tables of per-url signal channels derived from Common-Crawl-style web pages.

Architecture (Spark-first, no port):

- Long-format fact rows ``(series_id, channel, t_us, value)`` replace the
  reference's dense per-Trace numpy arrays (``geomagio/TimeseriesUtility.py:12-63``).
  Gaps are *absent rows or NULL values* — both are handled identically by
  every operator, so the engine never materializes null spines at scale.
- The FIR decimation cascade (``geomagio/algorithm/FilterAlgorithm.py:14-63``)
  is expressed as declarative DataFrame plans: boxcar "average" steps are a
  plain ``groupBy`` aggregate; "firfilter" steps explode each input sample to
  the (few) output buckets whose window contains it and look the tap weight
  up in a literal array — fully whole-stage-codegen'd, map-side partially
  aggregated, zero Python in the hot path.
- Sequential/stateful algorithms (Holt-Winters SqDist) run per-series inside
  Arrow-batched ``applyInPandas``; everything else is built-in SQL functions.
"""

__version__ = "0.1.0"
