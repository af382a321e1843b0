"""Streaming stateful SqDist: two micro-batches with state continuity must
match one batch run of the kernel."""

import time

import numpy as np
from pyspark.sql import functions as F

from usgs_geomag_algorithms_spark.operators.sqdist import (
    HWParams,
    HWState,
    holt_winters_additive,
)
from usgs_geomag_algorithms_spark.streaming.sqdist_stream import sqdist_streaming
from usgs_geomag_algorithms_spark.tiers import US

T0 = 1577836800 * US
M = 4


def test_two_microbatches_match_single_kernel_run(spark, tmp_path):
    rng = np.random.default_rng(33)
    y = np.sin(np.arange(48) * 2 * np.pi / M) + rng.normal(0, 0.05, 48)
    rows = lambda lo, hi: [
        ("u", "H", T0 + i * 60 * US, float(y[i])) for i in range(lo, hi)
    ]
    schema = "url string, channel string, t_us long, value double"
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    spark.createDataFrame(rows(0, 24), schema).write.mode("append").parquet(src)

    params = HWParams(m=M, alpha=0.1, beta=0.0, gamma=0.2)
    stream = spark.readStream.schema(schema).parquet(src)
    out = sqdist_streaming(stream, params, delta_s=60.0)
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("sq_stream")
        .option("checkpointLocation", ckpt)
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        q.processAllAvailable()
        n1 = spark.sql("SELECT count(*) c FROM sq_stream").first().c
        assert n1 == 24 * 4
        # second micro-batch continues from stored state
        spark.createDataFrame(rows(24, 48), schema).write.mode("append").parquet(src)
        deadline = time.time() + 120
        while time.time() < deadline:
            q.processAllAvailable()
            n2 = spark.sql("SELECT count(*) c FROM sq_stream").first().c
            if n2 == 48 * 4:
                break
            time.sleep(1)
        assert n2 == 48 * 4
    finally:
        q.stop()

    got = {
        (r.channel_out, r.t_us): r.value
        for r in spark.sql("SELECT * FROM sq_stream").collect()
    }
    # kernel oracle: identical chunking (24 + 24) with carried state
    st0 = None
    exp = {}
    p = params
    a_yhat, _, a_sig, st_mid = holt_winters_additive(y[:24], p, st0)
    b_yhat, _, b_sig, _ = holt_winters_additive(y[24:], p, st_mid)
    yhat = np.concatenate([a_yhat, b_yhat])
    sig = np.concatenate([a_sig, b_sig])
    for i in range(48):
        t = T0 + i * 60 * US
        exp[("Dist", t)] = y[i] - yhat[i]
        exp[("Sigma", t)] = sig[i]
    for k, v in exp.items():
        np.testing.assert_almost_equal(got[k], v, decimal=9, err_msg=str(k))
