import numpy as np
import pytest
from pyspark.sql import functions as F

from optbinning_spark import OptimalBinning
from optbinning_spark.streaming.sketch import (
    BinningProcessSketch,
    CentroidSketch,
    OptimalBinningSketch,
    streaming_binning_query,
)


def test_centroid_sketch_quantiles():
    sk = CentroidSketch(max_size=128)
    rng = np.random.RandomState(0)
    data = rng.uniform(0, 100, 10_000)
    for chunk in np.array_split(data, 10):
        sk.add(chunk, np.ones(len(chunk)))
    q = sk.quantiles([0.25, 0.5, 0.75])
    assert np.allclose(q, [25, 50, 75], atol=3.0)
    assert sk.total_weight == pytest.approx(10_000)


def test_centroid_sketch_merge_order_insensitive():
    rng = np.random.RandomState(1)
    a_data = rng.normal(0, 1, 5000)
    b_data = rng.normal(5, 1, 5000)
    s1 = CentroidSketch(256)
    s1.add(a_data, np.ones(5000))
    s2 = CentroidSketch(256)
    s2.add(b_data, np.ones(5000))
    s1.merge(s2)
    q = s1.quantiles([0.5])
    assert 2.0 < q[0] < 3.0


@pytest.fixture(scope="module")
def batches(spark):
    rng = np.random.RandomState(42)
    out = []
    for b in range(5):
        rows = []
        for i in range(1000):
            x = float(rng.uniform(0, 100))
            y = int(rng.rand() < (0.1 + 0.8 * x / 100))
            rows.append((x, y))
        out.append(spark.createDataFrame(rows, "x double, y int"))
    return out


def test_sketch_add_merge_solve_close_to_batch(spark, batches):
    sk = OptimalBinningSketch(monotonic_trend="ascending")
    for b in batches:
        sk.add(b, "x", "y")
    ob_sketch = sk.solve()
    # batch path on the union
    full = batches[0]
    for b in batches[1:]:
        full = full.union(b)
    ob_batch = OptimalBinning(prebinning_method="quantile",
                              monotonic_trend="ascending")
    ob_batch.fit(full, "x", "y")
    # tolerance-based comparison like the reference (rel=1e-2 spirit):
    # total IV within 10%, same monotone direction
    assert ob_sketch.binning_table.iv == pytest.approx(
        ob_batch.binning_table.iv, rel=0.15
    )
    rates = [
        r for r, k in zip(ob_sketch.binning_table.event_rate,
                          ob_sketch.binning_table.kinds) if k == "clean"
    ]
    assert all(rates[i + 1] >= rates[i] for i in range(len(rates) - 1))


def test_sketch_merge_equivalent_to_single(spark, batches):
    s1 = OptimalBinningSketch(monotonic_trend="ascending")
    s2 = OptimalBinningSketch(monotonic_trend="ascending")
    for b in batches[:2]:
        s1.add(b, "x", "y")
    for b in batches[2:]:
        s2.add(b, "x", "y")
    s1.merge(s2)
    combined = s1.solve()
    assert combined.binning_table.count.sum() == pytest.approx(5000)


def test_add_shards_state_identical_to_sequential(spark, batches):
    """add_shards overlaps the per-shard Spark aggregations on driver
    threads but folds in list order — the sketch state (centroid
    arrays, counters) must be byte-identical to sequential add()
    calls, on both the separate-sketch and same-sketch shapes."""
    from optbinning_spark.streaming.sketch import add_shards

    # same-sketch shape (q_sketch_binning_exact)
    seq = OptimalBinningSketch(monotonic_trend="ascending")
    for b in batches[:3]:
        seq.add(b, "x", "y")
    par = OptimalBinningSketch(monotonic_trend="ascending")
    add_shards([(par, b, "x", "y") for b in batches[:3]])
    for k in (0, 1):
        assert np.array_equal(seq._sk[k].values, par._sk[k].values)
        assert np.array_equal(seq._sk[k].weights, par._sk[k].weights)
    assert seq.n_add == par.n_add == 3
    assert seq.solve().binning_table.build().equals(
        par.solve().binning_table.build())
    # separate-sketch shape (q_sketch_binning_table)
    a1 = OptimalBinningSketch(monotonic_trend="ascending")
    a2 = OptimalBinningSketch(monotonic_trend="ascending")
    add_shards([(a1, batches[0], "x", "y"), (a2, batches[1], "x", "y")])
    b1 = OptimalBinningSketch(monotonic_trend="ascending")
    b1.add(batches[0], "x", "y")
    b2 = OptimalBinningSketch(monotonic_trend="ascending")
    b2.add(batches[1], "x", "y")
    a1.merge(a2)
    b1.merge(b2)
    for k in (0, 1):
        assert np.array_equal(a1._sk[k].values, b1._sk[k].values)
        assert np.array_equal(a1._sk[k].weights, b1._sk[k].weights)


def test_add_shards_rejects_streaming(spark, batches, tmp_path):
    from optbinning_spark.streaming.sketch import add_shards

    batches[0].write.mode("overwrite").parquet(str(tmp_path / "b"))
    stream = (
        spark.readStream.schema("x double, y int")
        .parquet(str(tmp_path / "b"))
    )
    sk = OptimalBinningSketch()
    with pytest.raises(ValueError, match="batch-only"):
        add_shards([(sk, stream, "x", "y")])


def test_categorical_sketch(spark):
    rows = [(c, int(i % 3 == 0)) for i, c in enumerate("aabbbcccc" * 300)]
    df = spark.createDataFrame(rows, "cat string, y int")
    sk = OptimalBinningSketch(dtype="categorical", monotonic_trend="ascending")
    sk.add(df, "cat", "y")
    ob = sk.solve()
    # exact counters: totals must match exactly
    assert ob.binning_table.count.sum() == df.count()


def test_process_sketch(spark, batches):
    ps = BinningProcessSketch(["x"])
    for b in batches:
        ps.add(b, "y")
    models = ps.solve()
    assert set(models) == {"x"}
    assert models["x"].binning_table.iv > 0


def test_structured_streaming_foreachbatch(spark, batches, tmp_path):
    # write batches as files and stream them
    src = str(tmp_path / "stream_src")
    for i, b in enumerate(batches[:3]):
        b.write.mode("append").parquet(src)
    stream = (
        spark.readStream.schema("x double, y int").parquet(src)
    )
    sk = OptimalBinningSketch(monotonic_trend="ascending")
    solved = []
    q = streaming_binning_query(
        stream, sk, "x", "y", solve_every=1,
        on_solve=lambda ob, epoch: solved.append(ob),
    )
    q.processAllAvailable()
    q.stop()
    assert sk.n_add >= 1
    assert solved, "solve callback never fired"
    assert solved[-1].binning_table.count.sum() == pytest.approx(3000)


def test_readstream_windowed_event_agg(spark, tmp_path):
    """T1-T3 with a real file-source stream: readStream over the
    events parquet -> tumbling-window agg -> memory sink, equals the
    batch result of the same plan."""
    import pyspark.sql.functions as F

    src = "/root/testdata/sf0.001/events.parquet"
    batch_ev = spark.read.parquet(src)
    ts_type = dict(batch_ev.dtypes).get("ts")
    if ts_type == "bigint":
        conv = lambda d: d.withColumn(  # noqa: E731
            "ts", F.timestamp_micros((F.col("ts") / 1000).cast("long")))
    elif ts_type != "timestamp":
        # TIMESTAMP_NTZ cannot carry a watermark; normalize like
        # sources/tables.events().
        conv = lambda d: d.withColumn("ts", F.col("ts").cast("timestamp"))  # noqa: E731
    else:
        conv = lambda d: d  # noqa: E731

    def plan(df):
        return (
            conv(df)
            .withWatermark("ts", "1 day")
            .groupBy(F.window("ts", "1 day").alias("w"), "event_type")
            .agg(F.count("*").alias("n"), F.round(F.sum("value"), 6).alias("sv"))
            .select(F.col("w.start").alias("day"), "event_type", "n", "sv")
        )

    import shutil

    indir = tmp_path / "events_in"
    indir.mkdir()
    shutil.copy(src, indir / "part-0.parquet")
    stream = (
        spark.readStream.schema(batch_ev.schema).parquet(str(indir))
    )
    q = (
        plan(stream)
        .writeStream.format("memory").queryName("ev_win")
        .outputMode("complete").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT * FROM ev_win").toPandas().sort_values(
        ["day", "event_type"]).reset_index(drop=True)
    want = plan(batch_ev).toPandas().sort_values(
        ["day", "event_type"]).reset_index(drop=True)
    assert len(got) == len(want) and len(got) > 0
    assert (got["n"].values == want["n"].values).all()
    assert got["sv"].values == pytest.approx(want["sv"].values, rel=1e-9)


def test_process_sketch_reference_surface(spark):
    """BinningProcessSketch summary/transform/get_* /mergeable/
    information (reference binning_process_sketch.py:369-633) and
    OptimalBinningSketch solve-progress tracking."""
    import numpy as np
    from optbinning_spark import BinningProcessSketch

    rng = np.random.RandomState(9)
    rows = [
        (float(rng.uniform(0, 100)), float(rng.normal(50, 10)),
         int(rng.rand() < 0.3))
        for _ in range(3000)
    ]
    df = spark.createDataFrame(rows, "a double, b double, y int")
    bp = BinningProcessSketch(["a", "b"])
    bp.add(df.limit(1500), "y")
    bp.add(df, "y")
    assert bp.mergeable(BinningProcessSketch(["a", "b"]))
    assert not bp.mergeable(BinningProcessSketch(["a"]))
    s = bp.summary()
    assert set(s["name"]) == {"a", "b"}
    assert (s["n_bins"] >= 1).all()
    out = bp.transform(df, metric="woe", keep_cols=["y"])
    assert set(out.columns) == {"y", "a", "b"}
    assert out.count() == 3000
    assert bp.get_support(names=True) == ["a", "b"]
    sk = bp.get_binned_variable("a")
    assert len(sk.progress_) >= 1
    assert "BinningProcessSketch" in bp.information()
    import pytest as _pt
    with _pt.raises(ValueError):
        bp.get_binned_variable("zzz")


def test_scenario_surface(spark):
    import numpy as np
    from optbinning_spark import SBOptimalBinning

    rng = np.random.RandomState(10)
    rows = []
    for s in (0, 1):
        for _ in range(2000):
            x = float(rng.uniform(0, 100))
            p = 0.1 + (0.6 if s else 0.4) * x / 100
            rows.append((x, int(rng.rand() < p), s))
    df = spark.createDataFrame(rows, "x double, y int, sc int")
    sb = SBOptimalBinning()
    out = sb.fit_transform(df, "x", "y", "sc", out_col="w")
    assert out.filter(F.col("w").isNull()).count() == 0
    t0 = sb.binning_table_scenario(0).build(add_totals=False)
    t1 = sb.binning_table_scenario(1).build(add_totals=False)
    assert list(t0["bin"]) == list(t1["bin"])  # shared splits
    assert sb.status == "OPTIMAL"
    import pytest as _pt
    with _pt.raises(ValueError):
        sb.binning_table_scenario(5)


def test_sketch_memory_accounting(spark):
    """T5: the sketch reports its state size; compression keeps it
    bounded (reference binning_sketch.py:518-519 memory report)."""
    import numpy as np

    from optbinning_spark.streaming.sketch import (
        CentroidSketch,
        OptimalBinningSketch,
    )

    sk = CentroidSketch(max_size=64)
    rng = np.random.RandomState(0)
    sk.add(rng.uniform(0, 1, 10_000), np.ones(10_000))
    assert sk.memory_size <= 2 * 64 * 8  # bounded after compression
    big = CentroidSketch(max_size=4096)
    big.add(rng.uniform(0, 1, 10_000), np.ones(10_000))
    assert big.memory_size > sk.memory_size  # size tracks state

    obs = OptimalBinningSketch(max_n_prebins=8)
    df = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    df = df.withColumn(
        "y", (F.col("l_returnflag") == "R").cast("int"))
    obs.add(df, "l_extendedprice", "y")
    assert obs.memory_usage > 0
    report = obs.information()
    assert "sketch memory" in report


def test_stateful_category_stats_stream(spark, tmp_path):
    """applyInPandasWithState managed state: per-key running counts
    across micro-batches equal the batch groupBy; state survives
    between triggers (maxFilesPerTrigger=1 forces multiple batches)."""
    import shutil

    import pyspark.sql.functions as F

    from optbinning_spark.streaming.sketch import (
        stateful_category_stats_stream,
    )

    src = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    indir = tmp_path / "ev_in"
    indir.mkdir()
    # two files -> two micro-batches with maxFilesPerTrigger=1
    half = src.count() // 2
    a = src.limit(half)
    b = src.subtract(a)
    a.coalesce(1).write.parquet(str(indir / "p0"))
    b.coalesce(1).write.parquet(str(indir / "p1"))
    stream = (
        spark.readStream.schema(src.schema)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(str(indir))
    )
    out = stateful_category_stats_stream(
        stream, "event_type", "value")
    q = (
        out.writeStream.format("memory").queryName("cat_state")
        .outputMode("update").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    # last emitted row per key = final running totals
    got = (
        spark.sql("SELECT * FROM cat_state").toPandas()
        .sort_values(["event_type", "n"])
        .groupby("event_type").last().reset_index()
    )
    want = (
        src.groupBy(F.col("event_type").cast("string").alias("event_type"))
        .agg(F.count("*").alias("n"),
             F.sum(F.col("value").cast("long")).alias("n_event"))
        .toPandas().sort_values("event_type").reset_index(drop=True)
    )
    got = got.sort_values("event_type").reset_index(drop=True)
    assert list(got["event_type"]) == list(want["event_type"])
    assert list(got["n"]) == list(want["n"])
    assert list(got["n_event"]) == list(want["n_event"])


def test_streaming_solve_cadence_and_convergence(spark, batches, tmp_path):
    """End-to-end trigger-cadence contract (reference
    binning_sketch.py:570-647 usage): maxFilesPerTrigger=1 yields one
    deterministic micro-batch per file; with solve_every=2 the solve
    callback fires on every second add, and the final emitted binning
    table converges to the batch fit on the unioned data."""
    src = str(tmp_path / "cadence_src")
    for i, b in enumerate(batches[:4]):
        # one file per logical batch so maxFilesPerTrigger=1 maps
        # files to micro-batches 1:1
        b.coalesce(1).write.mode("append").parquet(src)
    stream = (
        spark.readStream.schema("x double, y int")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    sk = OptimalBinningSketch(monotonic_trend="ascending")
    solved = []
    q = streaming_binning_query(
        stream, sk, "x", "y", solve_every=2,
        on_solve=lambda ob, epoch: solved.append((sk.n_add, ob)),
    )
    q.processAllAvailable()
    q.stop()
    # 4 single-file micro-batches -> solves after adds 2 and 4
    assert sk.n_add == 4
    assert [n for n, _ in solved] == [2, 4]
    # intermediate solve saw half the data, final solve all of it
    assert solved[0][1].binning_table.count.sum() == pytest.approx(2000)
    final = solved[-1][1]
    assert final.binning_table.count.sum() == pytest.approx(4000)
    # convergence to the batch fit on the union
    full = batches[0]
    for b in batches[1:4]:
        full = full.union(b)
    ob_batch = OptimalBinning(prebinning_method="quantile",
                              monotonic_trend="ascending")
    ob_batch.fit(full, "x", "y")
    assert final.binning_table.iv == pytest.approx(
        ob_batch.binning_table.iv, rel=0.15)
    rates = [
        r for r, k in zip(final.binning_table.event_rate,
                          final.binning_table.kinds) if k == "clean"
    ]
    assert all(rates[i + 1] >= rates[i] for i in range(len(rates) - 1))


def test_streaming_exact_dedup(spark, tmp_path):
    """One survivor per distinct content hash; a duplicate arriving in
    a LATER batch is always suppressed (within a batch the survivor is
    an arbitrary member — dropDuplicates makes no ordering promise)."""
    from optbinning_spark.streaming.dedup import streaming_exact_dedup

    indir = tmp_path / "docs_in"
    indir.mkdir()
    b1 = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "delta epsilon zeta"),
         (3, "alpha beta gamma")],
        "doc_id: long, text: string")
    b1.write.parquet(str(indir / "b1.parquet"))
    stream = spark.readStream.schema(b1.schema).parquet(str(indir) + "/*")
    q = (
        streaming_exact_dedup(stream)
        .writeStream.format("memory").queryName("sdedup")
        .outputMode("append").start()
    )
    try:
        q.processAllAvailable()
        b2 = spark.createDataFrame(
            [(4, "delta epsilon zeta"), (5, "eta theta iota")],
            "doc_id: long, text: string")
        b2.write.parquet(str(indir / "b2.parquet"))
        q.processAllAvailable()
        got = {r["doc_id"] for r in spark.sql(
            "SELECT doc_id FROM sdedup").collect()}
        # T5 memory accounting: without a watermark, state = one row
        # per DISTINCT content hash ever seen (3 across both batches)
        # — the documented unbounded-state caveat as an observable
        # number, not prose
        from optbinning_spark.streaming.dedup import state_store_rows

        assert state_store_rows(q) == 3
    finally:
        q.stop()
    # one of {1, 3} (same-batch dup pair, arbitrary survivor), 2, and
    # 5; 4 duplicates batch-1 content so it must NOT appear
    assert len(got) == 3
    assert 4 not in got
    assert 2 in got and 5 in got
    assert got & {1, 3}


def test_streaming_signature_dedup_matches_batch_signatures(spark, tmp_path):
    """Signature-level suppression: doc pairs with IDENTICAL minhash
    signatures collapse to the first sighting; the streamed
    signature_key must equal md5(concat of the batch operator's
    mh0..mh7) for every doc."""
    from optbinning_spark.pipeline.dedup import minhash_signatures
    from optbinning_spark.streaming.dedup import streaming_signature_dedup
    from pyspark.sql import functions as F

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet").limit(50)
    # batch signature keys
    sig = minhash_signatures(docs, n_hashes=8)
    batch_keys = {
        r["doc_id"]: r["k"]
        for r in sig.select(
            "doc_id",
            F.md5(F.concat_ws(
                "|", *[f"mh{i}" for i in range(8)])).alias("k"),
        ).collect()
    }
    indir = tmp_path / "sig_in"
    indir.mkdir()
    docs.write.parquet(str(indir / "b1.parquet"))
    stream = spark.readStream.schema(docs.schema).parquet(str(indir) + "/*")
    q = (
        streaming_signature_dedup(stream, n_hashes=8)
        .writeStream.format("memory").queryName("sigdedup")
        .outputMode("append").start()
    )
    try:
        q.processAllAvailable()
        rows = spark.sql(
            "SELECT doc_id, signature_key FROM sigdedup").collect()
    finally:
        q.stop()
    for r in rows:
        assert r["signature_key"] == batch_keys[r["doc_id"]]
    # exactly one survivor per distinct signature
    assert len(rows) == len({v for v in batch_keys.values()})


def test_streaming_exact_dedup_watermarked_state(spark, tmp_path):
    """dropDuplicatesWithinWatermark path: dedup within the horizon
    still suppresses dups that arrive in a later batch."""
    import datetime as dt

    from optbinning_spark.streaming.dedup import streaming_exact_dedup

    t0 = dt.datetime(2026, 1, 1, 12, 0, 0)
    indir = tmp_path / "wm_in"
    indir.mkdir()
    schema = "doc_id: long, text: string, ts: timestamp"
    b1 = spark.createDataFrame(
        [(1, "alpha beta", t0), (2, "gamma delta", t0)], schema)
    b1.write.parquet(str(indir / "b1.parquet"))
    stream = spark.readStream.schema(b1.schema).parquet(str(indir) + "/*")
    q = (
        streaming_exact_dedup(stream, ts_col="ts", delay="1 hour")
        .writeStream.format("memory").queryName("wmdedup")
        .outputMode("append").start()
    )
    try:
        q.processAllAvailable()
        b2 = spark.createDataFrame(
            [(3, "alpha beta", t0 + dt.timedelta(minutes=5)),
             (4, "new text here", t0 + dt.timedelta(minutes=5))], schema)
        b2.write.parquet(str(indir / "b2.parquet"))
        q.processAllAvailable()
        got = {r["doc_id"] for r in spark.sql(
            "SELECT doc_id FROM wmdedup").collect()}
        # T5: the watermarked store is bounded by keys inside the
        # dedup horizon — all 3 distinct hashes are within 1h of the
        # max event time here, so exactly 3 state rows (eviction of
        # out-of-horizon keys is Spark's dropDuplicatesWithinWatermark
        # contract; this pins that our plan actually engages it)
        from optbinning_spark.streaming.dedup import state_store_rows

        assert state_store_rows(q) == 3
    finally:
        q.stop()
    assert got == {1, 2, 4}


def test_streaming_psi_monitor(spark, tmp_path):
    """Windowed PSI drift alarm: a window matching the baseline mix
    reads ~0 PSI, a drifted window breaches; values equal the batch
    PSI formula on the same counts."""
    import datetime as dt
    import math

    from optbinning_spark.streaming.monitor import streaming_psi_monitor

    splits = [10.0, 20.0]                 # 3 bins: <10, [10,20), >=20
    expected = [0.5, 0.3, 0.2]
    day1 = dt.datetime(2026, 1, 1, 0, 30)
    day2 = dt.datetime(2026, 1, 2, 0, 30)
    rows = []
    # day 1: exactly the expected mix over 100 events
    for i in range(50):
        rows.append((5.0, day1))
    for i in range(30):
        rows.append((15.0, day1))
    for i in range(20):
        rows.append((25.0, day1))
    # day 2: drifted hard (all mass in the last bin)
    for i in range(100):
        rows.append((25.0, day2))
    indir = tmp_path / "psi_in"
    indir.mkdir()
    schema = "score: double, ts: timestamp"
    b1 = spark.createDataFrame(rows, schema)
    b1.write.parquet(str(indir / "b1.parquet"))
    stream = spark.readStream.schema(b1.schema).parquet(str(indir) + "/*")
    q = (
        streaming_psi_monitor(
            stream, "score", splits, expected,
            ts_col="ts", window="1 day", delay="1 hour")
        .writeStream.format("memory").queryName("psimon")
        .outputMode("append").start()
    )
    try:
        q.processAllAvailable()
        # flush: a far-future event advances the watermark past both
        # windows so append mode finalizes them
        spark.createDataFrame(
            [(0.0, dt.datetime(2026, 1, 10))], schema
        ).write.parquet(str(indir / "b2.parquet"))
        q.processAllAvailable()
        got = {
            r["window_start"].day: r
            for r in spark.sql("SELECT * FROM psimon").collect()
        }
    finally:
        q.stop()
    assert got[1]["psi"] == 0.0 and got[1]["drift_level"] == "insignificant"
    assert not got[1]["breach"]
    # day-2 PSI: only bin 3 populated -> (1-0.2)*ln(1/0.2)
    want = (1.0 - 0.2) * math.log(1.0 / 0.2)
    assert abs(got[2]["psi"] - round(want, 6)) < 1e-9
    assert got[2]["drift_level"] == "significant" and got[2]["breach"]
    assert got[1]["n_events"] == 100 and got[2]["n_events"] == 100


def test_psi_monitor_drops_null_and_nan_values(spark):
    """NULL/NaN value rows must be excluded from BOTH the bin counts
    and n_events (regression: numeric_bin_expr's otherwise() used to
    sweep NULL into the last bin, skewing PSI)."""
    import datetime as dt

    from optbinning_spark.streaming.monitor import streaming_psi_monitor

    t = dt.datetime(2026, 3, 1, 1, 0)
    rows = ([(5.0, t)] * 5 + [(15.0, t)] * 3 + [(25.0, t)] * 2
            + [(None, t), (float("nan"), t)])
    df = spark.createDataFrame(rows, "score: double, ts: timestamp")
    got = streaming_psi_monitor(
        df, "score", [10.0, 20.0], [0.5, 0.3, 0.2],
        ts_col="ts", window="1 day").collect()
    assert len(got) == 1
    assert got[0]["n_events"] == 10  # the 2 null/nan rows don't count
    assert got[0]["psi"] == 0.0      # exact expected mix -> zero drift


def test_batch_fitted_transform_and_score_on_stream(spark, tmp_path):
    """WoE transform and scorecard scoring are pure map-side column
    expressions, so a batch-fitted model applies UNCHANGED to a
    stream (no foreachBatch, no state) — the standard fit-offline /
    score-online deployment. Streamed values must equal the batch
    path bit-for-bit."""
    from optbinning_spark import BinningProcess, OptimalBinning
    from optbinning_spark.scorecard import Scorecard

    batch = (
        spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
        .withColumn("y", (F.col("l_returnflag") == "R").cast("int"))
    )
    ob = OptimalBinning(prebinning_method="quantile",
                        monotonic_trend="descending")
    ob.fit(batch, "l_quantity", "y")
    bp = BinningProcess(["l_quantity", "l_discount"],
                        prebinning_method="quantile")
    sc = Scorecard(bp, scaling_method="min_max",
                   scaling_method_params={"min": 0, "max": 100})
    sc.fit(batch, "y")

    sample = batch.limit(200)
    indir = tmp_path / "score_in"
    indir.mkdir()
    sample.write.parquet(str(indir / "b1.parquet"))
    stream = spark.readStream.schema(sample.schema).parquet(
        str(indir) + "/*")
    streamed = sc.score(
        ob.transform(stream, "l_quantity", metric="woe"))
    q = (streamed.writeStream.format("memory").queryName("scored")
         .outputMode("append").start())
    try:
        q.processAllAvailable()
        got = {(r["l_orderkey"], r["l_linenumber"]):
               (r["l_quantity_woe"], r["score"])
               for r in spark.sql(
                   "SELECT l_orderkey, l_linenumber, l_quantity_woe, "
                   "score FROM scored").collect()}
    finally:
        q.stop()
    want = {(r["l_orderkey"], r["l_linenumber"]):
            (r["l_quantity_woe"], r["score"])
            for r in sc.score(
                ob.transform(sample, "l_quantity", metric="woe")
            ).select("l_orderkey", "l_linenumber", "l_quantity_woe",
                     "score").collect()}
    # NB: (l_orderkey, l_linenumber) can repeat in lineitem; both
    # sides keyed the same way, so equal dicts still prove equality
    assert got == want and len(got) > 0


def test_chunking_and_quality_gates_on_stream(spark, tmp_path):
    """chunk_documents and gopher_quality_flags are pure map-side
    expressions (posexplode + column predicates), so they apply
    UNCHANGED to a stream — the online half of a curation pipeline.
    Streamed output must equal the batch path exactly."""
    from optbinning_spark.pipeline.text import (
        chunk_documents,
        gopher_quality_flags,
    )

    batch = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    src_dir = str(tmp_path / "docs_stream")
    batch.write.parquet(src_dir)
    stream = spark.readStream.schema(batch.schema).parquet(src_dir)

    streamed = gopher_quality_flags(
        chunk_documents(stream, chunk_tokens=16, overlap=4),
        min_words=4)
    assert streamed.isStreaming
    q = (streamed.writeStream.format("memory").queryName("chunked")
         .outputMode("append").start())
    try:
        q.processAllAvailable()
        got = {(r["doc_id"], r["chunk_id"]): (r["text"], r["ok_word_count"])
               for r in spark.sql(
                   "SELECT doc_id, chunk_id, text, ok_word_count "
                   "FROM chunked").collect()}
    finally:
        q.stop()
    want = {(r["doc_id"], r["chunk_id"]): (r["text"], r["ok_word_count"])
            for r in gopher_quality_flags(
                chunk_documents(batch, chunk_tokens=16, overlap=4),
                min_words=4)
            .select("doc_id", "chunk_id", "text", "ok_word_count")
            .collect()}
    assert got == want and len(got) > 500


def test_streaming_incremental_lsh_dedup_matches_batch(spark, tmp_path):
    """foreachBatch incremental LSH refresh: streaming the same two
    snapshots through incremental_lsh_dedup_sink must reproduce the
    batch refresh decisions exactly, and the persisted band index (the
    ONLY state — the query itself is stateless) must hold exactly
    n_bands rows per document ever seen."""
    from optbinning_spark.pipeline.dedup import (incremental_lsh_dedup,
                                                 lsh_bands,
                                                 minhash_signatures)
    from optbinning_spark.streaming.dedup import incremental_lsh_dedup_sink

    s1 = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog today"),
         (2, "pack my box with five dozen liquor jugs right now"),
         (3, "the quick brown fox jumps over the lazy dog tonight")],
        "doc_id: long, text: string")
    s2 = spark.createDataFrame(
        [(4, "the quick brown fox jumps over the lazy dog today"),
         (5, "sphinx of black quartz judge my vow and more words here"),
         (6, "pack my box with five dozen liquor jugs right now")],
        "doc_id: long, text: string")

    # batch reference: sequential refreshes over the same snapshots
    empty = lsh_bands(minhash_signatures(s1)).limit(0)
    dec1 = {tuple(r) for r in incremental_lsh_dedup(s1, empty).collect()}
    hist = lsh_bands(minhash_signatures(s1))
    dec2 = {tuple(r) for r in incremental_lsh_dedup(s2, hist).collect()}

    # streaming: one snapshot per micro-batch (file source, one file
    # added between processAllAvailable calls)
    indir = tmp_path / "in"
    indir.mkdir()
    idx = str(tmp_path / "band_index")
    dec = str(tmp_path / "decisions")
    s1.coalesce(1).write.parquet(str(indir / "s1.parquet"))
    stream = spark.readStream.schema(s1.schema).parquet(str(indir) + "/*")
    q = (stream.writeStream
         .foreachBatch(incremental_lsh_dedup_sink(idx, dec))
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .start())
    try:
        q.processAllAvailable()
        s2.coalesce(1).write.parquet(str(indir / "s2.parquet"))
        q.processAllAvailable()
    finally:
        q.stop()

    got = spark.read.parquet(dec)
    by_batch = {b: {tuple(r) for r in
                    got.where(F.col("__batch") == b)
                    .drop("__batch").collect()}
                for b in (0, 1)}
    assert by_batch[0] == dec1
    assert by_batch[1] == dec2

    # state bound: the band index holds exactly n_bands (= 8/2) rows
    # per document ever seen — assertable, not prose
    index = spark.read.parquet(idx)
    assert index.count() == 6 * 4
    assert index.groupBy("doc_id").count().where(
        F.col("count") != 4).count() == 0
    # and the near-dup pairs were actually caught across snapshots
    dups = {r[0]: r[1] for r in got.where(~F.col("keep"))
            .select("id", "dup_of").collect()}
    assert dups.get(4) in (1, 3) and dups.get(6) == 2


def test_incremental_lsh_sink_replay_idempotent(spark, tmp_path):
    """foreachBatch may re-run a batch after a failure: calling the
    sink function twice with the SAME batch_id must leave index and
    decisions exactly as a single call would (partition overwrite,
    not double-append), and history reads must never count the
    replayed batch's own partial write."""
    from optbinning_spark.streaming.dedup import incremental_lsh_dedup_sink

    docs = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog today"),
         (2, "pack my box with five dozen liquor jugs right now")],
        "doc_id: long, text: string")
    idx = str(tmp_path / "idx")
    dec = str(tmp_path / "dec")
    fn = incremental_lsh_dedup_sink(idx, dec)
    fn(docs, 0)
    once_idx = sorted(map(tuple, spark.read.parquet(idx).collect()))
    once_dec = sorted(map(tuple, spark.read.parquet(dec).collect()))
    fn(docs, 0)  # replay
    assert sorted(map(tuple, spark.read.parquet(idx).collect())) == once_idx
    assert sorted(map(tuple, spark.read.parquet(dec).collect())) == once_dec
    # a replayed batch with history present still sees only batch 1's
    # true history (batch 0), not its own prior write
    docs2 = spark.createDataFrame(
        [(3, "the quick brown fox jumps over the lazy dog today")],
        "doc_id: long, text: string")
    fn(docs2, 1)
    first = {tuple(r) for r in spark.read.parquet(dec).where(
        "__batch = 1").drop("__batch").collect()}
    fn(docs2, 1)  # replay batch 1
    second = {tuple(r) for r in spark.read.parquet(dec).where(
        "__batch = 1").drop("__batch").collect()}
    assert first == second
    assert {r[0] for r in first if not r[2]} == {3}  # dup of doc 1


def test_incremental_lsh_sink_broken_index_dir_fails_loudly(
        spark, tmp_path):
    """Round-12 ADVICE, refined by review: 'no history' is decided by
    an EXPLICIT committed-files check, not by absorbing
    AnalysisException. Three states of the index dir:

    - missing (first batch): proceed with empty history;
    - exists with only hidden debris (_temporary/_SUCCESS — the state
      this sink itself leaves after a crash MID-first-index-write):
      proceed with empty history — raising here would wedge the
      stream permanently, since every checkpoint replay re-hits the
      identical dir;
    - exists with COMMITTED visible files that cannot be read
      (corrupt footer, schema conflict): kill the batch so the stream
      retries from the checkpoint — never silently treat real history
      as empty and emit keep=True for true duplicates."""
    import os

    import pytest

    from optbinning_spark.streaming.dedup import incremental_lsh_dedup_sink

    docs = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog today")],
        "doc_id: long, text: string")
    # missing dir: first batch succeeds
    idx = str(tmp_path / "idx_ok")
    fn = incremental_lsh_dedup_sink(idx, str(tmp_path / "dec_ok"))
    fn(docs, 0)
    assert spark.read.parquet(idx).count() > 0
    # debris-only dir (crash before any committed index write): the
    # replayed batch must PROCEED with empty history, not wedge
    debris = tmp_path / "idx_debris"
    (debris / "_temporary" / "0").mkdir(parents=True)
    (debris / "_SUCCESS").write_text("")
    dec_d = str(tmp_path / "dec_debris")
    incremental_lsh_dedup_sink(str(debris), dec_d)(docs, 0)
    assert spark.read.parquet(dec_d).count() == 1
    # committed-but-corrupt file: the batch must raise, not emit
    broken = tmp_path / "idx_broken"
    (broken / "__batch=9").mkdir(parents=True)
    (broken / "__batch=9" / "part-00000.parquet").write_bytes(
        b"not a parquet footer")
    dec2 = str(tmp_path / "dec_broken")
    with pytest.raises(Exception):
        incremental_lsh_dedup_sink(str(broken), dec2)(docs, 0)
    assert not os.path.exists(dec2)  # no decisions were recorded


def test_streaming_signature_dedup_null_text_passes_through(spark, tmp_path):
    """NULL-text docs are not dedup candidates: every one survives
    with a NULL signature_key, while real duplicate signatures still
    collapse to one sighting (r16 — without the split all NULL docs
    shared md5('') and only the first survived)."""
    from optbinning_spark.streaming.dedup import streaming_signature_dedup

    rows = [
        (1, "alpha beta gamma delta epsilon zeta"),
        (2, "alpha beta gamma delta epsilon zeta"),  # exact dup of 1
        (3, None),
        (4, None),
        (5, None),
        (6, "totally different words here okay then"),
    ]
    docs = spark.createDataFrame(rows, "doc_id int, text string")
    indir = tmp_path / "nullsig_in"
    indir.mkdir()
    docs.write.parquet(str(indir / "b1.parquet"))
    stream = spark.readStream.schema(docs.schema).parquet(str(indir) + "/*")
    q = (
        streaming_signature_dedup(stream, n_hashes=8)
        .writeStream.format("memory").queryName("nullsig")
        .outputMode("append").start()
    )
    try:
        q.processAllAvailable()
        out = spark.sql(
            "SELECT doc_id, signature_key FROM nullsig").collect()
    finally:
        q.stop()
    by_id = {r["doc_id"]: r["signature_key"] for r in out}
    # all three NULL docs survive, each with a NULL key
    assert {3, 4, 5} <= set(by_id)
    assert all(by_id[i] is None for i in (3, 4, 5))
    # the exact dup pair collapsed to one survivor; unique doc kept
    assert 6 in by_id
    assert len({1, 2} & set(by_id)) == 1
    assert len(out) == 5
