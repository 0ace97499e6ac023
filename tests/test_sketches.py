"""Approximate (sketch) aggregates — the 100 TB path for distinct
counts and percentiles. No DuckDB oracle (sketches differ by engine);
instead: bounded relative error against the exact answer."""

from __future__ import annotations

from pyspark.sql import functions as F

from big_data_spark.io.readers import read_table
from tests.conftest import SF_SMOKE


def test_approx_count_distinct_within_5pct(spark):
    li = read_table(spark, SF_SMOKE, "lineitem")
    row = li.agg(
        F.countDistinct("l_partkey").alias("exact"),
        F.approx_count_distinct("l_partkey", rsd=0.02).alias("approx"),
    ).collect()[0]
    assert abs(row.approx - row.exact) / row.exact < 0.05


def test_hll_estimate_within_error_bound(spark):
    """Custom mergeable HLL: per-source distinct-token estimates land
    within 4 standard errors of exact (sigma = 1.04/sqrt(m))."""
    from big_data_spark.operators.hll import (
        hll_error_bound,
        hll_estimate,
        hll_registers,
    )

    p = 12
    tokens = (
        read_table(spark, SF_SMOKE, "documents")
        .select("source", F.explode(F.split(F.lower("text"), " ")).alias("tok"))
        .filter(F.col("tok") != "")
    )
    exact = {
        r.source: r.n
        for r in tokens.groupBy("source")
        .agg(F.countDistinct("tok").alias("n"))
        .collect()
    }
    est = {
        r.source: r.approx_distinct
        for r in hll_estimate(
            hll_registers(tokens, ["source"], "tok", p=p), ["source"], p=p
        ).collect()
    }
    assert set(est) == set(exact)
    tol = 4 * hll_error_bound(p)
    for src, n in exact.items():
        assert abs(est[src] - n) <= max(tol * n, 3), (src, n, est[src])


def test_hll_merge_equals_direct_sketch(spark):
    """Register-merge is EXACT: sketching a union equals max-merging
    the parts' sketches, row for row — the property that lets daily
    sketches roll up without raw data."""
    from big_data_spark.operators.hll import hll_merge, hll_registers

    docs = read_table(spark, SF_SMOKE, "documents")
    tokens = docs.select(
        "source", F.explode(F.split(F.lower("text"), " ")).alias("tok")
    ).filter(F.col("tok") != "")
    part1 = tokens.filter(F.col("tok") < "m")
    part2 = tokens.filter(F.col("tok") >= "m")
    direct = hll_registers(tokens, ["source"], "tok")
    merged = hll_merge(
        hll_registers(part1, ["source"], "tok"),
        hll_registers(part2, ["source"], "tok"),
    )
    assert sorted(map(tuple, direct.collect())) == sorted(
        map(tuple, merged.collect())
    )


def test_hll_registers_over_a_stream(spark):
    """The register build is a plain max-aggregation, so it runs
    unchanged as a streaming stateful aggregate — the sketch of a
    fully-drained stream equals the batch sketch exactly."""
    from big_data_spark.operators.hll import hll_registers
    from big_data_spark.streaming import read_events_stream, run_stream_to_table

    stream = read_events_stream(spark, SF_SMOKE)
    streamed = run_stream_to_table(
        hll_registers(stream, ["event_type"], "user_id"),
        "hll_stream_regs",
        output_mode="complete",
    )
    batch = hll_registers(
        read_table(spark, SF_SMOKE, "events"), ["event_type"], "user_id"
    )
    assert sorted(map(tuple, streamed.collect())) == sorted(
        map(tuple, batch.collect())
    )


def test_cms_never_undercounts_and_is_tight_here(spark):
    """Count-Min: estimate >= exact always (one-sided error), and
    with w far above the distinct-item count the estimates are exact."""
    from big_data_spark.operators.cms import cms_lookup, cms_sketch

    tokens = (
        read_table(spark, SF_SMOKE, "documents")
        .select("source", F.explode(F.split(F.lower("text"), " ")).alias("tok"))
        .filter(F.col("tok") != "")
    )
    exact = {
        (r.source, r.tok): r.n
        for r in tokens.groupBy("source", "tok").count().withColumnRenamed("count", "n").collect()
    }
    sketch = cms_sketch(tokens, ["source"], "tok", d=4, w=2048)
    distinct_items = tokens.distinct()
    est = {
        (r.source, r.tok): r.approx_count
        for r in cms_lookup(
            sketch, distinct_items, ["source"], "tok", d=4, w=2048
        ).collect()
    }
    assert set(est) == set(exact)
    for k, n in exact.items():
        assert est[k] >= n, (k, n, est[k])
    # ~650 distinct (source, tok) pairs into 4x2048 buckets: exact.
    assert est == exact


def test_cms_merge_equals_direct_sketch(spark):
    from big_data_spark.operators.cms import cms_merge, cms_sketch

    tokens = (
        read_table(spark, SF_SMOKE, "documents")
        .select("source", F.explode(F.split(F.lower("text"), " ")).alias("tok"))
        .filter(F.col("tok") != "")
    )
    direct = cms_sketch(tokens, ["source"], "tok")
    merged = cms_merge(
        cms_sketch(tokens.filter(F.col("tok") < "m"), ["source"], "tok"),
        cms_sketch(tokens.filter(F.col("tok") >= "m"), ["source"], "tok"),
    )
    assert sorted(map(tuple, direct.collect())) == sorted(
        map(tuple, merged.collect())
    )


def test_cms_lookup_ignores_null_items(spark):
    """A NULL probe item must not return a spurious positive count:
    cms_sketch never counted NULLs, so cms_lookup drops them too
    (they would otherwise hash to seed-derived buckets)."""
    from big_data_spark.operators.cms import cms_lookup, cms_sketch

    rows = spark.createDataFrame(
        [("a", "x"), ("a", "x"), ("a", None)], "k string, item string"
    )
    sketch = cms_sketch(rows, ["k"], "item", d=2, w=64)
    got = cms_lookup(sketch, rows, ["k"], "item", d=2, w=64).collect()
    assert {(r.k, r.item, r.approx_count) for r in got} == {("a", "x", 2)}


def test_sketch_merge_explicit_key_cols(spark):
    """A key column named like a reserved sketch column would poison
    name-based inference; the explicit key_cols parameter bypasses it."""
    from big_data_spark.operators.cms import cms_merge, cms_sketch
    from big_data_spark.operators.hll import hll_merge, hll_registers

    rows = spark.createDataFrame(
        [("a", "x"), ("a", "y"), ("b", "x")], "k string, item string"
    )
    direct_cms = cms_sketch(rows, ["k"], "item", d=2, w=64)
    merged_cms = cms_merge(
        cms_sketch(rows.filter("item = 'x'"), ["k"], "item", d=2, w=64),
        cms_sketch(rows.filter("item <> 'x'"), ["k"], "item", d=2, w=64),
        key_cols=["k"],
    )
    assert sorted(map(tuple, direct_cms.collect())) == sorted(
        map(tuple, merged_cms.collect())
    )
    direct_hll = hll_registers(rows, ["k"], "item")
    merged_hll = hll_merge(
        hll_registers(rows.filter("item = 'x'"), ["k"], "item"),
        hll_registers(rows.filter("item <> 'x'"), ["k"], "item"),
        key_cols=["k"],
    )
    assert sorted(map(tuple, direct_hll.collect())) == sorted(
        map(tuple, merged_hll.collect())
    )


def test_sketch_param_mismatch_fails_loudly(spark):
    """Probing/estimating with (d, w)/p different from the sketch's
    silently inverts the error guarantees — the embedded parameter
    columns make it an assertion failure instead."""
    import pytest

    from big_data_spark.operators.cms import cms_lookup, cms_sketch
    from big_data_spark.operators.hll import hll_estimate, hll_registers

    rows = spark.createDataFrame([("a", "x")], "k string, item string")
    sketch = cms_sketch(rows, ["k"], "item", d=4, w=1024)
    with pytest.raises(Exception, match="undercount|ASSERT"):
        cms_lookup(sketch, rows, ["k"], "item", d=4, w=512).collect()
    regs = hll_registers(rows, ["k"], "item", p=12)
    with pytest.raises(Exception, match="registers built with|ASSERT"):
        hll_estimate(regs, ["k"], p=10).collect()


def test_cms_sketch_over_a_stream(spark):
    """CMS twin of the HLL streaming test: the sketch build is a plain
    count-aggregation, so it runs unchanged as a streaming stateful
    aggregate — the sketch of a fully-drained stream equals the batch
    sketch exactly."""
    from big_data_spark.operators.cms import cms_sketch
    from big_data_spark.streaming import read_events_stream, run_stream_to_table

    stream = read_events_stream(spark, SF_SMOKE)
    streamed = run_stream_to_table(
        cms_sketch(stream, ["event_type"], "user_id", d=2, w=256),
        "cms_stream_sketch",
        output_mode="complete",
    )
    batch = cms_sketch(
        read_table(spark, SF_SMOKE, "events"), ["event_type"], "user_id", d=2, w=256
    )
    assert sorted(map(tuple, streamed.collect())) == sorted(
        map(tuple, batch.collect())
    )


def test_sketch_parquet_roundtrip_rollup(spark, tmp_path):
    """The 'daily sketches roll up to monthly without raw data' claim,
    end to end: persist per-part sketches to parquet, read them back,
    merge, and check the merged estimates against sketching the whole
    corpus directly — byte-identical registers/counters both ways."""
    from big_data_spark.operators.cms import cms_merge, cms_sketch
    from big_data_spark.operators.hll import (
        hll_estimate,
        hll_merge,
        hll_registers,
    )

    tokens = (
        read_table(spark, SF_SMOKE, "documents")
        .select("source", F.explode(F.split(F.lower("text"), " ")).alias("tok"))
        .filter(F.col("tok") != "")
    )
    parts = [tokens.filter(F.col("tok") < "m"), tokens.filter(F.col("tok") >= "m")]
    for i, part in enumerate(parts):
        hll_registers(part, ["source"], "tok").write.mode("overwrite").parquet(
            str(tmp_path / f"hll_{i}")
        )
        cms_sketch(part, ["source"], "tok").write.mode("overwrite").parquet(
            str(tmp_path / f"cms_{i}")
        )
    hll_back = hll_merge(
        *[spark.read.parquet(str(tmp_path / f"hll_{i}")) for i in range(2)]
    )
    cms_back = cms_merge(
        *[spark.read.parquet(str(tmp_path / f"cms_{i}")) for i in range(2)]
    )
    assert sorted(map(tuple, hll_back.collect())) == sorted(
        map(tuple, hll_registers(tokens, ["source"], "tok").collect())
    )
    assert sorted(map(tuple, cms_back.collect())) == sorted(
        map(tuple, cms_sketch(tokens, ["source"], "tok").collect())
    )
    est = hll_estimate(hll_back, ["source"])
    direct_est = hll_estimate(hll_registers(tokens, ["source"], "tok"), ["source"])
    assert sorted(map(tuple, est.collect())) == sorted(
        map(tuple, direct_est.collect())
    )


def test_approx_percentile_brackets_exact(spark):
    li = read_table(spark, SF_SMOKE, "lineitem")
    row = li.agg(
        F.expr("percentile(l_extendedprice, 0.9)").alias("exact"),
        F.percentile_approx("l_extendedprice", 0.9, 10000).alias("approx"),
    ).collect()[0]
    assert abs(row.approx - row.exact) / row.exact < 0.02


def test_bloom_no_false_negatives(spark):
    """Every inserted item probes true — the one-sided guarantee
    decontamination/dedup pipelines rely on (a 'not seen' verdict is
    final)."""
    from big_data_spark.operators.bloom import bloom_build, bloom_might_contain

    tokens = (
        read_table(spark, SF_SMOKE, "documents")
        .select("source", F.explode(F.split(F.lower("text"), " ")).alias("tok"))
        .filter(F.col("tok") != "")
        .distinct()
    )
    bloom = bloom_build(tokens, ["source"], "tok", m=1024, k=3)
    probed = bloom_might_contain(bloom, tokens, ["source"], "tok", m=1024, k=3)
    n_false_neg = probed.filter(~F.col("might_contain")).count()
    assert n_false_neg == 0
    assert probed.count() == tokens.count()


def test_bloom_fpp_bounded(spark):
    """Absent items probe true at roughly the theoretical rate — and
    never wildly above it (3x + small-sample slack)."""
    from big_data_spark.operators.bloom import (
        bloom_build,
        bloom_fpp,
        bloom_might_contain,
    )

    tokens = (
        read_table(spark, SF_SMOKE, "documents")
        .select("source", F.explode(F.split(F.lower("text"), " ")).alias("tok"))
        .filter(F.col("tok") != "")
        .distinct()
    )
    m, k = 256, 2
    bloom = bloom_build(tokens, ["source"], "tok", m=m, k=k)
    n_per_key = {
        r.source: r.n
        for r in tokens.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    absent = tokens.select("source").distinct().crossJoin(
        spark.range(500).select(
            F.concat(F.lit("zz_absent_"), F.col("id")).alias("tok")
        )
    )
    probed = bloom_might_contain(bloom, absent, ["source"], "tok", m=m, k=k)
    hits = {
        r.source: r.h
        for r in probed.groupBy("source")
        .agg(F.sum(F.col("might_contain").cast("int")).alias("h"))
        .collect()
    }
    for src, n in n_per_key.items():
        expected = bloom_fpp(n, m=m, k=k)
        observed = hits.get(src, 0) / 500.0
        assert observed <= 3 * expected + 0.02, (src, observed, expected)


def test_bloom_merge_equals_direct_build(spark):
    """Bitwise-OR merge is EXACT: building over a union equals
    merging the parts' filters, row for row — daily filters roll up
    to monthly without raw data."""
    from big_data_spark.operators.bloom import bloom_build, bloom_merge

    tokens = (
        read_table(spark, SF_SMOKE, "documents")
        .select("source", F.explode(F.split(F.lower("text"), " ")).alias("tok"))
        .filter(F.col("tok") != "")
    )
    parts = [tokens.filter(F.col("tok") < "m"), tokens.filter(F.col("tok") >= "m")]
    merged = bloom_merge(*[bloom_build(p, ["source"], "tok") for p in parts])
    direct = bloom_build(tokens, ["source"], "tok")
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, direct.collect())
    )


def test_bloom_param_mismatch_fails_loudly(spark):
    """Probing with (m, k) different from the filter's would produce
    false negatives — the embedded parameter columns turn it into an
    assertion failure instead."""
    import pytest

    from big_data_spark.operators.bloom import bloom_build, bloom_might_contain

    rows = spark.createDataFrame([("a", "x")], "kk string, item string")
    bloom = bloom_build(rows, ["kk"], "item", m=1024, k=3)
    with pytest.raises(Exception, match="false negatives|ASSERT"):
        bloom_might_contain(bloom, rows, ["kk"], "item", m=512, k=3).collect()


def test_bloom_ignores_null_items(spark):
    """NULLs are not values: they are neither inserted nor probed
    (a NULL probe would test seed-derived positions of a value that
    does not exist)."""
    from big_data_spark.operators.bloom import bloom_build, bloom_might_contain

    rows = spark.createDataFrame(
        [("a", "x"), ("a", None)], "kk string, item string"
    )
    bloom = bloom_build(rows, ["kk"], "item", m=256, k=2)
    probed = bloom_might_contain(bloom, rows, ["kk"], "item", m=256, k=2)
    got = probed.collect()
    assert len(got) == 1 and got[0].item == "x" and got[0].might_contain


def test_bloom_build_over_a_stream(spark):
    """bit_or is a plain aggregate, so the filter build runs
    unchanged as a streaming stateful aggregate — the filter of a
    fully-drained stream equals the batch filter exactly."""
    from big_data_spark.operators.bloom import bloom_build
    from big_data_spark.streaming import read_events_stream, run_stream_to_table

    stream = read_events_stream(spark, SF_SMOKE)
    streamed = run_stream_to_table(
        bloom_build(stream, ["event_type"], "user_id", m=512, k=2),
        "bloom_stream_filter",
        output_mode="complete",
    )
    batch = bloom_build(
        read_table(spark, SF_SMOKE, "events"), ["event_type"], "user_id", m=512, k=2
    )
    assert sorted(map(tuple, streamed.collect())) == sorted(
        map(tuple, batch.collect())
    )


def test_hist_quantile_within_bin_width(spark):
    """Histogram sketch quantiles land within one bin width of the
    exact percentile, per key."""
    from big_data_spark.operators.histogram import (
        hist_error_bound,
        hist_quantile,
        hist_sketch,
    )

    li = read_table(spark, SF_SMOKE, "lineitem")
    lo, hi, bins = 900.0, 105000.0, 128
    sk = hist_sketch(li, ["l_returnflag"], "l_extendedprice", lo, hi, bins)
    for q in (0.5, 0.9):
        est = {
            r.l_returnflag: r[f"q{q}"]
            for r in hist_quantile(sk, ["l_returnflag"], q).collect()
        }
        exact = {
            r.l_returnflag: r.x
            for r in li.groupBy("l_returnflag")
            .agg(F.expr(f"percentile(l_extendedprice, {q})").alias("x"))
            .collect()
        }
        tol = hist_error_bound(lo, hi, bins)
        for k in exact:
            assert abs(est[k] - exact[k]) <= tol, (q, k, est[k], exact[k])


def test_hist_merge_equals_direct_sketch(spark):
    from big_data_spark.operators.histogram import hist_merge, hist_sketch

    li = read_table(spark, SF_SMOKE, "lineitem")
    parts = [li.filter("l_orderkey % 2 = 0"), li.filter("l_orderkey % 2 = 1")]
    merged = hist_merge(
        *[
            hist_sketch(p, ["l_returnflag"], "l_extendedprice", 0.0, 120000.0)
            for p in parts
        ]
    )
    direct = hist_sketch(li, ["l_returnflag"], "l_extendedprice", 0.0, 120000.0)
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, direct.collect())
    )


def test_hist_out_of_range_pins_to_edges(spark):
    from big_data_spark.operators.histogram import hist_sketch

    rows = spark.createDataFrame(
        [("k", -5.0), ("k", 0.5), ("k", 99.0), ("k", 250.0), ("k", None)],
        "kk string, v double",
    )
    sk = {r.bucket: r.n for r in hist_sketch(rows, ["kk"], "v", 0.0, 100.0, 10).collect()}
    assert sk[0] == 2   # -5 clamps into bucket 0, 0.5 lands there
    assert sk[9] == 2   # 99 in last bucket, 250 clamps into it
    assert sum(sk.values()) == 4  # NULL ignored


def test_hist_sketch_over_a_stream(spark):
    from big_data_spark.operators.histogram import hist_sketch
    from big_data_spark.streaming import read_events_stream, run_stream_to_table

    stream = read_events_stream(spark, SF_SMOKE)
    streamed = run_stream_to_table(
        hist_sketch(stream, ["event_type"], "value", 0.0, 400.0, 32),
        "hist_stream_sketch",
        output_mode="complete",
    )
    batch = hist_sketch(
        read_table(spark, SF_SMOKE, "events"), ["event_type"], "value", 0.0, 400.0, 32
    )
    assert sorted(map(tuple, streamed.collect())) == sorted(
        map(tuple, batch.collect())
    )


def test_hist_psi_detects_shift_and_zeroes_on_identity(spark):
    """PSI of a distribution against itself is exactly 0; shifting
    the distribution moves PSI past the 0.25 'major shift' line; and
    PSI over merged sketch halves equals PSI over the whole — drift
    monitoring composes with the mergeable-sketch contract."""
    from pyspark.sql import functions as F

    from big_data_spark.operators.histogram import (
        hist_merge,
        hist_psi,
        hist_sketch,
    )

    base = spark.range(4000).select(
        F.lit("k").alias("key"), (F.col("id") % 100).cast("double").alias("v")
    )
    shifted = base.withColumn("v", F.col("v") + 50.0)
    ha = hist_sketch(base, ["key"], "v", 0.0, 200.0, 40)
    hb = hist_sketch(shifted, ["key"], "v", 0.0, 200.0, 40)
    same = hist_psi(ha, ha, ["key"]).collect()[0]
    assert same["psi"] == 0.0
    moved = hist_psi(ha, hb, ["key"]).collect()[0]
    assert moved["psi"] > 0.25
    # Merge halves -> identical PSI to the monolithic sketch.
    h1 = hist_sketch(base.filter("id % 2 = 0"), ["key"], "v", 0.0, 200.0, 40)
    h2 = hist_sketch(base.filter("id % 2 = 1"), ["key"], "v", 0.0, 200.0, 40)
    merged = hist_merge(h1, h2, key_cols=["key"])
    via_merge = hist_psi(merged, hb, ["key"]).collect()[0]
    assert abs(via_merge["psi"] - moved["psi"]) < 1e-12
