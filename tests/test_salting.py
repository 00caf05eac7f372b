"""Hub-entity skew mitigation (SURVEY.md §4, north_rule "salted-key skew
mitigation for hub entities") and capped-LSH-bucket observability."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from graphiti_spark.pipeline import SUMMARY_TOP_FACTS, build_nodes


def _skewed_frames(spark, n_hub_facts=300):
    """One hub entity is the subject of 30% of all facts (n_hub_facts),
    a handful of normal entities hold the rest."""
    hub = spark.range(n_hub_facts).select(
        F.lit("hub").alias("source_node_uuid"),
        F.concat(F.lit("hub fact "), F.lpad(F.col("id").cast("string"), 4, "0"))
        .alias("fact"),
    )
    cold = spark.range(n_hub_facts * 2).select(
        F.concat(F.lit("e"), (F.col("id") % 100).cast("string")).alias(
            "source_node_uuid"
        ),
        F.concat(F.lit("cold fact "), F.col("id").cast("string")).alias("fact"),
    )
    edges = hub.unionByName(cold)
    uuids = edges.select(F.col("source_node_uuid").alias("uuid")).distinct()
    entities = uuids.select(
        "uuid", F.lit("g").alias("group_id"), F.col("uuid").alias("name"),
        F.lit(1).alias("mention_count"),
    )
    uuid_map = uuids.select("uuid", F.col("uuid").alias("canonical_uuid"))
    return entities, uuid_map, edges


def test_salted_topk_equals_unsalted(spark):
    """The salted two-phase top-k must return EXACTLY the unsalted
    window's result (every global top-k fact survives its salt's
    phase-1 top-k)."""
    entities, uuid_map, edges = _skewed_frames(spark)
    from graphiti_spark.config import DEFAULT_RUN_TS

    nodes = build_nodes(entities, uuid_map, edges, DEFAULT_RUN_TS, n_salt=16)
    got = {r.uuid: r.summary for r in nodes.collect()}

    w = Window.partitionBy("source_node_uuid").orderBy("fact")
    expected_hub = (
        edges.filter(F.col("source_node_uuid") == "hub")
        .select("source_node_uuid", "fact").distinct()
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= SUMMARY_TOP_FACTS)
    )
    exp = ". ".join(sorted(r.fact for r in expected_hub.collect())) + "."
    assert got["hub"] == exp


def test_salting_spreads_hub_partition(spark):
    """Phase 1 groups key on (subject, salt): the hub's facts land in
    N_SALT separate reduce groups instead of one."""
    _, _, edges = _skewed_frames(spark)
    n_salt = 16
    grouped = (
        edges.select("source_node_uuid", "fact").distinct()
        .withColumn("salt", F.pmod(F.xxhash64("fact"), F.lit(n_salt)))
        .groupBy("source_node_uuid", "salt")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    hub = grouped.filter(F.col("source_node_uuid") == "hub").collect()
    total_hub = sum(r.n for r in hub)
    assert total_hub == 300
    assert len(hub) == n_salt                     # spread over all salts
    assert max(r.n for r in hub) < total_hub / 4  # no group holds the hub


def test_dropped_lsh_buckets_surface(spark):
    """A pathological bucket (cap exceeded) must be REPORTED, not
    silently dropped: the sink frame carries the bucket and its size,
    and the pair output excludes it."""
    from graphiti_spark.operators.dedup_docs import minhash_near_dup

    docs = spark.range(50).select(
        F.col("id").alias("doc_id"),
        F.lit("identical text for every single document here").alias("text"),
    )
    sink: list = []
    pairs = minhash_near_dup(docs, max_bucket=10, dropped_sink=sink)
    assert pairs.count() == 0          # every bucket capped → no pairs
    dropped = sink[0].collect()
    assert len(dropped) > 0
    assert all(r.bucket_n == 50 for r in dropped)


def test_pipeline_reports_zero_dropped_buckets(spark):
    from graphiti_spark.config import RunConfig
    from graphiti_spark.pipeline import run_pipeline

    out = run_pipeline(spark, "/root/testdata/sf0.001", RunConfig())
    assert out["dropped_buckets"].count() == 0  # healthy corpus


def test_salted_topk_rejects_all_reserved_columns(spark):
    """ADVICE r4: '_rn1' joins 'rank'/'_salt' in the reserved-name
    check — an input already carrying any of the three raises instead
    of being silently overwritten by the phase-1 withColumn/drop."""
    import pytest
    from pyspark.sql import functions as F

    from graphiti_spark.operators.topk import salted_topk

    for col in ("rank", "_salt", "_rn1"):
        df = spark.createDataFrame(
            [("g", 1)], f"g string, {col} long"
        )
        with pytest.raises(ValueError, match=col):
            salted_topk(df, ["g"], [F.col(col).asc()], k=1)


def test_generic_salted_topk_equals_plain_window_and_spreads(spark):
    """The generic operator: identical rows to the unsalted window on a
    hub-skewed fixture, and phase 1 genuinely spreads the hub across
    salts (no single (group, salt) cell holds the whole hub)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from graphiti_spark.operators.topk import salted_topk

    rows = [("hub", i, float((i * 37) % 500)) for i in range(1000)] + [
        ("tiny", i, float(i)) for i in range(5)
    ]
    df = spark.createDataFrame(rows, "g string, i long, v double")
    order = [F.col("v").desc(), F.col("i").asc()]
    got = sorted(
        (r["g"], r["i"], r["rank"])
        for r in salted_topk(df, ["g"], order, k=4, n_salt=8).collect()
    )
    w = Window.partitionBy("g").orderBy(*order)
    want = sorted(
        (r["g"], r["i"], r["rank"])
        for r in df.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 4)
        .collect()
    )
    assert got == want and len(got) == 8  # 4 hub + 4 tiny (k caps both)
    # spread check: the hub's rows hash across ≥ 4 of the 8 salts
    salted = df.withColumn(
        "_salt", F.pmod(F.xxhash64("g", "i", "v"), F.lit(8))
    )
    n_cells = (
        salted.filter("g = 'hub'").select("_salt").distinct().count()
    )
    assert n_cells >= 4
