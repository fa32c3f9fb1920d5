"""Explicit skew handling: salted repartition spreads a hot domain key."""

from pyspark.sql import functions as F

from thesis_ner_co_tri_training_spark.plans.pipeline import salted_repartition


def test_salted_repartition_spreads_hot_key(spark):
    # power-law: one domain owns 90% of rows
    rows = [(f"https://hot.example/{i}", "hot.example") for i in range(900)]
    rows += [(f"https://d{i % 20}.example/x", f"d{i % 20}.example")
             for i in range(100)]
    df = spark.createDataFrame(rows, "url string, domain string")

    n_parts = 8
    unsalted = df.repartition(n_parts, F.col("domain"))
    salted = salted_repartition(df, "domain", n_parts, salt=8)

    def sizes(d):
        return [r["count"] for r in
                d.groupBy(F.spark_partition_id().alias("p")).count().collect()]

    hot_unsalted = max(sizes(unsalted))
    hot_salted = max(sizes(salted))
    # without salt the hot domain lands in ONE partition (>= 900 rows);
    # with salt it spreads, so the max partition shrinks materially
    assert hot_unsalted >= 900
    assert hot_salted <= 450, (hot_unsalted, hot_salted)

    # row-preserving
    assert salted.count() == 1000


def test_salted_repartition_deterministic_placement(spark):
    """The salt hashes row content (not monotonically_increasing_id), so
    two independent evaluations place every row in the same partition —
    the property a task retry / resume depends on."""
    rows = [(f"https://d{i % 7}.example/{i}", f"d{i % 7}.example")
            for i in range(300)]
    df = spark.createDataFrame(rows, "url string, domain string")

    def placement(d):
        return {r["url"]: r["p"] for r in
                d.withColumn("p", F.spark_partition_id()).collect()}

    a = placement(salted_repartition(df, "domain", 8, salt=4))
    b = placement(salted_repartition(df, "domain", 8, salt=4))
    assert a == b
