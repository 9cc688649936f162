"""Data-quality expectations (operators.quality): null-safe violation
semantics and the one-scan plan guarantee."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_streaming_and_visualization_with_kafka_spark_streaming_elasticsearch_and_kibana_spark.operators import (
    quality,
)
from data_streaming_and_visualization_with_kafka_spark_streaming_elasticsearch_and_kibana_spark.plans.explain import (
    formatted_plan,
)


def _frame(spark):
    return spark.createDataFrame(
        [(1, 10.0, "A"), (2, -5.0, "B"), (2, None, "A"), (None, 3.0, "Z")],
        "id long, v double, cat string",
    )


def test_violation_counts_and_null_semantics(spark):
    df = _frame(spark)
    rows = {
        r.check: (r.n_violations, r.passed)
        for r in quality.expectations_report(
            df,
            [
                quality.violation("id_not_null", F.col("id").isNull()),
                quality.unique_violation("id_unique", "id"),
                # v < 0: row with v=NULL must count as a violation too
                # (unknown is not a pass) -> -5.0 and NULL = 2
                quality.violation("v_nonneg", F.col("v") < 0),
                quality.violation("cat_domain", ~F.col("cat").isin("A", "B")),
            ],
        ).collect()
    }
    assert rows["id_not_null"] == (1, False)
    # 4 rows, distinct non-null ids {1, 2} -> count-distinct ignores NULL,
    # so 4 - 2 = 2 "extra" rows (the dup 2 and the NULL id)
    assert rows["id_unique"] == (2, False)
    assert rows["v_nonneg"] == (2, False)
    assert rows["cat_domain"] == (1, False)


def test_all_checks_share_one_scan(spark):
    df = _frame(spark)
    rep = quality.expectations_report(
        df,
        [
            quality.violation("a", F.col("v") < 0),
            quality.violation("b", F.col("id").isNull()),
            quality.violation("c", ~F.col("cat").isin("A")),
        ],
    )
    plan = formatted_plan(rep)
    tree = plan.split("\n\n")[0]
    # conditional-sum constraints fold into one aggregate over one scan
    assert tree.count("Scan") == 1
    assert tree.count("Exchange") == 1


def test_observation_row_accounting_costs_no_extra_scan(spark):
    """Spark's Observation API: per-stage row accounting (rows in,
    rows surviving a gate) piggybacks on the SAME action instead of
    paying a second count() scan — the observability idiom the 100 TB
    filter chains should use. Metrics land driver-side after the one
    action."""
    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    obs = Observation("gate")
    df = spark.range(1000).observe(
        obs,
        F.count(F.lit(1)).alias("rows_in"),
        F.sum((F.col("id") % 5 == 0).cast("long")).alias("rows_pass"),
    )
    survivors = df.filter(F.col("id") % 5 == 0).count()
    got = obs.get
    assert got["rows_in"] == 1000
    assert got["rows_pass"] == 200 == survivors


def test_repetition_signals_known_doc(spark):
    """Hand-computed Gopher signals: 4 non-empty lines, 'dup' twice →
    dup_line_frac 1/4; dup chars 3/(3+3+5+5)=3/16; tokens
    'a b a b a' → top bigram ('a','b') n=2, chars 2·2/5."""
    from data_streaming_and_visualization_with_kafka_spark_streaming_elasticsearch_and_kibana_spark.operators import (
        quality,
    )

    docs = spark.createDataFrame(
        [
            (1, "dup\nother\n\ndup\nfinal"),
            (2, "a b a b a"),
            (3, "   "),  # no non-empty lines, one empty token
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in quality.repetition_signals(docs).collect()}
    r1 = got[1]
    assert r1.n_lines == 4
    assert r1.dup_line_frac == 1 / 4
    assert r1.dup_line_char_frac == 3 / 16
    r2 = got[2]
    assert (r2.top_bigram, r2.top_bigram_n) == ("a b", 2)
    assert r2.top_bigram_char_frac == 2 * 2 / 5
    r3 = got[3]
    assert r3.n_lines == 0 and r3.dup_line_frac is None
    assert r3.top_bigram is None


def test_repetition_signals_tie_break_deterministic(spark):
    """Equal-count bigrams: winner is lexicographic smallest (w1, w2)."""
    from data_streaming_and_visualization_with_kafka_spark_streaming_elasticsearch_and_kibana_spark.operators import (
        quality,
    )

    docs = spark.createDataFrame(
        [(1, "z y x w")], "doc_id long, text string"
    )  # bigrams zy / yx / xw each once
    r = quality.repetition_signals(docs).collect()[0]
    assert r.top_bigram == "x w"


def test_gopher_rules_integer_exact_verdicts(spark):
    """Hand-built docs hitting each rule boundary: the verdicts are
    integer comparisons, so boundary cases are exact (50 words passes,
    49 fails; symbol ratio exactly 0.1 passes)."""
    good = "the quick brown fox and the lazy dog is of note to all " * 5
    rows = [
        (1, good),                                   # passes everything
        (2, "short of the to and is"),               # < 50 words
        (3, good + " ##### " + "# " * 20),           # symbol-heavy
        (4, "\n".join(["- bullet line of the to"] * 10)),  # all bullets
        (5, good.replace("the", "zzz").replace("of", "qqq")
             .replace("to", "xxx").replace("and", "www")
             .replace("is", "vvv")),                 # no stopwords
    ]
    out = {
        r.doc_id: r
        for r in quality.gopher_rules(
            spark.createDataFrame(rows, "doc_id long, text string")
        ).collect()
    }
    assert out[1].passes_gopher
    assert not out[2].ok_word_count and not out[2].passes_gopher
    assert not out[3].ok_symbol_ratio
    assert not out[4].ok_bullet_lines
    assert not out[5].ok_stopwords
    # boundary: exactly 50 words of sane shape passes the count rule
    fifty = "the fox and dog ran " * 10  # 50 words
    r50 = quality.gopher_rules(
        spark.createDataFrame([(9, fifty)], "doc_id long, text string")
    ).collect()[0]
    assert r50.n_words == 50 and r50.ok_word_count


def test_zscore_outliers_integer_exact_boundary(spark):
    """The cross-multiplied inequality is exact: a value exactly 3
    sigma out is NOT an outlier (strict >), epsilon beyond is —
    boundaries no float z-score can pin down."""
    # group: values 0 repeated 8 times and +-100 once each ->
    # mean 0, sigma^2 = 20000/10 = 2000, 3 sigma ~ 134.16
    rows = [(i, "g", 0.0) for i in range(8)]
    rows += [(8, "g", 100.0), (9, "g", -100.0), (10, "g", 500.0)]
    ev = spark.createDataFrame(rows, "event_id long, event_type string, value double")
    from pyspark.sql import functions as F

    cents = F.round(F.col("value") * 100).cast("long")
    vals = ev.select("event_id", "event_type", cents.alias("v"))
    stats = vals.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("v").alias("s"),
        F.sum(F.col("v") * F.col("v")).alias("s2"),
    )
    d = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    dev = d(F.col("n")) * d(F.col("v")) - d(F.col("s"))
    nvar = d(F.col("n")) * d(F.col("s2")) - d(F.col("s")) * d(F.col("s"))
    out = sorted(
        r.event_id
        for r in vals.join(stats, "event_type")
        .filter(dev * dev > 9 * nvar)
        .collect()
    )
    # sigma ~ sqrt((20000+250000+...)/11) — only 500.0 is >3 sigma out
    assert out == [10]


def test_burst_detection_flags_planted_spike(spark):
    """62 quiet minutes at ~constant rate, then one 50x spike: only the
    spike minute is flagged, and only once its trailing 60-row window
    is fully populated — via the same integer cross-multiplied
    inequality as the z-score gate, over window sums."""
    import datetime as dt

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    rows = []
    base = dt.datetime(2024, 1, 1, 0, 0)
    for m in range(62):
        n = 5 + (m % 2)  # mild 5/6 alternation -> small variance
        for i in range(n):
            rows.append((base + dt.timedelta(minutes=m), "t", float(i)))
    for i in range(300):  # minute 62: the burst
        rows.append((base + dt.timedelta(minutes=62), "t", float(i)))
    ev = spark.createDataFrame(rows, "ts timestamp, event_type string, value double")
    pm = ev.groupBy(
        "event_type", F.date_trunc("minute", "ts").alias("minute")
    ).agg(F.count(F.lit(1)).alias("c"))
    w = Window.partitionBy("event_type").orderBy("minute").rowsBetween(-60, -1)
    tr = pm.select(
        "minute", "c",
        F.count(F.lit(1)).over(w).alias("wn"),
        F.sum("c").over(w).alias("s"),
        F.sum(F.col("c") * F.col("c")).over(w).alias("q"),
    )
    dev = F.col("wn") * F.col("c") - F.col("s")
    nvar = F.col("wn") * F.col("q") - F.col("s") * F.col("s")
    flagged = (
        tr.filter((F.col("wn") == 60) & (dev > 0) & (dev * dev > 9 * nvar))
        .select("minute")
        .collect()
    )
    assert [r.minute.minute + 60 * r.minute.hour for r in flagged] == [62]
