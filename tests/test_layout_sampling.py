"""Tests for the data-layout audit (operators/layout.py) and priority
sampling (operators/text_analysis.priority_sample)."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from nashville_etl_service_backup_spark.operators.layout import (
    layout_pruning_audit,
    morton_key,
)
from nashville_etl_service_backup_spark.operators.text_analysis import (
    priority_sample,
)


def _morton_py(x: int, y: int, bits: int) -> int:
    z = 0
    for i in range(bits):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


def test_morton_key_matches_reference_bit_interleave(spark):
    rows = [(x, y) for x in (0, 1, 5, 170, 255) for y in (0, 3, 128, 255)]
    df = spark.createDataFrame(rows, "x int, y int")
    got = {
        (r.x, r.y): r.z
        for r in df.select(
            "x", "y", morton_key(F.col("x"), F.col("y"), 8).alias("z")
        ).collect()
    }
    for x, y in rows:
        assert got[(x, y)] == _morton_py(x, y, 8), (x, y)


def test_morton_key_locality_prefix_is_rectangle(spark):
    # all 16-bit morton keys sharing their top 6 bits must lie in one
    # 32x32 rectangle — the property the file-split audit relies on
    rows = [(x, y) for x in range(0, 256, 17) for y in range(0, 256, 13)]
    df = spark.createDataFrame(rows, "x int, y int")
    per = (
        df.select(
            "x",
            "y",
            F.shiftright(morton_key(F.col("x"), F.col("y"), 8), 10).alias(
                "f"
            ),
        )
        .groupBy("f")
        .agg(
            (F.max("x") - F.min("x")).alias("xs"),
            (F.max("y") - F.min("y")).alias("ys"),
        )
        .collect()
    )
    assert per, "no files"
    assert all(r.xs < 32 and r.ys < 32 for r in per)


def test_layout_audit_zorder_prunes_both_dims(spark):
    rows = [(x, y) for x in range(256) for y in range(0, 256, 8)]
    df = spark.createDataFrame(rows, "x int, y int")
    out = {
        r.layout: r
        for r in layout_pruning_audit(
            df, "x", "y", bits=8, file_bits=6, x_band=(0, 31), y_band=(0, 31)
        ).collect()
    }
    lin, zo = out["linear_x"], out["zorder"]
    # linear layout: perfect on x, useless on y
    assert lin.files_x_band < lin.n_files
    assert lin.files_y_band == lin.n_files
    # zorder: prunes both bands
    assert zo.files_x_band < zo.n_files
    assert zo.files_y_band < zo.n_files


def _py_priority(doc_id: int, weight: int, n_buckets: int = 1_048_576) -> float:
    h = hashlib.md5(f"psample:{doc_id}".encode()).hexdigest()[:8]
    b = int(h, 16) % n_buckets
    return weight * float(n_buckets) / (b + 1)


def test_priority_sample_matches_reference_formula(spark):
    rows = [(i, (i * 37) % 500 + 1) for i in range(400)]
    df = spark.createDataFrame(rows, "doc_id long, w long")
    got = priority_sample(df, "doc_id", "w", k=25).collect()
    assert len(got) == 25
    expect = sorted(
        ((-_py_priority(i, w), i) for i, w in rows)
    )[:25]
    assert [r.doc_id for r in got] == [i for _, i in expect]
    for r in got:
        assert abs(r.priority - _py_priority(r.doc_id, r.w)) == 0.0


def test_priority_sample_weight_monotone_inclusion(spark):
    # a single overwhelming weight must always be sampled
    rows = [(i, 1) for i in range(1000)] + [(5000, 10_000_000_000)]
    df = spark.createDataFrame(rows, "doc_id long, w long")
    got = priority_sample(df, "doc_id", "w", k=10).collect()
    assert 5000 in {r.doc_id for r in got}


def test_prefix_filter_jaccard_no_false_negatives(spark):
    # brute-force ground truth on a small corpus vs the prefix-filter
    # join — the defining guarantee (every pair >= t is found)
    from itertools import combinations

    from nashville_etl_service_backup_spark.operators.dedup import (
        prefix_filter_jaccard_pairs,
    )

    texts = {
        1: "the quick brown fox jumps over the lazy dog today",
        2: "the quick brown fox jumps over the lazy cat today",
        3: "a completely different document about spark engines",
        4: "the quick brown fox jumps over the lazy dog today",
        5: "spark engines process a completely different document",
        6: "quick brown fox jumps over the lazy dog",
    }

    def tset(s, n=3):
        toks = s.split()
        return {
            " ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)
        }

    truth = set()
    for a, b in combinations(sorted(texts), 2):
        x, y = tset(texts[a]), tset(texts[b])
        if x and y and len(x & y) * 5 >= len(x | y) * 3:
            truth.add((a, b))

    df = spark.createDataFrame(
        list(texts.items()), "doc_id int, text string"
    )
    got = {
        (r.doc_a, r.doc_b)
        for r in prefix_filter_jaccard_pairs(
            df, "doc_id", "text", 3, 5, shingle_n=3
        ).collect()
    }
    assert got == truth and truth, (got, truth)


def test_golden_records_rules(spark):
    from nashville_etl_service_backup_spark.operators.linkage import (
        golden_records,
    )

    rows = [
        # cluster 1: crm has segment, web has longer name + newer bal
        (1, "Ann", "RETAIL", 10.0, 1, "crm"),
        (1, "Ann Smith", None, 20.0, 2, "web"),
        # cluster 2: crm only
        (2, "Bob", "AUTO", 30.0, 1, "crm"),
        # cluster 3: crm segment NULL -> web's non-null survives
        (3, "Cyd", None, 1.0, 1, "crm"),
        (3, "Cy", "BIKE", 2.0, 2, "web"),
    ]
    df = spark.createDataFrame(
        rows, "cluster_id int, name string, segment string, bal double, "
        "updated int, src string"
    )
    out = {
        r.cluster_id: r
        for r in golden_records(
            df,
            "cluster_id",
            [
                ("longest", "name"),
                ("priority_non_null", "segment", "src", ["crm", "web"]),
                ("newest", "bal", "updated"),
                ("max", "updated"),
            ],
        ).collect()
    }
    assert (out[1].name, out[1].segment, out[1].bal, out[1].updated) == (
        "Ann Smith", "RETAIL", 20.0, 2)
    assert (out[2].name, out[2].segment, out[2].bal) == ("Bob", "AUTO", 30.0)
    assert (out[3].name, out[3].segment, out[3].bal) == ("Cyd", "BIKE", 2.0)


def test_grouped_topk_matches_single_window(spark):
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from nashville_etl_service_backup_spark.operators.ranking import (
        grouped_topk,
    )

    rows = [(i % 4, i, float((i * 131) % 977)) for i in range(4000)]
    df = spark.createDataFrame(rows, "g int, id long, v double")
    order = [F.desc("v"), F.asc("id")]
    got = {
        (r.g, r.rn, r.id)
        for r in grouped_topk(df, ["g"], order, 7, F.col("id"), 8).collect()
    }
    w = Window.partitionBy("g").orderBy(*order)
    want = {
        (r.g, r.rn, r.id)
        for r in df.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= 7)
        .collect()
    }
    assert got == want and len(want) == 28


def test_ngram_builders_match_python_reference(spark):
    from pyspark.sql import functions as F

    from nashville_etl_service_backup_spark.functions.text import tokenize
    from nashville_etl_service_backup_spark.operators.dedup import (
        char_ngrams,
        shingles,
    )
    from nashville_etl_service_backup_spark.operators.text_analysis import (
        _ordered_ngrams,
        char_trigrams,
    )

    texts = [
        "", "a", "ab", "abc", "a b", "a b c", "a b c d e",
        "Hello, World!  multiple   spaces", "x" * 10, "one two",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "id int, t string"
    )

    def norm(t):
        import re
        return re.sub(r"[^a-z0-9]+", " ", t.lower()).strip()

    def py_tokens(t):
        return [w for w in norm(t).split(" ") if w]

    rows = df.select(
        "id",
        shingles(tokenize(F.col("t")), 2).alias("sh2"),
        shingles(tokenize(F.col("t")), 3).alias("sh3"),
        _ordered_ngrams(tokenize(F.col("t")), 2).alias("on2"),
        char_ngrams(F.col("t"), 3).alias("cg3"),
        char_trigrams(F.col("t")).alias("ct"),
    ).collect()
    for r in rows:
        t = texts[r.id]
        toks = py_tokens(t)

        def sh(n):
            g = [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]
            return list(dict.fromkeys(g))

        assert r.sh2 == sh(2), (t, r.sh2)
        assert r.sh3 == sh(3), (t, r.sh3)
        on2 = [" ".join(toks[i : i + 2]) for i in range(len(toks) - 1)]
        assert r.on2 == on2, (t, r.on2)
        s = norm(t)
        cg = [s[i : i + 3] for i in range(len(s) - 2)]
        assert r.cg3 == list(dict.fromkeys(cg)), (t, r.cg3)
        # char_trigrams keeps duplicates (ordered) over its own normalizer
        from nashville_etl_service_backup_spark.operators.text_analysis import (
            normalize_text,
        )
        s2 = df.sparkSession.range(1).select(
            normalize_text(F.lit(t)).alias("s")
        ).collect()[0].s
        ct = [s2[i : i + 3] for i in range(max(len(s2) - 2, 0))]
        assert r.ct == ct, (t, r.ct)


def test_compaction_plan_bins_sorted_cumsum(spark):
    """Files 1000,900,500,300,200,100 at target 1000 must bin as
    0 | 1,1 | 2,2,2 (cum-before 0,1000,1900,2400,2700,2900)."""
    from nashville_etl_service_backup_spark.operators.layout import (
        compaction_plan,
    )

    rows = [("p", i, b) for i, b in enumerate([1000, 900, 500, 300, 200, 100])]
    m = spark.createDataFrame(rows, ["part", "file_id", "bytes"])
    out = {
        r["bin"]: (r["n_files"], r["tot_bytes"])
        for r in compaction_plan(m, "part", "file_id", "bytes", 1000).collect()
    }
    assert out == {0: (1, 1000), 1: (2, 1400), 2: (3, 600)}
