"""exact_containment_join (asymmetric near-subset dedup) and
strip_html (boilerplate removal) — operators/dedup.py, operators/text.py.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from end_to_end_azure_databricks_data_engineering_project_spark.operators.dedup import (
    exact_containment_join,
    shingles,
)
from end_to_end_azure_databricks_data_engineering_project_spark.operators.text import strip_html


WORDS = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
         "lam mu nu xi omicron pi rho sigma tau upsilon").split()


def _corpus(spark):
    quote = " ".join(WORDS[:8])                       # 8 tokens
    big = " ".join(WORDS) + " " + quote               # embeds the quote
    other = " ".join(reversed(WORDS))                 # same vocab, other order
    return spark.createDataFrame(
        [(1, quote), (2, big), (3, other)], "doc_id long, text string"
    )


def test_containment_detects_embedded_quote_directionally(spark):
    out = exact_containment_join(_corpus(spark), threshold=0.9, n=3)
    rows = {(r.id_contained, r.id_container): r.containment
            for r in out.collect()}
    assert rows[(1, 2)] == 1.0          # the quote is fully inside big
    assert (2, 1) not in rows           # big is NOT contained in the quote
    assert (3, 2) not in rows and (2, 3) not in rows


def test_containment_prefix_filter_is_lossless(spark):
    docs = _corpus(spark)
    got = {
        (r.id_contained, r.id_container, r.inter)
        for r in exact_containment_join(docs, threshold=0.5, n=3).collect()
    }
    # brute force: full directional co-occurrence join
    sh = docs.select(
        "doc_id", F.explode(shingles(F.col("text"), 3)).alias("s")
    )
    brute = (
        sh.alias("a").join(sh.alias("b"), "s")
        .filter("a.doc_id <> b.doc_id")
        .groupBy(
            F.col("a.doc_id").alias("ia"), F.col("b.doc_id").alias("ib")
        )
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sz = sh.groupBy("doc_id").agg(F.countDistinct("s").alias("n"))
    want = {
        (r.ia, r.ib, r.inter)
        for r in brute.join(
            sz.withColumnRenamed("doc_id", "ia"), "ia"
        ).filter(F.col("inter") / F.col("n") >= 0.5).collect()
    }
    assert got == want and got  # non-empty and identical


def test_strip_html_blocks_tags_entities_whitespace(spark):
    html = (
        "<html><head><style>p{x:1}</style></head><body>"
        "<!-- note -->\n<h1>A&amp;B</h1>  <p>one<br/>two</p>"
        "<script>var x = '<p>not text</p>';</script>"
        "<p>&lt;tag&gt; &quot;q&quot; &#39;s&#39;&nbsp;end</p>"
        "</body></html>"
    )
    out = spark.createDataFrame([(html,)], "h string").select(
        strip_html(F.col("h")).alias("t")
    ).collect()[0].t
    assert out == "A&B one two <tag> \"q\" 's' end"


def test_strip_html_entity_order_amp_last(spark):
    # '&amp;lt;' must decode to the LITERAL '&lt;', not to '<'
    out = spark.createDataFrame([("&amp;lt;x",)], "h string").select(
        strip_html(F.col("h")).alias("t")
    ).collect()[0].t
    assert out == "&lt;x"


def test_strip_html_multiline_script_and_case(spark):
    html = "a<SCRIPT>\nline1\nline2\n</SCRIPT>b<STYLE>\n.c{}\n</STYLE>c"
    out = spark.createDataFrame([(html,)], "h string").select(
        strip_html(F.col("h")).alias("t")
    ).collect()[0].t
    assert out == "a b c"
