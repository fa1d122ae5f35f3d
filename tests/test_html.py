"""HTML→text boilerplate extraction (functions/html.py, jusText /
trafilatura lineage): block segmentation at block-tag boundaries,
link-density and word-count block gates, entity decoding, the staged
marker machinery, and the keep/strip `html_clean` composition."""

import pytest
from pyspark.sql import functions as F

from dataframes_spark.functions import html as H

PAGE = (
    "<html><head><title>T</title><style>p{margin:0}</style></head><body>"
    "<!-- boilerplate -->"
    '<div class="nav"><a href="/">Home</a> <a href="/a">About</a>'
    ' <a href="/c">Contact</a></div>'
    "<p>the quick brown fox jumps over the lazy dog today</p>"
    "<p>a second block with an inline <em>emphasis</em> and an"
    ' <a href="/r">internal link</a> right here</p>'
    "<script>var x = {a: 1};</script>"
    '<div class="footer">Copyright &amp; site <a href="/tos">terms</a>'
    ' <a href="/priv">privacy policy</a></div>'
    "</body></html>"
)


def _extract(spark, docs, **kw):
    df = spark.createDataFrame(docs, "doc_id long, html string")
    out = H.html_extract(df, "html", "doc_id", **kw)
    return {r["doc_id"]: r.asDict() for r in out.collect()}


def test_content_survives_boilerplate_drops(spark):
    r = _extract(spark, [(1, PAGE)])[1]
    # nav + 2 content + footer = 4 non-empty blocks; head/script gone
    assert r["n_blocks"] == 4
    assert r["n_kept"] == 2
    assert r["kept_frac"] == 0.5
    lines = r["text"].split("\n")
    assert lines[0].startswith("the quick brown fox")
    # inline tags strip, entities stay decoded in visible text
    assert "emphasis" in lines[1] and "internal link" in lines[1]
    assert "<" not in r["text"] and "Copyright" not in r["text"]


def test_link_density_gate(spark):
    # nav block: 4 words (passes min_words) but ~all chars are anchors
    r = _extract(spark, [(1, PAGE)], max_link_density=1.0)[1]
    assert r["n_kept"] == 4  # gate off -> nav and footer survive


def test_min_words_gate(spark):
    html = "<p>one two</p><p>three four five six</p>"
    r = _extract(spark, [(1, html)], min_words=3)[1]
    assert (r["n_blocks"], r["n_kept"]) == (2, 1)
    assert r["text"] == "three four five six"


def test_stopword_density_gate(spark):
    html = (
        "<p>the cat is on the mat with a hat</p>"
        "<p>lorem dolor amet consectetur adipiscing elit</p>"
    )
    r = _extract(spark, [(1, html)], min_stop_density=0.3)[1]
    assert r["n_kept"] == 1
    assert r["text"].startswith("the cat")
    assert r["stop_frac"] > 0.3


def test_entity_decode_order(spark):
    # &amp; decodes LAST: double-escaped &amp;lt; yields literal &lt;
    html = "<p>a &amp;lt; b &nbsp; c &quot;q&quot; &#39;s&#39; x&gt;y</p>"
    r = _extract(spark, [(1, html)], min_words=1)[1]
    assert r["text"] == "a &lt; b c \"q\" 's' x>y"


def test_null_and_empty_html(spark):
    rows = _extract(spark, [(1, None), (2, ""), (3, "<p></p>")])
    for i in (1, 2, 3):
        assert rows[i]["n_blocks"] == 0
        assert rows[i]["n_kept"] == 0
        assert rows[i]["text"] == ""
        assert rows[i]["kept_frac"] == 0.0


def test_nested_anchor_markup(spark):
    # anchor text containing inline tags still measures as link chars
    html = '<p>alpha beta <a href="/x"><b>bold link</b></a> gamma delta epsilon</p>'
    r = _extract(spark, [(1, html)])[1]
    assert r["n_kept"] == 1
    assert "bold link" in r["text"]


def test_html_clean_keep_strip_and_null_pass(spark):
    farm = '<ul><li><a href="/1">x</a></li><li><a href="/2">y</a></li></ul>'
    df = spark.createDataFrame(
        [(1, PAGE), (2, farm), (3, None)], "doc_id long, html string"
    )
    out = H.html_clean(df, "html", "doc_id")
    rows = {r["doc_id"]: r["text"] for r in out.collect()}
    # content page kept, link farm stripped, NULL html passes with NULL
    assert set(rows) == {1, 3}
    assert rows[1].startswith("the quick brown fox")
    assert rows[3] is None


def test_no_shuffle_in_extract(spark):
    df = spark.createDataFrame([(1, PAGE)], "doc_id long, html string")
    plan = H.html_extract(df, "html", "doc_id")._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_bad_density_raises(spark):
    df = spark.createDataFrame([(1, PAGE)], "doc_id long, html string")
    with pytest.raises(ValueError):
        H.html_extract(df, "html", "doc_id", max_link_density=1.5)


def test_block_anchor_link_density_carries_across_blocks(spark):
    # the r12 review case: an anchor whose content contains block-level
    # tags splits its sentinels across blocks; the carry fold must
    # still attribute the enclosed text as link chars
    html = (
        '<a href="/x"><div>Home About Contact Pricing</div></a>'
        "<p>the quick brown fox jumps over the lazy dog today</p>"
    )
    r = _extract(spark, [(1, html)])[1]
    # the block-anchor nav is measured at ~full link density -> dropped
    assert r["n_blocks"] == 2
    assert r["n_kept"] == 1
    assert r["text"].startswith("the quick brown fox")
    # an anchor spanning MULTIPLE block boundaries: middle block fully
    # enclosed (no sentinels at all) still counts as link text
    html2 = (
        '<a href="/x">opening words<div>fully enclosed nav block here</div>'
        "closing words</a>"
        "<p>real content with plenty of ordinary words here today</p>"
    )
    r2 = _extract(spark, [(2, html2)])[2]
    assert r2["n_kept"] == 1
    assert r2["text"].startswith("real content")
