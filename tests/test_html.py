"""Goldens for stages/curation.extract_html_text — the HTML→text
(WET) extraction: block drops, tag flattening, single-level entity
decode, whitespace collapse, title extraction."""
import pyarrow as pa
import ray.data as rd

from feature_extraction_ray.stages.curation import (
    _extract_html_text_array, extract_html_text)


def _run(pages):
    t, x = _extract_html_text_array(pa.array(pages))
    return t.to_pylist(), x.to_pylist()


def test_full_page_golden():
    titles, texts = _run([
        "<html><head><title>My &amp; Title</title>"
        "<style>body { color: red; }</style></head>"
        '<body><script>if (1 < 2 && 2 > 1) { alert("x"); }</script>'
        "<h1>Head</h1><p>hello world</p>"
        "<!-- hidden <b>markup</b> --></body></html>"])
    assert titles == ["My & Title"]
    assert texts == ["Head hello world"]


def test_entity_decode_single_level():
    # &amp; decodes LAST: a pre-escaped &amp;lt; yields the literal
    # text "&lt;" (one decode level), never "<"
    _, texts = _run(["<p>&lt;tag&gt; &quot;q&quot; it&#39;s"
                     "&nbsp;x &amp;lt; raw &amp;&amp; done</p>"])
    assert texts == ['<tag> "q" it\'s x &lt; raw && done']


def test_script_body_with_markupish_content_drops_whole():
    # script bodies may contain < > and even fake closing tags of
    # OTHER elements; everything up to </script> must vanish
    _, texts = _run(["<body><script>var s = '</div>' + (a<b);</script>"
                     "<p>kept</p></body>"])
    assert texts == ["kept"]


def test_no_title_and_whitespace_collapse_trim():
    titles, texts = _run(["\t<p>a</p>\n\n<p>b</p>  <p>c  d</p>  "])
    assert titles == [""]
    assert texts == ["a b c d"]


def test_multiline_style_and_comment_blocks():
    _, texts = _run(["<style>\n.a { x: 1; }\n.b { y: 2; }\n</style>"
                     "before<!--\nline1\nline2\n-->after"])
    assert texts == ["before after"]


def test_dataset_stage_appends_columns():
    ds = rd.from_arrow(pa.table({
        "doc_id": [1, 2],
        "html": ["<html><head><title>T1</title></head>"
                 "<body><p>one</p></body></html>",
                 "<p>two</p>"]}))
    out = extract_html_text(ds, html_col="html", text_col="text_clean",
                            title_col="title").to_pandas()
    out = out.sort_values("doc_id").reset_index(drop=True)
    assert out["title"].tolist() == ["T1", ""]
    assert out["text_clean"].tolist() == ["one", "two"]
    assert "html" in out.columns


def test_extract_links_golden():
    from feature_extraction_ray.stages.curation import extract_links
    ds = rd.from_arrow(pa.table({
        "doc_id": [1, 2, 3, 4],
        "html": ['<a href="u1">x</a> <link rel="s" href="u2"/>',
                 "no links here",
                 '<a class="c" href="">empty</a><a href="#top">t</a>',
                 '<a href="truncated']}))
    out = extract_links(ds).to_pandas()
    rows = list(zip(out.doc_id, out.link_no, out.href))
    # doc 2 has none; doc 4's unterminated href drops (no closing
    # quote — the regexp_extract_all contract); empty hrefs kept
    assert rows == [(1, 1, "u1"), (1, 2, "u2"),
                    (3, 1, ""), (3, 2, "#top")]
