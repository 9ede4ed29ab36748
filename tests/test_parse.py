"""XML parser unit tests incl. malformed input (SURVEY.md §5.4)."""

from __future__ import annotations

from kgray.xmlparse import parse_score_xml

MUSICXML = """<score-partwise version="3.1">
  <work><work-number>W7</work-number><work-title>Test Suite in G major</work-title></work>
  <identification>
    <creator type="composer">Bach, Johann Sebastian</creator>
    <creator type="lyricist">Someone Else</creator>
    <encoding><encoding-date>1723-04-01</encoding-date></encoding>
  </identification>
  <part-list>
    <score-part id="P1"><part-name>Violin</part-name></score-part>
    <score-part id="P2"><part-name>Harpsichord</part-name></score-part>
  </part-list>
</score-partwise>"""

MEI = """<mei xmlns="http://www.music-encoding.org/ns/mei">
  <meiHead><fileDesc>
    <titleStmt><title>Aria di Prova</title>
      <composer><persName>Wolfgang Amadeus Mozart</persName></composer>
    </titleStmt>
    <pubStmt><date isodate="1787"/></pubStmt>
  </fileDesc>
  <workList><work><title>Aria di Prova</title><identifier>W9</identifier></work></workList>
  <perfMedium><perfResList><perfRes>Soprano</perfRes><perfRes>Piano</perfRes></perfResList></perfMedium>
  </meiHead>
</mei>"""


def test_musicxml():
    d = parse_score_xml(MUSICXML, "musicxml")
    assert d.parse_ok
    assert d.composers == ["Bach, Johann Sebastian"]  # lyricist ignored
    assert d.title == "Test Suite in G major"
    assert d.work_id == "W7"
    assert d.date == "1723-04-01"
    assert d.instruments == ["Violin", "Harpsichord"]


def test_mei():
    d = parse_score_xml(MEI, "mei")
    assert d.parse_ok
    assert d.composers == ["Wolfgang Amadeus Mozart"]
    assert d.title == "Aria di Prova"  # first title in doc order (titleStmt)
    assert d.work_id == "W9"
    assert d.date == "1787"
    assert d.instruments == ["Soprano", "Piano"]


def test_mei_composer_without_persname():
    xml = "<mei><meiHead><composer>Anon Ymous</composer><title>T</title></meiHead></mei>"
    d = parse_score_xml(xml, "mei")
    assert d.composers == ["Anon Ymous"]


def test_malformed_never_raises():
    assert not parse_score_xml(MUSICXML[: len(MUSICXML) // 2], "musicxml").parse_ok
    assert not parse_score_xml("", "musicxml").parse_ok
    assert not parse_score_xml("<a><b></a>", "mei").parse_ok
    assert not parse_score_xml("plain text", "txt").parse_ok


def test_missing_fields_ok():
    d = parse_score_xml("<score-partwise><part-list/></score-partwise>", "musicxml")
    assert d.parse_ok
    assert d.composers == [] and d.title is None and d.work_id is None


def test_fast_walk_matches_reference_walk():
    """The targeted-iter fast walk must equal the namespace-agnostic
    reference walk on the whole tiny fixture corpus plus adversarial
    edge cases (nested composers, CDATA, comments mid-text, whitespace
    titles, isodate attrs, off-namespace fallback)."""
    import glob

    import pyarrow.parquet as pq

    from kgray import fixtures
    from kgray.xmlparse import _parse_et, parse_score_xml

    def tup(d):
        return (d.parse_ok, d.composers, d.title, d.work_id, d.date, d.instruments)

    n = 0
    for f in sorted(glob.glob(fixtures.corpus_path("tiny") + "/*.parquet")):
        tb = pq.read_table(f, columns=["lang", "content"])
        for lang, c in zip(tb["lang"].to_pylist(), tb["content"].to_pylist()):
            if lang not in ("musicxml", "mei"):
                continue
            n += 1
            assert tup(_parse_et(c, lang)) == tup(parse_score_xml(c, lang))
    assert n > 1000

    edges = [
        ("musicxml", "<score><work><work-title> </work-title><work-title>Real"
                     "</work-title></work><identification><creator type='composer'>A<sub/>t"
                     "</creator><creator>B</creator></identification>"
                     "<part-list><part-name>Vn</part-name><part-name>  </part-name>"
                     "</part-list></score>"),
        ("mei", "<mei xmlns='urn:m'><composer><persName>P1</persName>own</composer>"
                "<composer>OnlyOwn</composer><composer><persName/></composer>"
                "<title>T<x/>s</title><date isodate=' 1821 '>txt</date>"
                "<identifier> I </identifier><perfRes>violin</perfRes></mei>"),
        ("mei", "<m><composer><persName>A</persName><composer><persName>B"
                "</persName></composer></composer></m>"),
        ("musicxml", "<a><work-title><![CDATA[ CD ]]></work-title></a>"),
        ("musicxml", "<a><work-title>x<!-- c -->y</work-title></a>"),
        # off-namespace targets: fast scan finds nothing in the root
        # namespace and must fall back to the reference walk
        ("musicxml", "<r xmlns='urn:a'><w xmlns='urn:b'><work-title xmlns='urn:b'>T"
                     "</work-title></w></r>"),
        ("musicxml", "broken <<<"),
        ("mei", ""),
    ]
    for lang, c in edges:
        assert tup(_parse_et(c, lang)) == tup(parse_score_xml(c, lang)), c[:60]
