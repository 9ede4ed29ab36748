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
