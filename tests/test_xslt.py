

"""Descendant-axis (//) coverage for the XSLT-subset interpreter —
added late-r6; before this 'a//b' SILENTLY collapsed to 'a/b' (the
_split_path empty-part filter), violating the module's fail-fast
contract."""

from __future__ import annotations


def _run_xsl(xsl: str, xml: str) -> str:
    from cpx_etl_spark.functions.xslt import MiniXslt

    return MiniXslt(xsl).apply(xml)


_DESC_XML = """<root><a id="1"><b>x</b><c><b>y</b></c></a><b>z</b></root>"""


def test_descendant_axis_select():
    """'//b' selects every b in document order; 'a//b' only those
    strictly below a — before r6 'a//b' silently collapsed to 'a/b'."""
    xsl = """<xsl:stylesheet version="1.0"
        xmlns:xsl="http://www.w3.org/1999/XSL/Transform">
      <xsl:template match="root">
        <out all="{count(//b)}" under_a="{count(a//b)}">
          <xsl:for-each select="//b"><v><xsl:value-of select="."/></v></xsl:for-each>
        </out>
      </xsl:template>
    </xsl:stylesheet>"""
    out = _run_xsl(xsl, _DESC_XML)
    assert 'all="3"' in out and 'under_a="2"' in out
    assert out.index("<v>x</v>") < out.index("<v>y</v>") < out.index("<v>z</v>")


def test_descendant_axis_attributes_and_filter():
    xsl = """<xsl:stylesheet version="1.0"
        xmlns:xsl="http://www.w3.org/1999/XSL/Transform">
      <xsl:template match="root">
        <out n="{count(//a/@id)}" f="{count(//b[. = 'y'])}"/>
      </xsl:template>
    </xsl:stylesheet>"""
    out = _run_xsl(xsl, _DESC_XML)
    assert 'n="1"' in out and 'f="1"' in out


def test_descendant_axis_attribute_text_include_self():
    """'a//@id' expands to a/descendant-or-self::node()/attribute::id,
    which includes a's OWN attribute; same for 'a//text()' and a's own
    text child. Element-name steps stay strict-descendant (child::
    axis). Before r7 the or-self part was dropped (ADVICE r6)."""
    xml = '<root><a id="0">t0<b id="1">t1</b><c id="2">t2</c></a></root>'
    xsl = """<xsl:stylesheet version="1.0"
        xmlns:xsl="http://www.w3.org/1999/XSL/Transform">
      <xsl:template match="root">
        <out ids="{count(a//@id)}" texts="{count(a//text())}"
             elems="{count(a//a)}" first="{a//text()}"/>
      </xsl:template>
    </xsl:stylesheet>"""
    out = _run_xsl(xsl, xml)
    assert 'ids="3"' in out          # 0, 1, 2 — a's own id included
    assert 'texts="3"' in out        # t0, t1, t2
    assert 'elems="0"' in out        # a//a excludes a itself (child::)
    assert 'first="t0"' in out       # document order: a's own text first


def test_descendant_axis_fail_fast_cases():
    """Positional predicates on descendant steps, descendant match
    patterns, and malformed '//' runs all raise XsltUnsupported — the
    no-silent-wrong-answers contract."""
    import pytest

    from cpx_etl_spark.functions.xslt import XsltUnsupported

    def style(body, match="root"):
        return f"""<xsl:stylesheet version="1.0"
            xmlns:xsl="http://www.w3.org/1999/XSL/Transform">
          <xsl:template match="{match}">{body}</xsl:template>
        </xsl:stylesheet>"""

    with pytest.raises(XsltUnsupported, match="positional"):
        _run_xsl(style('<v><xsl:value-of select="//b[1]"/></v>'), _DESC_XML)
    with pytest.raises(XsltUnsupported, match="match pattern"):
        _run_xsl(style("<v/>", match="root//b"), _DESC_XML)
    with pytest.raises(XsltUnsupported, match="malformed|trailing"):
        _run_xsl(style('<v><xsl:value-of select="a///b"/></v>'), _DESC_XML)


def test_document_root_select_still_works():
    """select="/" (the document node) is legal XSLT 1.0 and must not
    trip the '//' malformed-path guard (code-review regression)."""
    xsl = """<xsl:stylesheet version="1.0"
        xmlns:xsl="http://www.w3.org/1999/XSL/Transform">
      <xsl:template match="root">
        <out n="{count(/)}"><xsl:copy-of select="/"/></out>
      </xsl:template>
    </xsl:stylesheet>"""
    out = _run_xsl(xsl, "<root><a>1</a></root>")
    assert 'n="1"' in out and "<a>1</a>" in out
