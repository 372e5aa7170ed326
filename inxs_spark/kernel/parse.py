"""Payload parsing: XML (ElementTree-backed) and tag-soup HTML.

The reference library parses documents with ``lxml.etree`` / an HTML
parser (SURVEY.md §2.1; lxml is unavailable in this environment —
SURVEY.md §0). This module provides the same capability on the stdlib:

- ``parse_xml``  — C-accelerated ``xml.etree.ElementTree`` parse,
  converted to kernel :class:`~inxs_spark.kernel.nodes.Node` trees.
- ``parse_html`` — ``html.parser.HTMLParser`` tree builder with
  void-element and implied-end-tag handling (``<p>``, ``<li>``,
  ``<td>`` …), since tag-soup HTML is a first-class payload kind
  (FIXTURES.md §2).
- ``sniff``      — classify a payload as xml / html / text / empty.
- ``serialize``  — Node tree → markup string (round-trip for goldens).

Pure Python + stdlib only; no Spark imports.
"""

from __future__ import annotations

import re
import xml.etree.ElementTree as ET
from html import escape
from html.parser import HTMLParser
from typing import Optional

from .nodes import COMMENT_TAG, PI_TAG, Node


class ParseError(Exception):
    """Raised when a payload cannot be parsed as its sniffed kind."""


# ---------------------------------------------------------------------------
# XML
# ---------------------------------------------------------------------------

def _from_etree(el: ET.Element, lower: bool = False) -> Node:
    # iterative (deep documents must not recurse). The child loop is
    # INLINED rather than calling a per-node helper — one Python call
    # frame per element was ~23% of conversion time (profiled); this
    # runs once per DOM node on every turn, the hottest loop in parse.
    comment_t, pi_t = ET.Comment, ET.ProcessingInstruction

    def mk(src: ET.Element) -> Node:
        tag = src.tag
        if type(tag) is not str:
            # TreeBuilder(insert_comments/pis) emits nodes whose tag is
            # the ET.Comment / ET.ProcessingInstruction function
            if tag is comment_t:
                return Node(COMMENT_TAG, {}, src.text, src.tail)
            # ET folds a PI into text='target data'; split back so the
            # node mirrors lxml's .target/.text model
            target, _, data = (src.text or "").partition(" ")
            return Node(PI_TAG, {"target": target}, data, src.tail)
        attrib = src.attrib
        if lower:
            tag = tag.lower()
            attrib = {k.lower(): v for k, v in attrib.items()} if attrib else {}
        else:
            attrib = dict(attrib) if attrib else {}
        return Node(tag, attrib, src.text, src.tail)

    root = mk(el)
    stack: list[tuple[ET.Element, Node]] = [(el, root)]
    while stack:
        src, dst = stack.pop()
        children = dst.children
        for child in src:
            tag = child.tag
            if type(tag) is str:
                attrib = child.attrib
                if lower:
                    c = Node(
                        tag.lower(),
                        {k.lower(): v for k, v in attrib.items()} if attrib else {},
                        child.text, child.tail,
                    )
                else:
                    c = Node(tag, dict(attrib) if attrib else {},
                             child.text, child.tail)
            elif tag is comment_t:
                c = Node(COMMENT_TAG, {}, child.text, child.tail)
            else:
                target, _, data = (child.text or "").partition(" ")
                c = Node(PI_TAG, {"target": target}, data, child.tail)
            c.parent = dst
            children.append(c)
            if len(child):
                stack.append((child, c))
    return root


def _et_parser() -> ET.XMLParser:
    # comment/PI nodes kept in the tree (lxml tree-shape parity);
    # parsers are single-use, so build one per parse (cheap C object)
    return ET.XMLParser(
        target=ET.TreeBuilder(insert_comments=True, insert_pis=True)
    )


def parse_xml(payload: str) -> Node:
    try:
        root = ET.fromstring(payload, parser=_et_parser())
    except ET.ParseError as exc:
        raise ParseError(f"xml parse error: {exc}") from exc
    return _from_etree(root)


# ---------------------------------------------------------------------------
# HTML (tag soup)
# ---------------------------------------------------------------------------

VOID_ELEMENTS = frozenset(
    "area base br col embed hr img input link meta param source track wbr".split()
)

# Opening tag X implies closing any open tag in IMPLIED_END[X] first
# (subset of the HTML5 tree-construction rules sufficient for
# boilerplate-strip workloads; the supported-HTML contract is tested).
_IMPLIED_END: dict[str, frozenset] = {
    "p": frozenset({"p"}),
    "li": frozenset({"li"}),
    "dt": frozenset({"dt", "dd"}),
    "dd": frozenset({"dt", "dd"}),
    "tr": frozenset({"tr", "td", "th"}),
    "td": frozenset({"td", "th"}),
    "th": frozenset({"td", "th"}),
    "thead": frozenset({"tr", "td", "th"}),
    "tbody": frozenset({"thead", "tr", "td", "th"}),
    "option": frozenset({"option"}),
    # block elements close an open <p>
    "div": frozenset({"p"}),
    "ul": frozenset({"p"}),
    "ol": frozenset({"p"}),
    "table": frozenset({"p"}),
    "section": frozenset({"p"}),
    "article": frozenset({"p"}),
    "header": frozenset({"p"}),
    "footer": frozenset({"p"}),
    "nav": frozenset({"p"}),
    "main": frozenset({"p"}),
    "aside": frozenset({"p"}),
    "h1": frozenset({"p"}),
    "h2": frozenset({"p"}),
    "h3": frozenset({"p"}),
    "h4": frozenset({"p"}),
    "h5": frozenset({"p"}),
    "h6": frozenset({"p"}),
    "pre": frozenset({"p"}),
    "blockquote": frozenset({"p"}),
}


class _TreeBuilder(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.root = Node("#fragment")
        self.stack: list[Node] = [self.root]
        self._last_closed: Optional[Node] = None

    # text goes to the open element's text (if no children yet) or the
    # last child's tail — the ElementTree text/tail model.
    def _add_text(self, data: str) -> None:
        if not data:
            return
        top = self.stack[-1]
        if top.children:
            last = top.children[-1]
            last.tail = (last.tail or "") + data
        else:
            top.text = (top.text or "") + data

    def handle_data(self, data: str) -> None:
        self._add_text(data)

    def handle_entityref(self, name: str) -> None:  # pragma: no cover
        self._add_text(f"&{name};")

    def _close_implied(self, tag: str) -> None:
        closers = _IMPLIED_END.get(tag)
        if not closers:
            return
        while len(self.stack) > 1 and self.stack[-1].tag in closers:
            self.stack.pop()

    def handle_starttag(self, tag: str, attrs: list) -> None:
        tag = tag.lower()
        self._close_implied(tag)
        node = Node(tag, {k: (v if v is not None else "") for k, v in attrs})
        self.stack[-1].append(node)
        if tag not in VOID_ELEMENTS:
            self.stack.append(node)

    def handle_startendtag(self, tag: str, attrs: list) -> None:
        tag = tag.lower()
        self._close_implied(tag)
        node = Node(tag, {k: (v if v is not None else "") for k, v in attrs})
        self.stack[-1].append(node)

    def handle_comment(self, data: str) -> None:
        # comments become tree nodes (never pushed — they have no
        # children); following text lands on their TAIL via _add_text,
        # matching the lxml comment-node model
        self.stack[-1].append(Node(COMMENT_TAG, {}, data))

    def handle_pi(self, data: str) -> None:
        target, _, rest = data.partition(" ")
        self.stack[-1].append(Node(PI_TAG, {"target": target.rstrip("?")},
                                   rest.rstrip("?") or None))

    def handle_endtag(self, tag: str) -> None:
        tag = tag.lower()
        if tag in VOID_ELEMENTS:
            return
        # close up to the matching open tag; ignore stray end tags
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].tag == tag:
                del self.stack[i:]
                return


def parse_html(payload: str) -> Node:
    # fast path: much real-world (and most synthetic) HTML is well-
    # formed XML — the C-accelerated ElementTree parse is ~3x faster
    # than the pure-Python tag-soup builder. Tags/attrs are lowercased
    # to match HTMLParser semantics; any soup (void elements, implied
    # end tags, unquoted attrs, bare entities) raises and falls back.
    try:
        return _from_etree(ET.fromstring(payload, parser=_et_parser()), lower=True)
    except ET.ParseError:
        pass
    builder = _TreeBuilder()
    try:
        builder.feed(payload)
        builder.close()
    except Exception as exc:  # HTMLParser rarely raises, but be safe
        raise ParseError(f"html parse error: {exc}") from exc
    root = builder.root
    # unwrap the synthetic fragment root when there is exactly one
    # element child and no stray top-level text
    elems = root.children
    if len(elems) == 1 and not (root.text and root.text.strip()):
        only = elems[0]
        if not (only.tail and only.tail.strip()):
            only.parent = None
            only.tail = None
            return only
    return root


# ---------------------------------------------------------------------------
# Sniffing
# ---------------------------------------------------------------------------

_HTML_HINT = re.compile(
    r"<(?:!doctype\s+html|html|body|div|p|span|table|ul|ol|li|nav|main|header"
    r"|footer|article|section|br|h[1-6]"
    r"|a|b|i|em|strong|td|th|tr|blockquote|pre|img|form|iframe|script|style)"
    r"[\s/>]",
    re.IGNORECASE,
)
_XML_DECL = re.compile(r"^\s*<\?xml", re.IGNORECASE)
_TAG = re.compile(r"<[A-Za-z!?/]")


def sniff(payload: Optional[str]) -> str:
    """Classify payload → 'empty' | 'text' | 'html' | 'xml'."""
    if payload is None or payload.strip() == "":
        return "empty"
    if not _TAG.search(payload):
        return "text"
    if _XML_DECL.match(payload):
        return "xml"
    if _HTML_HINT.search(payload):
        return "html"
    return "xml"


def parse_payload(payload: str, kind: Optional[str] = None) -> tuple[Optional[Node], str]:
    """Parse by sniffed kind. Returns (root_or_None, kind).

    'empty' and 'text' return (None, kind) — callers handle them
    without a DOM. A payload sniffed as XML that fails to parse falls
    back to the tag-soup HTML parser UNLESS it carries an explicit
    ``<?xml`` declaration (those are real XML and must fail loudly):
    web-scale soup using tags outside the sniffer's hint list (e.g.
    ``<select><option>a<option>b``) must still extract.
    """
    k = kind or sniff(payload)
    if k in ("empty", "text"):
        return None, k
    if k == "xml":
        try:
            return parse_xml(payload), k
        except ParseError:
            if _XML_DECL.match(payload):
                raise
            return parse_html(payload), "html"
    return parse_html(payload), k


# ---------------------------------------------------------------------------
# Serialization (tests / goldens / CLI)
# ---------------------------------------------------------------------------

def serialize(node: Node, html_mode: bool = False) -> str:
    out: list[str] = []
    _write(node, out, html_mode)
    return "".join(out)


def _write(node: Node, out: list[str], html_mode: bool) -> None:
    if node.tag == COMMENT_TAG:
        out.append(f"<!--{node.text or ''}-->")
        return
    if node.tag == PI_TAG:
        target = node.attrib.get("target", "")
        data = node.text or ""
        out.append(f"<?{target}{' ' + data if data else ''}?>")
        return
    if node.tag == "#fragment":
        if node.text:
            out.append(escape(node.text, quote=False))
        for child in node.children:
            _write(child, out, html_mode)
            if child.tail:
                out.append(escape(child.tail, quote=False))
        return
    tag = node.tag
    ns_attr = ""
    if tag.startswith("{"):
        uri, local = tag[1:].split("}", 1)
        tag = local
        ns_attr = f' xmlns="{escape(uri)}"'
    out.append(f"<{tag}{ns_attr}")
    for k, v in node.attrib.items():
        if k.startswith("{"):
            k = k[k.index("}") + 1 :]
        out.append(f' {k}="{escape(str(v))}"')
    if not node.children and not node.text:
        if html_mode and tag in VOID_ELEMENTS:
            out.append(">")
        else:
            out.append("/>")
    else:
        out.append(">")
        if node.text:
            out.append(escape(node.text, quote=False))
        for child in node.children:
            _write(child, out, html_mode)
            if child.tail:
                out.append(escape(child.tail, quote=False))
        out.append(f"</{tag}>")
