"""Rules kernel — the reference-semantics layer (SURVEY.md §1 item 1).

Pure Python, zero Spark imports. This package carries ALL reference
(funkyfuture/inxs) semantics and all parity tests; the Spark plane
(:mod:`inxs_spark.plans`) only batches it. While ``/root/reference`` is
an empty mount (SURVEY.md §0), this kernel applied serially IS the
parity oracle for the Spark pipeline.
"""

from .conditions import (
    Any,
    HasLocalname,
    HasNamespace,
    If,
    MatchesAttributes,
    MatchesTag,
    MatchesXPath,
    Not,
    OneOf,
)
from .errors import (
    AbortRule,
    AbortTransformation,
    FlowControl,
    InxsException,
    SkipToNextElement,
)
from .nodes import Node
from .parse import ParseError, parse_html, parse_payload, parse_xml, serialize, sniff
from .transformation import Ref, Rule, Transformation
from .traverse import (
    DEFAULT_TRAVERSAL,
    TRAVERSE_BOTTOM_TO_TOP,
    TRAVERSE_DEPTH_FIRST,
    TRAVERSE_LEFT_TO_RIGHT,
    TRAVERSE_RIGHT_TO_LEFT,
    TRAVERSE_ROOT_ONLY,
    TRAVERSE_TOP_TO_BOTTOM,
    TRAVERSE_WIDTH_FIRST,
)

__all__ = [
    "Any", "HasLocalname", "HasNamespace", "If", "MatchesAttributes",
    "MatchesTag", "MatchesXPath", "Not", "OneOf",
    "AbortRule", "AbortTransformation", "FlowControl", "InxsException",
    "SkipToNextElement",
    "Node", "ParseError", "parse_html", "parse_payload", "parse_xml",
    "serialize", "sniff",
    "Ref", "Rule", "Transformation",
    "DEFAULT_TRAVERSAL", "TRAVERSE_BOTTOM_TO_TOP", "TRAVERSE_DEPTH_FIRST",
    "TRAVERSE_LEFT_TO_RIGHT", "TRAVERSE_RIGHT_TO_LEFT", "TRAVERSE_ROOT_ONLY",
    "TRAVERSE_TOP_TO_BOTTOM", "TRAVERSE_WIDTH_FIRST",
]
