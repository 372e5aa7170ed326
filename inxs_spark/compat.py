"""Drop-in import surface mirroring the reference library's namespace.

A user of the reference (``from inxs import Transformation, Rule, lib``)
switches to this engine by changing one import::

    from inxs_spark import compat as inxs
    from inxs_spark.compat import Transformation, Rule, Ref, Any, lib

Symbol-for-symbol mapping of the public API (SURVEY.md §3.A/§3.B);
the semantics live in :mod:`inxs_spark.kernel`. The one deliberate
difference: documents are kernel ``Node`` trees (stdlib-parsed), not
lxml elements — parse with :func:`parse` / :func:`parse_html`.
"""

from .kernel import lib  # noqa: F401  (inxs.lib)
from .kernel.conditions import (  # noqa: F401
    Any,
    HasLocalname,
    HasNamespace,
    If,
    MatchesAttributes,
    MatchesXPath,
    Not,
    OneOf,
)
from .kernel.errors import (  # noqa: F401
    AbortRule,
    AbortTransformation,
    InxsException,
    SkipToNextElement,
)
from .kernel.parse import parse_html, parse_payload, parse_xml as parse, serialize  # noqa: F401
from .kernel.transformation import Ref, Rule, Transformation  # noqa: F401
from .kernel.traverse import (  # noqa: F401
    TRAVERSE_BOTTOM_TO_TOP,
    TRAVERSE_DEPTH_FIRST,
    TRAVERSE_LEFT_TO_RIGHT,
    TRAVERSE_RIGHT_TO_LEFT,
    TRAVERSE_ROOT_ONLY,
    TRAVERSE_TOP_TO_BOTTOM,
    TRAVERSE_WIDTH_FIRST,
)

__all__ = [
    "lib", "Any", "HasLocalname", "HasNamespace", "If",
    "MatchesAttributes", "MatchesXPath", "Not", "OneOf",
    "AbortRule", "AbortTransformation", "InxsException",
    "SkipToNextElement", "parse", "parse_html", "parse_payload",
    "serialize", "Ref", "Rule", "Transformation",
    "TRAVERSE_BOTTOM_TO_TOP", "TRAVERSE_DEPTH_FIRST",
    "TRAVERSE_LEFT_TO_RIGHT", "TRAVERSE_RIGHT_TO_LEFT",
    "TRAVERSE_ROOT_ONLY", "TRAVERSE_TOP_TO_BOTTOM",
    "TRAVERSE_WIDTH_FIRST",
]
