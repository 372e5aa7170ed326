"""Small XPath-subset evaluator over kernel Node trees.

The reference library delegates XPath to lxml (``MatchesXPath``,
SURVEY.md §3.A A10); lxml is unavailable here (SURVEY.md §0), so this
module implements the subset needed by extraction rule-sets:

- absolute (``/a/b``), relative (``a/b``), descendant (``//a``,
  ``.//a``) location paths
- name tests: ``tag``, ``*``, ``{uri}local`` (Clark notation),
  ``ns:local`` resolved via a prefix map
- predicates: ``[@attr]``, ``[@attr='v']``, ``[@attr="v"]``,
  ``[position]`` (1-based integer), ``[child]`` (has child element),
  ``[text()='v']``
- steps ``.`` and ``..``

Compiled once per expression (module-level cache); evaluation returns
document-ordered, deduplicated node lists.
"""

from __future__ import annotations

import re
from functools import lru_cache
from typing import Callable, List, Optional, Sequence

from .nodes import Node

_STEP_RE = re.compile(
    r"""^
    (?P<axis>\.//|//|\./|/)?          # leading axis marker (first step only)
    (?P<name>\.\.|\.|\*|\{[^}]*\}[\w.-]+|[\w.-]+(?::[\w.-]+)?)
    (?P<preds>(?:\[[^\]]*\])*)
    $""",
    re.VERBOSE,
)

_PRED_RE = re.compile(r"\[([^\]]*)\]")


class XPathError(ValueError):
    pass


def _descendants_or_self(node: Node) -> List[Node]:
    out = [node]
    for child in node.children:
        out.extend(_descendants_or_self(child))
    return out


def _name_matches(node: Node, name: str, nsmap: Optional[dict]) -> bool:
    if name == "*":
        return True
    if name.startswith("{"):
        return node.tag == name
    if ":" in name:
        prefix, local = name.split(":", 1)
        if nsmap and prefix in nsmap:
            return node.tag == "{%s}%s" % (nsmap[prefix], local)
        return False
    # bare name matches either the full tag or the localname when the
    # element has no namespace; namespaced elements need Clark/prefix
    return node.tag == name


def _compile_predicate(pred: str) -> Callable[[Node, int], bool]:
    pred = pred.strip()
    if pred.isdigit():
        pos = int(pred)
        return lambda node, i, pos=pos: i == pos
    m = re.match(r"^@([\w:.-]+)\s*=\s*(?:'([^']*)'|\"([^\"]*)\")$", pred)
    if m:
        attr, v1, v2 = m.group(1), m.group(2), m.group(3)
        value = v1 if v1 is not None else v2
        return lambda node, i, attr=attr, value=value: node.attrib.get(attr) == value
    m = re.match(r"^@([\w:.-]+)$", pred)
    if m:
        attr = m.group(1)
        return lambda node, i, attr=attr: attr in node.attrib
    m = re.match(r"^text\(\)\s*=\s*(?:'([^']*)'|\"([^\"]*)\")$", pred)
    if m:
        value = m.group(1) if m.group(1) is not None else m.group(2)
        return lambda node, i, value=value: (node.text or "") == value
    m = re.match(r"^[\w.-]+$", pred)
    if m:
        child_name = pred
        return lambda node, i, n=child_name: any(
            c.tag == n or c.localname == n for c in node.children
        )
    raise XPathError(f"unsupported predicate: [{pred}]")


class _Step:
    __slots__ = ("descendant", "name", "predicates")

    def __init__(self, descendant: bool, name: str, predicates: Sequence[Callable]):
        self.descendant = descendant
        self.name = name
        self.predicates = list(predicates)


@lru_cache(maxsize=512)
def _compile(expr: str) -> tuple:
    """Compile expr → (absolute, initial_descendant, steps tuple)."""
    text = expr.strip()
    if not text:
        raise XPathError("empty xpath")
    absolute = False
    descendant_next = False
    if text.startswith(".//"):
        descendant_next = True
        text = text[3:]
    elif text.startswith("//"):
        absolute = True
        descendant_next = True
        text = text[2:]
    elif text.startswith("./"):
        text = text[2:]
    elif text.startswith("/"):
        absolute = True
        text = text[1:]

    steps: list[_Step] = []
    # split on '/', honoring '//' between steps as descendant axis
    parts = text.split("/")
    i = 0
    while i < len(parts):
        part = parts[i]
        if part == "":
            # came from '//' between steps → next step is descendant
            descendant_next = True
            i += 1
            continue
        preds_start = part.find("[")
        if preds_start == -1:
            name, preds_text = part, ""
        else:
            name, preds_text = part[:preds_start], part[preds_start:]
        if not name:
            raise XPathError(f"bad step {part!r} in {expr!r}")
        predicates = [_compile_predicate(p) for p in _PRED_RE.findall(preds_text)]
        steps.append(_Step(descendant_next, name, predicates))
        descendant_next = False
        i += 1
    if not steps:
        raise XPathError(f"no steps in xpath {expr!r}")
    return (absolute, tuple(steps))


def xpath_all(
    context: Node,
    expr: str,
    root: Optional[Node] = None,
    nsmap: Optional[dict] = None,
) -> List[Node]:
    """Evaluate the xpath subset; returns document-ordered nodes."""
    absolute, steps = _compile(expr)
    if absolute:
        start = root if root is not None else context
        # absolute path: first step name test applies to the root
        # itself for '/a/...' form, or any descendant for '//a'
        current = [start]
        first = steps[0]
        if not first.descendant:
            matched = (
                [start]
                if _name_matches(start, first.name, nsmap)
                and _passes(first, start, 1)
                else []
            )
            current = matched
            remaining = steps[1:]
        else:
            remaining = steps
            current = [start]
            return _walk(current, remaining, nsmap)
        return _walk(current, remaining, nsmap)
    return _walk([context], list(steps), nsmap)


def _passes(step: _Step, node: Node, position: int) -> bool:
    return all(pred(node, position) for pred in step.predicates)


def _walk(current: List[Node], steps: Sequence[_Step], nsmap: Optional[dict]) -> List[Node]:
    for step in steps:
        nxt: list[Node] = []
        seen: set[int] = set()
        for node in current:
            if step.name == ".":
                candidates = [node]
            elif step.name == "..":
                candidates = [node.parent] if node.parent is not None else []
            elif step.descendant:
                # descendant-or-self axis then name test
                candidates = [
                    d
                    for d in _descendants_or_self(node)
                    if _name_matches(d, step.name, nsmap)
                ]
            else:
                candidates = [
                    c for c in node.children if _name_matches(c, step.name, nsmap)
                ]
            if step.name in (".", ".."):
                matched = candidates
            else:
                matched = []
                pos = 0
                for cand in candidates:
                    pos += 1
                    if _passes(step, cand, pos):
                        matched.append(cand)
            for m in matched:
                if id(m) not in seen:
                    seen.add(id(m))
                    nxt.append(m)
        current = nxt
        if not current:
            break
    return current


def looks_like_xpath(s: str) -> bool:
    """Heuristic from the reference's Rule-condition normalization: a
    string containing a path separator or axis marker is an XPath, a
    bare name is a tag test (SURVEY.md §4.2)."""
    return any(ch in s for ch in "/[@") and s not in ("/", "*")
