"""Rule conditions (SURVEY.md §3.A A9–A13).

Reference parity surface (upstream:inxs/__init__.py, unverifiable this
session — SURVEY.md §0):

- plain string → tag-name test; ``'*'`` matches every element; ``'/'``
  matches only the root; a path-looking string → ``MatchesXPath``
- dict → ``MatchesAttributes`` ({name: value}; values may be strings,
  compiled regex patterns, callables, or None for existence)
- ``Any(*conds)`` (OR), ``Not(*conds)`` (true iff none match, i.e.
  NOR), ``OneOf(*conds)`` (exactly one matches, XOR)
- ``HasNamespace(uri)``, ``HasLocalname(name)``
- ``If(x, operator, y)`` evaluated on resolved symbols
- arbitrary callable → predicate with dependency injection

Conditions are AND-ed within a rule and evaluated left to right with
short-circuiting (SURVEY.md §4.1 step 4).
"""

from __future__ import annotations

import re
from typing import Any as TAny, Callable, Optional

from .nodes import Node
from .xpath import looks_like_xpath, xpath_all


class Condition:
    """Base condition; subclasses implement __call__(element, ctx)."""

    def __call__(self, element: Node, state: "DocumentState") -> bool:
        raise NotImplementedError

    def describe(self) -> str:
        return self.__class__.__name__


class DocumentState:
    """Per-document evaluation state handed to conditions: the root,
    the symbol resolver (for DI conditions) and an XPath result cache
    (each MatchesXPath is evaluated once per document, then membership
    tested per element — our kernel-level optimization, SURVEY.md §5.2)."""

    __slots__ = ("root", "resolve", "xpath_cache", "nsmap")

    def __init__(self, root: Node, resolve: Callable[[Callable], dict],
                 nsmap: Optional[dict] = None) -> None:
        self.root = root
        self.resolve = resolve
        self.xpath_cache: dict[str, frozenset] = {}
        self.nsmap = nsmap


class MatchesTag(Condition):
    def __init__(self, tag: str) -> None:
        self.tag = tag

    def __call__(self, element: Node, state: DocumentState) -> bool:
        return element.tag == self.tag or element.localname == self.tag

    def describe(self) -> str:
        return f"tag={self.tag}"


class AnyElement(Condition):
    def __call__(self, element: Node, state: DocumentState) -> bool:
        # '*' is a NAME test: elements only — comment/PI/fragment nodes
        # are traversed but not matched (lxml iter('*') parity); target
        # them explicitly with the literal '#comment' / '#pi' tag
        return not element.tag.startswith("#")

    def describe(self) -> str:
        return "*"


class IsRoot(Condition):
    def __call__(self, element: Node, state: DocumentState) -> bool:
        return element is state.root

    def describe(self) -> str:
        return "/"


class MatchesXPath(Condition):
    """True iff the element is among the nodes selected by evaluating
    the xpath against the document root (reference semantics [M];
    SURVEY.md §3.A A10). ``xpath`` may be a callable returning the
    expression (late binding)."""

    def __init__(self, xpath) -> None:
        self.xpath = xpath

    def __call__(self, element: Node, state: DocumentState) -> bool:
        expr = self.xpath
        if callable(expr):
            expr = expr(**state.resolve(expr))
        cached = state.xpath_cache.get(expr)
        if cached is None:
            nodes = xpath_all(state.root, expr, root=state.root, nsmap=state.nsmap)
            cached = frozenset(id(n) for n in nodes)
            state.xpath_cache[expr] = cached
        return id(element) in cached

    def describe(self) -> str:
        return f"xpath={self.xpath if isinstance(self.xpath, str) else 'callable'}"


class MatchesAttributes(Condition):
    """Dict condition: every key must exist and its value match.
    Keys/values may be plain strings, compiled regex patterns (matched
    with ``.search``), callables (value → bool), or None (existence)."""

    def __init__(self, constraints: dict) -> None:
        self.constraints = constraints

    @staticmethod
    def _match_one(expected, actual: Optional[str]) -> bool:
        if actual is None:
            return False
        if expected is None:
            return True
        if isinstance(expected, str):
            return actual == expected
        if hasattr(expected, "search"):
            return bool(expected.search(actual))
        if callable(expected):
            return bool(expected(actual))
        return False

    def __call__(self, element: Node, state: DocumentState) -> bool:
        if not element.attrib:
            # non-empty constraints can never match an attribute-less
            # element (string keys need the attribute present; regex
            # keys need some attribute name to hit) — hot fast exit
            return not self.constraints
        for key, expected in self.constraints.items():
            if isinstance(key, str):
                if not self._match_one(expected, element.attrib.get(key)):
                    return False
            elif hasattr(key, "search"):
                # regex key: some attribute name must match, and its
                # value must satisfy the expected matcher
                hit = False
                for name, value in element.attrib.items():
                    if key.search(name) and self._match_one(expected, value):
                        hit = True
                        break
                if not hit:
                    return False
            else:
                return False
        return True

    def describe(self) -> str:
        parts = []
        for k, v in self.constraints.items():
            ks = k if isinstance(k, str) else getattr(k, "pattern", "re")
            vs = v if isinstance(v, str) else (
                getattr(v, "pattern", None) or getattr(v, "__name__", "fn")
                if v is not None else "∃")
            parts.append(f"{ks}~{vs}")
        return "attrs{" + ",".join(sorted(parts)) + "}"


class Any(Condition):
    def __init__(self, *conditions) -> None:
        self.conditions = [normalize_condition(c) for c in conditions]
        # fast path: OR of plain tag tests → one frozenset membership
        # check instead of N condition calls (hot in boilerplate rules)
        self._tag_set = (
            frozenset(c.tag for c in self.conditions)
            if all(isinstance(c, MatchesTag) for c in self.conditions)
            else None
        )

    def __call__(self, element: Node, state: DocumentState) -> bool:
        if self._tag_set is not None:
            return (
                element.tag in self._tag_set
                or element.localname in self._tag_set
            )
        return any(c(element, state) for c in self.conditions)

    def describe(self) -> str:
        return "any(" + ",".join(c.describe() for c in self.conditions) + ")"


class Not(Condition):
    """True iff NONE of the sub-conditions match (NOR)."""

    def __init__(self, *conditions) -> None:
        self.conditions = [normalize_condition(c) for c in conditions]

    def __call__(self, element: Node, state: DocumentState) -> bool:
        return not any(c(element, state) for c in self.conditions)

    def describe(self) -> str:
        return "not(" + ",".join(c.describe() for c in self.conditions) + ")"


class OneOf(Condition):
    """True iff EXACTLY one sub-condition matches (XOR)."""

    def __init__(self, *conditions) -> None:
        self.conditions = [normalize_condition(c) for c in conditions]

    def __call__(self, element: Node, state: DocumentState) -> bool:
        hits = 0
        for c in self.conditions:
            if c(element, state):
                hits += 1
                if hits > 1:
                    return False
        return hits == 1

    def describe(self) -> str:
        return "oneof(" + ",".join(c.describe() for c in self.conditions) + ")"


class HasNamespace(Condition):
    def __init__(self, namespace: Optional[str]) -> None:
        self.namespace = namespace

    def __call__(self, element: Node, state: DocumentState) -> bool:
        return element.namespace == self.namespace

    def describe(self) -> str:
        return f"ns={self.namespace}"


class HasLocalname(Condition):
    def __init__(self, localname: str) -> None:
        self.localname = localname

    def __call__(self, element: Node, state: DocumentState) -> bool:
        return element.localname == self.localname

    def describe(self) -> str:
        return f"localname={self.localname}"


class If(Condition):
    """Compare two resolved operands with a binary operator. Operands
    that are strings are looked up as symbols (context attribute /
    config key / core symbol) and fall back to the literal string when
    unresolvable; ``Ref`` objects resolve strictly."""

    def __init__(self, x, operator: Callable[[TAny, TAny], bool], y) -> None:
        self.x = x
        self.operator = operator
        self.y = y

    def __call__(self, element: Node, state: DocumentState) -> bool:
        resolve_value = state.resolve  # (callable) → kwargs; reuse for values
        from .transformation import Ref  # local import to avoid cycle

        def val(operand):
            if isinstance(operand, Ref):
                return state.resolve(operand)
            if callable(operand):
                return operand(**state.resolve(operand))
            if isinstance(operand, str):
                try:
                    return state.resolve(Ref(operand))
                except KeyError:
                    return operand
            return operand

        return bool(self.operator(val(self.x), val(self.y)))

    def describe(self) -> str:
        op = getattr(self.operator, "__name__", repr(self.operator))
        return f"if({self.x!r},{op},{self.y!r})"


class CallableCondition(Condition):
    """Arbitrary predicate with dependency injection (A13)."""

    def __init__(self, fn: Callable) -> None:
        self.fn = fn

    def __call__(self, element: Node, state: DocumentState) -> bool:
        return bool(self.fn(**state.resolve(self.fn)))

    def describe(self) -> str:
        return f"callable={getattr(self.fn, '__qualname__', repr(self.fn))}"


def normalize_condition(condition) -> Condition:
    """Shorthand normalization — the reference's 'parser' (SURVEY.md
    §4.2): string → tag/'*'/'/'/xpath; dict → attributes; callable →
    DI predicate; Condition instances pass through."""
    if isinstance(condition, Condition):
        return condition
    if isinstance(condition, str):
        if condition == "*":
            return AnyElement()
        if condition == "/":
            return IsRoot()
        if looks_like_xpath(condition):
            return MatchesXPath(condition)
        return MatchesTag(condition)
    if isinstance(condition, dict):
        return MatchesAttributes(condition)
    if callable(condition):
        return CallableCondition(condition)
    raise TypeError(f"cannot normalize condition: {condition!r}")
