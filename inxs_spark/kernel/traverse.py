"""Tree traversal orders (SURVEY.md §3.A A5).

Reference parity: the reference exposes bitflag traversal constants
(TRAVERSE_DEPTH_FIRST, TRAVERSE_LEFT_TO_RIGHT, TRAVERSE_RIGHT_TO_LEFT,
TRAVERSE_TOP_TO_BOTTOM, TRAVERSE_BOTTOM_TO_TOP, TRAVERSE_WIDTH_FIRST,
TRAVERSE_ROOT_ONLY) combined per Rule or per Transformation; the
default is depth-first, left-to-right, top-to-bottom (preorder LTR).

Traversals MATERIALIZE the node list before handlers run, so handlers
may drop/unwrap elements mid-walk without corrupting iteration; a
dropped element is skipped when its turn comes (its ``parent`` link is
gone). Bottom-to-top (postorder) is the order of choice when dropping,
matching upstream guidance.
"""

from __future__ import annotations

from collections import deque
from typing import Iterator, List

from .nodes import Node

# bitflags — values are ours; names mirror the reference API surface
TRAVERSE_DEPTH_FIRST = 1
TRAVERSE_WIDTH_FIRST = 2
TRAVERSE_LEFT_TO_RIGHT = 4
TRAVERSE_RIGHT_TO_LEFT = 8
TRAVERSE_TOP_TO_BOTTOM = 16
TRAVERSE_BOTTOM_TO_TOP = 32
TRAVERSE_ROOT_ONLY = 64

DEFAULT_TRAVERSAL = (
    TRAVERSE_DEPTH_FIRST | TRAVERSE_LEFT_TO_RIGHT | TRAVERSE_TOP_TO_BOTTOM
)


def _preorder(root: Node, rtl: bool) -> List[Node]:
    # iterative (deep documents must not recurse; also ~2x faster than
    # generator recursion — hot path, profiled)
    out: list[Node] = []
    stack: list[Node] = [root]
    while stack:
        node = stack.pop()
        out.append(node)
        if node.children:
            stack.extend(node.children if rtl else reversed(node.children))
    return out


def _postorder(root: Node, rtl: bool) -> List[Node]:
    out = _preorder(root, not rtl)
    out.reverse()
    return out


def _bfs(node: Node, rtl: bool) -> Iterator[Node]:
    queue: deque[Node] = deque([node])
    while queue:
        current = queue.popleft()
        yield current
        children = reversed(current.children) if rtl else current.children
        queue.extend(children)


def traversal_nodes(root: Node, order: int) -> List[Node]:
    """Materialized node list for the given traversal order bitflags."""
    if order & TRAVERSE_ROOT_ONLY:
        return [root]
    rtl = bool(order & TRAVERSE_RIGHT_TO_LEFT)
    if order & TRAVERSE_WIDTH_FIRST:
        return list(_bfs(root, rtl))
    if order & TRAVERSE_BOTTOM_TO_TOP:
        return _postorder(root, rtl)
    return _preorder(root, rtl)


def is_attached(node: Node, root: Node) -> bool:
    """True if node is still reachable from root (not dropped)."""
    current = node
    while current is not None:
        if current is root:
            return True
        current = current.parent
    return False
