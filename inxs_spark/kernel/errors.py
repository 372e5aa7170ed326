"""Flow-control and error exceptions (SURVEY.md §3.A A8).

Reference parity: the reference library exposes ``InxsException`` as
base plus ``AbortRule`` (stop applying this rule, continue with the
next step), ``AbortTransformation`` (stop all remaining steps, still
produce a result) and ``SkipToNextElement`` (abort the handler chain
for the current element only). These must never escape the Arrow UDF —
the executor converts real errors into ``failure`` column values.
"""

from __future__ import annotations


class InxsException(Exception):
    """Base for kernel flow-control and user-visible errors."""


class FlowControl(InxsException):
    """Base for the three flow-control signals."""


class AbortRule(FlowControl):
    """Stop applying the current rule; continue with the next step."""


class AbortTransformation(FlowControl):
    """Stop all remaining steps; the result is still produced."""


class SkipToNextElement(FlowControl):
    """Abort the handler chain for the current element only."""
