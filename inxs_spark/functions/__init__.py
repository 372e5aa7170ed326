"""Column-function façade — the engine's reusable JVM-side expression
helpers, collected in one import::

    from inxs_spark import functions as EF
    df.select(EF.cosine(...), EF.tokens(...), EF.shingles(...))
"""

from ..operators.dedup import minhash_signature_expr, shingles  # noqa: F401
from ..operators.similarity import cosine, dot, norm  # noqa: F401
from ..operators.text import bpe_ish_tokens, tokens  # noqa: F401

__all__ = [
    "shingles", "minhash_signature_expr",
    "cosine", "dot", "norm",
    "tokens", "bpe_ish_tokens",
]
