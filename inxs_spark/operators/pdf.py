"""PDF / layout parsing plumbing (north_rule clause: "HTML boilerplate
strip, PDF/layout parse, DOM heuristics" — BASELINE.json:14).

No PDF library exists in this container (SURVEY.md §0), so the DECODE
step is stubbed exactly like :mod:`.multimodal`: ``parser='fake'``
produces a deterministic layout from the bytes; ``parser='pdfium'`` /
``'mupdf'`` raise NotImplementedError at call time. Everything AROUND
the parse is real and tested: binary column in, one output row per
(page, block) with typed geometry + reading-order index out, Arrow-
batched ``mapInPandas``, partition sizing by bytes.

The block table feeds the SAME downstream pipeline as HTML extraction:
blocks classified as body text concatenate (in reading order) into
``extracted_text`` with per-block spans — i.e. PDF is just another
front-end to the (text, spans) contract.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F

PDF_SCHEMA = "doc_id long, payload binary, n_pages int"

BLOCK_SCHEMA = (
    "doc_id long, page int, block_idx int, kind string, "
    "x0 float, y0 float, x1 float, y1 float, text string"
)

_BLOCK_KINDS = ("header", "body", "body", "body", "footer", "figure")


def synth_pdfs(spark, n: int = 64, seed: int = 42) -> DataFrame:
    rows = []
    for i in range(n):
        digest = hashlib.blake2b(f"pdf:{seed}:{i}".encode(), digest_size=32).digest()
        rows.append((i, bytearray(b"%PDF-1.7" + digest * (2 + i % 7)), 1 + i % 4))
    return spark.createDataFrame(rows, PDF_SCHEMA)


def _fake_layout(doc_id: int, payload: bytes, n_pages: int) -> list[tuple]:
    """Deterministic stand-in for a layout parser: blocks with
    plausible geometry and kind labels derived from the bytes."""
    out = []
    for page in range(n_pages):
        h = hashlib.blake2b(payload + page.to_bytes(2, "big"), digest_size=16).digest()
        n_blocks = 2 + h[0] % 4
        for b in range(n_blocks):
            kind = _BLOCK_KINDS[(h[b % 16] + b) % len(_BLOCK_KINDS)]
            y0 = 760.0 - b * 120.0
            out.append((
                doc_id, page, b, kind,
                72.0, y0, 540.0, y0 + 100.0,
                f"{kind} text {h[:4].hex()} p{page} b{b}",
            ))
    return out


def parse_layout(df: DataFrame, parser: str = "fake") -> DataFrame:
    """pdf rows → (page, block) rows via mapInPandas. One shuffle-free
    pass; geometry/kind columns are typed so downstream filters prune
    without touching payloads."""
    if parser != "fake":
        raise NotImplementedError(
            f"parser={parser!r}: real PDF parsing needs pdfium/mupdf, "
            "unavailable in this container (SURVEY.md §0). Replace "
            "_fake_layout; the Spark plumbing is in place."
        )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["doc_id", "page", "block_idx", "kind", "x0", "y0", "x1", "y1", "text"]
        for pdf in it:
            rows: list[tuple] = []
            for doc_id, payload, n_pages in zip(
                pdf["doc_id"], pdf["payload"], pdf["n_pages"]
            ):
                rows.extend(_fake_layout(int(doc_id), bytes(payload), int(n_pages)))
            yield pd.DataFrame(rows, columns=cols)

    return df.mapInPandas(batches, BLOCK_SCHEMA)


def extract_pdf_text(blocks: DataFrame) -> DataFrame:
    """Blocks → (doc_id, extracted_text, spans): body blocks in reading
    order (page, then top-down), same output contract as HTML
    extraction. Pure JVM: window-free groupBy with sorted collect."""
    body = blocks.filter(F.col("kind") == "body")
    agg = body.groupBy("doc_id").agg(
        F.array_sort(
            F.collect_list(F.struct("page", F.expr("CAST(-y0 AS float) AS neg_y0"),
                                    "block_idx", "text"))
        ).alias("blocks")
    )
    return agg.select(
        "doc_id",
        F.array_join(F.expr("transform(blocks, b -> b.text)"), "\n").alias(
            "extracted_text"
        ),
        F.expr(
            "transform(blocks, (b, i) -> struct("
            "b.page as page, i as block_order, b.text as text))"
        ).alias("spans"),
    )
