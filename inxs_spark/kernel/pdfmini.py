"""Minimal real PDF writer + parser (pure stdlib — the container has
no pdfium/mupdf, SURVEY.md §0, but zlib IS stdlib, so FlateDecode is
fully supported).

Scope — the text-extraction subset of PDF 1.4:

- writer: real, spec-valid single-font PDFs (catalog, page tree,
  Helvetica, per-page content streams, correct xref + trailer),
  optionally Flate-compressed streams
- parser: object scan (no xref needed — robust to the sloppy files
  real crawls contain), stream slicing by /Length, FlateDecode,
  content-stream tokenizer for the text operators
  BT/ET, Tf, Td, TD, Tm, T*, TL, Tj, TJ, ' and " — producing
  positioned text runs (x, y, size, text) per page

Out of scope (raise or skip gracefully): encryption, xref streams,
object streams, CID/Type0 fonts, non-Flate filters. That subset is the
documented contract; ``operators/pdf.py`` layers block grouping and
header/body/footer classification on top.
"""

from __future__ import annotations

import re
import zlib
from typing import List, Optional, Tuple

#: a positioned text run: (x, y, font_size, text)
Run = Tuple[float, float, float, str]

PAGE_W, PAGE_H = 612.0, 792.0


class PdfError(ValueError):
    pass


# ---------------------------------------------------------------------------
# writer
# ---------------------------------------------------------------------------

def _esc(text: str) -> str:
    return text.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")


def build_pdf(pages: List[List[Run]], compress: bool = False) -> bytes:
    """Assemble a real PDF whose page content shows each run at its
    (x, y) with its font size. Byte-deterministic for fixed input."""
    objects: list[bytes] = []

    def add(body: bytes) -> int:
        objects.append(body)
        return len(objects)  # 1-based object number

    catalog_num = add(b"")  # placeholder, filled after pages exist
    pages_num = add(b"")
    font_num = add(
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"
    )

    page_nums: list[int] = []
    for runs in pages:
        parts = []
        for x, y, size, text in runs:
            parts.append(
                f"BT /F1 {size:g} Tf {x:g} {y:g} Td ({_esc(text)}) Tj ET"
            )
        content = "\n".join(parts).encode("latin-1", "replace")
        filt = b""
        if compress:
            content = zlib.compress(content)
            filt = b" /Filter /FlateDecode"
        stream_num = add(
            b"<< /Length " + str(len(content)).encode() + filt
            + b" >>\nstream\n" + content + b"\nendstream"
        )
        page_nums.append(
            add(
                (
                    f"<< /Type /Page /Parent {pages_num} 0 R "
                    f"/MediaBox [0 0 {PAGE_W:g} {PAGE_H:g}] "
                    f"/Contents {stream_num} 0 R "
                    f"/Resources << /Font << /F1 {font_num} 0 R >> >> >>"
                ).encode()
            )
        )

    kids = " ".join(f"{n} 0 R" for n in page_nums)
    objects[pages_num - 1] = (
        f"<< /Type /Pages /Kids [{kids}] /Count {len(page_nums)} >>".encode()
    )
    objects[catalog_num - 1] = (
        f"<< /Type /Catalog /Pages {pages_num} 0 R >>".encode()
    )

    out = bytearray(b"%PDF-1.4\n")
    offsets = [0] * (len(objects) + 1)
    for i, body in enumerate(objects, 1):
        offsets[i] = len(out)
        out += f"{i} 0 obj\n".encode() + body + b"\nendobj\n"
    xref_at = len(out)
    out += f"xref\n0 {len(objects) + 1}\n".encode()
    out += b"0000000000 65535 f \n"
    for i in range(1, len(objects) + 1):
        out += f"{offsets[i]:010d} 00000 n \n".encode()
    out += (
        f"trailer\n<< /Size {len(objects) + 1} /Root {catalog_num} 0 R >>\n"
        f"startxref\n{xref_at}\n%%EOF\n"
    ).encode()
    return bytes(out)


# ---------------------------------------------------------------------------
# parser
# ---------------------------------------------------------------------------

_OBJ_RE = re.compile(rb"(\d+)\s+\d+\s+obj\b")
_LENGTH_RE = re.compile(rb"/Length\s+(\d+)\b")
_TYPE_PAGE_RE = re.compile(rb"/Type\s*/Page\b(?!s)")
_CONTENTS_RE = re.compile(rb"/Contents\s+(?:(\d+)\s+\d+\s+R|\[([^\]]*)\])")
_REF_RE = re.compile(rb"(\d+)\s+\d+\s+R")
_MEDIABOX_RE = re.compile(
    rb"/MediaBox\s*\[\s*([\d.+-]+)\s+([\d.+-]+)\s+([\d.+-]+)\s+([\d.+-]+)"
)


def _scan_objects(data: bytes) -> dict[int, tuple[bytes, Optional[bytes]]]:
    """num → (dict/body bytes, stream bytes or None). Object scan, no
    xref: slices streams by /Length so binary content never confuses
    the scanner."""
    objects: dict[int, tuple[bytes, Optional[bytes]]] = {}
    pos = 0
    while True:
        m = _OBJ_RE.search(data, pos)
        if m is None:
            break
        num = int(m.group(1))
        body_start = m.end()
        stream_kw = data.find(b"stream", body_start)
        endobj = data.find(b"endobj", body_start)
        if endobj == -1:
            break
        if stream_kw != -1 and stream_kw < endobj:
            head = data[body_start:stream_kw]
            lm = _LENGTH_RE.search(head)
            if lm is None:
                raise PdfError(f"object {num}: stream without direct /Length")
            length = int(lm.group(1))
            dstart = stream_kw + len(b"stream")
            if data[dstart : dstart + 2] == b"\r\n":
                dstart += 2
            elif data[dstart : dstart + 1] == b"\n":
                dstart += 1
            stream = data[dstart : dstart + length]
            endobj = data.find(b"endobj", dstart + length)
            if endobj == -1:
                break
            objects[num] = (head, stream)
        else:
            objects[num] = (data[body_start:endobj], None)
        pos = endobj + len(b"endobj")
    if not objects:
        raise PdfError("no PDF objects found")
    return objects


_STR_ESCAPES = {
    b"n": "\n", b"r": "\r", b"t": "\t", b"b": "\b", b"f": "\f",
    b"(": "(", b")": ")", b"\\": "\\",
}


def _tokenize_content(content: bytes):
    """Yield ('str', text) | ('num', float) | ('op', name) tokens."""
    i = 0
    n = len(content)
    while i < n:
        c = content[i : i + 1]
        if c in b" \t\r\n":
            i += 1
        elif c == b"%":
            j = content.find(b"\n", i)
            i = n if j == -1 else j + 1
        elif c == b"(":
            depth = 1
            i += 1
            buf = []
            while i < n and depth:
                ch = content[i : i + 1]
                if ch == b"\\" and i + 1 < n:
                    esc = content[i + 1 : i + 2]
                    if esc in _STR_ESCAPES:
                        buf.append(_STR_ESCAPES[esc])
                        i += 2
                        continue
                    if esc.isdigit():  # octal \ddd
                        oct_digits = content[i + 1 : i + 4]
                        k = 1
                        while k < 3 and k < len(oct_digits) and oct_digits[:k + 1].isdigit():
                            k += 1
                        buf.append(chr(int(oct_digits[:k], 8)))
                        i += 1 + k
                        continue
                    i += 1  # line continuation / unknown escape: skip '\'
                    continue
                if ch == b"(":
                    depth += 1
                elif ch == b")":
                    depth -= 1
                    if depth == 0:
                        i += 1
                        break
                buf.append(ch.decode("latin-1"))
                i += 1
            yield ("str", "".join(buf))
        elif c == b"[" or c == b"]":
            yield ("op", c.decode())
            i += 1
        elif c == b"/":
            j = i + 1
            while j < n and content[j : j + 1] not in b" \t\r\n()[]<>/%":
                j += 1
            yield ("name", content[i + 1 : j].decode("latin-1"))
            i = j
        elif c in b"+-.0123456789":
            j = i + 1
            while j < n and content[j : j + 1] in b"+-.0123456789":
                j += 1
            try:
                yield ("num", float(content[i:j]))
            except ValueError:
                pass
            i = j
        elif c == b"<":
            # hex string or dict — skip to the matching close (not text
            # we extract; keeps the tokenizer in sync)
            if content[i : i + 2] == b"<<":
                j = content.find(b">>", i)
                i = n if j == -1 else j + 2
            else:
                j = content.find(b">", i)
                i = n if j == -1 else j + 1
        else:
            j = i
            while j < n and content[j : j + 1] not in b" \t\r\n()[]<>/%":
                j += 1
            if j > i:
                yield ("op", content[i:j].decode("latin-1"))
                i = j
            else:
                i += 1


def _runs_from_content(content: bytes) -> List[Run]:
    """Execute the text-positioning subset of the content stream."""
    runs: List[Run] = []
    size = 12.0
    x = y = 0.0
    line_x = line_y = 0.0
    leading = 0.0
    stack: list = []  # operand stack

    def show(text: str) -> None:
        nonlocal x
        if text:
            runs.append((x, y, size, text))
            # advance roughly half an em per char — enough for block
            # bboxes; exact widths need font metrics (out of scope)
            x += 0.5 * size * len(text)

    def newline() -> None:
        nonlocal x, y, line_x, line_y
        line_y -= leading
        x, y = line_x, line_y

    for kind, val in _tokenize_content(content):
        if kind in ("str", "num", "name"):
            stack.append((kind, val))
            continue
        op = val
        if op == "BT":
            x = y = line_x = line_y = 0.0
            stack.clear()
        elif op == "Tf" and stack:
            if stack[-1][0] == "num":
                size = float(stack[-1][1])
            stack.clear()
        elif op == "TL" and stack and stack[-1][0] == "num":
            leading = float(stack[-1][1])
            stack.clear()
        elif op in ("Td", "TD"):
            nums = [v for k, v in stack if k == "num"][-2:]
            if len(nums) == 2:
                line_x += nums[0]
                line_y += nums[1]
                x, y = line_x, line_y
                if op == "TD":
                    leading = -nums[1]
            stack.clear()
        elif op == "Tm":
            nums = [v for k, v in stack if k == "num"][-6:]
            if len(nums) == 6:
                line_x, line_y = nums[4], nums[5]
                x, y = line_x, line_y
            stack.clear()
        elif op == "T*":
            newline()
            stack.clear()
        elif op == "Tj":
            if stack and stack[-1][0] == "str":
                show(stack[-1][1])
            stack.clear()
        elif op == "'":
            newline()
            if stack and stack[-1][0] == "str":
                show(stack[-1][1])
            stack.clear()
        elif op == '"':
            newline()
            if stack and stack[-1][0] == "str":
                show(stack[-1][1])
            stack.clear()
        elif op == "]":
            # TJ array: strings show, numbers kern (ignored for bboxes)
            pass
        elif op == "TJ":
            for k, v in stack:
                if k == "str":
                    show(v)
            stack.clear()
        elif op == "ET":
            stack.clear()
    return runs


def parse_pdf(data: bytes) -> List[dict]:
    """→ one dict per page: {'width', 'height', 'runs': [Run, ...]} in
    document page order."""
    if not data.startswith(b"%PDF"):
        raise PdfError("not a PDF (missing %PDF header)")
    objects = _scan_objects(data)
    pages = []
    for num in sorted(objects):
        head, _stream = objects[num]
        if _TYPE_PAGE_RE.search(head) is None:
            continue
        width, height = PAGE_W, PAGE_H
        mb = _MEDIABOX_RE.search(head)
        if mb:
            width = float(mb.group(3)) - float(mb.group(1))
            height = float(mb.group(4)) - float(mb.group(2))
        content = b""
        cm = _CONTENTS_RE.search(head)
        if cm:
            refs = [int(cm.group(1))] if cm.group(1) else [
                int(r.group(1)) for r in _REF_RE.finditer(cm.group(2))
            ]
            for ref in refs:
                if ref not in objects or objects[ref][1] is None:
                    continue
                chead, cstream = objects[ref]
                if b"/FlateDecode" in chead:
                    try:
                        cstream = zlib.decompress(cstream)
                    except zlib.error as exc:
                        raise PdfError(f"bad FlateDecode stream: {exc}")
                elif b"/Filter" in chead:
                    raise PdfError("unsupported stream filter (only Flate)")
                content += cstream + b"\n"
        pages.append({
            "width": width,
            "height": height,
            "runs": _runs_from_content(content),
        })
    if not pages:
        raise PdfError("no /Type /Page objects found")
    return pages
