"""Layout-aware PDF text extraction — block/line/span reconstruction.

North-star surface (BASELINE.json north_star: "layout-aware PDF text
extraction with block/line/span reconstruction"). The reference repo
never parses PDF bytes itself — it consumes an OCR service's JSON with
block bboxes (DocParserJsonParser.php) whose Y-gap grouping
(TextBlockParsing.php:219-263) is the layout-reconstruction step. This
kernel brings the byte-stream half in-house for the subset of PDF that
text extraction needs, pure Python (zlib is stdlib, so FlateDecode
works; no codec dependencies):

1. scan ``stream ... endstream`` segments (lenient: /Length is not
   trusted), inflate when zlib-compressed;
2. tokenize content streams: BT/ET text objects, Tf (size), Td/TD/T*
   (line moves; TD also sets leading TL), Tm (text matrix), Tj / ' / "
   (show string), TJ (array show — kerning numbers dropped);
   literal ``(...)`` strings with \\-escapes and octal, hex ``<...>``
   strings decoded as latin-1 (simple fonts; no CMap — documented
   limitation, same one pdfminer has without ToUnicode);
3. reconstruct layout: spans carry the device-space (x, y) at show time;
   spans sharing a baseline (|Δy| <= 0.2·size) form a LINE ordered by x;
   lines stack into BLOCKS while the Y step stays within
   1.8× the leading (the Y-gap rule, TextBlockParsing.php:219-263
   analog); blocks order top-to-bottom, left-to-right.

Output: {"text", "blocks": [{x0, y0, lines: [{y, spans: [{x, size,
text}]}]}], "spans"} where spans are ("content", start, end) offsets of
each shown string's source bytes in the RAW payload — emitted only for
uncompressed streams, where raw offsets exist (FlateDecode spans are
offsets into bytes that are not in the payload; those are skipped).
"""

from __future__ import annotations

import re
import zlib

_STREAM_RE = re.compile(rb"stream\r?\n(.*?)\r?\nendstream", re.S)

_NUM_RE = re.compile(r"[+-]?(?:\d+\.?\d*|\.\d+)")

_WS = " \t\r\n\f\x00"
_DELIM = "()<>[]{}/%"

_ESCAPES = {"n": "\n", "r": "\r", "t": "\t", "b": "\b", "f": "\f",
            "(": "(", ")": ")", "\\": "\\"}


def _tokenize(src: str):
    """Content-stream tokens: ('str', text, start, end) for shown strings
    (offsets into src), ('num', float), ('name', str), ('op', str),
    ('arr_open'/'arr_close', None)."""
    i, n = 0, len(src)
    while i < n:
        c = src[i]
        if c in _WS:
            i += 1
            continue
        if c == "%":  # comment to EOL
            j = src.find("\n", i)
            i = n if j < 0 else j + 1
            continue
        if c == "(":
            start = i
            i += 1
            depth = 1
            out = []
            while i < n and depth:
                ch = src[i]
                if ch == "\\" and i + 1 < n:
                    nxt = src[i + 1]
                    if nxt in _ESCAPES:
                        out.append(_ESCAPES[nxt])
                        i += 2
                        continue
                    m = re.match(r"[0-7]{1,3}", src[i + 1:i + 4])
                    if m:
                        out.append(chr(int(m.group(0), 8)))
                        i += 1 + len(m.group(0))
                        continue
                    if nxt in "\r\n":
                        # \<EOL> line continuation: consume the EOL
                        # (a \r\n pair counts as ONE end-of-line)
                        i += 2
                        if nxt == "\r" and i < n and src[i] == "\n":
                            i += 1
                        continue
                    # unknown escape (PDF 32000-1 §7.3.4.2): the
                    # backslash alone is ignored, the char is KEPT
                    out.append(nxt)
                    i += 2
                    continue
                if ch == "(":
                    depth += 1
                elif ch == ")":
                    depth -= 1
                    if not depth:
                        i += 1
                        break
                out.append(ch)
                i += 1
            yield ("str", "".join(out), start, i)
            continue
        if c == "<" and i + 1 < n and src[i + 1] != "<":
            j = src.find(">", i)
            if j < 0:
                break
            hexes = re.sub(r"[^0-9A-Fa-f]", "", src[i + 1:j])
            if len(hexes) % 2:
                hexes += "0"
            text = bytes(int(hexes[k:k + 2], 16)
                         for k in range(0, len(hexes), 2)).decode("latin-1")
            yield ("str", text, i, j + 1)
            i = j + 1
            continue
        if c == "<":  # dict <<
            i += 2
            continue
        if c == ">":
            i += 1 if i + 1 >= n or src[i + 1] != ">" else 2
            continue
        if c == "[":
            yield ("arr_open", None, i, i + 1)
            i += 1
            continue
        if c == "]":
            yield ("arr_close", None, i, i + 1)
            i += 1
            continue
        if c == "/":
            j = i + 1
            while j < n and src[j] not in _WS + _DELIM:
                j += 1
            yield ("name", src[i + 1:j], i, j)
            i = j
            continue
        m = _NUM_RE.match(src, i)
        if m and m.start() == i:
            yield ("num", float(m.group(0)), i, m.end())
            i = m.end()
            continue
        j = i
        while j < n and src[j] not in _WS + _DELIM:
            j += 1
        if j > i:
            yield ("op", src[i:j], i, j)
            i = j
        else:
            i += 1


class _TextState:
    __slots__ = ("size", "leading", "tm_x", "tm_y", "line_x", "line_y")

    def __init__(self):
        self.size = 12.0
        self.leading = 0.0
        self.tm_x = self.tm_y = 0.0
        self.line_x = self.line_y = 0.0


def _spans_from_stream(src: str, base_offset: int | None):
    """Run the text operators over one decoded content stream. Returns
    [(x, y, size, text, raw_start, raw_end)] — raw offsets only when
    base_offset is not None (uncompressed stream)."""
    spans = []
    st = _TextState()
    stack: list[float] = []
    in_array = False
    pending_str: list[tuple[str, int, int]] = []

    def _show(text, s, e):
        if text:
            off = (base_offset + s, base_offset + e) \
                if base_offset is not None else None
            spans.append((st.tm_x, st.tm_y, st.size, text, off))
            st.tm_x += 0.5 * st.size * len(text)  # advance estimate

    for tok in _tokenize(src):
        kind, val = tok[0], tok[1]
        if kind == "num":
            stack.append(val)
            continue
        if kind == "arr_open":
            in_array = True
            pending_str = []
            continue
        if kind == "arr_close":
            in_array = False
            continue
        if kind == "str":
            if in_array:
                _show(val, tok[2], tok[3])
            else:
                pending_str = [(val, tok[2], tok[3])]
            continue
        if kind == "name":
            continue
        op = val
        if op == "BT":
            st.tm_x = st.tm_y = st.line_x = st.line_y = 0.0
        elif op == "Tf" and stack:
            st.size = stack[-1]
        elif op in ("Td", "TD") and len(stack) >= 2:
            tx, ty = stack[-2], stack[-1]
            if op == "TD":
                st.leading = -ty
            st.line_x += tx
            st.line_y += ty
            st.tm_x, st.tm_y = st.line_x, st.line_y
        elif op == "Tm" and len(stack) >= 6:
            st.line_x, st.line_y = stack[-2], stack[-1]
            st.tm_x, st.tm_y = st.line_x, st.line_y
        elif op == "TL" and stack:
            st.leading = stack[-1]
        elif op == "T*":
            st.line_y -= st.leading or st.size * 1.2
            st.tm_x, st.tm_y = st.line_x, st.line_y
        elif op == "Tj":
            for t, s, e in pending_str:
                _show(t, s, e)
            pending_str = []
        elif op in ("'", '"'):
            st.line_y -= st.leading or st.size * 1.2
            st.tm_x, st.tm_y = st.line_x, st.line_y
            for t, s, e in pending_str:
                _show(t, s, e)
            pending_str = []
        elif op == "TJ":
            pass  # strings already shown inside the array
        stack.clear()
    return spans


def extract_pdf_layout(payload: str | bytes) -> dict:
    """Extract text with block/line/span structure from a PDF payload.
    Lenient by design: every stream segment is tried (inflate → raw);
    non-text streams simply contribute no spans. Each stream segment is
    laid out as its OWN page (real PDFs carry one content stream per
    page object): without that, two pages' lines at the same baseline y
    would interleave. Pages concatenate in stream order; the rare
    page-split-across-streams layout degrades to two pages — documented
    leniency."""
    raw = payload.encode("latin-1", "replace") \
        if isinstance(payload, str) else payload

    text_parts: list[str] = []
    blocks: list[dict] = []
    spans: list[tuple] = []
    for m in _STREAM_RE.finditer(raw):
        body = m.group(1)
        base = None
        try:
            src = zlib.decompress(body).decode("latin-1")
        except zlib.error:
            src = body.decode("latin-1")
            base = m.start(1)
        page_spans = _spans_from_stream(src, base)
        if not page_spans:
            continue
        page = _layout_page(page_spans)
        if page["text"]:
            text_parts.append(page["text"])
        blocks.extend(page["blocks"])
        spans.extend(page["spans"])

    return {
        "text": "\n\n".join(text_parts).strip(),
        "blocks": blocks,
        "spans": spans,
    }


def _layout_page(page_spans: list) -> dict:
    """Block/line reconstruction for ONE page's spans."""
    # ---- lines: group by baseline (|dy| <= 0.2*size), order by x
    lines: list[dict] = []
    for x, y, size, text, off in sorted(
            page_spans, key=lambda s: (-s[1], s[0])):
        placed = False
        for ln in lines:
            if abs(ln["y"] - y) <= 0.2 * max(size, ln["size"]):
                ln["spans"].append({"x": x, "size": size, "text": text,
                                    "off": off})
                placed = True
                break
        if not placed:
            lines.append({"y": y, "size": size,
                          "spans": [{"x": x, "size": size, "text": text,
                                     "off": off}]})
    for ln in lines:
        ln["spans"].sort(key=lambda s: s["x"])
        ln["text"] = " ".join(s["text"].strip() for s in ln["spans"]
                              if s["text"].strip())
    lines.sort(key=lambda ln: -ln["y"])

    # ---- blocks: Y-gap rule — a step > 1.8x the running leading starts
    # a new block (TextBlockParsing.php:219-263 grouping analog)
    blocks: list[dict] = []
    prev_y = None
    for ln in lines:
        leading = max(ln["size"] * 1.2, 1.0)
        if prev_y is None or (prev_y - ln["y"]) > 1.8 * leading:
            blocks.append({"y0": ln["y"], "lines": []})
        blocks[-1]["lines"].append(ln)
        blocks[-1]["y1"] = ln["y"]
        prev_y = ln["y"]

    text = "\n\n".join(
        "\n".join(ln["text"] for ln in b["lines"] if ln["text"])
        for b in blocks).strip()

    spans = [("content", off[0], off[1])
             for b in blocks for ln in b["lines"] for s in ln["spans"]
             if (off := s.get("off")) is not None and s["text"].strip()]

    return {
        "text": text,
        "blocks": [{"y0": b["y0"], "y1": b["y1"],
                    "lines": [{"y": ln["y"],
                               "spans": [{"x": s["x"], "size": s["size"],
                                          "text": s["text"]}
                                         for s in ln["spans"]]}
                              for ln in b["lines"]]}
                   for b in blocks],
        "spans": spans,
    }


def pdf_can_parse(ext: str, text: str) -> float:
    """Detection: the payload IS a PDF byte stream."""
    if not text:
        return 0.0
    if text.startswith("%PDF-"):
        return 0.95
    return 0.9 if ext == "pdf" else 0.0
