"""Freki-format document model + parser (pure Python).

The reference consumes freki files through the external ``freki==0.3.0``
package (API call-site inventory: SURVEY.md §0). That package is not
installed here, so this module reimplements the observable format from the
reference sample files (``/root/reference/sample/sample_train.txt``,
``sample_test.txt``):

    doc_id=94.tetml page=1 block_id=1-2 bbox=213.4,521.7,433.8,538.5 1 1
    line=1  tag=O fonts=F0-16.74:Phrasal Movement and its Kin
    <blank line between blocks>

Line records carry dynamic ``key=value`` attributes (values may contain
spaces, e.g. ``lang_name=Northern Talyshi``); the text payload starts after
the first ``:`` of the (space-padded) attribute region — the ``fonts``
attribute is always last and its value never contains ``:``.
"""

from __future__ import annotations

import re
from collections import Counter, OrderedDict
from dataclasses import dataclass, field
from typing import Iterable, Optional

# A font is (font_id, size) — e.g. ("F0", 16.74). Hash/eq by value mirrors
# the reference's set arithmetic over FrekiFont (igtdetect.py:596).
Font = tuple[str, float]


@dataclass
class FrekiBlock:
    doc_id: str
    page: int
    block_id: str
    bbox: tuple[float, float, float, float]
    start_line: int
    stop_line: int
    lines: list["FrekiLine"] = field(default_factory=list)

    @property
    def llx(self) -> float:
        return self.bbox[0]

    def render_text(self) -> str:
        """Text rendering used for detected-IGT output (our engine's
        definition of the reference's ``str(block)``, igtdetect.py:1270 —
        the real freki renderer is unavailable; the oracle defines the
        byte-level contract and Spark must match it)."""
        return "\n".join(ln.text for ln in self.lines)


@dataclass
class FrekiLine:
    lineno: int
    text: str
    tag: str = "O"
    span_id: Optional[str] = None
    lang_name: Optional[str] = None
    lang_code: Optional[str] = None
    fonts: list[Font] = field(default_factory=list)
    attrs: dict[str, str] = field(default_factory=dict)
    block: Optional[FrekiBlock] = None

    def search(self, pattern: str, flags: int = 0):
        return re.search(pattern, self.text, flags)

    def __contains__(self, s: str) -> bool:
        return s in self.text


class FrekiDoc:
    def __init__(self, doc_id: str = ""):
        self.doc_id = doc_id
        self.blocks: list[FrekiBlock] = []
        self._by_lineno: dict[int, FrekiLine] = {}

    # -- reference API surface (SURVEY.md §0) ------------------------------
    def lines(self) -> Iterable[FrekiLine]:
        for b in self.blocks:
            yield from b.lines

    def get_line(self, lineno: int) -> Optional[FrekiLine]:
        return self._by_lineno.get(lineno)

    def __len__(self) -> int:
        return len(self._by_lineno)

    def fonts(self) -> list[Font]:
        """All fonts in doc order (feeds safe_mode, igtdetect.py:432)."""
        return [f for ln in self.lines() for f in ln.fonts]

    def llxs(self) -> list[float]:
        """Per-line block llx in doc order (feeds safe_mode, :433)."""
        return [ln.block.llx for ln in self.lines()]

    def spans(self) -> "OrderedDict[str, tuple[int, ...]]":
        """span_id → tuple of line numbers, in doc order (:1184-1186)."""
        spans: OrderedDict[str, list[int]] = OrderedDict()
        for ln in self.lines():
            if ln.span_id:
                spans.setdefault(ln.span_id, []).append(ln.lineno)
        return OrderedDict((k, tuple(v)) for k, v in spans.items())

    def add_block(self, block: FrekiBlock) -> None:
        self.blocks.append(block)
        for ln in block.lines:
            ln.block = block
            self._by_lineno[ln.lineno] = ln

    # -- serialization ------------------------------------------------------
    def render(self) -> str:
        """Serialize back to freki text (classified-doc sink shape)."""
        out = []
        for b in self.blocks:
            bbox = ",".join(_fmt_float(v) for v in b.bbox)
            out.append(
                f"doc_id={b.doc_id} page={b.page} block_id={b.block_id} "
                f"bbox={bbox} {b.start_line} {b.stop_line}"
            )
            for ln in b.lines:
                attrs = [f"line={ln.lineno}", f"tag={ln.tag}"]
                if ln.lang_name:
                    attrs.append(f"lang_name={ln.lang_name}")
                if ln.lang_code:
                    attrs.append(f"lang_code={ln.lang_code}")
                if ln.span_id:
                    attrs.append(f"span_id={ln.span_id}")
                for k, v in ln.attrs.items():
                    attrs.append(f"{k}={v}")
                fonts = ",".join(f"{fid}-{_fmt_float(sz)}" for fid, sz in ln.fonts)
                attrs.append(f"fonts={fonts}")
                out.append(" ".join(attrs) + ":" + ln.text)
            out.append("")
        return "\n".join(out)


def _fmt_float(v: float) -> str:
    s = f"{v:g}"
    return s


_BLOCK_RE = re.compile(
    r"^doc_id=(?P<doc_id>\S+)\s+page=(?P<page>\d+)\s+block_id=(?P<block_id>\S+)"
    r"\s+bbox=(?P<bbox>[\d.,\-]+)\s+(?P<start>\d+)\s+(?P<stop>\d+)\s*$"
)
_ATTR_KEY_RE = re.compile(r"(\w+)=")


def _parse_attr_region(region: str) -> dict[str, str]:
    """Parse ``k1=v1 k2=v2 ...`` where values may contain spaces: each value
    runs to the start of the next ``\\w+=`` key marker."""
    attrs: dict[str, str] = {}
    keys = list(_ATTR_KEY_RE.finditer(region))
    for i, m in enumerate(keys):
        start = m.end()
        end = keys[i + 1].start() if i + 1 < len(keys) else len(region)
        attrs[m.group(1)] = region[start:end].strip()
    return attrs


def _parse_fonts(s: str) -> list[Font]:
    fonts: list[Font] = []
    for part in s.split(","):
        part = part.strip()
        if not part:
            continue
        fid, _, size = part.rpartition("-")
        try:
            fonts.append((fid, float(size)))
        except ValueError:
            fonts.append((part, 0.0))
    return fonts


def parse_freki(text: str) -> FrekiDoc:
    """Parse one freki document from its text serialization."""
    doc = FrekiDoc()
    cur_block: Optional[FrekiBlock] = None
    for raw in text.split("\n"):
        line = raw.rstrip("\r").lstrip("﻿")
        if not line.strip():
            continue
        m = _BLOCK_RE.match(line)
        if m:
            if cur_block is not None:
                doc.add_block(cur_block)
            bbox_vals = [float(x) for x in m.group("bbox").split(",")]
            while len(bbox_vals) < 4:
                bbox_vals.append(0.0)
            cur_block = FrekiBlock(
                doc_id=m.group("doc_id"),
                page=int(m.group("page")),
                block_id=m.group("block_id"),
                bbox=tuple(bbox_vals[:4]),
                start_line=int(m.group("start")),
                stop_line=int(m.group("stop")),
            )
            if not doc.doc_id:
                doc.doc_id = cur_block.doc_id
            continue
        if line.startswith("line="):
            colon = line.find(":")
            if colon < 0:
                region, text_part = line, ""
            else:
                region, text_part = line[:colon], line[colon + 1:]
            attrs = _parse_attr_region(region)
            fl = FrekiLine(
                lineno=int(attrs.pop("line")),
                text=text_part,
                tag=attrs.pop("tag", "O"),
                span_id=attrs.pop("span_id", None),
                lang_name=attrs.pop("lang_name", None),
                lang_code=attrs.pop("lang_code", None),
                fonts=_parse_fonts(attrs.pop("fonts", "")),
                attrs=attrs,
            )
            if cur_block is not None:
                cur_block.lines.append(fl)
    if cur_block is not None:
        doc.add_block(cur_block)
    return doc


def read_freki(path: str) -> FrekiDoc:
    with open(path, "r", encoding="utf-8") as f:
        return parse_freki(f.read())


# ---------------------------------------------------------------------------
# Document-level statistics (reference FrekiInfo, igtdetect.py:71-97)
# ---------------------------------------------------------------------------

def safe_mode(iterable):
    """Most frequent item; ties broken by first occurrence (the reference's
    ``sorted(Counter(...).items(), reverse=True, key=count)`` is a stable
    sort over Counter insertion order — igtdetect.py:71-83)."""
    items = sorted(Counter(iterable).items(), reverse=True, key=lambda x: x[1])
    return items[0][0] if items else None


@dataclass
class FrekiInfo:
    def_font: Optional[Font]
    llx: Optional[float]

    @classmethod
    def from_doc(cls, doc: FrekiDoc) -> "FrekiInfo":
        return cls(def_font=safe_mode(doc.fonts()), llx=safe_mode(doc.llxs()))
