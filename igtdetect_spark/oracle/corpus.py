"""Deterministic synthetic ``pages`` corpus generator (FIXTURES.md §1).

Seeded, wall-clock-free. Each document interleaves boilerplate English
prose, seeded IGT instances (numbered language line + gloss line built from
gram cues + quoted translation line), and citation/metadata lines. Ground
truth ``(start_line, end_line, tag sequence)`` is recorded by construction.

Used for: unit tests, the driver smoke/bench corpora, and skew tests
(mega-docs). No external data — vocabulary is inlined.
"""

from __future__ import annotations

import random
from dataclasses import dataclass, field
from datetime import datetime, timedelta

PROSE = [
    "The distribution of clitics in this language is not well understood.",
    "Previous analyses have focused on the syntactic position of the verb.",
    "We argue that the agreement marker is best analyzed as a clitic.",
    "This pattern is widely attested across the language family.",
    "The data in this section were collected during fieldwork.",
    "Consider the following example from the corpus.",
    "As shown above, the pronominal system distinguishes three persons.",
    "Table 2 summarizes the agreement paradigms discussed so far.",
    "The remainder of this paper is organized as follows.",
    "These facts suggest a diachronic path from pronoun to agreement.",
]

LANG_WORDS = [
    "av-on", "m-ni-s", "vogand-son-e", "kono", "bagam", "kard-e",
    "epist-a", "lng-on-m", "cic-", "tolo", "ʃto", "drugoj", "žena",
    "qu'est-ce", "père", "déjà", "tlɨ-kato", "naq-tse", "p'it'i",
]
CYR_WORDS = ["што", "жена", "друго́й", "кни́га", "пишу́"]
GLOSS_TOKENS = [
    "1SG.PRON", "3_PL", "ACC", "NOM-DAT", "send-3_PL", "love-2SG",
    "make-AUX", "POSS", "ERG.DET", "tie_up-PERF", "what-2SG", "leg-PL-1SG",
]
TRANSLATIONS = [
    "They sent me.", "Where did you fall in love with me?",
    "What did you tie up?", "His legs were tied up.",
    "The woman wrote a book.", "I have already seen my father.",
]
LANG_NAMES = [
    ("Northern Talyshi", "tly"), ("Cypriot Greek", "ell"),
    ("Russian", "rus"), ("French", "fra"), ("Quechua", "que"),
]
AUTHORS = ["Schulze", "Terzi", "Cysouw", "Haspelmath", "Comrie"]


@dataclass
class GoldSpan:
    start_line: int
    end_line: int
    tags: list[str]


@dataclass
class SyntheticDoc:
    url: str
    warc_ts: datetime
    html: bytes | None
    text: str
    lang: str
    gold_tags: list[str] = field(default_factory=list)  # per non-blank line
    gold_spans: list[GoldSpan] = field(default_factory=list)


def _igt_instance(rng: random.Random, num: int) -> tuple[list[str], list[str]]:
    """One IGT instance: (lines, tags)."""
    lang_words = rng.sample(
        CYR_WORDS if rng.random() < 0.25 else LANG_WORDS, k=rng.randint(2, 4)
    )
    gloss = rng.sample(GLOSS_TOKENS, k=len(lang_words))
    trans = rng.choice(TRANSLATIONS)
    indent = " " * rng.randint(4, 8)
    lines = [
        f"({num})  {indent}" + "   ".join(lang_words),
        f"      {indent}" + "   ".join(gloss),
        f"      {indent}‘{trans}’",
    ]
    return lines, ["L", "G", "T"]


def make_doc(doc_idx: int, seed: int = 42, n_paragraphs: int = 8,
             igt_prob: float = 0.5, as_html: bool = False,
             lines_target: int | None = None) -> SyntheticDoc:
    """Build one deterministic document. ``lines_target`` (mega-doc mode)
    repeats paragraphs until at least that many lines are emitted."""
    rng = random.Random((seed << 20) ^ doc_idx)
    url = f"https://example.org/doc/{doc_idx:06d}"
    ts = datetime(2024, 1, 1) + timedelta(seconds=doc_idx)

    blocks: list[tuple[list[str], list[str]]] = []  # (lines, tags)
    igt_count = 0

    def add_paragraphs():
        nonlocal igt_count
        for _ in range(n_paragraphs):
            r = rng.random()
            if r < igt_prob:
                igt_count += 1
                lname, lcode = rng.choice(LANG_NAMES)
                header = [f"({igt_count})   {lname} example:"]
                il, it = _igt_instance(rng, igt_count)
                # header goes in the same block, tagged M or O
                blocks.append((header + il, ["M"] + it))
            elif r < igt_prob + 0.15:
                author = rng.choice(AUTHORS)
                year = rng.randint(1985, 2015)
                blocks.append(([f"({author}, {year})"], ["M"]))
            else:
                k = rng.randint(1, 3)
                blocks.append((
                    [rng.choice(PROSE) for _ in range(k)],
                    ["O"] * k,
                ))

    add_paragraphs()
    if lines_target:
        while sum(len(b[0]) for b in blocks) < lines_target:
            add_paragraphs()

    text_parts: list[str] = []
    gold_tags: list[str] = []
    for lines, tags in blocks:
        text_parts.append("\n".join(lines))
        gold_tags.extend(tags)
    text = "\n\n".join(text_parts)

    # ground-truth spans: contiguous non-O runs over the non-blank lines
    spans: list[GoldSpan] = []
    run_start = None
    for i, t in enumerate(gold_tags + ["O"]):
        if t != "O" and run_start is None:
            run_start = i
        elif t == "O" and run_start is not None:
            spans.append(GoldSpan(run_start + 1, i, gold_tags[run_start:i]))
            run_start = None

    html = None
    if as_html:
        paras = "".join(
            "<p>" + b.replace("\n", "<br>") + "</p>\n" for b in text_parts
        )
        html = (
            "<html><head><title>doc</title><script>var x=1;</script></head>"
            f"<body>\n{paras}</body></html>"
        ).encode("utf-8")

    return SyntheticDoc(
        url=url, warc_ts=ts, html=html, text=text, lang="en",
        gold_tags=gold_tags, gold_spans=spans,
    )


def make_corpus(n_docs: int, seed: int = 42, html_every: int = 5,
                mega_doc_every: int = 0, mega_doc_lines: int = 100_000):
    """Deterministic corpus; every ``html_every``-th doc is HTML-sourced,
    every ``mega_doc_every``-th (if >0) is a skew-testing mega-doc."""
    docs = []
    for i in range(n_docs):
        mega = mega_doc_every and i > 0 and i % mega_doc_every == 0
        docs.append(
            make_doc(
                i,
                seed=seed,
                as_html=bool(html_every and i % html_every == 1) and not mega,
                lines_target=mega_doc_lines if mega else None,
            )
        )
    return docs


def doc_from_text(url: str, text: str, tags: list[str] | None = None):
    """Build a FrekiDoc from plain text via the shared segmentation rules —
    the oracle-side mirror of the Spark ``segment_pages`` operator. Gold
    ``tags`` (one per non-blank line) get span_ids over contiguous non-O
    runs (s1, s2, …) so the BI rewrite sees training spans."""
    from ..segmentation import DEFAULT_FONT, segment_text
    from .freki import FrekiBlock, FrekiDoc, FrekiLine

    doc = FrekiDoc(url)
    blocks: dict[str, FrekiBlock] = {}
    segs = segment_text(text)
    for i, s in enumerate(segs):
        b = blocks.get(s.block_id)
        if b is None:
            b = FrekiBlock(
                doc_id=url, page=s.page, block_id=s.block_id,
                bbox=(s.block_llx, 0.0, 0.0, 0.0),
                start_line=s.line_no, stop_line=s.line_no,
            )
            blocks[s.block_id] = b
            doc.add_block(b)
        ln = FrekiLine(
            lineno=s.line_no, text=s.text, fonts=[DEFAULT_FONT],
            tag=(tags[i] if tags else "O"),
        )
        ln.block = b
        b.lines.append(ln)
        b.stop_line = s.line_no
        doc._by_lineno[s.line_no] = ln
    if tags:
        run, prev = 0, "O"
        for ln, t in zip(doc.lines(), tags):
            if t != "O":
                if prev == "O":
                    run += 1
                ln.span_id = f"s{run}"
            prev = t
    return doc


def corpus_rows(docs) -> list[dict]:
    """Rows in the driver input_hint shape (url, warc_ts, html, text, lang)."""
    return [
        {
            "url": d.url,
            "warc_ts": d.warc_ts,
            "html": d.html,
            "text": None if d.html is not None else d.text,
            "lang": d.lang,
        }
        for d in docs
    ]
