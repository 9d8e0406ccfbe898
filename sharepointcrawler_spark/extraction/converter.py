"""The byte-identity text-extraction engine (SURVEY.md §2.8-2.9, §3.3).

A from-scratch Python implementation of the reference's layout-analysis
converter semantics (/root/reference/PdfToMarkdownConverter.cs, 777 LoC).
The reference reads PDF word boxes via PdfPig; our input is a word-box
document model parsed from the synthetic html pages (extraction/
htmlwords.py) — the geometry semantics are identical:

* word -> line grouping by rounded y-band, top-down, left-to-right
  (BuildLines, PdfToMarkdownConverter.cs:283-304)
* repeated header/footer detection over first/last 4 lines per page with
  a >=ceil(pages*0.6) threshold (DetectRepeatingLines, :309-323)
* noise filtering: prefix list + 11 regexes + page-string regex
  (IsNoise, :326-341; lists at :16-48)
* first-page SOP banner-grid parse: keys, combo values, title block,
  org/approver split (ParseHeaderAndTitle, :406-633)
* numbered-heading emission with level = min(6, 2 + dots) (:186-198)
* sticky section-6 flag gating process-table extraction (:196,202)
* column-anchor inference, tabularity peek, row slicing by nearest
  anchor, wrapped-row merge, markdown table render (:637-776)
* paragraph merge with lowercase-continuation lookahead (:150-165)
* markdown escaping of | * _ then trim (:344-345)
* final Trim() + single trailing newline (:258)

Newlines are "\n" (the reference on Windows emits "\r\n"; the contract
here is normalized to "\n" — the only deliberate divergence).

Everything here is plain python over one document at a time: it runs
inside Arrow-batched pandas UDFs (extraction/udfs.py), never as
per-word DataFrame rows.
"""

from __future__ import annotations

import math
import re
from dataclasses import dataclass, field

# --------------------------------------------------------------- options


@dataclass
class ConvertOptions:
    """Mirrors PdfToMarkdownOptions (PdfToMarkdownConverter.cs:10-73)."""

    line_y_tolerance: float = 2.0
    repeat_line_removal_threshold: float = 0.6
    table_lookahead_lines: int = 8
    large_gap_threshold: float = 22.0
    column_anchor_merge_tolerance: float = 16.0
    banner_top: str = "Management System"
    banner_mid: str = "Standard Operating Procedure"
    process_table_header_tokens: tuple[str, ...] = ("Step", "Responsibility", "Action")

    noise_starts_with: tuple[str, ...] = (
        "This document contains proprietary information",
        "Unauthorized use",
        "Uncontrolled if printed",
        "Before using this document, the reader is responsible",
        "Copyright",
        "All rights reserved",
        "use, reproduction, or distribution",
        "CUI",
        "Controlled Unclassified",
        "Privacy Act",
        "Sensitive but unclassified",
    )

    @property
    def noise_prefixes_lower(self) -> tuple[str, ...]:
        npl = getattr(self, "_npl", None)
        if npl is None:
            npl = tuple(p.lower() for p in self.noise_starts_with)
            self._npl = npl
        return npl


_NOISE_PATTERNS = [
    re.compile(r"(?i)^\s*Page\s*:\s*\d+\s*of\s*\d+\s*$"),
    re.compile(r"(?i)^CLG\-[A-Z\-]+\d+(\s*Page\s*\d+)?$"),
    re.compile(r"(?i)^\s*Revision\s*:\s*[A-Za-z0-9]+\s*$"),
    re.compile(r"(?i)\b(CUI|Controlled\s+Unclassified|Privacy\s+Act|Sensitive\s+but\s+unclassified)\b"),
    re.compile(r"(?i)\bproprietary information\b"),
    re.compile(r"(?i)\bUnauthorized\s+use\b"),
    re.compile(r"(?i)\buse\s*,\s*reproduction\s*,\s*or\s*distribution\b"),
    re.compile(r"(?i)\breproduction\s*,\s*or\s*distribution\b"),
    re.compile(r"(?i)\buncontrolled if printed\b"),
    re.compile(r"(?i)\bAll rights reserved\b"),
    re.compile(r"(?i)^\s*use\s*,?\s*or\s*$"),
]

_NUMBERED_HEADING = re.compile(r"^(?P<num>\d+(?:\.\d+)*)(?:\s+|\s*-\s*)(?P<title>.+)$")
_PAGE_STRING = re.compile(r"(?i)\bPage\s*:\s*\d+\s*of\s*\d+\b")
_MERGE_BREAK_NEXT = re.compile(r"^(\d+(?:\.\d+)*\b|[A-Za-z]\.|[A-Za-z]\)|[-•])")
_MERGE_BREAK_CURR = re.compile(r"[\.!\?:;]$")

# header-grid regexes (ParseHeaderAndTitle, :421-423,:447-448,:465)
_PURE_WORDS = re.compile(r"^[A-Za-z0-9][A-Za-z0-9 \-,()/:]{0,120}$")
_IS_KEY_LINE = re.compile(
    r"(?i)^(Document\s*No\.?|Effective\s*Date|Revision|Accountable\s*Organization|Management\s*Approval|Source|Page)\s*:"
)
_KEY_ONLY = re.compile(
    r"(?i)^(Document\s*No\.?|Effective\s*Date|Revision|Accountable\s*Organization|Management\s*Approval|Source|Page)\s*:\s*$"
)
_KEY_VAL = re.compile(
    r"(?i)^(?P<k>Document\s*No\.?|Effective\s*Date|Revision|Accountable\s*Organization|Management\s*Approval|Source|Page)\s*:\s*(?P<v>.+)$"
)
_VALUE_LOOKS_LIKE_KEY = re.compile(
    r"(?i)^(Document|Effective|Revision|Accountable|Management|Source|Page)\s*:\s*$"
)
_SOP_BANNER = re.compile(r"(?i)\bstandard\s+operating\s+procedure\b")

_DOC_VALUE = re.compile(r"^[A-Z0-9][A-Z0-9\-]{4,}$")
_EFF_VALUE = re.compile(r"^\d{2}/\d{2}/\d{4}$")
_REV_VALUE = re.compile(r"^[A-Za-z0-9]{1,3}$")
_NAME_VALUE = re.compile(r"^[A-Za-z]+(?:\s+[A-Za-z'.-]+)+$")
_TRAILING_NAME = re.compile(r"\s([A-Z][a-z]+(?:\s+[A-Z][a-z'.-]+)+)$")
_COMBO_DATE_REV = re.compile(r"^\d{2}/\d{2}/\d{4}\s+[A-Za-z0-9]+$")
_COMBO_DOC_PAGE = re.compile(r"(?i)^(?P<doc>[A-Z0-9\-]+)\s+(?P<page>\d+\s+of\s+\d+)$")


# ----------------------------------------------------------- layout model


@dataclass(slots=True)
class Word:
    text: str
    left: float
    right: float


@dataclass(slots=True)
class Line:
    y: float
    words: list[Word] = field(default_factory=list)
    text: str = ""


@dataclass(slots=True)
class PageLines:
    number: int
    height: float
    lines: list[Line] = field(default_factory=list)


@dataclass(slots=True)
class RawWord:
    """Input word box: what PdfPig's Word gives the reference."""

    text: str
    left: float
    right: float
    top: float
    bottom: float


def _round_to(value: float, tol: float) -> float:
    """Math.Round(v/tol)*tol — .NET banker's rounding == python round()
    (both round the double quotient half-to-even)."""
    return round(value / tol) * tol


def build_lines(words: list[RawWord], page_number: int, height: float, y_tol: float) -> PageLines:
    """Word -> line grouping (BuildLines, :283-304): group by rounded
    y-mid, bands top-down (descending y), words left-to-right."""
    # hot loop (once per word per page inside the extraction UDF):
    # _round_to is inlined with the identical arithmetic sequence
    # ((top+bottom)/2 -> /tol -> round -> *tol), grouping uses
    # setdefault, and the left-sort key is an attrgetter — all
    # byte-identical to the naive form (goldens pin it).
    from operator import attrgetter

    groups: dict[float, list[RawWord]] = {}
    setdefault = groups.setdefault
    for w in words:
        setdefault(round((w.top + w.bottom) / 2.0 / y_tol) * y_tol, []).append(w)
    pl = PageLines(page_number, height)
    by_left = attrgetter("left")
    for key in sorted(groups, reverse=True):
        ln = Line(y=key)
        ln_words = ln.words
        for w in sorted(groups[key], key=by_left):
            t = (w.text or "").strip()
            if t:
                ln_words.append(Word(t, w.left, w.right))
        ln.text = " ".join([x.text for x in ln_words])
        if ln.text.strip():
            pl.lines.append(ln)
    return pl


# ------------------------------------------------------- repeating banners


def detect_repeating_lines(pages: list[PageLines], threshold: float) -> set[str]:
    """First/last-4 line census, keep >= ceil(max(1, n*threshold)) hits
    (DetectRepeatingLines, :309-323). Case-insensitive: the set holds
    casefolded keys; membership tests must casefold too."""
    counts: dict[str, int] = {}
    for p in pages:
        window = [ln.text.strip() for ln in p.lines[:4]] + [
            ln.text.strip() for ln in p.lines[-4:]
        ]
        for t in window:
            if not t:
                continue
            k = t.lower()
            counts[k] = counts.get(k, 0) + 1
    min_hits = int(math.ceil(max(1.0, len(pages) * threshold)))
    return {k for k, c in counts.items() if c >= min_hits}


# ------------------------------------------------------------------ noise


# fused alternation of all noise patterns + the page-string regex: one
# search instead of 12 per line (detection-equivalent to any-of matching;
# the leading (?i) of each source pattern becomes a scoped (?i:...) group)
def _scoped(p: str) -> str:
    return f"(?i:{p[4:]})" if p.startswith("(?i)") else f"(?:{p})"


_NOISE_COMBINED = re.compile(
    "|".join(_scoped(rx.pattern) for rx in _NOISE_PATTERNS)
    + r"|" + _scoped(r"(?i)\bPage\s*:\s*\d+\s*of\s*\d+\b")
)


def is_noise(line: str, opt: ConvertOptions) -> bool:
    """IsNoise (:326-341)."""
    s = line.strip()
    if not s:
        return False
    low = s.lower()
    if low.startswith(opt.noise_prefixes_lower):
        return True
    return bool(_NOISE_COMBINED.search(s))


def escape_md(s: str) -> str:
    """EscapeMd (:344-345): escape | * _ then trim — order matters."""
    return s.replace("|", "\\|").replace("*", "\\*").replace("_", "\\_").strip()


# ------------------------------------------- dormant reference operators
# Defined-but-never-called in the reference (SURVEY §2.8 D5-D7);
# reproduced for API completeness so a reference user porting custom
# subclasses finds the full surface.

_ORPHAN_WORD = re.compile(r"^[A-Za-z]{1,12}$")


def is_orphan_word(body_texts: list[str], idx: int) -> bool:
    """IsOrphanWord (PdfToMarkdownConverter.cs:643-650, dormant): a short
    1-12-letter word whose previous or next body line is a numbered
    heading."""
    txt = body_texts[idx].strip()
    if not _ORPHAN_WORD.match(txt):
        return False
    prev_is = idx > 0 and bool(_NUMBERED_HEADING.match(body_texts[idx - 1]))
    next_is = idx + 1 < len(body_texts) and bool(
        _NUMBERED_HEADING.match(body_texts[idx + 1])
    )
    return prev_is or next_is


def write_meta_row(out: list[str], key: str, value: str | None) -> None:
    """WriteMetaRow (PdfToMarkdownConverter.cs:347-351, dormant): append a
    ``| key | value |`` markdown row when the value is non-blank."""
    if value is not None and value.strip():
        out.append(f"| {escape_md(key)} | {escape_md(value)} |")


# AssignHeader's validated key -> (field, value-pattern-or-None) mapping
# (PdfToMarkdownConverter.cs:371-399, dormant duplicate of the D2 sweep)
_ASSIGN_HEADER_RULES: dict[str, tuple[str, str | None]] = {
    "document no.": ("doc", r"^[A-Z0-9\-]+$"),
    "document no": ("doc", r"^[A-Z0-9\-]+$"),
    "effective date": ("eff", r"^\d{2}/\d{2}/\d{4}$"),
    "revision": ("rev", r"^[A-Za-z0-9]+$"),
    "accountable organization": ("org", None),
    "management approval": ("appr", None),
    "source": ("src", None),
}


def assign_header(header: dict[str, str], key_raw: str, val_raw: str) -> None:
    """AssignHeader (PdfToMarkdownConverter.cs:371-399, dormant): key is
    trimmed, colon-stripped and lower-cased; values are pattern-validated
    before assignment; 'page' is explicitly ignored."""
    key = key_raw.strip().rstrip(":").lower()
    val = val_raw.strip()
    if key == "page":
        return
    rule = _ASSIGN_HEADER_RULES.get(key)
    if rule is None:
        return
    field, pattern = rule
    if pattern is None or re.match(pattern, val):
        header[field] = val


# ------------------------------------------------------------ header parse


def _split_combo_value(raw: str) -> tuple[str, str]:
    """SplitComboValue (:513-530)."""
    big_gap = [s.strip() for s in re.split(r"\s{2,}", raw) if s.strip()]
    if len(big_gap) >= 2:
        return big_gap[0], big_gap[1]
    if _COMBO_DATE_REV.match(raw):
        sp = re.split(r"\s+", raw.strip())
        return sp[0], sp[1]
    m = _COMBO_DOC_PAGE.match(raw)
    if m:
        return m.group("doc"), m.group("page")
    mid = len(raw) // 2
    idx = raw.rfind(" ", 0, mid + 1)  # LastIndexOf(' ', mid): search <= mid
    if idx <= 0:
        idx = raw.find(" ", mid)
    if idx > 0:
        return raw[:idx].strip(), raw[idx + 1 :].strip()
    return raw.strip(), ""


def parse_header_and_title(
    first: PageLines | None, opt: ConvertOptions
) -> tuple[dict[str, str], set[str], str | None]:
    """ParseHeaderAndTitle (:406-633), including its quirks: the in-place
    Key:/Value folding, title = pure-word lines between the doc value row
    and the Effective Date key row, combined value rows, the trailing
    approver-name split, and the final Key:-value sweep. headerLines is
    returned casefolded (the C# set is OrdinalIgnoreCase)."""
    header: dict[str, str] = {}
    header_lines: set[str] = set()  # casefolded
    title: str | None = None
    if first is None:
        return header, header_lines, title

    def mark(s: str) -> None:
        if s and s.strip():
            header_lines.add(s.strip().lower())

    take = min(50, max(25, len(first.lines)))
    lines = [ln.text.strip() for ln in first.lines[:take]]

    def index_of_key(key: str) -> int:
        rx = re.compile(rf"(?i)^{re.escape(key)}\s*:")
        for i, s in enumerate(lines):
            if rx.match(s):
                return i
        return -1

    doc_key_idx = index_of_key("Document No.")
    eff_key_idx = index_of_key("Effective Date")
    rev_key_idx = index_of_key("Revision")
    org_key_idx = index_of_key("Accountable Organization")
    appr_key_idx = index_of_key("Management Approval")

    # SOP banner fragments -> headerLines (:436-444)
    for i in range(min(len(lines), 15)):
        win = " ".join(lines[i : i + 3])
        if _SOP_BANNER.search(win):
            for j in range(i, min(len(lines), i + 3)):
                mark(lines[j])
            break

    # fold "Key:" + next line -> "Key: Value" (:446-461) — mutates `lines`
    raw_values_to_drop: list[str] = []
    i = 0
    while i < len(lines) - 1:
        if _KEY_ONLY.match(lines[i]):
            label = re.sub(r"\s*:\s*$", "", lines[i])
            folded = f"{label}: {lines[i + 1]}"
            raw_values_to_drop.append(lines[i + 1])
            lines[i] = folded
            del lines[i + 1]
            # C# does i-- then i++ -> re-examines the same index
        else:
            i += 1
    # NOTE: the key indexes above were computed BEFORE folding and the
    # reference never recomputes them (:428-433 precede :451-461) — after
    # a fold they can go stale and point at shifted lines. Replicated
    # as-is: byte-identity includes the reference's index-staleness.

    # doc value row (:468-479)
    doc_value_idx = -1
    if doc_key_idx >= 0:
        for j in range(doc_key_idx + 1, min(len(lines), doc_key_idx + 8)):
            v = lines[j]
            if not v.strip():
                continue
            if _IS_KEY_LINE.match(v):
                break
            doc_value_idx = j
            break

    # title block (:482-496)
    if doc_value_idx >= 0 and eff_key_idx > doc_value_idx:
        parts: list[str] = []
        for j in range(doc_value_idx + 1, eff_key_idx):
            cand = lines[j]
            if not cand.strip():
                continue
            if _IS_KEY_LINE.match(cand):
                break
            if not _PURE_WORDS.match(cand):
                continue
            parts.append(cand)
            mark(cand)
        if parts:
            title = " ".join(parts)

    def find_value_row_after(key_index: int, max_lookahead: int = 10) -> str | None:
        for j in range(key_index + 1, min(len(lines), key_index + 1 + max_lookahead)):
            v = lines[j]
            if not v.strip():
                continue
            if _IS_KEY_LINE.match(v):
                break
            if v.strip().lower() in header_lines:
                continue
            return v
        return None

    # Document No. / Page (:535-544)
    if doc_key_idx >= 0:
        raw = find_value_row_after(doc_key_idx, 8)
        if raw is not None:
            dv, _pv = _split_combo_value(raw)
            if _DOC_VALUE.match(dv):
                header["doc"] = dv
            mark(lines[doc_key_idx])
            mark(raw)

    # Effective Date / Revision (:547-557)
    if eff_key_idx >= 0:
        raw = find_value_row_after(eff_key_idx, 8)
        if raw is not None:
            dv, rv = _split_combo_value(raw)
            if _EFF_VALUE.match(dv):
                header["eff"] = dv
            if _REV_VALUE.match(rv):
                header["rev"] = rv
            mark(lines[eff_key_idx])
            mark(raw)
    if "rev" not in header and rev_key_idx >= 0:
        raw = find_value_row_after(rev_key_idx, 8)
        if raw is not None and _REV_VALUE.match(raw.strip()):
            header["rev"] = raw.strip()
            mark(lines[rev_key_idx])
            mark(raw)

    # Accountable Organization / Management Approval (:569-597)
    if org_key_idx >= 0:
        raw = find_value_row_after(org_key_idx, 8)
        if raw is not None:
            org_val = raw.strip()
            nm = _TRAILING_NAME.search(org_val)
            if nm and "appr" not in header and appr_key_idx >= 0:
                name = nm.group(1).strip()
                header["appr"] = name
                org_val = org_val[: -len(name)].strip()
            header["org"] = org_val
            mark(lines[org_key_idx])
            mark(raw)
    if "appr" not in header and appr_key_idx >= 0:
        raw = find_value_row_after(appr_key_idx, 8)
        if raw is not None:
            if _NAME_VALUE.match(raw.strip()):
                header["appr"] = raw.strip()
            mark(lines[appr_key_idx])
            mark(raw)

    # final Key: value sweep (:600-625)
    for line in lines:
        m = _KEY_VAL.match(line)
        if not m:
            continue
        val = m.group("v").strip()
        if _VALUE_LOOKS_LIKE_KEY.match(val):
            continue
        k = m.group("k").strip().lower()  # no whitespace normalization (:606)
        if k in ("document no.", "document no"):
            if "doc" not in header and _DOC_VALUE.match(val):
                header["doc"] = val
        elif k == "effective date":
            if "eff" not in header and _EFF_VALUE.match(val):
                header["eff"] = val
        elif k == "revision":
            if "rev" not in header and _REV_VALUE.match(val):
                header["rev"] = val
        elif k == "accountable organization":
            if "org" not in header:
                header["org"] = val
        elif k == "management approval":
            if "appr" not in header and _NAME_VALUE.match(val):
                header["appr"] = val
        elif k == "source":
            if "src" not in header:
                header["src"] = val
        mark(line)

    mark("Management System")
    mark("Standard Operating Procedure")
    for v in raw_values_to_drop:
        mark(v)
    return header, header_lines, title


# ------------------------------------------------------------ table logic


def _looks_like_process_table_header(line: Line, opt: ConvertOptions) -> bool:
    """(:637-642) — all tokens present as substrings, case-insensitive."""
    t = line.text.lower()
    return all(tok.lower() in t for tok in opt.process_table_header_tokens)


def compute_column_anchors(lines: list[Line], start: int, lookahead: int, opt: ConvertOptions) -> list[float]:
    """(:654-696): header-token lefts preferred; else gap-based points
    merged within tolerance (consecutive averaging), max 3."""
    header = lines[start]
    anchors: list[float] = []
    toks = {t.lower() for t in opt.process_table_header_tokens}
    for w in header.words:
        if w.text.lower() in toks:
            anchors.append(w.left)
    anchors = sorted(set(anchors))
    if len(anchors) == 3:
        return anchors

    pts: list[float] = []
    end = min(len(lines), start + lookahead)
    for i in range(start, end):
        ws = lines[i].words
        if len(ws) < 2:
            continue
        pts.append(ws[0].left)
        for j in range(len(ws) - 1):
            gap = ws[j + 1].left - ws[j].right
            if gap >= opt.large_gap_threshold:
                pts.append(ws[j + 1].left)
    if not pts:
        return anchors
    pts.sort()
    merged = [pts[0]]
    for x in pts[1:]:
        if abs(x - merged[-1]) <= opt.column_anchor_merge_tolerance:
            merged[-1] = (merged[-1] + x) / 2.0
        else:
            merged.append(x)
    return merged[:3]


def _slice_into_columns(line: Line, anchors: list[float]) -> list[str]:
    """(:746-761): each word to nearest anchor by left-x (argmin, ties to
    the first/lowest index as in the C# strict '<' comparison)."""
    buckets: list[list[str]] = [[] for _ in anchors]
    for w in line.words:
        best = 0
        best_dist = abs(w.left - anchors[0])
        for k in range(1, len(anchors)):
            d = abs(w.left - anchors[k])
            if d < best_dist:
                best = k
                best_dist = d
        buckets[best].append(w.text)
    return [" ".join(b) for b in buckets]


def _count_filled_columns(line: Line, anchors: list[float]) -> int:
    return sum(1 for c in _slice_into_columns(line, anchors) if c.strip())


def extract_table_with_anchors(
    lines: list[Line], start: int, anchors: list[float]
) -> tuple[list[list[str]], int]:
    """(:700-737): consume until next numbered heading or 0 filled
    columns; wrapped rows (empty first cell) merge into the previous
    row's Action (col 2) else Responsibility (col 1)."""
    block = [lines[start]]
    i = start + 1
    while i < len(lines):
        if _NUMBERED_HEADING.match(lines[i].text):
            break
        if _count_filled_columns(lines[i], anchors) >= 1:
            block.append(lines[i])
            i += 1
        else:
            break

    rows: list[list[str]] = []
    for ln in block:
        cols = [c.strip() for c in _slice_into_columns(ln, anchors)]
        if rows:
            is_header = len(rows) == 1 and any("step" in c.lower() for c in rows[0])
            if not is_header and not cols[0].strip():
                last = rows[-1]
                target = 2
                if not last[target].strip():
                    target = 1
                last[target] = (last[target] + " " + " ".join(cols[1:])).strip()
                continue
        rows.append(cols)

    if len(rows) < 2:
        return [], len(block)
    return rows, len(block)


def render_table(rows: list[list[str]]) -> str:
    """(:763-776): pad to max width; header, --- separator, escaped
    cells. Returns a string ending with a newline (AppendLine per row)."""
    if not rows:
        return ""
    cols = max(len(r) for r in rows)
    norm = [r if len(r) == cols else r + [""] * (cols - len(r)) for r in rows]
    out = []
    out.append("| " + " | ".join(escape_md(c) for c in norm[0]) + " |")
    out.append("| " + " | ".join(["---"] * cols) + " |")
    for r in norm[1:]:
        out.append("| " + " | ".join(escape_md(c) for c in r) + " |")
    return "\n".join(out) + "\n"


# ----------------------------------------------------------- main convert


def _should_merge(curr: str, nxt: str | None) -> bool:
    """ShouldMerge (:150-165)."""
    if not curr or not curr.strip() or not nxt or not nxt.strip():
        return False
    c = curr.rstrip()
    n = nxt.lstrip()
    if _MERGE_BREAK_NEXT.match(n):
        return False
    if _MERGE_BREAK_CURR.search(c):
        return False
    return n[0].islower()


def convert_pages_to_markdown(
    pages: list[PageLines], logical_name: str, opt: ConvertOptions | None = None
) -> str:
    """ConvertToMarkdownCore (:116-259) over pre-built PageLines."""
    opt = opt or ConvertOptions()
    repeat_set = detect_repeating_lines(pages, opt.repeat_line_removal_threshold)
    header, header_lines, title = parse_header_and_title(
        pages[0] if pages else None, opt
    )

    md: list[str] = []  # list of already-newline-terminated chunks

    h1 = title if title is not None else header.get("doc", None)
    if h1 is None:
        h1 = logical_name
    md.append("# " + escape_md(h1) + "\n")
    md.append("\n")

    in_process_section = False
    para_buf: list[str] = []

    def flush_paragraph() -> None:
        if para_buf:
            md.append("".join(para_buf) + "\n")
            md.append("\n")
            para_buf.clear()

    for pi, page in enumerate(pages):
        body = [
            ln
            for ln in page.lines
            if ln.text.strip().lower() not in repeat_set
            and not is_noise(ln.text, opt)
            and not (pi == 0 and ln.text.strip().lower() in header_lines)
        ]
        if pi == 0 and title is not None:
            body = [ln for ln in body if ln.text.strip().lower() != title.lower()]

        i = 0
        while i < len(body):
            raw = body[i]
            text = raw.text.strip()

            mh = _NUMBERED_HEADING.match(text)
            if mh:
                flush_paragraph()
                num = mh.group("num")
                ttl = mh.group("title").strip()
                level = min(6, 2 + num.count("."))
                md.append("#" * level + " " + escape_md(f"{num} {ttl}") + "\n")
                md.append("\n")
                in_process_section = num.startswith("6")
                i += 1
                continue

            if in_process_section and _looks_like_process_table_header(raw, opt):
                anchors = compute_column_anchors(body, i, opt.table_lookahead_lines, opt)
                looks_tabular = False
                if len(anchors) >= 3:
                    ok = 0
                    for peek in range(i + 1, min(len(body), i + 3)):
                        if _count_filled_columns(body[peek], anchors) >= 2:
                            ok += 1
                    looks_tabular = ok >= 2
                if looks_tabular:
                    flush_paragraph()
                    rows, consumed = extract_table_with_anchors(body, i, anchors)
                    if len(rows) >= 2:
                        md.append(render_table(rows) + "\n")
                        md.append("\n")
                        i += consumed
                        continue
                # else fall through to plain text

            escaped = escape_md(text)
            if not para_buf:
                para_buf.append(escaped)
            else:
                para_buf.append(" " + escaped)
            next_text = body[i + 1].text if i + 1 < len(body) else None
            if not _should_merge(text, next_text):
                flush_paragraph()
            i += 1
        # no flush at page boundary: paragraphs span pages (:252)

    flush_paragraph()
    return "".join(md).strip() + "\n"


def convert_words_to_markdown(
    page_words: list[list[RawWord]],
    logical_name: str,
    page_heights: list[float] | None = None,
    opt: ConvertOptions | None = None,
) -> str:
    """Full pipeline from raw word boxes (the ConvertToMarkdown surface,
    :81-113)."""
    opt = opt or ConvertOptions()
    heights = page_heights or [792.0] * len(page_words)
    pages = [
        build_lines(ws, n + 1, heights[n], opt.line_y_tolerance)
        for n, ws in enumerate(page_words)
    ]
    return convert_pages_to_markdown(pages, logical_name, opt)
