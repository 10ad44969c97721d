"""Text normalization, HTML→text extraction, and link extraction.

Every function here exists in TWO forms that must agree byte-for-byte:

* a pure-Python scalar (``preprocess_text``, ``extract_text``,
  ``extract_links``, ``rt_handle``) — used by the corpus generator and the
  reference simulator (the parity oracle), and

* a vectorized pandas form (``pd_*``) — used inside Arrow-batched pandas UDFs
  on executors (never row-at-a-time Python UDFs).

Parity contracts (reference semantics, cited into /root/reference):

``preprocess_text``
    The reference normalizes tweet text with a SINGLE-PASS chain of
    ``str.replace`` calls followed by ``strip()``
    (pages/Preprocess_scripts/PreprocessDump.py:84-86; UI twin
    pages/Preprocess.py:124-126). Crucially the double-space replace runs
    once left-to-right, NOT to a fixpoint: ``"a   b"`` → ``"a  b"``. A
    ``regexp_replace`` loop would differ, so both twins use literal
    (non-regex) replaces.

``rt_handle``
    The reference extracts the retweeted handle as the substring between the
    first ``@`` and the following ``:``
    (pages/Postprocess_scripts/Stance_Detection.py:72;
    pages/Postprocess_scripts/Functions.py:186-188). Rows without the
    pattern yield None (the reference raises and skips).

``extract_text`` / ``extract_links``
    The crawl-graft analogs of the reference's per-row text normalization
    and RT-handle (link) extraction: strip <script>/<style> blocks, replace
    tags with a space, unescape the five common entities (documented fixed
    order: &lt; &gt; &quot; &#39; then &amp; LAST), then apply the
    ``preprocess_text`` whitespace chain. Byte-identical extracted text per
    URL is the engine↔reference contract (BASELINE.json input_hint).
"""

from __future__ import annotations

import re

import pandas as pd

# --- whitespace normalization (single-pass, NOT fixpoint) -------------------

def preprocess_text(t: str) -> str:
    """Reference whitespace chain (PreprocessDump.py:84-86), single pass."""
    return (
        t.replace("\n", " ")
        .replace("\r", " ")
        .replace("\t", " ")
        .replace("  ", " ")
        .strip()
    )


def pd_preprocess_text(s: pd.Series) -> pd.Series:
    """Vectorized twin of :func:`preprocess_text` (literal replaces)."""
    return (
        s.str.replace("\n", " ", regex=False)
        .str.replace("\r", " ", regex=False)
        .str.replace("\t", " ", regex=False)
        .str.replace("  ", " ", regex=False)
        .str.strip()
    )


def remove_new_lines(x) -> str:
    """Reference ``remove_new_lines`` (PreprocessDump.py:88-89): stringify
    then replace newlines — missing values become the string ``"None"``."""
    return str(x).replace("\n", " ")


# --- HTML → text -------------------------------------------------------------

_SCRIPT_RE = re.compile(r"(?is)<script\b.*?</script>")
_STYLE_RE = re.compile(r"(?is)<style\b.*?</style>")
_TAG_RE = re.compile(r"(?s)<[^>]*>")
# Fixed entity table, fixed order; &amp; is decoded LAST so that double-escaped
# sequences like "&amp;lt;" decode to "&lt;" (one level), matching the twin.
_ENTITIES = [("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'), ("&#39;", "'"), ("&amp;", "&")]


def extract_text(html: bytes | str) -> str:
    """HTML→text with the reference whitespace contract. Pure-Python twin."""
    if isinstance(html, (bytes, bytearray)):
        html = html.decode("utf-8", errors="replace")
    t = _SCRIPT_RE.sub(" ", html)
    t = _STYLE_RE.sub(" ", t)
    t = _TAG_RE.sub(" ", t)
    for ent, ch in _ENTITIES:
        t = t.replace(ent, ch)
    # collapse runs of 2+ spaces created by tag removal (fixpoint here, by
    # design — this happens BEFORE the single-pass reference chain so the
    # contract on the reference chain itself is preserved)
    t = re.sub(r" {2,}", " ", t)
    return preprocess_text(t)


def pd_extract_text(html: pd.Series) -> pd.Series:
    """Vectorized twin of :func:`extract_text` for binary/string Series."""
    s = html.map(lambda b: b.decode("utf-8", errors="replace") if isinstance(b, (bytes, bytearray)) else b)
    s = s.str.replace(_SCRIPT_RE, " ", regex=True)
    s = s.str.replace(_STYLE_RE, " ", regex=True)
    s = s.str.replace(_TAG_RE, " ", regex=True)
    for ent, ch in _ENTITIES:
        s = s.str.replace(ent, ch, regex=False)
    s = s.str.replace(r" {2,}", " ", regex=True)
    return pd_preprocess_text(s)


# --- link extraction ---------------------------------------------------------

_HREF_RE = re.compile(r"""(?is)<a\s[^>]*?href\s*=\s*["']([^"'<>\s]+)["']""")


def extract_links(html: bytes | str) -> list[str]:
    """All href targets in document order (crawl analog of the reference's
    RT-handle extraction, Stance_Detection.py:72)."""
    if isinstance(html, (bytes, bytearray)):
        html = html.decode("utf-8", errors="replace")
    return _HREF_RE.findall(html)


def pd_extract_links(html: pd.Series) -> pd.Series:
    """Vectorized twin: Series of lists of href strings."""
    s = html.map(lambda b: b.decode("utf-8", errors="replace") if isinstance(b, (bytes, bytearray)) else b)
    return s.str.findall(_HREF_RE)


# --- reference RT-handle (kept for operator parity tests) --------------------

def rt_handle(text: str) -> str | None:
    """Substring between first '@' and next ':' (Stance_Detection.py:72)."""
    try:
        return text.split("@")[1].split(":")[0]
    except IndexError:
        return None
