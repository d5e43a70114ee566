"""D1 — html -> text extraction (SURVEY.md §2.10 D1; BASELINE.json:L15).

The binding per-row invariant is that ``extract_text(html)`` equals the
``text`` column byte-identically per url. The reference repo was empty at
survey time (SURVEY.md §0), so the authoritative definition of "extracted
text" is this module + the corpus generator in sources/corpus.py, which are
designed as exact inverses: the generator entity-escapes ``text`` into the
page body; this extractor drops head/script/style/comments/tags, unescapes,
and collapses whitespace.

Pure core is ``extract_text_py`` (used by the golden oracle in tests); the
Spark wrapper is an Arrow-vectorized scalar pandas UDF over pandas ``.str``
regex ops — no per-row Python in the Spark path.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType

# Order matters: comments and container blocks go before generic tags.
_RE_COMMENT = re.compile(r"<!--.*?-->", re.DOTALL)
_RE_HEAD = re.compile(r"<head\b.*?</head\s*>", re.DOTALL | re.IGNORECASE)
_RE_SCRIPT = re.compile(r"<script\b.*?</script\s*>", re.DOTALL | re.IGNORECASE)
_RE_STYLE = re.compile(r"<style\b.*?</style\s*>", re.DOTALL | re.IGNORECASE)
_RE_TAG = re.compile(r"<[^>]+>")
_RE_WS = re.compile(r"\s+")
_RE_NUMERIC_ENT = re.compile(r"&#(\d+);")

_NAMED_ENTITIES = [
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&apos;", "'"),
    ("&nbsp;", " "),
    ("&amp;", "&"),  # must be last: escapes of escapes
]


def extract_text_py(html: str) -> str:
    """Deterministic single-string extraction (golden-oracle core)."""
    if html is None:
        return ""
    s = _RE_COMMENT.sub(" ", html)
    s = _RE_HEAD.sub(" ", s)
    s = _RE_SCRIPT.sub(" ", s)
    s = _RE_STYLE.sub(" ", s)
    s = _RE_TAG.sub(" ", s)
    s = _RE_NUMERIC_ENT.sub(lambda m: chr(int(m.group(1))), s)
    for ent, ch in _NAMED_ENTITIES:
        s = s.replace(ent, ch)
    return _RE_WS.sub(" ", s).strip()


def _extract_series(html: pd.Series) -> pd.Series:
    """Vectorized extraction over a pandas Series (one Arrow batch)."""
    s = html.fillna("")
    # binary column arrives as bytes — decode once, vectorized
    if len(s) and isinstance(s.iloc[0], (bytes, bytearray)):
        s = s.map(lambda b: b.decode("utf-8", "replace"))
    s = s.astype("string")
    s = s.str.replace(_RE_COMMENT, " ", regex=True)
    s = s.str.replace(_RE_HEAD, " ", regex=True)
    s = s.str.replace(_RE_SCRIPT, " ", regex=True)
    s = s.str.replace(_RE_STYLE, " ", regex=True)
    s = s.str.replace(_RE_TAG, " ", regex=True)
    s = s.str.replace(_RE_NUMERIC_ENT, lambda m: chr(int(m.group(1))), regex=True)
    for ent, ch in _NAMED_ENTITIES:
        s = s.str.replace(ent, ch, regex=False)
    s = s.str.replace(_RE_WS, " ", regex=True).str.strip()
    return s.astype(object)


@pandas_udf(StringType())
def extract_text(html: pd.Series) -> pd.Series:
    return _extract_series(html)
