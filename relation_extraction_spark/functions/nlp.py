"""D3–D6 — tokenizer, POS tagger, shallow parse, OpenIE-style extraction.

This is the distributed re-expression of the reference's per-sentence
"compiler" (BASELINE.json:L6: "POS/dependency parsing, and OpenIE-style
pattern-driven (subj, pred, obj) triple extraction"; the reference tree is
empty — SURVEY.md §0 — so pattern semantics follow the ReVerb/OpenIE
literature, PAPERS.md). No external NLP models are installed, so tagging is
lexicon + suffix/shape rules, fully deterministic.

Execution model: everything here is pure Python over *compact tag strings*
(one char per token) with precompiled regexes — the classic fast-chunking
trick — and is invoked from Spark ONLY through Arrow-batched
``mapInPandas``/``pandas_udf`` wrappers in operators/extract.py. The
tokenize→tag→chunk→match passes for a sentence are fused into one Python
call so token arrays and arcs never cross the JVM/Python wire
(SURVEY.md §4 "pipelining").

Tag alphabet:
  D det  J adj  N noun  V verb  B be  M modal  P prep  T to  R adv
  C conj  W wh  O other/punct
"""

from __future__ import annotations

import re
from functools import lru_cache

TOKEN_RE = re.compile(r"[A-Za-z][A-Za-z'\-]*|\d+(?:\.\d+)?|[^\sA-Za-z\d]")

_DETS = {
    "the", "a", "an", "this", "that", "these", "those", "its", "his",
    "her", "their", "our", "your", "my", "each", "every", "some", "any",
    "no", "all", "both", "another", "such",
}
_BE = {"is", "are", "was", "were", "be", "been", "being", "am"}
_MODALS = {
    "can", "could", "will", "would", "shall", "should", "may", "might",
    "must", "do", "does", "did",
}
_PREPS = {
    "of", "in", "on", "at", "by", "with", "from", "for", "over", "under",
    "into", "about", "across", "after", "before", "between", "through",
    "during", "against", "among", "via", "per", "within", "without",
    "toward", "towards", "upon", "onto", "near",
}
_TO = {"to"}
_CONJ = {"and", "or", "but", "nor", "so", "yet"}
_WH = {"who", "whom", "whose", "which", "when", "where", "while"}
_ADVS = {
    "quickly", "slowly", "very", "really", "never", "always", "often",
    "now", "then", "here", "there", "not", "also", "only", "just",
    "still", "already", "usually", "rarely",
}
# Verb-preferred lexicon: common English verbs incl. data-ish words that
# read as verbs in the driver's word-soup fixture ("scan", "join", ...).
_VERBS = {
    "run", "runs", "ran", "running", "scan", "scans", "scanned", "join",
    "joins", "joined", "filter", "filters", "filtered", "order", "orders",
    "ordered", "hash", "hashes", "hashed", "group", "groups", "grouped",
    "sort", "sorts", "sorted", "select", "selects", "selected", "load",
    "loads", "loaded", "store", "stores", "stored", "read", "reads",
    "write", "writes", "wrote", "written", "build", "builds", "built",
    "make", "makes", "made", "take", "takes", "took", "use", "uses",
    "used", "have", "has", "had", "provide", "provides", "provided",
    "contain", "contains", "contained", "include", "includes", "included",
    "create", "creates", "created", "process", "processes", "processed",
    "compute", "computes", "computed", "emit", "emits", "emitted",
    "extract", "extracts", "extracted", "link", "links", "linked",
    "merge", "merges", "merged", "partition", "partitions", "partitioned",
    "produce", "produces", "produced", "require", "requires", "required",
    "support", "supports", "supported", "return", "returns", "returned",
    "send", "sends", "sent", "receive", "receives", "received", "hold",
    "holds", "held", "keep", "keeps", "kept", "find", "finds", "found",
    "give", "gives", "gave", "given", "show", "shows", "showed", "shown",
    "know", "knows", "knew", "known", "see", "sees", "saw", "seen",
    "say", "says", "said", "call", "calls", "called", "need", "needs",
    "needed", "want", "wants", "wanted", "work", "works", "worked",
    "become", "becomes", "became", "remain", "remains", "remained",
    "describe", "describes", "described", "connect", "connects",
    "connected", "map", "maps", "mapped", "reduce", "reduces", "reduced",
    "shuffle", "shuffles", "shuffled", "broadcast", "broadcasts",
    "query", "queries", "queried", "count", "counts", "counted",
    "aggregate", "aggregates", "aggregated", "batch", "batches",
    "batched", "stream", "streams", "streamed", "cache", "caches",
    "cached", "spill", "spills", "spilled", "skew", "skews", "skewed",
    "choose", "chooses", "chose", "chosen", "pick", "picks", "picked",
    "apply", "applies", "applied", "execute", "executes", "executed",
    "plan", "plans", "planned", "optimize", "optimizes", "optimized",
    "prune", "prunes", "pruned", "push", "pushes", "pushed", "pull",
    "pulls", "pulled", "split", "splits", "combine", "combines",
    "combined", "collect", "collects", "collected", "transform",
    "transforms", "transformed", "convert", "converts", "converted",
    "parse", "parses", "parsed", "score", "scores", "scored", "rank",
    "ranks", "ranked", "index", "indexes", "indexed", "search",
    "searches", "searched", "match", "matches", "matched", "replace",
    "replaces", "replaced", "insert", "inserts", "inserted", "update",
    "updates", "updated", "delete", "deletes", "deleted", "remove",
    "removes", "removed", "add", "adds", "added", "improve", "improves",
    "improved", "increase", "increases", "increased", "decrease",
    "decreases", "decreased", "describe", "analyze", "analyzes",
    "analyzed", "measure", "measures", "measured",
}
_ADJS = {
    "big", "small", "large", "slow", "new", "old", "good", "bad",
    "high", "low", "long", "short", "great", "little", "own", "same",
    "other", "many", "few", "major", "minor", "public", "private",
    "distributed", "parallel", "columnar", "vectorized", "fast",
}

_SUFFIX_RULES = (
    ("ly", "R"),
    ("ing", "V"),
    ("ed", "V"),
    ("tion", "N"),
    ("sion", "N"),
    ("ment", "N"),
    ("ness", "N"),
    ("ity", "N"),
    ("ous", "J"),
    ("ive", "J"),
    ("able", "J"),
    ("ful", "J"),
    ("al", "J"),
)


@lru_cache(maxsize=200_000)
def tag_word(w: str) -> str:
    """One deterministic tag char per token (cached across batches)."""
    lw = w.lower()
    if lw in _BE:
        return "B"
    if lw in _MODALS:
        return "M"
    if lw in _DETS:
        return "D"
    if lw in _PREPS:
        return "P"
    if lw in _TO:
        return "T"
    if lw in _CONJ:
        return "C"
    if lw in _WH:
        return "W"
    if lw in _ADVS:
        return "R"
    if lw in _VERBS:
        return "V"
    if lw in _ADJS:
        return "J"
    if not w[0].isalpha():
        return "O"
    # 3sg-inflection stem check: "compiles" -> "compile" in verb lexicon
    if lw.endswith("s"):
        for stem in (lw[:-1], lw[:-2] if lw.endswith("es") else ""):
            if stem and stem in _VERBS:
                return "V"
    for suf, t in _SUFFIX_RULES:
        if len(lw) > len(suf) + 2 and lw.endswith(suf):
            return t
    return "N"


def tokenize(sentence: str) -> list[str]:
    return TOKEN_RE.findall(sentence)


def tag_tokens(tokens: list[str]) -> str:
    """Lexical tags + one contextual repair pass.

    A verb-preferred word right after a determiner/adjective/preposition
    is really a noun ("a hash join", "with a scan"); the repair is
    contagious across consecutive retagged verbs so compound nominals
    stay one NP, but a genuine noun breaks the chain ("the engine scans"
    keeps "scans" verbal).
    """
    tags = [tag_word(t) for t in tokens]
    retagged_prev = False
    for i, t in enumerate(tags):
        if t == "V" and i > 0 and (tags[i - 1] in "DJP" or retagged_prev):
            tags[i] = "N"
            retagged_prev = True
        else:
            retagged_prev = False
    return "".join(tags)


# NP chunk: optional det, adjectives, 1+ nouns (kept flat; compound nouns
# like "hash join strategy" form one topic, mirroring the reference's
# noun-phrase Topic terms — SURVEY.md §1.1).
NP_RE = re.compile(r"D?J*N+")

# Predicate span between two NP chunks, over the *reduced* string where
# each NP is the single char 'E' (built in _reduce):
#   copula:      E B (as|like)? E          -> (x, "be", y)
#   svo:         E R? M? V+ T? P? E        -> verb group (+ trailing prep)
#   verb+to+V:   handled by V+T?V? closure inside the V-group
PATTERNS = (
    (re.compile(r"E(B)(?:[DJ]*)E"), 0.90, "cop"),
    (re.compile(r"E(R?[MB]?V+TV?|R?[MB]?V+P?)E"), 0.80, "svo"),
)


def _reduce(tags: str):
    """Collapse NP spans to 'E'; return (reduced string, span list).

    ``spans[i]`` gives the (tok_start, tok_end) token range of reduced
    position i (non-NP positions map to single tokens).
    """
    out = []
    spans = []
    i = 0
    n = len(tags)
    while i < n:
        m = NP_RE.match(tags, i)
        if m and m.end() > i:
            out.append("E")
            spans.append((i, m.end()))
            i = m.end()
        else:
            out.append(tags[i])
            spans.append((i, i + 1))
            i += 1
    return "".join(out), spans


def _np_text(tokens: list[str], start: int, end: int) -> str:
    """Noun-phrase surface form, leading determiner dropped."""
    toks = tokens[start:end]
    if toks and tag_word(toks[0]) == "D":
        toks = toks[1:]
    return " ".join(toks)


def extract_from_sentence(sentence: str):
    """All (subj, pred, obj, conf) pattern matches in one sentence.

    Returns list of dicts; also used verbatim by the single-node golden
    oracle (tests/oracle.py) so pipeline-vs-golden P/R is exact by
    construction (SURVEY.md §7.4 risk 1).
    """
    tokens = tokenize(sentence)
    if len(tokens) < 3:
        return []
    tags = tag_tokens(tokens)
    reduced, spans = _reduce(tags)
    out = []
    for pat, conf, kind in PATTERNS:
        pos = 0
        while True:
            m = pat.search(reduced, pos)
            if not m:
                break
            subj_i = m.start()
            obj_i = m.end() - 1
            ps, pe = m.start(1), m.end(1)
            subj = _np_text(tokens, *spans[subj_i])
            obj = _np_text(tokens, *spans[obj_i])
            pred_toks = []
            for k in range(ps, pe):
                s, e = spans[k]
                pred_toks.extend(tokens[s:e])
            pred = "be" if kind == "cop" else " ".join(t.lower() for t in pred_toks)
            if subj and obj and pred and subj.lower() != obj.lower():
                out.append(
                    {"subj": subj, "pred": pred, "obj": obj, "conf": conf}
                )
            pos = m.end() - 1  # allow chained E V E V E
    # dedupe within sentence, keep max conf, deterministic order
    best = {}
    for t in out:
        k = (t["subj"].lower(), t["pred"], t["obj"].lower())
        if k not in best or t["conf"] > best[k]["conf"]:
            best[k] = t
    return [best[k] for k in sorted(best)]


def detect_mentions(sentence: str):
    """D6 — longest non-overlapping noun phrases with char offsets."""
    tokens = tokenize(sentence)
    if not tokens:
        return []
    tags = tag_tokens(tokens)
    # char offsets per token (re-scan once)
    offs = [m.span() for m in TOKEN_RE.finditer(sentence)]
    out = []
    for m in NP_RE.finditer(tags):
        s, e = m.start(), m.end()
        mention = _np_text(tokens, s, e)
        if not mention:
            continue
        # offset of first non-det token
        first = s + (1 if tag_word(tokens[s]) == "D" and e - s > 1 else 0)
        out.append(
            {"mention": mention, "start": offs[first][0], "end": offs[e - 1][1]}
        )
    return out
