"""Property-based tests (hypothesis) for the pure NLP/text cores and
the MinHash estimator (SURVEY.md §5.3)."""

from __future__ import annotations

import re

from hypothesis import given, settings
from hypothesis import strategies as st

from relation_extraction_spark.functions.htmltext import extract_text_py
from relation_extraction_spark.functions.nlp import (
    detect_mentions,
    extract_from_sentence,
    tag_tokens,
    tokenize,
)
from relation_extraction_spark.functions.segment import segment_py

words = st.text(
    alphabet=st.characters(whitelist_categories=("Ll", "Lu")), min_size=1, max_size=10
)
sentences = st.lists(words, min_size=1, max_size=15).map(
    lambda ws: " ".join(ws) + "."
)
texts = st.lists(sentences, min_size=0, max_size=8).map(" ".join)


@settings(max_examples=200, deadline=None)
@given(texts)
def test_segment_preserves_content(text):
    """Segmentation never loses or invents characters: the concatenated
    sentences equal the input modulo whitespace."""
    joined = "".join(segment_py(text))
    assert re.sub(r"\s+", "", joined) == re.sub(r"\s+", "", text)


@settings(max_examples=200, deadline=None)
@given(texts)
def test_segment_deterministic_and_nonempty(text):
    a, b = segment_py(text), segment_py(text)
    assert a == b
    assert all(s.strip() for s in a)


@settings(max_examples=200, deadline=None)
@given(sentences)
def test_tagger_total_and_aligned(sent):
    toks = tokenize(sent)
    tags = tag_tokens(toks)
    assert len(tags) == len(toks)
    assert set(tags) <= set("DJNVBMPTRCWO")


@settings(max_examples=200, deadline=None)
@given(sentences)
def test_extraction_never_crashes_and_is_deterministic(sent):
    a = extract_from_sentence(sent)
    b = extract_from_sentence(sent)
    assert a == b
    for t in a:
        assert t["subj"] and t["pred"] and t["obj"]
        assert t["subj"].lower() != t["obj"].lower()
        assert 0 < t["conf"] <= 1


@settings(max_examples=200, deadline=None)
@given(sentences)
def test_mentions_offsets_inside_sentence(sent):
    for m in detect_mentions(sent):
        assert 0 <= m["start"] < m["end"] <= len(sent)
        assert m["mention"]


@settings(max_examples=100, deadline=None)
@given(st.text(max_size=200))
def test_extract_text_idempotent_on_plain_text(plain):
    """Text with no markup survives extraction (modulo whitespace
    collapse), and extraction is idempotent."""
    safe = re.sub(r"[<>&]", "", plain)
    once = extract_text_py(safe)
    assert once == extract_text_py(once)
    assert re.sub(r"\s+", "", once) == re.sub(r"\s+", "", safe)


def test_minhash_estimates_jaccard(spark):
    """Banded-LSH candidate recall: pairs above the similarity threshold
    must be found by the MinHash path (verified exactly afterwards, so
    precision is 1.0 by construction — this pins recall)."""
    from relation_extraction_spark.operators.dedup import (
        minhash_lsh_pairs,
        ngram_jaccard_pairs,
    )

    base = (
        "the quick brown fox jumps over the lazy dog again and again "
        "while the engine scans the table and writes the rows"
    )
    rows = [(0, base)]
    # progressively mutated copies -> a spread of true jaccards
    w = base.split()
    for i in range(1, 12):
        mutated = " ".join(
            tok if (j * 7 + i) % 13 else f"tok{i}{j}" for j, tok in enumerate(w)
        )
        rows.append((i, mutated))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    exact = {
        (r.id_a, r.id_b)
        for r in ngram_jaccard_pairs(docs, threshold=0.6).collect()
    }
    lsh = {
        (r.id_a, r.id_b)
        for r in minhash_lsh_pairs(docs, threshold=0.6, k=32, bands=16).collect()
    }
    assert lsh <= exact  # no false positives (exact verify)
    missed = exact - lsh
    assert len(missed) <= max(1, len(exact) // 5), f"LSH recall too low: {missed}"
