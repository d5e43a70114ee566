"""Document-level pronoun coreference (rule-based, deterministic).

The reference's compiler is per-sentence; a KG built from web pages
loses every fact whose subject is "he/she/it/they". This stage resolves
pronoun SUBJECTS to the most recent preceding entity mention in the
same document — the classic recency heuristic, deterministic and
model-free (no coref models exist in this environment).

Spark shape (D9 grouped-map): sentences are grouped by url with
``applyInPandas`` — the ONLY stage in the engine that legitimately
needs whole-document state (antecedent tracking crosses sentence
boundaries), so it pays exactly one shuffle on url. At 10^12 docs that
shuffle is url-bucketed and skew-free (a url's sentence count is
bounded), and upstream tables are already bucketed by url, so AQE can
often satisfy it from the existing layout.

Resolution rule (deterministic):
- antecedent candidates = NP mentions emitted per sentence, in order;
- a triple whose subject is exactly a subject pronoun (he, she, it,
  they, this, these) is rewritten to the LAST mention of an earlier
  sentence (recency); sentence-internal mentions are not candidates
  (the pronoun usually precedes them in a later clause);
- no antecedent yet -> the triple is dropped (an unresolvable pronoun
  subject is noise, not a fact);
- objects and non-pronoun subjects pass through untouched.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

from ..functions.nlp import analyze_sentence

SUBJECT_PRONOUNS = {"he", "she", "it", "they", "this", "these"}

COREF_TRIPLE_COLS = (
    "url string, sent_id int, subj string, pred string, obj string, "
    "conf double, resolved boolean"
)


def resolve_document(sent_rows: list[tuple[int, str]]) -> list[dict]:
    """Pure core (oracle-shareable): [(sent_id, sentence)] sorted ->
    triples with pronoun subjects resolved by recency."""
    out = []
    last_mention: str | None = None
    for sid, sentence in sent_rows:
        triples, mentions = analyze_sentence(sentence)
        for t in triples:
            subj = t["subj"]
            resolved = False
            if subj.lower() in SUBJECT_PRONOUNS:
                if last_mention is None:
                    continue
                subj = last_mention
                resolved = True
            if subj.lower() == t["obj"].lower():
                continue
            out.append(
                {
                    "sent_id": sid,
                    "subj": subj,
                    "pred": t["pred"],
                    "obj": t["obj"],
                    "conf": t["conf"] * (0.9 if resolved else 1.0),
                    "resolved": resolved,
                }
            )
        if mentions:
            # last NON-pronoun mention of this sentence becomes the
            # antecedent for following sentences
            for m in reversed(mentions):
                if m["mention"].lower() not in SUBJECT_PRONOUNS:
                    last_mention = m["mention"]
                    break
    return out


def coref_triples(sentences: DataFrame) -> DataFrame:
    """sentences(url, sent_id, sentence) -> coref-resolved triples.

    Grouped-map per url: one shuffle, whole-document antecedent state
    inside the Arrow batch.
    """

    def per_doc(pdf: pd.DataFrame) -> pd.DataFrame:
        url = pdf["url"].iloc[0]
        rows = resolve_document(
            list(
                pdf.sort_values("sent_id")[["sent_id", "sentence"]]
                .itertuples(index=False, name=None)
            )
        )
        return pd.DataFrame(
            {
                "url": pd.Series([url] * len(rows), dtype=object),
                "sent_id": pd.Series([r["sent_id"] for r in rows], dtype="int32"),
                "subj": pd.Series([r["subj"] for r in rows], dtype=object),
                "pred": pd.Series([r["pred"] for r in rows], dtype=object),
                "obj": pd.Series([r["obj"] for r in rows], dtype=object),
                "conf": pd.Series([r["conf"] for r in rows], dtype="float64"),
                "resolved": pd.Series(
                    [r["resolved"] for r in rows], dtype="bool"
                ),
            }
        )

    return sentences.groupBy("url").applyInPandas(per_doc, schema=COREF_TRIPLE_COLS)
