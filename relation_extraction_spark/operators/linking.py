"""Entity linking: candidate generation + link-score + top-1 + NIL
(SURVEY.md §2 J1/J5/J6/W1/D7; BASELINE.json:L6).

Pipeline: mentions -> normalize -> broadcast-join the alias dictionary
(candidate generation; dictionary is small by design, so the mention
side NEVER shuffles for this join) -> batched link-score pandas UDF
(string similarity x prior) -> deterministic top-1 per mention via
ranking window -> left-outer union with NIL mentions (no candidate).

At 10^12 docs the only shuffle in this stage is the ranking window's
hash partition on (url, sent_id, mention) — and head-entity skew there
is bounded because a (url, sent_id, mention) key has at most
|dictionary| candidates.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType

from .dedup import normalize_text_expr


def _char_trigrams(s: str) -> set[str]:
    s = f"  {s} "
    return {s[i : i + 3] for i in range(len(s) - 2)}


@pandas_udf(DoubleType())
def link_score(mention: pd.Series, canonical: pd.Series, prior: pd.Series) -> pd.Series:
    """D7 — deterministic link score: char-trigram Jaccard between the
    normalized mention and the canonical name, damped by the dictionary
    prior. Arrow-batched; per-batch Python but vectorized set ops only.

    score = jaccard(mention, canonical) * (0.5 + 0.5 * prior)
    """
    out = []
    for m, c, p in zip(mention, canonical, prior):
        a = _char_trigrams(str(m).lower())
        b = _char_trigrams(str(c).lower())
        j = len(a & b) / max(len(a | b), 1)
        out.append(j * (0.5 + 0.5 * float(p)))
    return pd.Series(out, dtype="float64")


def link_mentions(mentions: DataFrame, dictionary: DataFrame) -> DataFrame:
    """mentions(url, sent_id, mention) x dict -> linked mentions with
    entity_id (nullable: NIL = no dictionary candidate) and score."""
    m = mentions.withColumn("alias_norm", normalize_text_expr("mention"))
    cand = m.join(F.broadcast(dictionary), "alias_norm", "inner").withColumn(
        "score",
        F.round(link_score("alias_norm", "canonical_name", "prior"), 6),
    )
    w = Window.partitionBy("url", "sent_id", "mention").orderBy(
        F.desc("score"), F.asc("entity_id")
    )
    top1 = (
        cand.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("url", "sent_id", "mention", "entity_id", "score")
    )
    nil = (
        m.join(F.broadcast(dictionary.select("alias_norm")), "alias_norm", "left_anti")
        .select(
            "url",
            "sent_id",
            "mention",
            F.lit(None).cast("long").alias("entity_id"),
            F.lit(None).cast("double").alias("score"),
        )
    )
    return top1.unionByName(nil)
