"""Training-mixture pipeline — the §2.11 ops composed into ONE job.

    quality filter → decontaminate → exact dedup → near-dup cluster
    (keep one per cluster) → sequence packing → snapshot commit +
    audit metrics

Every stage is an oracle-checked operator from the registry
(plans/queries.py); this module only composes them, so correctness is
inherited. The output is what a pretraining data loader consumes: a
``mixture_docs`` snapshot table of surviving documents with their
packed (seq_no, seq_off) positions, plus a ``metrics`` table recording
how many documents each stage dropped and why (per-rule rejection
counts) — the auditability a 100-TB cleaning run needs before anyone
commits to a drop.

Scale shape: the filter and sampling stages are narrow (no shuffle);
decontamination broadcasts the (tiny) eval shingle set; clustering
shuffles on shingle blocking keys only; packing is the two-pass
distributed prefix sum (operators/packing.py — no whole-stratum
reducer). One lakehouse commit at the end, not per stage.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.textstats import quality_filter_exprs
from ..operators.connected_components import connected_components
from ..operators.dedup import (
    contamination_overlap,
    ngram_jaccard_pairs,
    normalize_text_expr,
)
from ..operators.packing import pack_offsets_scalable
from ..sources.lakehouse import SnapshotTable
from .pipeline import METRICS_SCHEMA


@dataclass
class MixtureConfig:
    out: str
    input_parquet: str
    eval_max_doc_id: int = 10        # docs below this id form the eval set
    decontam_ngram: int = 4
    dup_threshold: float = 0.3
    dup_ngram: int = 2
    pack_budget: int = 512
    run_id: str = "mixture"


def run_mixture(spark: SparkSession, cfg: MixtureConfig) -> dict:
    """Run the cleaning pipeline; returns the audit counts dict.

    Audit-count discipline (the probe-measured fixed-cost attack,
    BASELINE.md "Mixture-pipeline scaling"): every count rides a pass
    the job makes anyway — ONE two-key histogram covers input size,
    the per-rule rejection table and the train-side split; the
    contamination and near-dup numbers come from counting the (tiny)
    dropped-id frames; the remaining stage sizes are derived by
    arithmetic. No full-corpus scan exists only to produce a metric.
    """
    docs = spark.read.parquet(cfg.input_parquet)

    # 1. quality filter — keep verdict + per-rule rejection counts.
    #    ONE aggregation computes the whole audit head: rows per
    #    (_reasons, is-eval) cell. '' reason = kept; eval split lets
    #    n_train fall out without a second scan.
    keep, reasons = quality_filter_exprs("text", "lang")
    flagged = docs.select(
        "*", keep.alias("_keep"), reasons.alias("_reasons")
    ).localCheckpoint(eager=False)
    hist = {
        (r["_reasons"], r["_is_eval"]): r["n"]
        for r in flagged.groupBy(
            "_reasons",
            (F.col("doc_id") < cfg.eval_max_doc_id).alias("_is_eval"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    n_input = sum(hist.values())
    reason_counts: dict[str, int] = {}
    for (rs, _ev), n in hist.items():
        if rs != "":
            reason_counts[rs] = reason_counts.get(rs, 0) + n
    n_eval_clean = hist.get(("", True), 0)
    n_train = hist.get(("", False), 0)
    clean = flagged.filter(F.col("_keep")).drop("_keep", "_reasons")

    # 2. decontamination — eval set = lowest ids (stand-in for a real
    #    benchmark table); contaminated TRAINING docs are dropped, the
    #    eval docs themselves never enter the mixture. The dropped-id
    #    frame is tiny (contaminated docs only) — checkpoint it so the
    #    count and the anti-join share one computation of the
    #    broadcast-join pass.
    train = clean.filter(F.col("doc_id") >= cfg.eval_max_doc_id)
    eval_docs = docs.filter(F.col("doc_id") < cfg.eval_max_doc_id)
    contaminated = (
        contamination_overlap(train, eval_docs, n=cfg.decontam_ngram)
        .select("doc_id")
        .localCheckpoint(eager=False)
    )
    n_contaminated = contaminated.count()
    decon = train.join(contaminated, "doc_id", "left_anti")
    n_decon = n_train - n_contaminated

    # 3a. EXACT dedup first — one hash groupBy on normalized text keeps
    #     the min-id copy. Exact copies dominate real crawl dup mass
    #     (mirrors, recrawls); removing them here costs one narrow
    #     shuffle and shrinks the expensive shingle pass's input, so
    #     the near-dup stage only pays for genuinely fuzzy matches.
    keep_ids = (
        decon.select("doc_id", normalize_text_expr("text").alias("_norm"))
        .groupBy("_norm")
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    exact_kept = decon.join(keep_ids, "doc_id", "left_semi").localCheckpoint(
        eager=False
    )

    # 3b. near-dup clustering — pairs on shingle blocking keys, closed
    #     under transitivity, keep the component-minimum representative
    #     (similarity is not transitive: pair-wise dropping under-removes)
    pairs = ngram_jaccard_pairs(
        exact_kept, threshold=cfg.dup_threshold, n=cfg.dup_ngram
    )
    cc = connected_components(
        pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
    )
    drop = cc.filter(F.col("node") != F.col("component")).select(
        F.col("node").alias("doc_id")
    )
    # drop ⊆ exact_kept (CC nodes are pair endpoints), so stage sizes
    # derive from this TINY frame: n_exact_kept = n_output + n_dropped
    n_near_dup_dropped = drop.count()
    unique = exact_kept.join(drop, "doc_id", "left_anti")

    # 4. sequence packing over survivors (two-pass scalable form)
    packed = pack_offsets_scalable(
        unique.select(
            "doc_id", "lang", F.size(F.split("text", " ")).alias("n_tok")
        ),
        budget=cfg.pack_budget,
    )

    # 5. one commit: the mixture table + the audit metrics
    out_tbl = SnapshotTable(cfg.out, "mixture_docs")
    manifest = out_tbl.append(packed, stage="mixture")
    n_out = manifest["n_rows"]
    n_exact_kept = n_out + n_near_dup_dropped
    counts = {
        "n_input": n_input,
        "n_quality_dropped": sum(reason_counts.values()),
        "n_eval_held_out": n_eval_clean,
        "n_contaminated": n_contaminated,
        "n_exact_dup_dropped": n_decon - n_exact_kept,
        "n_near_dup_dropped": n_near_dup_dropped,
        "n_output": n_out,
        **{f"quality_drop[{k}]": v for k, v in sorted(reason_counts.items())},
    }
    SnapshotTable(cfg.out, "metrics").append_rows(
        [
            {
                "metric": k,
                "value": float(v),
                "stage": "mixture",
                "run_id": cfg.run_id,
            }
            for k, v in counts.items()
        ],
        METRICS_SCHEMA,
        stage="mixture",
    )
    return counts
