"""The stage DAG: ingest -> extract -> link -> canonicalize ->
materialize -> metrics (SURVEY.md §3.1; BASELINE.json:L6/L14).

Each stage reads committed snapshots, computes one DataFrame expression,
snapshot-commits its outputs (sources/lakehouse.py), and appends lineage
(per-partition row counts) + metric rows. Resume: a stage whose output
snapshot already exists is a no-op on re-run (checkpoint-resumable,
BASELINE.json:L14); ingest additionally skips input partitions recorded
as done (S5 anti-join semantics via the manifest's extra field).

Scale shape per stage (the 1000-executor story):
- ingest:       embarrassingly parallel generate/scan; one window shuffle
                for as-of recrawl dedup, partitioned by url hash.
- extract:      ZERO shuffles — scan -> filter -> segment -> extract is
                one pipelined stage per input split.
- link:         broadcast dictionary join (no fact shuffle) + one window
                shuffle on (url, sent_id, mention).
- canonicalize: shuffles on band-hash and node id only; CC iterations
                localCheckpoint to cut lineage.
- materialize:  two mapping joins (form-hash keys) + one hash agg.
- metrics:      tiny aggregates, appended to the metrics table.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.htmltext import extract_text
from ..operators.asof import latest_per_key
from ..operators.canonicalize import canonicalize
from ..operators.extract import (
    mentions_from_sentences,
    sentences_from_pages,
    triples_from_sentences,
)
from ..operators.graph import cooccurrence_edges, materialize_edges
from ..operators.linking import link_mentions
from ..sources.corpus import synthetic_pages
from ..sources.dictionary import entity_dictionary
from ..sources.lakehouse import SnapshotTable

STAGES = ["ingest", "extract", "link", "canonicalize", "materialize", "metrics"]
N_PART_KEYS = 64  # lineage granularity: pmod(xxhash64(url), 64)


@dataclass
class PipelineConfig:
    out: str
    pages: int = 2000
    seed: int = 42
    skew: float = 0.1
    dup_frac: float = 0.05
    lang_en: float = 0.85
    cooccur_window: int = 2
    lsh_threshold: float = 0.7
    resume: bool = True
    run_id: str = "run-0"
    input_parquet: str | None = None  # pre-generated corpus (bench path)
    extra_tables: dict = field(default_factory=dict)


def _part_key(col: str = "url") -> F.Column:
    return F.pmod(F.xxhash64(col), F.lit(N_PART_KEYS)).cast("int")


class Pipeline:
    def __init__(self, spark: SparkSession, cfg: PipelineConfig):
        self.spark = spark
        self.cfg = cfg
        self.tables = {
            name: SnapshotTable(cfg.out, name)
            for name in [
                "web_pages", "triples", "mentions", "linked_mentions",
                "entities", "mapping", "edges", "lineage", "metrics",
            ]
        }

    # ------------------------------------------------------------- plumbing

    def _lineage(self, df: DataFrame, stage: str, key: str = "url") -> DataFrame:
        return (
            df.groupBy(_part_key(key).alias("part_key"))
            .agg(F.count(F.lit(1)).alias("n_rows"))
            .select(
                F.lit(self.cfg.run_id).alias("run_id"),
                F.lit(stage).alias("stage"),
                "part_key",
                "n_rows",
                F.lit(0).cast("long").alias("wall_ms"),
            )
        )

    def _metric(self, name: str, value: float, stage: str, wall_ms: int) -> DataFrame:
        return self.spark.createDataFrame(
            [
                (name, float(value), stage, self.cfg.run_id),
                (f"{stage}_wall_ms", float(wall_ms), stage, self.cfg.run_id),
            ],
            "metric string, value double, stage string, run_id string",
        )

    def _commit_stage(
        self,
        stage: str,
        outputs: dict[str, DataFrame],
        headline: tuple[str, float],
        t0: float,
        lineage_src: tuple[DataFrame, str] | None = None,
    ) -> dict:
        info = {}
        for tname, df in outputs.items():
            info[tname] = self.tables[tname].commit(df, stage=stage)
        wall_ms = int((time.time() - t0) * 1000)
        if lineage_src is not None:
            ldf, key = lineage_src
            self.tables["lineage"].append(
                self._lineage(ldf, stage, key).withColumn(
                    "wall_ms", F.lit(wall_ms).cast("long")
                ),
                stage=stage,
            )
        self.tables["metrics"].append(
            self._metric(headline[0], headline[1], stage, wall_ms), stage=stage
        )
        info["wall_ms"] = wall_ms
        return info

    def _done(self, *tables: str) -> bool:
        return all(self.tables[t].exists() for t in tables)

    # --------------------------------------------------------------- stages

    def stage_ingest(self) -> dict:
        if self.cfg.resume and self._done("web_pages"):
            return {"skipped": True}
        t0 = time.time()
        if self.cfg.input_parquet:
            raw = self.spark.read.parquet(self.cfg.input_parquet)
        else:
            raw = synthetic_pages(
                self.spark,
                self.cfg.pages,
                seed=self.cfg.seed,
                skew=self.cfg.skew,
                dup_frac=self.cfg.dup_frac,
                lang_en=self.cfg.lang_en,
            )
        # as-of dedup of recrawls: keep latest warc_ts per url (J9)
        pages = latest_per_key(raw, ["url"], "warc_ts")
        n = pages.count()
        return self._commit_stage(
            "ingest",
            {"web_pages": pages},
            ("pages_ingested", n),
            t0,
            lineage_src=(pages, "url"),
        )

    def stage_extract(self) -> dict:
        if self.cfg.resume and self._done("triples", "mentions"):
            return {"skipped": True}
        t0 = time.time()
        pages = self.tables["web_pages"].read(self.spark)
        # D1: extracted text MUST byte-match the stored text per url
        # (BASELINE.json:L15). We extract from html and *use* the
        # extraction downstream; the invariant count is a hard metric.
        extracted = pages.select(
            "url",
            "lang",
            extract_text("html").alias("text"),
            F.col("text").alias("text_expected"),
        )
        n_mismatch = extracted.filter(
            F.col("text") != F.col("text_expected")
        ).count()
        sents = sentences_from_pages(extracted, lang="en")
        triples = triples_from_sentences(sents)
        mentions = mentions_from_sentences(sents)
        info = self._commit_stage(
            "extract",
            {"triples": triples, "mentions": mentions},
            ("text_invariant_mismatches", n_mismatch),
            t0,
            lineage_src=(triples, "url"),
        )
        info["n_mismatch"] = n_mismatch
        return info

    def stage_link(self) -> dict:
        if self.cfg.resume and self._done("linked_mentions"):
            return {"skipped": True}
        t0 = time.time()
        mentions = self.tables["mentions"].read(self.spark)
        linked = link_mentions(mentions, entity_dictionary(self.spark))
        n_linked = linked.filter(F.col("entity_id").isNotNull()).count()
        return self._commit_stage(
            "link",
            {"linked_mentions": linked},
            ("mentions_linked", n_linked),
            t0,
            lineage_src=(linked, "url"),
        )

    def stage_canonicalize(self) -> dict:
        if self.cfg.resume and self._done("entities", "mapping"):
            return {"skipped": True}
        t0 = time.time()
        mentions = self.tables["mentions"].read(self.spark)
        linked = self.tables["linked_mentions"].read(self.spark)
        triples = self.tables["triples"].read(self.spark)
        entities, mapping = canonicalize(
            mentions, linked, triples, threshold=self.cfg.lsh_threshold
        )
        n_entities = entities.count()
        return self._commit_stage(
            "canonicalize",
            {"entities": entities, "mapping": mapping},
            ("entities_canonical", n_entities),
            t0,
        )

    def stage_materialize(self) -> dict:
        if self.cfg.resume and self._done("edges"):
            return {"skipped": True}
        t0 = time.time()
        triples = self.tables["triples"].read(self.spark)
        linked = self.tables["linked_mentions"].read(self.spark)
        mapping = self.tables["mapping"].read(self.spark)
        edges = materialize_edges(triples, mapping).unionByName(
            cooccurrence_edges(linked, mapping, self.cfg.cooccur_window)
        )
        n_edges = edges.count()
        return self._commit_stage(
            "materialize", {"edges": edges}, ("edges_materialized", n_edges), t0
        )

    def stage_metrics(self) -> dict:
        t0 = time.time()
        triples = self.tables["triples"].read(self.spark)
        stats = triples.agg(
            F.count(F.lit(1)).alias("n"),
            F.approx_count_distinct("url").alias("docs"),
            F.avg("conf").alias("avg_conf"),
        ).collect()[0]
        wall_ms = int((time.time() - t0) * 1000)
        rows = [
            ("triples_total", float(stats["n"]), "metrics", self.cfg.run_id),
            ("docs_with_triples_approx", float(stats["docs"]), "metrics", self.cfg.run_id),
            ("avg_conf", float(stats["avg_conf"] or 0.0), "metrics", self.cfg.run_id),
            ("metrics_wall_ms", float(wall_ms), "metrics", self.cfg.run_id),
        ]
        self.tables["metrics"].append(
            self.spark.createDataFrame(
                rows, "metric string, value double, stage string, run_id string"
            ),
            stage="metrics",
        )
        return {"triples_total": stats["n"], "wall_ms": wall_ms}

    # ------------------------------------------------------------------ run

    def run(self, stages: list[str] | None = None) -> dict[str, dict]:
        out = {}
        for s in stages or STAGES:
            out[s] = getattr(self, f"stage_{s}")()
        return out


def run_pipeline(
    spark: SparkSession, cfg: PipelineConfig, stages: list[str] | None = None
) -> dict[str, dict]:
    return Pipeline(spark, cfg).run(stages)
