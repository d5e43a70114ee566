"""Data-plane scaling probe: the UDF/shuffle compute path WITHOUT
commit I/O or control-plane latency.

Measures scan -> html-extract -> segment -> triple-extract -> mention
-> broadcast-link -> window-top1 (the reference-equivalent compiler
workload) into a noop sink, at two core counts, repeats-take-min. This
isolates "does the dataflow architecture scale?" from the single-box
confounds BASELINE.md documents (shared page cache, one JVM heap,
commit fsyncs) that cap end-to-end local-mode scaling.

Usage: python scripts/dataplane_scaling.py [--pages 250000] [--small 2]
       [--large 8] [--repeats 2]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BENCH_ROOT = os.environ.get("KG_BENCH_ROOT", "/dev/shm/kg_bench")

WORKLOAD = r"""
import sys, time, json
sys.path.insert(0, {repo!r})
from relation_extraction_spark.session import get_spark
from relation_extraction_spark.operators.asof import latest_per_key
from relation_extraction_spark.operators.extract import (
    sentences_from_pages, extractions_from_sentences, split_extractions)
from pyspark import StorageLevel
from relation_extraction_spark.operators.linking import link_mentions
from relation_extraction_spark.sources.dictionary import entity_dictionary
from relation_extraction_spark.functions.htmltext import extract_text
from pyspark.sql import functions as F

cores = {cores}
spark = get_spark(app_name="dataplane", master=f"local[{{cores}}]",
                  shuffle_partitions=2 * cores,
                  extra_conf={{"spark.local.dir": {local_dir!r},
                               # JVM-size parity with the e2e harness
                               # (scaling_bench.py --driver-memory 24g):
                               # at 500k pages the fused persist + 8
                               # concurrent tasks thrash GC in the 8g
                               # default heap and the wide leg pays
                               # disproportionately. Same heap on BOTH
                               # legs — the ratio stays a fair measure.
                               "spark.driver.memory": {driver_mem!r}}})
from relation_extraction_spark.sources.corpus import PAGES_SCHEMA
raw = spark.read.schema(PAGES_SCHEMA).parquet({corpus!r})
# repartition FIRST: HashPartitioning(url, 64) satisfies the as-of
# window's required distribution, so the full-html corpus shuffles
# ONCE, not twice (mirrors plans/pipeline.py stage_ingest)
pages = latest_per_key(raw.repartition(64, "url"), ["url"], "warc_ts")
pages = pages.select("url", "lang", extract_text("html").alias("text"))
sents = sentences_from_pages(pages, lang="en")
t0 = time.time()
# fused architecture (one extraction pass emits triples AND mentions,
# persisted so linking and the triple count share it) — mirrors
# plans/pipeline.py stage_extract
fused = extractions_from_sentences(sents).persist(StorageLevel.MEMORY_AND_DISK)
triples, mentions = split_extractions(fused)
linked = link_mentions(mentions, entity_dictionary(spark))
linked.write.format("noop").mode("overwrite").save()
n_triples = triples.count()
fused.unpersist()
wall = time.time() - t0
print(json.dumps({{"cores": cores, "wall_s": round(wall, 2),
                   "n_triples": n_triples,
                   "triples_per_sec": round(n_triples / wall, 1)}}))
spark.stop()
"""


def run_once(cores: int, corpus: str, driver_mem: str = "24g") -> dict:
    code = WORKLOAD.format(
        repo=REPO,
        cores=cores,
        corpus=corpus,
        local_dir=os.path.join(BENCH_ROOT, f"spark_local_dp_{cores}"),
        driver_mem=driver_mem,
    )
    t0 = time.time()
    proc = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True, text=True, cwd=REPO, timeout=3600,
    )
    if proc.returncode != 0:
        sys.stderr.write(proc.stderr[-3000:])
        raise RuntimeError(f"leg cores={cores} failed")
    rec = json.loads(
        [l for l in proc.stdout.splitlines() if l.startswith("{")][-1]
    )
    rec["submit_wall_s"] = round(time.time() - t0, 2)
    return rec


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", type=int, default=250000)
    ap.add_argument("--sent-lo", type=int, default=12)
    ap.add_argument("--sent-hi", type=int, default=40)
    ap.add_argument("--small", type=int, default=2)
    ap.add_argument("--large", type=int, default=8)
    ap.add_argument("--repeats", type=int, default=2)
    ap.add_argument("--driver-mem", default="24g",
                    help="JVM heap for BOTH legs (parity with the e2e "
                         "harness's spark-submit --driver-memory 24g)")
    ap.add_argument("--out", default=None,
                    help="output JSON path (default BENCH_dataplane.json; "
                         "pass a scratch path for diagnostic runs)")
    args = ap.parse_args()

    corpus = os.path.join(
        BENCH_ROOT, f"corpus_{args.pages}_s{args.sent_lo}-{args.sent_hi}"
    )
    if not os.path.exists(os.path.join(corpus, "_SUCCESS")):
        from scaling_bench import gen_corpus  # same generator, same corpus

        gen_corpus(args.pages, corpus, args.sent_lo, args.sent_hi)

    # legs INTERLEAVED (small, large, small, large ...): this sandbox's
    # background load drifts on multi-minute timescales, so sequential
    # per-leg repeats can sample different noise regimes and corrupt the
    # ratio; interleaving keeps both legs inside each noise window and
    # min-over-repeats then drops the slow windows from both equally.
    small = large = None
    for _ in range(args.repeats):
        rec_s = run_once(args.small, corpus, args.driver_mem)
        rec_l = run_once(args.large, corpus, args.driver_mem)
        if small is None or rec_s["wall_s"] < small["wall_s"]:
            small = rec_s
        if large is None or rec_l["wall_s"] < large["wall_s"]:
            large = rec_l
    eff = (large["triples_per_sec"] / small["triples_per_sec"]) / (
        args.large / args.small
    )
    out = {
        "workload": "dataplane extract+link (noop sink)",
        "pages": args.pages,
        "driver_mem": args.driver_mem,
        "small": small,
        "large": large,
        "scaling_efficiency": round(eff, 3),
    }
    print(json.dumps(out, indent=2))
    path = args.out or os.path.join(REPO, "BENCH_dataplane.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=2)


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    main()
