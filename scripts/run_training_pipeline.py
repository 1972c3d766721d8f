#!/usr/bin/env python
"""End-to-end LLM training-data pipeline over the documents fixture:
the engine's extension operators composed the way a curation run would
chain them at 100 TB.

    raw documents
      → data-quality gate  (operators/validate.py — one scan, hard fail)
      → language filter    (functions/text.py language heuristics)
      → quality filter     (length/punct/stopword score)
      → exact dedup        (functions/dedup.py — 16-byte digests shuffle)
      → near-dup dedup     (MinHash-LSH candidates → components → keep
                            canonical doc per cluster)
      → repetition gate    (functions/curation.py — Gopher-style
                            mode-word / duplicate-n-gram thresholds)
      → boilerplate gate   (functions/curation.py — cross-doc shared
                            5-gram fraction; passage-level templating)
      → decontamination    (functions/curation.py — drop docs sharing
                            token n-grams with the held-out eval set)
      → PII redaction      (chained regexp_replace, map-only)
      → mixture reweighting(functions/curation.py — per-source keep
                            rates, md5 scan filter)
      → deterministic split(functions/sampling.py — md5-prefix, stable)
      → shard layout       (functions/curation.py — stable (shard, pos))
      → token stats        (observe metrics: zero extra scans)
      → train/test parquet (sources/writers.py)

Stage costs: five keyed shuffles total (exact-dedup digest group, the
LSH band join, the repetition-gate doc-key window, the boilerplate
gram-frequency aggregate, the shard exchange);
decontamination broadcasts the eval shingle set; everything else is
map-only, so the pipeline scales with scan bandwidth. Run:

    python scripts/run_training_pipeline.py [sf_dir] [out_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Observation
from pyspark.sql import functions as F

from yelp_etl_spark.functions import curation as C
from yelp_etl_spark.functions import dedup as D
from yelp_etl_spark.functions import text as TX
from yelp_etl_spark.functions.sampling import deterministic_sample, train_test_split
from yelp_etl_spark.operators.validate import assert_quality
from yelp_etl_spark.session import get_spark


def run(spark, sf_dir: str, out_dir: str) -> dict[str, float]:
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))

    # 1. Hard data-quality gate: reject the batch if structurally broken.
    assert_quality(
        docs,
        {
            "null_id": F.col("doc_id").isNull(),
            "null_text": F.col("text").isNull(),
            "negative_len": F.col("n_chars") < 0,
        },
    )

    # 2+3. Language + quality filters (map-only, fused into one stage).
    scored = docs.withColumn("quality", TX.quality_score(F.col("text")))
    kept = scored.filter((F.col("lang") == "en") & (F.col("quality") > 0.2))

    # 4. Exact dedup: keep the minimum doc_id per content fingerprint.
    fp = kept.withColumn("fp", TX.fingerprint(F.col("text")))
    keeper = fp.groupBy("fp").agg(F.min("doc_id").alias("keep_id"))
    exact_unique = fp.join(
        keeper,
        (fp["fp"] == keeper["fp"]) & (fp["doc_id"] == keeper["keep_id"]),
        "left_semi",
    )

    # 5. Near-dup dedup: MinHash-LSH candidates → connected components →
    #    keep one canonical doc per component.
    pairs = D.minhash_candidate_pairs(exact_unique, num_hashes=32, bands=8)
    deduped = D.dedup_keep_canonical(exact_unique, pairs)

    # 5b. Repetition gate: drop boilerplate/looped documents (mode-word
    #     share, duplicate-3-gram fraction — thresholds are corpus
    #     knobs; these keep the synthetic fixture's healthy docs).
    rep = C.repetition_metrics(deduped, ngram=3)
    rep_ok = rep.filter(
        (F.col("dup_ngram_frac") <= 0.6) & (F.col("top_word_frac") <= 0.5)
    ).select("doc_id")
    gated = deduped.join(rep_ok, "doc_id", "left_semi")

    # 5b2. Cross-document boilerplate gate: drop docs whose gram mass is
    #      mostly corpus-shared templating — the passage-level signal
    #      document-level near-dup (stage 5) cannot see. Threshold is a
    #      corpus knob; 0.8 keeps the fixture's healthy docs.
    boiler = C.cross_doc_boilerplate(gated, ngram=5, min_docs=3)
    boiler_ok = boiler.filter(F.col("boilerplate_frac") <= 0.8).select("doc_id")
    gated = gated.join(boiler_ok, "doc_id", "left_semi")

    # 5c. Decontamination: a deterministic 2% held-out eval sample must
    #     not leak token 5-grams into the training corpus.
    eval_set = deterministic_sample(docs, "doc_id", 0.02)
    decontaminated = C.decontaminate(
        gated.join(eval_set.select("doc_id"), "doc_id", "left_anti"),
        eval_set,
        ngram=5,
    )

    # 6. PII scrub; 6b. source-mixture reweighting; 7. deterministic split.
    scrubbed = decontaminated.withColumn("text", TX.redact_pii(F.col("text")))
    balanced = C.mixture_sample(
        scrubbed, "source", {"src0": 0.5, "src1": 0.5}, key_col="doc_id"
    )
    split = train_test_split(balanced, "doc_id", train_fraction=0.9)

    # 7b. Stable shard layout for the training writer.
    split = split.join(
        C.shard_assignment(split, key_col="doc_id", n_shards=4),
        "doc_id",
    )

    # 8. Token stats via observe: collected during the write, no rescan.
    obs = Observation("pipeline_metrics")
    final = split.observe(
        obs,
        F.count("*").alias("n_docs"),
        F.sum(TX.token_count(F.col("text"))).alias("n_tokens"),
        F.count_if(F.col("split") == "train").alias("n_train"),
    )

    # 9. Write train/test partitions.
    final.write.mode("overwrite").partitionBy("split").parquet(out_dir)
    return dict(obs.get)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/training_corpus"
    spark = get_spark("training-pipeline")
    spark.sparkContext.setLogLevel("ERROR")
    metrics = run(spark, sf_dir, out_dir)
    n_in = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).count()
    print(
        {
            "input_docs": n_in,
            **metrics,
            "out_dir": out_dir,
        }
    )


if __name__ == "__main__":
    main()
