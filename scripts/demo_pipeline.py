#!/usr/bin/env python3
"""End-to-end training-data pipeline over the Common-Crawl-style corpus,
runnable via spark-submit — composes every operator family in the repo
in the order a production webtext pipeline runs them:

  1. URL canonicalization (urls.url_normalize) — messy crawl variants
     collapse to one key before anything counts them
  2. crawl-frontier dedup against the previous crawl's CQF
  3. quality + repetition gates (textops)
  4. exact + cluster-aware near-dup removal (dedup, connected components)
  5. eval-set decontamination (textops.decontaminate, broadcast CQF)
  6. PII scrubbing (textops.scrub_pii)
  7. corpus sketches for monitoring (HLL per-language, heavy hitters,
     length quantiles)
  8. the clean corpus's CQF, checkpointed with lineage, for the NEXT
     crawl's step 2

  scripts/make_pyfiles.sh qfspark.zip
  spark-submit --master 'local[8]' --py-files qfspark.zip \
      scripts/demo_pipeline.py /root/testdata/sf0.01 /tmp/qf_pipeline
"""

import json
import sys

from pyspark.sql import SparkSession, functions as F


def main(sf_dir: str, workdir: str) -> None:
    from qfspark import dedup, sketches, textops, urls
    from qfspark.build import build_qf, build_sharded_qf
    from qfspark.lookup import filter_unseen
    from qfspark.sizing import QFConfig
    from qfspark.webpages import synthesize

    spark = SparkSession.builder.appName("qfspark-pipeline").getOrCreate()
    cfg = QFConfig(counter_bits=0, hash_name="xxhash64")
    stats = {}

    # 1. canonicalize: derive messy variants deterministically, then
    # normalize them back to one key per page
    wp = synthesize(spark, sf_dir)
    messy = wp.withColumn(
        "url",
        F.expr("""
          CASE pmod(CAST(regexp_extract(url, '([0-9]+)$', 1) AS BIGINT), 3)
            WHEN 1 THEN upper(url) WHEN 2 THEN url || '#frag' ELSE url
          END"""),
    )
    pages = (urls.url_normalize(messy, "url")
             .select(F.col("url_norm").alias("url"), "text", "lang")
             .cache())
    stats["pages"] = pages.count()

    # 2. frontier dedup: pretend half the crawl was fetched last run
    seen = build_qf(pages.where("pmod(length(url), 2) = 0"), "url",
                    config=cfg)
    fresh = filter_unseen(pages, "url", seen).cache()
    stats["fresh_pages"] = fresh.count()

    # 3-4. quality, repetition, exact + cluster near-dup
    docs = fresh.select(
        F.expr("CAST(regexp_extract(url, '([0-9]+)$', 1) AS BIGINT)")
        .alias("doc_id"), "text", "lang")
    rep_ok = (textops.repetition_stats(docs)
              .where("dup_gram_ratio <= 0.2").select("doc_id"))
    clean_ids = dedup.clean_corpus(
        docs.join(rep_ok, "doc_id"), near_dup_jaccard=0.3, cluster=True)
    clean = docs.join(clean_ids, "doc_id").cache()
    stats["clean_docs"] = clean.count()

    # 5. decontaminate against a synthetic "eval set" slice
    bench = docs.where("pmod(doc_id, 31) = 0")
    decon = textops.decontaminate(clean, bench, k=5, min_overlap=3)
    kept = clean.join(
        decon.where("NOT contaminated").select("doc_id"), "doc_id")
    stats["decontaminated"] = kept.count()

    # 6. PII scrub
    scrubbed = textops.scrub_pii(kept, "text")
    stats["pii_redactions"] = (
        scrubbed.agg(F.sum("n_redactions")).collect()[0][0])

    # 7. monitoring sketches
    stats["distinct_per_lang"] = {
        r.lang: r.estimate
        for r in sketches.hll_cardinality_by(
            kept.withColumn("url", F.col("doc_id").cast("string")),
            "url", ["lang"], p=12).collect()}
    hh = sketches.mg_summary(kept, "lang", k=8)
    stats["top_langs"] = {
        r.item: r.est for r in sketches.mg_estimates(hh).collect()}

    # 8. the clean corpus's filter for the next crawl, with lineage
    shards = build_sharded_qf(
        kept.select(F.col("doc_id").cast("string").alias("key")), "key",
        shard_bits=4, config=QFConfig(counter_bits=32,
                                      hash_name="xxhash64"),
        checkpoint_path=f"{workdir}/shards")
    stats["filter_entries"] = int(
        shards.agg(F.sum("entries")).collect()[0][0])
    stats["shard_build_secs"] = round(float(
        shards.agg(F.sum("build_secs")).collect()[0][0]), 3)

    print(json.dumps(stats))
    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01",
         sys.argv[2] if len(sys.argv) > 2 else "/tmp/qf_pipeline")
