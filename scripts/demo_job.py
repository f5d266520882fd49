#!/usr/bin/env python3
"""End-to-end qfspark production job, runnable via spark-submit:

  scripts/make_pyfiles.sh qfspark.zip
  spark-submit --master 'local[8]' --py-files qfspark.zip \
      scripts/demo_job.py /root/testdata/sf0.01 /tmp/qf_demo

Pipeline: synthesize web_pages -> clean the corpus (quality + exact +
near-dup) -> build a sharded CQF over the clean urls with checkpointing
-> probe the crawl frontier for unseen urls -> print a JSON summary.
"""

import json
import sys

from pyspark.sql import SparkSession, functions as F


def main(sf_dir: str, workdir: str) -> None:
    from qfspark.build import build_sharded_qf, load_sharded_qf
    from qfspark.dedup import clean_corpus
    from qfspark.lookup import annotate, filter_unseen
    from qfspark.sizing import QFConfig
    from qfspark.webpages import synthesize

    spark = SparkSession.builder.appName("qfspark-demo").getOrCreate()

    wp = synthesize(spark, sf_dir).cache()
    n_pages = wp.count()

    clean_ids = clean_corpus(
        spark.read.parquet(f"{sf_dir}/documents.parquet"), near_dup_jaccard=0.3
    )
    clean = (
        wp.withColumn(
            "doc_id", F.regexp_extract("url", r"([0-9]+)$", 1).cast("long")
        )
        .join(clean_ids, "doc_id")  # equi-join; broadcastable small side
        .select("url")
    )
    n_clean = clean.count()

    cfg = QFConfig(counter_bits=32, hash_name="xxhash64")
    shards_df = build_sharded_qf(
        clean, "url", shard_bits=4, config=cfg,
        checkpoint_path=f"{workdir}/shards",
    )
    sharded = load_sharded_qf(shards_df)

    frontier = wp.select("url").union(
        wp.select(F.concat("url", F.lit("?v=2")).alias("url"))
    )
    fresh = filter_unseen(frontier, "url", sharded)
    annotated = annotate(wp.select("url").limit(5), "url", sharded)

    print(json.dumps({
        "pages": n_pages,
        "clean": n_clean,
        "filter_entries": sharded.entries,
        "shards": len(sharded.shards),
        "frontier": frontier.count(),
        "fresh": fresh.count(),
        "sample": [
            {"url": r.url, "seen": r.qf_seen, "count": r.qf_count}
            for r in annotated.collect()
        ],
    }))
    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01",
         sys.argv[2] if len(sys.argv) > 2 else "/tmp/qf_demo")
