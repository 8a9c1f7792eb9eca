"""spark-submit entry point: run one corpus/data-pipeline operator.

Companion to jobs/run_kernel.py (graph kernels) for the training-data
side of the engine:

    spark-submit --py-files planar_spark.zip jobs/run_textops.py \
        --op near_dup_clusters --docs /data/documents --output /out/clusters

Inputs: --docs (parquet with doc_id, text, lang, ...) and, for the
embedding ops, --embeddings (parquet with vec_id, embedding, label).
"""

from __future__ import annotations

import argparse
import json

from pyspark.sql import SparkSession, functions as F

OPS = (
    "dedup_exact", "minhash_lsh_pairs", "near_dup_clusters", "simhash",
    "winnow_fingerprints", "quality_score", "detect_language",
    "repetition_stats", "corpus_ngram_dedup", "top_ngrams", "doc_sample",
    "embedding_topk", "embedding_ann_topk",
)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--op", choices=OPS, required=True)
    ap.add_argument("--docs", help="documents parquet path")
    ap.add_argument("--embeddings", help="embeddings parquet path")
    ap.add_argument("--output", required=True)
    ap.add_argument("--ngram", type=int, default=3)
    ap.add_argument("--topk", type=int, default=20)
    ap.add_argument(
        "--sample-rates", default="en=50",
        help="lang=pct pairs, comma-separated (doc_sample)",
    )
    args = ap.parse_args()

    spark = SparkSession.builder.appName(f"planar_textops_{args.op}").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    from planar_spark.kernels import textops as T

    if args.op.startswith("embedding"):
        if not args.embeddings:
            ap.error("--embeddings required for embedding ops")
        emb = spark.read.parquet(args.embeddings)
        out = (
            T.embedding_topk(emb)
            if args.op == "embedding_topk"
            else T.embedding_ann_topk(emb)
        )
    else:
        if not args.docs:
            ap.error("--docs required")
        docs = spark.read.parquet(args.docs)
        if args.op == "dedup_exact":
            out = docs.groupBy(F.md5("text").alias("text_hash")).agg(
                F.min("doc_id").alias("canonical_id"),
                F.count(F.lit(1)).alias("n_copies"),
            )
        elif args.op == "minhash_lsh_pairs":
            out = T.lsh_candidate_pairs(docs)
        elif args.op == "near_dup_clusters":
            out = T.near_dup_clusters(docs)
        elif args.op == "simhash":
            out = T.simhash(docs)
        elif args.op == "winnow_fingerprints":
            out = T.winnow_fingerprints(docs)
        elif args.op == "quality_score":
            out = T.quality_score(docs)
        elif args.op == "detect_language":
            out = T.detect_language(docs)
        elif args.op == "repetition_stats":
            out = T.repetition_stats(docs)
        elif args.op == "corpus_ngram_dedup":
            out = T.corpus_ngram_dedup(docs, n=args.ngram)
        elif args.op == "top_ngrams":
            out = T.top_ngrams(docs, n=args.ngram, k=args.topk)
        else:  # doc_sample
            rates = {
                kv.split("=")[0]: int(kv.split("=")[1])
                for kv in args.sample_rates.split(",")
                if kv
            }
            out = T.sample_documents(docs, rates)

    out.write.mode("overwrite").parquet(args.output)
    print(json.dumps({"op": args.op, "output": args.output,
                      "rows": spark.read.parquet(args.output).count()}))


if __name__ == "__main__":
    main()
