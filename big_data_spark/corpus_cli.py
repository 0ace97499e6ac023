"""Corpus-preparation CLI — the training-data twin of ``main.py``'s
log workflow:

    python -m big_data_spark.corpus_cli /root/testdata/sf0.01 out/corpus

runs the composed pipeline (quality -> Gopher -> PII -> exact dedup
-> SemDeDup -> temperature mix; pipeline/corpus.py) over the
``documents``/``embeddings`` tables in the given directory, writes
the survivors as lang-partitioned parquet, and prints the per-stage
funnel as one JSON line (machine-readable, like bench.py).
"""

from __future__ import annotations

import argparse
import json

from big_data_spark.pipeline.corpus import prepare_corpus
from big_data_spark.session import get_spark


def main(argv: list[str] | None = None, spark=None) -> dict:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("sf_dir", help="directory with documents/embeddings parquet")
    parser.add_argument("out_dir", help="output directory for the prepared corpus")
    parser.add_argument(
        "--budget-frac",
        type=float,
        default=0.5,
        help="token budget as a fraction of the deduped survivors' tokens",
    )
    parser.add_argument(
        "--max-ppl",
        type=float,
        default=None,
        help="enable the bigram-LM perplexity gate: drop docs whose "
        "corpus-trained perplexity exceeds this bound",
    )
    parser.add_argument(
        "--near-dedup",
        action="store_true",
        help="enable transitive near-dup clustering (MinHash-LSH pairs "
        "closed via connected components, keep-min-id)",
    )
    parser.add_argument(
        "--neardup-index",
        default=None,
        metavar="DIR",
        help="use the incrementally maintained near-dup index at DIR "
        "(streaming/neardup_ingest.py) instead of re-banding the "
        "corpus — the continuous-ingest deployment path",
    )
    parser.add_argument(
        "--semdedup-index",
        default=None,
        metavar="DIR",
        help="use the incrementally maintained semantic-dedup index "
        "at DIR (streaming/semdedup_ingest.py) instead of re-blocking "
        "the embedding table",
    )
    parser.add_argument(
        "--chunk-tokens",
        type=int,
        default=None,
        metavar="N",
        help="explode surviving docs into sliding N-token windows "
        "(overlap via --chunk-overlap) before writing - the "
        "pre-packing splitter for long documents",
    )
    parser.add_argument(
        "--chunk-overlap",
        type=int,
        default=16,
        metavar="K",
        help="tokens shared by adjacent chunks (default 16)",
    )
    parser.add_argument(
        "--export-shards",
        type=int,
        default=None,
        metavar="N",
        help="additionally export the survivors as N deterministic "
        "globally-shuffled size-balanced training shards under "
        "<out_dir>_shards (io/shards.py)",
    )
    args = parser.parse_args(argv)

    owns_session = spark is None
    if owns_session:
        spark = get_spark(app_name="big_data_spark-corpus")
        spark.sparkContext.setLogLevel("WARN")
    try:
        keep_df = None
        if args.neardup_index is not None:
            from big_data_spark.streaming.neardup_ingest import neardup_keep

            keep_df = neardup_keep(spark, args.neardup_index)
        sem_df = None
        if args.semdedup_index is not None:
            from big_data_spark.streaming.semdedup_ingest import semdedup_keep

            sem_df = semdedup_keep(spark, args.semdedup_index)
        survivors, report = prepare_corpus(
            spark,
            args.sf_dir,
            out_dir=args.out_dir,
            budget_frac=args.budget_frac,
            max_ppl=args.max_ppl,
            near_dedup=args.near_dedup,
            neardup_keep_df=keep_df,
            semdedup_keep_df=sem_df,
            chunk_tokens=args.chunk_tokens,
            chunk_overlap=args.chunk_overlap,
        )
        funnel = {r.stage: r.n_docs for r in report.collect()}
        out = {"funnel": funnel, "out_dir": args.out_dir}
        if args.export_shards:
            from big_data_spark.io.shards import write_training_shards

            # Shard from the parquet prepare_corpus just wrote (same
            # rows, already materialized) — re-using the lazy
            # survivors plan would recompute the whole funnel.
            out["shards"] = write_training_shards(
                spark.read.parquet(args.out_dir),
                f"{args.out_dir}_shards",
                "doc_id",
                args.export_shards,
            )
        print(json.dumps(out))
        return funnel
    finally:
        if owns_session:
            spark.stop()


if __name__ == "__main__":
    main()
