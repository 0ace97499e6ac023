"""End-to-end training-corpus preparation — the composition the
individual operators exist for:

    quality filter -> Gopher repetition filter -> PII redaction ->
    exact dedup -> semantic dedup (frozen-IVF SemDeDup) ->
    temperature-weighted mixing -> partitioned parquet

Built as ONE DataFrame: every stage contributes boolean survival
columns (or a redacted projection), nothing materializes between
stages, and the funnel report is a single aggregation of those
booleans — so the whole pipeline is a handful of shuffles (the dedup
groupBys and the stats aggregates) regardless of corpus size, and
Catalyst sees it end to end (filters merge, projections prune, the
scan reads only what the survivors need).

Stage semantics are the exact contracts of the standalone operators:
the keep-buckets of text_quality/quality_gopher, pii_redact's
specific-to-loose order, keep-min-doc_id exact dedup, the SemDeDup
prune list over frozen IVF cells, and corpus_mix_temperature's
sqrt-weighted hash gate. Rates for the mix are computed over the
DEDUPED SURVIVORS (mixing before dedup would re-skew the budget
toward duplicate-heavy sources).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from big_data_spark.functions.pii import pii_redact
from big_data_spark.io.readers import parallelize_small_scan, read_table
from big_data_spark.lineage import truncate_lineage
from big_data_spark.queries.llm import (
    GOPHER_DUP_BIGRAM_MAX,
    GOPHER_TOP_BIGRAM_MAX,
    MIX_TEMP_BUDGET_FRAC,
    NEARDUP_COSINE,
    _HASH_SPACE,
    _pair_block_kernel,
    _tokens,
)
from big_data_spark.session import ensure_executor_package


def prepare_corpus(
    spark: SparkSession,
    sf_dir: str,
    out_dir: str | None = None,
    budget_frac: float = MIX_TEMP_BUDGET_FRAC,
) -> tuple[DataFrame, DataFrame]:
    """(survivors, report): the prepared corpus (doc_id, lang,
    source, redacted text, n_tokens) and a per-stage funnel report
    (stage, n_docs) over the SAME single plan. When ``out_dir`` is
    given the survivors are also written as parquet partitioned by
    lang (the downstream-training read pattern)."""
    ensure_executor_package(spark)
    docs = parallelize_small_scan(read_table(spark, sf_dir, "documents"))
    toks = _tokens()

    # --- stage 1+2: quality + repetition (narrow, zero-shuffle) ----
    n_tok = F.size(toks)
    n_distinct = F.size(F.array_distinct(toks))
    quality_ok = (n_tok >= 20) & (n_distinct / n_tok >= 0.4)
    bigrams = F.zip_with(
        F.slice("text_toks", 1, F.size("text_toks") - 1),
        F.slice("text_toks", 2, F.size("text_toks") - 1),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    acc0 = F.struct(
        F.lit("").alias("prev"),
        F.lit(0).alias("run"),
        F.lit(0).alias("top"),
        F.lit(0).alias("dup"),
    )

    def _step(acc, x):
        same = acc["prev"] == x
        run2 = F.when(same, acc["run"] + 1).otherwise(F.lit(1))
        dup2 = F.when(same, acc["dup"]).otherwise(
            acc["dup"] + F.when(acc["run"] > 1, acc["run"]).otherwise(F.lit(0))
        )
        return F.struct(
            x.alias("prev"),
            run2.alias("run"),
            F.greatest(acc["top"], run2).alias("top"),
            dup2.alias("dup"),
        )

    def _finish(acc):
        return F.struct(
            acc["top"].alias("top"),
            (
                acc["dup"]
                + F.when(acc["run"] > 1, acc["run"]).otherwise(F.lit(0))
            ).alias("dup"),
        )

    staged = docs.select(
        "doc_id",
        "lang",
        "source",
        toks.alias("text_toks"),
        n_tok.alias("n_tokens"),
        quality_ok.alias("q_ok"),
    ).withColumn(
        "rep",
        F.aggregate(F.array_sort(bigrams), acc0, _step, _finish),
    )
    total = F.col("n_tokens") - 1
    gopher_ok = (F.col("n_tokens") >= 2) & (
        F.round(F.col("rep.top") / total, 6) <= GOPHER_TOP_BIGRAM_MAX
    ) & (F.round(F.col("rep.dup") / total, 6) <= GOPHER_DUP_BIGRAM_MAX)
    # --- stage 3: PII redaction (narrow) --------------------------
    staged = staged.withColumn("gopher_ok", gopher_ok).withColumn(
        "redacted", pii_redact(F.concat_ws(" ", "text_toks"))
    )
    # --- stage 4: exact dedup (one shuffle) -----------------------
    w_keep = F.min("doc_id").over(Window.partitionBy(F.md5("redacted")))
    staged = staged.withColumn("exact_keep", F.col("doc_id") == w_keep)
    staged = truncate_lineage(staged)

    # --- stage 5: semantic dedup prune list (cell-blocked) --------
    from big_data_spark.operators.ann import ivf_cell_from_dists, ivf_dists_expr
    from big_data_spark.operators.ivf_centroids import IVF_CENTROIDS

    emb = parallelize_small_scan(read_table(spark, sf_dir, "embeddings"))
    assigned = truncate_lineage(
        emb.select(
            "vec_id", "embedding", ivf_dists_expr(IVF_CENTROIDS).alias("dists")
        ).select(
            "vec_id", "embedding", ivf_cell_from_dists("dists").alias("cell")
        )
    )
    cand = assigned.groupBy("cell").applyInPandas(
        _pair_block_kernel, "id_a bigint, id_b bigint"
    )
    dropped = cand.select(F.col("id_b").alias("doc_id")).distinct()
    staged = staged.join(
        dropped.withColumn("sem_drop", F.lit(True)), "doc_id", "left"
    ).withColumn("sem_keep", F.col("sem_drop").isNull()).drop("sem_drop")

    # --- stage 6: temperature mix over the deduped survivors ------
    surv = (
        F.col("q_ok")
        & F.col("gopher_ok")
        & F.col("exact_keep")
        & F.col("sem_keep")
    )
    staged = staged.withColumn("surv", surv)
    per_src = (
        staged.filter("surv").groupBy("source").agg(F.sum("n_tokens").alias("m"))
    )
    wcol = F.sqrt(F.col("m").cast("double"))
    tot = per_src.agg(
        F.sum("m").alias("corpus_tokens"),
        F.aggregate(
            F.array_sort(F.collect_list(F.struct(F.col("source"), wcol.alias("w")))),
            F.lit(0.0),
            lambda acc, x: acc + x["w"],
        ).alias("w_total"),
    )
    rated = per_src.crossJoin(F.broadcast(tot)).select(
        "source",
        F.least(
            F.lit(1.0),
            (
                (F.sqrt(F.col("m").cast("double")) / F.col("w_total"))
                * (F.col("corpus_tokens").cast("double") * budget_frac)
            )
            / F.col("m").cast("double"),
        ).alias("rate"),
    )
    u = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10
    ).cast("bigint") / F.lit(_HASH_SPACE)
    staged = staged.join(F.broadcast(rated), "source", "left").withColumn(
        "mix_keep", F.col("surv") & (u < F.coalesce(F.col("rate"), F.lit(0.0)))
    )
    staged = truncate_lineage(staged)

    survivors = staged.filter("mix_keep").select(
        "doc_id", "lang", "source", F.col("redacted").alias("text"), "n_tokens"
    )
    report = (
        staged.agg(
            F.count(F.lit(1)).alias("0_input"),
            F.sum(F.col("q_ok").cast("long")).alias("1_quality"),
            F.sum((F.col("q_ok") & F.col("gopher_ok")).cast("long")).alias(
                "2_gopher"
            ),
            F.sum(
                (F.col("q_ok") & F.col("gopher_ok") & F.col("exact_keep")).cast(
                    "long"
                )
            ).alias("3_exact_dedup"),
            F.sum(F.col("surv").cast("long")).alias("4_semantic_dedup"),
            F.sum(F.col("mix_keep").cast("long")).alias("5_mixed"),
        )
        .selectExpr(
            "stack(6, '0_input', `0_input`, '1_quality', `1_quality`, "
            "'2_gopher', `2_gopher`, '3_exact_dedup', `3_exact_dedup`, "
            "'4_semantic_dedup', `4_semantic_dedup`, '5_mixed', `5_mixed`) "
            "AS (stage, n_docs)"
        )
    )
    if out_dir is not None:
        survivors.write.mode("error").partitionBy("lang").parquet(out_dir)
    return survivors, report
