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
    _tokens,
)
from big_data_spark.operators.blockpairs import chunked_pair_candidates
from big_data_spark.session import ensure_executor_package


def prepare_corpus(
    spark: SparkSession,
    sf_dir: str,
    out_dir: str | None = None,
    budget_frac: float = MIX_TEMP_BUDGET_FRAC,
    max_ppl: float | None = None,
    near_dedup: bool = False,
    neardup_keep_df: DataFrame | None = None,
    semdedup_keep_df: DataFrame | None = None,
    chunk_tokens: int | None = None,
    chunk_overlap: int = 16,
) -> tuple[DataFrame, DataFrame]:
    """(survivors, report): the prepared corpus (doc_id, lang,
    source, redacted text, n_tokens) and a per-stage funnel report
    (stage, n_docs) over the SAME single plan. When ``out_dir`` is
    given the survivors are also written as parquet partitioned by
    lang (the downstream-training read pattern).

    Optional stages (both off by default — each adds wide work):

    - ``max_ppl``: bigram-LM perplexity filter (the CCNet-style
      statistical quality gate next to the heuristic ones) — drop
      docs whose corpus-trained add-one bigram perplexity exceeds
      the bound. Adds the LM count aggregates + two joins.
    - ``near_dedup``: MinHash-LSH pairs closed into clusters via
      connected components, keep-min-doc_id — the fuzzy sibling of
      the exact-dedup stage, run AFTER it so verbatim copies never
      reach the (more expensive) banding. Adds the LSH joins and the
      iterative component closure (multi-action, unlike every other
      stage — the price of transitive near-dup semantics).

    ``neardup_keep_df`` replaces the batch LSH closure with a
    PRECOMPUTED (doc_id, near_keep) frame — the incrementally
    maintained index (streaming/neardup_ingest.neardup_keep), so a
    continuously-ingesting deployment runs the pipeline without
    re-banding the corpus. Docs absent from the frame keep True
    (they were filtered out before the stage ever saw them).
    ``semdedup_keep_df`` does the same for the semantic stage with
    the incremental frozen-IVF index
    (streaming/semdedup_ingest.semdedup_keep; vec_id == doc_id).
    Nuance: the batch stage drops on the kernel's threshold-minus-
    margin candidates, the index on the exact re-scored threshold —
    identical unless a pair's cosine lands inside the 1e-4 margin
    band."""
    ensure_executor_package(spark)
    staged = _stage_through_exact(spark, sf_dir, max_ppl)

    # --- optional: near-dup cluster dedup (LSH -> components) -----
    if neardup_keep_df is not None:
        staged = staged.join(
            F.broadcast(neardup_keep_df.select("doc_id", "near_keep")),
            "doc_id",
            "left",
        ).withColumn("near_keep", F.coalesce("near_keep", F.lit(True)))
        near_dedup = True
    elif near_dedup:
        from big_data_spark.operators.components import connected_components
        from big_data_spark.queries.llm import minhash_lsh_pairs

        pairs = minhash_lsh_pairs(
            neardup_stage_docs(spark, sf_dir, max_ppl=max_ppl, _staged=staged)
        ).select("doc_a", "doc_b")
        cc = connected_components(pairs, src="doc_a", dst="doc_b")
        near_drop = (
            cc.filter(F.col("id") != F.col("component"))
            .select(F.col("id").alias("doc_id"))
            .withColumn("_nd", F.lit(True))
        )
        staged = staged.join(near_drop, "doc_id", "left").withColumn(
            "near_keep", F.col("_nd").isNull()
        ).drop("_nd")
    return _finish_corpus(
        spark,
        sf_dir,
        staged,
        out_dir,
        budget_frac,
        max_ppl,
        near_dedup,
        semdedup_keep_df=semdedup_keep_df,
        chunk_tokens=chunk_tokens,
        chunk_overlap=chunk_overlap,
    )


def _neardup_pre(max_ppl: float | None):
    """Survival predicate of every stage BEFORE near-dedup — the
    docs the banding stage actually sees."""
    pre = F.col("q_ok") & F.col("gopher_ok") & F.col("exact_keep")
    if max_ppl is not None:
        pre = pre & F.col("ppl_ok")
    return pre


def neardup_stage_docs(
    spark: SparkSession,
    sf_dir: str,
    max_ppl: float | None = None,
    _staged: DataFrame | None = None,
) -> DataFrame:
    """The near-dedup stage's exact input: (doc_id, text) of every
    doc surviving quality/Gopher/(perplexity)/exact-dedup, with text
    already PII-redacted. Public so the INCREMENTAL ingest
    (streaming/neardup_ingest.py) can be fed the same docs the batch
    stage bands — the parity contract between the two paths."""
    staged = (
        _staged
        if _staged is not None
        else _stage_through_exact(spark, sf_dir, max_ppl)
    )
    return staged.filter(_neardup_pre(max_ppl)).select(
        "doc_id", F.col("redacted").alias("text")
    )


def _stage_through_exact(
    spark: SparkSession, sf_dir: str, max_ppl: float | None
) -> DataFrame:
    """Stages 1-4 (quality, Gopher repetition, PII redaction,
    optional perplexity gate, exact dedup) as one staged frame with
    survival-flag columns."""
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
    # --- optional: bigram-LM perplexity gate (CCNet-style) --------
    if max_ppl is not None:
        bge = staged.select(
            "doc_id", F.explode(bigrams).alias("bg")
        ).withColumn("ctx", F.substring_index("bg", " ", 1))
        bge = truncate_lineage(bge)
        bgc = bge.groupBy("bg").agg(F.count(F.lit(1)).alias("cb"))
        uni = (
            staged.select(F.explode("text_toks").alias("ctx"))
            .groupBy("ctx")
            .agg(F.count(F.lit(1)).alias("cu"))
        )
        vocab = uni.agg(F.count(F.lit(1)).cast("double").alias("v"))
        ppl = (
            bge.join(bgc, "bg")
            .join(uni, "ctx")
            .crossJoin(F.broadcast(vocab))
            .groupBy("doc_id")
            .agg(
                F.exp(
                    F.avg(
                        F.log(F.col("cu") + F.col("v"))
                        - F.log(F.col("cb") + F.lit(1.0))
                    )
                ).alias("_ppl")
            )
        )
        staged = staged.join(ppl, "doc_id", "left").withColumn(
            "ppl_ok", F.coalesce(F.col("_ppl") <= F.lit(max_ppl), F.lit(False))
        ).drop("_ppl")

    # --- stage 4: exact dedup (one shuffle) -----------------------
    w_keep = F.min("doc_id").over(Window.partitionBy(F.md5("redacted")))
    staged = staged.withColumn("exact_keep", F.col("doc_id") == w_keep)
    return truncate_lineage(staged)


def _finish_corpus(
    spark: SparkSession,
    sf_dir: str,
    staged: DataFrame,
    out_dir: str | None,
    budget_frac: float,
    max_ppl: float | None,
    near_dedup: bool,
    semdedup_keep_df: DataFrame | None = None,
    chunk_tokens: int | None = None,
    chunk_overlap: int = 16,
) -> tuple[DataFrame, DataFrame]:
    """Stages 5-6 (semantic dedup, temperature mix) + the funnel
    report over a staged frame that already carries the earlier
    stages' survival flags."""
    # --- stage 5: semantic dedup prune list (cell-blocked) --------
    if semdedup_keep_df is not None:
        # Precomputed (vec_id, sem_keep) from the incremental index
        # (streaming/semdedup_ingest.semdedup_keep); vec_id is the
        # documents' doc_id. Docs absent from the frame keep True.
        staged = staged.join(
            F.broadcast(
                semdedup_keep_df.select(
                    F.col("vec_id").alias("doc_id"), "sem_keep"
                )
            ),
            "doc_id",
            "left",
        ).withColumn("sem_keep", F.coalesce("sem_keep", F.lit(True)))
    else:
        from big_data_spark.operators.ann import (
            ivf_cell_from_dists,
            ivf_dists_expr,
        )
        from big_data_spark.operators.ivf_centroids import IVF_CENTROIDS

        emb = parallelize_small_scan(read_table(spark, sf_dir, "embeddings"))
        assigned = truncate_lineage(
            emb.select(
                "vec_id",
                "embedding",
                ivf_dists_expr(IVF_CENTROIDS).alias("dists"),
            ).select(
                "vec_id", "embedding", ivf_cell_from_dists("dists").alias("cell")
            )
        )
        cand = chunked_pair_candidates(assigned, ["cell"])
        dropped = cand.select(F.col("id_b").alias("doc_id")).distinct()
        staged = staged.join(
            dropped.withColumn("sem_drop", F.lit(True)), "doc_id", "left"
        ).withColumn("sem_keep", F.col("sem_drop").isNull()).drop("sem_drop")

    # --- stage 6: temperature mix over the deduped survivors ------
    # Ordered survival flags; the funnel report below is generated
    # from this list, so optional stages slot in without renumbering
    # by hand (default config keeps the historical stage names).
    stage_flags = [("quality", "q_ok"), ("gopher", "gopher_ok")]
    if max_ppl is not None:
        stage_flags.append(("perplexity", "ppl_ok"))
    stage_flags.append(("exact_dedup", "exact_keep"))
    if near_dedup:
        stage_flags.append(("near_dedup", "near_keep"))
    stage_flags.append(("semantic_dedup", "sem_keep"))
    surv = F.lit(True)
    for _, c in stage_flags:
        surv = surv & F.col(c)
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
    if chunk_tokens is not None:
        # Final transform: sliding-window chunking of the surviving
        # (already redacted/deduped/mixed) docs — the long-document
        # splitter before sequence packing; same policy as
        # queries/llm.q_doc_chunks (one chunk per short doc, windows
        # of chunk_tokens advancing by chunk_tokens - chunk_overlap).
        # Pure JVM HOFs + one posexplode: a narrow map, the funnel
        # report stays doc-grained above it.
        from big_data_spark.queries.llm import chunk_explode

        survivors = chunk_explode(
            survivors.withColumn("_toks", F.split(F.col("text"), " ")),
            "_toks",
            chunk_tokens,
            chunk_overlap,
            ["doc_id", "lang", "source"],
        ).select(
            "doc_id",
            F.col("chunk_id").cast("int").alias("chunk_id"),
            "lang",
            "source",
            F.array_join("_chunk", " ").alias("text"),
            F.size("_chunk").alias("n_tokens"),
        )
    agg_exprs = [F.count(F.lit(1)).alias("0_input")]
    names = ["0_input"]
    cum = F.lit(True)
    for i, (stage_name, c) in enumerate(stage_flags, start=1):
        cum = cum & F.col(c)
        alias = f"{i}_{stage_name}"
        agg_exprs.append(F.sum(cum.cast("long")).alias(alias))
        names.append(alias)
    mixed = f"{len(stage_flags) + 1}_mixed"
    agg_exprs.append(F.sum(F.col("mix_keep").cast("long")).alias(mixed))
    names.append(mixed)
    stack = ", ".join(f"'{n}', `{n}`" for n in names)
    report = staged.agg(*agg_exprs).selectExpr(
        f"stack({len(names)}, {stack}) AS (stage, n_docs)"
    )
    if out_dir is not None:
        survivors.write.mode("error").partitionBy("lang").parquet(out_dir)
    return survivors, report
