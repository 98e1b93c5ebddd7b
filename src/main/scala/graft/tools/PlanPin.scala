package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Plan-drift regression pin (VERDICT r6-r8 stretch item).
  *
  * The physical-plan properties this library argues from (broadcast
  * vs shuffle joins, TakeOrderedAndProject, partial aggregation,
  * exchange counts) are pinned as OPERATOR-TREE SKELETONS in
  * `PLANPINS.txt` at the repo root: per plan line, only the indent
  * and the operator name survive — expression ids, column lists,
  * paths, and stats are stripped, so the committed hash moves exactly
  * when the plan SHAPE moves (a join strategy flips, an exchange
  * appears, a top-k degenerates to a global sort) and never from
  * expression-id churn between JVMs.
  *
  * Skeletons are taken from the INITIAL physical plan (no execution;
  * `AdaptiveSparkPlan` not yet finalized) on the sf0.001 fixture:
  * deterministic, seconds to build for all pinned queries, and
  * sufficient for drift DETECTION — the authoritative post-AQE plans
  * at sf0.01 live in PLANS.md via [[PlanDump]], which shares this
  * query list. `PlanPinSpec` recomputes the skeletons and fails on
  * any mismatch; regenerate with `sbt "runMain graft.tools.PlanPinWrite"`
  * after an INTENTIONAL plan change (and re-run PlanDump so PLANS.md
  * tells the same story).
  */
object PlanPin {
  /** The headline queries whose plans are documented and pinned —
    * execution-free to construct (loop/stream rows like
    * x1_dedup_clusters / xs_curate_stream are excluded by design:
    * their returned frame's plan is a post-materialization scan). */
  val names: Seq[String] = Seq(
    "q1_pricing_summary", "q2_join_agg", "q3_multi_join",
    "q5_range_join", "q8_global_topk", "q13_asof_join", "x1_neardup_minhash",
    "x1_embedding_neardup", "x1_simhash_pairs", "x2_ann_lsh",
    "xm_media_neighbors", "xc_sample", "xc_pipeline_full",
    "xc_bloom_decontaminate", "xt_heavy_hitters", "xt_ngram_topk",
    "s4_stream_static_join", "q6_unpivot", "q11_gap_fill", "xc_upsample",
    "q16_parts_supplier", "q18_large_volume", "q6_grouping_sets", "xc_shard",
    "s5_trending_topk", "xl_zorder_key", "q19_disjunctive_join",
    "q22_dormant_customers", "x1_fuzzy_match", "x2_outlier_score",
    "x1_substring_dup", "xm_media_neardup", "xc_keep_best",
    "x1_semantic_dedup_prod", "x1_substring_winnow_prod",
    "x2_ann_ivf_prod", "q12_ingest_controls", "q12_ingest_quote_edges", "x1_substring_dup_runs",
    "q17_small_quantity", "q20_qualifying_shippers", "q21_lone_returner",
    "q23_custdist", "q24_volume_shipping", "q25_market_share",
    "q26_product_profit", "q27_sessionize", "q28_funnel",
    "q29_returned_items", "q30_late_lines", "xc_substring_keep_best",
    "q31_revenue_delta", "q32_promo_effect", "q33_local_suppliers",
    "q34_priority_waiting", "q35_skew_join", "q36_min_cost_supplier",
    "q37_important_stock", "q38_bucketed_join",
    "xt_bm25", "xc_gopher_rules", "xc_stratified",
    "q39_shipping_priority", "xt_word_freq_score", "x2_pq_codes",
    "x2_pq_search", "x2_ivfpq_search", "x2_ivfpq_filtered", "x2_ivfpq_refined", "x4_kmv_jaccard",
    "xl_hilbert_key", "xt_hash_vectorize", "xt_hashvec_knn", "xt_hashvec_index",
    "xt_bigram_lm",
    // the persisted-tokenizer tier: plans must show the frozen-artifact
    // reads (broadcast joins against vocabulary-bounded tables, the
    // codegen replace-chain encode) with NO training lineage
    "xt_bigram_lm_persisted", "xt_bpe_encode_persisted",
    "xc_perplexity_bucket",
    // the packing tier's cost split, as tripwires: the sequence row
    // must pay exactly ONE Generate (the per-token explode) and the
    // mask row NONE (doc-level offset arithmetic only)
    "xc_pack_ids", "xc_pack_bounds",
    // the loader permutation: one shard-keyed exchange + per-shard
    // window, no global sort beyond the declared row's output orderBy,
    // ids column pruned (PlanSpec pins the column-level property)
    "xc_pack_shard",
    // DSIR: lambda broadcast-joins onto the occurrence stream (no
    // corpus re-exchange by bucket), weights window-free; the sampler
    // cuts to k rows via TakeOrderedAndProject BELOW the rank window
    "xc_dsir_weights", "xc_dsir_sample",
    // binary tier: probes broadcast in BOTH stages (the corpus never
    // shuffles), rank filter runs as a map-side WindowGroupLimit;
    // hybrid fusion: two bounded arms, the fused window on ≤2·armK rows
    "x2_binary_topk", "x2_binary_rerank", "x2_hybrid_rrf",
    // leakage audit: split labels are PROJECTIONS of the pair endpoints
    // (md5 of the id already on the row) — no third corpus scan for
    // the label attach; leakfree is loop-materialized, excluded by design
    "xc_split_leakage",
    // RETRO chunk retrieval: the same-doc exclusion rides INSIDE the
    // broadcast top-k join (a shifted-key predicate, no extra scan);
    // token budget: one grouped scan + two 1-row broadcast attaches
    "xt_chunk_neighbors", "xc_token_budget",
    // hard negatives: band predicates filter BEFORE the rank window,
    // same broadcast one-pass plan as the brute top-k; training pairs
    // compose the pair kernel + best-positive window + banded ranking
    "x2_hard_negatives", "x2_training_pairs",
    // SQ8 rerank: quantized shortlist feeds a broadcast-semi-join exact
    // re-rank — the corpus scans once per stage, never shuffles
    "x2_sq8_rerank",
    // r18 — IVF-routed negatives: the (probe, cluster) routing frame
    // must attach by BROADCAST (a shuffle flip would re-exchange the
    // assigned corpus), band predicates still filter before the rank
    // window; the composed training row inherits both properties
    "x2_hard_negatives_ivf", "x2_training_pairs_ivf",
    // r18 — detokenize: the per-doc reassembly is ONE grouped aggregate
    // over the map-only encode chain (no extra corpus scan for the
    // expected-text attach — it joins the same source scan)
    "xt_bpe_decode",
    // r19 — codec rows: one map-only codec pass over the synthesized
    // corpus each (the batched mining rows are loop-MATERIALIZED after
    // the r19 review — post-materialization scans, excluded by design
    // like the other loop/stream rows)
    "xm_gif_features", "xm_flac_features",
    // r19 — bitext mining: two probe-ranking passes + two
    // neighborhood-mean attaches (planner-chosen join side — the mean
    // tables are corpus-sized in the batched regime) + the mutual-best
    // semi-join
    "x2_bitext_mine")

  val pinFile = "PLANPINS.txt"
  val sfDir = "/root/testdata/sf0.001"

  /** Indent + operator name per plan line, nothing else. */
  def skeleton(df: DataFrame): String =
    skeletonOf(df.queryExecution.executedPlan)

  /** Same strip for an already-materialized plan (e.g. a streaming
    * micro-batch's `lastExecution.executedPlan` — [[StreamPlanPin]]). */
  def skeletonOf(plan: org.apache.spark.sql.execution.SparkPlan): String =
    plan.treeString.linesIterator.map { l =>
      val i = l.indexWhere(_.isLetter)
      if (i < 0) l
      else l.substring(0, i) + l.substring(i).takeWhile(c => c.isLetterOrDigit || c == '.')
    }.mkString("\n").trim

  def currentSkeletons(spark: SparkSession): Seq[(String, String)] =
    names.map(n => n -> skeleton(graft.SparkEntry.queries(n)(spark, sfDir)))

  def render(sk: Seq[(String, String)]): String =
    sk.map { case (n, s) => s"== $n\n$s" }.mkString("", "\n\n", "\n")

  def parse(text: String): Seq[(String, String)] =
    text.split("(?m)^== ").toSeq.filter(_.trim.nonEmpty).map { block =>
      val lines = block.linesIterator.toSeq
      lines.head.trim -> lines.tail.mkString("\n").trim
    }
}

/** Regenerate PLANPINS.txt after an intentional plan change. */
object PlanPinWrite {
  def main(a: Array[String]): Unit = {
    val spark = graft.core.GraftSession.builder("local[8]", 8).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(PlanPin.pinFile),
      PlanPin.render(PlanPin.currentSkeletons(spark)))
    println(s"WROTE ${PlanPin.pinFile}")
    spark.stop()
  }
}
