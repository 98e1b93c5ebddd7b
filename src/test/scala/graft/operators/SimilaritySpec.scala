package graft.operators

import graft.SparkSpec
import graft.core.Tables

class SimilaritySpec extends SparkSpec {

  test("brute-force topk: nearest neighbor of a planted near-dup is the original") {
    import spark.implicits._
    val rnd = new scala.util.Random(5)
    def vec() = Array.fill(32)(rnd.nextGaussian().toFloat)
    val a = vec()
    val aJit = a.map(x => x + 0.02f * rnd.nextGaussian().toFloat)
    val emb = (Seq((0L, a), (1L, aJit)) ++ (2L to 30L).map(_ -> vec()))
      .toDF("vec_id", "embedding")
    val top = Similarity.cosineTopK(emb, emb.filter($"vec_id" === 0), 3).collect()
    assert(top.head.getLong(2) == 1L && top.head.getDouble(3) > 0.99)
  }

  test("sq8TopK: quantization is real (sims move) yet top-k recall vs brute stays high") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    def vec() = Array.fill(32)(rnd.nextGaussian().toFloat)
    val emb = (0L to 60L).map(_ -> vec()).toDF("vec_id", "embedding")
    val probes = emb.filter($"vec_id" < 5)
    val brute = Similarity.cosineTopK(emb, probes, 5)
      .select($"probe_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    val sq = Similarity.sq8TopK(emb, probes, 5)
    val sqPairs = sq.select($"probe_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    // int8 on a [min,max] grid is a fine quantizer: recall@5 stays high
    val recall = (sqPairs & brute).size.toDouble / brute.size
    assert(recall >= 0.8, s"sq8 recall $recall")
    // but it IS lossy — the similarity values must have moved
    val bruteSims = Similarity.cosineTopK(emb, probes, 5)
      .select($"probe_id", $"neighbor_id", $"sim").as[(Long, Long, Double)]
      .collect().map(t => (t._1, t._2) -> t._3).toMap
    val moved = sq.select($"probe_id", $"neighbor_id", $"sim").as[(Long, Long, Double)]
      .collect().count(t => bruteSims.get((t._1, t._2)).exists(b => b != t._3))
    assert(moved > 0, "sq8 sims identical to full precision: quantization is a no-op")
  }

  test("sq8 persisted store: bit-identical serving from genuinely 1-byte-per-dim codes") {
    import spark.implicits._
    val emb = graft.core.Tables.load(spark, sf("sf0.001"), "embeddings")
    val probes = emb.filter($"vec_id" < 5)
    val dir = java.nio.file.Files.createTempDirectory("sq8").toString
    Similarity.buildSq8(emb, dir)
    // the stored codes are BINARY, one byte per dimension — the 4×
    // storage claim, checked on the artifact itself
    val codes = spark.read.parquet(s"$dir/codes")
    assert(codes.schema("codes").dataType ==
      org.apache.spark.sql.types.BinaryType)
    val dim = emb.select(org.apache.spark.sql.functions.size($"embedding"))
      .as[Int].head()
    assert(codes.select(org.apache.spark.sql.functions.octet_length($"codes"))
      .as[Int].head() == dim)
    // serving from the store is bit-identical to the composed search
    val got = Similarity.searchSq8(spark, dir, probes, 5)
      .orderBy($"probe_id", $"rnk").collect().toSeq
    val want = Similarity.sq8TopK(emb, probes, 5)
      .orderBy($"probe_id", $"rnk").collect().toSeq
    assert(got == want)
  }

  test("ANN-LSH recovers the planted neighbor through bucket pruning") {
    import spark.implicits._
    val rnd = new scala.util.Random(9)
    def vec() = Array.fill(32)(rnd.nextGaussian().toFloat)
    val a = vec()
    val aJit = a.map(x => x + 0.01f * rnd.nextGaussian().toFloat)
    val emb = (Seq((0L, a), (1L, aJit)) ++ (2L to 60L).map(_ -> vec()))
      .toDF("vec_id", "embedding")
    val top = Similarity.annTopK(emb, emb.filter($"vec_id" === 0), 32, 3).collect()
    assert(top.nonEmpty && top.head.getLong(2) == 1L, top.mkString(";"))
  }

  test("IVF ANN recovers the planted neighbor while scanning a corpus subset") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    def vec() = Array.fill(32)(rnd.nextGaussian().toFloat)
    val a = vec()
    val aJit = a.map(x => x + 0.01f * rnd.nextGaussian().toFloat)
    val emb = (Seq((0L, a), (1L, aJit)) ++ (2L to 99L).map(_ -> vec()))
      .toDF("vec_id", "embedding")
    val top = Similarity.ivfTopK(emb, emb.filter($"vec_id" === 0),
      nlist = 8, nprobe = 2, k = 3).collect()
    assert(top.nonEmpty && top.head.getLong(2) == 1L, top.mkString(";"))
    // pruning is real: probe+planted share a cluster but the candidate
    // pool is far smaller than the corpus
    val assigned = Similarity.ivfAssign(emb, 8)
    val clusterOfProbe = assigned.filter($"vec_id" === 0).select("cluster").as[Long].head()
    val poolSize = assigned.filter($"cluster" === clusterOfProbe).count()
    assert(poolSize < 60, s"pool $poolSize of 100")
  }

  test("annBoundSummary booleans actually flip on a recall/pruning regression") {
    import spark.implicits._
    val emb = Tables.load(spark, sf("sf0.001"), "embeddings")
    val probes = emb.filter($"vec_id" < 5)
    val brute = Similarity.cosineTopK(emb, probes, 3)
    val allPairs = probes.select($"vec_id".as("probe_id"))
      .crossJoin(emb.select($"vec_id".as("neighbor_id")))
      .filter($"probe_id" =!= $"neighbor_id")
    def row(ann: org.apache.spark.sql.DataFrame, cand: org.apache.spark.sql.DataFrame) =
      Similarity.annBoundSummary(ann, brute, cand, emb, probes,
        k = 3, recallFloor = 0.2, maxCandidateFrac = 0.6).collect().head
    // perfect ann (= brute), tiny candidate set → both bounds hold
    val good = row(brute, brute.select($"probe_id", $"neighbor_id"))
    assert(good.getAs[Boolean]("recall_ok") && good.getAs[Boolean]("pruned_ok"))
    // broken banding (no overlap with brute) → recall flips false;
    // no pruning (all pairs are candidates) → pruned flips false
    val badAnn = brute.withColumn("neighbor_id", $"neighbor_id" + 1000000L)
    val bad = row(badAnn, allPairs)
    assert(!bad.getAs[Boolean]("recall_ok") && !bad.getAs[Boolean]("pruned_ok"))
  }

  test("ANN candidate set on the fixture is a strict subset of the corpus (pruning is real)") {
    import spark.implicits._
    val emb = Tables.load(spark, sf("sf0.001"), "embeddings")
    val probes = emb.filter($"vec_id" < 5)
    val n = emb.count()
    val cands = Similarity.annCandidates(
      Similarity.signatures(emb, 64), Similarity.signatures(probes, 64))
    val perProbe = cands.groupBy($"probe_id").count().collect()
    assert(perProbe.forall(_.getLong(1) < n))
  }

  test("label outliers: a planted far vector ranks first in its label") {
    import spark.implicits._
    // label 0: 20 tight vectors near (1, 0, ...) + one pointing the
    // opposite way; label 1: its own tight cluster (must not mix)
    def v(x: Float, y: Float) = Array.fill(8)(0f).updated(0, x).updated(1, y)
    val rows =
      (0L until 20L).map(i => (i, v(1f, 0.01f * i), 0)) ++
        Seq((99L, v(-1f, 0f), 0)) ++
        (100L until 110L).map(i => (i, v(0f, 1f), 1))
    val emb = rows.toDF("vec_id", "embedding", "label")
    val out = Similarity.labelOutliers(emb, 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(3)))
    // rank 1 of label 0 is the planted outlier
    assert(out.contains((0L, 99L, 1)), out.mkString(", "))
    // exactly 3 per label with >=3 members, ranks dense
    val byLabel = out.groupBy(_._1)
    assert(byLabel(0L).map(_._3).sorted.toSeq == Seq(1, 2, 3))
    assert(byLabel(1L).map(_._3).sorted.toSeq == Seq(1, 2, 3))
    // empty input: empty output with the declared schema, no exception
    val empty = Seq.empty[(Long, Array[Float], Int)]
      .toDF("vec_id", "embedding", "label")
    assert(Similarity.labelOutliers(empty).count() == 0)
    // the driver-side centroid collect is guarded by label cardinality:
    // above maxLabels the operator refuses rather than collecting
    val ex = intercept[IllegalArgumentException] {
      Similarity.labelOutliers(emb, 3, maxLabels = 1)
    }
    assert(ex.getMessage.contains("maxLabels"))
  }

  test("pqCodes: dense in-range codes, deterministic, error shrinks with Lloyd rounds") {
    import spark.implicits._
    // two tight clusters per subspace half so codewords have structure
    def v(seed: Int) = Array.tabulate(8)(i =>
      (if (seed % 2 == 0) 1f else -1f) * (1f + 0.01f * ((seed + i) % 5)))
    val emb = (0L until 40L).map(i => (i, v(i.toInt))).toDF("vec_id", "embedding")
    val out = Similarity.pqCodes(emb, m = 2, k = 4, iters = 1).collect()
    assert(out.length == 40)
    out.foreach { r =>
      assert((1 to 2).forall(s => r.getInt(s) >= 0 && r.getInt(s) < 4), r.toString)
      assert(r.getDouble(3) >= 0.0)
    }
    // deterministic replay
    val again = Similarity.pqCodes(emb, m = 2, k = 4, iters = 1).collect()
    assert(out.map(_.toString).sorted.toSeq == again.map(_.toString).sorted.toSeq)
    // Lloyd refinement cannot increase total reconstruction error on
    // this well-separated corpus
    import org.apache.spark.sql.functions.{col, sum}
    def totalErr(iters: Int) = Similarity.pqCodes(emb, 2, 4, iters)
      .agg(sum(col("err"))).collect().head.getDouble(0)
    assert(totalErr(1) <= totalErr(0) + 1e-9, s"${totalErr(0)} -> ${totalErr(1)}")
  }

  test("pqSearch: ADC retrieval stays within the probe's cluster") {
    import spark.implicits._
    // two well-separated clusters: codes must separate them, so every
    // probe's top-k is entirely same-cluster
    def v(cluster: Int, j: Int) = Array.tabulate(8)(i =>
      (if (cluster == 0) 1f else -1f) * (1f + 0.01f * ((j + i) % 5)))
    val emb = ((0L until 20L).map(i => (i, v(0, i.toInt))) ++
      (20L until 40L).map(i => (i, v(1, i.toInt)))).toDF("vec_id", "embedding")
    import org.apache.spark.sql.functions.col
    val probes = emb.filter(col("vec_id") === 3L || col("vec_id") === 25L)
    val out = Similarity.pqSearch(emb, probes, m = 2, k = 4, iters = 1, topK = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
    assert(out.length == 10)
    // per-probe: 5 dense ranks, adist non-decreasing, same-cluster hits
    out.groupBy(_._1).foreach { case (probe, rs) =>
      val sorted = rs.sortBy(_._3)
      assert(sorted.map(_._3).toSeq == (1 to 5), s"probe $probe ranks")
      assert(sorted.map(_._4).sliding(2).forall(p => p.head <= p.last + 1e-12))
      val cluster = if (probe < 20) (0L until 20L) else (20L until 40L)
      assert(sorted.forall(r => cluster.contains(r._2)),
        s"probe $probe escaped its cluster: $sorted")
    }
  }

  test("TopKMinAgg: bounded top-k equals the row_number window formulation, ties included") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    // adversarial: duplicated keys (ties broken by id), groups smaller
    // than k, values arriving in descending order, many partitions so
    // merge() runs for real
    val rnd = new scala.util.Random(7)
    val rows = (0L until 2000L).map { i =>
      (i % 7, rnd.nextInt(20).toDouble, i) // (grp, key with many ties, id)
    } ++ Seq((99L, 1.0, 100001L), (99L, 1.0, 100000L)) // 2-row group, tied keys
    val df = rows.toDF("grp", "key", "id").repartition(16)
    val k = 5
    val agg = udaf(new graft.functions.TopKMinAgg(k))
    val viaAgg = df.groupBy($"grp")
      .agg(agg($"key", $"id").as("top"))
      .select($"grp", $"top.key".as("ds"),
        posexplode($"top.id").as(Seq("pos", "id")))
      .select($"grp", $"id", ($"pos" + 1).as("rnk"),
        element_at($"ds", $"pos" + 1).as("key"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3))).toSet
    val w = Window.partitionBy($"grp").orderBy($"key", $"id")
    val viaWindow = df.withColumn("rnk", row_number().over(w))
      .filter($"rnk" <= k).select($"grp", $"id", $"rnk", $"key")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3))).toSet
    assert(viaAgg == viaWindow)
  }

  test("pqSearch plan: bounded partial aggregation, no per-probe rank window") {
    import org.apache.spark.sql.functions.col
    val emb = Tables.load(spark, sf("sf0.001"), "embeddings")
    val plan = Similarity.pqSearch(emb, emb.filter(col("vec_id") < 10))
      .queryExecution.executedPlan.treeString
    // the r10 verdict's scale gap: a row_number window over codes×probes
    // shuffles ~the corpus to each of a handful of probe reducers; the
    // bounded Aggregator must keep the plan window-free with a partial
    // (map-side) aggregation so the exchange carries ≤ parts×probes×k
    assert(!plan.contains("Window"), plan)
    assert(plan.contains("ObjectHashAggregate"), plan)
    assert(plan.contains("partial_topkminagg"), plan)
  }

  test("ivfPqSearch: pruned ADC retrieval stays in-cluster and prunes for real") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // two well-separated bundles (same fixture as the pqSearch test):
    // IVF routing must keep each probe inside its own bundle's lists
    def v(cluster: Int, j: Int) = Array.tabulate(8)(i =>
      (if (cluster == 0) 1f else -1f) * (1f + 0.01f * ((j + i) % 5)))
    val emb = ((0L until 20L).map(i => (i, v(0, i.toInt))) ++
      (20L until 40L).map(i => (i, v(1, i.toInt)))).toDF("vec_id", "embedding")
    val probes = emb.filter(col("vec_id") === 3L || col("vec_id") === 25L)
    val out = Similarity.ivfPqSearch(emb, probes, nlist = 8, nprobe = 2,
        m = 2, k = 4, iters = 1, topK = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
    assert(out.length == 10)
    out.groupBy(_._1).foreach { case (probe, rs) =>
      val sorted = rs.sortBy(_._3)
      assert(sorted.map(_._3).toSeq == (1 to 5), s"probe $probe ranks")
      assert(sorted.map(_._4).sliding(2).forall(p => p.head <= p.last + 1e-12))
      val cluster = if (probe < 20) (0L until 20L) else (20L until 40L)
      assert(sorted.forall(r => cluster.contains(r._2)),
        s"probe $probe escaped its bundle: $sorted")
    }
    // pruning is real: the candidate pool each probe's ADC pass scans is
    // the probed lists only — strictly smaller than the corpus
    val cents = Similarity.centroids(emb, 8)
    val assigned = Similarity.ivfAssignWith(emb, cents)
      .select(col("vec_id"), col("cluster"))
    val pool = Similarity.ivfProbeClusters(probes, cents, 2)
      .select(col("probe_id"), col("cluster"))
      .join(assigned, Seq("cluster")).count()
    assert(pool < 2 * 40, s"candidate pool $pool of ${2 * 40} probe-corpus pairs")
    // plan shape: bounded agg (no window), candidates via broadcast join
    val plan = Similarity.ivfPqSearch(emb, probes, 8, 2, 2, 4, 1, 5)
      .queryExecution.executedPlan.treeString
    assert(!plan.contains("Window"), plan)
    assert(plan.contains("partial_topkminagg"), plan)
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("ivfPqSearchFiltered: pre-filter equals post-filtering an unbounded ADC " +
      "ranking; the predicate is map-only on the codes") {
    import org.apache.spark.sql.functions.col
    val emb = Tables.load(spark, sf("sf0.001"), "embeddings")
    val probes = emb.filter(col("vec_id") < 10)
    val labels = emb.select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getAs[Number](1).longValue).toMap
    val got = Similarity.ivfPqSearchFiltered(emb, probes,
        col("label") === 3, Seq("label"), 16, 4, 4, 16, 1, 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
    // every neighbor satisfies the predicate
    assert(got.nonEmpty && got.forall(r => labels(r._2) == 3L), got.take(5).toSeq)
    // EQUIVALENCE: a candidate's ADC distance is filter-independent, so
    // pre-filtering must equal post-filtering the unbounded ranking —
    // rank the full candidate pool (topK >> pool), keep label 3, re-rank
    val full = Similarity.ivfPqSearch(emb, probes, 16, 4, 4, 16, 1, topK = 100000)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(3)))
    val want = full.filter(r => labels(r._2) == 3L)
      .groupBy(_._1).toSeq.flatMap { case (p, rs) =>
        rs.sortBy(r => (r._3, r._2)).take(5).zipWithIndex
          .map { case (r, i) => (p, r._2, i + 1, r._3) }
      }.toSet
    assert(got.toSet == want,
      s"pre/post-filter divergence: ${(got.toSet -- want).take(3)} vs ${(want -- got.toSet).take(3)}")
    // the filter never starves below topK here, and within-probe order
    // is by (adist, vec_id)
    got.groupBy(_._1).foreach { case (p, rs) =>
      assert(rs.length == 5, s"probe $p returned ${rs.length}")
      val sorted = rs.sortBy(_._3)
      assert(sorted.map(_._4).sliding(2).forall(x => x.head <= x.last + 1e-12), s"probe $p order")
    }
    // plan: the predicate is a Filter on the codes lineage, not a join —
    // exactly one join kind appears (the broadcast probe-routes join)
    val plan = Similarity.ivfPqSearchFiltered(emb, probes,
        col("label") === 3, Seq("label"), 16, 4, 4, 16, 1, 5)
      .queryExecution.executedPlan.treeString
    assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"), plan)
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("ivfPqRefine: exact re-rank converts shortlist depth into recall (tolerance metric)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // DISTANCE-TOLERANCE recall: a hit = retrieved vector within
    // (1+1e-9) of the true 5th-NN distance. Set-overlap recall is
    // ill-conditioned on this fixture: near-duplicate embedding
    // clusters make the "true" top-5 among ~equal candidates a
    // 1e-13-float-association coin flip, so two correct engines can
    // disagree on half the set while retrieving equally-near vectors
    // (measured: overlap recall said refined@50 < refined@20, which is
    // impossible for a correct refine over nested shortlists — the
    // metric, not the engine, was broken).
    val emb = graft.core.Tables.load(spark, sf("sf0.001"), "embeddings")
      .select(col("vec_id"), col("embedding"))
    val probes = emb.filter(col("vec_id") < 10)
    val corpusArr = emb.as[(Long, Array[Float])].collect()
    val corpus = corpusArr.toMap
    def l2(p: Array[Float], c: Array[Float]): Double = {
      var pp = 0.0; var pc = 0.0; var cc = 0.0; var i = 0
      while (i < p.length) { pp += p(i).toDouble*p(i); pc += p(i).toDouble*c(i); cc += c(i).toDouble*c(i); i += 1 }
      pp - 2.0*pc + cc
    }
    val k = 5
    val dk = (0L until 10L).map { p =>
      p -> corpusArr.map { case (_, cv) => l2(corpus(p), cv) }.sorted.apply(k - 1)
    }.toMap
    def recTol(df: org.apache.spark.sql.DataFrame): Double = {
      val got = df.select($"probe_id", $"vec_id").as[(Long, Long)].collect()
      got.count { case (p, id) => l2(corpus(p), corpus(id)) <= dk(p) * (1 + 1e-9) + 1e-12 }
        .toDouble / (10 * k)
    }
    val adc = recTol(Similarity.ivfPqSearch(emb, probes, 16, 4, 4, 16, 1, k))
    val r20 = recTol(Similarity.ivfPqRefine(emb, probes, 16, 4, 4, 16, 1, 20, k))
    val r50 = recTol(Similarity.ivfPqRefine(emb, probes, 16, 4, 4, 16, 1, 50, k))
    info(f"tolerance recall@$k: ADC order $adc%.2f, refined@20 $r20%.2f, refined@50 $r50%.2f")
    // measured (deterministic): adc 0.42, refined@20 0.76, refined@50
    // 0.94 (sf0.01: 0.44 / 0.78 / 0.92) — floors pinned with margin
    assert(r20 >= adc + 0.2, f"refine did not beat ADC order: $r20%.2f vs $adc%.2f")
    assert(r20 >= 0.60, f"refined@20 recall $r20%.2f below floor 0.60")
    assert(r50 >= r20, f"deeper shortlist lowered recall: $r50%.2f < $r20%.2f")
    assert(r50 >= 0.85, f"refined@50 recall $r50%.2f below floor 0.85")
  }

  test("kmeans: Lloyd refinement recovers planted clusters from bad seeds") {
    import spark.implicits._
    // two tight, well-separated bundles; BOTH seeds (first 2 by vec_id)
    // land in bundle A, so only the Lloyd rounds can pull a centroid
    // over to bundle B — iters=0 cannot separate them, iters=2 must
    def v(x: Float, y: Float, jit: Float) =
      Array.fill(8)(0f).updated(0, x + jit).updated(1, y + jit)
    val rows =
      (0L until 10L).map(i => (i, v(1f, 0f, 0.001f * i))) ++
        (10L until 20L).map(i => (i, v(0f, 1f, 0.001f * i)))
    val emb = rows.toDF("vec_id", "embedding")
    val seeded = Similarity.kmeansAssign(emb, 2, 0).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(seeded.values.toSet.size < 2 ||
      (0L until 10L).map(seeded).toSet.size > 1,
      "seed-only assignment already separates — fixture no longer exercises Lloyd")
    val refined = Similarity.kmeansAssign(emb, 2, 2).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val a = (0L until 10L).map(refined).toSet
    val b = (10L until 20L).map(refined).toSet
    assert(a.size == 1 && b.size == 1 && a != b,
      s"bundles not separated: a=$a b=$b")
    // deterministic: a second run reproduces assignments exactly
    val again = Similarity.kmeansAssign(emb, 2, 2).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(again == refined)
    // empty corpus degrades like the centroid sample: no rows, no throw
    val empty = Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")
    assert(Similarity.kmeansAssign(empty, 2, 2).count() == 0)
  }

  test("binaryTopK: packed-XOR Hamming equals the unpacked sign-disagreement " +
      "count, self excluded, ranks dense and distance-ordered") {
    import spark.implicits._
    val emb = Tables.load(spark, sf("sf0.001"), "embeddings")
    val vecs = emb.select($"vec_id", $"embedding")
      .as[(Long, Array[Float])].collect().toMap
    def ham(a: Array[Float], b: Array[Float]): Int =
      a.indices.count(i => (a(i) > 0f) != (b(i) > 0f))
    val got = Similarity.binaryTopK(emb, emb.filter($"vec_id" < 5), 4, 64)
      .select($"probe_id", $"rnk", $"neighbor_id", $"hamming")
      .as[(Long, Int, Long, Int)].collect()
    assert(got.length == 5 * 4)
    got.foreach { case (p, _, n, h) =>
      assert(n != p, "self returned as its own neighbor")
      assert(h == ham(vecs(p), vecs(n)),
        s"packed Hamming $h != unpacked sign disagreement for ($p,$n)")
    }
    got.groupBy(_._1).values.foreach { rows =>
      val byRnk = rows.sortBy(_._2)
      assert(byRnk.map(_._2).toSeq == (1 to 4))
      assert(byRnk.sliding(2).forall { case Array(a, b) => a._4 <= b._4 })
    }
    // the packing is exhaustive: every top-4 Hamming from the packed path
    // matches the brute-force minimum over the full corpus
    val best = got.filter(_._2 == 1).map { case (p, _, _, h) => p -> h }.toMap
    for (p <- 0L until 5L) {
      val exact = vecs.collect { case (id, v) if id != p => ham(vecs(p), v) }.min
      assert(best(p) == exact, s"probe $p: packed best ${best(p)} != exact $exact")
    }
    // the 64-bit boundary guard refuses what it cannot pack
    intercept[IllegalArgumentException] {
      Similarity.signBits(org.apache.spark.sql.functions.col("embedding"), 65)
    }
  }

  test("hardNegativesIvf: exact in-band sims over IVF candidate lists, dense " +
      "ranks, usable recall vs brute; trainingPairsIvf keeps the same positives") {
    import spark.implicits._
    val emb = graft.core.Tables.load(spark, sf("sf0.001"), "embeddings")
    val probes = emb.filter($"vec_id" < 10)
    val ivf = Similarity.hardNegativesIvf(emb, probes, 5, 0.30, 0.05)
      .as[(Long, Int, Long, Double)].collect()
    assert(ivf.nonEmpty, "IVF negatives served nothing on the fixture")
    // the FULL brute band (k large enough to hold every in-band candidate):
    // every IVF-served (probe, neighbor, sim) must appear there with the
    // bit-identical sim — the pruning may only SHRINK the candidate set
    val full = Similarity.hardNegatives(emb, probes, 100000, 0.30, 0.05)
      .as[(Long, Int, Long, Double)].collect()
      .map(r => (r._1, r._3) -> r._4).toMap
    ivf.foreach { case (p, _, nb, s) =>
      assert(full.contains((p, nb)), s"($p,$nb) not in the exact band")
      assert(full((p, nb)) == s, s"($p,$nb) sim drifted: $s vs ${full((p, nb))}")
    }
    // ranks dense and sim-ordered per probe
    ivf.groupBy(_._1).values.foreach { rows =>
      assert(rows.map(_._2).sorted.toSeq == (1 to rows.length))
      val byRnk = rows.sortBy(_._2)
      assert(byRnk.sliding(2).forall {
        case Array(a, b) => a._4 >= b._4; case _ => true })
    }
    // recall vs the brute top-5: nprobe 4 of nlist 16 sees ~1/4 of the
    // corpus, so this is a floor with headroom, not a tight bound
    val brute = Similarity.hardNegatives(emb, probes, 5, 0.30, 0.05)
      .as[(Long, Int, Long, Double)].collect().map(r => (r._1, r._3)).toSet
    val served = ivf.map(r => (r._1, r._3)).toSet
    val recall = (served & brute).size.toDouble / brute.size
    assert(recall >= 0.2, f"IVF negative recall $recall%.2f below floor")
    // trainingPairsIvf: identical pair mining — same (anchor, positive,
    // pos_sim) set as the brute composition; negatives all in-band
    val tp = Similarity.trainingPairs(emb, 3, 0.45, 0.30, 0.05)
      .select($"anchor", $"positive", $"pos_sim").distinct()
      .as[(Long, Long, Double)].collect().toSet
    val tpi = Similarity.trainingPairsIvf(emb, 3, 0.45, 0.30, 0.05)
      .as[(Long, Long, Double, Int, Long, Double)].collect()
    assert(tpi.nonEmpty)
    assert(tpi.map(r => (r._1, r._2, r._3)).toSet == tp,
      "IVF composition changed the mined positives")
    tpi.foreach(r => assert(r._6 < 0.30 && r._6 >= 0.05,
      s"negative sim ${r._6} outside the band"))
  }

  test("hardNegativesIvfBatched: slice-union equals the one-shot call " +
      "row-for-row at every slicing, and degenerate inputs refuse or empty") {
    import spark.implicits._
    val emb = graft.core.Tables.load(spark, sf("sf0.001"), "embeddings")
    val probes = emb.filter($"vec_id" < 10)
    val oneShot = Similarity.hardNegativesIvf(emb, probes, 5, 0.30, 0.05)
      .as[(Long, Int, Long, Double)].collect().toSet
    assert(oneShot.nonEmpty, "one-shot served nothing on the fixture")
    // composition exactness across slice counts 1 (trivial), 3, and 10
    // (one probe per slice) — per-probe independence means the union is
    // identical, sims bit-equal included
    for (sliceSize <- Seq(100L, 4L, 1L)) {
      val batched = Similarity
        .hardNegativesIvfBatched(emb, probes, sliceSize, 5, 0.30, 0.05)
        .as[(Long, Int, Long, Double)].collect().toSet
      assert(batched == oneShot,
        s"sliceSize $sliceSize diverged: ${(batched -- oneShot).take(3)} extra, " +
          s"${(oneShot -- batched).take(3)} missing")
    }
    // no probes → empty result, same schema
    val empty = Similarity.hardNegativesIvfBatched(
      emb, probes.filter($"vec_id" < 0), 4, 5, 0.30, 0.05)
    assert(empty.collect().isEmpty)
    assert(empty.columns.toSeq == Seq("probe_id", "rnk", "neighbor_id", "sim"))
    // invalid slice size and inverted band refuse loudly
    val e1 = intercept[IllegalArgumentException] {
      Similarity.hardNegativesIvfBatched(emb, probes, 0, 5, 0.30, 0.05)
    }
    assert(e1.getMessage.contains("sliceSize"), e1.getMessage)
    val e2 = intercept[IllegalArgumentException] {
      Similarity.hardNegativesIvfBatched(emb, probes, 4, 5, 0.05, 0.30)
    }
    assert(e2.getMessage.contains("must exceed floor"), e2.getMessage)
  }

  test("binaryRerank: every served sim is the exact cosine, ranks follow sim, " +
      "and the 8-byte shortlist recovers most of the float top-k") {
    import spark.implicits._
    val emb = Tables.load(spark, sf("sf0.001"), "embeddings")
    val probes = emb.filter($"vec_id" < 10)
    val rr = Similarity.binaryRerank(emb, probes, 50, 5, 64)
      .select($"probe_id", $"rnk", $"neighbor_id", $"sim")
      .as[(Long, Int, Long, Double)].collect()
    val brute = Similarity.cosineTopK(emb, probes, 5)
      .select($"probe_id", $"neighbor_id", $"sim")
      .as[(Long, Long, Double)].collect()
    val bruteSim = brute.map(r => (r._1, r._2) -> r._3).toMap
    // served sims are EXACT cosines (stage 2 pays full precision): any
    // (probe, neighbor) also in the brute top-5 must carry the same value
    rr.foreach { case (p, _, n, s) =>
      bruteSim.get((p, n)).foreach(b => assert(b == s,
        s"rerank sim $s != exact cosine $b for ($p,$n)"))
    }
    rr.groupBy(_._1).values.foreach { rows =>
      val byRnk = rows.sortBy(_._2)
      assert(byRnk.map(_._2).toSeq == (1 to 5))
      assert(byRnk.sliding(2).forall { case Array(a, b) => a._4 >= b._4 })
    }
    // recall floor: the 50-deep binary shortlist keeps most of the exact
    // top-5 (engine-checked — a silent packing or shortlist regression
    // shows up here before it shows up in production recall)
    val gotSets = rr.groupBy(_._1).view.mapValues(_.map(_._3).toSet)
    val hits = brute.count { case (p, n, _) => gotSets(p).contains(n) }
    val recall = hits.toDouble / brute.length
    assert(recall >= 0.6, f"binary-shortlist recall $recall%.2f < 0.6 floor")
  }

  test("hardNegatives: band bounds bind (each probe's raw top-1 excluded as a " +
      "likely false negative), ranks ordered, inverted band refused") {
    import spark.implicits._
    val emb = Tables.load(spark, sf("sf0.001"), "embeddings")
    val probes = emb.filter($"vec_id" < 10)
    val hard = Similarity.hardNegatives(emb, probes, 5, 0.30, 0.05)
      .select($"probe_id", $"rnk", $"neighbor_id", $"sim")
      .as[(Long, Int, Long, Double)].collect()
    assert(hard.length == 50)
    hard.foreach { case (_, _, _, s) => assert(s < 0.30 && s >= 0.05) }
    hard.groupBy(_._1).values.foreach { rows =>
      val byRnk = rows.sortBy(_._2)
      assert(byRnk.map(_._2).toSeq == (1 to 5))
      assert(byRnk.sliding(2).forall { case Array(a, b) => a._4 >= b._4 })
    }
    // the ceiling is not decorative: every probe's UNFILTERED top-1 sits
    // above it on this fixture, so a naive top-k would have served a
    // likely false negative as its hardest example
    val raw = Similarity.cosineTopK(emb, probes, 1)
      .select($"probe_id", $"sim").as[(Long, Double)].collect().toMap
    val mined = hard.filter(_._2 == 1).map(r => r._1 -> r._4).toMap
    raw.foreach { case (p, topSim) =>
      assert(topSim >= 0.30, s"probe $p raw top-1 $topSim no longer above the " +
        "ceiling — fixture stopped exercising the false-negative exclusion")
      assert(mined(p) < topSim)
    }
    // an inverted band is a caller bug, refused loudly
    intercept[IllegalArgumentException] {
      Similarity.hardNegatives(emb, probes, 5, 0.05, 0.30)
    }
  }

  test("sq8Rerank: served distances are the exact L2, ranks dense, the 20-deep " +
      "quantized shortlist recovers most of the exact top-5, short shortlist refused") {
    import spark.implicits._
    val emb = Tables.load(spark, sf("sf0.001"), "embeddings")
    val probes = emb.filter($"vec_id" < 10)
    val got = Similarity.sq8Rerank(emb, probes, 20, 5)
      .select($"probe_id", $"vec_id", $"rnk", $"dist")
      .as[(Long, Long, Int, Double)].collect()
    assert(got.length == 50)
    val vecs = emb.select($"vec_id", $"embedding")
      .as[(Long, Array[Float])].collect().toMap
    def l2(a: Array[Float], b: Array[Float]): Double = {
      // the exactRerank evaluation order: p·p − 2 p·n + n·n, doubles
      def dot(x: Array[Float], y: Array[Float]) =
        x.indices.map(i => x(i).toDouble * y(i).toDouble).sum
      dot(a, a) - 2.0 * dot(a, b) + dot(b, b)
    }
    got.foreach { case (p, n, _, d) =>
      assert(math.abs(d - l2(vecs(p), vecs(n))) < 1e-9,
        s"($p,$n) dist $d is not the exact L2")
    }
    got.groupBy(_._1).values.foreach { rows =>
      val byRnk = rows.sortBy(_._3)
      assert(byRnk.map(_._3).toSeq == (1 to 5))
      assert(byRnk.sliding(2).forall { case Array(a, b) => a._4 <= b._4 })
    }
    // recall floor vs the exact-L2 top-5 over the full corpus
    val gotSets = got.groupBy(_._1).view.mapValues(_.map(_._2).toSet)
    val hits = (0L until 10L).map { p =>
      val exact = vecs.collect { case (id, v) if id != p => (l2(vecs(p), v), id) }
        .toSeq.sorted.take(5).map(_._2).toSet
      (exact & gotSets(p)).size
    }.sum
    val recall = hits.toDouble / 50
    assert(recall >= 0.8, f"SQ8-shortlist recall $recall%.2f < 0.8 floor")
    intercept[IllegalArgumentException] {
      Similarity.sq8Rerank(emb, probes, 3, 5)
    }
  }

  test("trainingPairs: every anchor keeps its closest positive, negatives stay " +
      "inside the band and never collide with the positive, leak refused") {
    import spark.implicits._
    val emb = Tables.load(spark, sf("sf0.001"), "embeddings")
    val rows = Similarity.trainingPairs(emb, 3, 0.45, 0.30, 0.05)
      .select($"anchor", $"positive", $"pos_sim", $"neg_rank", $"negative", $"neg_sim")
      .as[(Long, Long, Double, Int, Long, Double)].collect()
    assert(rows.nonEmpty, "fixture has 0.45-pairs; trainingPairs must emit rows")
    // positives replay: anchor's positive is its max-cosine pair partner
    val pairs = Dedup.embeddingNeardup(emb, 0.45)
      .select($"vec_a", $"vec_b", $"cosine").as[(Long, Long, Double)].collect()
    val byAnchor = (pairs.map(p => (p._1, (p._2, p._3))) ++
      pairs.map(p => (p._2, (p._1, p._3))))
      .groupBy(_._1).view.mapValues(_.map(_._2).minBy(x => (-x._2, x._1)))
    rows.foreach { case (a, pos, ps, _, neg, ns) =>
      val (expPos, expSim) = byAnchor(a)
      assert(pos == expPos && ps == expSim, s"anchor $a kept ($pos,$ps), " +
        s"closest is ($expPos,$expSim)")
      assert(ps >= 0.45 && ns < 0.30 && ns >= 0.05)
      assert(neg != a && neg != pos,
        s"anchor $a mined its own ${if (neg == a) "self" else "positive"} as a negative")
    }
    // every pair member anchors exactly once (k rows each, dense ranks)
    rows.groupBy(_._1).values.foreach { rs =>
      assert(rs.map(_._4).sorted.toSeq == (1 to rs.length))
      assert(rs.map(_._2).distinct.length == 1, "one positive per anchor")
    }
    assert(rows.map(_._1).distinct.sorted.toSeq ==
      byAnchor.keys.toSeq.sorted, "anchor set = pair members, exactly")
    // a band that overlaps the positive zone is refused loudly
    intercept[IllegalArgumentException] {
      Similarity.trainingPairs(emb, 3, 0.30, 0.45, 0.05)
    }
  }

  test("binary store: one BIGINT per vector on disk, bit-identical serving, " +
      "dim-mismatched probes refused") {
    import spark.implicits._
    val emb = Tables.load(spark, sf("sf0.001"), "embeddings")
    val dir = java.nio.file.Files.createTempDirectory("binary-store").toString
    Similarity.buildBinary(emb, dir, 64)
    // the 32x storage claim, checked on the artifact itself: the codes
    // table stores exactly (vec_id BIGINT, code BIGINT) — 8 bytes of
    // payload per vector, not an int array wearing a packed name
    val codes = spark.read.parquet(s"$dir/codes")
    assert(codes.schema.map(f => (f.name, f.dataType.typeName)).toSet ==
      Set(("vec_id", "long"), ("code", "long")))
    assert(codes.count() == emb.count())
    val probes = emb.filter($"vec_id" < 10)
    val served = Similarity.searchBinary(spark, dir, probes, 5)
      .orderBy($"probe_id", $"rnk").collect().toSeq
    val composed = Similarity.binaryTopK(emb, probes, 5, 64)
      .orderBy($"probe_id", $"rnk").collect().toSeq
    assert(served == composed, "store round-trip changed the ranking")
    // the dim guards are IN-PLAN as of r19 (ADVICE r18: no per-serve
    // driver job), so mismatches surface when the plan EXECUTES, as a
    // raise_error somewhere in the Spark failure's cause chain
    def chain(t: Throwable): String =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(x => Option(x.getMessage).getOrElse("")).mkString(" | ")
    // a truncating build is refused BY ITS OWN WRITE JOB — a dim
    // narrower than the data would silently pack half the signs
    val eBuild = intercept[Exception] {
      Similarity.buildBinary(emb, dir + "-bad", 32)
    }
    assert(chain(eBuild).contains("64 dimensions"), chain(eBuild))
    // a store legitimately built at another dim refuses mismatched
    // probes at serve time instead of silently XOR-ing truncated codes
    val emb32 = emb.limit(20)
      .select($"vec_id", org.apache.spark.sql.functions
        .expr("slice(embedding, 1, 32)").as("embedding"))
    val dir32 = java.nio.file.Files.createTempDirectory("binary-store32").toString
    Similarity.buildBinary(emb32, dir32, 32)
    val e = intercept[Exception] {
      Similarity.searchBinary(spark, dir32, probes, 5).count()
    }
    assert(chain(e).contains("dim=32"), chain(e))
    // an empty probe batch serves empty, never a head-on-empty throw
    assert(Similarity.searchBinary(spark, dir,
      probes.filter($"vec_id" < 0), 5).count() == 0)
    // the COMPOSED path guards dim like the build does (ADVICE r17): a
    // narrower dim must fail loudly, not pack half the signs — and the
    // guard covers binaryRerank, which routes through binaryTopK
    val eTopK = intercept[Exception] {
      Similarity.binaryTopK(emb, probes, 5, 32).count()
    }
    assert(chain(eTopK).contains("64 dimensions"), chain(eTopK))
    val eRerank = intercept[Exception] {
      Similarity.binaryRerank(emb, probes, 50, 5, 32).count()
    }
    assert(chain(eRerank).contains("64 dimensions"), chain(eRerank))
  }
  test("bitextMine: a hub target pairs with at most ONE source (mutual-best), " +
      "twins always mine, and the margin floor binds") {
    import spark.implicits._
    def vec(xs: Double*): Array[Float] = xs.map(_.toFloat).toArray
    // four src sentences with near-twins in tgt, plus THREE twinless
    // srcs whose raw-cos best is all the same HUB tgt: raw cosine
    // retrieval would hand the hub to all three — the mined table must
    // contain the hub at most once (each side keeps only its best-MARGIN
    // partner, and a tgt can be the mutual best of one src)
    val src = Seq(
      (0L, vec(1, 0, 0, 0.05)), (2L, vec(0, 1, 0, 0.05)),
      (4L, vec(0, 0, 1, 0.05)), (6L, vec(0.05, 0, 0, 1)),
      (8L, vec(0.6, 0.6, 0.45, 0.45)),
      (10L, vec(0.6, 0.58, 0.47, 0.45)),
      (12L, vec(0.58, 0.6, 0.45, 0.47))) // three hub-adjacent twinless srcs
      .toDF("vec_id", "embedding")
    val tgt = Seq(
      (1L, vec(0.99, 0.08, 0, 0.05)), (3L, vec(0.08, 0.99, 0, 0.05)),
      (5L, vec(0, 0.08, 0.99, 0.05)), (7L, vec(0.05, 0.08, 0, 0.99)),
      (9L, vec(0.55, 0.55, 0.5, 0.5))) // the hub: close to everything
      .toDF("vec_id", "embedding")
    val mined = Similarity.bitextMine(src, tgt, 3, 1.0)
      .select($"src_id", $"tgt_id").as[(Long, Long)].collect().toSet
    assert(Set((0L, 1L), (2L, 3L), (4L, 5L), (6L, 7L)).subsetOf(mined),
      s"mined $mined — every twin pair must survive the margin criterion")
    assert(mined.count(_._2 == 9L) <= 1,
      s"mined $mined — the hub paired with more than one source")
    // every twinless src's raw-cos best IS the hub — so without the
    // mutual-margin rule all three would have claimed it
    for (id <- Seq(8L, 10L, 12L)) {
      val rawBest = Similarity.cosineTopK(tgt, src.filter($"vec_id" === id), 1)
        .select($"neighbor_id").head.getLong(0)
      assert(rawBest == 9L, s"fixture drifted: src $id raw best is $rawBest")
    }
    // fixture non-degeneracy at sf0.001: both the mutuality test and the
    // margin floor must exclude candidates — neither gate is decorative
    val emb = graft.core.Tables.load(spark, sf("sf0.001"), "embeddings")
    val s0 = emb.filter($"vec_id" % 2 === 0); val t0 = emb.filter($"vec_id" % 2 === 1)
    val floor1 = Similarity.bitextMine(s0, t0, 4, 1.0).count()
    val floor0 = Similarity.bitextMine(s0, t0, 4, 1e-9).count()
    val nSrc = s0.count()
    assert(floor0 > floor1, "the margin floor excluded nothing on the fixture")
    assert(floor0 < nSrc, "mutuality excluded nothing: every src mined a pair")
    assert(floor1 > 0, "nothing mined at the declared floor")
    // the batched form is the one-shot row-for-row at every slicing
    // (both probe sides are corpus-sized at scale — the broadcast bound
    // binds by construction, so the slice rung is the honest deployment)
    val oneShot = Similarity.bitextMine(s0, t0, 4, 1.0)
      .as[(Long, Long, Double, Double)].collect().toSet
    for (sliceSize <- Seq(1000L, 7L, 1L)) {
      val batched = Similarity.bitextMineBatched(s0, t0, sliceSize, 4, 1.0)
        .as[(Long, Long, Double, Double)].collect().toSet
      assert(batched == oneShot, s"sliceSize $sliceSize diverged")
    }
    // refusals
    val e1 = intercept[IllegalArgumentException] {
      Similarity.bitextMine(s0, t0, 0, 1.0)
    }
    assert(e1.getMessage.contains("k must be"), e1.getMessage)
    val e2 = intercept[IllegalArgumentException] {
      Similarity.bitextMine(s0, t0, 4, 0.0)
    }
    assert(e2.getMessage.contains("minMargin"), e2.getMessage)
    val e3 = intercept[IllegalArgumentException] {
      Similarity.bitextMineBatched(s0, t0, 0, 4, 1.0)
    }
    assert(e3.getMessage.contains("sliceSize"), e3.getMessage)
  }

  test("kernel UDFs propagate null embeddings as null sims (skip-row, " +
      "not task failure) — the replaced HOF semantics (ADVICE r20)") {
    import spark.implicits._
    val emb = Seq(
      (1L, Some(Seq(1.0f, 0.0f))), (2L, Some(Seq(0.9f, 0.1f))),
      (3L, None: Option[Seq[Float]]))
      .toDF("vec_id", "embedding")
    // a null-embedding corpus row scores a NULL sim (ranked after every
    // real sim, exactly as the replaced HOFs did) instead of NPE-failing
    // the task; band-filtered paths (hardNegatives) drop it entirely
    val got = Similarity.cosineTopK(emb, emb.filter($"vec_id" === 1L), 5)
      .select($"rnk", $"neighbor_id", $"sim")
      .as[(Int, Long, Option[Double])].collect().sortBy(_._1).toSeq
    assert(got.map(_._2) == Seq(2L, 3L) && got(0)._3.isDefined && got(1)._3.isEmpty,
      s"expected real sim first, null-sim row ranked last, got $got")
    val hn = Similarity.hardNegatives(emb, emb.filter($"vec_id" === 1L), 5, 1.1, -1.1)
      .select($"neighbor_id").as[Long].collect().sorted.toSeq
    assert(hn == Seq(2L), s"expected the null row band-filtered, got $hn")
  }

}
