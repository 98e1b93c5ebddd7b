package graft.core

import org.apache.spark.sql.types.{TimestampType, StructType}

import graft.{SparkEntry, SparkSpec}

/** Fixture-drift tripwire. The driver owns `/root/testdata` and has
  * regenerated fixtures mid-round before (round 9: events.ts moved from
  * TIMESTAMP(NANOS) to timestamp[us], silently breaking 16 contract
  * queries). This spec turns the next such drift into one loud, named
  * failure instead of scattered downstream errors:
  *
  *   1. every fixture table loads and matches the declared [[Tables]]
  *      schema (names + types, nullability ignored — parquet footers
  *      don't carry our nullability intent);
  *   2. every `SparkEntry.queries` entry ANALYZES against the live
  *      sf0.001 fixtures (`queryExecution.analyzed` — no execution, so
  *      the whole contract surface is covered in seconds).
  *
  * Streaming-only entries that cannot analyze in a batch context are
  * expected to still build their DataFrame lazily; any entry that
  * throws on analysis is reported with its name.
  *
  * NOT analysis-only for every entry (ADVICE r10): a handful of
  * queries execute real work at DataFrame-CONSTRUCTION time — q38 runs
  * `ensureBucketed` (writes/reuses the bucketed layout), the x2_pq_*
  * rows train codebooks, x2_ivfpq_persisted builds/reuses its
  * fingerprint-keyed index dir, labelOutliers runs its bounded centroid
  * fetch, and the loop/stream rows (x1_dedup_clusters, xs_*)
  * materialize intermediate state. The tripwire keeps them anyway:
  * construction failing on drifted fixtures is exactly the signal this
  * spec exists to catch, and the cost (a few seconds at sf0.001) is
  * the price of covering the full contract surface.
  */
class FixtureSchemaSpec extends SparkSpec {

  private def shape(s: StructType): Seq[(String, String)] =
    s.fields.toSeq.map(f => (f.name, f.dataType.sql))

  test("all fixture tables load with the declared schemas") {
    val declared = Map(
      "region" -> Tables.region, "nation" -> Tables.nation,
      "customer" -> Tables.customer, "supplier" -> Tables.supplier,
      "part" -> Tables.part, "orders" -> Tables.orders,
      "lineitem" -> Tables.lineitem, "events" -> Tables.events,
      "documents" -> Tables.documents, "embeddings" -> Tables.embeddings)
    val bad = Tables.names.flatMap { name =>
      val got = shape(Tables.load(spark, sf("sf0.001"), name).schema)
      val want = shape(declared(name))
      if (got == want) None else Some(s"$name: expected $want, fixture loads as $got")
    }
    assert(bad.isEmpty, bad.mkString("\n"))
  }

  test("events.ts loads as TIMESTAMP regardless of fixture generation") {
    // all three fixture dirs: the driver regenerates them together, but
    // a partial regeneration would otherwise surface only at bench time
    for (dir <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val df = Tables.load(spark, sf(dir), "events")
      assert(df.schema("ts").dataType == TimestampType,
        s"$dir/events.ts loaded as ${df.schema("ts").dataType}")
    }
  }

  test("every declared query analyzes against the live fixtures") {
    val dir = sf("sf0.001")
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try { fn(spark, dir).queryExecution.analyzed; None }
        catch { case e: Exception =>
          Some(s"$name: ${e.getClass.getSimpleName}: ${e.getMessage.linesIterator.take(2).mkString(" ")}")
        }
    }
    assert(failures.isEmpty,
      s"${failures.size} queries failed analysis:\n${failures.mkString("\n")}")
  }
}
