package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec
import UserTotals._

class UserTotalsSpec extends SparkSpec {

  test("transformWithState accumulates per-user totals across batches") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val mem = MemoryStream[UserEvent]
      val q = totals(mem.toDS())
        .writeStream.format("memory").queryName("usertotals").outputMode("update").start()
      try {
        mem.addData(UserEvent(1, "click", 1.5), UserEvent(1, "view", 2.5), UserEvent(2, "click", 10.0))
        q.processAllAvailable()
        mem.addData(UserEvent(1, "click", 4.0))
        q.processAllAvailable()
      } finally q.stop()
      val last = spark.table("usertotals").as[UserTotal].collect()
        .groupBy(_.user_id).map { case (u, rows) => u -> rows.maxBy(_.n_events) }
      assert(last(1L) == UserTotal(1L, 3L, 8.0))
      assert(last(2L) == UserTotal(2L, 1L, 10.0))
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }
}
