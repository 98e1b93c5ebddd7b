package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** Offset bookkeeping across a simulated restart: the checkpointed
  * offset outlives the in-memory buffer, so recovery must fast-forward
  * rather than under-deliver or crash. */
class TcpOffsetRecoverySpec extends AnyFunSuite {

  test("recovered offset beyond the (empty) buffer fast-forwards the base") {
    val stream = new TcpBinaryMicroBatchStream("127.0.0.1", 0, 200L, 10)
    try {
      // simulate restart: checkpoint said 50 messages were committed
      val recovered = stream.deserializeOffset("50")
      // replaying the checkpointed range against the dead buffer yields
      // an empty slice, not an exception
      val parts = stream.planInputPartitions(stream.deserializeOffset("45"), recovered)
      assert(parts.length == 1)
      val reader = stream.createReaderFactory().createReader(parts(0))
      assert(!reader.next())
      // and the offset clock continues from the checkpoint, not zero
      assert(stream.latestOffset().json().toLong >= 50)
    } finally stream.stop()
  }
}
