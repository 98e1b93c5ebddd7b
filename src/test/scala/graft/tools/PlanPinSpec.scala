package graft.tools

import graft.SparkSpec

/** Plan-drift regression pin: the operator-tree skeleton of every
  * headline query must match the committed `PLANPINS.txt`. A failure
  * here means a code change moved a physical-plan SHAPE (join
  * strategy, exchange, top-k, aggregation phasing) — if intentional,
  * regenerate with `sbt "runMain graft.tools.PlanPinWrite"` and re-run
  * `PlanDump` so PLANS.md tells the same story; if not, the plan
  * regressed and the diff below says where. */
class PlanPinSpec extends SparkSpec {

  test("physical-plan skeletons match the committed PLANPINS.txt") {
    val path = java.nio.file.Paths.get(PlanPin.pinFile)
    assert(java.nio.file.Files.exists(path),
      s"${PlanPin.pinFile} missing — generate with: sbt \"runMain graft.tools.PlanPinWrite\"")
    val pinned = PlanPin.parse(java.nio.file.Files.readString(path))
    val current = PlanPin.currentSkeletons(spark)
    assert(pinned.map(_._1) == current.map(_._1),
      s"pinned query list drifted (pinned ${pinned.size}, current ${current.size}) — regenerate the pin")
    val pm = pinned.toMap
    val drifted = current.filter { case (n, s) => pm(n) != s }
    assert(drifted.isEmpty,
      drifted.map { case (n, s) =>
        s"plan skeleton drifted for $n\n--- pinned:\n${pm(n)}\n--- current:\n$s"
      }.mkString("\n\n") +
        "\n\nIf intentional: sbt \"runMain graft.tools.PlanPinWrite\" && sbt \"runMain graft.tools.PlanDump\"")
  }
}
