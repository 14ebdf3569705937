package graft

import graft.plans.PlanMemo

/** The memo contract: identical (plan, params) reuses the entry
  * (confirmed by sameResult, not just the 32-bit semanticHash bucket),
  * different plans or params never collide, and eviction rebuilds. */
class PlanMemoSpec extends SparkSpec {
  import spark.implicits._

  test("reuse on same plan+params; isolation across plans and params") {
    var builds = 0
    val memo = new PlanMemo[Int, org.apache.spark.sql.DataFrame](Seq(_))
    val a = Seq(1, 2, 3).toDF("x")
    val b = Seq(4, 5).toDF("x")

    val r1 = memo.getOrCompute(a, 7) { builds += 1; a.select(($"x" * 2).as("y")) }
    val r2 = memo.getOrCompute(a, 7) { builds += 1; a.select(($"x" * 2).as("y")) }
    assert(builds == 1)
    assert(r1 eq r2)

    memo.getOrCompute(b, 7) { builds += 1; b } // different input plan
    assert(builds == 2)
    memo.getOrCompute(a, 8) { builds += 1; a } // different params
    assert(builds == 3)

    memo.evict(spark)
    memo.getOrCompute(a, 7) { builds += 1; a }
    assert(builds == 4)
  }

  test("per-context LRU cap bounds entries and unpersists victims") {
    val memo = new PlanMemo[Int, org.apache.spark.sql.DataFrame](Seq(_))
    val base = Seq(1, 2, 3).toDF("x")
    val built = (0 to PlanMemo.MaxPerContext).map { p =>
      memo.getOrCompute(base, p) { base.select(($"x" + p).as("y")) }
    }
    // param 0 was the least-recently-used entry → evicted and unpersisted
    assert(built.head.storageLevel ==
      org.apache.spark.storage.StorageLevel.NONE)
    // the newest entry is still persisted and still reused
    assert(built.last.storageLevel !=
      org.apache.spark.storage.StorageLevel.NONE)
    var rebuilt = false
    memo.getOrCompute(base, 0) { rebuilt = true; base }
    assert(rebuilt, "evicted entry must rebuild")
    memo.evict(spark)
  }
}
