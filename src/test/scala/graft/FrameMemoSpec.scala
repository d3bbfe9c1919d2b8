package graft

import graft.queries.FrameMemo
import org.apache.spark.storage.StorageLevel

/** The LRU materialized-frame memo: eviction order, rebuild-on-miss,
  * and — the part a long-lived session cares about — that evicted
  * checkpoints release their cached RDD blocks instead of leaking
  * until context shutdown.
  */
class FrameMemoSpec extends SparkSpec {
  import spark.implicits._

  private def persistedCount: Int =
    spark.sparkContext.getPersistentRDDs.count {
      case (_, r) => r.getStorageLevel != StorageLevel.NONE
    }

  test("LRU eviction: oldest entry rebuilt after crossing the bound, " +
    "recently-used entries retained; evicted checkpoints unpersist " +
    "(no leaked cached RDDs)") {
    // quiesce: drop anything other suites left persisted so the leak
    // accounting below is exact
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
    val before = persistedCount
    val memo = new FrameMemo[String](bound = 3)
    var builds = Map.empty[String, Int].withDefaultValue(0)
    def get(k: String) = memo(k) {
      builds = builds.updated(k, builds(k) + 1)
      Seq((k, 1)).toDF("k", "v")
    }
    get("a"); get("b"); get("c")
    assert(memo.size === 3)
    assert(persistedCount === before + 3)
    get("a")            // refresh a: LRU order is now b, c, a
    get("d")            // evicts b
    assert(memo.size === 3)
    assert(persistedCount === before + 3) // b's checkpoint released
    assert(builds("b") === 1)
    get("c"); get("a"); get("d") // all hits, no rebuilds
    assert(builds === Map("a" -> 1, "b" -> 1, "c" -> 1, "d" -> 1))
    get("b")            // miss: rebuilds b, evicts c (eldest)
    assert(builds("b") === 2)
    get("c")
    assert(builds("c") === 2)
    assert(memo.size === 3)
    assert(persistedCount === before + 3)
    // results stay correct across rebuild
    assert(get("b").as[(String, Int)].head() === (("b", 1)))
    memo.clear()
    assert(memo.size === 0)
    assert(persistedCount === before)
  }

  test("memoized frames are served materialized: a second access " +
    "returns the SAME checkpointed plan, not a rebuild") {
    val memo = new FrameMemo[String](bound = 8)
    val first = memo("x")(Seq((1, 2)).toDF("a", "b"))
    val second = memo("x")(sys.error("must not rebuild"))
    assert(first eq second)
    assert(second.queryExecution.executedPlan.toString.contains("ExistingRDD"))
  }
}
