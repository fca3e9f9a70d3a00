package graft

import org.apache.spark.sql.functions._

import graft.engine.Skew

/** Deterministic hub-salting: salted two-phase aggregates must equal
  * their unsalted forms on a pathologically skewed key distribution.
  */
class SkewSpec extends SparkSpec {

  private lazy val skewed = {
    val s = spark
    import s.implicits._
    // one hub key with 50k rows, 100 tail keys with 10 each
    val hub = (0 until 50000).map(i => (0L, i.toLong, s"src$i"))
    val tail = for (k <- 1 to 100; i <- 0 until 10) yield (k.toLong, i.toLong, s"t$k-$i")
    (hub ++ tail).toDF("key", "v", "origin")
  }

  test("saltedSum equals plain sum under extreme skew") {
    val plain = skewed.groupBy("key").agg(sum("v").as("v"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val salted = Skew.saltedSum(skewed, "key", "v", "origin", nSalts = 16)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(salted == plain)
  }

  test("salt assignment is deterministic across evaluations") {
    val a = skewed.select(col("origin"), Skew.salt(col("origin"), 16).as("s"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val b = skewed.select(col("origin"), Skew.salt(col("origin"), 16).as("s"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(a == b)
    assert(a.values.toSet.size > 1, "salts must actually spread")
  }

  test("saltedCollectSorted equals sorted plain collect") {
    val plain = skewed.groupBy("key").agg(array_sort(collect_list(col("v"))).as("vs"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val salted = Skew.saltedCollectSorted(skewed, "key", "v", "origin", nSalts = 8)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(salted == plain)
  }
}
