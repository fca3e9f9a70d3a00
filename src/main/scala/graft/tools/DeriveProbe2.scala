package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.graph.GraphBuilder
import graft.synth.Synth

/** Micro-breakdown of the vertex-side derivation cost. */
object DeriveProbe2 {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.map(_.toDouble).getOrElse(0.4)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.local.dir", "/dev/shm/graft-spark")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def timed[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val a = f
      println(f"[probe2] $label: ${(System.nanoTime() - t0) / 1e9}%.1f s"); a
    }
    val turns = Synth.transcripts(spark, sf).toDF
    val withOid = turns.select(
      col("conv_id"), col("turn_idx"), col("role"), col("tool"),
      GraphBuilder.oidOfTurn.as("oid"))
    timed("scan forcing oid strings") {
      println("[probe2] " + withOid.agg(count(lit(1)), sum(length(col("oid")))).head())
    }
    val invoke = withOid
      .where(col("role").like("assistant%") && col("tool").isNotNull)
      .select(concat(lit("tool:"), col("tool")).as("oid"))
    val voids = withOid.select(col("oid")).unionAll(invoke)
    timed("voids.distinct.count") { println("[probe2] " + voids.distinct().count()) }
    timed("denseRank full") {
      println("[probe2] " + graft.graph.Ids.denseRank(voids, "oid").count())
    }
    val vs = timed("vs persist") {
      val v = graft.graph.Ids.denseRank(voids, "oid")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      v.count(); v
    }
    val turnIds = withOid
      .join(broadcast(vs.select(col("id"), col("oid"))), Seq("oid"))
      .select(col("conv_id"), col("turn_idx"), col("id"))
    timed("turnIds scan (gen + bjoin, no window)") {
      println("[probe2] " + turnIds.agg(count(lit(1))).head())
    }
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("conv_id")).orderBy(col("turn_idx"))
    val replyIds = turnIds
      .withColumn("prev", lag(col("id"), 1).over(w))
      .where(col("prev").isNotNull && col("prev") =!= col("id"))
      .select(col("prev").as("src"), col("id").as("dst"))
    timed("replyIds window count") {
      println("[probe2] " + replyIds.count())
    }
    timed("reply agg on longs") {
      println("[probe2] " + replyIds.groupBy(col("src"), col("dst"))
        .agg(count(lit(1))).count())
    }
    spark.stop()
  }
}
