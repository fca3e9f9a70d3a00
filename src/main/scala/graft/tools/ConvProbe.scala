package graft.tools

import org.apache.spark.sql.SparkSession

import graft.engine.Engine.MetricsLog
import graft.graph.GraphBuilder
import graft.synth.Synth

/** Times tolerance-mode PageRank at bench scale (validates the
  * one-extra-join delta check).
  */
object ConvProbe {
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
    val g = GraphBuilder.fromTranscripts(Synth.transcripts(spark, sf).toDF).persist()
    g.edges.count(); g.numVertices
    val log = new MetricsLog
    val t0 = System.nanoTime()
    graft.algos.PageRank.run(g,
      graft.algos.PageRank.Config(0.85, 100, Some(1e-6), tolTimesN = false), log).count()
    println(f"[conv] iters=${log.iterations} wall=${(System.nanoTime() - t0) / 1e9}%.1f s " +
      f"(${log.totalSeconds / log.iterations}%.2f s/iter)")
    spark.stop()
  }
}
