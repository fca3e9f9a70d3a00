package graft.tools

import org.apache.spark.sql.SparkSession

import graft.algos.PageRank
import graft.engine.Engine.MetricsLog
import graft.graph.{GraphBuilder, LinkGraph}
import graft.schema.{Edge, Vertex}
import graft.synth.Synth

/** Dev tool: the bench's scaling phase in isolation — derive the graph
  * once, persist to parquet, run fixed-round PageRank at two parallelism
  * levels on the identical input. Usage: runMain graft.tools.ScalingProbe <sf> [low high]
  */
object ScalingProbe {
  private def session(cpus: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"probe-$cpus")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("PROBE_PARTS", cpus.toString))
      .config("spark.sql.adaptive.enabled", sys.env.getOrElse("PROBE_AQE", "true"))
      .config("spark.sql.adaptive.coalescePartitions.enabled", sys.env.getOrElse("PROBE_COALESCE", "true"))
      .config("spark.local.dir", sys.env.getOrElse("PROBE_LOCALDIR", "/dev/shm/graft-spark"))
      .config("spark.shuffle.compress", sys.env.getOrElse("PROBE_SHUFFLE_COMPRESS", "true"))
      .config("spark.shuffle.spill.compress", sys.env.getOrElse("PROBE_SHUFFLE_COMPRESS", "true"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  def main(args: Array[String]): Unit = {
    val sf = if (args.length > 0) args(0).toDouble else 0.1
    val low = if (args.length > 1) args(1).toInt else 8
    val high = if (args.length > 2) args(2).toInt else 32
    val tmp = java.nio.file.Files.createTempDirectory("graft-probe").toString

    var spark = session(high)
    val g = GraphBuilder.fromTranscripts(Synth.transcripts(spark, sf).toDF).persist()
    g.vertices.write.parquet(s"$tmp/vertices")
    g.edges.write.parquet(s"$tmp/edges")
    println(s"[probe] V=${g.numVertices} E=${g.edges.count()}")
    spark.stop()

    def run(p: Int): Double = {
      val s = session(p)
      import s.implicits._
      val gl = LinkGraph(
        s.read.parquet(s"$tmp/vertices").as[Vertex],
        s.read.parquet(s"$tmp/edges").as[Edge]).persist()
      gl.edges.count()
      val log = new MetricsLog
      val cfg =
        if (sys.env.contains("PROBE_CONV"))
          PageRank.Config(0.85, sys.env("PROBE_CONV").toInt, Some(1e-6), tolTimesN = false)
        else PageRank.Config(0.85, 10)
      PageRank.run(gl, cfg, log).count()
      log.all.foreach(m => println(f"[probe] p=$p iter ${m.iter}: ${m.seconds}%.2f s (${m.edgesPerSec}%.0f eps)"))
      val steady = log.all.drop(2)
      val thr = steady.map(_.edgesPerSec).sum / steady.size
      s.stop()
      thr
    }
    val thrLow = run(low)
    val thrHigh = run(high)
    println(f"[probe] thr@$low=$thrLow%.0f thr@$high=$thrHigh%.0f efficiency=${(thrHigh / thrLow) / (high.toDouble / low)}%.3f")
  }
}
