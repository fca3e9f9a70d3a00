package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.engine.Engine
import graft.graph.GraphBuilder
import graft.synth.Synth

/** Dev diagnostic: dissect one PageRank superstep — phase timings and the
  * physical plan (exchange count is what matters for scaling).
  * Usage: runMain graft.tools.Diag <sf> <cpus>
  */
object Diag {
  @volatile var diagListen = false
  def main(args: Array[String]): Unit = {
    val sf = if (args.length > 0) args(0).toDouble else 0.01
    val cpus = if (args.length > 1) args(1).toInt else 32
    val usePersist = args.length > 2 && args(2) == "persist"
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val dur = for { a <- si.completionTime; b <- si.submissionTime } yield a - b
        if (diagListen) println(f"[stage] ${si.stageId}%4d ${si.numTasks}%4d tasks wall=${dur.getOrElse(-1L)}%6d ms cpu=${si.taskMetrics.executorRunTime}%6d ms gc=${si.taskMetrics.jvmGCTime}%5d ms ${si.name.take(60)}")
      }
    })

    def timed[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val a = f
      println(f"[diag] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); a
    }

    val g = timed("derive") {
      val g = GraphBuilder.fromTranscripts(Synth.transcripts(spark, sf).toDF).persist()
      g.edges.count(); g
    }
    val n = g.numVertices
    println(s"[diag] V=$n E=${g.edges.count()}")

    val simpleEdges = g.edges.toDF.select(col("src"), col("dst"))
    val outDeg = simpleEdges.groupBy("src").agg(count(lit(1)).as("outdeg"))
    val e = timed("edge prep") {
      val e = simpleEdges.join(outDeg, "src")
        .select(col("src"), col("dst"), (lit(1.0) / col("outdeg")).as("w"))
        .repartition(col("src"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      e.count(); e
    }
    var state = timed("state init") {
      val s0 = g.vertices.toDF
        .select(col("id"), lit(1.0 / n).as("rank"), lit(false).as("dangling"))
        .repartition(col("id"))
      val m = Engine.materialize(s0); m.count(); m
    }
    for (it <- 0 until (if (usePersist) 5 else 0)) {
      val contrib = e
        .join(state.select(col("id").as("src"), col("rank").as("srank")).hint("shuffle_hash"), "src")
        .select(col("dst"), (col("srank") * col("w")).as("m"))
        .groupBy(col("dst").as("id")).agg(sum(col("m")).as("c"))
      val next = state
        .select(col("id"), col("rank").as("prev"), col("dangling"))
        .join(contrib.hint("shuffle_hash"), Seq("id"), "left")
        .select(col("id"),
          (lit(0.15 / n) + lit(0.85) * coalesce(col("c"), lit(0.0))).as("rank"),
          col("prev"), col("dangling"))
      if (it == 1) println(next.queryExecution.executedPlan.toString.take(6000))
      val nextM = if (usePersist) next.persist(StorageLevel.MEMORY_AND_DISK) else Engine.materialize(next)
      timed(s"superstep $it (agg action)") {
        nextM.agg(sum(abs(col("rank") - col("prev"))), sum(when(col("dangling"), col("rank")))).head()
      }
      state = nextM.select(col("id"), col("rank"), col("dangling"))
    }
    // now the real implementation, per-iteration
    diagListen = true
    val log = new graft.engine.Engine.MetricsLog
    val t0 = System.nanoTime()
    graft.algos.PageRank.run(g, graft.algos.PageRank.Config(0.85, 12), log).count()
    println(f"[diag] PageRank.run 12 rounds total: ${(System.nanoTime()-t0)/1e9}%.2f s")
    log.all.foreach(m => println(f"[diag] run iter ${m.iter}: ${m.seconds}%.2f s (${m.edgesPerSec}%.0f eps)"))
    spark.stop()
  }
}
