package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

import graft.algos.PageRank
import graft.engine.Engine.MetricsLog
import graft.graph.{GraphBuilder, LinkGraph}
import graft.schema.{Edge, Vertex}
import graft.synth.Synth

/** Dev tool: dissect PageRank's per-superstep wall into Spark-job wall
  * vs driver-serial gap at one parallelism level. Prints every job's
  * (start-offset, duration) so the per-round breakdown — checkpoint job,
  * stats job, un-jobbed planning time — is visible directly.
  * Usage: runMain graft.tools.StepProbe <sf> <cores> [rounds]
  */
object StepProbe {
  def main(args: Array[String]): Unit = {
    val sf = if (args.length > 0) args(0).toDouble else 0.4
    val cores = if (args.length > 1) args(1).toInt else 8
    val rounds = if (args.length > 2) args(2).toInt else 8
    val tmp = java.nio.file.Files.createTempDirectory("graft-stepprobe").toString

    var spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName("stepprobe-derive")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.local.dir", sys.env.getOrElse("PROBE_LOCALDIR", "/dev/shm/graft-spark"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val g = GraphBuilder.fromTranscripts(Synth.transcripts(spark, sf).toDF).persist()
    g.vertices.write.parquet(s"$tmp/vertices")
    g.edges.write.parquet(s"$tmp/edges")
    spark.stop()

    val s2 = SparkSession.builder()
      .master(s"local[$cores]")
      .appName("stepprobe")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.local.dir", sys.env.getOrElse("PROBE_LOCALDIR", "/dev/shm/graft-spark"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark = s2
    s2.sparkContext.setLogLevel("WARN")
    import s2.implicits._

    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, (Long, Int)]()
    val t00 = System.nanoTime()
    s2.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        jobs.put(js.jobId, (js.time, js.stageInfos.map(_.numTasks).sum))
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        val (start, tasks) = jobs.getOrDefault(je.jobId, (je.time, -1))
        val off = (System.nanoTime() - t00) / 1e9
        println(f"[job] id=${je.jobId}%3d off=$off%8.2f dur=${(je.time - start) / 1e3}%7.3f s tasks=$tasks%4d")
      }
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val m = si.taskMetrics
        val wall = (for { s <- si.submissionTime; c <- si.completionTime } yield (c - s) / 1e3).getOrElse(-1.0)
        println(f"[stage] id=${si.stageId}%3d tasks=${si.numTasks}%3d wall=$wall%7.3f " +
          f"run=${m.executorRunTime / 1e3}%8.3f cpu=${m.executorCpuTime / 1e9}%8.3f " +
          f"gc=${m.jvmGCTime / 1e3}%6.3f deser=${m.executorDeserializeTime / 1e3}%6.3f " +
          f"shW=${m.shuffleWriteMetrics.bytesWritten / 1e6}%8.1fMB shR=${m.shuffleReadMetrics.totalBytesRead / 1e6}%8.1fMB " +
          f"spill=${m.diskBytesSpilled / 1e6}%6.1fMB [${si.name.takeWhile(_ != '\n').take(40)}]")
      }
    })

    val gl = LinkGraph(
      s2.read.parquet(s"$tmp/vertices").as[Vertex],
      s2.read.parquet(s"$tmp/edges").as[Edge]).persist()
    gl.edges.count()
    val log = new MetricsLog
    PageRank.run(gl, PageRank.Config(0.85, rounds), log).count()
    log.all.foreach(m => println(f"[round] iter ${m.iter}: ${m.seconds}%.2f s"))
    spark.stop()
  }
}
