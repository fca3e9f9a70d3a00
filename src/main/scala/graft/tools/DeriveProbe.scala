package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.storage.StorageLevel

import graft.graph.GraphBuilder
import graft.synth.Synth

/** Phase-by-phase timing of the transcript → graph derivation at bench
  * scale (the single biggest bench cost): generation, oid-edge window +
  * aggregation, dense-id assignment, dense-edge join, persist+count.
  */
object DeriveProbe {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.map(_.toDouble).getOrElse(0.4)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.local.dir", "/dev/shm/graft-spark")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def timed[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val a = f
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.1f s"); a
    }
    val runV1 = args.lift(1).contains("all")
    val turns = Synth.transcripts(spark, sf).toDF
    timed("turns.count (generation only)") { turns.count() }
    if (args.lift(1).contains("bench")) {
      // exactly the Bench derive phase: fromTranscripts + persist + counts
      timed("BENCH derive: fromTranscripts + persist + edge count") {
        val g = GraphBuilder.fromTranscripts(turns).persist()
        println(s"[probe] edges: ${g.edges.count()}")
        println(s"[probe] vertices: ${g.numVertices}")
      }
      spark.stop(); return
    }
    if (runV1) {
      val oe = timed("oidEdges + persist + count") {
        val o = GraphBuilder.oidEdges(turns).persist(StorageLevel.MEMORY_AND_DISK)
        println(s"[probe] oid edges: ${o.count()}")
        o
      }
      val vs = timed("vertices (denseRank) + count") {
        val v = GraphBuilder.vertices(turns, oe).toDF.persist(StorageLevel.MEMORY_AND_DISK)
        println(s"[probe] vertices: ${v.count()}")
        v
      }
      timed("dense edges join + persist + count") {
        import org.apache.spark.sql.functions._
        val es = oe
          .join(broadcast(vs.select(col("id").as("src"), col("oid").as("src_oid"))), "src_oid")
          .join(broadcast(vs.select(col("id").as("dst"), col("oid").as("dst_oid"))), "dst_oid")
          .select(col("src"), col("dst"), col("weight"))
          .persist(StorageLevel.MEMORY_AND_DISK)
        println(s"[probe] dense edges: ${es.count()}")
      }
      oe.unpersist(); vs.unpersist()
    }

    // ---- candidate V2: one generation pass, raw-pair broadcast map,
    // long-keyed aggregation ----
    {
      import org.apache.spark.sql.expressions.Window
      import org.apache.spark.sql.functions._
      val w = Window.partitionBy(col("conv_id")).orderBy(col("turn_idx"))
      val withOid = turns.select(
        col("conv_id"), col("turn_idx"), col("role"), col("tool"),
        GraphBuilder.oidOfTurn.as("oid"))
      val invoke = withOid
        .where(col("role").like("assistant%") && col("tool").isNotNull)
        .select(col("oid").as("src_oid"), concat(lit("tool:"), col("tool")).as("dst_oid"))
      val voids = withOid.select(col("oid"))
        .unionAll(invoke.select(col("dst_oid").as("oid")))
      val vs2 = timed("V2 vertices (denseRank, no window)") {
        val v = graft.graph.Ids.denseRank(voids, "oid").persist(StorageLevel.MEMORY_AND_DISK)
        println(s"[probe] V2 vertices: ${v.count()}"); v
      }
      timed("V2 edges: window pairs -> broadcast map -> long agg") {
        val reply = withOid
          .withColumn("prev_oid", lag(col("oid"), 1).over(w))
          .where(col("prev_oid").isNotNull && col("prev_oid") =!= col("oid"))
          .select(col("prev_oid").as("src_oid"), col("oid").as("dst_oid"))
        val es2 = reply.unionAll(invoke)
          .join(broadcast(vs2.select(col("id").as("src"), col("oid").as("src_oid"))), "src_oid")
          .join(broadcast(vs2.select(col("id").as("dst"), col("oid").as("dst_oid"))), "dst_oid")
          .groupBy(col("src"), col("dst"))
          .agg(count(lit(1)).cast("double").as("weight"))
          .persist(StorageLevel.MEMORY_AND_DISK)
        println(s"[probe] V2 dense edges: ${es2.count()}")
        es2.unpersist()
      }
      // V4: window over dense ids — narrow sort rows, long lag compare,
      // no post-window string joins on the 50M-row pair stream
      timed("V4 edges: id-mapped window -> long agg") {
        val turnIds = withOid
          .join(broadcast(vs2), Seq("oid"))
          .select(col("conv_id"), col("turn_idx"), col("id"))
        val replyIds = turnIds
          .withColumn("prev", lag(col("id"), 1).over(w))
          .where(col("prev").isNotNull && col("prev") =!= col("id"))
          .select(col("prev").as("src"), col("id").as("dst"))
        val invIds = invoke
          .join(broadcast(vs2.select(col("id").as("src"), col("oid").as("src_oid"))), "src_oid")
          .join(broadcast(vs2.select(col("id").as("dst"), col("oid").as("dst_oid"))), "dst_oid")
          .select(col("src"), col("dst"))
        val es4 = replyIds.unionAll(invIds)
          .groupBy(col("src"), col("dst"))
          .agg(count(lit(1)).cast("double").as("weight"))
          .persist(StorageLevel.MEMORY_AND_DISK)
        println(s"[probe] V4 dense edges: ${es4.count()}")
        es4.unpersist()
      }
      // V3: no global sort — map turns to vertex ids, collect_list per
      // conversation (map-side partial agg), sort the tiny per-conv array,
      // explode adjacent pairs, aggregate on long keys
      if (runV1) timed("V3 edges: per-conv array pairs") {
        val turnIds = withOid
          .join(broadcast(vs2), Seq("oid"))
          .select(col("conv_id"), col("turn_idx"), col("id"))
        val pairs = turnIds
          .groupBy(col("conv_id"))
          .agg(sort_array(collect_list(struct(col("turn_idx"), col("id")))).as("seq"))
          .select(explode(expr(
            "transform(sequence(1, size(seq) - 1), k -> struct(seq[k-1].id as src, seq[k].id as dst))"))
            .as("p"))
          .select(col("p.src"), col("p.dst"))
          .where(col("src") =!= col("dst"))
        val invIds = invoke
          .join(broadcast(vs2.select(col("id").as("src"), col("oid").as("src_oid"))), "src_oid")
          .join(broadcast(vs2.select(col("id").as("dst"), col("oid").as("dst_oid"))), "dst_oid")
          .select(col("src"), col("dst"))
        val es3 = pairs.unionAll(invIds)
          .groupBy(col("src"), col("dst"))
          .agg(count(lit(1)).cast("double").as("weight"))
          .persist(StorageLevel.MEMORY_AND_DISK)
        println(s"[probe] V3 dense edges: ${es3.count()}")
        es3.unpersist()
      }
    }
    spark.stop()
  }
}
