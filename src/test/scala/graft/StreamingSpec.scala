package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.ingest.SnapshotStore
import graft.streaming.EventStream
import graft.synth.Synth

class StreamingSpec extends SparkSpec {

  test("windowed event counts: streaming result equals batch result") {
    val dir = "/root/testdata/sf0.001"
    val batch = spark.read.parquet(s"$dir/events.parquet")
    val expected = EventStream.windowedEventCounts(batch)
      .collect().map(r => (r.get(0).toString, r.getString(1), r.getLong(2))).toSet

    // file-stream sources need a directory; stage the events file alone
    val stage = Files.createTempDirectory("graft-evt")
    Files.copy(java.nio.file.Paths.get(s"$dir/events.parquet"),
      stage.resolve("events.parquet"))
    val stream2 = spark.readStream.schema(batch.schema)
      .format("parquet").load(stage.toString)
    val q = EventStream.windowedEventCounts(stream2)
      .writeStream.outputMode("complete")
      .format("memory").queryName("evt_counts")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val got = spark.table("evt_counts")
      .collect().map(r => (r.get(0).toString, r.getString(1), r.getLong(2))).toSet
    assert(got == expected)
    assert(stream2.isStreaming && got.nonEmpty)
  }

  test("incremental conversation append maintains edge counts across snapshots") {
    val store = new SnapshotStore(Files.createTempDirectory("graft-stream").toString)
    val all = Synth.transcripts(spark, 0.0001).toDF.persist()
    val batch1 = all.where(col("conv_id") < "c00000100")
    val batch2 = all.where(col("conv_id") >= "c00000100")

    val (_, v1) = EventStream.appendConversations(spark, store, "oid_edges", batch1)
    val (merged, v2) = EventStream.appendConversations(spark, store, "oid_edges", batch2)
    assert(v1 == 0 && v2 == 1)

    // merged incremental result == one-shot derivation over everything
    val oneShot = graft.graph.GraphBuilder.oidEdges(all)
    val diff = merged.as("a").join(oneShot.as("b"), Seq("src_oid", "dst_oid"), "full_outer")
      .where(col("a.weight").isNull || col("b.weight").isNull ||
        col("a.weight") =!= col("b.weight"))
    assert(diff.count() == 0)

    // and the rebuilt graph is usable by the algorithms
    val g = EventStream.graphFromSnapshot(spark, store, "oid_edges")
    assert(graft.algos.PageRank.run(g, graft.algos.PageRank.Config(0.85, 3)).count() == g.numVertices)
    all.unpersist()
  }
}
