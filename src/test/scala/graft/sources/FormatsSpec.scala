package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec

class FormatsSpec extends SparkSpec {

  private lazy val events = Tables.load(spark, sf("sf0.001"), "events")

  test("parquet and orc round-trip losslessly, partitioned write works") {
    Seq("parquet", "orc").foreach { fmt =>
      val dir = tmpDir(s"fmt-$fmt")
      Formats.write(events, fmt, dir, partitionBy = Seq("event_type"))
      val back = Formats.read(spark, fmt, dir)
      assert(back.count() == events.count())
      // partition pruning works on the partitioned layout
      val pruned = back.filter(col("event_type") === "purchase")
      val plan = pruned.queryExecution.executedPlan.toString
      assert(plan.contains("PartitionFilters: [isnotnull(event_type"),
        s"$fmt partitioned scan is not pruning:\n$plan")
      assert(pruned.count() ==
        events.filter(col("event_type") === "purchase").count())
    }
  }

  test("json/csv interchange round-trips row counts and key values") {
    Seq("json", "csv").foreach { fmt =>
      val dir = tmpDir(s"fmt-$fmt")
      Formats.write(events.drop("ts"), fmt, dir)
      val back = Formats.read(spark, fmt, dir)
      assert(back.count() == events.count())
      val s = back.agg(sum(col("event_id").cast("long"))).collect()(0)
        .getLong(0)
      val e = events.agg(sum(col("event_id"))).collect()(0).getLong(0)
      assert(s == e, s"$fmt lost event_ids")
    }
  }

  test("unsupported format rejected") {
    intercept[IllegalArgumentException] {
      Formats.write(events, "avro", tmpDir("fmt-x"))
    }
  }

  test("memory queue registry entry collects and drains") {
    import graft.streaming._
    val sink = QueueSinkRegistry.create("memory", Map("name" -> "t1"))
    sink.send(Seq(BatchPacker.Entry("a", "b1", false)))
    sink.send(Seq(BatchPacker.Entry("b", "b2", false)))
    val drained = MemoryQueue.drain("t1")
    assert(drained.map(_.id) == Seq("a", "b"))
    assert(MemoryQueue.drain("t1").isEmpty)
  }
}
