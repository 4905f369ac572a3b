package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

import graft.SparkSpec

class LayoutSuite extends SparkSpec {

  test("zValue interleaves bits (known vectors, order preserved on axes)") {
    import spark.implicits._
    val out = Seq((0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L), (3L, 5L),
      (65535L, 0L), (0L, 65535L))
      .toDF("x", "y")
      .select(Layout.zValue(col("x"), col("y")).as("z"))
      .as[Long].collect().toSeq
    // interleave: x bits at even positions, y bits at odd
    assert(out == Seq(0L, 1L, 2L, 3L,
      // x=011, y=101 → z = y2 x2 y1 x1 y0 x0 = 1 0 0 1 1 1 = 39
      39L,
      0x55555555L & 0xFFFFFFFFL, // x=all 16 ones → even positions
      0xAAAAAAAAL))              // y=all 16 ones → odd positions
  }

  test("z-ordered layout prunes a 2-D box scan a linear sort cannot") {
    // Synthetic 2-D points spread over a 1024×1024 grid. The linear
    // layout sorts by x alone — the single-key best case: an
    // x-selective scan reads a contiguous slice, but a predicate on
    // the SECOND dimension prunes nothing (y is uniform inside every
    // x run). The z-order layout clusters both axes into ~square
    // tiles per row group, so a y-band scan skips every tile outside
    // the band. Row-group min/max stats are the mechanism, so both
    // layouts write small row groups.
    val n = 200000L
    val pts = spark.range(n).select(
      (col("id") * 7919 % 1024).as("x"),
      (col("id") * 104729 % 1024).as("y"))
    val dir = Files.createTempDirectory("graft-layout").toString
    pts.repartitionByRange(16, col("x")).sortWithinPartitions(col("x"))
      .write.option("parquet.block.size", "65536")
      .parquet(s"$dir/linear")
    Layout.zorderBy(pts, col("x"), col("y"), bits = 10, numFiles = 16)
      .write.option("parquet.block.size", "65536")
      .parquet(s"$dir/zorder")

    // AQE wraps finished stages as opaque leaves in 4.x — disable it
    // here so the scan node (and its numOutputRows metric) is directly
    // reachable; the query is scan→filter→agg, nothing for AQE to do.
    def scanRows(path: String): (Long, Long) = {
      val q = spark.read.parquet(path)
        .where(col("y").between(100, 115))
        .agg(count(lit(1)).as("n"))
      val matched = q.collect()(0).getLong(0)
      val scan = q.queryExecution.executedPlan.collectLeaves()
        .collectFirst { case s: FileSourceScanExec => s }
        .getOrElse(fail("no scan leaf in:\n" +
          q.queryExecution.executedPlan.collectLeaves()
            .map(_.getClass.getName).mkString("\n")))
      (matched, scan.metrics("numOutputRows").value)
    }
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val (nLin, readLin) = try {
      scanRows(s"$dir/linear")
    } finally {}
    val (nZ, readZ) = try {
      scanRows(s"$dir/zorder")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
    assert(nLin == nZ && nLin > 0, s"band counts differ: $nLin vs $nZ")
    // the y band covers ~1.6% of the grid: the x-sorted layout reads
    // essentially everything, the z-order layout only the tiles whose
    // y range intersects the band — demand at least 4×
    info(s"y-band scan read: linear $readLin rows, z-order $readZ rows " +
      f"(${readLin.toDouble / readZ}%.1f×)")
    assert(readZ * 4 < readLin,
      s"z-order read $readZ rows vs linear $readLin — no pruning win")
  }
}
