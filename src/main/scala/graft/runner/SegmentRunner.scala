package graft.runner

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Q1 — per-segment SQL execution, parity with the reference's
  * `DuckRunner` (/root/reference/duck.go:38-134): an ordered list of
  * SQL statements run against each closed segment's tables before the
  * segment is announced; `exec=true` runs each statement for effect
  * (aggregate-to-table / export); `exec=false` hands control to a
  * user `queryFunc` with live views (result-bearing mode,
  * duck.go:87-100); `deleteOnDone` removes the segment afterwards
  * (duck.go:122-132). Errors accumulate; first error is returned but
  * all statements are attempted (errors.Join parity, duck.go:59).
  */
final case class SegmentRunner(
    queries: Seq[String] = Nil,
    exec: Boolean = true,
    queryFunc: Option[(SparkSession, Map[String, DataFrame]) => Unit] = None,
    deleteOnDone: Boolean = false) {

  /** Run against one closed segment. `tables` maps logical table name →
    * parquet dir. Each table is registered as a temp view under its
    * logical name for the duration of the run. */
  def run(spark: SparkSession, tables: Map[String, String]): Seq[Throwable] = {
    val errs = scala.collection.mutable.Buffer[Throwable]()
    val views = tables.flatMap { case (name, dir) =>
      try {
        val df = spark.read.parquet(dir)
        df.createOrReplaceTempView(name)
        Some(name -> df)
      } catch { case t: Throwable => errs += t; None }
    }
    if (exec) {
      queries.foreach { q =>
        try spark.sql(q).collect() // force effect-ful statements to run
        catch { case t: Throwable => errs += t }
      }
    } else {
      queryFunc.foreach { f =>
        try f(spark, views)
        catch { case t: Throwable => errs += t }
      }
    }
    views.keys.foreach(spark.catalog.dropTempView)
    errs.toSeq
  }

  /** Delete a segment dir (used when `deleteOnDone`). */
  private[graft] def deleteSegment(spark: SparkSession, dir: String): Unit = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(p, true)
  }
}
