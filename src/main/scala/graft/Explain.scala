package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: print the formatted physical plan of one or all registered
  * queries — used to review pushdown (PushedFilters/ReadSchema),
  * broadcast choices, and WholeStageCodegen spans after each operator
  * lands (the 100 TB plan review).
  *
  * Usage: runMain graft.Explain [queryName] [sfDir]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val name = args.headOption
    val sfDir = args.drop(1).headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val qs = name match {
      case Some(n) => Map(n -> SparkEntry.queries(n))
      case None => SparkEntry.queries
    }
    qs.toSeq.sortBy(_._1).foreach { case (n, fn) =>
      println(s"\n========== $n ==========")
      fn(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
