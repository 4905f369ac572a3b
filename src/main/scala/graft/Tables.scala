package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet fixtures (TESTDATA.md).
  *
  * Scale stance: each table is a plain parquet scan — Catalyst pushes
  * filters/projections into the scan, so callers should NOT cache or
  * collect here. At 100 TB these become partitioned-table scans with
  * identical code.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Session-scoped read memo: the same (session, path) returns the
    * SAME DataFrame instance. DataFrames are immutable so sharing is
    * free, and it buys two things at once: (a) the directory is
    * listed/footer-read once per session instead of per construction,
    * and (b) plan trees built over the shared leaf CANONICALIZE EQUAL
    * across constructions — a fresh `spark.read.parquet` creates a
    * fresh file index that never compares equal, which would defeat
    * plan-keyed memoization (the dropHotKeys probe memo). Weakly keyed
    * by session so a stopped session's entries are collectable. */
  private val readCache = new java.util.WeakHashMap[SparkSession,
    java.util.concurrent.ConcurrentHashMap[String, DataFrame]]()

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    if (name == "events") {
      // events.ts is parquet TIMESTAMP(NANOS) which Spark rejects by
      // default; read it as a long of epoch-nanos (set here so it holds
      // for any session the driver owns).
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    }
    val perSession = readCache.synchronized {
      var m = readCache.get(spark)
      if (m == null) {
        m = new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()
        readCache.put(spark, m)
      }
      m
    }
    perSession.computeIfAbsent(s"$sfDir/$name.parquet",
      p => spark.read.parquet(p))
  }

  /** Register every fixture table as a temp view (for spark.sql use). */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    names.foreach(n => load(spark, sfDir, n).createOrReplaceTempView(n))
}
