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

  /** Fixture-drift tripwire (VERDICT r8 item 2). The driver regenerates
    * /root/testdata between rounds and has changed column conventions
    * before (r8: events.ts INT64-epoch-nanos → timestamp[us], which
    * surfaced as six cryptic DATATYPE_MISMATCH analysis errors). Pin
    * the expected schema here so the NEXT drift fails loudly at load
    * with a one-line "fixture changed" message naming the column.
    * Nullability is ignored — only names, order, and types matter. */
  private[graft] val expectedDdl: Map[String, String] = Map(
    "region" -> "r_regionkey INT, r_name STRING",
    "nation" -> "n_nationkey INT, n_name STRING, n_regionkey INT",
    "customer" -> ("c_custkey BIGINT, c_name STRING, c_nationkey INT, " +
      "c_acctbal DOUBLE, c_mktsegment STRING"),
    "supplier" -> ("s_suppkey BIGINT, s_name STRING, s_nationkey INT, " +
      "s_acctbal DOUBLE"),
    "part" -> ("p_partkey BIGINT, p_name STRING, p_brand STRING, " +
      "p_type STRING, p_size INT, p_retailprice DOUBLE"),
    "orders" -> ("o_orderkey BIGINT, o_custkey BIGINT, " +
      "o_orderstatus STRING, o_totalprice DOUBLE, " +
      "o_orderdate TIMESTAMP_NTZ, o_orderpriority STRING"),
    "lineitem" -> ("l_orderkey BIGINT, l_partkey BIGINT, " +
      "l_suppkey BIGINT, l_linenumber INT, l_quantity DOUBLE, " +
      "l_extendedprice DOUBLE, l_discount DOUBLE, l_tax DOUBLE, " +
      "l_returnflag STRING, l_linestatus STRING, " +
      "l_shipdate TIMESTAMP_NTZ"),
    "events" -> ("event_id BIGINT, ts TIMESTAMP_NTZ, user_id BIGINT, " +
      "event_type STRING, value DOUBLE, props STRING"),
    "documents" -> ("doc_id BIGINT, text STRING, lang STRING, " +
      "source STRING, n_chars BIGINT"),
    "embeddings" -> "vec_id BIGINT, embedding ARRAY<FLOAT>, label INT")

  private[graft] def assertFixtureSchema(
      name: String, actual: org.apache.spark.sql.types.StructType): Unit =
    expectedDdl.get(name).foreach { ddl =>
      val expected = org.apache.spark.sql.types.StructType.fromDDL(ddl)
      val exp = expected.fields.map(f => f.name -> f.dataType)
      val got = actual.fields.map(f => f.name -> f.dataType)
      if (!exp.sameElements(got)) {
        val detail = exp.zipAll(got, null, null).collectFirst {
          case (e, g) if e != g =>
            if (e == null) s"unexpected extra column ${g._1}: ${g._2.sql}"
            else if (g == null) s"missing column ${e._1}: ${e._2.sql}"
            else if (e._1 != g._1) s"column ${g._1} where ${e._1} expected"
            else s"$name.${e._1} is now ${g._2.sql} (expected ${e._2.sql})"
        }.getOrElse("schema mismatch")
        throw new IllegalStateException(
          s"fixture changed: $detail — the driver regenerated the " +
            s"testdata with a new convention; update Tables.expectedDdl " +
            s"and every consumer of $name (see SCALE.md 'fixture drift')")
      }
    }

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val perSession = readCache.synchronized {
      var m = readCache.get(spark)
      if (m == null) {
        m = new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()
        readCache.put(spark, m)
      }
      m
    }
    perSession.computeIfAbsent(s"$sfDir/$name.parquet", { p =>
      val df = spark.read.parquet(p)
      assertFixtureSchema(name, df.schema)
      df
    })
  }

  /** Register every fixture table as a temp view (for spark.sql use). */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    names.foreach(n => load(spark, sfDir, n).createOrReplaceTempView(n))
}
