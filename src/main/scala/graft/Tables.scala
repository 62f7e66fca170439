package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Table loaders for the driver-generated star schema (TESTDATA.md).
  *
  * The lake analogue of the reference's namespace root: every graft
  * operator reads through here, so path layout / format decisions are
  * centralized (cf. reference DistributedFileSystem.java — the single
  * client-facing entry to the filesystem namespace).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Session-scoped RELATION cache — the catalog role (VERDICT r8
    * #1, fixed per-query overhead): `spark.read.parquet` builds a
    * fresh file index per call, so without this every one of the
    * ~183 registered queries re-lists the table dir and re-reads
    * parquet footers for schema — exactly the file-open syscalls the
    * build host's degraded windows amplify 5-15×. A real engine
    * resolves tables through a catalog that holds the analyzed
    * relation once; these source tables are immutable test fixtures,
    * so caching the DataFrame (an immutable logical plan + file
    * index, NOT materialized data) is the honest equivalent. Keyed
    * per session so Verify/Bench/spec sessions never share state.
    *
    * Lifetime (ADVICE r9): a WeakHashMap keyed on the session is
    * useless here — the cached DataFrames strongly reference their
    * SparkSession, so the weak key stays reachable through its own
    * values and nothing is ever collected. Instead, eviction is
    * explicit and double-guarded: every lookup first SWEEPS entries
    * whose SparkContext has stopped (a stopped session's plans are
    * dead weight — drop its whole per-session map), and the map is
    * access-ordered LRU-bounded at 8 sessions as a backstop for
    * long-lived JVMs that churn sessions without stopping them. */
  private val MaxSessions = 8
  private final case class CachedRel(sig: String, df: DataFrame)
  private val relCache =
    new java.util.LinkedHashMap[SparkSession,
      java.util.concurrent.ConcurrentHashMap[String, CachedRel]](16, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[SparkSession,
            java.util.concurrent.ConcurrentHashMap[String, CachedRel]]): Boolean =
        size() > MaxSessions
    }

  /** Staleness key: direct-child names + lengths + mtimes (one
    * listStatus round-trip), same discipline as `Lake.sourceSig`. The
    * cache keys on PATH; without this, a regenerated table at the same
    * path (the r7 testdata-refresh gotcha) would serve the old file
    * index forever. A directory's OWN status is not enough (ADVICE
    * r11): dir length is 0 and dir mtime only moves when a direct
    * child is created/removed, so an in-place rewrite of a part file
    * (same name set) would serve the stale index — the child mtimes
    * catch that. One shallow listing per lookup is the price of a real
    * catalog's version check, still ~1000x cheaper than the recursive
    * listing + footer schema read the cache avoids. */
  private def sig(spark: SparkSession, path: String): String =
    try {
      val p = new org.apache.hadoop.fs.Path(path)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val st = fs.getFileStatus(p)
      if (st.isDirectory)
        fs.listStatus(p).map(c =>
            s"${c.getPath.getName}:${c.getLen}:${c.getModificationTime}")
          .sorted.mkString("|")
      else s"${st.getLen}:${st.getModificationTime}"
    } catch { case scala.util.control.NonFatal(_) => "absent" }

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val m = relCache.synchronized {
      val it = relCache.keySet().iterator()
      while (it.hasNext) if (it.next().sparkContext.isStopped) it.remove()
      var m = relCache.get(spark)
      if (m == null) {
        m = new java.util.concurrent.ConcurrentHashMap[String, CachedRel]()
        relCache.put(spark, m)
      }
      m
    }
    val path = s"$dir/$name.parquet"
    val now = sig(spark, path)
    m.compute(s"$dir/$name", (_, cur) =>
      if (cur != null && cur.sig == now) cur
      else CachedRel(now, spark.read.parquet(path))).df
  }

  /** Reverse catalog lookup: is `df` one of the cached TABLE
    * relations this catalog handed out? Identity (eq) match — load()
    * returns the same DataFrame object while the content signature
    * holds, so a frame that IS a bare table scan resolves to its
    * (dir, table); any derived/filtered frame is a different object
    * and misses. Lets derived-artifact layers (shingle sets, stats)
    * disk-back per table content exactly when the input is a table —
    * the catalog's "artifacts of a table are tables" role. */
  def sourceOf(df: DataFrame): Option[(String, String)] =
    relCache.synchronized {
      import scala.jdk.CollectionConverters._
      relCache.values().asScala
        .flatMap(_.asScala.collectFirst {
          case (key, cr) if cr.df eq df =>
            val i = key.lastIndexOf('/')
            (key.substring(0, i), key.substring(i + 1))
        })
        .headOption
    }

  /** Table ROW COUNT memoized per (dir, table, content signature) —
    * the catalog's table-stats role (VERDICT r16 #3: the plane-ladder
    * ops derived their bucket count from a count() job on EVERY
    * invocation; a real engine reads N from table statistics). The
    * signature check makes a regenerated table recount; the count
    * itself is a parquet-footer metadata read, run once per content
    * generation. Keyed on content — not session — because a row count
    * is a pure fact about the files, and clearCache can't evict it.
    * Only the LATEST signature per (dir, name) is kept (ADVICE r17:
    * an append-only map leaks one entry per table regeneration in a
    * long-lived JVM) — a superseded generation's count is dead the
    * moment the files change, the famMemoized discipline. */
  private val countCache =
    new java.util.concurrent.ConcurrentHashMap[String, (String, java.lang.Long)]()

  def rowCount(spark: SparkSession, dir: String, name: String): Long = {
    val table = s"$dir/$name"
    val s = sig(spark, s"$dir/$name.parquet")
    Option(countCache.get(table)).filter(_._1 == s).map(_._2.longValue())
      .getOrElse {
        val n = load(spark, dir, name).count()
        countCache.put(table, (s, java.lang.Long.valueOf(n)))
        n
      }
  }

  def region(s: SparkSession, d: String): DataFrame = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  /** events.parquet's ts unit has varied across driver testdata
    * generations: TIMESTAMP(NANOS) (which Spark's vectorized reader
    * only accepts as long via nanosAsLong) or plain TIMESTAMP(MICROS)
    * without timezone. Normalize either to session-tz TimestampType —
    * with the UTC session both routes yield identical wall-clock
    * values, matching DuckDB's naive-timestamp read on the oracle
    * side. */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = load(s, d, "events")
    raw.schema("ts").dataType match {
      case LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast(TimestampType))
      case _ => raw
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
