package graft.operators

import graft.{GraftQuery, Tables}
import graft.functions.GraftHash
import graft.functions.Parity._
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The lake layer: every reference filesystem capability re-expressed
  * as a columnar data-lake operation (SURVEY.md §2, citations to
  * /root/reference/src/java/org/apache/hadoop/hdfs).
  *
  * The reference exposes byte streams + namespace metadata
  * (DistributedFileSystem.java, DFSClient.java); Spark's analogue of
  * the client is the DataFrameReader/Writer pair, and the NameNode
  * metadata queries (du, count, quota, fsck, checksum) become
  * aggregations over table content and layout. Physical block
  * management (server/datanode, BlockManager.java) is delegated to
  * the backing FileSystem — by design, per BASELINE.json.
  */
object Lake {

  /** Scratch area for sink/source roundtrips (gitignored). */
  def scratch(name: String): String = s"/root/repo/target/scratch/$name"

  /** Submit independent Spark jobs CONCURRENTLY from worker threads
    * (SparkContext is thread-safe by contract; the scheduler
    * interleaves their tasks). The ceremony ops' multi-write setup
    * phases — N small writes to N disjoint directories — otherwise
    * pay N sequential rounds of fixed job latency while each job
    * uses a fraction of the cores (VERDICT r9 #1 write-amp lever).
    * Blocks until all complete; the first failure rethrows. */
  def concurrently[T](xs: Seq[T])(f: T => Unit): Unit = {
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration.Duration
    implicit val ec: ExecutionContext = ExecutionContext.global
    Await.result(Future.traverse(xs)(x => Future(f(x))), Duration.Inf)
    ()
  }

  /** Metadata-only content signature of a source file or directory:
    * part names + lengths + mtimes, no data read — the staleness key
    * for amortized physical layouts. */
  def sourceSig(fs: org.apache.hadoop.fs.FileSystem,
                p: org.apache.hadoop.fs.Path): String = {
    val parts =
      if (fs.getFileStatus(p).isDirectory) fs.listStatus(p).toSeq
      else Seq(fs.getFileStatus(p))
    parts.map(st => s"${st.getPath.getName}:${st.getLen}:${st.getModificationTime}")
      .sorted.mkString("|")
  }

  /** Idempotent layout provisioning gated on a caller-supplied
    * metadata-only signature: `write` runs only when the recorded
    * signature differs from `sig`, then `sig` is recorded. The
    * discipline every amortized layout uses (bucketed tables, IVF
    * cells, band indexes): the one-time build pays its shuffle at
    * layout time; the measured query reads the layout. */
  def provisionIfStale(fs: org.apache.hadoop.fs.FileSystem, path: String,
                       sig: String)(write: => Unit): Unit =
    if (!recordedSig(fs, path).contains(sig)) {
      write
      recordSig(fs, path, sig)
    }

  /** Sum of parquet footer record counts under `paths` (each a part
    * file or a directory of part files) — exactly the number a
    * `read.parquet(paths).count()` job computes (count() prunes to
    * footer metadata), WITHOUT scheduling a Spark job per probe: the
    * quotaUsage / reportVerified discipline (r18/r19, guide §1.2 —
    * per-step overhead once the shape is right). A missing path or
    * torn/corrupt footer THROWS — metadata probes must fail closed,
    * never read as zero rows. */
  def footerRows(spark: SparkSession, paths: Seq[String]): Long = {
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = FileSystem.get(conf)
    paths.map { p =>
      val st = fs.getFileStatus(new Path(p))
      val parts =
        if (st.isDirectory)
          fs.listStatus(st.getPath)
            .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
        else Array(st)
      parts.map { f =>
        val rd = org.apache.parquet.hadoop.ParquetFileReader.open(
          org.apache.parquet.hadoop.util.HadoopInputFile.fromStatus(f, conf))
        try rd.getRecordCount finally rd.close()
      }.sum
    }.sum
  }

  private def sigFile(path: String) =
    new org.apache.hadoop.fs.Path(path, "_graft_src_sig")

  /** The signature recorded at `path` by a previous provisioning run. */
  def recordedSig(fs: org.apache.hadoop.fs.FileSystem, path: String): Option[String] = {
    val f = sigFile(path)
    if (!fs.exists(f)) None
    else {
      val in = fs.open(f)
      try Some(new String(org.apache.hadoop.io.IOUtils.readFullyToByteArray(in), "UTF-8"))
      finally in.close()
    }
  }

  /** Record `sig` at `path` (overwrite — the layout it describes just
    * finished building). */
  def recordSig(fs: org.apache.hadoop.fs.FileSystem, path: String, sig: String): Unit = {
    val out = fs.create(sigFile(path), true)
    try out.write(sig.getBytes("UTF-8")) finally out.close()
  }

  private val TsFmt = "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"

  /** Parquet scan with predicate + projection pushdown (read path:
    * DFSInputStream.java — here the reader prunes columns/rows at the
    * scan instead of streaming whole blocks). */
  val lakeScan: GraftQuery = GraftQuery.sql(
    "lake_scan",
    s"""SELECT l_returnflag, COUNT(*) AS n, ${sumMSql("l_quantity")} AS qty
       |FROM lineitem
       |WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00' AND l_quantity > 45
       |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin
  ) { (s, d) =>
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
        col("l_quantity") > 45)
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"), sumM(col("l_quantity")).as("qty"))
      .orderBy(col("l_returnflag"))
  }

  /** CSV sink + source roundtrip (create/open: DFSOutputStream.java /
    * DFSInputStream.java). Values must survive the text codec
    * bit-for-bit — verified against the parquet-side oracle. */
  val lakeRoundtripCsv: GraftQuery = GraftQuery.sql(
    "lake_roundtrip_csv",
    s"""SELECT o_orderstatus, COUNT(*) AS n, ${sumMSql("o_totalprice")} AS total
       |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin
  ) { (s, d) =>
    val orders = Tables.orders(s, d)
    val path = scratch("roundtrip_csv")
    orders.write.mode("overwrite")
      .option("header", "true").option("timestampFormat", TsFmt)
      .csv(path)
    s.read.schema(orders.schema)
      .option("header", "true").option("timestampFormat", TsFmt)
      .csv(path)
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"), sumM(col("o_totalprice")).as("total"))
      .orderBy(col("o_orderstatus"))
  }

  /** JSON-lines sink + source roundtrip. */
  val lakeRoundtripJson: GraftQuery = GraftQuery.sql(
    "lake_roundtrip_json",
    s"""SELECT c_mktsegment, COUNT(*) AS n, ${sumMSql("c_acctbal")} AS total_bal
       |FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin
  ) { (s, d) =>
    val customer = Tables.customer(s, d)
    val path = scratch("roundtrip_json")
    customer.write.mode("overwrite").option("timestampFormat", TsFmt).json(path)
    s.read.schema(customer.schema).option("timestampFormat", TsFmt).json(path)
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n"), sumM(col("c_acctbal")).as("total_bal"))
      .orderBy(col("c_mktsegment"))
  }

  /** ORC sink + source roundtrip. */
  val lakeRoundtripOrc: GraftQuery = GraftQuery.sql(
    "lake_roundtrip_orc",
    s"""SELECT l_linestatus, COUNT(*) AS n, ${sumMSql("l_extendedprice")} AS total
       |FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin
  ) { (s, d) =>
    val path = scratch("roundtrip_orc")
    Tables.lineitem(s, d).write.mode("overwrite").orc(path)
    s.read.orc(path)
      .groupBy(col("l_linestatus"))
      .agg(count(lit(1)).as("n"), sumM(col("l_extendedprice")).as("total"))
      .orderBy(col("l_linestatus"))
  }

  /** XML roundtrip via Spark 4's BUILT-IN xml data source (rowTag
    * framing) — the remaining self-describing text format after
    * csv/json/text, closing the format matrix the reference is
    * agnostic to (the filesystem serves bytes; DFSClient.java:1 —
    * format fidelity is the engine's job). The write projects to the
    * inference-stable columns (ids + a clean string enum) and the
    * read infers schema back; roundtrip fidelity = the aggregate over
    * the read-back frame hash-equals the oracle's over the SOURCE
    * table. Customer-sized on purpose: XML is the verbose wire/legacy
    * interchange shape, not a lake layout — at 100 TB it appears at
    * INGEST boundaries (a bounded slice), never as the scan format. */
  val lakeRoundtripXml: GraftQuery = GraftQuery.sql(
    "lake_roundtrip_xml",
    """SELECT c_mktsegment, COUNT(*) AS n,
      |  CAST(SUM(c_custkey) AS BIGINT) AS key_sum,
      |  COUNT(DISTINCT c_nationkey) AS n_nations
      |FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin
  ) { (s, d) =>
    val path = scratch("roundtrip_xml")
    Tables.customer(s, d)
      .select(col("c_custkey"), col("c_nationkey"), col("c_mktsegment"))
      .write.mode("overwrite")
      .option("rootTag", "customers").option("rowTag", "customer")
      .format("xml").save(path)
    s.read.option("rowTag", "customer").format("xml").load(path)
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n"),
        sum(col("c_custkey")).cast("long").as("key_sum"),
        countDistinct(col("c_nationkey")).as("n_nations"))
      .orderBy(col("c_mktsegment"))
  }

  /** Hive-partitioned write + partition-pruned read — data placement
    * by key, the lake analogue of block placement policy
    * (namenode/BlockPlacementPolicyDefault.java). The year filter is
    * answered from directory structure, not file contents. */
  val lakePartitionedWrite: GraftQuery = GraftQuery.sql(
    "lake_partitioned_write",
    s"""SELECT o_orderstatus, COUNT(*) AS n, ${sumMSql("o_totalprice")} AS total
       |FROM orders WHERE EXTRACT(year FROM o_orderdate) = 1997
       |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin
  ) { (s, d) =>
    val path = scratch("partitioned_orders")
    Tables.orders(s, d)
      .withColumn("yr", year(col("o_orderdate")))
      .write.mode("overwrite").partitionBy("yr").parquet(path)
    s.read.parquet(path)
      .filter(col("yr") === 1997)
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"), sumM(col("o_totalprice")).as("total"))
      .orderBy(col("o_orderstatus"))
  }

  /** Small-file compaction: rewrite to a bounded file count
    * (server/balancer/Balancer.java — storage rebalanced toward a
    * target layout; here the target is partition-bytes, not replica
    * placement). */
  val lakeCompaction: GraftQuery = GraftQuery.sql(
    "lake_compaction",
    s"""SELECT event_type, COUNT(*) AS n, ${sumMSql("value")} AS total
       |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin
  ) { (s, d) =>
    val fragmented = scratch("fragmented_events")
    val compacted = scratch("compacted_events")
    val ev = Tables.events(s, d)
    ev.repartition(32).write.mode("overwrite").parquet(fragmented) // many small files
    s.read.parquet(fragmented).repartition(4)
      .write.mode("overwrite").parquet(compacted)                  // compacted
    s.read.parquet(compacted)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sumM(col("value")).as("total"))
      .orderBy(col("event_type"))
  }

  /** Content summary per source — du/count
    * (ClientProtocol.getContentSummary,
    * namenode/ContentSummaryServlet.java). */
  val lakeContentSummary: GraftQuery = GraftQuery.sql(
    "lake_content_summary",
    """SELECT source, COUNT(*) AS n_docs,
      |  CAST(SUM(n_chars) AS BIGINT) AS total_chars,
      |  CAST(MAX(n_chars) AS BIGINT) AS max_chars,
      |  CAST(MIN(doc_id) AS BIGINT) AS first_doc
      |FROM documents GROUP BY source ORDER BY source""".stripMargin
  ) { (s, d) =>
    Tables.documents(s, d)
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("total_chars"),
        max(col("n_chars")).as("max_chars"),
        min(col("doc_id")).as("first_doc"))
      .orderBy(col("source"))
  }

  /** Referential integrity audit — fsck
    * (namenode/NamenodeFsck.java: orphaned/missing block reporting,
    * re-expressed as anti-join orphan counts across the star schema). */
  val lakeFsck: GraftQuery = GraftQuery.sql(
    "lake_fsck",
    """SELECT 'lineitem_orphans' AS check_name,
      |  CAST((SELECT COUNT(*) FROM lineitem l
      |        WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)) AS BIGINT) AS n_bad
      |UNION ALL
      |SELECT 'order_orphans',
      |  CAST((SELECT COUNT(*) FROM orders o
      |        WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)) AS BIGINT)
      |UNION ALL
      |SELECT 'customer_bad_nation',
      |  CAST((SELECT COUNT(*) FROM customer c
      |        WHERE NOT EXISTS (SELECT 1 FROM nation n WHERE n.n_nationkey = c.c_nationkey)) AS BIGINT)
      |ORDER BY check_name""".stripMargin
  ) { (s, d) =>
    def orphans(name: String, left: DataFrame, right: DataFrame,
                lk: String, rk: String): DataFrame =
      left.join(right, col(lk) === col(rk), "left_anti")
        .agg(count(lit(1)).as("n_bad"))
        .select(lit(name).as("check_name"), col("n_bad"))
    orphans("lineitem_orphans", Tables.lineitem(s, d), Tables.orders(s, d), "l_orderkey", "o_orderkey")
      .union(orphans("order_orphans", Tables.orders(s, d), Tables.customer(s, d), "o_custkey", "c_custkey"))
      .union(orphans("customer_bad_nation", Tables.customer(s, d), Tables.nation(s, d), "c_nationkey", "n_nationkey"))
      .orderBy(col("check_name"))
  }

  /** Namespace + space quota audit per source directory
    * (namenode/INodeDirectoryWithQuota.java; NSQuotaExceededException /
    * DSQuotaExceededException). */
  val lakeQuota: GraftQuery = GraftQuery.sql(
    "lake_quota",
    """SELECT source, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS used_chars,
      |  COUNT(*) > 30 AS over_ns_quota,
      |  SUM(n_chars) > 12000 AS over_space_quota
      |FROM documents GROUP BY source ORDER BY source""".stripMargin
  ) { (s, d) =>
    Tables.documents(s, d)
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("used_chars"),
        (count(lit(1)) > 30).as("over_ns_quota"),
        (sum(col("n_chars")) > 12000).as("over_space_quota"))
      .orderBy(col("source"))
  }

  /** Deterministic content checksum per language group — the
    * MD5-of-CRC shape (DistributedFileSystem.getFileChecksum):
    * order-independent combination (sum mod P) of per-doc rolling
    * hashes, so the result is stable under any execution order. */
  val lakeChecksum: GraftQuery = GraftQuery.sql(
    "lake_checksum",
    s"""WITH fp AS (SELECT lang, ${GraftHash.charHashSql("text")} AS fp FROM documents)
       |SELECT lang, COUNT(*) AS n_docs,
       |  CAST(SUM(fp) % ${GraftHash.P} AS BIGINT) AS checksum,
       |  CAST(MIN(fp) AS BIGINT) AS min_fp, CAST(MAX(fp) AS BIGINT) AS max_fp
       |FROM fp GROUP BY lang ORDER BY lang""".stripMargin
  ) { (s, d) =>
    Tables.documents(s, d)
      .select(col("lang"), GraftHash.charHash(col("text")).as("fp"))
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        (sum(col("fp")) % GraftHash.P).as("checksum"),
        min(col("fp")).as("min_fp"),
        max(col("fp")).as("max_fp"))
      .orderBy(col("lang"))
  }

  /** Versioned snapshots ON the commit log (FSImage.java checkpoints
    * + FSEditLog.java journal, unified): each snapshot is a commit —
    * v0 lands the narrow view, v1 replaces it with the widened one
    * (remove+add in a single atomic commit) — and each point-in-time
    * read is a journal replay of that version. Old snapshot files are
    * never rewritten; history stays readable until retention drops
    * it. */
  val lakeSnapshot: GraftQuery = GraftQuery.sql(
    "lake_snapshot",
    """SELECT 'v1' AS version, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS total_chars
      |FROM documents WHERE n_chars > 200
      |UNION ALL
      |SELECT 'v2', COUNT(*), CAST(SUM(n_chars) AS BIGINT)
      |FROM documents WHERE n_chars > 100
      |ORDER BY version""".stripMargin
  ) { (s, d) =>
    import graft.sources.CommitLog
    val fs = org.apache.hadoop.fs.FileSystem.get(s.sparkContext.hadoopConfiguration)
    val dir = scratch("snapshots/docs_log")
    fs.delete(new org.apache.hadoop.fs.Path(dir), true)
    val docs = Tables.documents(s, d)
    CommitLog.writeCommit(s, dir, docs.filter(col("n_chars") > 200), "data/narrow", ts = 1000L)
    docs.filter(col("n_chars") > 100).write.mode("overwrite").parquet(s"$dir/data/wide")
    CommitLog.commit(fs, dir, ts = 2000L,
      adds = Seq("data/wide"), removes = Seq("data/narrow"))
    def summarize(df: DataFrame, v: String): DataFrame =
      df.agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("total_chars"))
        .select(lit(v).as("version"), col("n_docs"), col("total_chars"))
    summarize(CommitLog.snapshot(s, dir, version = 0), "v1")
      .union(summarize(CommitLog.snapshot(s, dir, version = 1), "v2"))
      .orderBy(col("version"))
  }

  /** Namespace lifecycle: write -> rename -> read-at-new-path ->
    * delete-old (ClientProtocol.rename/delete; DFSClient.rename).
    * Every step's verdict is computed from real FS state and every
    * step's row count is recomputable from the source table, so the
    * gate checks the full (step, ok, n_rows) shape — the oracle
    * declares the all-steps-succeed contract with the write/read
    * counts recounted from `region` (r7 verdict #6: rows-only
    * entries must pin their schema). */
  val lakeLifecycle: GraftQuery = GraftQuery.sql(
    "lake_lifecycle",
    """WITH rc AS (SELECT COUNT(*) AS n FROM region)
      |SELECT step, ok, n_rows FROM (
      |  SELECT 'write_stage' AS step, TRUE AS ok, rc.n AS n_rows FROM rc
      |  UNION ALL SELECT 'rename', TRUE, CAST(0 AS BIGINT) FROM rc
      |  UNION ALL SELECT 'read_after_rename', TRUE, rc.n FROM rc
      |  UNION ALL SELECT 'stage_removed', TRUE, CAST(0 AS BIGINT) FROM rc
      |  UNION ALL SELECT 'delete', TRUE, CAST(0 AS BIGINT) FROM rc)
      |ORDER BY step""".stripMargin
  ) { (s, d) =>
    import s.implicits._
    val fs = org.apache.hadoop.fs.FileSystem.get(s.sparkContext.hadoopConfiguration)
    val stage = new org.apache.hadoop.fs.Path(scratch("lifecycle/stage"))
    val fin = new org.apache.hadoop.fs.Path(scratch("lifecycle/final"))
    fs.delete(stage, true); fs.delete(fin, true)
    val src = Tables.region(s, d)
    val staged = src.count()
    src.write.parquet(stage.toString)
    // the contract-carrying namespace verbs (reference refusal
    // semantics pinned in NamespaceContractSpec; TestDFSRename.java /
    // TestDFSShell.java contracts enforced above the backing store)
    val renamed = Namespace.renameStrict(fs, stage, fin)
    val rowsAtFinal = s.read.parquet(fin.toString).count()
    val stageGone = !fs.exists(stage)
    val deleted = Namespace.deleteStrict(fs, fin, recursive = true)
    Seq(
      ("write_stage", true, staged),
      ("rename", renamed, 0L),
      ("read_after_rename", rowsAtFinal == staged, rowsAtFinal),
      ("stage_removed", stageGone, 0L),
      ("delete", deleted, 0L)
    ).toDF("step", "ok", "n_rows")
      .orderBy(col("step"))
  }

  /** Concat: multiple part-dirs combined into one logical dataset
    * (ClientProtocol.concat / FileSystem.concat) — here a multi-path
    * read union, checksummed against the single-source truth. */
  val lakeConcat: GraftQuery = GraftQuery.sql(
    "lake_concat",
    """SELECT COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS total_chars
      |FROM documents""".stripMargin
  ) { (s, d) =>
    val partA = scratch("concat/part_a")
    val partB = scratch("concat/part_b")
    val docs = Tables.documents(s, d)
    docs.filter(col("doc_id") % 2 === 0).write.mode("overwrite").parquet(partA)
    docs.filter(col("doc_id") % 2 =!= 0).write.mode("overwrite").parquet(partB)
    s.read.parquet(partA, partB)
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("total_chars"))
  }

  /** Schema evolution: a v1 batch lands without a column, a later v2
    * batch adds it; a mergeSchema read unifies the layouts and v1 rows
    * surface NULL for the new column (coalesced to a legacy marker).
    * The lake-format capability every long-lived 100 TB table needs —
    * old files are never rewritten when the schema widens. */
  val lakeSchemaEvolution: GraftQuery = GraftQuery.sql(
    "lake_schema_evolution",
    s"""SELECT CASE WHEN o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
       |            THEN o_orderpriority ELSE 'LEGACY' END AS priority,
       |  COUNT(*) AS n, ${sumMSql("o_totalprice")} AS total
       |FROM orders GROUP BY priority ORDER BY priority""".stripMargin
  ) { (s, d) =>
    val path = scratch("evolving_orders")
    val o = Tables.orders(s, d)
    val cut = lit("1997-01-01").cast("timestamp")
    o.filter(col("o_orderdate") < cut)
      .select(col("o_orderkey"), col("o_totalprice"))
      .write.mode("overwrite").parquet(path)
    o.filter(col("o_orderdate") >= cut)
      .select(col("o_orderkey"), col("o_totalprice"), col("o_orderpriority"))
      .write.mode("append").parquet(path)
    s.read.option("mergeSchema", "true").parquet(path)
      .groupBy(coalesce(col("o_orderpriority"), lit("LEGACY")).as("priority"))
      .agg(count(lit(1)).as("n"), sumM(col("o_totalprice")).as("total"))
      .orderBy(col("priority"))
  }

  /** Retention: expire rows older than a cutoff by rewriting the
    * table version (the lake analogue of trash emptying —
    * namenode/NameNode.java:474 startTrashEmptier,
    * protocol/ClientProtocol.java:440 delete; at scale this is a
    * partition-pruned rewrite of only the partitions straddling the
    * cutoff, not a full-table pass). */
  val lakeRetention: GraftQuery = GraftQuery.sql(
    "lake_retention",
    s"""SELECT event_type, COUNT(*) AS n, ${sumMSql("value")} AS total
       |FROM events WHERE ts >= TIMESTAMP '2024-01-20 00:00:00'
       |GROUP BY event_type ORDER BY event_type""".stripMargin
  ) { (s, d) =>
    val v1 = scratch("retained_events_v1")
    val v2 = scratch("retained_events_v2")
    Tables.events(s, d).write.mode("overwrite").parquet(v1)
    s.read.parquet(v1)
      .filter(col("ts") >= lit("2024-01-20").cast("timestamp"))
      .write.mode("overwrite").parquet(v2)
    s.read.parquet(v2)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sumM(col("value")).as("total"))
      .orderBy(col("event_type"))
  }

  /** Zone-map manifest: per-partition min/max/count statistics
    * collected from a partitioned layout — the pruning metadata a
    * scan planner consults before touching data (the block-report /
    * blocksMap analogue: namenode/BlocksMap.java:1 tracks where data
    * lives; a zone map tracks what ranges live there). At 100 TB this
    * manifest is what turns a key-range predicate into a partition
    * subset without reading a single data page. */
  val lakeStatsManifest: GraftQuery = GraftQuery.sql(
    "lake_stats_manifest",
    """SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS yr,
      |  COUNT(*) AS n_rows,
      |  CAST(MIN(o_orderkey) AS BIGINT) AS min_key,
      |  CAST(MAX(o_orderkey) AS BIGINT) AS max_key,
      |  MIN(o_totalprice) AS min_price, MAX(o_totalprice) AS max_price
      |FROM orders GROUP BY yr ORDER BY yr""".stripMargin
  ) { (s, d) =>
    val path = scratch("manifest_orders")
    Tables.orders(s, d)
      .withColumn("yr", year(col("o_orderdate")))
      .write.mode("overwrite").partitionBy("yr").parquet(path)
    s.read.parquet(path)
      .groupBy(col("yr").cast("long").as("yr"))
      .agg(count(lit(1)).as("n_rows"),
        min(col("o_orderkey")).as("min_key"), max(col("o_orderkey")).as("max_key"),
        min(col("o_totalprice")).as("min_price"), max(col("o_totalprice")).as("max_price"))
      .orderBy(col("yr"))
  }

  /** Commit-log time travel: a versioned table whose state is an
    * append-only journal of add/remove-file actions (sources.CommitLog
    * — the FSEditLog half of the reference's FSImage+FSEditLog
    * durability pair; lake_snapshot is the FSImage half). Four commits
    * build insert/insert/delete/insert history; the query reads the
    * table at version 0, version 1, a wall-clock instant between
    * commits 2 and 3 (timestamp time travel), and latest. The oracle
    * recomputes each version's expected content from the base table.
    * Replay is driver-side metadata only; each read is an ordinary
    * pruned parquet scan of the active files. */
  val lakeTimeTravel: GraftQuery = GraftQuery.sql(
    "lake_time_travel",
    s"""SELECT 0 AS version, COUNT(*) AS n_rows, ${sumMSql("o_totalprice")} AS total
       |FROM orders WHERE o_orderkey % 3 = 0
       |UNION ALL
       |SELECT 1, COUNT(*), ${sumMSql("o_totalprice")}
       |FROM orders WHERE o_orderkey % 3 IN (0, 1)
       |UNION ALL
       |SELECT 2, COUNT(*), ${sumMSql("o_totalprice")}
       |FROM orders WHERE o_orderkey % 3 = 1
       |UNION ALL
       |SELECT 3, COUNT(*), ${sumMSql("o_totalprice")}
       |FROM orders WHERE o_orderkey % 3 IN (1, 2)
       |ORDER BY version""".stripMargin
  ) { (s, d) =>
    import graft.sources.CommitLog
    val fs = org.apache.hadoop.fs.FileSystem.get(s.sparkContext.hadoopConfiguration)
    val dir = scratch("timetravel_orders")
    fs.delete(new org.apache.hadoop.fs.Path(dir), true)
    val o = Tables.orders(s, d)
    def slice(r: Int) = o.filter(col("o_orderkey") % 3 === r)
    CommitLog.writeCommit(s, dir, slice(0), "data/mod0", ts = 1000L)  // v0: insert
    CommitLog.writeCommit(s, dir, slice(1), "data/mod1", ts = 2000L)  // v1: insert
    CommitLog.commit(fs, dir, ts = 3000L, adds = Nil, removes = Seq("data/mod0")) // v2: delete
    CommitLog.writeCommit(s, dir, slice(2), "data/mod2", ts = 4000L)  // v3: insert
    def summarize(v: Int, df: DataFrame): DataFrame =
      df.agg(count(lit(1)).as("n_rows"), sumM(col("o_totalprice")).as("total"))
        .select(lit(v).as("version"), col("n_rows"), col("total"))
    summarize(0, CommitLog.snapshot(s, dir, version = 0))
      .union(summarize(1, CommitLog.snapshot(s, dir, version = 1)))
      .union(summarize(2, CommitLog.snapshotAsOf(s, dir, asOfMillis = 3500L)))
      .union(summarize(3, CommitLog.snapshot(s, dir)))
      .orderBy(col("version"))
  }

  /** Operational health profile of a partitioned layout — the
    * block-report / metrics surface operators actually page on
    * (reference DFSClient.java:1240 getMissingBlocksCount,
    * DFSClient.java:1230 getDiskStatus, metrics/ package): per
    * partition, row count, physical file count (driver-side listing —
    * a block report, no data scan), rows-per-file fill, skew against
    * the mean partition, and a small-files flag. The layout is written
    * with a fixed fan-in (repartition(4) before partitionBy), so the
    * expected file count is part of the op's contract and the oracle
    * checks the physical listing against it. Contract bound: a
    * partition value yields 4 files when its rows touch all 4 hash
    * partitions of o_orderkey — certain for the gate's scale factors
    * (rarest status ~4% of rows; P[missing a partition] < 1e-7 at
    * sf0.001 and vanishing above), degenerate only for single-digit
    * partition counts. */
  val lakeHealth: GraftQuery = GraftQuery.sql(
    "lake_health",
    """WITH p AS (SELECT o_orderstatus, COUNT(*) AS n_rows FROM orders GROUP BY 1),
      |t AS (SELECT CAST(SUM(n_rows) AS DOUBLE) AS total, COUNT(*) AS np FROM p)
      |SELECT o_orderstatus, n_rows, CAST(4 AS BIGINT) AS n_files,
      |  CAST(n_rows AS DOUBLE) / 4 AS rows_per_file,
      |  CAST(n_rows AS DOUBLE) / (t.total / t.np) AS skew_ratio,
      |  CAST(n_rows AS DOUBLE) / 4 < 10000 AS small_files
      |FROM p, t ORDER BY o_orderstatus""".stripMargin
  ) { (s, d) =>
    import s.implicits._
    val path = scratch("health_orders")
    Tables.orders(s, d)
      .repartition(4, col("o_orderkey"))
      .write.mode("overwrite").partitionBy("o_orderstatus").parquet(path)
    // Block report: physical file counts from a metadata-only listing.
    val fs = org.apache.hadoop.fs.FileSystem.get(s.sparkContext.hadoopConfiguration)
    val fileCounts = fs.listStatus(new org.apache.hadoop.fs.Path(path)).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("o_orderstatus="))
      .map { st =>
        val status = st.getPath.getName.stripPrefix("o_orderstatus=")
        val n = fs.listStatus(st.getPath).count(_.getPath.getName.startsWith("part-"))
        (status, n.toLong)
      }.toDF("fc_status", "n_files")
    val counts = s.read.parquet(path)
      .groupBy(col("o_orderstatus")).agg(count(lit(1)).as("n_rows"))
    val totals = counts.agg(
      sum(col("n_rows")).cast("double").as("total"), count(lit(1)).as("np"))
    counts
      .join(broadcast(fileCounts), col("o_orderstatus") === col("fc_status"))
      .crossJoin(broadcast(totals))
      .select(col("o_orderstatus"), col("n_rows"), col("n_files"),
        (col("n_rows").cast("double") / col("n_files")).as("rows_per_file"),
        (col("n_rows").cast("double") / (col("total") / col("np"))).as("skew_ratio"),
        (col("n_rows").cast("double") / col("n_files") < 10000).as("small_files"))
      .orderBy(col("o_orderstatus"))
  }

  /** Ownership + permission audit over the source namespace
    * (reference protocol/ClientProtocol.java:230 setPermission, :247
    * setOwner, server/namenode/FSPermissionChecker.java): the lake
    * maintains an ACL manifest (owner/group/mode per source dir),
    * chown/chmod are manifest transforms (api.Graft.lake), and the
    * audit joins the manifest with content stats to flag
    * world-readable entries. The oracle recomputes the manifest
    * end-state in SQL. */
  val lakeAclAudit: GraftQuery = GraftQuery.sql(
    "lake_acl_audit",
    """WITH ns AS (SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY source),
      |acl AS (SELECT source,
      |  CASE WHEN source LIKE 'src1%' THEN 'web-team' ELSE 'ingest' END AS owner,
      |  'data' AS grp,
      |  CASE WHEN length(source) = 4 THEN 644 ELSE 640 END AS mode,
      |  n_docs FROM ns)
      |SELECT source, owner, grp, mode, n_docs, mode % 10 >= 4 AS world_readable
      |FROM acl ORDER BY source""".stripMargin
  ) { (s, d) =>
    import graft.api.Graft
    val manifest = Tables.documents(s, d)
      .groupBy(col("source")).agg(count(lit(1)).as("n_docs"))
      .select(col("source"), lit("ingest").as("owner"), lit("data").as("grp"),
        lit(640).as("mode"), col("n_docs"))
    val owned = Graft.lake.chown(manifest, col("source").startsWith("src1"), "web-team")
    val moded = Graft.lake.chmod(owned, length(col("source")) === 4, 644)
    Graft.lake.permissionAudit(moded)
      .orderBy(col("source"))
  }

  /** Per-group replica placement across named FAILURE DOMAINS —
    * which domain hosts which group's replicas. The control plane is
    * driver-side metadata (the NameNode's placement map,
    * server/namenode/BlockPlacementPolicyDefault.java:1): the group
    * list is the bounded collect class (languages, not rows), and
    * the OFF-DOMAIN RULE is enforced by construction — the second
    * replica's domain is derived so it can never equal the first
    * (the reference's 2nd-replica-off-rack invariant). */
  def placeReplicas(groups: Seq[String], nDomains: Int): Seq[(String, Int, Int)] = {
    // floorMod, not abs+%: math.abs(Int.MinValue) is still negative,
    // which would yield a negative domain index (ADVICE r9); and the
    // off-domain rule needs at least two domains to choose from.
    require(nDomains >= 2, s"off-domain placement needs >=2 domains, got $nDomains")
    groups.map { g =>
      val h = g.hashCode
      val d1 = Math.floorMod(h, nDomains)
      val off = Math.floorMod(h / nDomains, nDomains - 1)
      (g, d1, (d1 + 1 + off) % nDomains)
    }
  }

  /** Mirror / disaster-recovery replication with verify-after-copy
    * AND failure-domain-aware placement — the full durability intent
    * of the reference's replication stack
    * (protocol/DataTransferProtocol.java:1 per-packet pipeline
    * checksums; protocol/ClientProtocol.java:216 setReplication;
    * server/namenode/BlockPlacementPolicyDefault.java:1 — the 2nd
    * replica goes OFF-RACK, and verifyBlockPlacement asserts no
    * block's replicas collapse into one rack). Each group (lang) is
    * a block: two replicas, placed by `placeReplicas` so the second
    * is off-domain by construction, each written as one
    * lang-partitioned distributed write per domain (no driver byte
    * path). The ceremony then KILLS an entire domain — the rack
    * failure the policy exists for — proves the survivors still
    * serve every group (one replica always lives elsewhere: that is
    * the invariant), RE-REPLICATES each affected group from its
    * surviving replica into a fresh domain (data I/O proportional to
    * the lost replicas, the UnderReplicatedBlocks queue shape —
    * server/namenode/UnderReplicatedBlocks.java:1), and re-audits:
    * every group back at 2 replicas in 2 distinct domains, every
    * replica checksum-identical. At 100 TB: placement is metadata,
    * replication and repair are partition-pruned distributed
    * read→writes, verification is one aggregation scan per domain. */
  val lakeMirror: GraftQuery = GraftQuery.sql(
    "lake_mirror",
    s"""WITH fp AS (SELECT lang, ${GraftHash.charHashSql("text")} AS fp FROM documents)
       |SELECT lang, COUNT(*) AS n_docs,
       |  CAST(SUM(fp) % ${GraftHash.P} AS BIGINT) AS checksum,
       |  CAST(2 AS BIGINT) AS n_domains,
       |  TRUE AS mirror_ok, TRUE AS placement_ok, TRUE AS domain_repaired
       |FROM fp GROUP BY lang ORDER BY lang""".stripMargin
  ) { (s, d) =>
    val fs = FileSystem.get(s.sparkContext.hadoopConfiguration)
    val domains = Vector("dc1_rackA", "dc1_rackB", "dc2_rackA")
      .map(n => scratch(s"mirror/dom/$n"))
    domains.foreach(p => fs.delete(new Path(p), true))
    val docs = Tables.documents(s, d)
    // control plane: bounded collect of the GROUP list (langs), then
    // deterministic two-replica placement with the off-domain rule
    val groups = docs.select(col("lang")).distinct()
      .collect().map(_.getString(0)).toSeq.sorted
    val assign = placeReplicas(groups, domains.size)
    require(assign.forall { case (_, a, b) => a != b },
      "placement violated its own off-domain rule")
    // replication: one lang-partitioned write per domain of the langs
    // it hosts (each group's bytes written once per replica) — the
    // three domain writes are disjoint directories, submitted
    // concurrently (real replication streams to racks in parallel)
    Lake.concurrently(domains.indices) { i =>
      val hosted = assign.collect { case (g, a, b) if a == i || b == i => g }
      if (hosted.nonEmpty)
        docs.filter(col("lang").isin(hosted: _*))
          .write.mode("overwrite").partitionBy("lang").parquet(domains(i))
    }
    def audit(): DataFrame = domains.indices
      .filter(i => fs.exists(new Path(domains(i))))
      .map { i =>
        graft.api.Graft.lake.groupChecksum(s.read.parquet(domains(i)), "text", "lang")
          .select(col("lang"), lit(i.toLong).as("domain"),
            col("n_rows"), col("checksum"))
      }.reduce(_ union _)
    def perGroup(a: DataFrame): DataFrame = a.groupBy(col("lang")).agg(
      count(lit(1)).as("n_replicas"),
      countDistinct(col("domain")).as("n_domains"),
      countDistinct(col("n_rows")).as("n_counts"),
      countDistinct(col("checksum")).as("n_cks"),
      max(col("n_rows")).as("n_docs"), max(col("checksum")).as("ck"))
    // pre-loss: the placement invariant holds for every group
    val pre = perGroup(audit()).collect()
    require(pre.forall(r => r.getAs[Long]("n_domains") == 2L &&
      r.getAs[Long]("n_cks") == 1L), "pre-loss placement/parity broken")
    // rack failure: an entire domain dies
    fs.delete(new Path(domains(0)), true)
    val affected = assign.filter { case (_, a, b) => a == 0 || b == 0 }
    require(affected.nonEmpty, "scenario degenerate: dead domain hosted nothing")
    // the invariant pays off: every affected group still serves from
    // its off-domain replica
    val post = perGroup(audit()).collect()
    require(post.length == groups.size && post.forall(_.getAs[Long]("n_replicas") >= 1L),
      "a group lost ALL replicas — off-domain placement failed")
    // re-replication from the surviving replica into a fresh domain,
    // copying ONLY the affected partitions — per-group copies target
    // distinct lang= subdirectories, so they too run concurrently
    // (the UnderReplicatedBlocks queue drains in parallel)
    Lake.concurrently(affected) { case (g, a, b) =>
      val surviving = if (a == 0) b else a
      val target = (1 until domains.size).filter(_ != surviving).head
      s.read.parquet(s"${domains(surviving)}/lang=$g")
        .write.mode("overwrite").parquet(s"${domains(target)}/lang=$g")
    }
    // the repaired audit feeds BOTH the invariant assertions and the
    // query output — materialize it ONCE via eager localCheckpoint so
    // the two-domain scan doesn't re-run for the output. NOT
    // ScopedCache/persist: CacheManager keys by canonical plan, and
    // this ceremony's audit plan is canonically IDENTICAL across
    // invocations (same root paths, file listings don't participate
    // in plan identity) — a registered cache entry from a previous
    // invocation in the same JVM would silently substitute the OLD
    // run's audit (stale listing ⇒ FILE_NOT_EXIST or stale parity)
    // for this run's. localCheckpoint materializes into executor
    // blocks with no cache-identity registration.
    val repaired = perGroup(audit()).localCheckpoint()
    repaired.collect().foreach { r =>
      require(r.getAs[Long]("n_domains") == 2L && r.getAs[Long]("n_cks") == 1L
        && r.getAs[Long]("n_counts") == 1L,
        s"post-repair placement/parity broken for ${r.getAs[String]("lang")}")
    }
    repaired.select(col("lang"), col("n_docs"), col("ck").as("checksum"),
        col("n_domains"),
        (col("n_cks") === 1 && col("n_counts") === 1).as("mirror_ok"),
        (col("n_domains") >= 2).as("placement_ok"),
        lit(true).as("domain_repaired"))
      .orderBy(col("lang"))
  }

  /** Table statistics profile — the ANALYZE surface a cost-based
    * planner consults (reference protocol/ClientProtocol.java:574
    * getStats + the namenode metrics/ package expose namespace-level
    * statistics; per-COLUMN stats are their table analogue, feeding
    * join-order and broadcast decisions the way block counts feed
    * placement). ONE pass over the table computes every column's
    * null count, exact distinct count, and min/max (Spark rewrites
    * the multi-distinct aggregate with a single expand — no
    * per-column scans); values surface as strings so the profile has
    * one schema for any column type. */
  val lakeAnalyze: GraftQuery = {
    val cols = Seq("o_custkey", "o_orderkey", "o_orderpriority", "o_orderstatus")
    GraftQuery.sql(
      "lake_analyze",
      cols.map { c =>
        s"""SELECT '$c' AS col_name, COUNT(*) AS n_rows,
           |  CAST(SUM(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
           |  CAST(COUNT(DISTINCT $c) AS BIGINT) AS n_distinct,
           |  CAST(MIN($c) AS VARCHAR) AS min_val, CAST(MAX($c) AS VARCHAR) AS max_val
           |FROM orders""".stripMargin
      }.mkString("", "\nUNION ALL\n", "\nORDER BY col_name")
    ) { (s, d) =>
      val o = Tables.orders(s, d)
      val agg = o.agg(
        count(lit(1)).as("n_rows"),
        cols.flatMap(c => Seq(
          sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}_nulls"),
          countDistinct(col(c)).as(s"${c}_distinct"),
          min(col(c)).cast("string").as(s"${c}_min"),
          max(col(c)).cast("string").as(s"${c}_max"))): _*)
      agg.select(col("n_rows"), explode(array(cols.map(c => struct(
          lit(c).as("col_name"),
          col(s"${c}_nulls").as("n_nulls"),
          col(s"${c}_distinct").as("n_distinct"),
          col(s"${c}_min").as("min_val"),
          col(s"${c}_max").as("max_val"))): _*)).as("p"))
        .select(col("p.col_name"), col("n_rows"), col("p.n_nulls"),
          col("p.n_distinct"), col("p.min_val"), col("p.max_val"))
        .orderBy(col("col_name"))
    }
  }

  def all: Seq[GraftQuery] = Seq(
    lakeAnalyze,
    lakeScan, lakeRoundtripCsv, lakeRoundtripJson, lakeRoundtripOrc, lakeRoundtripXml,
    lakePartitionedWrite, lakeCompaction, lakeContentSummary, lakeFsck,
    lakeQuota, lakeChecksum, lakeSnapshot, lakeLifecycle, lakeConcat,
    lakeSchemaEvolution, lakeRetention, lakeStatsManifest,
    lakeTimeTravel, lakeHealth, lakeAclAudit, lakeMirror)
}
