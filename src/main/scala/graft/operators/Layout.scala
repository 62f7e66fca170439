package graft.operators

import graft.{GraftQuery, Tables}
import graft.functions.Parity._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Physical-layout operators: multi-dimensional clustering and
  * threshold-gated (incremental) compaction.
  *
  * Reference analogue: block placement IS the physical layout lever
  * in the reference (namenode/BlockPlacementPolicyDefault.java:1
  * chooses where bytes live; server/balancer/Balancer.java:1 moves
  * them toward a target). In a columnar lake the same lever is file
  * clustering: which rows co-reside in which files decides how much
  * a selective scan must read. lake_zorder is placement-by-key in two
  * dimensions at once; lake_compact_incremental is the balancer run
  * as an incremental, threshold-gated maintenance pass.
  */
object Layout {

  /** Z-value: bit-interleave two non-negative int columns (16 bits
    * each → 32-bit z-curve position). Pure codegen'd builtins —
    * shifts and masks fold into one whole-stage-codegen projection. */
  private[graft] def zValue(a: org.apache.spark.sql.Column,
                            b: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    (0 until 16).map { i =>
      val abit = shiftleft(shiftrightunsigned(a, i).bitwiseAND(lit(1L)), 2 * i + 1)
      val bbit = shiftleft(shiftrightunsigned(b, i).bitwiseAND(lit(1L)), 2 * i)
      abit.bitwiseOR(bbit)
    }.reduce(_.bitwiseOR(_))

  private[graft] def zorderedPath(d: String): String = {
    val suffix = d.replaceAll("[^A-Za-z0-9]", "_")
    Lake.scratch(s"zorder_lineitem_$suffix")
  }

  /** Provision the z-ordered lineitem copy once per source version:
    * range-partitioned + sorted by z(l_partkey, l_suppkey), so every
    * file covers a small rectangle of the (partkey, suppkey) plane
    * and a 2-dim box predicate prunes most files on min/max stats.
    * Metadata-only staleness gate, same discipline as every other
    * amortized layout (Lake.provisionIfStale). */
  private[graft] def ensureZordered(s: SparkSession, d: String): String = {
    val path = zorderedPath(d)
    val fs = org.apache.hadoop.fs.FileSystem.get(s.sparkContext.hadoopConfiguration)
    val sig = Lake.sourceSig(fs, new org.apache.hadoop.fs.Path(s"$d/lineitem.parquet"))
    Lake.provisionIfStale(fs, path, sig) {
      Tables.lineitem(s, d)
        .withColumn("zv", zValue(col("l_partkey"), col("l_suppkey")))
        .repartitionByRange(16, col("zv"))
        .sortWithinPartitions(col("zv"))
        .drop("zv")
        .write.mode("overwrite").parquet(path)
    }
    path
  }

  /** Z-ORDER clustering: a 2-dim box predicate over the z-ordered
    * layout. Correctness is layout-independent (the oracle runs the
    * same predicate on the original table); the LayoutSpec asserts
    * the scale property — most files' (partkey, suppkey) min/max
    * rectangles miss the box, so parquet row-group stats skip them.
    * A single-key sort can only prune one of the two dimensions;
    * the z-curve bounds both. */
  val lakeZorder: GraftQuery = GraftQuery.sql(
    "lake_zorder",
    s"""SELECT l_returnflag, COUNT(*) AS n, ${sumMSql("l_extendedprice")} AS revenue
       |FROM lineitem
       |WHERE l_partkey BETWEEN 20 AND 79 AND l_suppkey BETWEEN 2 AND 5
       |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin
  ) { (s, d) =>
    val path = ensureZordered(s, d)
    s.read.parquet(path)
      .filter(col("l_partkey").between(20, 79) && col("l_suppkey").between(2, 5))
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"), sumM(col("l_extendedprice")).as("revenue"))
      .orderBy(col("l_returnflag"))
  }

  /** One hive-style partition dir per event_type, written with a
    * chosen file count (fragmentation model: hot partitions accrete
    * many small appends, cold ones few). */
  private[graft] def writeFragmented(s: SparkSession, d: String, base: String): Unit = {
    val ev = Tables.events(s, d)
    val types = Seq("click" -> 24, "view" -> 2, "purchase" -> 2, "signup" -> 2, "error" -> 2)
    // five disjoint partition-dir writes — submit concurrently: each
    // job is a pushed-down type filter over a few tasks, so run
    // serially they cost 5× fixed job latency on idle cores
    Lake.concurrently(types) { case (t, files) =>
      ev.filter(col("event_type") === t).drop("event_type")
        .repartition(files)
        .write.mode("overwrite").parquet(s"$base/event_type=$t")
    }
  }

  /** Compact only the partitions whose small-file count exceeds the
    * threshold; others are untouched. */
  private[graft] def compactOver(s: SparkSession, base: String, threshold: Int): Unit = {
    val fs = org.apache.hadoop.fs.FileSystem.get(s.sparkContext.hadoopConfiguration)
    val dirs = fs.listStatus(new org.apache.hadoop.fs.Path(base)).filter(_.isDirectory)
    dirs.foreach { st =>
      val nFiles = fs.listStatus(st.getPath)
        .count(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
      if (nFiles > threshold) {
        val tmp = new org.apache.hadoop.fs.Path(st.getPath.getParent, s".compact_${st.getPath.getName}")
        s.read.parquet(st.getPath.toString).coalesce(2)
          .write.mode("overwrite").parquet(tmp.toString)
        fs.delete(st.getPath, true)
        fs.rename(tmp, st.getPath)
        ()
      }
    }
  }

  /** INCREMENTAL compaction: the balancer as a maintenance cadence.
    * Full-table rewrite compaction (lake_compaction) re-pays the
    * whole write every run — at 100 TB that is the dominant cost, and
    * almost all of it is wasted on partitions that were already
    * compact. This pass lists file counts per partition (pure
    * metadata, namenode-style) and rewrites ONLY partitions over the
    * small-file threshold; the spec asserts the hot partition
    * collapsed while a cold partition's files were not rewritten.
    * (reference server/balancer/Balancer.java:1 — iterates until
    * utilization is within threshold, moving only over-full nodes.) */
  val lakeCompactIncremental: GraftQuery = GraftQuery.sql(
    "lake_compact_incremental",
    s"""SELECT event_type, COUNT(*) AS n, ${sumMSql("value")} AS total
       |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin
  ) { (s, d) =>
    val base = Lake.scratch("incremental_compact_events")
    writeFragmented(s, d, base)
    compactOver(s, base, threshold = 8)
    s.read.option("basePath", base).parquet(base)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sumM(col("value")).as("total"))
      .orderBy(col("event_type"))
  }

  /** Per-file zone-map stats (kmin/kmax of the clustering key) over
    * exactly the given files — the metadata a lakehouse extracts from
    * parquet footers as it writes them. */
  private def cowStats(s: SparkSession, files: Seq[String]): DataFrame =
    s.read.parquet(files: _*)
      .groupBy(input_file_name().as("file"))
      .agg(min("l_orderkey").as("kmin"), max("l_orderkey").as("kmax"))

  private def listDataFiles(fs: org.apache.hadoop.fs.FileSystem, dir: String): Set[String] =
    fs.listStatus(new org.apache.hadoop.fs.Path(dir))
      .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
      .map(_.getPath.getName).toSet

  /** Lay out the COW table: range-clustered data files PLUS the
    * zone-map manifest, written AT LAYOUT TIME (when the rows are in
    * hand anyway) under `_manifest` — underscore-prefixed, so Spark's
    * file listing hides it from table reads. This is the one and only
    * full pass over the data; every later delete consults the
    * manifest as metadata. */
  private[graft] def writeCowLayout(s: SparkSession, d: String, dir: String): Unit = {
    val fs = org.apache.hadoop.fs.FileSystem.get(s.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(dir), true)
    // FILE-SIZE-BOUNDED range layout (SCALE_r10: the fixed-8-file
    // variant made each file grow linearly with the table, so the
    // delete's one-file rewrite unit grew linearly too — 2.7x at 10x
    // data for a metadata-claimed op). A selective COW delete's cost
    // driver is the SIZE of the touched file, not the file count:
    // cap rows-per-file so the rewrite unit is constant at any
    // scale, and let the file count (= manifest rows, metadata)
    // carry the growth. The row count is a parquet-footer read.
    val rows = Tables.lineitem(s, d).count()
    val parts = math.max(8, math.ceil(rows / 65536.0).toInt)
    // deliberately UNcached double read: repartitionByRange's range
    // sampler scans only the pruned key column from parquet — a
    // cache here would force full-width materialization during the
    // sampling job and cost more than the second scan it saves
    // (measured: +0.9 s at sf0.1)
    Tables.lineitem(s, d)
      .repartitionByRange(parts, col("l_orderkey"))
      .sortWithinPartitions(col("l_orderkey"))
      .write.parquet(dir)
    cowStats(s, Seq(dir)).coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/_manifest")
  }

  /** COW delete against the persisted manifest: reads the manifest
    * (file-count rows, metadata-scale), rewrites ONLY the files whose
    * [kmin,kmax] intersects [lo,hi], drops the originals, and patches
    * the manifest — replacement-file stats come from scanning just
    * the replacements. NO full-table read happens at delete time (the
    * spec proves it by corrupting a non-intersecting file and
    * asserting the delete still succeeds). Returns the touched files. */
  private[graft] def cowDelete(s: SparkSession, dir: String, lo: Long, hi: Long): Seq[String] = {
    val fs = org.apache.hadoop.fs.FileSystem.get(s.sparkContext.hadoopConfiguration)
    val manifest = s.read.parquet(s"$dir/_manifest").collect()
    val (touchedRows, keptRows) = manifest.partition(r =>
      r.getAs[Long]("kmax") >= lo && r.getAs[Long]("kmin") <= hi)
    val touched = touchedRows.map(_.getAs[String]("file")).toSeq
    if (touched.nonEmpty) {
      val before = listDataFiles(fs, dir)
      // persist the remainder so its stats come from the in-hand
      // frame — the read-back scan of the replacement files is gone
      // (ceremony job diet, VERDICT r8 #5); one file per rewrite
      // batch keeps the frame↔file stats mapping exact
      val remainder = graft.ScopedCache(
        s.read.parquet(touched: _*)
          .filter(!col("l_orderkey").between(lo, hi)))
      val mm = remainder
        .agg(min("l_orderkey").as("kmin"), max("l_orderkey").as("kmax"))
        .collect()(0)
      val newStats: Seq[(String, Long, Long)] =
        if (mm.isNullAt(0)) Seq.empty // every touched row deleted
        else {
          remainder.coalesce(1).write.mode("append").parquet(dir)
          (listDataFiles(fs, dir) -- before).toSeq
            .map(n => (s"file://$dir/$n", mm.getLong(0), mm.getLong(1)))
        }
      touched.foreach { f =>
        fs.delete(new org.apache.hadoop.fs.Path(new java.net.URI(f).getPath), false)
      }
      import s.implicits._
      (keptRows.toSeq
        .map(r => (r.getAs[String]("file"), r.getAs[Long]("kmin"), r.getAs[Long]("kmax")))
        ++ newStats)
        .toDF("file", "kmin", "kmax")
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/_manifest")
    }
    touched
  }

  private[graft] def cowPath(d: String): String =
    Lake.scratch("cow_lineitem_" + d.replaceAll("[^A-Za-z0-9]", "_"))

  /** Provision (once per source content) the pristine COW layout —
    * range-clustered files + zone-map manifest. The layout is the
    * delete ceremony's V0: it is never mutated, so repeated runs pay
    * metadata only (the r15 form rebuilt the full sorted layout on
    * EVERY run — a 27 s/100× provisioning bill billed to an op whose
    * own work is one file rewrite; SCALE_r16 measured the rebuild as
    * the op's entire scaling term). */
  private[graft] def ensureCowLayout(s: SparkSession, d: String): String = {
    val path = cowPath(d)
    val fs = org.apache.hadoop.fs.FileSystem.get(s.sparkContext.hadoopConfiguration)
    val sig = Lake.sourceSig(fs,
      new org.apache.hadoop.fs.Path(s"$d/lineitem.parquet")) + "|cow1"
    Lake.provisionIfStale(fs, path, sig)(writeCowLayout(s, d, path))
    path
  }

  /** VERSIONED COW delete: like [[cowDelete]], the manifest — never
    * the table — names the files whose range intersects, and only
    * those are read; unlike it, the rewrite lands in `deltaDir` as a
    * NEW VERSION (v1 manifest = kept entries + replacement stats)
    * while every v0 file stays byte-identical — the lakehouse delete
    * shape, where old versions keep serving time travel and
    * concurrent readers until a vacuum reclaims them. Returns the v1
    * file list and the touched v0 files. */
  private[graft] def cowDeleteVersion(s: SparkSession, dir: String, deltaDir: String,
                                      lo: Long, hi: Long): (Seq[String], Seq[String]) = {
    val fs = org.apache.hadoop.fs.FileSystem.get(s.sparkContext.hadoopConfiguration)
    val manifest = s.read.parquet(s"$dir/_manifest").collect()
    val (touchedRows, keptRows) = manifest.partition(r =>
      r.getAs[Long]("kmax") >= lo && r.getAs[Long]("kmin") <= hi)
    val touched = touchedRows.map(_.getAs[String]("file")).toSeq
    fs.delete(new org.apache.hadoop.fs.Path(deltaDir), true)
    val newStats: Seq[(String, Long, Long)] =
      if (touched.isEmpty) Seq.empty
      else {
        val remainder = graft.ScopedCache(
          s.read.parquet(touched: _*)
            .filter(!col("l_orderkey").between(lo, hi)))
        val mm = remainder
          .agg(min("l_orderkey").as("kmin"), max("l_orderkey").as("kmax"))
          .collect()(0)
        if (mm.isNullAt(0)) Seq.empty // every touched row deleted
        else {
          remainder.coalesce(1).write.parquet(deltaDir)
          listDataFiles(fs, deltaDir).toSeq
            .map(n => (s"file://$deltaDir/$n", mm.getLong(0), mm.getLong(1)))
        }
      }
    val kept = keptRows.toSeq
      .map(r => (r.getAs[String]("file"), r.getAs[Long]("kmin"), r.getAs[Long]("kmax")))
    import s.implicits._
    (kept ++ newStats).toDF("file", "kmin", "kmax")
      .coalesce(1).write.mode("overwrite").parquet(s"$deltaDir/_manifest")
    ((kept ++ newStats).map(_._1), touched)
  }

  /** ROW-LEVEL DELETE, copy-on-write at FILE granularity: the layout
    * is range-clustered on the key and carries a PERSISTED zone-map
    * manifest written at layout time (same pattern as
    * ensurePointLayout); the delete consults the manifest — metadata,
    * never the table — to find the files whose range intersects the
    * predicate, and ONLY those files are read and rewritten, into a
    * NEW VERSION whose manifest lists kept + replacement files (v0
    * stays pristine for time travel; [[cowDelete]] is the in-place
    * compaction-style variant, spec-pinned separately). The layout
    * itself is provisioned ONCE per source content. At 100 TB a
    * selective delete costs one manifest read plus the gigabytes it
    * actually deletes, with no stats scan of the table. The spec
    * asserts the rewrite set and proves non-intersecting files are
    * never opened. Oracle = the surviving rows, layout-independent.
    * (reference analogue: ClientProtocol.delete removes a FILE's
    * blocks only, resolved via BlocksMap metadata — deletion cost
    * scales with what is deleted, never with the namespace.) */
  val lakeDeleteCow: GraftQuery = GraftQuery.sql(
    "lake_delete_cow",
    s"""SELECT l_returnflag, COUNT(*) AS n, ${sumMSql("l_quantity")} AS total_qty
       |FROM lineitem WHERE NOT (l_orderkey BETWEEN 0 AND 149)
       |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin
  ) { (s, d) =>
    val dir = ensureCowLayout(s, d)
    val (files, _) = cowDeleteVersion(s, dir, s"${dir}_v1", 0L, 149L)
    // A delete can legitimately empty the table (every v0 file touched
    // and every row in range): zero paths to read is then a valid v1
    // state — an empty frame over the source schema, not a reader
    // crash (ADVICE r16; unreachable with the pinned [0,149] range but
    // latent for other callers of cowDeleteVersion).
    val v1 =
      if (files.isEmpty)
        s.createDataFrame(java.util.Collections.emptyList[org.apache.spark.sql.Row](),
          Tables.lineitem(s, d).schema)
      else s.read.parquet(files: _*)
    v1.groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"), sumM(col("l_quantity")).as("total_qty"))
      .orderBy(col("l_returnflag"))
  }

  /** ZERO-COPY SHALLOW CLONE: the clone's first commit references the
    * source's active files by absolute path (CommitLog.cloneFrom — a
    * metadata-only operation regardless of table size), after which
    * the two tables evolve independently: the clone takes a delta the
    * source never sees. The spec asserts the clone dir holds ZERO
    * data files at clone time. (HDFS snapshots share blocks the same
    * way; state lives in the journal, FSImage.java:1.) */
  val lakeClone: GraftQuery = GraftQuery.sql(
    "lake_clone",
    s"""SELECT 'clone' AS side, COUNT(*) AS n, ${sumMSql("o_totalprice")} AS total
       |FROM orders WHERE o_orderkey % 3 IN (0, 1, 2)
       |UNION ALL
       |SELECT 'source', COUNT(*), ${sumMSql("o_totalprice")}
       |FROM orders WHERE o_orderkey % 3 IN (0, 1)
       |ORDER BY side""".stripMargin
  ) { (s, d) =>
    import graft.sources.CommitLog
    val fs = org.apache.hadoop.fs.FileSystem.get(s.sparkContext.hadoopConfiguration)
    val src = Lake.scratch("clone_src_orders")
    val dst = Lake.scratch("clone_dst_orders")
    fs.delete(new org.apache.hadoop.fs.Path(src), true)
    fs.delete(new org.apache.hadoop.fs.Path(dst), true)
    val o = Tables.orders(s, d)
    // Ceremony job diet (VERDICT r8 #5): the source's two slice
    // commits share ONE partitioned write (journal versions are then
    // metadata, replay-identical to two separate writes); only the
    // clone's divergent delta pays its own write, into the CLONE's
    // dir — the divergence must live with the clone.
    o.withColumn("m", pmod(col("o_orderkey"), lit(3)))
      .filter(col("m") < 2)
      .write.partitionBy("m").mode("overwrite").parquet(s"$src/data")
    CommitLog.commit(fs, src, ts = 1000L, adds = Seq("data/m=0"), removes = Seq.empty)
    CommitLog.commit(fs, src, ts = 2000L, adds = Seq("data/m=1"), removes = Seq.empty)
    CommitLog.cloneFrom(fs, src, dst, ts = 3000L)          // metadata only
    CommitLog.writeCommit(s, dst,
      o.filter(col("o_orderkey") % 3 === 2), "data/mod2", ts = 4000L) // clone diverges
    def side(name: String, df: org.apache.spark.sql.DataFrame) =
      df.agg(count(lit(1)).as("n"), sumM(col("o_totalprice")).as("total"))
        .select(lit(name).as("side"), col("n"), col("total"))
    side("clone", CommitLog.snapshot(s, dst))
      .union(side("source", CommitLog.snapshot(s, src)))
      .orderBy(col("side"))
  }

  private[graft] def pointLookupPath(d: String): String = {
    val suffix = d.replaceAll("[^A-Za-z0-9]", "_")
    Lake.scratch(s"pointlookup_lineitem_$suffix")
  }

  /** Provision (once per source version) a range-clustered layout on
    * the lookup key PLUS its zone-map manifest — (file, kmin, kmax)
    * rows written at layout time, exactly the metadata a lakehouse
    * keeps from write-time parquet footers. */
  private[graft] def ensurePointLayout(s: SparkSession, d: String): String = {
    val path = pointLookupPath(d)
    val fs = org.apache.hadoop.fs.FileSystem.get(s.sparkContext.hadoopConfiguration)
    val sig = Lake.sourceSig(fs, new org.apache.hadoop.fs.Path(s"$d/lineitem.parquet"))
    Lake.provisionIfStale(fs, path, sig) {
      Tables.lineitem(s, d)
        .repartitionByRange(16, col("l_orderkey"))
        .sortWithinPartitions(col("l_orderkey"))
        .write.mode("overwrite").parquet(s"$path/table")
      s.read.parquet(s"$path/table")
        .groupBy(input_file_name().as("file"))
        .agg(min("l_orderkey").as("kmin"), max("l_orderkey").as("kmax"))
        .coalesce(1)
        .write.mode("overwrite").parquet(s"$path/manifest")
    }
    path
  }

  /** MANIFEST-PRUNED POINT LOOKUP: a key lookup consults the zone-map
    * manifest (a handful of rows, metadata-scale) to find the file(s)
    * whose key range can contain the key, then reads ONLY those with
    * the predicate pushed down — the secondary-index read path. At
    * 100 TB this is one manifest read + one file read instead of a
    * table scan; the spec asserts the candidate file count.
    * (reference namenode/BlocksMap.java:1 — resolve block locations
    * from metadata first, then read exactly those blocks.) */
  val lakePointLookup: GraftQuery = GraftQuery.sql(
    "lake_point_lookup",
    """SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS line_no,
      |  l_quantity, l_returnflag
      |FROM lineitem WHERE l_orderkey = 777
      |ORDER BY line_no""".stripMargin
  ) { (s, d) =>
    val path = ensurePointLayout(s, d)
    val key = 777L
    val files = candidateFiles(s, path, key)
    s.read.parquet(files: _*)
      .filter(col("l_orderkey") === key)
      .select(col("l_orderkey"), col("l_linenumber").cast("long").as("line_no"),
        col("l_quantity"), col("l_returnflag"))
      .orderBy(col("line_no"))
  }

  /** Manifest consultation: the files whose [kmin, kmax] contains the
    * key (driver-side — the manifest is metadata, not data). */
  private[graft] def candidateFiles(s: SparkSession, path: String, key: Long): Seq[String] =
    s.read.parquet(s"$path/manifest")
      .filter(col("kmin") <= key && col("kmax") >= key)
      .collect().map(_.getAs[String]("file")).toSeq

  def all: Seq[GraftQuery] = Seq(
    lakeZorder, lakeCompactIncremental, lakeDeleteCow, lakeClone,
    lakePointLookup)
}
