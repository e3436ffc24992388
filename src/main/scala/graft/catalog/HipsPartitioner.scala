package graft.catalog

import graft.functions.{sphere, PartitionGrid}
import graft.healpix.Healpix
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Density-adaptive HEALPix partitioning — Spark-first re-expression
 * of the reference partitioner (hipscat/partitioner.py):
 *
 *  1. histogram the catalog on an order-k healpix map
 *     (gather_statistics, partitioner.py:94) — a single map-side-
 *     combined groupBy; the collected result is SPARSE (occupied
 *     pixels only), so driver memory is data-bounded and the order
 *     can rise to 14 even at 100 TB.
 *  2. top-down threshold walk (compute_partitioning_map,
 *     partitioner.py:136): from order 0 down to k, assign every
 *     still-active pixel whose rebinned count < threshold.
 *     (Deviation: pixels still ≥ threshold at order k are assigned
 *     at k rather than failing, so the walk always terminates.)
 *  3. write hive-style `catalog/Norder=K/Dir=D/Npix=P/` parquet
 *     (partitioner.py:233 _write_partition_structure layout) via a
 *     single distributed write partitioned by the assigned pixel —
 *     file sizes are bounded by the threshold, partition pruning on
 *     Norder/Npix is native.
 *  4. margin ("neighbor") cache (margin_utils.py + dask_utils.py:246):
 *     rows within `marginDeg` of a FOREIGN partition pixel are
 *     replicated under `neighbor/Norder=K/Dir=D/Npix=P/` via a
 *     bounded disc-cover explode.
 */
object HipsPartitioner {

  /** Adaptive partition map: a SPARSE sky tiling ([[PartitionGrid]])
   *  plus the sparse order-k histogram (occupied pixels only, sorted).
   *  Driver memory is bounded by OCCUPIED pixels and tiles — never by
   *  12*4^k — so the histogram order can rise to the `_ID` index
   *  order (14) on realistic skies. */
  final case class PartitionMap(orderK: Int, grid: PartitionGrid,
                                histPix: Array[Long], histCnt: Array[Long]) {
    def assignedOrder(pixK: Long): Int = grid.order(pixK)
    def partitionPixel(pixK: Long): Long = pixK >> (2 * (orderK - grid.order(pixK)))
    def nSources: Long = histCnt.sum
    /** (order, pixel) pairs that actually hold data (empty sky excluded). */
    def pixelsAtOrders: Map[Int, Array[Long]] = {
      val m = scala.collection.mutable.Map.empty[Int, scala.collection.mutable.Set[Long]]
      var i = 0
      while (i < histPix.length) {
        val o = grid.order(histPix(i))
        m.getOrElseUpdate(o, scala.collection.mutable.Set.empty) += (histPix(i) >> (2 * (orderK - o)))
        i += 1
      }
      m.map { case (o, s) => o -> s.toArray.sorted }.toMap
    }
  }

  /** The reference caps its gather at order 10 (partitioner.py:94,
   *  dense 12*4^10 array); the sparse walk lifts that to the `_ID`
   *  rank order 14 — the hard ceiling for the shuffle-free rank
   *  computation in withSpatialId (orderK <= 14 keeps every order-14
   *  pixel inside one partition). */
  private[catalog] def requireOrderK(orderK: Int): Unit =
    require(orderK >= 0 && orderK <= 14,
      s"orderK must be in [0, 14] (got $orderK) — 14 is the _ID rank order; finer partition " +
        "pixels would split an order-14 pixel across partitions and break rank locality")

  /** Step 1+2: histogram at order k and run the top-down threshold
   *  walk. The groupBy returns one row per OCCUPIED pixel (map-side
   *  combined), so the collect is data-bounded, not 4^k-bounded. */
  def computePartitionMap(df: DataFrame, raCol: String, decCol: String,
                          orderK: Int, threshold: Long): PartitionMap = {
    requireOrderK(orderK)
    val rows = df.groupBy(sphere.hpix(col(raCol), col(decCol), orderK).as("pix"))
      .agg(count(lit(1)).as("cnt"))
      .collect()
    val pix = new Array[Long](rows.length)
    val cnt = new Array[Long](rows.length)
    var i = 0
    while (i < rows.length) { pix(i) = rows(i).getLong(0); cnt(i) = rows(i).getLong(1); i += 1 }
    partitionMapFromSparseHist(pix, cnt, orderK, threshold)
  }

  /** Dense-histogram adapter (small orders / tests). */
  def partitionMapFromHist(hist: Array[Long], orderK: Int, threshold: Long): PartitionMap = {
    val pix = new scala.collection.mutable.ArrayBuffer[Long]
    val cnt = new scala.collection.mutable.ArrayBuffer[Long]
    var i = 0
    while (i < hist.length) { if (hist(i) > 0) { pix += i.toLong; cnt += hist(i) }; i += 1 }
    partitionMapFromSparseHist(pix.toArray, cnt.toArray, orderK, threshold)
  }

  /**
   * The top-down threshold walk over a SPARSE histogram: recurse a
   * subtree only while its occupied count reaches the threshold, emit
   * a tile otherwise — identical assignment to the dense walk (a
   * pixel lands at the FIRST order whose subtree count drops under
   * the threshold, else at order k; empty siblings join the coarse
   * tile), with work and output bounded by occupied pixels. Lets
   * resumable imports rebuild the (deterministic) map from per-batch
   * histogram artifacts without rescanning sources.
   */
  def partitionMapFromSparseHist(pixIn: Array[Long], cntIn: Array[Long],
                                 orderK: Int, threshold: Long): PartitionMap = {
    requireOrderK(orderK)
    require(pixIn.length == cntIn.length, "pix/cnt length mismatch")
    val order = pixIn.indices.sortBy(pixIn).toArray
    val pix = order.map(pixIn)
    val cnt = order.map(cntIn)
    val prefix = new Array[Long](pix.length + 1)
    var i = 0
    while (i < pix.length) { prefix(i + 1) = prefix(i) + cnt(i); i += 1 }
    def lowerBound(x: Long): Int = {
      var lo = 0; var hi = pix.length
      while (lo < hi) { val m = (lo + hi) >>> 1; if (pix(m) < x) lo = m + 1 else hi = m }
      lo
    }
    def rangeCount(lo: Long, hi: Long): Long = prefix(lowerBound(hi)) - prefix(lowerBound(lo))
    val starts = new scala.collection.mutable.ArrayBuffer[Long]
    val ords = new scala.collection.mutable.ArrayBuffer[Int]
    def walk(o: Int, p: Long): Unit = {
      val span = 1L << (2 * (orderK - o))
      val lo = p * span
      if (rangeCount(lo, lo + span) < threshold || o == orderK) { starts += lo; ords += o }
      else { var c = 0L; while (c < 4) { walk(o + 1, p * 4 + c); c += 1 } }
    }
    var b = 0L
    while (b < 12) { walk(0, b); b += 1 }
    PartitionMap(orderK, PartitionGrid(orderK, starts.toArray, ords.toArray), pix, cnt)
  }

  /**
   * Columns (Norder, Dir, Npix) for each row given a partition map.
   * The map is broadcast via the closure (bounded by occupied tiles).
   *
   * Dir = floor(Npix / 10000) * 10000 — the hipscat layout intent.
   * (The reference's float expression `(pix / 10_000) * 10_000`
   * evaluates to pix itself, dask_utils.py:123; we implement the
   * intended integer bucketing.)
   */
  def withPartitionColumns(df: DataFrame, raCol: String, decCol: String, pm: PartitionMap): DataFrame = {
    val bc = df.sparkSession.sparkContext.broadcast(pm.grid)
    // codegen kernel (PackedPartitionPixelExpr), NOT a Scala UDF: this
    // is the one expression every ingested row crosses, so it must
    // stay inside WholeStageCodegen (asserted in CatalogSpec)
    df.withColumn("__pp", graft.functions.native.packedPartitionPixel(col(raCol), col(decCol), pm.orderK, bc))
      .withColumn("Norder", shiftright(col("__pp"), 48).cast("int"))
      .withColumn("Dir", (col("__pp").bitwiseAND(lit(0xffffffffffffL)) / 10000L).cast("long") * 10000L)
      .withColumn("Npix", col("__pp").bitwiseAND(lit(0xffffffffffffL)))
      .drop("__pp")
  }

  /**
   * Margin rows: (Norder, Dir, Npix) of every FOREIGN partition
   * pixel within `marginDeg` of the row — the reference's neighbor
   * cache semantics (rows near a pixel's border get replicated into
   * that pixel's neighbor file). By default the set is the
   * pixel-granular disc-cover SUPERSET; `exactMargin = true` trims
   * each candidate to the true boundary-distance band
   * (margin_utils.py:209/:307 semantics via Healpix.distToPixelDeg —
   * polar-aware with no projection special case), cutting neighbor
   * storage at coarse orders. Consumers exact-filter on match
   * distance either way, so stored-margin results are identical.
   */
  def marginRows(df: DataFrame, raCol: String, decCol: String, pm: PartitionMap, marginDeg: Double,
                 exactMargin: Boolean = false): DataFrame = {
    val bc = df.sparkSession.sparkContext.broadcast(pm.grid)
    // bounded explode of a codegen kernel (MarginPixelsExpr): packed
    // foreign partition pixels overlapping the margin disc, minus the
    // row's own pixel — no Scala UDF on the ingest path
    df.withColumn("__m", explode(graft.functions.native.marginPixels(
        col(raCol), col(decCol), pm.orderK, marginDeg, bc, exactMargin)))
      .withColumn("Norder", shiftright(col("__m"), 48).cast("int"))
      .withColumn("Npix", col("__m").bitwiseAND(lit(0xffffffffffffL)))
      .withColumn("Dir", (col("Npix") / 10000L).cast("long") * 10000L)
      .drop("__m")
  }

  /**
   * Full partitioned-catalog write: catalog/ + neighbor/ hive trees,
   * a `{cat}_meta.json` (reference: write_structure_metadata,
   * partitioner.py:350), and parquet `_metadata`/`_common_metadata`
   * summary sidecars per tree (partitioner.py:373, consumed by the
   * reference reader's read_parquet_metadata, lsd2_io.py:324).
   *
   * Scale note on the sidecars: they serialize every footer through
   * one writer — the reason Spark dropped summary-file support — so
   * graft itself NEVER reads them (the JSON partition map + hive
   * layout + footer stats carry the same information); they exist so
   * a reference-side reader pointed at a graft-written catalog finds
   * the files it expects. Emission cost is one recursive listing +
   * a pooled parallel footer read; at a file count where that is the
   * import's long pole, drop them with `summaryFiles = false`.
   */
  /**
   * The reference's order-14 spatial index `[pix@14 | rank]`
   * (dask_utils.py:167 compute_index) added WITHOUT a shuffle: after
   * the repartition by partition pixel, every order-14 pixel's rows
   * are complete within one partition (orderK <= 10 < 14), so the
   * per-pixel rank is a partition-local running counter over rows
   * sorted by (pix14, ra, dec, id). Rows come out sorted by `_ID`,
   * so written files carry monotonic `_ID` (and clustered ra/dec) —
   * parquet row-group min/max stats then prune stored-catalog cone
   * searches at the ROW-GROUP level, not just the file level.
   */
  private def withSpatialId(df: DataFrame, raCol: String, decCol: String, idCol: String): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{LongType, StructField}
    val order = 14
    // NOTE: the reference computes this as uint64 (dask_utils.py:167);
    // Spark has no unsigned long, so `_ID` is the same 64-bit pattern
    // REINTERPRETED as signed — pixels >= 2^31 (~1/3 of the sky, the
    // south) produce negative `_ID`s. Per-file monotonicity and
    // row-group min/max pruning are unaffected (2^31 is 4^(14-o)
    // aligned, so no partition straddles the sign flip), but GLOBAL
    // comparisons/sorts across the sign boundary must use
    // `_ID` unsigned (e.g. compare `_ID - Long.MinValue`, or
    // shiftrightunsigned to recover pix14). Asserted in CatalogSpec.
    val shift = 64 - (4 + 2 * order)
    val sorted = df
      .withColumn("__pix14", sphere.hpix(col(raCol).cast("double"), col(decCol).cast("double"), order))
      .sortWithinPartitions(col("__pix14"), col(raCol), col(decCol), col(idCol))
    val pixIdx = sorted.schema.fieldIndex("__pix14")
    val schema = sorted.schema.add(StructField("_ID", LongType, nullable = false))
    sorted.mapPartitions { rows =>
      var cur = Long.MinValue
      var rank = -1L
      rows.map { r =>
        val p = r.getLong(pixIdx)
        if (p != cur) { cur = p; rank = 0L } else rank += 1
        Row.fromSeq(r.toSeq :+ ((p << shift) + rank))
      }
    }(org.apache.spark.sql.Encoders.row(schema)).drop("__pix14")
  }

  def write(df: DataFrame, raCol: String, decCol: String, idCol: String,
            outputDir: String, catname: String,
            orderK: Int = 6, threshold: Long = 1000000L, marginDeg: Double = 0.1,
            summaryFiles: Boolean = true, exactMargin: Boolean = false): PartitionMap =
    writeWithMap(df, computePartitionMap(df, raCol, decCol, orderK, threshold),
      raCol, decCol, idCol, outputDir, catname, orderK, threshold, marginDeg, summaryFiles,
      exactMargin)

  /** The write phases after the partition map is known — shared by
   *  [[write]] (map from a direct scan) and [[writeResumable]] (map
   *  from per-batch histogram artifacts). */
  private[catalog] def writeWithMap(df: DataFrame, pm: PartitionMap,
                                    raCol: String, decCol: String, idCol: String,
                                    outputDir: String, catname: String,
                                    orderK: Int, threshold: Long, marginDeg: Double,
                                    summaryFiles: Boolean = true,
                                    exactMargin: Boolean = false): PartitionMap = {
    // the trailing sortWithinPartitions puts the hive partition
    // columns FIRST so FileFormatWriter's required ordering is already
    // satisfied (no writer-inserted, stability-unspecified sort) and
    // each written file stays _ID-ascending
    withSpatialId(withPartitionColumns(df, raCol, decCol, pm)
        .repartition(col("Norder"), col("Npix")), raCol, decCol, idCol)
      .sortWithinPartitions(col("Norder"), col("Dir"), col("Npix"), col("_ID"))
      .write.mode("overwrite").partitionBy("Norder", "Dir", "Npix")
      .parquet(s"$outputDir/$catname/catalog")
    withSpatialId(marginRows(df, raCol, decCol, pm, marginDeg, exactMargin)
        .repartition(col("Norder"), col("Npix")), raCol, decCol, idCol)
      .sortWithinPartitions(col("Norder"), col("Dir"), col("Npix"), col("_ID"))
      .write.mode("overwrite").partitionBy("Norder", "Dir", "Npix")
      .parquet(s"$outputDir/$catname/neighbor")
    if (summaryFiles) {
      writeSummaryFiles(df.sparkSession, s"$outputDir/$catname/catalog")
      writeSummaryFiles(df.sparkSession, s"$outputDir/$catname/neighbor")
    }

    // persist the order-k density histogram as a small parquet — the
    // data product behind the reference's visualize_* views
    // ({cat}_order10_hpmap.fits, lsd2_io.py:12,170) — straight from
    // the already-collected pm.hist: ZERO extra scans at write time.
    // Sparse (nonzero pixels only); readers treat missing pixels as 0.
    // Written twice: point_map is the CURRENT density (appends update
    // it); import_hist is the FROZEN import-time histogram from which
    // [[append]] deterministically rebuilds the partition map (the
    // map must never be recomputed from grown counts, or the layout
    // would drift from the directories already on disk).
    {
      val sess = df.sparkSession
      import sess.implicits._
      val sparse = pm.histPix.zip(pm.histCnt).toSeq.toDF("pix", "cnt").coalesce(1)
      sparse.write.mode("overwrite").parquet(s"$outputDir/$catname/point_map.parquet")
      sparse.write.mode("overwrite").parquet(s"$outputDir/$catname/import_hist.parquet")
    }

    writeMeta(df.sparkSession, pm, raCol, decCol, idCol, outputDir, catname, threshold, marginDeg)
    pm
  }

  /** Metadata JSON with the reference's key set ({cat}_meta.json,
   *  partitioner.py:350 write_structure_metadata) so downstream
   *  hipscat tooling can read the layout; counts come from the
   *  already-computed histogram (no extra scan), hips lists only
   *  pixels that actually hold data. */
  private def writeMeta(spark: SparkSession, pm: PartitionMap,
                        raCol: String, decCol: String, idCol: String,
                        outputDir: String, catname: String,
                        threshold: Long, marginDeg: Double): Unit = {
    val hips = pm.pixelsAtOrders.toSeq.sortBy(_._1)
      .map { case (o, ps) => s""""$o": [${ps.mkString(",")}]""" }.mkString("{", ",", "}")
    val meta =
      s"""{"cat_name": "$catname", "ra_kw": "$raCol", "dec_kw": "$decCol", "id_kw": "$idCol",
         | "n_sources": ${pm.nSources}, "pix_threshold": $threshold, "order_k": ${pm.orderK},
         | "margin_deg": $marginDeg, "hips": $hips}""".stripMargin
    HipsCatalog.writeString(spark, s"$outputDir/$catname/${catname}_meta.json", meta)
  }

  /**
   * Parquet `_metadata` (all row groups) + `_common_metadata` (schema
   * only) summary sidecars for one written tree — the byte-level
   * layout the reference emits (partitioner.py:373) and its reader
   * consumes (lsd2_io.py:324 read_parquet_metadata). Footers are read
   * through parquet-hadoop's pooled parallel reader and merged by its
   * own summary writer, so the sidecar is exactly what a
   * pyarrow/parquet-mr consumer expects. Graft never reads these
   * back — see the scale note on [[write]].
   */
  private[catalog] def writeSummaryFiles(spark: SparkSession, dir: String): Unit = {
    import scala.jdk.CollectionConverters._
    val conf = spark.sessionState.newHadoopConf()
    val root = new org.apache.hadoop.fs.Path(dir)
    val fs = root.getFileSystem(conf)
    val files = scala.collection.mutable.ArrayBuffer.empty[org.apache.hadoop.fs.FileStatus]
    val it = fs.listFiles(root, true)
    while (it.hasNext) {
      val f = it.next()
      val n = f.getPath.getName
      if (n.endsWith(".parquet") && !n.startsWith("_") && !n.startsWith(".")) files += f
    }
    if (files.nonEmpty) {
      val footers = org.apache.parquet.hadoop.ParquetFileReader
        .readAllFootersInParallel(conf, files.toList.asJava)
      org.apache.parquet.hadoop.ParquetFileWriter.writeMetadataFile(
        conf, root, footers,
        org.apache.parquet.hadoop.ParquetOutputFormat.JobSummaryLevel.ALL)
    }
  }

  /** Sparse (pix, cnt) parquet -> sparse (pix -> cnt) map. */
  private def readHistSparse(spark: SparkSession, path: String): scala.collection.mutable.LongMap[Long] = {
    val m = scala.collection.mutable.LongMap.empty[Long]
    spark.read.parquet(path).collect().foreach(r => m(r.getLong(0)) = r.getLong(1))
    m
  }

  private def sparseToArrays(m: scala.collection.Map[Long, Long]): (Array[Long], Array[Long]) = {
    val pix = m.keysIterator.toArray.sorted
    (pix, pix.map(m))
  }

  /** Per-order-14-pixel `_ID` rank continuation: joins each new row's
   *  pix14 against the tree's current max rank so appended ranks
   *  start where the existing ones stop. A standard shuffle join on
   *  the pixel — the offsets frame is one row per occupied pix14,
   *  never collected. */
  private def withRankOffsets(ids: DataFrame, existingTree: DataFrame): DataFrame = {
    val base = existingTree
      .select(shiftrightunsigned(col("_ID"), 32).as("__pix14"),
        col("_ID").bitwiseAND(lit(0xffffffffL)).as("__rk"))
      .groupBy("__pix14").agg((max("__rk") + 1).as("__base"))
    ids.withColumn("__pix14", shiftrightunsigned(col("_ID"), 32))
      .join(base, Seq("__pix14"), "left")
      .withColumn("_ID", col("_ID") + coalesce(col("__base"), lit(0L)))
      .drop("__pix14", "__base")
  }

  /**
   * Incremental append into an EXISTING catalog — the operation the
   * reference importer lacks (partitioner.py is one-shot; growing a
   * survey means re-importing everything). New rows are:
   *
   *  - assigned with the FROZEN import-time partition map
   *    (deterministically rebuilt from `import_hist.parquet` — never
   *    from current counts, which would drift the layout away from
   *    the directories already on disk);
   *  - written `mode(append)` as new parquet files inside the
   *    existing `catalog/` and `neighbor/` hive dirs (readers see
   *    extra files per partition, nothing is rewritten);
   *  - `_ID`-ranked CONTINUING each order-14 pixel's existing rank
   *    (per-tree offset join), so `_ID` stays unique and every file
   *    remains internally `_ID`-sorted;
   *  - folded into `point_map.parquet` (current density) and the
   *    meta JSON (n_sources, hips lists).
   *
   * The partition map is frozen, so pixels grow past the import
   * threshold as data accumulates — that is inherent to append (the
   * same trade the reference would face); when the returned map's
   * `hist` shows pixels far beyond threshold, re-import to re-split.
   *
   * Appends must be SERIALIZED (one writer at a time): the `_ID`
   * offsets are read from the current tree, so concurrent appends
   * would mint colliding ranks — the usual contract for file-based
   * tables without a transaction log. Note that append implicitly
   * runs [[recoverRepartition]] first, which DELETES any
   * `_repartition_stage/` debris: under the serialization contract
   * that debris can only be a crashed writer's, but an append racing
   * a LIVE repartition's staging phase would silently destroy the
   * in-flight rewrite (the repartition then fails on the missing
   * stage). Don't run them concurrently.
   */
  def append(df: DataFrame, raCol: String, decCol: String, idCol: String,
             outputDir: String, catname: String,
             summaryFiles: Boolean = true): PartitionMap = {
    val spark = df.sparkSession
    // complete any crashed repartition commit FIRST (writers
    // serialize, so a pending journal here means the writer died):
    // without this, rows appended under the stale import_hist land in
    // the journal's doomed split dirs and the eventual roll-forward
    // would delete them — the one write path that could lose data
    recoverRepartition(spark, outputDir, catname)
    // drop any stale cached listing BEFORE reading rank offsets — a
    // listing cached before an external writer's files landed would
    // mint colliding _IDs
    spark.catalog.refreshByPath(s"$outputDir/$catname/catalog")
    spark.catalog.refreshByPath(s"$outputDir/$catname/neighbor")
    val metaRaw = HipsCatalog.readString(spark, s"$outputDir/$catname/${catname}_meta.json")
    // exponent-aware: a small marginDeg (e.g. 1 arcsec) stringifies as
    // 2.77...E-4 — a digits-only pattern would silently read 2.77 deg
    def metaNum(key: String): String =
      s""""$key":\\s*([-+\\d.eE]+)""".r.findFirstMatchIn(metaRaw)
        .getOrElse(throw new IllegalArgumentException(s"$key missing from ${catname}_meta.json"))
        .group(1)
    val orderK = metaNum("order_k").toInt
    val threshold = metaNum("pix_threshold").toLong
    val marginDeg = metaNum("margin_deg").toDouble

    val (ihPix, ihCnt) = sparseToArrays(readHistSparse(spark, s"$outputDir/$catname/import_hist.parquet"))
    val frozen = partitionMapFromSparseHist(ihPix, ihCnt, orderK, threshold)
    val merged = readHistSparse(spark, s"$outputDir/$catname/point_map.parquet")
    df.groupBy(sphere.hpix(col(raCol), col(decCol), orderK).as("pix"))
      .agg(count(lit(1)).as("cnt"))
      .collect().foreach(r => merged(r.getLong(0)) = merged.getOrElse(r.getLong(0), 0L) + r.getLong(1))

    def appendTree(rows: DataFrame, existing: DataFrame, tree: String): Unit =
      withRankOffsets(
        withSpatialId(rows.repartition(col("Norder"), col("Npix")), raCol, decCol, idCol),
        existing)
        .repartition(col("Norder"), col("Npix"))
        .sortWithinPartitions(col("Norder"), col("Dir"), col("Npix"), col("_ID"))
        .write.mode("append").partitionBy("Norder", "Dir", "Npix")
        .parquet(s"$outputDir/$catname/$tree")

    appendTree(withPartitionColumns(df, raCol, decCol, frozen),
      HipsCatalog.load(spark, outputDir, catname), "catalog")
    appendTree(marginRows(df, raCol, decCol, frozen, marginDeg),
      HipsCatalog.loadNeighbors(spark, outputDir, catname), "neighbor")
    // the session FileStatusCache still holds the PRE-append listings
    // of partition dirs that already existed — without invalidation a
    // same-session reader sees only the old files of old dirs (new
    // dirs list fresh), silently dropping appended rows
    spark.catalog.refreshByPath(s"$outputDir/$catname/catalog")
    spark.catalog.refreshByPath(s"$outputDir/$catname/neighbor")
    // refresh the sidecars so the reference reader's footer view
    // includes the appended files
    if (summaryFiles) {
      writeSummaryFiles(spark, s"$outputDir/$catname/catalog")
      writeSummaryFiles(spark, s"$outputDir/$catname/neighbor")
    }

    val (mPix, mCnt) = sparseToArrays(merged)
    val out = PartitionMap(orderK, frozen.grid, mPix, mCnt)
    locally {
      val sess = spark
      import sess.implicits._
      mPix.zip(mCnt).toSeq.toDF("pix", "cnt")
        .coalesce(1).write.mode("overwrite").parquet(s"$outputDir/$catname/point_map.parquet")
    }
    // the overwrite DELETED the old part file — a cached listing would
    // make a same-session densityMap() read a missing file
    spark.catalog.refreshByPath(s"$outputDir/$catname/point_map.parquet")
    writeMeta(spark, out, raCol, decCol, idCol, outputDir, catname, threshold, marginDeg)
    out
  }

  /** Sorted-array lower bound (first index with a(i) >= x). */
  private def lowerBoundIn(a: Array[Long], x: Long): Int = {
    var lo = 0; var hi = a.length
    while (lo < hi) { val m = (lo + hi) >>> 1; if (a(m) < x) lo = m + 1 else hi = m }
    lo
  }

  /**
   * Re-split an EXISTING catalog whose pixels have grown past the
   * import threshold through [[append]]s — the lifecycle gap of the
   * frozen append-time partition map (the reference's only answer is
   * a full re-import; partitioner.py is one-shot). Re-walks the
   * ACCUMULATED histogram (point_map) and rewrites ONLY tiles whose
   * assignment changed: counts only grow under append, so the new
   * map strictly REFINES the frozen one (a tile is emitted at the
   * first order whose subtree count drops under the threshold, and
   * growing counts can only push that deeper) — intact tiles keep
   * their files byte-identical, and the rewrite cost is bounded by
   * the over-threshold data, never the catalog.
   *
   *  - split tiles' catalog rows are re-bucketed under the new grid
   *    with `_ID`s PRESERVED (`_ID` depends only on the order-14
   *    pixel and the import-time rank — partitioning never enters it);
   *  - split tiles' neighbor files are rebuilt: sources are each
   *    tile's own rows (new INTERNAL borders between sibling
   *    sub-tiles) plus its previous neighbor rows (any external row
   *    within marginDeg of a sub-tile was within marginDeg of the
   *    parent, so the old neighbor file is a complete external
   *    source superset); targets are restricted to the split regions
   *    — margin entries into unchanged tiles are untouched and stay
   *    correct (a row's entry into a foreign unchanged tile does not
   *    depend on how the row's own region is tiled);
   *  - import_hist re-freezes to the accumulated histogram so future
   *    [[append]]s assign under the REFINED layout; meta refreshes.
   *
   * Serialize with other writers (the [[append]] contract). Readers
   * stay safe throughout — and so does a WRITER CRASH at any point:
   *
   *  - rewritten sub-tiles are staged under `_repartition_stage/`
   *    (invisible to readers), then a journal listing the staged
   *    sub-tile dirs and the doomed old dirs is committed via
   *    write-temp + atomic rename — that rename is the commit point;
   *  - a crash BEFORE the commit point leaves the old dirs untouched
   *    and authoritative (the stage tree is discarded debris);
   *  - a crash AFTER it is rolled FORWARD by [[recoverRepartition]]
   *    (also run automatically at the next [[repartition]]): the
   *    commit steps — rename staged dirs in, delete old dirs,
   *    re-freeze import_hist, refresh meta, drop the journal — are
   *    each idempotent, so replaying them completes the rewrite;
   *  - a concurrent reader during the commit window sees transient
   *    duplicates rather than a gap (new sub-tile dirs land before
   *    their old dir is deleted); [[HipsCatalog.load]] warns loudly
   *    when a journal is present so a crashed writer's lingering
   *    duplicates are detected rather than silently double-counted.
   */
  def repartition(spark: SparkSession, outputDir: String, catname: String,
                  summaryFiles: Boolean = true, exactMargin: Boolean = false): PartitionMap = {
    import org.apache.hadoop.fs.Path
    val base = s"$outputDir/$catname"
    val fsys = new Path(base).getFileSystem(spark.sparkContext.hadoopConfiguration)
    // complete any crashed prior commit / discard pre-commit debris
    // BEFORE reading layout state — the repaired tree is the basis
    recoverRepartition(spark, outputDir, catname)
    val metaRaw = HipsCatalog.readString(spark, s"$base/${catname}_meta.json")
    def metaNum(key: String): String =
      s""""$key":\\s*([-+\\d.eE]+)""".r.findFirstMatchIn(metaRaw)
        .getOrElse(throw new IllegalArgumentException(s"$key missing from ${catname}_meta.json"))
        .group(1)
    def metaStr(key: String): String =
      s""""$key":\\s*"([^"]*)"""".r.findFirstMatchIn(metaRaw)
        .getOrElse(throw new IllegalArgumentException(s"$key missing from ${catname}_meta.json"))
        .group(1)
    val orderK = metaNum("order_k").toInt
    val threshold = metaNum("pix_threshold").toLong
    val marginDeg = metaNum("margin_deg").toDouble
    val (raCol, decCol, idCol) = (metaStr("ra_kw"), metaStr("dec_kw"), metaStr("id_kw"))

    spark.catalog.refreshByPath(s"$base/catalog")
    val (phPix, phCnt) = sparseToArrays(readHistSparse(spark, s"$base/point_map.parquet"))
    val newMap = partitionMapFromSparseHist(phPix, phCnt, orderK, threshold)
    val (ihPix, ihCnt) = sparseToArrays(readHistSparse(spark, s"$base/import_hist.parquet"))
    val oldMap = partitionMapFromSparseHist(ihPix, ihCnt, orderK, threshold)

    // occupied frozen tiles whose region the new walk subdivides
    val split = oldMap.pixelsAtOrders.toSeq
      .flatMap { case (o, ps) => ps.map(p => (o, p)) }
      .filter { case (o, p) =>
        val span = 1L << (2 * (orderK - o))
        val lo = p * span
        var i = lowerBoundIn(phPix, lo)
        var changed = false
        while (i < phPix.length && phPix(i) < lo + span) {
          val no = newMap.grid.order(phPix(i))
          require(no >= o, s"repartition: new map would COARSEN tile ($o, $p) — the " +
            "accumulated histogram shrank below import_hist; counts must only grow under append")
          if (no != o) changed = true
          i += 1
        }
        changed
      }
    if (split.isEmpty) return PartitionMap(orderK, oldMap.grid, phPix, phCnt)

    def dirOf(p: Long) = p / 10000L * 10000L
    def tilePath(tree: String, o: Int, p: Long) = s"$base/$tree/Norder=$o/Dir=${dirOf(p)}/Npix=$p"
    def existing(tree: String): Seq[String] =
      split.map { case (o, p) => tilePath(tree, o, p) }.filter(p => fsys.exists(new Path(p)))

    val catPaths = existing("catalog")
    require(catPaths.nonEmpty,
      s"repartition: none of the ${split.length} split tiles have catalog dirs — " +
        s"split=${split.take(5)}, probe=${split.headOption.map { case (o, p) => tilePath("catalog", o, p) }}")
    // parquet re-reads surface every column nullable, but `_ID` was
    // written non-nullable (withSpatialId) — restore that in the
    // rewrite's schema (coalesce against a literal is non-nullable by
    // construction and never fires: _ID has no nulls) or the summary
    // sidecar's footer merge rejects the mixed row metadata
    val oldCat = spark.read.parquet(catPaths: _*)
      .withColumn("_ID", coalesce(col("_ID"), lit(Long.MinValue)))
    val nbrPaths = existing("neighbor")
    val oldNbr =
      if (nbrPaths.nonEmpty) spark.read.parquet(nbrPaths: _*) else oldCat.limit(0)

    // 1) STAGE the re-bucketed split-tile catalog rows, _ID preserved
    //    (invisible to readers until the journal commits)
    val stage = s"$base/_repartition_stage"
    withPartitionColumns(oldCat, raCol, decCol, newMap)
      .repartition(col("Norder"), col("Npix"))
      .sortWithinPartitions(col("Norder"), col("Dir"), col("Npix"), col("_ID"))
      .write.mode("overwrite").partitionBy("Norder", "Dir", "Npix")
      .parquet(s"$stage/catalog")

    // 2) STAGE rebuilt margin entries TARGETING the split regions only;
    //    a source row appearing both as a home row and as a replica in
    //    another split tile's old neighbor file collapses in distinct
    val sources = oldCat.drop("_ID").unionByName(oldNbr.drop("_ID")).distinct()
    val sess = spark
    import sess.implicits._
    val splitDf = split.toDF("o_s", "p_s")
    val restricted = marginRows(sources, raCol, decCol, newMap, marginDeg, exactMargin)
      .join(broadcast(splitDf),
        expr("Norder >= o_s AND shiftright(Npix, 2 * (Norder - o_s)) = p_s"), "left_semi")
    // rank offsets read the CURRENT tree (doomed dirs included — the
    // resulting rank gaps are harmless; uniqueness is the contract)
    withRankOffsets(
      withSpatialId(restricted.repartition(col("Norder"), col("Npix")), raCol, decCol, idCol),
      HipsCatalog.loadNeighbors(spark, outputDir, catname))
      .repartition(col("Norder"), col("Npix"))
      .sortWithinPartitions(col("Norder"), col("Dir"), col("Npix"), col("_ID"))
      .write.mode("overwrite").partitionBy("Norder", "Dir", "Npix")
      .parquet(s"$stage/neighbor")

    // COMMIT POINT: journal the staged sub-tile dirs + doomed old dirs,
    // made visible atomically via temp-write + rename. Before this
    // rename a crash leaves the old layout authoritative; after it the
    // rewrite always completes (here or in recoverRepartition).
    def stagedTiles(tree: String): Seq[(String, Int, Long)] = {
      val g = fsys.globStatus(new Path(s"$stage/$tree/Norder=*/Dir=*/Npix=*"))
      if (g == null) Nil
      else g.toSeq.map { st =>
        val p = st.getPath
        (tree, p.getParent.getParent.getName.stripPrefix("Norder=").toInt,
          p.getName.stripPrefix("Npix=").toLong)
      }
    }
    val staged = stagedTiles("catalog") ++ stagedTiles("neighbor")
    val journal =
      s"""{"summary_files": $summaryFiles,
         | "split": [${split.map { case (o, p) => s"[$o,$p]" }.mkString(",")}],
         | "staged": [${staged.map { case (t, o, p) => s"""["$t",$o,$p]""" }.mkString(",")}]}""".stripMargin
    HipsCatalog.writeString(spark, s"${journalPath(base)}.tmp", journal)
    require(fsys.rename(new Path(s"${journalPath(base)}.tmp"), new Path(journalPath(base))),
      s"repartition: journal rename failed at ${journalPath(base)}")

    // 3+4) rename staged dirs in, drop old dirs, re-freeze, drop journal
    commitRepartition(spark, outputDir, catname)
  }

  private def journalPath(base: String): String = s"$base/_repartition_journal.json"

  /**
   * Detect-and-repair for a crashed [[repartition]]. If the commit
   * journal is present, the crash happened AFTER the commit point —
   * roll the rewrite FORWARD by replaying the (idempotent) commit
   * steps. Any journal-less stage debris is from a crash BEFORE the
   * commit point — the old dirs are untouched and authoritative, so
   * the debris is discarded. Returns true iff a pending commit was
   * found and completed. Run automatically at the start of every
   * [[repartition]]; callers seeing [[HipsCatalog.load]]'s journal
   * warning should invoke this directly.
   */
  def recoverRepartition(spark: SparkSession, outputDir: String, catname: String): Boolean = {
    import org.apache.hadoop.fs.Path
    val base = s"$outputDir/$catname"
    val fsys = new Path(base).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val pending = fsys.exists(new Path(journalPath(base)))
    if (pending) commitRepartition(spark, outputDir, catname)
    fsys.delete(new Path(s"$base/_repartition_stage"), true)
    fsys.delete(new Path(s"${journalPath(base)}.tmp"), false)
    pending
  }

  /**
   * The idempotent back half of [[repartition]], driven entirely by
   * the committed journal + on-disk state so a crash at ANY point is
   * repaired by re-running it: per staged sub-tile dir, (re-)rename it
   * into the live tree (a destination left by a previous half-finished
   * attempt can only be this same rename's output, so it is replaced);
   * delete the superseded old dirs; re-freeze import_hist from the
   * accumulated histogram (writers serialize, so point_map is exactly
   * the basis that produced the staged layout); refresh meta; and only
   * then drop the journal + stage tree.
   */
  private def commitRepartition(spark: SparkSession, outputDir: String,
                                catname: String): PartitionMap = {
    import org.apache.hadoop.fs.Path
    val base = s"$outputDir/$catname"
    val fsys = new Path(base).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val j = HipsCatalog.readString(spark, journalPath(base))
    val summaryFiles = """"summary_files":\s*(true|false)""".r.findFirstMatchIn(j)
      .map(_.group(1).toBoolean).getOrElse(true)
    // each section is one line; greedy .* + final \] captures the whole
    // array body (inner ]s included) up to the outer closing bracket
    def section(key: String): String =
      s""""$key":\\s*\\[(.*)\\]""".r.findFirstMatchIn(j)
        .getOrElse(throw new IllegalStateException(s"repartition journal missing $key"))
        .group(1)
    val split = """\[(\d+),(\d+)\]""".r.findAllMatchIn(section("split"))
      .map(m => (m.group(1).toInt, m.group(2).toLong)).toSeq
    val staged = """\["(\w+)",(\d+),(\d+)\]""".r.findAllMatchIn(section("staged"))
      .map(m => (m.group(1), m.group(2).toInt, m.group(3).toLong)).toSeq

    def dirOf(p: Long) = p / 10000L * 10000L
    def tilePath(tree: String, o: Int, p: Long) = s"$base/$tree/Norder=$o/Dir=${dirOf(p)}/Npix=$p"
    staged.foreach { case (tree, o, p) =>
      val src = new Path(s"$base/_repartition_stage/$tree/Norder=$o/Dir=${dirOf(p)}/Npix=$p")
      val dst = new Path(tilePath(tree, o, p))
      if (fsys.exists(src)) {
        if (fsys.exists(dst)) fsys.delete(dst, true)
        fsys.mkdirs(dst.getParent)
        require(fsys.rename(src, dst), s"repartition commit: rename $src -> $dst failed")
      }
    }
    split.foreach { case (o, p) =>
      fsys.delete(new Path(tilePath("catalog", o, p)), true)
      fsys.delete(new Path(tilePath("neighbor", o, p)), true)
    }
    spark.catalog.refreshByPath(s"$base/catalog")
    spark.catalog.refreshByPath(s"$base/neighbor")
    if (summaryFiles) {
      writeSummaryFiles(spark, s"$base/catalog")
      writeSummaryFiles(spark, s"$base/neighbor")
    }

    val metaRaw = HipsCatalog.readString(spark, s"$base/${catname}_meta.json")
    def metaNum(key: String): String =
      s""""$key":\\s*([-+\\d.eE]+)""".r.findFirstMatchIn(metaRaw)
        .getOrElse(throw new IllegalStateException(s"$key missing from ${catname}_meta.json"))
        .group(1)
    def metaStr(key: String): String =
      s""""$key":\\s*"([^"]*)"""".r.findFirstMatchIn(metaRaw)
        .getOrElse(throw new IllegalStateException(s"$key missing from ${catname}_meta.json"))
        .group(1)
    val orderK = metaNum("order_k").toInt
    val threshold = metaNum("pix_threshold").toLong
    spark.catalog.refreshByPath(s"$base/point_map.parquet")
    val (phPix, phCnt) = sparseToArrays(readHistSparse(spark, s"$base/point_map.parquet"))
    val newMap = partitionMapFromSparseHist(phPix, phCnt, orderK, threshold)
    val sess = spark
    import sess.implicits._
    phPix.zip(phCnt).toSeq.toDF("pix", "cnt")
      .coalesce(1).write.mode("overwrite").parquet(s"$base/import_hist.parquet")
    spark.catalog.refreshByPath(s"$base/import_hist.parquet")
    val out = PartitionMap(orderK, newMap.grid, phPix, phCnt)
    writeMeta(spark, out, metaStr("ra_kw"), metaStr("dec_kw"), metaStr("id_kw"),
      outputDir, catname, threshold, metaNum("margin_deg").toDouble)
    fsys.delete(new Path(journalPath(base)), false)
    fsys.delete(new Path(s"$base/_repartition_stage"), true)
    out
  }

  /**
   * Resumable import — the reference partitioner's per-URL cache
   * machinery (partitioner.py:27,66) re-expressed Spark-first. A
   * failed import resumes from the last completed batch instead of
   * re-reading and re-parsing every source file:
   *
   *  - per input batch, ONE parse pass writes (a) the rows to
   *    `_import/stage/batch=N` and (b) the order-k pixel histogram to
   *    `_import/hist/batch=N`; Spark's atomic job commit (`_SUCCESS`)
   *    is the completion marker, so a re-run skips finished batches
   *    (csv/FITS parsing is the expensive part at catalog scale).
   *  - the partition map is rebuilt deterministically by summing the
   *    per-batch histograms (associative — identical to a direct
   *    full-scan histogram), then the final catalog/ + neighbor/ +
   *    meta write runs once over the columnar staging (itself an
   *    atomic overwrite: a phase-2 failure just reruns phase 2).
   *
   * Output is row-identical (including `_ID`) to a single-shot
   * [[write]] of the concatenated batches — asserted in ScalaTest.
   */
  def writeResumable(spark: SparkSession, batches: Seq[Seq[String]],
                     readBatch: Seq[String] => DataFrame,
                     raCol: String, decCol: String, idCol: String,
                     outputDir: String, catname: String,
                     orderK: Int = 6, threshold: Long = 1000000L, marginDeg: Double = 0.1,
                     cleanStaging: Boolean = false, summaryFiles: Boolean = true): PartitionMap = {
    import org.apache.hadoop.fs.Path
    requireOrderK(orderK)
    val importDir = s"$outputDir/$catname/_import"
    val fs = new Path(importDir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    def done(dir: String) = fs.exists(new Path(s"$dir/_SUCCESS"))

    def stageDir(i: Int) = s"$importDir/stage/batch=$i"
    def histDir(i: Int) = s"$importDir/hist/batch=$i"
    def batchDone(i: Int) = done(stageDir(i)) && done(histDir(i))

    // a resume with a DIFFERENT batch list — or sources regenerated
    // under the same paths — would silently mix stale staged data into
    // the new import. Pin path + size + mtime per source file in a
    // manifest on the first attempt. The PATH list must always match;
    // size/mtime are validated only for batches whose staging is
    // incomplete (those re-read their sources) — a COMPLETED batch's
    // staging is the source of truth, so its sources may be archived,
    // moved or touched without blocking the resume.
    def fileSig(p: String): String =
      try {
        val st = new Path(p).getFileSystem(spark.sparkContext.hadoopConfiguration)
          .getFileStatus(new Path(p))
        s"$p\u0001${st.getLen}:${st.getModificationTime}"
      } catch { case _: Exception => p } // non-stattable source: path-only pin
    def sigPath(sig: String): String = {
      val k = sig.indexOf('\u0001'); if (k < 0) sig else sig.substring(0, k)
    }
    val current = batches.map(_.map(fileSig))
    val manifestPath = s"$importDir/manifest.txt"
    if (fs.exists(new Path(manifestPath))) {
      val prev = HipsCatalog.readString(spark, manifestPath)
        .split("\n", -1).toSeq.map(_.split("\u0000", -1).toSeq)
      require(prev.length == current.length &&
        prev.zip(current).forall { case (pv, cu) => pv.map(sigPath) == cu.map(sigPath) },
        s"resumable import found staging for a DIFFERENT batch list under $importDir — " +
          "delete the _import directory to start over")
      batches.indices.foreach { i =>
        // gate on the STAGE marker only: a batch whose staging completed
        // but whose histogram is missing recomputes the histogram from
        // the staged bytes and never re-reads its sources — archiving or
        // touching them after staging must not block the resume
        if (!done(stageDir(i)))
          require(prev(i) == current(i),
            s"resumable import: sources of UNSTAGED batch $i changed (sizes or mtimes) since " +
              s"staging began — re-run with the original files, or delete $importDir to start over")
      }
    } else HipsCatalog.writeString(spark, manifestPath,
      current.map(_.mkString("\u0000")).mkString("\n"))

    batches.indices.foreach { i =>
      val stage = stageDir(i)
      val hist = histDir(i)
      if (!done(stage)) readBatch(batches(i)).write.mode("overwrite").parquet(stage)
      if (!done(hist)) {
        // histogram from the STAGED bytes (not the source) so the map
        // always matches what phase 2 will actually read
        spark.read.parquet(stage)
          .groupBy(sphere.hpix(col(raCol), col(decCol), orderK).as("pix"))
          .agg(count(lit(1)).as("cnt"))
          .coalesce(1).write.mode("overwrite").parquet(hist)
      }
    }

    val histRows = spark.read.parquet(batches.indices.map(i => s"$importDir/hist/batch=$i"): _*)
      .groupBy("pix").agg(sum("cnt").as("cnt"))
      .collect()
    val pm = partitionMapFromSparseHist(
      histRows.map(_.getLong(0)), histRows.map(_.getLong(1)), orderK, threshold)

    val staged = spark.read.parquet(batches.indices.map(i => s"$importDir/stage/batch=$i"): _*)
    writeWithMap(staged, pm, raCol, decCol, idCol, outputDir, catname, orderK, threshold,
      marginDeg, summaryFiles)
    if (cleanStaging) fs.delete(new Path(importDir), true)
    pm
  }
}

/**
 * Reader for a graft/HiPSCat-style partitioned catalog
 * (reference: hipscat/catalog.py Catalog.load + cone_search pruning).
 */
object HipsCatalog {
  import org.apache.hadoop.fs.Path

  // all filesystem access goes through the Hadoop FileSystem API so
  // catalogs on HDFS/S3 behave identically to local ones
  private def fs(spark: SparkSession, path: String) =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private[catalog] def writeString(spark: SparkSession, path: String, content: String): Unit = {
    val p = new Path(path)
    val out = fs(spark, path).create(p, true)
    try out.write(content.getBytes("UTF-8")) finally out.close()
  }

  private[catalog] def readString(spark: SparkSession, path: String): String = {
    val in = fs(spark, path).open(new Path(path))
    try new String(in.readAllBytes(), "UTF-8") finally in.close()
  }

  /** Load the full catalog dataframe (hive partition columns included).
   *  A lingering repartition journal means a writer crashed mid-commit
   *  (old + new sub-tile dirs may BOTH be visible = duplicate rows) —
   *  warn loudly and point at the repair path rather than silently
   *  double-counting; an ACTIVE repartition's commit window triggers
   *  the same warning, which is the documented transient-duplicates
   *  read behavior. */
  def load(spark: SparkSession, outputDir: String, catname: String): DataFrame = {
    val jp = s"$outputDir/$catname/_repartition_journal.json"
    if (fs(spark, jp).exists(new Path(jp)))
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        s"catalog $catname has a pending repartition commit ($jp): rows in split tiles " +
          "may appear twice until the commit finishes — if no repartition is running, " +
          "a writer crashed; run HipsPartitioner.recoverRepartition to roll it forward")
    spark.read.parquet(s"$outputDir/$catname/catalog")
  }

  /** Load the neighbor (margin) tree; empty DF with catalog schema if absent. */
  def loadNeighbors(spark: SparkSession, outputDir: String, catname: String): DataFrame = {
    val p = s"$outputDir/$catname/neighbor"
    if (fs(spark, p).exists(new Path(p))) spark.read.parquet(p)
    else load(spark, outputDir, catname).limit(0)
  }

  /**
   * Partition grid of a written catalog (SPARSE tiling, see
   * [[graft.functions.PartitionGrid]]), reconstructed from the hive
   * directory structure — catalog/ AND neighbor/ trees, so sky
   * regions that hold only margin replicas (empty home pixel,
   * populated border) still resolve. Regions with no files at all
   * become -1 gap tiles (no partition). Bounded by directory count.
   */
  def partitionGrid(spark: SparkSession, outputDir: String, catname: String, orderK: Int): PartitionGrid = {
    val tiles = scala.collection.mutable.Set.empty[(Long, Int)]
    for (tree <- Seq("catalog", "neighbor")) {
      val root = new Path(s"$outputDir/$catname/$tree")
      val f = fs(spark, root.toString)
      if (f.exists(root)) {
        for {
          od <- f.listStatus(root)
          if od.getPath.getName.startsWith("Norder=")
          o = od.getPath.getName.stripPrefix("Norder=").toInt
          dd <- f.listStatus(od.getPath)
          pd <- f.listStatus(dd.getPath)
          if pd.getPath.getName.startsWith("Npix=")
          p = pd.getPath.getName.stripPrefix("Npix=").toLong
        } tiles += ((p << (2 * (orderK - o)), o))
      }
    }
    PartitionGrid.fromTiles(orderK, tiles.toSeq)
  }

  /**
   * Catalog-level kNN cross-match consuming the PERSISTED margin
   * cache — the reference's stored-neighbor semantics
   * (catalog.py:144 cross_match + dask_utils.py:367): per right-
   * catalog partition pixel, candidates are that pixel's catalog
   * rows plus its neighbor-file rows; left rows are assigned to the
   * right catalog's partition pixel containing them (the hierarchy
   * alignment of util.map_catalog_hips, as one equi-join key).
   * No per-row disc cover at query time — that work was done once
   * at write time. Like the reference, matches beyond the stored
   * margin radius are not found: choose marginDeg >= dthresh at
   * write time for exactness (asserted in ScalaTest).
   */
  def crossMatchStored(spark: SparkSession, outputDir: String,
                       leftCat: String, rightCat: String,
                       leftRa: String, leftDec: String, leftId: String,
                       rightRa: String, rightDec: String, rightId: String,
                       k: Int, dthreshDeg: Double, orderK: Int,
                       rightPrefix: String = "r_", leftPrefix: String = "",
                       leftCols: Seq[String] = Nil, rightCols: Seq[String] = Nil): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import graft.functions.{sphere, PartitionGrid}

    // assign each left row to the RIGHT catalog's partition pixel —
    // codegen kernel over the broadcast grid (was a Scala UDF in r1).
    // The join key is the PACKED (order << 48 | pix) value: a bare
    // pixel number is ambiguous across orders in an adaptive map
    // ((2, 5) and (3, 5) can coexist), packing removes the hazard.
    val bc = spark.sparkContext.broadcast(partitionGrid(spark, outputDir, rightCat, orderK))
    // column selection is applied BEFORE the join, on both stored
    // sides, so the pruning reaches the parquet scans (ReadSchema) —
    // ra/dec/id are always kept (util.py:276 validate_user_input_cols)
    // left hive partition columns (Norder/Dir/Npix) are dropped before
    // prefixing, mirroring prep() on the right — otherwise an unpruned
    // call leaks `{cat}.Norder` etc. asymmetrically into the output
    val l0 = load(spark, outputDir, leftCat).drop("Norder", "Dir", "Npix")
    val lSel =
      if (leftCols.isEmpty) l0
      else l0.select((leftCols ++ Seq(leftRa, leftDec, leftId)).distinct.map(col): _*)
    val lm0 = lSel.withColumn("__jpix", graft.functions.native.packedPartitionPixel(
      col(leftRa), col(leftDec), orderK, bc))
    val lm = lm0.columns.filterNot(_ == "__jpix")
      .foldLeft(lm0)((d, c) => d.withColumnRenamed(c, leftPrefix + c))

    def prep(df: DataFrame): DataFrame = {
      val sel =
        if (rightCols.isEmpty) df
        else df.select((rightCols ++ Seq(rightRa, rightDec, rightId, "Norder", "Dir", "Npix"))
          .distinct.map(col): _*)
      val cols = sel.columns.filterNot(Seq("Norder", "Dir", "Npix").contains)
      sel.select((cols.map(col) :+
        shiftleft(col("Norder").cast("long"), 48).bitwiseOR(col("Npix")).as("__jpix")): _*)
    }
    // right candidates per pixel: home rows + stored margin replicas
    val r0 = prep(load(spark, outputDir, rightCat))
      .unionByName(prep(loadNeighbors(spark, outputDir, rightCat)))
    val rp = r0.columns.filterNot(_ == "__jpix").foldLeft(r0)((d, c) => d.withColumnRenamed(c, rightPrefix + c))

    // prefixed names may contain '.' (the reference's delim), which
    // col() would parse as struct access — backtick-quote them
    def qc(name: String) = col("`" + name + "`")
    val joined = lm.join(rp, "__jpix")
      .withColumn("_DIST", sphere.gcDist(qc(leftPrefix + leftRa), qc(leftPrefix + leftDec),
        qc(rightPrefix + rightRa), qc(rightPrefix + rightDec)))
      .filter(col("_DIST") < dthreshDeg)
    val w = Window.partitionBy(qc(leftPrefix + leftId))
      .orderBy(round(col("_DIST"), 9).asc, qc(rightPrefix + rightId).asc)
    joined.withColumn("_RANK", row_number().over(w)).filter(col("_RANK") <= k)
      // match-partition provenance, as in the in-flight crossMatchKnn
      // and the reference output (catalog.py:232 hips_k/hips_pix)
      .withColumn("hips_k", shiftright(col("__jpix"), 48).cast("int"))
      .withColumn("hips_pix", col("__jpix").bitwiseAND(lit(0xffffffffffffL)))
      .drop("__jpix")
  }

  /**
   * Cone search with *file-level* pruning: the hive partition filter
   * on (Norder, Npix) restricts the scan to overlapping partitions
   * before any row is read (catalog.py:65 semantics).
   */
  /** The pruning machinery shared by every stored-catalog search:
   *  column-pruned scan restricted to partitions overlapping the
   *  bounding cone.
   *
   *  The disc cover is computed at an ADAPTIVE order: the finest
   *  order <= orderK whose expected cover stays <= ~8k pixels, so a
   *  wide query (a full-RA dec band gives a 180-deg bounding cone)
   *  cannot blow up the driver-side candidate list no matter how
   *  fine the catalog's partition order is. A partition at order o
   *  overlaps the disc iff its coverOrder-aligned pixel does:
   *  ancestors for o <= coverOrder (InSet on rebinned cover),
   *  descendants via a constant shift for o > coverOrder — one small
   *  InSet per order, all over partition columns, so file-level
   *  pruning still applies. Coarsening only loses selectivity, never
   *  rows. */
  private def prunedScan(spark: SparkSession, outputDir: String, catname: String,
                         raDeg: Double, decDeg: Double, radiusDeg: Double, orderK: Int,
                         columns: Seq[String]): DataFrame = {
    import org.apache.spark.sql.functions._
    val discFrac = (1 - math.cos(math.toRadians(math.min(radiusDeg, 180.0)))) / 2
    val coverOrder = (0 to orderK).reverse
      .find(o => discFrac * Healpix.npix(o) <= 8192 || o == 0).getOrElse(0)
    val cover = Healpix.queryDiscCover(coverOrder, raDeg, decDeg, radiusDeg)
    val coverBoxed = cover.map(Long.box).toSeq
    val pred = (0 to orderK).map { o =>
      if (o <= coverOrder) {
        val anc = cover.map(_ >> (2 * (coverOrder - o))).distinct.map(Long.box).toSeq
        col("Norder") === o && col("Npix").isin(anc: _*)
      } else
        col("Norder") === o && shiftright(col("Npix"), 2 * (o - coverOrder)).isin(coverBoxed: _*)
    }.reduce(_ || _)
    val df = load(spark, outputDir, catname)
    // user column selection BEFORE any predicate so the pruning
    // reaches the parquet scan (caller guarantees ra/dec present;
    // Catalog.* appends ra/dec/id per the reference contract)
    val sel = if (columns.isEmpty) df
      else df.select((columns ++ Seq("Norder", "Npix")).distinct.map(col): _*)
    sel.filter(pred)
  }

  /** The hive columns were only needed for the partition filter — if
   *  the user picked columns and didn't ask for them, drop them. */
  private def dropHive(df: DataFrame, columns: Seq[String]): DataFrame =
    Seq("Norder", "Npix").filterNot(c => columns.isEmpty || columns.contains(c))
      .foldLeft(df)(_.drop(_))

  def coneSearch(spark: SparkSession, outputDir: String, catname: String,
                 raCol: String, decCol: String,
                 raDeg: Double, decDeg: Double, radiusDeg: Double, orderK: Int,
                 columns: Seq[String] = Nil): DataFrame = {
    import org.apache.spark.sql.functions._
    val filtered = prunedScan(spark, outputDir, catname, raDeg, decDeg, radiusDeg, orderK, columns)
      .withColumn("_DIST", graft.functions.sphere.gcDist(col(raCol), col(decCol), lit(raDeg), lit(decDeg)))
      .filter(col("_DIST") < radiusDeg)
    dropHive(filtered, columns)
  }

  /** Stored-path box search: partition pruning via the box's provable
   *  bounding cone, then the exact wrap-aware range predicate. */
  def boxSearch(spark: SparkSession, outputDir: String, catname: String,
                raCol: String, decCol: String,
                raLo: Double, raHi: Double, decLo: Double, decHi: Double, orderK: Int,
                columns: Seq[String] = Nil): DataFrame = {
    val ((cra, cdec), radius) = graft.operators.Spatial.boxBoundingCone(raLo, raHi, decLo, decHi)
    dropHive(graft.operators.Spatial.boxSearch(
      prunedScan(spark, outputDir, catname, cra, cdec, radius, orderK, columns),
      raCol, decCol, raLo, raHi, decLo, decHi), columns)
  }

  /** Stored-path convex polygon search: partition pruning via the
   *  polygon's bounding cone, then the exact gnomonic half-plane test. */
  def polygonSearch(spark: SparkSession, outputDir: String, catname: String,
                    raCol: String, decCol: String,
                    vertices: Seq[(Double, Double)], orderK: Int,
                    columns: Seq[String] = Nil): DataFrame = {
    val ((cra, cdec), radius, inside) =
      graft.operators.Spatial.polygonPredicate(raCol, decCol, vertices)
    dropHive(prunedScan(spark, outputDir, catname, cra, cdec, radius, orderK, columns)
      .filter(inside), columns)
  }
}
