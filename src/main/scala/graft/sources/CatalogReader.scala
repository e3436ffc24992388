package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/**
 * Source-catalog ingest — the input side of the reference partitioner
 * (hipscat/partitioner.py:26: fmt csv/csv.gz/parquet/fits, ra_kw/
 * dec_kw/id_kw column keywords, dtype overrides, skiprows, and
 * positional column indices for headerless files;
 * dask_utils.py:29 _gather_statistics_hpix_hist does the reading).
 *
 * Spark-first: csv/csv.gz/parquet are native distributed scans
 * (csv.gz decompresses per-file; at scale prefer parquet or split
 * csv). FITS goes through [[graft.sources.Fits]], a from-scratch
 * BINTABLE parser (one task per file).
 */
object CatalogReader {

  final case class CatalogSpec(
      fmt: String, // csv | csv.gz | parquet | fits
      raKw: String = "ra",
      decKw: String = "dec",
      idKw: String = "source_id",
      header: Boolean = true,
      // positional fallbacks for headerless csv (reference: ra_kw as int)
      raIdx: Int = -1, decIdx: Int = -1, idIdx: Int = -1,
      skipRows: Int = 0,
      dtypes: Map[String, String] = Map.empty,
      schema: Option[StructType] = None)

  /**
   * Read source files and normalize to a dataframe with canonical
   * `ra`, `dec`, `id` columns (original columns retained).
   */
  def read(spark: SparkSession, paths: Seq[String], spec: CatalogSpec): DataFrame = {
    val raw = spec.fmt match {
      case "csv" | "csv.gz" =>
        var r = spark.read
          .option("header", spec.header.toString)
          .option("inferSchema", spec.schema.isEmpty.toString)
        spec.schema.foreach(s => r = r.schema(s))
        if (spec.skipRows > 0) {
          // distributed skip: csv has no skiprows option; read as text,
          // drop the first rows of each FILE by line index, re-parse.
          // The per-file line index orders by (block byte offset, id):
          // a splittable csv larger than maxPartitionBytes arrives as
          // several splits whose PARTITIONS Spark may bin-pack out of
          // file order, so monotonically_increasing_id alone is not
          // file order — input_file_block_start() is (each line belongs
          // to the split it starts in; splits order by offset), and
          // within a split the monotonic id preserves reader order.
          val text = spark.read.textFile(paths: _*)
            .withColumn("__f", input_file_name())
            .withColumn("__blk", input_file_block_start())
            .withColumn("__id", monotonically_increasing_id())
          val w = org.apache.spark.sql.expressions.Window.partitionBy("__f")
            .orderBy(col("__blk"), col("__id"))
          val body = text.withColumn("__rn", row_number().over(w))
            .filter(col("__rn") > spec.skipRows)
            .select("value")
          r.csv(body.as[String](org.apache.spark.sql.Encoders.STRING))
        } else r.csv(paths: _*)
      case "parquet" => spark.read.parquet(paths: _*)
      case "fits" => readFits(spark, paths)
      case other => throw new IllegalArgumentException(
        s"format '$other' not supported (csv, csv.gz, parquet, fits)")
    }
    val dtyped = spec.dtypes.foldLeft(raw) { case (d, (c, t)) => d.withColumn(c, col(c).cast(t)) }
    val cols = dtyped.columns
    def pick(kw: String, idx: Int): String =
      if (cols.contains(kw)) kw
      else if (idx >= 0 && idx < cols.length) cols(idx)
      else throw new IllegalArgumentException(s"column '$kw' not found and no valid positional index")
    dtyped
      .withColumn("ra", col(pick(spec.raKw, spec.raIdx)).cast("double"))
      .withColumn("dec", col(pick(spec.decKw, spec.decIdx)).cast("double"))
      .withColumn("id", col(pick(spec.idKw, spec.idIdx)))
  }

  /**
   * Extract catalog file URLs from an HTML directory listing —
   * the reference's `util.get_cat_urls` (util.py:374) without the
   * network fetch (zero-egress here): pass the fetched HTML in.
   */
  def parseCatalogLinks(html: String, baseUrl: String, fmt: String): Seq[String] = {
    val href = """href\s*=\s*["']([^"']+)["']""".r
    href.findAllMatchIn(html).map(_.group(1))
      .filter(_.endsWith(fmt))
      .map(h => if (h.startsWith("http")) h else baseUrl + h)
      .toSeq
  }

  /**
   * Live counterpart of [[parseCatalogLinks]] — the reference's
   * `util.get_cat_urls` (util.py:374) INCLUDING the fetch: GET the
   * directory listing over HTTP and parse out the catalog file URLs.
   * `fetch` is injectable (tests use a loopback server; air-gapped
   * deployments can hand in a file reader); the default is a plain
   * JDK HttpURLConnection GET with bounded timeouts — driver-side
   * only, one small listing page, never per-row.
   */
  def getCatUrls(listingUrl: String, fmt: String,
                 fetch: String => String = httpGet(_)): Seq[String] = {
    val base = if (listingUrl.endsWith("/")) listingUrl else listingUrl + "/"
    parseCatalogLinks(fetch(listingUrl), base, fmt)
  }

  /** Bounded-timeout HTTP GET (JDK-only, no extra dependencies). */
  def httpGet(url: String, connectTimeoutMs: Int = 10000, readTimeoutMs: Int = 30000): String = {
    val conn = new java.net.URL(url).openConnection()
      .asInstanceOf[java.net.HttpURLConnection]
    conn.setConnectTimeout(connectTimeoutMs)
    conn.setReadTimeout(readTimeoutMs)
    conn.setRequestMethod("GET")
    try {
      val code = conn.getResponseCode
      require(code >= 200 && code < 300, s"GET $url -> HTTP $code")
      val in = conn.getInputStream
      try new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
      finally in.close()
    } finally conn.disconnect()
  }

  /** FITS binary-table ingest — see [[graft.sources.Fits]]. */
  def readFits(spark: SparkSession, paths: Seq[String]): DataFrame = Fits.read(spark, paths)
}
