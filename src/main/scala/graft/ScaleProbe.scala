package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * Scale probe for the training-data pipeline operators: inflates the
 * sf0.1 documents table (default 32x = 160k docs) with per-replica salt
 * tokens (so replicas of one doc sit at Jaccard ~0.74 — BELOW the 0.8
 * near-dup threshold — and the output stays bounded while candidate
 * volume scales realistically), then times the corpus-scale paths.
 * Evidence for SURVEY §4/§6 that the shapes hold beyond bench size;
 * not part of the driver contract.
 *
 * Run: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.ScaleProbe"
 */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val replicas = sys.env.getOrElse("SPARK_GRAFT_PROBE_REPLICAS", "32").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .withExtensions(graft.plans.GraftExtensions.install)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val base = spark.read.parquet(s"$sfDir/documents.parquet")
    val n = base.count()
    // per-replica salt: ~18 unique trigram-generating tokens appended,
    // so same-doc replicas share the original shingles only
    val big = spark.range(replicas).crossJoin(base)
      .select(
        (col("doc_id") + col("id") * 10000000L).as("doc_id"),
        col("lang"), col("source"),
        concat(col("text"), lit(" "),
          concat_ws(" ", (0 until 18).map(j => concat(lit(s"s"), col("id"), lit(s"x$j"))): _*)).as("text"))
      // base is one small parquet file = ONE input partition; without
      // an explicit repartition the whole probe would run single-task
      .repartition(cpus.toInt * 4)
      .persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
    val total = big.count()
    println(s"[probe] corpus: $total docs (${n} x $replicas)")

    def time[T](name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val rows = f
      println(f"[probe] $name: ${(System.nanoTime() - t0) / 1e9}%.1f s, $rows rows")
    }

    time("exactDedup")(graft.operators.Dedup.exactDedup(big, "doc_id", "text").count())
    time("minhashPairs")(graft.operators.Dedup.minhashPairs(big, "doc_id", "text").count())
    time("simhashPairs")(graft.operators.Dedup.simhashPairs(big, "doc_id", "text").count())
    time("nearDuplicates")(graft.operators.Dedup.nearDuplicates(big, "doc_id", "text").count())
    time("tfidfTopTerms")(graft.operators.TextAnalysis.tfidfTopTerms(big, "lang", "doc_id", "text").count())
    time("withSplit")(graft.operators.Sampling.withSplit(big, "doc_id")
      .groupBy("split").count().count())
    time("contaminationCheck")(graft.operators.Dedup.contaminationCheck(
      big, "doc_id", "text", base.limit(500), "text").filter(col("n_matched") > 0).count())

    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val bigEmb = spark.range(replicas).crossJoin(emb)
      .select((col("vec_id") + col("id") * 10000000L).as("vec_id"), col("embedding"))
      .repartition(cpus.toInt * 4)
    time(s"ivfAssign over ${replicas}x embeddings")(
      graft.operators.Ann.ivfAssign(bigEmb, "vec_id", "embedding").count())
    spark.stop()
  }
}
