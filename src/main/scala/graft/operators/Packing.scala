package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._

/**
 * Sequence assembly for training-data pipelines: packing documents
 * into fixed token-budget training sequences and slicing documents
 * into overlapping token-window chunks.
 *
 * Re-expresses the batch-assembly stage every LLM pretraining
 * pipeline runs between "deduplicated corpus" and "token shards" —
 * the reference engine has no analog (its unit is the catalog row);
 * these follow the same Spark-first rules as the rest of the
 * pipeline operators (map-only where possible, bounded shuffles,
 * deterministic under re-partitioning).
 */
object Packing {

  /**
   * Greedy next-fit sequence packing: assign each document to a
   * training sequence of at most `budget` tokens, never splitting a
   * document. Documents are first spread over `nBuckets` independent
   * packing streams by id hash (map-only), then packed sequentially
   * within their bucket in deterministic (hash, id) order: a document
   * opens a new sequence iff adding it would push the running total
   * over `budget`. A document longer than `budget` occupies a
   * sequence of its own (next-fit never splits).
   *
   * Scale shape: ONE shuffle (repartition by bucket) + a per-partition
   * streaming scan. Sequential packing is inherently order-dependent,
   * so parallelism comes from the bucket count, not from splitting a
   * stream: `nBuckets` should scale with the cluster (rows per bucket
   * ~ corpus/nBuckets; each bucket's scan is O(bucket) with O(1)
   * state). The assignment is a pure function of (id-hash order,
   * token counts), so it is stable across runs and cluster sizes —
   * repacking a grown corpus only perturbs the buckets whose
   * membership changed.
   *
   * Output: (idCol, bucket, seq, seq_pos, n_tok) — `seq` numbers
   * sequences within a bucket from 1 in packing order, `seq_pos`
   * positions the document within its sequence from 1.
   */
  def packGreedy(df: DataFrame, idCol: String, tokenCol: String,
                 budget: Long, nBuckets: Int): DataFrame = {
    require(budget > 0, s"budget must be > 0: $budget")
    require(nBuckets > 0, s"nBuckets must be > 0: $nBuckets")
    Sampling.requireIntegralId(df, idCol, "packGreedy")
    val spark = df.sparkSession
    import spark.implicits._
    // fail loudly (operator-named) on NULL id/token — the tuple
    // encoder below would otherwise throw a bare NullPointerException
    // from deep inside the task with no hint which operator or column
    def failNull(c: Column, what: String): Column =
      when(c.isNull, raise_error(lit(
        s"packGreedy: NULL $what — filter NULLs or assign values upstream"))).otherwise(c)
    val keyed = df.select(
        failNull(col(idCol).cast("long"), s"id ('$idCol')").as("__id"),
        Sampling.knuthHash(col(idCol)).as("__h"),
        failNull(col(tokenCol).cast("long"), s"token count ('$tokenCol')").as("__tok"))
      .withColumn("__bucket", col("__h") % nBuckets)
      .repartition(col("__bucket"))
      .sortWithinPartitions(col("__bucket"), col("__h"), col("__id"))
    val packed = keyed.as[(Long, Long, Long, Long)].mapPartitions { it =>
      // rows arrive sorted by (bucket, hash, id); reset on bucket change
      var bucket = -1L; var seq = 0L; var pos = 0L; var run = 0L
      it.map { case (id, _, tok, b) =>
        if (b != bucket || run + tok > budget) {
          seq = if (b != bucket) 1L else seq + 1L
          bucket = b; pos = 1L; run = tok
        } else { pos += 1L; run += tok }
        (id, b, seq, pos, tok)
      }
    }
    packed.toDF(idCol, "bucket", "seq", "seq_pos", "n_tok")
  }

  /** DuckDB twin of [[packGreedy]]: the bucket spread and (hash, id)
   *  order are plain SQL; the sequential next-fit scan is a recursive
   *  CTE walking each bucket's rows in rank order — an independent
   *  replay of the running-total recurrence. `tokenSql` must be the
   *  SQL twin of the Spark-side token count. */
  def packGreedySql(table: String, id: String, tokenSql: String,
                    budget: Long, nBuckets: Int): String = {
    val kh = Sampling.knuthHashSql(id)
    s"""WITH RECURSIVE hashed AS (
        SELECT $id AS doc_id, ($kh) AS h, CAST(($tokenSql) AS BIGINT) AS n_tok FROM $table
      ), ordered AS (
        SELECT doc_id, h % $nBuckets AS bucket, n_tok,
               row_number() OVER (PARTITION BY h % $nBuckets ORDER BY h, doc_id) AS rn
        FROM hashed
      ), pack AS (
        SELECT doc_id, bucket, n_tok, rn,
               CAST(1 AS BIGINT) AS seq, CAST(1 AS BIGINT) AS seq_pos, n_tok AS run
        FROM ordered WHERE rn = 1
        UNION ALL
        SELECT o.doc_id, o.bucket, o.n_tok, o.rn,
               CASE WHEN p.run + o.n_tok > $budget THEN p.seq + 1 ELSE p.seq END,
               CASE WHEN p.run + o.n_tok > $budget THEN CAST(1 AS BIGINT) ELSE p.seq_pos + 1 END,
               CASE WHEN p.run + o.n_tok > $budget THEN o.n_tok ELSE p.run + o.n_tok END
        FROM pack p JOIN ordered o ON o.bucket = p.bucket AND o.rn = p.rn + 1
      )
      SELECT doc_id, bucket, seq, seq_pos, n_tok FROM pack"""
  }

  /**
   * Overlapping token-window chunking: slice each document into
   * windows of `window` whitespace tokens advancing by
   * `window - overlap` tokens, covering every token (the final chunk
   * may be shorter). The context-length preprocessing step for
   * embedding/retrieval corpora.
   *
   * MAP-ONLY: a bounded explode (ceil(n/stride) chunks per doc — no
   * join, no shuffle) over codegen'd builtins (split/slice/
   * array_join), so it pipelines into whatever scan precedes it.
   * Tokenization is pinned to the engine-portable whitespace split
   * ([[TextAnalysis.withTokenCounts]] `ws_tokens` semantics: an empty
   * document has one empty token and yields one empty chunk).
   *
   * Output: (idCol, chunk_id, tok_start, n_tok, chunk) — `tok_start`
   * is the 0-based token offset of the window; `n_tok` the tokens
   * actually present in it.
   */
  def chunkTokens(df: DataFrame, idCol: String, textCol: String,
                  window: Int, overlap: Int): DataFrame = {
    require(window > 0, s"window must be > 0: $window")
    require(overlap >= 0 && overlap < window,
      s"overlap must be in [0, window): $overlap (window $window)")
    val stride = window - overlap
    val toks = TextAnalysis.wsTokens(col(textCol))
    val n = size(toks).cast("long")
    // chunks fully cover [0, n): 1 + ceil(max(n - window, 0) / stride)
    val nc = lit(1L) + floor((greatest(n - window, lit(0L)) + (stride - 1)) / lit(stride)).cast("long")
    df.select(col(idCol), toks.as("__toks"), n.as("__n"), nc.as("__nc"))
      .withColumn("chunk_id", explode(sequence(lit(0L), col("__nc") - 1)))
      .select(
        col(idCol),
        col("chunk_id"),
        (col("chunk_id") * stride).as("tok_start"),
        least(lit(window.toLong), col("__n") - col("chunk_id") * stride).as("n_tok"),
        array_join(slice(col("__toks"), (col("chunk_id") * stride + 1).cast("int"), lit(window)), " ")
          .as("chunk"))
  }

  /** DuckDB twin of [[chunkTokens]] (identical split/coverage/slice
   *  semantics; list slicing truncates at the array end on both
   *  engines). */
  def chunkTokensSql(table: String, id: String, textCol: String,
                     window: Int, overlap: Int): String = {
    val stride = window - overlap
    s"""WITH base AS (
        SELECT $id, regexp_split_to_array(trim($textCol), '\\s+') AS toks FROM $table
      ), ex AS (
        SELECT $id, toks, CAST(len(toks) AS BIGINT) AS n,
               unnest(range(1 + (greatest(CAST(len(toks) AS BIGINT) - $window, 0) + ${stride - 1}) // $stride)) AS i
        FROM base
      )
      SELECT $id, CAST(i AS BIGINT) AS chunk_id,
             CAST(i * $stride AS BIGINT) AS tok_start,
             CAST(least($window, n - i * $stride) AS BIGINT) AS n_tok,
             array_to_string(list_slice(toks, i * $stride + 1, least(i * $stride + $window, n)), ' ') AS chunk
      FROM ex"""
  }
}
