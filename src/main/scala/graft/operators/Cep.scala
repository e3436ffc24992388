package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Complex-event-processing primitives: MATCH_RECOGNIZE-style regex
 * pattern matching over per-key ordered event sequences.
 *
 * Each event type is encoded as one character; a key's whole history
 * becomes a string in event order, and patterns are ordinary regexes
 * over that alphabet ("v[cv]*p" = a view leading through views/clicks
 * to a purchase). Matching is Java-regex `find()` — leftmost,
 * non-overlapping. For alphabets where the terminator characters are
 * disjoint from the repeated classes (as here), leftmost matches are
 * unique, so RE2-based engines (the DuckDB oracle) produce identical
 * spans.
 *
 * Scale: ONE shuffle (groupBy key); per-key state is that key's event
 * count — the inherent cost of whole-history regex CEP. For keys with
 * unbounded histories, sessionize first ([[graft.streaming.Sessionize]])
 * and match within sessions.
 */
object Cep {

  /** Per-key event strings: one row per key with the concatenated
   *  single-char codes in (orderCols) order. `code` must be a
   *  single-character column expression. */
  def eventSequences(df: DataFrame, keyCol: String, code: Column,
      orderCols: Seq[String]): DataFrame = {
    val st = struct(orderCols.map(col) :+ code.as("__code"): _*)
    df.select(col(keyCol), st.as("__st"))
      .groupBy(keyCol)
      // array_sort on the struct orders by the leading orderCols;
      // collect_list is unordered across tasks, the sort makes the
      // sequence deterministic regardless of partitioning
      .agg(array_join(
        transform(array_sort(collect_list(col("__st"))), x => x.getField("__code")),
        "").as("seq"))
  }

  /** Match a regex pattern against each key's sequence: match count,
   *  longest span, and total matched length (all 0 when no match).
   *  Non-overlapping leftmost semantics on both engines. */
  def patternMatch(seqs: DataFrame, pattern: String): DataFrame = {
    val ms = regexp_extract_all(col("seq"), lit(pattern), lit(0))
    seqs
      .withColumn("seq_len", length(col("seq")).cast("long"))
      .withColumn("n_matches", size(ms).cast("long"))
      .withColumn("max_span",
        coalesce(array_max(transform(ms, x => length(x))), lit(0)).cast("long"))
      .withColumn("matched_chars",
        coalesce(aggregate(ms, lit(0), (a, x) => a + length(x)), lit(0)).cast("long"))
  }
}
