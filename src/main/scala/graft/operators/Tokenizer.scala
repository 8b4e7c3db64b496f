package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Tokenizer TRAINING on the cluster — the byte-pair-encoding merge loop
  * (Sennrich et al. 2016) that turns a raw corpus into a subword vocab.
  * Real tokenizer training at 100 TB is exactly this shape: the corpus
  * collapses to a WORD VOCABULARY (word, freq) in one pass — everything
  * after is bounded by vocab size, not corpus size — then each merge
  * round is one map-side-combined pair-count aggregation, a 1-row argmax
  * to the driver, and a per-row fold that applies the merge.
  */
object Tokenizer {

  /** `rounds` BPE merge iterations over the whitespace-token vocabulary.
    *
    * Per round: count adjacent symbol pairs (OVERLAPPING occurrences,
    * weighted by word frequency — the standard BPE count), pick the most
    * frequent pair with ties to the lexicographically smaller (l, r) so
    * the choice is deterministic, then merge occurrences in every word
    * LEFT-TO-RIGHT NON-OVERLAPPING via a struct-accumulator fold (a
    * merged symbol can only pair again in the NEXT round — standard BPE
    * semantics). The vocab is localCheckpoint'd per round, so lineage
    * stays O(1) however many merges run.
    *
    * Returns one row per round: the learned rule (lhs, rhs), its pair
    * count, and the corpus symbol total after applying it — the
    * compression curve a tokenizer trainer watches.
    */
  def bpeMerges(docs: DataFrame, textCol: String, rounds: Int = 2): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._

    def chars(w: Column): Column =
      when(length(w) === 0, array().cast("array<string>"))
        .otherwise(transform(sequence(lit(1), length(w)),
          i => w.substr(i, lit(1))))

    var vocab = docs
      .select(explode(TextFunctions.tokens(col(textCol))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("freq"))
      .select(col("freq"), chars(col("w")).as("syms"))
      .localCheckpoint()

    val out = scala.collection.mutable.ArrayBuffer[(Int, String, String, Long, Long)]()
    var exhausted = false
    (1 to rounds).foreach { round => if (!exhausted) {
      val pairCol =
        when(size(col("syms")) < 2, array().cast("array<struct<l:string,r:string>>"))
          .otherwise(transform(sequence(lit(0), size(col("syms")) - 2),
            i => struct(element_at(col("syms"), i + 1).as("l"),
              element_at(col("syms"), i + 2).as("r"))))
      val bestRows = vocab.select(col("freq"), explode(pairCol).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum("freq").as("cnt"))
        .orderBy(col("cnt").desc, col("l").asc, col("r").asc)
        .limit(1).collect()
      // empty corpus, or every word already a single symbol: no pairs
      // remain — training simply stops early
      if (bestRows.isEmpty) exhausted = true
      else {
      val best = bestRows(0)
      val (l, r, cnt) = (best.getString(0), best.getString(1), best.getLong(2))

      val zero = struct(array().cast("array<string>").as("out"),
        lit("").as("prev"))
      val foldMerge = aggregate(col("syms"), zero,
        (acc, s) =>
          when(acc("prev") === lit(l) && s === lit(r),
            struct(concat(acc("out"), array(lit(l + r))).as("out"),
              lit("").as("prev")))
            .when(acc("prev") === lit(""),
              struct(acc("out").as("out"), s.as("prev")))
            .otherwise(
              struct(concat(acc("out"), array(acc("prev"))).as("out"),
                s.as("prev"))),
        acc => when(acc("prev") === lit(""), acc("out"))
          .otherwise(concat(acc("out"), array(acc("prev")))))
      vocab = vocab.select(col("freq"), foldMerge.as("syms")).localCheckpoint()

      val nSym = vocab
        .agg(sum(size(col("syms")).cast("long") * col("freq")))
        .collect()(0).getLong(0)
      out += ((round, l, r, cnt, nSym))
      }
    }}
    out.toSeq.toDF("merge_round", "lhs", "rhs", "pair_count", "corpus_symbols")
  }
}
