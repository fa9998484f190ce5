package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer FIT over a corpus (Sennrich et al.
  * 1508.07909): iteratively merge the most frequent adjacent symbol
  * pair, starting from characters — the vocabulary-construction step a
  * training pipeline runs before token counting and packing.
  *
  * Scale shape: classic BPE fits over the WORD-FREQUENCY table, not the
  * corpus — the one corpus-scale pass is the (word, freq) aggregate
  * (counts-only shuffle); every merge round after that operates on the
  * vocabulary table, which is bounded by distinct-word count (millions,
  * not corpus-sized) and checkpointed once. Per round: one pair-count
  * aggregate over the vocab, a 1-row top-1 (TakeOrdered), and a pure-map
  * merge application via the broadcast winner — no corpus re-reads, no
  * driver-side loops over data.
  *
  * Determinism: symbols ride a \u001F-joined string (the separator
  * cannot appear inside whitespace-split tokens), merge application is
  * a left fold over the SYMBOL ARRAY — append `rhs` without a separator
  * when the accumulator's last symbol is exactly `lhs`, else append
  * separator+symbol — which is standard greedy left-to-right
  * non-overlapping pair merging and, unlike a raw string replace,
  * cannot match across symbol boundaries (rule (o,w) must not fire on
  * [b, lo, w] even though "ow" is a substring of the joined
  * form). The winner tie-breaks on (count DESC, lhs, rhs) binary
  * order, so the fit replays exactly in any engine (the DuckDB oracle
  * runs the same fold via `list_reduce`).
  *
  * Reference: qcfractal has no tokenizer; this extends the curation
  * surface (SURVEY §2.11) alongside tx_token_counts' regex form.
  */
object Bpe {

  private val SEP = "\u001F"

  /** Fit state: the merge table (rank, lhs, rhs, n) and the final
    * vocabulary representation (word, s, freq) after `rounds` merges —
    * both bounded by vocab size, never corpus size. */
  private def fitState(docs: DataFrame, textCol: String,
                       rounds: Int): (DataFrame, DataFrame) = {
    require(rounds >= 1, "rounds must be >= 1")
    // the one corpus-scale pass: word frequencies, then the char-split
    // representation. Checkpointed — every merge round reads this table.
    val vocab = docs
      .select(explode(TextFunctions.wsTokens(col(textCol))).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))
      .select(col("word"),
        rtrim(regexp_replace(col("word"), "(.)", "$1" + SEP), SEP).as("s"),
        col("freq"))
      .localCheckpoint(eager = true)
    var repr = vocab
    var merges: DataFrame = null
    var exhausted = false
    for (r <- 1 to rounds if !exhausted) {
      val pairs = repr
        .select(split(col("s"), SEP).as("sym"), col("freq"))
        // sequence(1, 0) would infer a DESCENDING step in Spark — guard
        // single-symbol words out before building pair indexes
        .filter(size(col("sym")) >= 2)
        .select(col("freq"), explode(transform(
          sequence(lit(1), size(col("sym")) - 1),
          i => struct(element_at(col("sym"), i).as("lhs"),
            element_at(col("sym"), i + 1).as("rhs")))).as("p"))
        .groupBy(col("p.lhs").as("lhs"), col("p.rhs").as("rhs"))
        .agg(sum(col("freq")).as("n"))
      // 1 row (or 0 at exhaustion); checkpointed so the output union and
      // the next round's merge application share one computation
      val top = pairs.orderBy(col("n").desc, col("lhs"), col("rhs")).limit(1)
        .localCheckpoint(eager = true)
      val m = top.select(lit(r).as("rank"), col("lhs"), col("rhs"), col("n"))
      merges = if (merges == null) m else merges.unionByName(m)
      // exhaustion guard: an empty winner must leave `repr` UNTOUCHED —
      // a crossJoin against zero rows would annihilate the whole
      // vocabulary and tokenCounts would return zero rows. `top` is an
      // eager 1-or-0-row checkpoint, so this count is free.
      if (top.isEmpty) exhausted = true
      else repr = repr.crossJoin(broadcast(top))
        .select(col("word"), applyMerge(col("s"), col("lhs"), col("rhs"))
          .as("s"), col("freq"))
    }
    (merges, repr)
  }

  /** One merge rule applied to a -joined symbol string: left fold
    * over the symbol array, appending `rhs` separator-less when the
    * accumulator's last symbol is exactly `lhs`. The suffix test
    * (`acc == lhs` or acc ends with SEP+lhs) is boundary-exact because
    * symbols never contain the separator; the just-merged symbol
    * (lhs+rhs) never re-fires the same rule, which is the standard
    * non-overlapping greedy semantics. Runs on the vocab table only —
    * never corpus-scale — so the HOF is off the hot path. */
  private def applyMerge(s: org.apache.spark.sql.Column,
                         lhs: org.apache.spark.sql.Column,
                         rhs: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val sym = split(s, SEP)
    aggregate(
      slice(sym, lit(2), greatest(size(sym) - 1, lit(0))),
      element_at(sym, 1),
      (acc, x) => when(
        x === rhs && (acc === lhs || acc.endsWith(concat(lit(SEP), lhs))),
        concat(acc, x)
      ).otherwise(concat(acc, lit(SEP), x)))
  }

  /** The first `rounds` BPE merges as (rank, lhs, rhs, n) — `n` is the
    * corpus frequency of the merged pair at the time of its merge. A
    * round whose vocabulary has no adjacent pair left emits no row
    * (fit-to-exhaustion on tiny corpora). */
  def fitMerges(docs: DataFrame, textCol: String, rounds: Int): DataFrame =
    fitState(docs, textCol, rounds)._1

  /** Corpus token counts UNDER the fitted vocabulary — the number a
    * token-budget planner actually needs: per `sourceCol`, whitespace
    * token count vs BPE symbol count after `rounds` merges, plus
    * symbols-per-word. The apply is a broadcast join of the bounded
    * (word → n_sym) table onto per-(source, word) occurrence counts —
    * the corpus text is touched exactly once (the occurrence aggregate);
    * no per-document re-segmentation. */
  def tokenCounts(docs: DataFrame, textCol: String, sourceCol: String,
                  rounds: Int): DataFrame = {
    val (_, finalRepr) = fitState(docs, textCol, rounds)
    val nSym = finalRepr.select(col("word"),
      size(split(col("s"), SEP)).cast("long").as("n_sym"))
    val occ = docs
      .select(col(sourceCol).as("source"),
        explode(TextFunctions.wsTokens(col(textCol))).as("word"))
      .groupBy(col("source"), col("word")).agg(count(lit(1)).as("occ"))
    occ.join(broadcast(nSym), "word")
      .groupBy(col("source"))
      .agg(sum(col("occ")).as("n_tokens_ws"),
        sum(col("occ") * col("n_sym")).as("n_tokens_bpe"))
      .select(col("source"), col("n_tokens_ws"), col("n_tokens_bpe"),
        round(col("n_tokens_bpe").cast("double") / col("n_tokens_ws"), 6)
          .as("syms_per_word"))
  }
}
