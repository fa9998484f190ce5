package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.text.TextFunctions

/** Cross-document exact-substring spans (Lee et al. 2107.06499,
  * "Deduplicating Training Data Makes Language Models Better" — the
  * ExactSubstr pass: remove a span everywhere it repeats verbatim across
  * documents). The paper builds a corpus suffix array; the Spark-native
  * equivalent rides fixed-length token-gram postings: any verbatim
  * repeat of ≥ L tokens contains a repeated L-gram at every offset, so
  * the union of positions whose L-gram occurs in ≥ 2 DISTINCT documents
  * is exactly the cross-doc-repeated region, and merging contiguous
  * covered positions recovers the maximal spans (span_len ≥ L by
  * construction; a span reported at length exactly L is the minimal
  * unit, longer repeats merge into one interval).
  *
  * This is the cross-document sibling of the dd_repeated_spans coverage
  * row (which counts within- OR cross-doc window repeats and reports
  * per-doc fractions): here the df is DISTINCT-doc, and the output is
  * the removal list itself — (doc, span_start, span_len) intervals.
  *
  * Scale shape: no pair enumeration anywhere — unlike doc-level near-dup
  * (candidates = bucket pairs), span dedup needs only "does this gram
  * occur in another doc", so the plan is one (gram → distinct-doc df)
  * hash aggregate and one linear semi-join back onto the gram stream;
  * work is O(total tokens) regardless of how hot a gram is (a
  * boilerplate gram shared by every doc widens covered intervals, it
  * never multiplies rows — the reason dd_containment's df-cap is not
  * needed here). Grams travel as xxhash64 of the US-separator-joined window
  * (8 bytes, not L tokens); the interval merge is a per-doc window over
  * COVERED positions only, bounded by document length.
  */
object SpanDedup {

  /** Maximal cross-document repeated spans: every interval of `docs`
    * whose L-token windows all occur in at least 2 distinct documents.
    * Returns (doc_id, span_start 1-based, span_len tokens, n_grams)
    * ordered by (doc_id, span_start). */
  def crossDocSpans(docs: DataFrame, idCol: String, textCol: String,
                    L: Int): DataFrame = {
    // one pure-map NATIVE pass: all n-L+1 window hashes per doc from the
    // fused TokenWindowHashes kernel — bit-identical to the wsTokens →
    // transform/xxhash64(concat_ws("\u001F", ...)) chain it replaced (the
    // \u001F join is boundary-unambiguous and matches the oracle's
    // chr(31)); a doc shorter than L tokens hashes to an empty array and
    // the explode drops it, so no token-count pre-filter pass is needed
    val wins = docs.select(col(idCol).as("doc_id"),
        posexplode(graft.functions.TokenWindows(col(textCol), L)))
      .select(col("doc_id"), (col("pos") + 1).cast("long").as("p"),
        col("col").as("h"))
    // "occurs in ≥ 2 distinct docs" ⇔ min(doc) ≠ max(doc): a plain
    // min/max aggregate with map-side partials, where COUNT(DISTINCT)
    // plans a second full exchange of the gram stream
    val rep = wins.groupBy(col("h"))
      .agg(min(col("doc_id")).as("d0"), max(col("doc_id")).as("d1"))
      .filter(col("d0") =!= col("d1"))
      .select(col("h"))
    val covered = wins.join(rep, "h").select(col("doc_id"), col("p"))
    // gaps-and-islands over covered positions: gram at p covers
    // [p, p+L-1], so intervals merge while p ≤ prev + L (touching or
    // overlapping) and a new island starts past that
    val w = Window.partitionBy(col("doc_id")).orderBy(col("p"))
    covered
      .withColumn("brk",
        when(col("p") > lag(col("p"), 1).over(w) + L, 1L).otherwise(0L))
      .withColumn("isl", sum(col("brk")).over(w))
      .groupBy(col("doc_id"), col("isl"))
      .agg(min(col("p")).as("span_start"),
        (max(col("p")) - min(col("p")) + L).as("span_len"),
        count(lit(1)).as("n_grams"))
      .select(col("doc_id"), col("span_start"), col("span_len"),
        col("n_grams"))
      .orderBy(col("doc_id"), col("span_start"))
  }

  /** The ACTION half of ExactSubstr dedup: remove every cross-document
    * repeated span from every document (Lee et al. §3.2 remove ALL
    * occurrences — simpler than keep-one and measured slightly better in
    * the paper). Returns (doc_id, text_scrubbed, n_toks, n_removed):
    * the whitespace-normalized text with covered tokens dropped, plus
    * the removal accounting a curation report needs.
    *
    * Same no-pair-join scale shape as [[crossDocSpans]], then: covered
    * token INDICES come from one bounded explode of each covered window
    * (≤ L rows per covered gram, linear), kept tokens are a left-anti
    * join of the (doc, position, token) stream against them, and
    * reassembly is a per-document sort-free aggregate (array_sort over
    * the doc's own bounded (pos, tok) list — documents are the parallel
    * unit, nothing corpus-wide ever sorts). Documents shorter than L
    * tokens, or with no repeats, pass through with n_removed = 0; a
    * fully-repeated document scrubs to the empty string.
    *
    * COLLISION BUDGET: repeated grams are keyed on xxhash64 of the
    * joined window, so two DISTINCT grams colliding in 64 bits would
    * over-scrub (a destructive edit, not just a reported span). With
    * ~n windows the collision probability is ~n²/2⁶⁵ — negligible at
    * current corpus sizes, but at a 100 TB run (~10¹² windows ⇒
    * expected collisions ≈ 10⁴) widen the key to a pair of independent
    * hashes (xxhash64 with two seeds), or re-verify covered windows
    * against the raw tokens before dropping them. */
  def scrubCrossDocSpans(docs: DataFrame, idCol: String, textCol: String,
                         L: Int): DataFrame = {
    val toks = docs.select(col(idCol).as("doc_id"),
      TextFunctions.wsTokens(col(textCol)).as("t"))
    // native fused window hashes; empty array for docs under L tokens
    // (same bit-identical swap + min≠max df test as [[crossDocSpans]])
    val wins = docs.select(col(idCol).as("doc_id"),
        posexplode(graft.functions.TokenWindows(col(textCol), L)))
      .select(col("doc_id"), (col("pos") + 1).cast("long").as("p"),
        col("col").as("h"))
    val rep = wins.groupBy(col("h"))
      .agg(min(col("doc_id")).as("d0"), max(col("doc_id")).as("d1"))
      .filter(col("d0") =!= col("d1"))
      .select(col("h"))
    val covTok = wins.join(rep, "h")
      .select(col("doc_id"),
        explode(sequence(col("p"), col("p") + (L - 1))).as("i"))
      .distinct()
    val tokpos = toks.select(col("doc_id"), posexplode(col("t")))
      .select(col("doc_id"), (col("pos") + 1).cast("long").as("i"),
        col("col").as("tok"))
    val kept = tokpos.join(covTok, Seq("doc_id", "i"), "left_anti")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_kept"),
        array_join(transform(
          array_sort(collect_list(struct(col("i"), col("tok")))),
          x => x.getField("tok")), " ").as("text_scrubbed"))
    toks.select(col("doc_id"), size(col("t")).cast("long").as("n_toks"))
      .join(kept, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("text_scrubbed"), lit("")).as("text_scrubbed"),
        col("n_toks"),
        (col("n_toks") - coalesce(col("n_kept"), lit(0L))).as("n_removed"))
      .orderBy(col("doc_id"))
  }
}
