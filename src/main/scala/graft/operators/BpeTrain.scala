package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextExpressions

/** Distributed BPE tokenizer TRAINING (Sennrich et al. 2016) — the one
  * training-data-pipeline stage the engine previously only consumed
  * (q43 tokenizes with a fixed regex; nothing LEARNED a vocabulary).
  *
  * Scale shape (100 TB): the corpus is touched EXACTLY ONCE — the
  * word-frequency aggregation (map-side combined, one exchange on
  * word). Every merge iteration then runs over the COMPRESSED distinct-
  * word table (vocabulary-sized, ~10⁵–10⁷ rows regardless of corpus
  * size): one pair-count aggregation + one codegen `MergePair` map per
  * learned merge. Driver state is the merge list (k rows) and one
  * top-1 row per iteration — never the corpus, never the word table.
  *
  * Determinism: ties in pair frequency break on (left, right) string
  * order, so the learned merge sequence is a pure function of the
  * corpus — re-running training yields the identical vocabulary (the
  * q111 gate re-runs it and checks).
  */
object BpeTrain {

  /** One learned merge: at step `rank`, (left, right) → left·right,
    * which at selection time had weighted adjacent frequency `freq`.
    */
  final case class Merge(rank: Int, left: String, right: String, freq: Long)

  /** Training result: the ordered merge list plus the weighted symbol
    * total before training and after EACH merge. Selection-time `freq`
    * counts OVERLAPPING pairs ("aaa" holds two (a,a) pairs) while the
    * greedy application merges ⌊chain/2⌋ of each run — so the exact
    * bookkeeping is a two-sided bound, checked by the q111 gate:
    * freq/2 ≤ symbols removed at step r ≤ freq.
    */
  final case class Result(merges: Seq[Merge], initialSymbols: Long,
                          stepSymbols: Seq[Long]) {
    def finalSymbols: Long = stepSymbols.lastOption.getOrElse(initialSymbols)
  }

  /** The ONLY corpus-wide pass: (word, freq) via the dedup tier's
    * normalization (trim+lower, split on whitespace, boundary empties
    * dropped — they carry no characters to merge).
    */
  def wordCounts(docs: DataFrame): DataFrame =
    docs.select(explode(split(trim(lower(col("text"))), "\\s+")).as("word"))
      .filter(col("word") =!= "")
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))

  /** Initial symbol sequence: one single-codepoint string per position
    * (Spark `substr` and DuckDB `string_split(word, '')` are both
    * codepoint-aware, so the oracle replays this split exactly).
    */
  private def charSymbols(word: Column): Column =
    transform(sequence(lit(0), length(word) - 1), i => word.substr(i + 1, lit(1)))

  /** Weighted adjacent-pair counts over a symbol table — the statistic
    * each BPE iteration maximizes. Exposed standalone as q110 (with the
    * initial per-character symbols) because it is the SQL-expressible
    * slice of training: one exact DuckDB oracle for the tie-broken
    * top-N pair ranking.
    */
  def pairCounts(words: DataFrame, symCol: String = "syms"): DataFrame =
    words.filter(size(col(symCol)) >= 2)
      .select(col("freq"), explode(transform(
        sequence(lit(0), size(col(symCol)) - 2),
        j => struct(element_at(col(symCol), j + 1).as("l"),
          element_at(col(symCol), j + 2).as("r")))).as("p"))
      .groupBy(col("p.l").as("pair_left"), col("p.r").as("pair_right"))
      .agg(sum(col("freq")).as("cnt"))

  /** q110's shape: top-`n` weighted adjacent CHARACTER pairs of the
    * corpus (cnt desc, then pair order — fully deterministic).
    */
  def pairStats(docs: DataFrame, n: Int): DataFrame =
    pairCounts(wordCounts(docs).select(col("freq"), charSymbols(col("word")).as("syms")))
      .orderBy(col("cnt").desc, col("pair_left"), col("pair_right"))
      .limit(n)

  /** Learn up to `numMerges` merges with weighted pair frequency ≥
    * `minFreq`. Each iteration: one distributed top-1 pair count over
    * the word table, then one codegen MergePair map. The new table is
    * `localCheckpoint`ed, NOT persist()-chained: a chain of k cached
    * frames nests k InMemoryRelations, and Spark's plan STRINGIFICATION
    * (AQE's explainString on every collect) grows super-linearly in
    * that nesting — measured: OOM at k = 20 on a 31-word table. The
    * checkpoint cuts the lineage to a LogicalRDD each step; blocks of
    * dropped iterations are reclaimed by the ContextCleaner once
    * unreferenced (the table is vocabulary-sized either way).
    */
  def learn(spark: SparkSession, docs: DataFrame, numMerges: Int,
            minFreq: Long = 2L): Result = {
    def weighted(df: DataFrame): Long =
      df.agg(coalesce(sum(col("freq") * size(col("syms"))), lit(0L)).as("total"))
        .head().getLong(0)
    var words = wordCounts(docs)
      .select(col("freq"), charSymbols(col("word")).as("syms")).localCheckpoint()
    // the weighted symbol total obeys Σ_w freq·len = Σ_pairs cnt + Σ_w freq
    // (freq·len = freq·(len−1) + freq, and single-symbol words contribute
    // 0 pairs), and Σ_w freq never changes across merges — so computing it
    // ONCE lets every iteration read the current total off the pair table
    // it already aggregates, replacing the former crossJoin'd second scan
    // of the word table with an `observe` on the same single pass
    val sumFreq = words.agg(coalesce(sum(col("freq")), lit(0L)))
      .head().getLong(0)
    var initial = 0L
    val merges = scala.collection.mutable.ArrayBuffer.empty[Merge]
    val steps = scala.collection.mutable.ArrayBuffer.empty[Long]
    var done = false
    var iter = 0
    while (!done && merges.length < numMerges) {
      // ONE collect per iteration: the winning pair, with Σ cnt riding as
      // an observed metric on the same pass (the total observed here is
      // the state AFTER the previous merge — per-step bookkeeping for
      // free). The checkpoint of the merged table is LAZY: it
      // materializes inside the next iteration's collect instead of as a
      // separate job, and still truncates the lineage at that point.
      val obs = new org.apache.spark.sql.Observation()
      val stat = pairCounts(words)
        .observe(obs, coalesce(sum(col("cnt")), lit(0L)).as("sum_cnt"))
        .orderBy(col("cnt").desc, col("pair_left"), col("pair_right"))
        .limit(1).collect()
      val totalNow = obs.get("sum_cnt").asInstanceOf[Long] + sumFreq
      if (iter == 0) initial = totalNow else steps += totalNow
      if (stat.isEmpty || stat(0).getLong(2) < minFreq) done = true
      else {
        val (l, r, c) = (stat(0).getString(0), stat(0).getString(1), stat(0).getLong(2))
        merges += Merge(merges.length, l, r, c)
        words = words.select(col("freq"),
          TextExpressions.mergePair(col("syms"), l, r).as("syms"))
          .localCheckpoint(false)
      }
      iter += 1
    }
    if (steps.length < merges.length) steps += weighted(words)
    Result(merges.toSeq, initial, steps.toSeq)
  }

  /** Segment a corpus with a learned merge list: per word, the char
    * split then the k merges IN RANK ORDER — k nested codegen MergePair
    * expressions, zero shuffles, model-in-plan exactly like the quality
    * tier's weight tables. Output: (doc_id, subwords array<string>).
    */
  def segment(docs: DataFrame, merges: Seq[Merge]): DataFrame = {
    val ordered = merges.sortBy(_.rank)
    // boundary empty words (a doc bounded by \t/\n survives ASCII trim)
    // must drop BEFORE the char split — charSymbols assumes ≥1 codepoint
    val wordsArr = filter(split(trim(lower(col("text"))), "\\s+"),
      w => w =!= lit(""))
    val seg = transform(wordsArr,
      w => ordered.foldLeft(charSymbols(w))((acc, m) =>
        TextExpressions.mergePair(acc, m.left, m.right)))
    docs.select(col("doc_id"), flatten(seg).as("subwords"))
  }
}
