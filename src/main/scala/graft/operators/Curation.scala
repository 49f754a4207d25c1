package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Dataset-curation operators for a training-data pipeline: deterministic
  * sampling, benchmark-contamination checks, duplicate clustering,
  * pattern redaction, shard assignment, and latest-record compaction.
  * (North-star extensions beyond the reference's vector surface, like
  * `TextOps`/`Dedup` — the reference engine, kemingy/rabitq, has no
  * curation tier.)
  *
  * Every operator here is deterministic and (where SQL-expressible)
  * DuckDB-oracle-able: sampling/sharding decisions come from the shared
  * portable affine-hash families (`Dedup.affine`, mod `Dedup.P`) rather
  * than `rand()`, so a re-run — or a different engine — selects the same
  * rows. That is also the property a real pipeline wants: samples are
  * reproducible across retries and joinable across stages.
  */
object Curation {

  /** Portable per-row hash in [0, P): (a·(id mod P) + b) mod P with the
    * j-th affine family. `id` is reduced mod P first so the product stays
    * under ~2^60 for any BIGINT id — no overflow on either engine.
    */
  def rowHash(id: Column, family: Int): Column = {
    val (a, b) = Dedup.affine(family)
    (lit(a) * (id % Dedup.P) + lit(b)) % Dedup.P
  }

  /** Deterministic stratified sampling: keep a row iff
    * rowHash(id) < floor(rate(stratum)·P). Pure codegen filter — no
    * shuffle, no RNG state, embarrassingly parallel at any scale — and
    * the kept set is a superset across increasing rates (same hash, lower
    * threshold ⊂ higher threshold), which makes nested sample sizes
    * (1% ⊂ 10% ⊂ 50%) consistent, the property ablation studies need.
    *
    * `rates` maps stratum value → keep rate in [0,1]; absent strata use
    * `default`.
    */
  def stratifiedSample(df: DataFrame, id: Column, stratum: Column,
      rates: Map[String, Double], default: Double): DataFrame = {
    val threshold = rates.foldLeft(lit(math.floor(default * Dedup.P).toLong)) {
      case (acc, (k, r)) => when(stratum === k, lit(math.floor(r * Dedup.P).toLong)).otherwise(acc)
    }
    df.filter(rowHash(id, 0) < threshold)
  }

  /** Benchmark-contamination check: (corpus doc, benchmark doc) pairs
    * sharing ≥ `minOverlap` distinct word n-grams. The decontamination
    * pass every LLM training pipeline runs before training.
    *
    * Scale shape: the benchmark side (eval suites) is tiny relative to
    * the corpus, so its shingle index is BROADCAST — the 100 TB corpus
    * streams through a map-side hash join with no shuffle of corpus
    * shingles. Shingles are compared as 64-bit `xxhash64` values
    * (`Dedup.shingleHashes` — fused codegen, no string materialization);
    * distinct-hash counts equal distinct-string counts up to a ~2⁻⁶⁴
    * collision, which is how the string-based DuckDB oracle still
    * hash-matches.
    *
    * Output: (doc_id, bench_id, n_overlap), corpus doc × benchmark doc.
    */
  def contamination(corpus: DataFrame, bench: DataFrame, n: Int,
      minOverlap: Int): DataFrame = {
    val corpusSh = Dedup.shingleHashes(corpus, n)
    val benchSh = Dedup.shingleHashes(bench, n)
      .withColumnRenamed("doc_id", "bench_id")
    corpusSh.join(broadcast(benchSh), "shingle")
      .groupBy(col("doc_id"), col("bench_id"))
      .agg(count(lit(1)).as("n_overlap"))
      .filter(col("n_overlap") >= minOverlap)
  }

  /** Connected components over an undirected pair list (doc_a, doc_b):
    * labels every endpoint with the minimum doc_id reachable from it —
    * near-dup pairs become dedup CLUSTERS, so a pipeline can keep one
    * representative per component instead of per pair (pairwise removal
    * breaks on transitive chains A~B~C where A,C are not a pair).
    *
    * Algorithm: hash-min label propagation — each round every node takes
    * the min label among itself and its neighbors (one shuffle per round:
    * edges ⋈ labels on dst, groupBy src). Rounds = graph diameter, and
    * near-dup graphs are shallow (clusters are quasi-cliques — duplicates
    * of a common source all resemble each other), so 3-5 rounds close
    * real corpora. For adversarially deep graphs the two-phase
    * large-star/small-star variant (Kiveris et al., "Connected Components
    * in MapReduce and Beyond") drops rounds to O(log n) at the cost of
    * edge rewriting; hash-min is the right default here.
    * Each round localCheckpoints the label frame: lineage stays O(1),
    * not O(rounds), and convergence is detected by counting changed
    * labels (a cheap join of two checkpointed frames).
    *
    * Output: (doc_id, component) for every doc that appears in a pair.
    */
  def connectedComponents(pairs: DataFrame, maxIter: Int = 25): DataFrame = {
    val edges = pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .union(pairs.select(col("doc_b").as("src"), col("doc_a").as("dst")))
      .persist()
    var labels = edges.select(col("src").as("node")).distinct()
      .select(col("node"), col("node").as("comp"))
      .localCheckpoint(true)
    var changed = 1L
    var iter = 0
    while (changed > 0 && iter < maxIter) {
      val nbrMin = edges.join(labels, edges("dst") === labels("node"))
        .groupBy(col("src")).agg(min(col("comp")).as("nbr_comp"))
        .select(col("src").as("node"), col("nbr_comp"))
      val next = labels.join(nbrMin, Seq("node"), "left")
        .select(col("node"),
          least(col("comp"), coalesce(col("nbr_comp"), col("comp"))).as("comp"))
        .localCheckpoint(true)
      changed = next.join(labels.withColumnRenamed("comp", "prev"), Seq("node"))
        .filter(col("comp") =!= col("prev")).count()
      labels = next
      iter += 1
    }
    edges.unpersist()
    labels.select(col("node").as("doc_id"), col("comp").as("component"))
  }

  /** Per-doc pattern counts plus an md5 fingerprint of the text with all
    * patterns redacted (applied in sequence, left to right) — the
    * PII-scrub shape: count what was found, prove what the scrubbed text
    * is, without shipping the text itself. Patterns must stay in the
    * Java∩RE2 regex subset (char classes, quantifiers, \b, alternation) so
    * the DuckDB oracle matches; no lookarounds or backreferences.
    * Pure codegen column arithmetic — linear, shuffle-free.
    */
  def redactionStats(docs: DataFrame, patterns: Seq[(String, String)]): DataFrame = {
    val counts = patterns.map { case (nm, re) =>
      regexp_count(col("text"), lit(re)).cast("long").as(s"n_$nm")
    }
    val redacted = patterns.foldLeft(col("text")) { case (acc, (_, re)) =>
      regexp_replace(acc, re, "[REDACTED]")
    }
    docs.select(col("doc_id") +: counts :+ md5(redacted).as("redacted_fp"): _*)
  }

  /** Hash-assign every doc to one of `numShards` training shards and
    * report per-shard statistics (doc count, token mass, distinct langs).
    * The assignment column IS Spark's co-location key: writing with
    * `.repartition(numShards, col("shard"))` + `partitionBy("shard")`
    * gives shard-local files with uniform (hash) balance and no sort —
    * the layout a distributed trainer reads one shard per worker.
    */
  def shardStats(docs: DataFrame, numShards: Int): DataFrame =
    docs.select((rowHash(col("doc_id"), 1) % numShards).as("shard"),
        col("doc_id"), col("lang"), TextOps.tokenCount(col("text")).as("n_tokens"))
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("total_tokens"),
        countDistinct(col("lang")).as("n_langs"))

  /** Latest-record compaction: one surviving row per key, the one with
    * the greatest (ts, tieBreak) — the CDC "latest wins" upsert /
    * changelog-compaction primitive. Implemented as groupBy + max_by on a
    * struct ordering key: partial aggregation runs map-side (each
    * partition forwards ONE candidate row per key, not its whole
    * history), where the window-function formulation would shuffle and
    * sort every version of every key. `tieBreak` must make the ordering
    * key unique or the result is not deterministic.
    */
  def latestByKey(df: DataFrame, keys: Seq[Column], ts: Column,
      tieBreak: Column, payload: Seq[(String, Column)]): DataFrame = {
    val packed = struct(payload.map { case (nm, c) => c.as(nm) }: _*)
    df.groupBy(keys: _*)
      .agg(max_by(packed, struct(ts, tieBreak)).as("last"))
      .select(keys ++ payload.map { case (nm, _) => col(s"last.$nm").as(nm) }: _*)
  }
}
