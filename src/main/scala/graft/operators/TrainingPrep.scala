package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-batch preparation operators: the last mile between a curated
  * corpus and a training run. (North-star extensions beyond the reference's
  * vector surface, like `Curation`/`TextOps` — the reference engine,
  * kemingy/rabitq, has no data-preparation tier.)
  *
  * Scale stance shared by all four operators:
  *   - packing is SHARD-LOCAL: the only global operation a naive packer
  *     needs (one totally-ordered cumulative sum) is replaced by a
  *     per-shard window, so the sort parallelizes across shards and no
  *     single task ever sees more than corpus/nShards rows;
  *   - chunking and quantization are per-row codegen expressions
  *     (explode + substring, higher-order array folds) — embarrassingly
  *     parallel, no shuffle at all;
  *   - domain mixing reuses the deterministic affine row hash
  *     (`Curation.rowHash`), so the mix is reproducible across retries and
  *     engines, and the per-domain rate table is a tiny broadcast join —
  *     the 100 TB corpus streams through a map-side filter.
  */
object TrainingPrep {

  /** Concat-and-chunk sequence packing (the standard LLM pretraining
    * batcher): documents are deterministically sharded, concatenated in
    * doc_id order within each shard, and the token stream is cut into
    * fixed-`budget` packs; a document belongs to the pack containing its
    * first token. Output: one row per (shard, pack) with the number of
    * documents starting in the pack and their total token count.
    *
    * The window is PARTITIONED by shard — Spark sorts each shard's rows
    * independently (no global sort, no single-partition window), which is
    * what lets the plan scale linearly with shard count. Pack ids are
    * local to a shard by construction.
    */
  def sequencePack(docs: DataFrame, budget: Long, nShards: Int,
      hashFamily: Int): DataFrame = {
    val shard = Curation.rowHash(col("doc_id"), hashFamily) % nShards
    val w = Window.partitionBy(col("shard")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs
      .select(col("doc_id"), shard.as("shard"),
        TextOps.tokenCount(col("text")).as("n_tokens"))
      .withColumn("cum", sum(col("n_tokens")).over(w))
      // first token of this doc sits at offset (cum - n_tokens) in the
      // shard's concatenated stream; its pack = offset / budget
      .withColumn("pack_id", floor((col("cum") - col("n_tokens")) / lit(budget)))
      .groupBy(col("shard"), col("pack_id"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("pack_tokens"))
  }

  /** Overlapping fixed-width chunking (RAG / long-context windowing):
    * every document is cut into character windows of `width` starting at
    * multiples of `stride` (stride < width ⇒ overlap of width − stride).
    * Empty documents produce no chunks. Output: one row per chunk with its
    * index, length, and md5 — enough for a downstream embed-the-chunks
    * stage to join back, and for an engine-independent oracle to replay.
    *
    * Pure narrow plan: filter → explode(sequence) → substring. No shuffle;
    * chunk count per doc is ⌈(len − width)/stride⌉ + 1 = ⌊(len−1)/stride⌋ + 1,
    * so output size is bounded by corpus_chars/stride — linear.
    */
  def chunkOverlap(docs: DataFrame, width: Int, stride: Int): DataFrame = {
    require(stride >= 1 && width >= stride, "need width >= stride >= 1")
    val nChunks = floor((length(col("text")) - 1) / lit(stride)).cast("int")
    docs
      .filter(length(col("text")) > 0)
      .select(col("doc_id"), col("text"),
        explode(sequence(lit(0), nChunks)).as("chunk_idx"))
      .select(col("doc_id"), col("chunk_idx").cast("long").as("chunk_idx"),
        col("text").substr(col("chunk_idx") * stride + 1, lit(width)).as("chunk"))
      .select(col("doc_id"), col("chunk_idx"),
        length(col("chunk")).cast("long").as("chunk_len"),
        md5(col("chunk")).as("chunk_md5"))
  }

  /** Per-vector symmetric int8 quantization (embedding compression for
    * ANN serving / training caches): scale = max|vᵢ|/127, codeᵢ =
    * round(vᵢ/scale) ∈ [−127, 127]; the all-zero vector maps to all-zero
    * codes. Output is integer-only (position-weighted checksum, zero
    * count, code range) so the oracle comparison is exact — float64
    * arithmetic (f32 widening, one division, round-half-away-from-zero)
    * is IEEE-identical across engines as long as the expression tree
    * matches, which the oracle replays verbatim.
    *
    * Whole computation is higher-order array folds on the codegen path —
    * per-row, no shuffle, no UDF.
    */
  def int8Quant(emb: DataFrame): DataFrame = {
    val vd = transform(col("embedding"), x => x.cast("double"))
    val amax = aggregate(vd, lit(0d), (a, x) => greatest(a, abs(x)))
    val withCodes = emb
      .select(col("vec_id"), col("embedding"), amax.as("amax"))
      .withColumn("codes", transform(col("embedding"), x =>
        when(col("amax") === 0d, lit(0L))
          .otherwise(round(x.cast("double") / (col("amax") / lit(127.0))).cast("long"))))
    withCodes.select(
      col("vec_id"),
      size(col("embedding")).cast("long").as("n_dims"),
      aggregate(
        zip_with(col("codes"), sequence(lit(1L), size(col("codes")).cast("long")),
          (c, i) => c * i),
        lit(0L), (a, x) => a + x).as("checksum"),
      aggregate(col("codes"), lit(0L),
        (a, c) => a + when(c === 0L, 1L).otherwise(0L)).as("n_zero"),
      aggregate(col("codes"), lit(-128L), (a, c) => greatest(a, c)).as("max_code"),
      aggregate(col("codes"), lit(128L), (a, c) => least(a, c)).as("min_code"))
  }

  /** Weighted domain mixing: given target mixture weights per domain and a
    * total budget, derive per-domain keep rates rate_d = min(1, budget·w_d
    * / n_d) and select deterministically via the affine row hash —
    * rerunnable, engine-portable, and nested across budgets (same hash,
    * monotone thresholds). Domains absent from `weights` are excluded:
    * the mixture DEFINES the training distribution.
    *
    * Plan shape for 100 TB: the per-domain count is a map-side-combinable
    * aggregate producing |domains| rows; the rate table broadcast-joins
    * back onto the corpus (no corpus shuffle) and selection is a codegen
    * filter. One lazy plan, no driver round-trip.
    */
  def domainMix(docs: DataFrame, weights: Map[String, Double], budget: Long,
      hashFamily: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val wdf = weights.toSeq.toDF("lang", "w")
    val counts = docs.groupBy(col("lang")).agg(count(lit(1)).as("n"))
    val thresholds = counts.join(wdf, "lang")
      .withColumn("t",
        floor(least(lit(1.0), lit(budget.toDouble) * col("w") / col("n")) * lit(Dedup.P)))
    val sel = (Curation.rowHash(col("doc_id"), hashFamily) < col("t")).cast("long")
    docs.join(broadcast(thresholds), "lang")
      .select(col("lang"), col("doc_id"), sel.as("s"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_available"), sum(col("s")).as("n_selected"),
        sum(col("s") * col("doc_id")).as("sel_sum"))
  }

  /** Length-bucketed batching stats (the padding-efficiency report every
    * fixed-shape trainer needs): documents are bucketed by token count
    * into width-`width` buckets (bucket b holds lengths in
    * (b·width, (b+1)·width]), and each bucket reports its document count,
    * token sum/max, the padded token count if every doc were padded to
    * the bucket's top boundary, and the resulting waste. Integer-only
    * arithmetic — no float anywhere.
    *
    * Plan shape: one map-side-combinable aggregate keyed by the ~dozens
    * of buckets; output is O(max_len/width) rows regardless of corpus
    * size. Empty documents (0 tokens) are excluded — they contribute no
    * training sequence.
    */
  def lengthBuckets(docs: DataFrame, width: Int): DataFrame = {
    require(width >= 1, "bucket width must be positive")
    docs
      .select(TextOps.tokenCount(col("text")).as("n_tokens"))
      .filter(col("n_tokens") > 0)
      .withColumn("bucket", floor((col("n_tokens") - 1) / lit(width)))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("sum_tokens"),
        max(col("n_tokens")).as("max_tokens"))
      .withColumn("padded_tokens", col("n_docs") * (col("bucket") + 1) * width)
      .withColumn("waste_tokens", col("padded_tokens") - col("sum_tokens"))
  }

  /** Johnson–Lindenstrauss random projection to `outDims` dimensions with
    * deterministic Rademacher (±1) planes — embedding compression for
    * downstream clustering/dedup where approximate geometry suffices.
    * Plane j's component for dimension d is the parity of the j-th shared
    * affine family at d (exactly `Dedup.hyperplaneLshPortable`'s planes —
    * this operator keeps the projected VALUES where LSH keeps only the
    * signs), scaled by 1/√outDims. The dot is a LEFT-FOLD over the
    * embedding widened to f64, so an engine that replays the same fold
    * order reproduces the sums bit-for-bit; the output is rounded to 4
    * decimals per coordinate, then normalized with `+ 0.0` — a tiny
    * negative sum rounds to −0.0 under C-style rounding (DuckDB) but to
    * +0.0 under decimal rounding (JVM BigDecimal), and IEEE
    * `−0.0 + 0.0 = +0.0` erases exactly that divergence on both engines.
    *
    * Zero-shuffle per-row computation (array folds + posexplode); output
    * is long-form (vec_id, j, proj) for oracle-friendly comparison.
    */
  /** Token-budget curriculum scheduler: assign every document its global
    * training step — the index of the fixed-size token batch it falls
    * into when the corpus is consumed in doc_id order. The core is a
    * GLOBAL prefix sum, which a naive `Window.orderBy` with no partition
    * key would serialize through ONE task; here it is the classic
    * two-phase distributed scan over DETERMINISTIC contiguous shards:
    *
    *   1. shard = floor((doc_id − min_id) · S / (max_id − min_id + 1)) —
    *      a pure function of doc_id and two broadcast scalars, so shard
    *      s holds ids strictly below shard s+1's. (NOT
    *      `repartitionByRange` + `spark_partition_id`: range boundaries
    *      come from SAMPLING, and the offsets branch of this plan
    *      re-evaluates its subtree — two range exchanges are not
    *      guaranteed the same boundaries, and a cross-branch mismatch
    *      silently corrupts every offset. A deterministic shard function
    *      makes branch recomputation harmless by construction.)
    *   2. partition-LOCAL running sums via a window keyed on shard
    *      (each task sorts only its own contiguous range);
    *   3. per-shard totals (S rows) get their own tiny cumulative
    *      offset — a window over S rows — and broadcast-join back.
    *
    * Shard balance tracks doc_id density (dense ids → uniform shards);
    * pathological id sparsity skews shard SIZES but never the answer.
    * Output is integer-only: (doc_id, n_tokens, cum_tokens, step) with
    * step = floor((cum_tokens − n_tokens) / stepBudget) — a document's
    * step is decided by its FIRST token, matching `sequencePack`'s
    * containing-pack rule.
    */
  def tokenCurriculum(docs: DataFrame, stepBudget: Long,
      nShards: Int = 32): DataFrame = {
    require(stepBudget >= 1, s"step budget must be >= 1, got $stepBudget")
    require(nShards >= 1, s"shard count must be >= 1, got $nShards")
    val toks = TextOps.tokenCount(col("text"))
    val bounds = docs.agg(min(col("doc_id")).as("min_id"),
      max(col("doc_id")).as("max_id"))
    val sharded = docs.select(col("doc_id"), toks.as("n_tokens"))
      .join(broadcast(bounds))
      .withColumn("shard",
        // least() guards the f64 rounding edge at huge id ranges, where
        // (max−min)·S/(max−min+1) can round up to exactly S
        least(lit(nShards - 1),
          floor((col("doc_id") - col("min_id")).cast("double") * nShards /
            (col("max_id") - col("min_id") + 1L).cast("double"))).cast("int"))
      .select(col("doc_id"), col("n_tokens"), col("shard"))
    // explicit ROWS frame: the default RANGE frame would share one
    // cumulative value across duplicate doc_ids where the oracle's ROWS
    // frame assigns distinct ones — ROWS keeps the two aligned without
    // assuming doc_id uniqueness
    val local = sharded.withColumn("local_cum",
      sum(col("n_tokens")).over(
        Window.partitionBy(col("shard")).orderBy(col("doc_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val offsets = sharded.groupBy(col("shard"))
      .agg(sum(col("n_tokens")).as("ptot"))
      .withColumn("offset",
        coalesce(sum(col("ptot")).over(
          Window.orderBy(col("shard"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("shard"), col("offset"))
    local.join(broadcast(offsets), "shard")
      .select(col("doc_id"), col("n_tokens"),
        (col("local_cum") + col("offset")).as("cum_tokens"))
      .withColumn("step",
        expr(s"(cum_tokens - n_tokens) div $stepBudget"))
  }

  /** Temperature-scaled domain mixture (the multilingual-sampling rule of
    * mBERT / XLM-R: p_d ∝ n_d^τ, τ < 1 upweights low-resource domains):
    * from per-domain token counts, the sampling weight of each domain and
    * the duplication factor its data sustains under a given epoch token
    * budget (dup_factor > 1 ⇒ that domain's corpus repeats within one
    * epoch — the practical overfitting signal this report exists for).
    *
    * Cross-engine float discipline: per-domain pow(n, τ) is a single
    * libm call on an exact integer (bit-stable across engines), but the
    * normalizing SUM over domains is fold-order-dependent — so it is
    * computed as a LEFT-FOLD over the domain-sorted list (the q78
    * pattern), which the oracle replays exactly; outputs round to 4
    * decimals. Everything is one tiny aggregate over a map-side-combined
    * per-domain count — the corpus is scanned once, nothing else moves.
    */
  def temperatureMix(docs: DataFrame, tau: Double,
      epochTokens: Long): DataFrame = {
    val counts = docs.groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(TextOps.tokenCount(col("text"))).as("n_tokens"))
      .withColumn("p", pow(col("n_tokens").cast("double"), lit(tau)))
    val tot = counts.agg(
      aggregate(sort_array(collect_list(struct(col("lang"), col("p")))),
        lit(0.0), (acc, s) => acc + s.getField("p")).as("tp"))
    counts.crossJoin(broadcast(tot))
      .select(col("lang"), col("n_docs"), col("n_tokens"),
        round(col("p") / col("tp"), 4).as("mix_weight"),
        // n_tokens = 0 (a domain of all-blank docs) has p = pow(0, τ) = 0,
        // and 0.0/0.0 is NaN in Spark while DuckDB's ÷0 semantics are
        // config-dependent — emit 0.0 explicitly (the oracle mirrors this)
        round(when(col("n_tokens") === 0L, lit(0.0))
          .otherwise(col("p") / col("tp") * lit(epochTokens.toDouble) /
            col("n_tokens").cast("double")), 4).as("dup_factor"))
  }

  def jlProject(emb: DataFrame, outDims: Int): DataFrame = {
    require(outDims >= 1 && outDims <= Dedup.affine.length)
    val scale = 1.0 / math.sqrt(outDims.toDouble)
    val projections = (0 until outDims).map { j =>
      val (a, b) = Dedup.affine(j)
      round(aggregate(sequence(lit(1), size(col("embedding"))), lit(0.0),
        (acc, d) => acc +
          when(((lit(a) * d + lit(b)) % lit(Dedup.P)) % 2L === 1L, lit(1.0))
            .otherwise(lit(-1.0)) *
            element_at(col("embedding"), d).cast("double")) * lit(scale), 4) + lit(0.0)
    }
    emb.select(col("vec_id"),
        posexplode(array(projections: _*)).as(Seq("j", "proj")))
      .select(col("vec_id"), col("j").cast("long").as("j"), col("proj"))
  }
}
