package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.Text

/** Deterministic Bloom-filter membership (Bloom, CACM 1970) — the
  * incremental-ingest PREFILTER: a batch document whose probe misses is
  * GUARANTEED novel (Bloom filters have no false negatives), so it skips
  * candidate generation and rescoring entirely; only probe hits — a
  * deterministic, boundable superset of the true duplicates — pay the
  * exact path. This is the standard "have I possibly seen this?" gate in
  * front of [[Dedup]]'s incremental rescore.
  *
  * Determinism: both probe positions are 52-bit md5-prefix hashes
  * ([[Text.md5PrefixLong]], the exact-integer idiom shared with the KMV
  * and sampling faces) reduced mod `mBits`, and words pack 32 bits each
  * in a BIGINT — every quantity stays inside the range where Spark and
  * DuckDB shift/AND/OR arithmetic agree bit-for-bit, so an oracle can
  * replay the filter (false positives included) exactly.
  *
  * Scale shape: the BUILD is one map-side-partial aggregation whose
  * output is `mBits / 32` rows no matter the corpus size; the PROBE is
  * two broadcast joins against that bounded table plus a row-local bit
  * test. The broadcast regime holds to ~2³¹ bits (hundreds of MB) —
  * enough for ~10⁸-key corpora at ~1% false positives. Past that, the
  * honest shape is not a bigger broadcast but the exact digest anti-join
  * ([[Incremental]]'s path), or a key-hash-sharded filter probed with a
  * co-partitioned join; this operator deliberately targets the bounded
  * regime and `require`s a sane `mBits`.
  */
object Bloom {

  private def positions(key: org.apache.spark.sql.Column, mBits: Long, salt: String) = Seq(
    Text.md5PrefixLong(concat(lit(salt + "1:"), key), 13) % mBits,
    Text.md5PrefixLong(concat(lit(salt + "2:"), key), 13) % mBits
  )

  private def checkShapeLarge(mBits: Long): Unit = {
    require(mBits > 0 && mBits % 32 == 0,
      s"Bloom: mBits must be a positive multiple of 32, got $mBits")
    // positions are 52-bit md5 prefixes mod mBits: past ~2^42 the
    // modulus eats too much of the hash's range for the reduction to
    // stay effectively uniform (and a 4 Tbit filter is ~0.5 TB of
    // words — retrain the design, don't raise the bound)
    require(mBits <= (1L << 42),
      s"Bloom: mBits=$mBits exceeds the 52-bit-hash uniformity bound (2^42)")
  }

  private def checkShape(mBits: Int): Unit = {
    checkShapeLarge(mBits.toLong)
    require(mBits <= (1 << 30),
      s"Bloom: mBits=$mBits exceeds the broadcast-regime bound (2^30); " +
        "use bloomProbeSharded (co-partitioned join) for filters this large")
  }

  /** Build the filter's word table from `keys`: `(word_idx, word)` with
    * `mBits / 32` rows at most (absent rows are all-zero words). Null
    * keys are ignored. One corpus pass, one bounded aggregation.
    */
  def bloomWords(
      keys: DataFrame,
      keyCol: String,
      mBits: Int,
      salt: String = "bloom"
  ): DataFrame = {
    checkShape(mBits)
    bloomWordsLarge(keys, keyCol, mBits.toLong, salt)
  }

  /** Merge word-table shards ([[bloomWords]] outputs over disjoint or
    * overlapping key sets, possibly tagged with extra columns): bitwise
    * OR is associative and commutative and the bit positions are pure
    * functions of the key, so `merge(build(A), build(B)) = build(A ∪ B)`
    * EXACTLY — the Bloom filter is a mergeable sketch, maintainable
    * shard-by-shard (daily batches, streaming micro-batches) with a
    * metadata-scale merge instead of a corpus rebuild.
    */
  def mergeWords(shards: DataFrame): DataFrame =
    shards
      .groupBy(col("word_idx"))
      .agg(expr("bit_or(word)").as("word"))

  /** Probe: append `outCol` (BIGINT 1/0) to `df` — 1 iff BOTH probe bits
    * of `keyCol` are set in `words`. A missing word row (or a null key)
    * is a miss. `mBits`/`salt` must match the build. The words table is
    * broadcast — it is bounded by construction.
    */
  def bloomProbe(
      df: DataFrame,
      keyCol: String,
      words: DataFrame,
      mBits: Int,
      salt: String = "bloom",
      outCol: String = "bloom_hit"
  ): DataFrame = {
    checkShape(mBits)
    require(!df.columns.contains(outCol),
      s"bloomProbe: input already has a '$outCol' column")
    Seq("_p1", "_p2", "_w1", "_w2", "_i1", "_i2").foreach { c =>
      require(!df.columns.contains(c), s"bloomProbe: '$c' is reserved")
    }
    val Seq(p1, p2) = positions(col(keyCol), mBits, salt)
    val w1 = broadcast(words.select(col("word_idx").as("_i1"), col("word").as("_w1")))
    val w2 = broadcast(words.select(col("word_idx").as("_i2"), col("word").as("_w2")))
    // variable-amount shift has no typed functions API — SQL form only
    val out = df
      .withColumn("_p1", p1)
      .withColumn("_p2", p2)
      .join(w1, (col("_p1") / 32).cast("long") === col("_i1"), "left")
      .join(w2, (col("_p2") / 32).cast("long") === col("_i2"), "left")
      .withColumn(
        outCol,
        when(
          col("_w1").isNotNull && col("_w2").isNotNull &&
            expr("_w1 & shiftleft(CAST(1 AS BIGINT), CAST(_p1 % 32 AS INT))") =!= 0L &&
            expr("_w2 & shiftleft(CAST(1 AS BIGINT), CAST(_p2 % 32 AS INT))") =!= 0L,
          lit(1L)).otherwise(lit(0L)))
      .drop("_p1", "_p2", "_w1", "_w2", "_i1", "_i2")
    out
  }

  // ---------------------------------------------------------------------
  // PAST the broadcast regime: a 100 TB corpus (~10⁹⁺ keys at ~1% fp)
  // needs mBits ≈ 10 · keys — tens of gigabits, a word table far too
  // large to broadcast. The filter itself does not change (same bit
  // positions, same 32-bit word packing — a small-mBits build and a
  // sharded build are the SAME function of the key set), only the
  // probe's join strategy does: the word table lives key-hash-sharded
  // across the cluster and probes reach it with a co-partitioned
  // shuffle equi-join on word_idx instead of a broadcast.
  // ---------------------------------------------------------------------

  /** [[bloomWords]] without the broadcast-regime cap: the build was
    * always shard-friendly (one partial-aggregable `bit_or`, output
    * bounded by mBits/32 rows and in practice by the number of distinct
    * probe positions — absent words are all-zero), so the only change is
    * admitting a word table meant to be JOINED, not broadcast. Up to the
    * 52-bit-hash uniformity bound (2^42 bits).
    */
  def bloomWordsLarge(
      keys: DataFrame,
      keyCol: String,
      mBits: Long,
      salt: String = "bloom"
  ): DataFrame = {
    checkShapeLarge(mBits)
    val k = col(keyCol)
    keys
      .where(k.isNotNull)
      .select(explode(array(positions(k, mBits, salt): _*)).as("_pos"))
      .groupBy((col("_pos") / 32).cast("long").as("word_idx"))
      .agg(expr("bit_or(shiftleft(CAST(1 AS BIGINT), CAST(_pos % 32 AS INT)))").as("word"))
  }

  /** Probe a word table too large to broadcast: same contract as
    * [[bloomProbe]] (`outCol` = 1 iff BOTH probe bits set; missing word
    * or null key = miss), different physics. Each DISTINCT key emits its
    * two (word_idx, bit) probes, the probe rows equi-join the word table
    * on `word_idx` — a shuffle join both sides co-partition on, so a
    * filter of any size costs 2 shuffled rows per distinct key and no
    * driver- or broadcast-side materialization — and the per-key AND
    * folds back with one aggregation before rejoining `df` by key.
    * Duplicate keys in `df` probe once.
    */
  def bloomProbeSharded(
      df: DataFrame,
      keyCol: String,
      words: DataFrame,
      mBits: Long,
      salt: String = "bloom",
      outCol: String = "bloom_hit"
  ): DataFrame = {
    checkShapeLarge(mBits)
    require(!df.columns.contains(outCol),
      s"bloomProbeSharded: input already has a '$outCol' column")
    Seq("_k", "_kh").foreach { c =>
      require(!df.columns.contains(c), s"bloomProbeSharded: '$c' is reserved")
    }
    val keys = df
      .select(col(keyCol).as("_k"))
      .where(col("_k").isNotNull)
      .distinct()
    val probes = keys
      .select(col("_k"), explode(array(positions(col("_k"), mBits, salt): _*)).as("_p"))
      .withColumn("_wi", (col("_p") / 32).cast("long"))
    val perKey = probes
      .join(words.select(col("word_idx").as("_wi"), col("word").as("_w")), Seq("_wi"), "left")
      .select(col("_k"),
        when(
          col("_w").isNotNull &&
            expr("_w & shiftleft(CAST(1 AS BIGINT), CAST(_p % 32 AS INT))") =!= 0L,
          lit(1L)).otherwise(lit(0L)).as("_hit"))
      .groupBy("_k")
      .agg(min(col("_hit")).as("_kh"))
    df.join(perKey, df(keyCol) === col("_k"), "left")
      .withColumn(outCol, coalesce(col("_kh"), lit(0L)))
      .drop("_k", "_kh")
  }
}
