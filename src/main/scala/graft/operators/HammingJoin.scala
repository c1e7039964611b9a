package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact hamming ≤ k pair enumeration over `(doc_id, fp)` 62-bit
  * fingerprints, statistics-gated between two EXACT plans with identical
  * output:
  *
  *  - BLOCK path (Manku/Jain/Sarma WWW'07 pigeonhole — the default):
  *    equi-join on (block, block bits) with k+1 blocks, popcount verify,
  *    first-agreeing-block exactly-once emission. The blocks are
  *    INTERLEAVED (bit i belongs to block i mod k+1), not contiguous
  *    ranges: completeness only needs the blocks to PARTITION the bit
  *    positions (≤k flips still leave ≥1 block untouched), and
  *    interleaving spreads every hash's informative bits across all
  *    blocks — contiguous blocks put 10^5 docs into one bucket whenever a
  *    bit REGION is degenerate (the zero pad above a short payload's
  *    gradient bits; the biased top bits of a mod-prime word hash), and
  *    the round-12 100× probe measured exactly that: a 220k-doc phash
  *    bucket (2.4e10 block candidates vs 3.1e6 real pairs, one task
  *    burning 12+ minutes) that interleaving cuts to 2k, and 48k-doc
  *    simhash buckets cut to 10k.
  *  - FLIP path (the fallback when even interleaved buckets run hot —
  *    corpora whose fingerprints genuinely share most bits): collapse to
  *    DISTINCT fingerprints, enumerate ≤⌊k/2⌋- and ≤⌈k/2⌉-bit flip
  *    VARIANTS of the two sides and equi-join on the variant value —
  *    `A^m1 = B^m2` with `|m1|+|m2| ≤ k` covers exactly the pairs at
  *    hamming ≤ k (split the differing bits between the masks), so
  *    candidates stay within a small constant of the true pair count and
  *    cost is O(F·V) in distinct fingerprints with NO bucket quadratics
  *    (V = 63 per side at k ≤ 2; 63 × 1954 split at k = 3).
  *    Identical-fingerprint groups expand to their hamming-0 pairs
  *    directly (real output, inherent to the pair-list contract).
  *
  * The gate is one statistics pass over the block buckets — max bucket vs
  * `graft.hamming.bucketThreshold` (default 16384: the largest single
  * task a hot bucket may cost, ~1.3e8 comparisons) AND the candidate-pair
  * upper bound Σ c(c−1)/2 vs `graft.hamming.pairBudget` (default 2e9) —
  * the same AQE-style plan-choice-by-counting as IvfIndex's
  * block/cellpair gate. Both paths are exact, so the oracle contract
  * (brute-force hamming over replayed hashes) is plan-independent.
  */
object HammingJoin {

  /** Interleaved block key: the bits of `fp` at positions ≡ b (mod nb),
    * packed. Pure shift/mask arithmetic — stays inside whole-stage
    * codegen; and since the gather is linear over XOR, the key of
    * `a ^ b` is the XOR of the keys (what [[pairs]]'s first-agreeing-block
    * emission relies on).
    *
    * This is the ONE block-key definition for every hamming join in the
    * engine — the batch pair queries AND the streaming fingerprint
    * screens' index/probe sides ([[graft.streaming.Streams.simhashIndex]]
    * etc.) derive keys from it, so the layout can never silently drift
    * between an index build and its probe.
    */
  def blockKey(fp: Column, b: Int, nb: Int): Column =
    (0 until (62 - b + nb - 1) / nb).map(j =>
      shiftleft(shiftright(fp, j * nb + b).bitwiseAND(lit(1L)), j))
      .reduce(_ + _)

  /** [[blockKey]] dispatched on a runtime block-id column in [0, nb). */
  def blockKeyFor(fp: Column, blk: Column, nb: Int): Column =
    (1 until nb).foldLeft(when(blk === 0, blockKey(fp, 0, nb))) {
      (acc, b) => acc.when(blk === b, blockKey(fp, b, nb))
    }

  /** `explode` source for the nb block ids. */
  def blockIds(nb: Int): Column = explode(sequence(lit(0), lit(nb - 1)))

  /** First block on which `x = fpA ^ fpB` has no differing bits. A pair
    * within hamming ≤ nb−1 agrees on ≥1 block (pigeonhole); keeping only
    * the join row where `blk === firstAgree(x)` emits each pair exactly
    * once with no candidate-dedup shuffle.
    */
  def firstAgree(x: Column, nb: Int): Column =
    (0 until nb - 1).foldRight(lit(nb - 1): Column) { (b, rest) =>
      when(blockKey(x, b, nb) === 0, lit(b)).otherwise(rest)
    }

  /** Pairs (doc_a < doc_b, hamming) with hamming ≤ `maxHamming` (1..3),
    * unordered — callers add their presentation sort. `fp` must carry
    * `doc_id` and a 62-bit `fp` column.
    */
  def pairs(fp: DataFrame, maxHamming: Int): DataFrame = {
    require(maxHamming >= 1 && maxHamming <= 3,
      s"maxHamming $maxHamming not in 1..3")
    val s = fp.sparkSession
    val nb = maxHamming + 1
    val f = graft.Caches.persist(fp.select(col("doc_id"), col("fp")))
    val blocks = f.select(col("doc_id"), col("fp"),
        explode(array((0 until nb).map(i => lit(i)): _*)).as("blk"))
      .withColumn("key", blockKeyFor(col("fp"), col("blk"), nb))
    val bucketMax = s.conf.getOption("graft.hamming.bucketThreshold")
      .map(_.toLong).getOrElse(16384L)
    val pairBudget = s.conf.getOption("graft.hamming.pairBudget")
      .map(_.toLong).getOrElse(2000000000L)
    // ONE statistics action decides the plan (f is pinned, so the block
    // path's join and this count share the fingerprint pass). Small
    // inputs skip the bucket histogram entirely: n ≤ bucketMax bounds
    // every bucket AND the pair upper bound (≤ (k+1)·n²/2 < any sane
    // budget), so only the cheap count runs — the sf0.1 constant stays
    // at the old block join's.
    val n = graft.Caches.countOnce(f)
    val takeBlock = n <= bucketMax || {
      val st = blocks.groupBy("blk", "key").count()
        .agg(max("count"), sum(expr("count * (count - 1) div 2"))).head()
      !st.isNullAt(0) && st.getLong(0) <= bucketMax &&
        st.getLong(1) <= pairBudget
    }
    if (takeBlock) blockPairs(blocks, nb, maxHamming)
    else flipPairs(f, maxHamming)
  }

  private def blockPairs(blocks: DataFrame, nb: Int,
      maxHamming: Int): DataFrame = {
    val a = blocks.select(col("blk"), col("key"),
      col("doc_id").as("doc_a"), col("fp").as("ha"))
    val b = blocks.select(col("blk"), col("key"),
      col("doc_id").as("doc_b"), col("fp").as("hb"))
    a.join(b, Seq("blk", "key"))
      .filter(col("doc_a") < col("doc_b"))
      .withColumn("x", expr("ha ^ hb"))
      .filter(col("blk") === firstAgree(col("x"), nb))
      .select(col("doc_a"), col("doc_b"),
        expr("bit_count(x)").cast("long").as("hamming"))
      .filter(col("hamming") <= maxHamming)
  }

  private def flipPairs(f: DataFrame, maxHamming: Int): DataFrame = {
    val s = f.sparkSession
    import s.implicits._
    val g = graft.Caches.persist(f.groupBy("fp")
      .agg(collect_list("doc_id").as("ds"), count(lit(1)).as("m")))
    // identical fingerprints: hamming-0 pairs, emitted directly
    val intra = g.filter(col("m") > 1)
      .select(explode(col("ds")).as("x"), col("ds"))
      .select(col("x"), explode(col("ds")).as("y"))
      .filter(col("x") < col("y"))
      .select(col("x").as("doc_a"), col("y").as("doc_b"),
        lit(0L).as("hamming"))
    // cross-fingerprint: ≤⌊k/2⌋ | ≤⌈k/2⌉ flip variants, equi-join on the
    // variant value; a pair surfaces a small constant number of times
    // (≤ 2 per split of its differing bits), deduped on ids-only rows
    def masks(maxFlips: Int): DataFrame = {
      require(maxFlips <= 2, "flip enumeration bounded at 2 per side")
      val buf = scala.collection.mutable.ArrayBuffer(0L)
      if (maxFlips >= 1) (0 until 62).foreach(i => buf += (1L << i))
      if (maxFlips >= 2)
        for (i <- 0 until 62; j <- i + 1 until 62) buf += ((1L << i) | (1L << j))
      buf.toSeq.toDF("mask")
    }
    val k1 = maxHamming / 2
    val k2 = maxHamming - k1
    val va = g.select(col("fp").as("fa")).crossJoin(broadcast(masks(k1)))
      .select(col("fa"), expr("fa ^ mask").as("v"))
    val vb = g.select(col("fp").as("fb")).crossJoin(broadcast(masks(k2)))
      .select(col("fb"), expr("fb ^ mask").as("v"))
    val cand = va.join(vb, "v")
      .filter(col("fa") < col("fb"))
      .select("fa", "fb").distinct()
      .withColumn("hamming", expr("bit_count(fa ^ fb)").cast("long"))
      .filter(col("hamming") <= maxHamming)
    val cross = cand
      .join(g.select(col("fp").as("fa"), col("ds").as("da")), "fa")
      .join(g.select(col("fp").as("fb"), col("ds").as("db")), "fb")
      .select(col("hamming"), explode(col("da")).as("x"), col("db"))
      .select(col("hamming"), col("x"), explode(col("db")).as("y"))
      .select(least(col("x"), col("y")).as("doc_a"),
        greatest(col("x"), col("y")).as("doc_b"), col("hamming"))
    intra.unionAll(cross)
  }
}
