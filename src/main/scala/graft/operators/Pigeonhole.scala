package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The 3-block pigeonhole key for exact hamming-distance joins over 62-bit
  * fingerprints (image phash, audio fingerprint, any 62-bit LSH signature):
  * split the fingerprint into 21/21/20-bit blocks — ≤2 bit flips leave at
  * least one block untouched (pigeonhole), so an equi-join per block finds
  * every pair within hamming 2 without an all-pairs comparison
  * (Manku/Jain/Sarma, WWW'07 — the SimHash dedup construction).
  *
  * Index side and probe side MUST derive keys from this one definition —
  * the batch near-dup queries (x5_phash_neardup / x5_afp_neardup) and the
  * streaming screens (phashScreen / phashIndex) all call it, so the block
  * layout can never silently drift between index build and probe.
  */
object Pigeonhole {

  /** Number of blocks; join on (block, [[blockKey]]). */
  val NumBlocks = 3

  /** `explode(sequence(0, 2))` source for the block column. */
  def blockIds: Column = explode(sequence(lit(0), lit(NumBlocks - 1)))

  /** Key of block `blk` (0, 1, 2) of fingerprint `fp`: bits [0,21), [21,42),
    * [42,62). Pure bit arithmetic — stays inside whole-stage codegen.
    */
  def blockKey(fp: Column, blk: Column): Column =
    when(blk === 2, shiftright(fp, 42).bitwiseAND(lit(1048575L)))
      .when(blk === 1, shiftright(fp, 21).bitwiseAND(lit(2097151L)))
      .otherwise(fp.bitwiseAND(lit(2097151L)))

  /** First block on which `x = fpA ^ fpB` has no differing bits. A pair
    * within hamming ≤2 is found by 1-3 block joins; keeping only the row
    * where `blk === firstAgree(x)` emits each pair exactly once with no
    * candidate-dedup shuffle.
    */
  def firstAgree(x: Column): Column =
    when(x.bitwiseAND(lit(2097151L)) === 0, lit(0))
      .when(shiftright(x, 21).bitwiseAND(lit(2097151L)) === 0, lit(1))
      .otherwise(lit(2))
}
