package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Generation-pointer table layout — SNAPSHOT ISOLATION for the rewrite
  * operations ([[Forget]], [[Compact]]) under concurrent readers.
  *
  * The directory-swap mode (FileSwap) assumes an exclusive writer: it
  * renames the live directory away, so a reader that listed files before
  * the swap dereferences dead paths mid-scan. This layout removes that
  * assumption the way every production table format does (Iceberg/Delta/
  * Hudi): data files are IMMUTABLE once written, and the table is a tiny
  * mutable POINTER to the current generation:
  *
  *   table/
  *     _current      <- one line: the live generation number (atomic flip)
  *     gen-0/...     <- plain parquet, never modified after commit
  *     gen-1/...
  *
  * A rewrite writes gen-(N+1) beside the live gen-N and then atomically
  * replaces `_current` (ATOMIC_MOVE of a temp file — readers see either N
  * or N+1, never a torn pointer). A reader resolves the pointer ONCE at
  * DataFrame definition and scans that generation's files, which no writer
  * will ever touch — so a reader mid-scan across a concurrent swap simply
  * finishes its own consistent snapshot (pinned in SourcesSpec). Old
  * generations are reclaimed only by an explicit [[vacuum]], the reader-
  * lifetime boundary the operator controls (retain > max query runtime).
  *
  * At 100 TB on an object store this is the same protocol verbatim:
  * immutable data objects + a manifest/pointer object flipped by
  * conditional PUT, with vacuum as a TTL'd garbage sweep — see SCALING.md.
  */
object Snapshot {

  private def pointerFile(path: String) = new java.io.File(path, "_current")

  /** The live generation number, or None for an uninitialized table. */
  def currentGen(path: String): Option[Long] = {
    val f = pointerFile(path)
    if (!f.exists()) None
    else Some(new String(java.nio.file.Files.readAllBytes(f.toPath),
      "UTF-8").trim.toLong)
  }

  private def genDir(path: String, gen: Long) =
    new java.io.File(path, s"gen-$gen")

  /** Atomically flip `_current` to `gen` (write-temp-then-ATOMIC_MOVE). */
  private def commit(path: String, gen: Long): Unit = {
    val tmp = new java.io.File(path, s"_current.tmp")
    java.nio.file.Files.write(tmp.toPath, s"$gen\n".getBytes("UTF-8"))
    java.nio.file.Files.move(tmp.toPath, pointerFile(path).toPath,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
  }

  /** Create the table at `path` with `df` as generation 0. */
  def init(spark: SparkSession, path: String, df: DataFrame): Unit = {
    require(currentGen(path).isEmpty, s"snapshot table already exists: $path")
    new java.io.File(path).mkdirs()
    df.write.mode(SaveMode.ErrorIfExists).parquet(genDir(path, 0L).getPath)
    commit(path, 0L)
  }

  /** Read the LIVE generation. The pointer is resolved here, once — the
    * returned DataFrame scans immutable files and is unaffected by any
    * later [[update]] (until those files are [[vacuum]]ed).
    */
  def read(spark: SparkSession, path: String): DataFrame = {
    val gen = currentGen(path).getOrElse(
      throw new IllegalArgumentException(s"not a snapshot table: $path"))
    spark.read.parquet(genDir(path, gen).getPath)
  }

  /** TIME TRAVEL: read a specific (possibly superseded) generation — the
    * audit/debug read every table format exposes (`VERSION AS OF`). Valid
    * until [[vacuum]] reclaims it; a vacuumed generation fails loudly here
    * rather than returning a partial scan.
    */
  def readAt(spark: SparkSession, path: String, gen: Long): DataFrame = {
    val dir = genDir(path, gen)
    require(dir.isDirectory,
      s"generation $gen of $path does not exist (vacuumed, or never written)")
    spark.read.parquet(dir.getPath)
  }

  /** Rewrite: materialize `f(live)` as the next generation and flip the
    * pointer. Readers of the previous generation are untouched. A failed
    * write leaves the pointer on the old generation and cleans the
    * half-written directory — the table is never in between.
    * Returns the new generation number.
    */
  def update(spark: SparkSession, path: String)
      (f: DataFrame => DataFrame): Long = {
    val gen = currentGen(path).getOrElse(
      throw new IllegalArgumentException(s"not a snapshot table: $path"))
    val next = gen + 1
    val dir = genDir(path, next)
    try {
      f(read(spark, path)).write.mode(SaveMode.ErrorIfExists)
        .parquet(dir.getPath)
      commit(path, next)
      next
    } catch {
      case e: Throwable =>
        def rm(x: java.io.File): Unit = {
          Option(x.listFiles()).foreach(_.foreach(rm)); x.delete()
        }
        if (dir.exists()) rm(dir)
        throw e
    }
  }

  /** Delete all generations except the newest `keepLast` (the live one is
    * always kept). This is the ONLY operation that invalidates readers —
    * schedule it with a retention comfortably above the longest query.
    * Returns the generations removed.
    */
  def vacuum(spark: SparkSession, path: String, keepLast: Int = 1): Seq[Long] = {
    require(keepLast >= 1, "vacuum must keep at least the live generation")
    val live = currentGen(path).getOrElse(
      throw new IllegalArgumentException(s"not a snapshot table: $path"))
    val gens = Option(new java.io.File(path).listFiles()).getOrElse(Array())
      .filter(f => f.isDirectory && f.getName.startsWith("gen-"))
      .map(_.getName.stripPrefix("gen-").toLong)
      .sorted
    val doomed = gens.filter(_ != live).dropRight(keepLast - 1)
    doomed.foreach { g =>
      def rm(x: java.io.File): Unit = {
        Option(x.listFiles()).foreach(_.foreach(rm)); x.delete()
      }
      rm(genDir(path, g))
    }
    doomed.toSeq
  }
}
