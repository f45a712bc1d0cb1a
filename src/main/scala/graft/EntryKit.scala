package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import org.apache.spark.sql.types.StructType

import graft.ann.Ann
import graft.dedup.{Clusters, Dedup, SimHash}
import graft.ingest.{FileListing, Router, ZipSource}
import graft.multimodal.Multimodal
import graft.operators.Salted
import graft.pipeline.SchemaEvolution
import graft.schema.{ColumnSpec, TableSpec}
import graft.streaming.Bookmark
import graft.text.{Dsir, TextAnalysis}
import graft.relationalize.Relationalize
import graft.sources.{JsonDataset, ParquetDataset, TarShards, Warc}
import graft.validate.{ErrorSuppression, FileMetadata, JsonSchemaValidator, SchemaCache, SchemaResolver}


/** Shared kit for the tier entry files: the registry row type `Q`
  * (query function + DuckDB oracle SQL), the table loader, and the
  * scratch-dir policy. Split out of SparkEntry so each tier registers
  * against one definition.
  */
private[graft] object EntryKit {
  type QFn = (SparkSession, String) => DataFrame
  final case class Q(fn: QFn, oracle: Option[String])

  def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** Scratch dirs for entry-local sinks, checkpoints, and state stores:
    * prefer tmpfs (`/dev/shm`) when present so the streaming entries'
    * checkpoint/file-sink I/O measures the OPERATOR, not the
    * container's disk — at sf0.1 the five slowest registry entries were
    * all streaming drains whose cost was dominated by checkpoint fsyncs
    * on `/tmp`, burying real plan regressions in I/O noise. Production
    * checkpoints belong on durable storage (HDFS/S3); this relocates
    * only the LOCAL bench/verify scratch.
    */
  def scratchPath(prefix: String): java.nio.file.Path = {
    // honor an explicit override first (GRAFT_SCRATCH_DIR), then prefer
    // shm only when it can actually hold sf0.1-scale fixtures — Docker's
    // default /dev/shm is 64 MB, writable but useless, and ENOSPC
    // mid-drain is worse than slow fsyncs
    val MinShmBytes = 8L << 30
    // a SET override must be usable — silently falling back to shm/tmp
    // would mask the misconfiguration instead of surfacing it
    val override_ = sys.env.get("GRAFT_SCRATCH_DIR").map { s =>
      val p = java.nio.file.Paths.get(s)
      require(java.nio.file.Files.isDirectory(p) &&
          java.nio.file.Files.isWritable(p),
        s"GRAFT_SCRATCH_DIR=$s is not an existing writable directory")
      p
    }
    val shm = override_.orElse {
      Some(java.nio.file.Paths.get("/dev/shm")).filter(p =>
        java.nio.file.Files.isDirectory(p) &&
          java.nio.file.Files.isWritable(p) &&
          (try java.nio.file.Files.getFileStore(p)
            .getUsableSpace >= MinShmBytes
          catch { case _: java.io.IOException => false }))
    }
    val created = shm match {
      case Some(p) => java.nio.file.Files.createTempDirectory(p, prefix)
      case None => java.nio.file.Files.createTempDirectory(prefix)
    }
    trackForSweep(created)
    created
  }

  /** Test-scratch twin of [[scratchPath]] for the ScalaTest suites: a
    * plain default-tmp dir registered with the same shutdown-hook
    * sweep (and the first call reaps stale graft_* siblings), so
    * `sbt test` runs stop accumulating debris in /tmp (~250 MB /
    * 1,200 dirs per full suite run observed before r16). Stays on
    * /tmp — suite fixtures are tiny and should not contend with the
    * bench entries' shm budget.
    */
  def scratchTracked(prefix: String): java.nio.file.Path = {
    val p = java.nio.file.Files.createTempDirectory(prefix)
    trackForSweep(p)
    p
  }

  /** Scratch-lifetime policy. The ANN index entries delete their
    * scratch inline ([[servedThenCleanup]] — invocation-fresh index
    * copies are the large case); everything else (fixture-sized sink/
    * checkpoint dirs) is swept here: every dir this JVM creates is
    * deleted by a shutdown hook, and the FIRST scratchPath call also
    * reaps graft-prefixed siblings older than [[StaleAfterMs]] —
    * debris from a crashed or killed earlier run. The age threshold is
    * what makes the sibling sweep safe against CONCURRENT runs: no
    * graft run holds a scratch dir for 2 h (the full bench is ~21 min),
    * so an old dir cannot belong to a live process, while a fresh dir
    * from a parallel sbt invocation is never touched.
    */
  private val StaleAfterMs = 2L * 60 * 60 * 1000
  private val swept = new java.util.concurrent.atomic.AtomicBoolean(false)
  private val ownDirs =
    java.util.concurrent.ConcurrentHashMap.newKeySet[java.nio.file.Path]()

  private def trackForSweep(p: java.nio.file.Path): Unit = {
    if (ownDirs.isEmpty) {
      Runtime.getRuntime.addShutdownHook(new Thread(() => {
        ownDirs.forEach(d =>
          try deleteRecursively(d) catch { case _: Exception => () })
      }, "graft-scratch-sweep"))
    }
    ownDirs.add(p)
    if (swept.compareAndSet(false, true)) sweepStale(p.getParent, Some(p))
  }

  /** Delete graft-prefixed siblings of `keep` under `parent` whose
    * mtime is older than [[StaleAfterMs]]. Failures are swallowed —
    * the sweep is best-effort hygiene, never correctness.
    */
  private[graft] def sweepStale(
      parent: java.nio.file.Path,
      keep: Option[java.nio.file.Path]): Unit = {
    val cutoff = System.currentTimeMillis() - StaleAfterMs
    try {
      val sibs = java.nio.file.Files.list(parent)
      try sibs.forEach { s =>
        val stale = s.getFileName.toString.startsWith("graft_") &&
          !keep.contains(s) &&
          (try java.nio.file.Files.getLastModifiedTime(s).toMillis < cutoff
          catch { case _: Exception => false })
        if (stale)
          try deleteRecursively(s) catch { case _: Exception => () }
      } finally sibs.close()
    } catch { case _: Exception => () }
  }

  /** Materialize an entry's small served result off its scratch files
    * (localCheckpoint pulls the rows into executor storage and cuts the
    * lineage back to the parquet scan), then delete the scratch dir.
    * For entries whose scratch is invocation-fresh by design (parquet
    * append/staging is not replay-idempotent, so they cannot share
    * `ann_index_persist`'s cached path): without this, repeated
    * bench/verify runs accumulate dead index copies in RAM-backed
    * tmpfs. Only valid for k-sized results — the checkpoint pins the
    * rows in memory for the session.
    */
  def servedThenCleanup(
      result: DataFrame, scratch: java.nio.file.Path): DataFrame = {
    val served = result.localCheckpoint()
    deleteRecursively(scratch)
    served
  }

  /** `.replace` for oracle-SQL rewrites that must fail LOUDLY on CTE
    * drift: the shared CTE text is rewritten by pattern, and a plain
    * `.replace` whose pattern no longer matches silently no-ops — the
    * oracle degrades to the unrewritten query, masking a real
    * divergence as a confusing mismatch (or, against a symmetric
    * Spark-side regression, passing vacuously). Requires the pattern
    * to occur EXACTLY once, so both drift (0 matches) and ambiguity
    * (2+) break at entry construction, not at compare time.
    */
  def replaceExactlyOnce(
      s: String, pattern: String, replacement: String): String = {
    require(pattern.nonEmpty, "empty oracle rewrite pattern")
    val first = s.indexOf(pattern)
    require(first >= 0,
      s"oracle rewrite pattern not found (CTE drift): $pattern")
    require(s.indexOf(pattern, first + 1) < 0,
      s"oracle rewrite pattern ambiguous (occurs 2+ times): $pattern")
    s.substring(0, first) + replacement + s.substring(first + pattern.length)
  }

  def deleteRecursively(p: java.nio.file.Path): Unit = {
    if (java.nio.file.Files.exists(p)) {
      java.nio.file.Files.walk(p)
        .sorted(java.util.Comparator.reverseOrder())
        .forEach(f => { java.nio.file.Files.deleteIfExists(f); () })
    }
  }

}
