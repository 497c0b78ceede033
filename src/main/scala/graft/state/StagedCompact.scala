package graft.state

import org.apache.spark.sql.SparkSession

/** The crash-safe staged-compaction protocol shared by the persisted
  * indexes ([[graft.llm.IvfIndex]], [[graft.llm.TextIndex]]): a
  * rewrite stages to a dot-dir, a MANIFEST of the folded root names
  * commits it (written only after the stage completes), then the
  * folded roots delete and the stage renames into place with the
  * manifest riding INSIDE it (a dot-file, ignored by parquet readers)
  * and removed last.
  *
  * At every crash point the full dataset exists either as the intact
  * originals (no manifest yet — the stage is garbage), as the
  * committed stage, or as the renamed live dir; re-running [[finish]]
  * completes any interrupted fold. Epoch roots appended AFTER the
  * manifest was written are not listed in it and survive recovery —
  * the fold neither loses nor double-counts.
  *
  * A stage WITHOUT a manifest never committed. Only the compaction
  * writer discards it (`discardUncommitted = true`, about to restage
  * anyway); read paths leave it alone, so a probe can never delete a
  * stage an in-flight compaction is still writing (ADVICE r6).
  */
object StagedCompact {

  private val ManifestFile = ".folded-roots"

  /** The staging dot-dir for a given live dataset name. */
  def stagePath(dir: String, live: String) =
    new org.apache.hadoop.fs.Path(dir, s".compact-$live")

  private def fsOf(spark: SparkSession, dir: String) =
    new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Commit a completed stage: write the manifest of root names the
    * stage folded. Call ONLY after the stage's data is fully written.
    */
  def commit(spark: SparkSession, dir: String, live: String, roots: Seq[String]): Unit = {
    val fs = fsOf(spark, dir)
    val out = fs.create(
      new org.apache.hadoop.fs.Path(stagePath(dir, live), ManifestFile), true)
    try out.write(roots.mkString("\n").getBytes("UTF-8")) finally out.close()
  }

  /** Finish (or discard) an interrupted fold — see object scaladoc.
    * Returns true if a committed stage was moved into place.
    */
  def finish(
      spark: SparkSession,
      dir: String,
      live: String,
      discardUncommitted: Boolean = false
  ): Boolean = {
    val root = new org.apache.hadoop.fs.Path(dir)
    val fs = fsOf(spark, dir)
    val liveDir = new org.apache.hadoop.fs.Path(root, live)
    val tmp = stagePath(dir, live)
    if (!fs.exists(tmp)) {
      // crash window: stage already renamed into place, manifest not yet
      // removed — finish that last (cosmetic) step; no-op otherwise
      fs.delete(new org.apache.hadoop.fs.Path(liveDir, ManifestFile), false)
      return false
    }
    val manifest = new org.apache.hadoop.fs.Path(tmp, ManifestFile)
    if (!fs.exists(manifest)) {
      if (discardUncommitted) fs.delete(tmp, true)
      return false
    }
    val in = fs.open(manifest)
    val roots =
      try scala.io.Source.fromInputStream(in, "UTF-8").getLines().filter(_.nonEmpty).toList
      finally in.close()
    roots.foreach(r => fs.delete(new org.apache.hadoop.fs.Path(root, r), true))
    fs.rename(tmp, liveDir)
    fs.delete(new org.apache.hadoop.fs.Path(liveDir, ManifestFile), false)
    true
  }
}
