package graft.llm

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DoubleType, LongType, StructField, StructType}

import Similarity.dot

/** Persisted IVF index — the 100 TB shape of [[Similarity.ivfTopK]]
  * made a real storage layout instead of a scaladoc claim: the corpus
  * is bucketed ONCE by its coarse-quantizer cell (one shuffle at build
  * time) into cell-partitioned parquet, and a probe reads ONLY the
  * `nProbe` cells its queries rank highest — partition pruning instead
  * of a corpus scan, with `nProbe` the standard recall knob.
  *
  * Layout under `dir`:
  *  - `centroids/` — the (cid, cv, cn) quantizer table, `numCentroids`
  *    rows (constant-size, broadcastable; the probe must use the SAME
  *    centroids the build assigned with, so they persist next to the
  *    cells rather than being re-derived);
  *  - `cells/` — (vid, v, nrm) partitioned by `cell` (each vector in
  *    exactly its top-centroid cell, ties to the lower cid — identical
  *    assignment to [[Similarity.ivfTopK]]).
  *
  * Reference scope: ralf maintains queryable feature tables as
  * persisted state (`ralf/table.py:150-210` point/bulk lookups); this
  * is the same persist-once / probe-cheaply economy for the ANN
  * surface, built purely from Spark partitioned storage.
  */
object IvfIndex {

  /** The persisted schema of `cells/` — declared explicitly at read
    * time so the `cell` partition column comes back as LONG (partition
    * value inference would narrow small cids to int, and the resulting
    * cast in probe filters can defeat partition pruning).
    */
  private val cellsSchema = StructType(Seq(
    StructField("vid", LongType, nullable = false),
    StructField("v", ArrayType(DoubleType, containsNull = false), nullable = false),
    StructField("nrm", DoubleType, nullable = false),
    StructField("cell", LongType, nullable = false)))

  /** Build the index: one O(corpus × numCentroids) assignment pass
    * (broadcast quantizer, same shape as every IVF operator here), one
    * shuffle into the cell layout.
    */
  def write(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      dir: String,
      numCentroids: Int
  ): Unit = {
    val p = Similarity.prepared(emb, idCol, vecCol)
    // feeds its own write AND the assignment crossJoin — barrier once
    val cents = Similarity.centroidSample(p, numCentroids).localCheckpoint(false)
    val cellRank = row_number().over(
      Window.partitionBy(col("vid")).orderBy(col("ccos").desc, col("cid")))
    val assigned = p.crossJoin(broadcast(cents))
      .withColumn("ccos", dot(col("v"), col("cv")) / (col("nrm") * col("cn")))
      .withColumn("crk", cellRank)
      .filter(col("crk") === 1)
      .select(col("vid"), col("v"), col("nrm"), col("cid").as("cell"))
    cents.write.mode("overwrite").parquet(s"$dir/centroids")
    // the ONE build shuffle: co-locate each cell before the partitioned
    // write — without it every write task fans out a file into every
    // cell directory (tasks × cells small files; measured 4× slower at
    // sf0.1), where one shuffle gives one well-sized file per cell
    assigned.repartition(col("cell"))
      .write.mode("overwrite").partitionBy("cell").parquet(s"$dir/cells")
  }

  /** Incremental maintenance: assign NEW vectors to the PERSISTED
    * quantizer — frozen, so cell ids stay stable and no existing
    * partition ever rewrites — and write them under `cells-b<epoch>/`
    * with the same cell partitioning. [[probe]] unions the base root
    * and every epoch root (partition pruning applies per root), so
    * appended vectors are searchable immediately; [[compactEpochs]]
    * folds the epoch roots back into `cells/` between runs (the
    * CurationGate small-dirs economy). Replay-idempotent: an epoch
    * overwrites its own root.
    *
    * The frozen quantizer is the honest trade of every IVF system:
    * cells drift as the distribution does, and the rebuild (a fresh
    * [[write]]) is a deliberate, occasional operation — never an
    * implicit side effect of ingest.
    */
  def appendEpoch(
      spark: SparkSession,
      dir: String,
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      epoch: Long
  ): Unit = {
    val cents = spark.read.parquet(s"$dir/centroids")
    val p = Similarity.prepared(emb, idCol, vecCol)
    val cellRank = row_number().over(
      Window.partitionBy(col("vid")).orderBy(col("ccos").desc, col("cid")))
    val assigned = p.crossJoin(broadcast(cents))
      .withColumn("ccos", dot(col("v"), col("cv")) / (col("nrm") * col("cn")))
      .withColumn("crk", cellRank)
      .filter(col("crk") === 1)
      .select(col("vid"), col("v"), col("nrm"), col("cid").as("cell"))
    assigned.repartition(col("cell"))
      .write.mode("overwrite").partitionBy("cell").parquet(s"$dir/cells-b$epoch")
  }

  /** Fold every `cells-b<epoch>/` root into the base `cells/` layout
    * and delete the epoch roots — run BETWEEN probe workloads (same
    * contract as CurationGate.compact). Crash-safe protocol: the
    * rewrite stages to a dot-dir, then a MANIFEST of the folded root
    * names commits the fold (it is written only after the stage
    * completes), then the folded roots delete and the stage renames
    * into place. A crash before the manifest leaves the originals
    * intact (the stage is discarded); a crash after it is finished by
    * [[finishStagedCompact]] from the manifest — epoch roots appended
    * AFTER the crash are not listed and survive, so recovery neither
    * loses nor double-counts. Returns the number of epoch roots folded.
    */
  def compactEpochs(spark: SparkSession, dir: String): Int = {
    val root = new org.apache.hadoop.fs.Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return 0
    finishStagedCompact(spark, dir, discardUncommitted = true)
    val epochs = fs.listStatus(root).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.matches("cells-b\\d+"))
      .map(_.getPath.getName)
    if (epochs.isEmpty) return 0
    val tmp = new org.apache.hadoop.fs.Path(root, StageDir)
    (("cells" +: epochs): Seq[String])
      .map(r => spark.read.schema(cellsSchema).parquet(s"$dir/$r"))
      .reduce(_ unionAll _)
      .repartition(col("cell"))
      .write.mode("overwrite").partitionBy("cell").parquet(tmp.toString)
    writeManifest(fs, tmp, "cells" +: epochs)
    finishStagedCompact(spark, dir)
    epochs.size
  }

  private val StageDir = ".compact-cells"
  private val ManifestFile = ".folded-roots"

  private def writeManifest(
      fs: org.apache.hadoop.fs.FileSystem,
      tmp: org.apache.hadoop.fs.Path,
      roots: Seq[String]
  ): Unit = {
    val out = fs.create(new org.apache.hadoop.fs.Path(tmp, ManifestFile), true)
    try out.write(roots.mkString("\n").getBytes("UTF-8")) finally out.close()
  }

  /** Finish (or discard) an interrupted [[compactEpochs]]: a staged
    * dir WITH its manifest is committed — delete whichever manifest
    * roots still exist (idempotent; the manifest still commits the
    * stage), rename the stage to `cells/` with the manifest riding
    * INSIDE it (a dot-file, so parquet readers ignore it), and only
    * then remove the manifest. At every crash point the full dataset
    * exists either as the committed stage or as the renamed `cells/`,
    * and re-running this finisher completes the fold. (The prior
    * protocol deleted the manifest BEFORE the rename; a crash between
    * the two left a manifest-less — i.e. "uncommitted" — stage whose
    * discard on the next pass lost the dataset, the folded roots having
    * already been removed.)
    *
    * A stage WITHOUT a manifest never committed. Only the compaction
    * writer discards it (`discardUncommitted = true`, about to restage
    * anyway); the read path leaves it alone, so a probe can never
    * delete a stage an in-flight [[compactEpochs]] is still writing.
    * Returns true if a committed stage was finished.
    */
  private[graft] def finishStagedCompact(
      spark: SparkSession,
      dir: String,
      discardUncommitted: Boolean = false
  ): Boolean = {
    val root = new org.apache.hadoop.fs.Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val live = new org.apache.hadoop.fs.Path(root, "cells")
    val tmp = new org.apache.hadoop.fs.Path(root, StageDir)
    if (!fs.exists(tmp)) {
      // crash window: stage already renamed into place, manifest not yet
      // removed — finish that last (cosmetic) step; no-op otherwise
      fs.delete(new org.apache.hadoop.fs.Path(live, ManifestFile), false)
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
    fs.rename(tmp, live)
    fs.delete(new org.apache.hadoop.fs.Path(live, ManifestFile), false)
    true
  }

  /** Every cell root currently backing the index: the base plus any
    * un-compacted epoch appends. Self-healing: a committed-but-
    * interrupted compaction is finished first (one existence check
    * when nothing is staged), so a probe between a compaction crash
    * and the next maintenance run still sees a complete index.
    */
  private def cellRoots(spark: SparkSession, dir: String): Seq[String] = {
    finishStagedCompact(spark, dir)
    val root = new org.apache.hadoop.fs.Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val epochs =
      if (!fs.exists(root)) Seq.empty
      else fs.listStatus(root).toSeq
        .filter(s => s.isDirectory && s.getPath.getName.matches("cells-b\\d+"))
        .map(_.getPath.toString)
    s"$dir/cells" +: epochs
  }

  /** Probe the persisted index: rank the (tiny) centroid table per
    * query, take each query's `nProbe` best cells, and scan ONLY those
    * partitions of `cells/`. The probed cell-id set is control-plane
    * sized (≤ min(queries × nProbe, numCentroids)), so it is collected
    * to the driver and planted as a static partition filter — the scan
    * lists and reads just the probed directories (the same driver-side
    * routing economy as the bucketed point-query path). Queries need
    * not be index members; a query that IS a member never matches
    * itself. Result-identical to [[Similarity.ivfTopK]] run in one job
    * over the same corpus, params and query set.
    */
  def probe(
      spark: SparkSession,
      dir: String,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      nProbe: Int
  ): DataFrame = {
    val cents = spark.read.parquet(s"$dir/centroids")
    val q = Similarity.prepared(queries, idCol, vecCol)
      .select(col("vid").as("qid"), col("v").as("qv"), col("nrm").as("qn"))
    val cellRank = row_number().over(
      Window.partitionBy(col("qid")).orderBy(col("qcos").desc, col("cid")))
    // feeds the probed-cell collect AND the scoring join — barrier once
    val probes = q.crossJoin(broadcast(cents))
      .withColumn("qcos", dot(col("qv"), col("cv")) / (col("qn") * col("cn")))
      .withColumn("crk", cellRank)
      .filter(col("crk") <= nProbe)
      .select(col("qid"), col("qv"), col("qn"), col("cid").as("cell"))
      .localCheckpoint(false)
    val probedCells = probes.select(col("cell")).distinct()
      .collect().map(_.getLong(0)).toSeq
    // one pruned scan per cell root (base + appended epochs), unioned —
    // a single multi-root read would break partition discovery (each
    // root carries its own cell=N layout)
    val corpus = cellRoots(spark, dir)
      .map(r => spark.read.schema(cellsSchema).parquet(r)
        .filter(col("cell").isin(probedCells: _*)))
      .reduce(_ unionAll _)
    val scored = corpus.as("n")
      .join(broadcast(probes),
        col("n.cell") === probes("cell") && col("qid") =!= col("n.vid"))
      .select(
        col("qid"),
        col("n.vid").as("nid"),
        (dot(col("qv"), col("n.v")) / (col("qn") * col("n.nrm"))).as("cosine"))
    val rn = row_number().over(
      Window.partitionBy(col("qid")).orderBy(col("cosine").desc, col("nid")))
    scored.withColumn("rank", rn).filter(col("rank") <= k)
  }
}
