package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._
import graft.sources.SnapshotTable

/** PERSISTED, incrementally-maintained IVF ANN index — the standing-index
  * counterpart of the per-call [[Similarity.ivfTopK]], mirroring the dedup
  * side's `Dedup.dedupIndex` pattern (build once per corpus version,
  * maintain O(delta) per ingest wave, serve many queries from the standing
  * state).
  *
  * Layout (both halves are snapshot stores, so the index itself is
  * versioned, time-travelable, and maintained by the same commit protocol
  * as every other table — reference readme.md:393-401's "tables, not
  * files" discipline applied to index state):
  *
  *  - ASSIGNMENTS at `root`: one row per corpus vector `(id, vec, cell)`,
  *    identity-PARTITIONED by `cell` and written one file per cell, so a
  *    serve that probes `nprobe` cells reads exactly those cells' files via
  *    the store's own manifest/partition pruning ([[SnapshotTable.readWhere]])
  *    — never a full-corpus scan.
  *  - CENTROIDS at `root/_graft_ivf_centroids`: the trained unit centroids
  *    `(cell, vec)` — tiny (nCells rows), collected to the driver at serve
  *    time and inlined as plan literals exactly like [[Similarity.ivfTopK]].
  *
  * At 100 TB the difference from `ivfTopK` is structural: `ivfTopK` re-trains
  * and re-assigns the whole corpus on EVERY call (a full scan per query
  * batch), while this index pays the assignment scan once per build,
  * extends it O(delta) per ingest wave ([[append]] assigns only the new
  * rows to the existing centroids), and every [[topK]] call reads only the
  * probed cells' files.
  */
object IvfIndex {

  /** The nested centroid store of an index rooted at `root`. The `_` prefix
    * keeps it invisible to the assignment store's data listing and orphan
    * sweep (both only consider `v=N` dirs). */
  private def centroidsRoot(root: String) = s"$root/_graft_ivf_centroids"

  /** Train centroids on `corpus` and commit the index: assignments as a
    * fresh full snapshot partitioned by cell (one file per cell — the layout
    * [[topK]]'s pruning depends on), centroids alongside. Returns the
    * assignment store's new version. Deterministic for a given (corpus
    * order, seed). */
  def build(corpus: DataFrame, root: String, idCol: String, vecCol: String,
            nCells: Int = 16, iters: Int = 5, sampleN: Int = 10000,
            seed: Long = 42L): Long = {
    val spark = corpus.sparkSession
    val centroids =
      Similarity.trainCentroids(corpus, vecCol, nCells, iters, sampleN, seed)
    import spark.implicits._
    new SnapshotTable(spark, centroidsRoot(root)).commit(
      centroids.toSeq.zipWithIndex.map { case (v, i) => (i, v.toSeq) }
        .toDF("cell", "vec"))
    commitAssignments(corpus, root, idCol, vecCol, centroids, op = "overwrite")
  }

  /** O(delta) maintenance: assign ONLY `delta`'s rows to the EXISTING
    * centroids and append them to the standing assignment (one commit whose
    * files hold just the delta, clustered by cell like the base — the q92
    * dedup-index shape). The centroids do not move; call [[maintain]] on a
    * cadence to retrain when enough of the corpus arrived after training. */
  def append(delta: DataFrame, root: String, idCol: String, vecCol: String): Long =
    commitAssignments(delta, root, idCol, vecCol,
      loadCentroids(delta.sparkSession, root), op = "append")

  private def commitAssignments(df: DataFrame, root: String, idCol: String,
      vecCol: String, centroids: Array[Array[Double]], op: String): Long = {
    val spark = df.sparkSession
    val assigned = df
      .select(col(idCol).as("id"), asDouble(col(vecCol)).as("vec"))
      .withColumn("cell", Similarity.cellExpr(spark, centroids)(col("vec")))
    // one file per cell: every row of a cell hashes to one task, and each
    // task writes one file per cell dir it holds — so a probe of c cells
    // opens exactly c files of this commit
    new SnapshotTable(spark, root).commitPartitioned(
      assigned.repartition(centroids.length, col("cell")), Seq("cell"), op)
  }

  /** The standing centroids, driver-side (nCells rows — tiny by design). */
  private def loadCentroids(spark: SparkSession, root: String): Array[Array[Double]] =
    new SnapshotTable(spark, centroidsRoot(root)).read()
      .orderBy(col("cell"))
      .select(col("vec"))
      .collect().map(_.getSeq[Double](0).toArray)

  /** Serve top-k from the STANDING index: each query probes its `nprobe`
    * nearest cells and the assignment store's scan prunes to exactly the
    * probed cells' files (verify with [[SnapshotTable.scanStats]](root)).
    * Same output shape and scoring as [[Similarity.ivfTopK]] — with
    * `nprobe = nCells` the result equals exact brute force. */
  def topK(spark: SparkSession, root: String, queries: DataFrame,
           idCol: String, vecCol: String, k: Int, nprobe: Int): DataFrame = {
    val centroids = loadCentroids(spark, root)
    // the probed-cell UNION is bounded by nCells (small by construction) —
    // collecting it lets the store prune files BEFORE the scan plans; the
    // per-query cell join inside scoreProbed still bounds each query to its
    // own nprobe cells
    val probed = queries
      .select(explode(Similarity.probeCellsExpr(spark, centroids, nprobe)(
        asDouble(col(vecCol)))).as("cell"))
      .distinct().collect().map(_.getInt(0)).sorted
    val st = new SnapshotTable(spark, root)
    val pruned = st.readWhere(col("cell").isin(probed.map(Int.box): _*))
    lastPruneStats = st.lastPruneStats
    val assigned = pruned
      .select(col("id").as("neighbor_id"), col("vec").as("__cv"), col("cell"))
    Similarity.scoreProbed(assigned, queries, idCol, vecCol, k, nprobe, centroids)
  }

  /** (files scanned, files live) of the most recent [[topK]]'s assignment
    * scan — the audit observable proving a serve read only its probed
    * cells' files (mirror of [[SnapshotTable#lastPruneStats]]; like it, an
    * audit aid for specs and registry require()s, not a concurrent-safe
    * metric). */
  @volatile var lastPruneStats: (Long, Long) = (0L, 0L)

  /** Metadata-only retrain policy, the index analog of
    * [[graft.sources.TableMaintenance]]: when the rows appended SINCE the
    * last full (re)build exceed `retrainShare` of the base the centroids
    * were trained for, the spherical-k-means partition has drifted from the
    * corpus — rebuild from the store's own current content (retrain +
    * reassign + one fresh full snapshot, folding the delta chain). The
    * decision reads only the commit log (row counts per op); None = healthy,
    * nothing rewritten. */
  def maintain(spark: SparkSession, root: String, retrainShare: Double = 0.5,
               nCells: Int = 16, iters: Int = 5, sampleN: Int = 10000,
               seed: Long = 42L): Option[Long] = {
    val st = new SnapshotTable(spark, root)
    val hist = st.history()
      .select(col("version"), col("operation"), col("row_count"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .sortBy(_._1)
    require(hist.nonEmpty, s"no IVF index at $root — build() first")
    val baseRows = hist.filter(_._2 == "overwrite").last._3
    val totalRows = hist.last._3 // every data op logs its resulting total
    if (baseRows <= 0 || (totalRows - baseRows).toDouble / baseRows < retrainShare)
      None
    else
      Some(build(st.read().select(col("id"), col("vec")), root,
        "id", "vec", nCells, iters, sampleN, seed))
  }
}
