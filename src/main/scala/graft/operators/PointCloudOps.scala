package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Point-cloud operators over [[graft.sources.rosbag.RosbagReader.pointCloudPoints]]
  * frames (SURVEY.md §2.B) — the lidar complement of the image pipeline.
  * The kernels are spec-verified on synthesized bags (the rosbag-source
  * convention); [[voxelTable]] additionally runs the voxel filter as an
  * ORACLED driver query over a deterministic point cloud derived from the
  * gate lake, so the operator sits in the correctness gate too.
  */
object PointCloudOps {

  private def vox(c: Column, edge: Double): Column =
    floor(c / lit(edge)).cast("long")

  /** Voxel-grid downsampling (the PCL VoxelGrid filter, Rusu & Cousins
    * ICRA 2011): points bucketed into cubic voxels of the given edge
    * length, one output row per non-empty voxel per cloud, carrying the
    * population and the centroid. THE standard density-normalization pass
    * before registration/feature extraction — and the lidar analogue of
    * image resize: a 100 TB lidar lake downsamples before anything else
    * touches it.
    *
    * Scale shape: ONE groupBy on (cloud key, voxel index) — partial
    * aggregation map-side, a single shuffle keyed by cloud+voxel, no
    * per-cloud state beyond the voxel's own running sums. Centroids
    * accumulate on the exact DECIMAL(27,6) carrier (sum exact and
    * order-insensitive), then ONE IEEE division per output voxel — the
    * Exact.davg shape, engine-portable (decimal÷int division semantics
    * differ between engines; double÷long does not), so results are
    * bit-stable under any partitioning AND oracle-matchable.
    */
  def voxelDownsample(points: DataFrame, voxel: Double): DataFrame = {
    require(voxel > 0, s"voxel edge must be > 0; got $voxel")
    def cen(c: String) =
      sum(col(c).cast("decimal(27,6)")).cast("double") / count(lit(1))
    points
      .groupBy(col("bag"), col("topic"), col("time_ns"),
        vox(col("x"), voxel).as("vx"),
        vox(col("y"), voxel).as("vy"),
        vox(col("z"), voxel).as("vz"))
      .agg(
        count(lit(1)).as("n_points"),
        cen("x").as("cx"), cen("y").as("cy"), cen("z").as("cz"),
        (sum(col("intensity").cast("decimal(27,6)")).cast("double") /
          count(col("intensity"))).as("mean_intensity"))
  }

  /** q104 — the voxel filter as an ORACLED driver query: a deterministic
    * synthetic lidar sweep set derived from `lineitem` (the q28-boxes
    * device — the gate lake carries no binary clouds, so the point table
    * is synthesized IN the query from integer columns, identically in the
    * DuckDB oracle). 20 sweeps; x/y span ±100 m at dm resolution, z spans
    * [−2, 2) m, intensity from l_quantity — negative coordinates included
    * so the floor-on-negatives voxel assignment is oracle-pinned, not just
    * spec-pinned. Voxel edge 5 m.
    *
    * Every coordinate is a fixed IEEE chain over exact integers (modulo →
    * one division → one subtraction), so both engines compute
    * bit-identical doubles, identical floors, and — through the decimal
    * carrier — identical centroids.
    */
  def voxelTable(s: SparkSession, d: String): DataFrame = {
    val pts = graft.Tables.lineitem(s, d).select(
      lit("lake").as("bag"), lit("/lidar").as("topic"),
      (col("l_orderkey") % 20).as("time_ns"),
      (((col("l_partkey") * 31) % 2000).cast("double") / 10.0 - 100.0).as("x"),
      (((col("l_suppkey") * 17) % 2000).cast("double") / 10.0 - 100.0).as("y"),
      (((col("l_linenumber").cast("bigint") * 13) % 40).cast("double") / 10.0 - 2.0).as("z"),
      (col("l_quantity") / 50.0).as("intensity"))
    voxelDownsample(pts, 5.0)
      .select(col("time_ns").as("sweep"), col("vx"), col("vy"), col("vz"),
        col("n_points"), col("cx"), col("cy"), col("cz"), col("mean_intensity"))
      .orderBy("sweep", "vx", "vy", "vz")
  }

  /** Per-cloud summary: population, axis-aligned bounding box, intensity
    * range — the scan-level QA row (a cloud with a collapsed bbox or
    * wild extent is a mis-calibrated or corrupt sweep). One groupBy per
    * cloud key; output is one row per sweep, UNORDERED — a QA pass is
    * consumed by filters and joins, and a global sort over one-row-per-
    * sweep output is an unbounded range exchange at lake scale for
    * nothing (the q95 scoreOf precedent; callers that print add their
    * own orderBy).
    */
  def cloudStats(points: DataFrame): DataFrame =
    points
      .groupBy("bag", "topic", "time_ns")
      .agg(
        count(lit(1)).as("n_points"),
        min("x").as("min_x"), max("x").as("max_x"),
        min("y").as("min_y"), max("y").as("max_y"),
        min("z").as("min_z"), max("z").as("max_z"),
        min("intensity").as("min_intensity"),
        max("intensity").as("max_intensity"))

  /** Per-sweep point population as a drift SCORE frame `(score)` — the
    * cheap lidar health statistic the gauge distributes (one groupBy per
    * sweep, the [[cloudStats]] reduction). Population is the statistic a
    * dying lidar moves first: beam dropouts and FOV occlusion collapse
    * the per-sweep return count, a mis-set return mode inflates it. */
  private[graft] def populationScoredOf(points: DataFrame): DataFrame =
    points.groupBy("bag", "topic", "time_ns")
      .agg(count(lit(1)).cast("double").as("score"))
      .select("score")

  /** Frozen lidar drift REFERENCE — decile edges + per-bucket counts of
    * per-sweep point population over a healthy reference recording,
    * captured ONCE offline (the brightness/RMS reference, lidar column).
    */
  def cloudDriftReference(points: DataFrame,
      buckets: Int = 10): TextAnalysisOps.DriftRef =
    TextAnalysisOps.driftReferenceOf(populationScoredOf(points), buckets)

  /** PSI of a sweep batch's population distribution against a frozen
    * [[cloudDriftReference]] — the LIDAR drift gauge, fifth modality on
    * q110's shared PSI contract (text quality, embeddings q108, pixel
    * brightness, clip RMS): beam dropouts, occlusion, or a return-mode
    * change shift the per-sweep population distribution exactly the way
    * a dying microphone shifts RMS — the gauge fires before any
    * registration or detection consumer errors. Same contract as the
    * others: bucket rows + the −1 rollup whose term IS the PSI, NULL on
    * an empty batch. */
  def cloudDrift(points: DataFrame,
      ref: TextAnalysisOps.DriftRef): DataFrame =
    TextAnalysisOps.psiAgainst(populationScoredOf(points), ref)
}
