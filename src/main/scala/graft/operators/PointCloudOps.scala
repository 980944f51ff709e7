package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Point-cloud operators over [[graft.sources.rosbag.RosbagReader.pointCloudPoints]]
  * frames (SURVEY.md §2.B) — the lidar complement of the image pipeline.
  * Frame-level (not driver queries): the test lake carries no point clouds,
  * so these are spec-verified on synthesized bags, like the rosbag source
  * itself.
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
    * accumulate on the exact DECIMAL(27,6) carrier so results are
    * bit-stable under any partitioning.
    */
  def voxelDownsample(points: DataFrame, voxel: Double): DataFrame = {
    require(voxel > 0, s"voxel edge must be > 0; got $voxel")
    def cen(c: String) =
      (sum(col(c).cast("decimal(27,6)")) / count(lit(1))).cast("double")
    points
      .groupBy(col("bag"), col("topic"), col("time_ns"),
        vox(col("x"), voxel).as("vx"),
        vox(col("y"), voxel).as("vy"),
        vox(col("z"), voxel).as("vz"))
      .agg(
        count(lit(1)).as("n_points"),
        cen("x").as("cx"), cen("y").as("cy"), cen("z").as("cz"),
        (sum(col("intensity").cast("decimal(27,6)")) /
          count(col("intensity"))).cast("double").as("mean_intensity"))
  }

  /** Per-cloud summary: population, axis-aligned bounding box, intensity
    * range — the scan-level QA row (a cloud with a collapsed bbox or
    * wild extent is a mis-calibrated or corrupt sweep). One groupBy per
    * cloud key; output is one row per sweep.
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
      .orderBy("bag", "topic", "time_ns")
}
