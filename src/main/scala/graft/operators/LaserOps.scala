package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.Exact.acc

/** Health gauge for the LaserScan table (`RosbagReader.laserScans` —
  * sensor_msgs/LaserScan demux, reference bagstream.py LaserScan→CSV):
  * the 2-D cousin of `PointCloudOps.cloudStats`, completing per-sensor
  * health coverage across every demuxed modality (camera/audio/lidar
  * drift gauges, odometry trajectory tripwires — and now the planar
  * scanner). A failing scanner shows up here first: beam DROPOUT (returns
  * outside [range_min, range_max] or non-finite — absorptive surfaces,
  * rain, a dying emitter), a collapsed field of view (angular span
  * shrinking), or a range distribution sliding toward the near limit
  * (a blocked housing).
  */
object LaserOps {

  /** Per (bag, topic): scan count, mean beams per scan, the DROPOUT
    * fraction (returns that are non-finite or outside the scan's own
    * declared [range_min, range_max] — the per-message contract), mean
    * and min VALID range, and the angular span. One explode-free pass:
    * per-scan reductions run as array higher-order folds map-side, the
    * only shuffle is the bounded per-topic rollup; valid-range means
    * ride the exact decimal carrier.
    */
  def scanHealth(scans: DataFrame): DataFrame = {
    val perScan = scans
      .withColumn("n_beams", size(col("ranges")))
      // a return is VALID iff finite and inside the scan's own declared
      // band (the per-message contract; ±Inf and NaN are the standard
      // no-return encodings)
      .withColumn("valid",
        expr("filter(ranges, r -> NOT isnan(r) AND r >= range_min AND r <= range_max)"))
      .withColumn("n_valid", size(col("valid")))
      .withColumn("sum_valid",
        expr("aggregate(valid, 0D, (a, r) -> a + CAST(r AS DOUBLE))"))
      .withColumn("min_valid", expr("CAST(array_min(valid) AS DOUBLE)"))
      .withColumn("span", (col("angle_max") - col("angle_min")).cast("double"))
    perScan.groupBy("bag", "topic").agg(
      count(lit(1)).as("n_scans"),
      avg(col("n_beams").cast("double")).as("mean_beams"),
      when(sum(col("n_beams")) > 0L,
        lit(1.0) - sum(col("n_valid")).cast("double") /
          sum(col("n_beams")).cast("double")).as("dropout_frac"),
      // NULL when no beam validated — no reading, never a fake zero
      when(sum(col("n_valid")) > 0L,
        sum(acc(col("sum_valid"))).cast("double") /
          sum(col("n_valid")).cast("double")).as("mean_valid_range"),
      min(col("min_valid")).as("min_valid_range"),
      min(col("span")).as("min_angular_span"),
      max(col("span")).as("max_angular_span"))
      .orderBy("bag", "topic")
  }
}
