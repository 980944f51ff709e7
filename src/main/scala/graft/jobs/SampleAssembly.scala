package graft.jobs

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.GraftSession

/** Multimodal TRAINING-SAMPLE assembly over a landed bag lake — the table
  * a labeling or training consumer actually reads: one row per camera
  * frame carrying its cross-modal context, joined by time the way the
  * sensors actually relate (nothing in a rig shares keys except the
  * clock).
  *
  * Per frame: the nearest AUDIO CLIP and the signed offset into it
  * (within a tolerance — a frame recorded while no microphone ran gets
  * NULL, never a far-away clip), the EGO SPEED at frame time (the
  * odometry segment bracketing the frame — dist(prev, next)/Δt, the q71
  * interpolation stance: never extrapolated, NULL outside the recorded
  * pose span), and the frame's DETECTION summary (count, max confidence,
  * sorted label set) when a detections table is supplied.
  *
  * Scale shape: the q111 union-and-bracket idiom — each modality pass is
  * ONE per-bag window sort carrying the bracketing payload as a struct
  * (no range join, no per-frame probe; state bounded per rig), the
  * detection rollup one bounded aggregation + broadcast-friendly join.
  * Recordings are the parallelism unit, like every bag-series operator.
  */
object SampleAssembly {

  /** Assemble from a landed lake directory (`BagIngest` layout:
    * `<lake>/images`, `<lake>/clips`, `<lake>/odometry`) into
    * `<out>/samples`. */
  def assemble(spark: SparkSession, lakeDir: String, out: String,
      detections: Option[DataFrame] = None,
      clipTolNs: Long = 2L * 1000000000L): Unit = {
    val frames = spark.read.parquet(s"$lakeDir/images")
      .select("bag", "topic", "time_ns", "frame_no")
    val clips = spark.read.parquet(s"$lakeDir/clips")
      .select("bag", "time_ns", "clip_id")
    // ONE ego stream per bag: a rig recording several odometry topics
    // (/odom wheel + /vio visual is common) must not interleave poses
    // from different estimators/coordinate frames into one bracketing
    // sequence — dist(prev, next) would measure the offset BETWEEN
    // frames, not motion. Keep the densest topic per bag (the ego
    // estimate is the high-rate one), ties to the lexicographically
    // smallest — deterministic, and a single-topic bag is unaffected.
    val odomAll = spark.read.parquet(s"$lakeDir/odometry")
      .select("bag", "topic", "time_ns", "seq", "pos_x", "pos_y", "pos_z")
    val wDense = org.apache.spark.sql.expressions.Window
      .partitionBy("bag").orderBy(col("n").desc, col("topic").asc)
    val egoTopic = odomAll.groupBy("bag", "topic").agg(count(lit(1)).as("n"))
      .withColumn("rk", row_number().over(wDense))
      .filter(col("rk") === 1).select(col("bag"), col("topic").as("ego_topic"))
    val odom = odomAll
      .join(egoTopic, odomAll("bag") === egoTopic("bag") &&
        odomAll("topic") === egoTopic("ego_topic"))
      .select(odomAll("bag"), col("time_ns"), col("seq"),
        col("pos_x"), col("pos_y"), col("pos_z"))
    assembleOf(frames, clips, odom, detections, clipTolNs)
      .write.mode(SaveMode.Overwrite).parquet(s"$out/samples")
  }

  /** `odom` must be ONE ego stream per bag (see [[assemble]]'s densest-
    * topic selection) carrying a `seq` column — the duplicate-stamp
    * tie-break that keeps the bracketing deterministic. */
  private[graft] def assembleOf(frames: DataFrame, clips: DataFrame,
      odom: DataFrame, detections: Option[DataFrame],
      clipTolNs: Long): DataFrame = {
    require(clipTolNs > 0, s"clipTolNs must be > 0; got $clipTolNs")

    // ---- ego speed: bracket each frame between DISTINCT neighboring
    // poses — prev strictly BEFORE the frame, next at-or-after (a pose
    // exactly at frame time is the segment's far end, never both ends:
    // the fwd tie-break hides a same-ts pose from the frame, the bwd
    // tie-break shows it)
    // tk: a per-modality tie key (pose seq / clip_id / frame_no) so
    // same-ts siblings have ONE deterministic order and last(...).over
    // cannot pick differently between runs
    val fwd = Window.partitionBy("bag")
      .orderBy(col("time_ns").asc, col("kf").asc, col("tk").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val bwd = Window.partitionBy("bag")
      .orderBy(col("time_ns").desc, col("kb").asc, col("tk").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val poseRows = odom.select(col("bag"), col("time_ns"),
      lit(0).as("kind"), lit(1).as("kf"), lit(0).as("kb"),
      col("seq").cast("long").as("tk"),
      struct(col("time_ns").as("t"), col("pos_x"), col("pos_y"), col("pos_z")).as("pose"),
      lit(null).cast("string").as("topic"), lit(null).cast("long").as("frame_no"))
    val frameRows = frames.select(col("bag"), col("time_ns"),
      lit(1).as("kind"), lit(0).as("kf"), lit(1).as("kb"),
      col("frame_no").cast("long").as("tk"),
      lit(null).cast(poseRows.schema("pose").dataType).as("pose"),
      col("topic"), col("frame_no").cast("long").as("frame_no"))
    def poseOnly(c: org.apache.spark.sql.Column) = when(col("kind") === 0, c)
    val withSpeed = poseRows.unionByName(frameRows)
      .withColumn("prev_pose", last(poseOnly(col("pose")), ignoreNulls = true).over(fwd))
      .withColumn("next_pose", last(poseOnly(col("pose")), ignoreNulls = true).over(bwd))
      .filter(col("kind") === 1)
      .withColumn("ego_speed_mps",
        when(col("prev_pose").isNotNull && col("next_pose").isNotNull &&
          col("next_pose.t") > col("prev_pose.t"),
          sqrt(
            (col("next_pose.pos_x") - col("prev_pose.pos_x")) * (col("next_pose.pos_x") - col("prev_pose.pos_x")) +
            (col("next_pose.pos_y") - col("prev_pose.pos_y")) * (col("next_pose.pos_y") - col("prev_pose.pos_y")) +
            (col("next_pose.pos_z") - col("prev_pose.pos_z")) * (col("next_pose.pos_z") - col("prev_pose.pos_z"))) /
            ((col("next_pose.t") - col("prev_pose.t")).cast("double") / lit(1e9))))
      .select("bag", "topic", "time_ns", "frame_no", "ego_speed_mps")

    // ---- nearest clip: same bracketing, nearest by |gap|, tie -> the
    // earlier clip (the q111 total order), gated by the tolerance
    val clipRows = clips.select(col("bag"), col("time_ns"),
      lit(0).as("kind"), lit(1).as("kf"), lit(0).as("kb"),
      col("clip_id").cast("long").as("tk"),
      struct(col("time_ns").as("t"), col("clip_id")).as("clip"),
      lit(null).cast("string").as("topic"), lit(null).cast("long").as("frame_no"))
    val frameRows2 = frames.select(col("bag"), col("time_ns"),
      lit(1).as("kind"), lit(0).as("kf"), lit(1).as("kb"),
      col("frame_no").cast("long").as("tk"),
      lit(null).cast(clipRows.schema("clip").dataType).as("clip"),
      col("topic"), col("frame_no").cast("long").as("frame_no"))
    def clipOnly(c: org.apache.spark.sql.Column) = when(col("kind") === 0, c)
    val prevGap = col("time_ns") - col("prev_clip.t")
    val nextGap = col("next_clip.t") - col("time_ns")
    val withClip = clipRows.unionByName(frameRows2)
      .withColumn("prev_clip", last(clipOnly(col("clip")), ignoreNulls = true).over(fwd))
      .withColumn("next_clip", last(clipOnly(col("clip")), ignoreNulls = true).over(bwd))
      .filter(col("kind") === 1)
      .withColumn("best_clip",
        when(col("prev_clip").isNull, col("next_clip"))
          .when(col("next_clip").isNull, col("prev_clip"))
          .when(prevGap <= nextGap, col("prev_clip"))
          .otherwise(col("next_clip")))
      .withColumn("clip_gap", abs(col("time_ns") - col("best_clip.t")))
      .withColumn("clip_id",
        when(col("clip_gap") <= clipTolNs, col("best_clip.clip_id")))
      .withColumn("clip_offset_ns",
        when(col("clip_gap") <= clipTolNs, col("time_ns") - col("best_clip.t")))
      .select("bag", "topic", "time_ns", "frame_no", "clip_id", "clip_offset_ns")

    // ---- detection rollup: bounded per-frame aggregation, left join
    val base = withSpeed.join(withClip, Seq("bag", "topic", "time_ns", "frame_no"), "inner")
    val assembled = detections match {
      case Some(det) =>
        val rolled = det
          .select(col("bag"), col("topic"), col("frame_no").cast("long").as("frame_no"),
            col("label"), col("conf").cast("double").as("conf"))
          .groupBy("bag", "topic", "frame_no")
          .agg(count(lit(1)).as("n_detections"),
            max(col("conf")).as("max_conf"),
            array_sort(collect_set(col("label"))).as("labels"))
        base.join(rolled, Seq("bag", "topic", "frame_no"), "left")
          .withColumn("n_detections", coalesce(col("n_detections"), lit(0L)))
      case None =>
        base.withColumn("n_detections", lit(0L))
          .withColumn("max_conf", lit(null).cast("double"))
          .withColumn("labels", lit(null).cast("array<string>"))
    }
    assembled.select(col("bag"), col("topic"), col("time_ns"), col("frame_no"),
      col("ego_speed_mps"), col("clip_id"), col("clip_offset_ns"),
      col("n_detections"), col("max_conf"), col("labels"))
      .orderBy("bag", "topic", "frame_no")
  }

  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: SampleAssembly <lake-dir> <out-dir>")
    val spark = GraftSession.get()
    assemble(spark, args(0), args(1))
    val n = spark.read.parquet(s"${args(1)}/samples").count()
    println(s"""{"job":"sample_assembly","samples":$n}""")
  }
}
