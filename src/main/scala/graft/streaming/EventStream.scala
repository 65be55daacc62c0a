package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Structured Streaming over the events table: the streaming shape a
  * 100 TB event pipeline uses — file-source discovery, event-time
  * watermarks, windowed aggregation, and custom session state via
  * flatMapGroupsWithState.
  *
  * The reference has no streaming surface (SURVEY.md §2c); this is the
  * driver-mandated engine capability beyond parity. Batch parity of the
  * same aggregation is q26_events_daily (oracle-checked); the streaming
  * job computes the same answer incrementally.
  */
object EventStream {

  /** events.parquet physical schema (ts stored as TIMESTAMP(NANOS),
    * surfaced as long nanos under the legacy read conf). */
  val eventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType), // nanos
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** File-source stream over a directory of event parquet files. */
  def readEvents(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.readStream
      .schema(eventSchema)
      .option("pathGlobFilter", "*.parquet")
      .parquet(dir)
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
  }

  /** Hourly tumbling-window counts per event type with a 1-hour
    * event-time watermark (late data beyond it is dropped). */
  def hourlyCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count("*").as("cnt"), round(sum("value"), 2).as("sv"))
      .select(col("window.start").as("hour"), col("event_type"),
        col("cnt"), col("sv"))

  // ------------------------------------------------------- sessionization
  final case class Event(user_id: Long, tsMicros: Long, event_type: String)
  final case class SessionState(start: Long, last: Long, events: Int)
  final case class Session(
      user_id: Long, start_us: Long, end_us: Long, n_events: Int)

  /** Custom state machine: close a user session after `gapMinutes` of
    * inactivity (KeyValueGroupedDataset.flatMapGroupsWithState — the
    * engine's arbitrary-state surface). Emits closed sessions. */
  def sessionize(
      spark: SparkSession, events: DataFrame, gapMinutes: Int = 30): Dataset[Session] = {
    import spark.implicits._
    val gapUs = gapMinutes * 60L * 1000000L
    events
      .select(col("user_id"),
        unix_micros(col("ts")).as("tsMicros"), col("event_type"))
      .as[Event]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (user: Long, it: Iterator[Event], state: GroupState[SessionState]) =>
          val sorted = it.toSeq.sortBy(_.tsMicros)
          var st = state.getOption.orNull
          val closed = Seq.newBuilder[Session]
          sorted.foreach { e =>
            st match {
              case null =>
                st = SessionState(e.tsMicros, e.tsMicros, 1)
              case s if e.tsMicros - s.last > gapUs =>
                closed += Session(user, s.start, s.last, s.events)
                st = SessionState(e.tsMicros, e.tsMicros, 1)
              case s =>
                st = s.copy(last = e.tsMicros, events = s.events + 1)
            }
          }
          if (st != null) state.update(st)
          closed.result().iterator
      }
  }
}

/** Runnable streaming demo: stages the events parquet into a source dir,
  * runs the windowed aggregation with trigger=AvailableNow into a memory
  * sink, prints the result, and checks it equals the batch answer.
  *
  * Usage: runMain graft.streaming.StreamingDemo [sfDir]
  */
object StreamingDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // stage the single events file as a streaming source directory
    val srcDir = java.nio.file.Files.createTempDirectory("graft-stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfDir/events.parquet"),
      srcDir.resolve("events.parquet"))

    val events = EventStream.readEvents(spark, srcDir.toString)
    val q = EventStream.hourlyCounts(events)
      .writeStream.format("memory").queryName("hourly")
      .outputMode("complete")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)

    val streamed = spark.sql(
      "SELECT count(*) AS buckets, sum(cnt) AS events FROM hourly").collect().head
    println(s"streamed: buckets=${streamed.getLong(0)} events=${streamed.getLong(1)}")

    // batch answer over the same data
    val batch = graft.sources.Tables.load(spark, sfDir, "events")
      .groupBy(window(org.apache.spark.sql.functions.col("ts"), "1 hour"),
        org.apache.spark.sql.functions.col("event_type"))
      .count()
    val b = batch.agg(
      org.apache.spark.sql.functions.count("*").as("buckets"),
      org.apache.spark.sql.functions.sum("count").as("events")).collect().head
    println(s"batch:    buckets=${b.getLong(0)} events=${b.getLong(1)}")
    require(streamed.getLong(0) == b.getLong(0) &&
      streamed.getLong(1) == b.getLong(1), "stream/batch mismatch")
    println("STREAM == BATCH OK")

    // sessionization over the same stream, append mode
    val events2 = EventStream.readEvents(spark, srcDir.toString)
    val s = EventStream.sessionize(spark, events2)
      .writeStream.format("memory").queryName("sessions")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    s.awaitTermination(120000)
    val ns = spark.sql("SELECT count(*) AS c FROM sessions").collect().head.getLong(0)
    println(s"closed sessions: $ns")
    spark.stop()
  }
}
