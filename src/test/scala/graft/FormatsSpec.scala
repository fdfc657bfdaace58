package graft

import org.apache.spark.sql.functions._

/** Source/sink format parity: the engine standardizes on parquet but reads
  * and writes CSV (reference's format), JSON lines (REST landing format),
  * and ORC identically — same rows through every format. */
class FormatsSpec extends SparkSpec {

  test("parquet / csv / json / orc round-trips agree") {
    val base = java.nio.file.Files.createTempDirectory("graft_fmt").toString
    val src = Tables.events(spark, "/root/testdata/sf0.001")
      .select("event_id", "ts", "user_id", "event_type", "value")
      .limit(500)

    // CSV's default timestampFormat is millisecond-precision; our events
    // carry micros — pin a micros format for lossless text round-trip
    val tsFmt = "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"
    src.write.parquet(s"$base/p")
    src.write.option("header", "true").option("timestampFormat", tsFmt).csv(s"$base/c")
    src.write.option("timestampFormat", tsFmt).json(s"$base/j")
    src.write.orc(s"$base/o")

    val p = spark.read.parquet(s"$base/p")
    val c = spark.read.option("header", "true").option("timestampFormat", tsFmt)
      .schema(src.schema).csv(s"$base/c")
    val j = spark.read.option("timestampFormat", tsFmt).schema(src.schema).json(s"$base/j")
    val o = spark.read.orc(s"$base/o")

    def canon(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("event_id").collect()
        .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2), r.getString(3), r.getDouble(4)))
    val expect = canon(p)
    assert(expect.length == 500)
    assert(canon(c).sameElements(expect), "csv mismatch")
    assert(canon(j).sameElements(expect), "json mismatch")
    assert(canon(o).sameElements(expect), "orc mismatch")
  }

  test("events ts normalization: int64-nanos / NTZ / UTC / INT96 physical " +
       "types all read identically (the round-5 drift, pinned)") {
    // The driver's parquet generation has shifted the events `ts` physical
    // type across rounds (TIMESTAMP(NANOS)→nanos-as-long, TIMESTAMP(MICROS)
    // NTZ, UTC timestamp); round 5 lost 79/167 bench queries to exactly this
    // drift. Write one fixture per physical type from the same rows and
    // assert Tables.events normalizes every variant to identical frames.
    val base = java.nio.file.Files.createTempDirectory("graft_evts").toString
    val src = Tables.events(spark, "/root/testdata/sf0.001")
      .select("event_id", "ts", "user_id", "event_type", "value")
      .orderBy("event_id").limit(200)

    import org.apache.spark.sql.types.TimestampNTZType
    // (a) plain int64 epoch nanoseconds (what nanosAsLong surfaces for a
    //     TIMESTAMP(NANOS)-annotated column — Spark cannot author that
    //     annotation itself, so the long column exercises the same branch)
    src.withColumn("ts", expr("unix_micros(ts) * 1000L"))
      .write.parquet(s"$base/nanos/events.parquet")
    // (b) TIMESTAMP_NTZ → parquet TIMESTAMP(MICROS) isAdjustedToUTC=false
    src.withColumn("ts", col("ts").cast(TimestampNTZType))
      .write.parquet(s"$base/ntz/events.parquet")
    // (c) UTC-adjusted TIMESTAMP(MICROS)  (d) legacy INT96
    val prev = spark.conf.getOption("spark.sql.parquet.outputTimestampType")
    try {
      spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      src.write.parquet(s"$base/utc/events.parquet")
      spark.conf.set("spark.sql.parquet.outputTimestampType", "INT96")
      src.write.parquet(s"$base/int96/events.parquet")
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.parquet.outputTimestampType", v)
      case None => spark.conf.unset("spark.sql.parquet.outputTimestampType")
    }

    def canon(dir: String) =
      Tables.events(spark, dir).orderBy("event_id").collect()
        .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2),
          r.getString(3), r.getDouble(4)))
    val expect = src.collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2),
        r.getString(3), r.getDouble(4)))
    assert(expect.length == 200)
    assert(canon(s"$base/nanos").sameElements(expect), "nanos-as-long mismatch")
    assert(canon(s"$base/ntz").sameElements(expect), "TIMESTAMP_NTZ mismatch")
    assert(canon(s"$base/utc").sameElements(expect), "UTC timestamp mismatch")
    assert(canon(s"$base/int96").sameElements(expect), "INT96 mismatch")
  }

  test("events ts normalization refuses an int64 column that can't be nanos") {
    // A plain int64 storing epoch MILLIS/MICROS would be silently mis-scaled
    // 1000x by the nanos assumption (ADVICE r6) — the guard raises instead.
    val base = java.nio.file.Files.createTempDirectory("graft_evbad").toString
    Tables.events(spark, "/root/testdata/sf0.001")
      .select("event_id", "ts", "user_id", "event_type", "value").limit(50)
      .withColumn("ts", expr("unix_millis(ts)"))
      .write.parquet(s"$base/events.parquet")
    val e = intercept[Exception] {
      Tables.events(spark, base).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("too small to be epoch nanoseconds")))

    // …but an epoch-adjacent SENTINEL (ts = 0) inside an otherwise-genuine
    // nanos file must NOT fail the whole table — the guard targets the
    // seconds/millis/micros magnitude band, not every small value
    val base2 = java.nio.file.Files.createTempDirectory("graft_evsent").toString
    import spark.implicits._
    Seq((1L, 1700000000000000000L, 5L, "view", 1.0),
        (2L, 0L, 6L, "view", 2.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.parquet(s"$base2/events.parquet")
    val rows = Tables.events(spark, base2).orderBy("event_id").collect()
    assert(rows(0).getTimestamp(1).getTime == 1700000000000L)
    assert(rows(1).getTimestamp(1).getTime == 0L) // sentinel → epoch
  }

  test("malformed JSON rows land as nulls under the declared schema (coerce)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_badjson").toString
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$dir/a.json"),
      """{"event_id": 1, "value": 5.0}
        |not json at all
        |{"event_id": 2, "value": "not-a-number"}
        |""".stripMargin)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("event_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("value", org.apache.spark.sql.types.DoubleType)))
    val df = spark.read.schema(schema).json(dir)
    assert(df.count() == 3)
    assert(df.filter(col("event_id") === 1 && col("value") === 5.0).count() == 1)
    // PERMISSIVE default: unparseable rows/fields → null
    assert(df.filter(col("event_id").isNull).count() >= 1)
  }

  test("parquet schema evolution: mergeSchema unions columns across batches") {
    val dir = java.nio.file.Files.createTempDirectory("graft_evolve").toString
    import spark.implicits._
    // batch 1: (id, a); batch 2 adds column b — the standard additive
    // evolution a long-lived lake table accumulates
    Seq((1L, "x"), (2L, "y")).toDF("id", "a")
      .write.parquet(s"$dir/b=1")
    Seq((3L, "z", 30.0)).toDF("id", "a", "bval")
      .write.parquet(s"$dir/b=2")
    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(merged.columns.toSet == Set("id", "a", "bval", "b"))
    assert(merged.count() == 3)
    // old-batch rows surface the new column as null, not an error
    assert(merged.filter(col("bval").isNull).count() == 2)
    assert(merged.filter(col("bval") === 30.0).select("id").head().getLong(0) == 3L)
    // explicit-schema read (the declared-catalog path) also sees old files
    val declared = spark.read.schema("id BIGINT, a STRING, bval DOUBLE")
      .parquet(s"$dir/b=1")
    assert(declared.count() == 2 && declared.filter(col("bval").isNull).count() == 2)
  }
}
