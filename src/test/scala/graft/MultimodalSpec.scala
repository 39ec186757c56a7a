package graft

import graft.catalog.Catalog
import graft.exprs.Getenv
import graft.ops.Multimodal
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val dir = "/root/testdata/sf0.001"

  test("media table: binary payload + typed metadata") {
    val mt = Multimodal.mediaTable(spark, dir)
    val row = mt.filter(_.doc_id == 0).collect().head
    assert(row.media_type == "image" && row.meta.format == "png")
    assert(row.payload.length.toLong == row.meta.nBytes)
    val types = mt.toDF().schema("payload").dataType.simpleString
    assert(types == "binary")
  }

  test("decode stub: mean/max byte statistics are exact") {
    val feats = Multimodal.imageFeatures(spark, dir)
    val docs = Tables.t(spark, dir, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val f0 = feats.filter("doc_id = 0").collect().head
    val bytes = docs(0L).getBytes("UTF-8")
    val expectedMean = math.round(bytes.map(_ & 0xff).sum.toDouble / bytes.length * 10000) / 10000.0
    assert(f0.getAs[Double]("mean_byte") == expectedMean)
    assert(f0.getAs[Int]("max_byte") == bytes.map(_ & 0xff).max)
    assert(f0.getAs[Long]("n_bytes") == bytes.length.toLong)
  }

  test("PPM codec: real encode/decode round trip, comments, loud corruption errors") {
    import graft.ops.Multimodal.PpmCodec
    val pixels = Array.tabulate(3 * 4 * 2)(i => (i * 7 % 256).toByte)
    val payload = PpmCodec.encode(4, 2, pixels)
    assert(new String(payload.take(2)) == "P6")
    val (w, h, raster) = PpmCodec.decode(payload)
    assert(w == 4 && h == 2)
    assert(raster.toSeq == pixels.toSeq)
    // header comments per the PPM spec
    val commented = "P6\n# made by a test\n4 2\n255\n".getBytes("US-ASCII") ++ pixels
    assert(PpmCodec.decode(commented)._3.toSeq == pixels.toSeq)
    // corruption fails loudly
    assert(intercept[IllegalArgumentException] {
      PpmCodec.decode("P5\n4 2\n255\n".getBytes("US-ASCII") ++ pixels)
    }.getMessage.contains("magic"))
    assert(intercept[IllegalArgumentException] {
      PpmCodec.decode(payload.dropRight(5))
    }.getMessage.contains("truncated"))
  }

  test("frame sampling: stride applied per-row before explode") {
    val frames = Multimodal.frameSample(spark, dir, stride = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1)))
    assert(frames.nonEmpty)
    assert(frames.forall { case (id, f) => id % 3 == 2 && f % 2 == 0 })
  }

  test("resize halves dimensions and payload deterministically") {
    val r = Multimodal.resize(spark, dir, maxDim = 64).filter("doc_id = 0").collect().head
    assert(r.getAs[Int]("width") <= 640 && r.getAs[Long]("n_bytes") > 0)
  }

  test("catalog columns + JSON schema document") {
    val s2 = spark.newSession()
    Tables.registerAll(s2, dir)
    val cols = Catalog.columns(s2)
      .filter("table_name = 'embeddings'").collect()
    assert(cols.map(r => (r.getString(1), r.getString(3))).toSeq ==
      Seq(("vec_id", "BIGINT"), ("embedding", "FLOAT[]"), ("label", "INTEGER")))
    val json = Catalog.schemaJson(s2)
    assert(json.contains("\"databases\"") && json.contains("\"lineitem\""))
  }

  test("schema JSON carries comments, view definitions, empty enums (duckdb_schema_test.go:18-117)") {
    val s2 = spark.newSession()
    val runId = java.lang.Long.toString(System.nanoTime(), 36)
    val tbl = s"sch_users_$runId"
    val vw = s"sch_active_$runId"
    s2.sql(s"CREATE TABLE $tbl (id INT, name STRING COMMENT 'The user''s full name') " +
      "USING PARQUET COMMENT 'A table of users'")
    s2.sql(s"CREATE VIEW $vw AS SELECT * FROM $tbl WHERE name IS NOT NULL")
    try {
      val json = Catalog.schemaJson(s2)
      assert(json.contains("A table of users"))
      assert(json.contains("The user's full name"))
      assert(json.contains(s""""name":"$vw""""))
      // view definition captured and recognizable as SQL
      assert(json.contains("SELECT"))
      assert(json.contains("\"enums\":[]"))
    } finally {
      s2.sql(s"DROP VIEW IF EXISTS $vw")
      s2.sql(s"DROP TABLE IF EXISTS $tbl")
    }
  }

  test("getenv UDF gated by init window (util/duckdb.go:14-57)") {
    val s2 = spark.newSession()
    Getenv.register(s2)
    // outside init: empty
    assert(s2.sql("SELECT getenv('PATH') AS v").collect().head.getString(0) == "")
    // inside init: real value
    val v = Getenv.withEnabled {
      s2.sql("SELECT getenv('PATH') AS v").collect().head.getString(0)
    }
    assert(v.nonEmpty)
  }
}
