package graft

import java.nio.file.Files

import graft.ingest.AgriPipeline
import org.apache.spark.sql.functions._

/** Layer-A parity over the reference-shaped fixture: RFC-4180 quoted
  * fields, day-first dates with invalid entries, numeric coercion,
  * null-key filtering, natural-key dedup, partitioned layout
  * (edge cases from SURVEY.md §1.2 / FIXTURES.md).
  */
class AgriPipelineSpec extends SparkSpec {

  private def fixture = getClass.getResource("/agri_fixture.csv").getPath

  test("CSV read preserves quoted commas (RFC-4180)") {
    val raw = AgriPipeline.readCsv(spark, fixture)
    assert(raw.count() === 10)
    val markets = raw.select("Market").collect().map(_.getString(0)).toSet
    assert(markets.contains("Binny Mill (F&V), Bangalore"))
  }

  test("normalize: day-first dates parse, invalid dates coerce to null") {
    val n = AgriPipeline.normalize(AgriPipeline.readCsv(spark, fixture))
    val jan15 = n.filter(col("commodity") === "Apple").select("arrival_date").head().getDate(0)
    assert(jan15.toString === "2020-01-15") // 15/01/2020 parsed day-first
    // 31/02/2020 and 30/02/2020 are invalid -> null
    assert(n.filter(col("arrival_date").isNull).count() === 2)
    // leap day 29/02/2020 is valid
    assert(n.filter(col("arrival_date") === "2020-02-29").count() === 1)
  }

  test("normalize: numeric coercion nulls bad values, keeps decimals") {
    val n = AgriPipeline.normalize(AgriPipeline.readCsv(spark, fixture))
    val onion = n.filter(col("commodity") === "Onion").orderBy("arrival_date")
    val good = onion.head()
    assert(good.getAs[Double]("min_price") === 900.5)
    assert(good.getAs[Double]("modal_price") === 1050.25)
    // "N/A" min price and empty modal price -> null
    assert(n.filter(col("min_price").isNull && col("commodity") === "Onion").count() === 1)
  }

  test("dropInvalid drops rows lacking commodity or modal price (A7)") {
    val n = AgriPipeline.normalize(AgriPipeline.readCsv(spark, fixture))
    val kept = AgriPipeline.dropInvalid(n)
    assert(n.count() === 10)
    assert(kept.count() === 8) // one null-commodity row, one null-modal-price row
  }

  test("natural-key dedup keeps one row per key, deterministically") {
    val cleaned = AgriPipeline.dropInvalid(
      AgriPipeline.normalize(AgriPipeline.readCsv(spark, fixture)))
    val deduped = AgriPipeline.dedupNaturalKey(cleaned)
    assert(deduped.count() === 7) // the duplicated Apple row collapses
    assert(deduped.filter(col("commodity") === "Apple").count() === 1)
  }

  test("safe_name key normalization matches the reference (A9)") {
    val n = AgriPipeline.normalize(AgriPipeline.readCsv(spark, fixture))
    val keys = n.select("commodity", "commodity_key").distinct().collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(keys("Paddy(Dhan)(Common)") === "paddydhancommon")
    assert(keys("Banana - Green") === "banana_-_green")
    assert(keys("Green Chilli") === "green_chilli")
  }

  test("JSON page decode with explicit schema (A4)") {
    val tmp = java.nio.file.Files.createTempDirectory("agri_json")
    val page = """{"State":"Odisha","District":"Angul","Market":"Angul","Commodity":"Egg","Variety":"Other","Grade":"FAQ","Arrival_Date":"07/06/2021","Min_Price":"550","Max_Price":"600","Modal_Price":"575","Commodity_Code":"367"}
      |{"State":"Kerala","District":"Idukki","Market":"Munnar","Commodity":"Cardamoms","Variety":"Other","Grade":"Small","Arrival_Date":"31/11/2021","Min_Price":"n/a","Max_Price":"1500","Modal_Price":"1450.5","Commodity_Code":"110"}""".stripMargin
    java.nio.file.Files.writeString(tmp.resolve("page0.json"), page)
    val n = AgriPipeline.normalize(AgriPipeline.readJson(spark, tmp.toString))
    val rows = n.orderBy("commodity").collect()
    assert(rows.length === 2)
    assert(rows(1).getAs[java.sql.Date]("arrival_date").toString === "2021-06-07")
    assert(rows(0).isNullAt(rows(0).fieldIndex("arrival_date"))) // 31/11 invalid
    assert(rows(0).isNullAt(rows(0).fieldIndex("min_price")))    // "n/a"
    assert(rows(0).getAs[Double]("modal_price") === 1450.5)
  }

  test("partitioned write produces dir-per-commodity layout (A8/A10)") {
    val out = Files.createTempDirectory("agri_out").toString
    val n = AgriPipeline.runBatch(spark, fixture, out)
    assert(n === 7)
    val dirs = new java.io.File(out).listFiles().filter(_.isDirectory).map(_.getName).toSet
    assert(dirs.contains("commodity_key=apple"))
    assert(dirs.contains("commodity_key=onion"))
    // partition column round-trips on read
    val back = spark.read.parquet(out)
    assert(back.filter(col("commodity_key") === "apple").count() === 1)
  }
}
