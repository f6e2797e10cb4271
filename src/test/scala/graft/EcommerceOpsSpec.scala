package graft

import graft.operators.EcommerceOps
import org.apache.spark.sql.functions._

/** Parity-sensitive transform semantics (SURVEY.md §5.2.3, §7.3): exact
  * Python str(dict) rendering with zip truncation, list-index NULL past the
  * end, TZ strip, as-executed NaN stringification. */
class EcommerceOpsSpec extends SparkSpec {
  import spark.implicits._

  private def render(code: String): String =
    Seq(code).toDF("c").select(EcommerceOps.pyDictRender(col("c"))).as[String].head()

  test("pyDictRender matches CPython dict repr for 2/3/4-part codes") {
    assert(render("a.b") === "{'category': 'a', 'sub_category': 'b'}")
    assert(render("a.b.c") === "{'category': 'a', 'sub_category': 'b', 'product': 'c'}")
    assert(render("a.b.c.d") ===
      "{'category': 'a', 'sub_category': 'b', 'product': 'c', 'product_details': 'd'}")
  }

  test("pyDictRender truncates like zip for 1-part codes") {
    assert(render("solo") === "{'category': 'solo'}")
  }

  test("categoryColumns yields NULL past the end (Python list-append parity)") {
    val row = Seq("a.b.c").toDF("c")
      .select(EcommerceOps.categoryColumns(col("c")).map { case (n, e) => e.as(n) }: _*)
      .as[(Option[String], Option[String], Option[String], Option[String])].head()
    assert(row === ((Some("a"), Some("b"), Some("c"), None)))
  }

  test("normalizeEventTime strips both wire suffixes") {
    val out = Seq("2019-11-01 09:00:05 UTC", "2019-11-01 09:00:05 +00:00 UTC")
      .toDF("t").select(EcommerceOps.normalizeEventTime(col("t")).cast("string"))
      .as[String].collect()
    assert(out.toSeq === Seq("2019-11-01 09:00:05", "2019-11-01 09:00:05"))
  }

  test("hourFromString slices bytes 12-13 like int(ts[11:13])") {
    val h = Seq("2019-11-01 23:59:59 UTC").toDF("t")
      .select(EcommerceOps.hourFromString(col("t"))).as[Int].head()
    assert(h === 23)
  }

  test("brandAsExecuted preserves the astype-before-fillna bug; fillBrand is the intended fix") {
    val df = Seq(Some("apple"), None).toDF("b")
    assert(df.select(EcommerceOps.brandAsExecuted(col("b"))).as[String].collect().toSeq
      === Seq("apple", "nan"))
    assert(df.select(EcommerceOps.fillBrand(col("b"))).as[String].collect().toSeq
      === Seq("apple", "Not Specified"))
  }

  test("message codec round-trips space-free values (S4/S5)") {
    val df = Seq(("42", "view", "u7")).toDF("a", "b", "c")
    val enc = df.select(EcommerceOps.encodeMessage(Seq(col("a"), col("b"), col("c"))).as("m"))
    val dec = enc.select(
      EcommerceOps.decodeField(col("m"), 1),
      EcommerceOps.decodeField(col("m"), 2),
      EcommerceOps.decodeField(col("m"), 3))
      .as[(String, String, String)].head()
    assert(dec === (("42", "view", "u7")))
  }

  test("batchTransform produces stringified columns plus record_id") {
    val events = Seq(
      ("2019-11-01 09:00:00 UTC", "view", "p1", "c1", "electronics.phone", "apple", 99.9, "u1", "s1"))
      .toDF("event_time", "event_type", "product_id", "category_id",
        "category_code", "brand", "price", "user_id", "user_session")
    val out = EcommerceOps.batchTransform(events)
    assert(out.columns.contains("record_id"))
    val cc = out.select("category_code").as[String].head()
    assert(cc === "{'category': 'electronics', 'sub_category': 'phone'}")
    assert(out.schema.filter(_.name != "record_id").forall(_.dataType.typeName == "string"))
  }
}
