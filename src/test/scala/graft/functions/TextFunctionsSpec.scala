package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.TextFunctions._

class TextFunctionsSpec extends SparkSpec {

  test("langId identifies curated sentences per language") {
    import spark.implicits._
    val samples = Seq(
      ("en", "the cat sat on the mat and it was happy to be in the sun"),
      ("de", "der hund und die katze sind nicht mit dem auto zu dem haus gefahren"),
      ("es", "el perro y la gata se fueron de la casa por los caminos del pueblo"),
      ("fr", "le chien et la chatte sont dans les jardins pour une promenade du soir"),
      ("zh", "今天天气很好我们一起去公园散步"),
      ("unknown", "xyzzy plugh foobar qux"))
    val out = samples.toDF("expected", "text")
      .withColumn("pred", langId(col("text")))
      .collect()
    out.foreach(r => assert(r.getString(2) === r.getString(0),
      s"text='${r.getString(1).take(30)}…'"))
  }

  test("tokenCount and bpeish token counts") {
    import spark.implicits._
    val df = Seq("Hello, world! This is a test.").toDF("t")
    assert(df.select(tokenCount(col("t"))).head.getInt(0) === 6)
    // words: hello world this is a test (6) + symbols , ! . (3) = 9
    assert(df.select(size(bpeishTokens(col("t")))).head.getInt(0) === 9)
  }

  test("qualityScore in [0,1]; clean prose scores higher than garbage") {
    import spark.implicits._
    val df = Seq(
      ("clean", "the quick brown fox jumps over the lazy dog and it was a good day for all of them in the field"),
      ("garbage", "!!! ??? ,,, ... ;;; ::: !!!")).toDF("k", "t")
    val m = df.select(col("k"), qualityScore(col("t"))).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(m.values.forall(v => v >= 0.0 && v <= 1.0))
    assert(m("clean") > m("garbage"))
  }

  test("fingerprint is order-sensitive and deterministic") {
    import spark.implicits._
    val df = Seq("a b c", "c b a", "a b c").toDF("t")
      .select(fingerprint(tokens(col("t"))).as("fp"))
    val fps = df.as[Long].collect()
    assert(fps(0) === fps(2))
    assert(fps(0) !== fps(1))
    assert(fps.forall(f => f >= 0 && f < 2147483647L))
  }
}
