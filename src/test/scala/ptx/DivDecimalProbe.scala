package ptx
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
class DivDecimalProbe extends AnyFunSuite {
  test("div accepts decimal operands and returns long") {
    val s = TestSpark.spark
    val df = s.sql("SELECT (2 * cast(7 as decimal(38,0)) * 10000 + 3) div (2 * 3) as q")
    df.printSchema()
    val v = df.collect()(0)
    println("RESULT=" + v + " type=" + df.schema("q").dataType)
    assert(v.getLong(0) == (2L*7*10000+3)/(2*3))
  }
}
