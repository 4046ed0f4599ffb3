package graft
import org.scalatest.funsuite.AnyFunSuite
class EntrySmoke extends AnyFunSuite {
  test("driver entry contract: entry() returns rows; oracleSql keys subset of queries") {
    val spark = TestSpark.spark
    assert(SparkEntry.entry(spark).count() > 0)
    val qk = SparkEntry.queries.keySet
    val ok = SparkEntry.oracleSql.keySet
    assert(ok.subsetOf(qk), s"oracle keys not in queries: ${ok -- qk}")
    assert(qk.size >= 114 && ok.size >= 108) // round-2 floor
  }
}
