package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Round-11 pins: Avro corrupt-container quarantine, quantizer
  * retraining on drift, recall-targeted search.
  */
class Round11Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  // ------------------------------------------------------- avrograft

  private def stageCorruptAvroDir(): (String, Long) = {
    val sess = spark
    import sess.implicits._
    val dir = graft.util.TempDirs.create("graft_avro_q").toString
    (0L until 100L).map(i => (i, s"doc$i")).toDF("id", "name")
      .coalesce(1).write.mode("overwrite").format("avrograft")
      .option("syncInterval", "256").save(dir)
    val clean = spark.read.format("avrograft").load(dir).count()
    assert(clean == 100)
    // a container truncated mid-block (valid header, torn data): the
    // first 70% of a valid file's bytes
    val f = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".avro")).head
    val bytes = java.nio.file.Files.readAllBytes(f.toPath)
    java.nio.file.Files.write(
      new java.io.File(dir, "part-zz-truncated.avro").toPath,
      java.util.Arrays.copyOfRange(bytes, 0, bytes.length * 7 / 10))
    // a container whose header itself is garbage — and it SORTS FIRST,
    // so permissive schema inference must skip past it too
    java.nio.file.Files.write(
      new java.io.File(dir, "part-aa-garbage.avro").toPath,
      Array.fill[Byte](256)(0x5A))
    (dir, clean)
  }

  test("avrograft FAILFAST (default) dies loudly on a corrupt container") {
    val (dir, _) = stageCorruptAvroDir()
    intercept[Exception] {
      spark.read.format("avrograft").load(dir).count()
    }
  }

  test("avrograft PERMISSIVE quarantines corrupt containers, keeps clean rows") {
    val (dir, clean) = stageCorruptAvroDir()
    val perm = spark.read.format("avrograft")
      .option("mode", "permissive").load(dir)
    val n = perm.count()
    // all clean rows + a (possibly empty) decoded prefix of the
    // truncated container; the garbage-header file contributes zero
    assert(n >= clean && n < 2 * clean,
      s"expected [$clean, ${2 * clean}) rows, got $n")
    // every clean id survived (the truncated file can only duplicate a
    // prefix of them, never remove any)
    val counts = perm.groupBy("id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    (0L until clean).foreach { i =>
      assert(counts.getOrElse(i, 0L) >= 1L, s"clean id $i lost")
    }
    // prefix semantics: duplicated ids (from the truncated copy) are a
    // contiguous prefix of the clean id order written above
    val dup = counts.filter(_._2 > 1).keys.toSeq.sorted
    assert(dup == (0L until dup.length.toLong),
      s"truncated container must yield a record PREFIX, got $dup")
  }

  test("avrograft PERMISSIVE on clean files matches default mode exactly") {
    val sess = spark
    import sess.implicits._
    val dir = graft.util.TempDirs.create("graft_avro_clean").toString
    (0L until 50L).map(i => (i, i * 2.5)).toDF("id", "x")
      .write.mode("overwrite").format("avrograft").save(dir)
    val a = spark.read.format("avrograft").load(dir)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).sortBy(_._1).toSeq
    val b = spark.read.format("avrograft").option("mode", "permissive")
      .load(dir)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).sortBy(_._1).toSeq
    assert(a == b)
  }
}
