package graft.dev

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.functions.{TextFunctions => TF}

/** Dev-only stage profiler for m5_jaccard_inverted: times each
  * sub-plan's materialization at the given SF dir so optimization is
  * measurement-driven, not guessed. Not part of the query contract.
  */
object M5Probe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"$label%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s  rows=$n")
    }
    val shingleHashes = TF.shingleHashes(col("text"))

    // warm-up
    Tables.documents(spark, d).count()

    val sh = Tables.documents(spark, d)
      .withColumn("wh", TF.wordHashes(col("text")))
      .where(size(col("wh")) >= 3)
      .select(col("doc_id"), col("lang"), col("source"),
        array_distinct(shingleHashes).as("sh"))
      .withColumn("sz", size(col("sh")))
    t("sh")(sh.count())
    val posts = sh.select(col("lang"), col("source"), col("doc_id"),
      col("sz"), explode(col("sh")).as("shingle"))
    t("posts")(posts.count())
    val dfreq = posts.groupBy("lang", "source", "shingle")
      .agg(count(lit(1)).as("df"))
    t("dfreq")(dfreq.count())
    val joined = posts.join(dfreq, Seq("lang", "source", "shingle"))
    t("posts_x_dfreq")(joined.count())
    val byRarity = Window.partitionBy("doc_id").orderBy(col("df"), col("shingle"))
    val prefix = joined.withColumn("rn", row_number().over(byRarity))
      .where(col("rn") <= col("sz") - ceil(col("sz") * lit(0.2)).cast("int") + 1)
    t("prefix(window)")(prefix.count())
    val lists = prefix.groupBy("lang", "source", "shingle")
      .agg(array_sort(collect_list(col("doc_id"))).as("ids"))
      .where(size(col("ids")) >= 2)
    t("lists")(lists.count())
    val cand = lists.select(explode(expr(
        """flatten(transform(ids, (x, i) ->
          |  transform(slice(ids, i + 2, size(ids) - i - 1),
          |    y -> named_struct('id_a', x, 'id_b', y))))""".stripMargin)).as("p"))
      .select(col("p.id_a").as("id_a"), col("p.id_b").as("id_b"))
      .distinct()
    t("cand")(cand.count())
    val a = sh.select(col("doc_id").as("id_a"), col("sh").as("sh_a"))
    val b = sh.select(col("doc_id").as("id_b"), col("sh").as("sh_b"))
    val out = cand.join(a, "id_a").join(b, "id_b")
      .withColumn("inter",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double"))
      .withColumn("jac", col("inter") /
        (size(col("sh_a")) + size(col("sh_b")) - col("inter")))
      .where(col("jac") >= 0.2)
      .select(col("id_a"), col("id_b"), round(col("jac"), 6).as("jaccard"))
      .orderBy("id_a", "id_b")
    t("verify+sort (full)")(out.count())
    t("full second run")(out.count())
    spark.stop()
  }
}
