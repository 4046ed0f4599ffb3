package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import graft.server.{HttpFacade, Json}

/** Round-trips the reference coordinator's REST semantics
  * (`coordinator/coordinator_server.py`) against the facade.
  */
class HttpFacadeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private lazy val fstore: graft.store.VectorStore = {
    val dir = java.nio.file.Files.createTempDirectory("graft_http").toString
    graft.store.VectorStore.build(spark,
      Tables.embeddings(spark, TestSpark.sf)
        .select(col("vec_id").as("id"), col("embedding")),
      s"$dir/index", graft.lsh.LshConfig(dim = 64, seed = 42L))
  }

  private lazy val facade: HttpFacade =
    new HttpFacade(spark, fstore, port = 0).start()

  private lazy val client = HttpClient.newHttpClient()

  private def get(path: String): (Int, Any) = {
    val r = client.send(
      HttpRequest.newBuilder(
        URI.create(s"http://127.0.0.1:${facade.boundPort}$path")).GET().build(),
      HttpResponse.BodyHandlers.ofString())
    (r.statusCode(), Json.parse(r.body()))
  }

  private def post(path: String, body: String): (Int, Any) = {
    val r = client.send(
      HttpRequest.newBuilder(
        URI.create(s"http://127.0.0.1:${facade.boundPort}$path"))
        .POST(HttpRequest.BodyPublishers.ofString(body))
        .header("Content-Type", "application/json").build(),
      HttpResponse.BodyHandlers.ofString())
    (r.statusCode(), Json.parse(r.body()))
  }

  private def obj(v: Any) = v.asInstanceOf[Map[String, Any]]

  test("GET /health") {
    val (code, body) = get("/health")
    assert(code == 200 && obj(body)("status") == "healthy")
  }

  test("POST /search: 1-D query reshapes, k clamps, self at distance 0") {
    val q = graft.queries.VectorQueries.qvec(spark, TestSpark.sf, 0)
    val qj = q.mkString("[", ",", "]")
    val (code, body) = post("/search", s"""{"query_vector": $qj, "k": 3}""")
    assert(code == 200)
    val m = obj(body)
    assert(m("status") == "success")
    val indices = m("indices").asInstanceOf[Vector[Vector[Any]]]
    val dists = m("distances").asInstanceOf[Vector[Vector[Any]]]
    assert(indices.size == 1 && indices.head.size == 3)
    assert(indices.head.head.asInstanceOf[Double] == 0.0) // vec_id 0 itself
    assert(dists.head.head.asInstanceOf[Double] == 0.0)
    // k <= 0 clamps to 1 (coordinator_server.py:99-103)
    val (c2, b2) = post("/search", s"""{"query_vector": $qj, "k": 0}""")
    assert(c2 == 200 &&
      obj(b2)("indices").asInstanceOf[Vector[Vector[Any]]].head.size == 1)
  }

  test("POST /search: min_recall drives probes off the persisted measured curve") {
    val q = graft.queries.VectorQueries.qvec(spark, TestSpark.sf, 0)
    val qj = q.mkString("[", ", ", "]")
    // no persisted curve → conservative: exact search over every bucket
    graft.util.FsIo.delete(s"${fstore.path}/_recall_curve.json")
    val (c0, b0) = post("/search",
      s"""{"query_vector": $qj, "k": 3, "min_recall": 0.5}""")
    assert(c0 == 200 &&
      obj(b0)("probes").asInstanceOf[Double].toInt == fstore.model.numBuckets)
    // audit the curve, then the facade's choice must equal the store's
    // and the results must equal searching at that depth directly
    val panel = (0L until 5L)
      .map(graft.queries.VectorQueries.qvec(spark, TestSpark.sf, _))
    fstore.auditRecallCurve(panel, k = 10)
    val p = fstore.probesForRecall(0.5)
    val (c1, b1) = post("/search",
      s"""{"query_vector": $qj, "k": 3, "min_recall": 0.5}""")
    assert(c1 == 200 && obj(b1)("probes").asInstanceOf[Double].toInt == p)
    val got = obj(b1)("indices").asInstanceOf[Vector[Vector[Any]]]
      .head.map(_.asInstanceOf[Double].toLong)
    val want = fstore.search(q, 3, p).collect().map(_.getLong(0)).toVector
    assert(got == want)
    // explicit probes override, clamped into [1, numBuckets]
    val (c2, b2) = post("/search",
      s"""{"query_vector": $qj, "k": 3, "probes": 99}""")
    assert(c2 == 200 &&
      obj(b2)("probes").asInstanceOf[Double].toInt == fstore.model.numBuckets)
  }

  test("POST /search: missing fields give the reference's 400s") {
    val (c1, b1) = post("/search", """{"k": 5}""")
    assert(c1 == 400 && obj(b1)("error") == "No query vector provided")
    val (c2, b2) = post("/search", """{"query_vector": [1.0]}""")
    assert(c2 == 400 && obj(b2)("error") == "No k value provided")
  }

  test("POST /add_vectors with explicit ids, then search finds them") {
    val q = graft.queries.VectorQueries.qvec(spark, TestSpark.sf, 0)
    val qj = q.mkString("[", ",", "]")
    val (code, body) = post("/add_vectors",
      s"""{"vectors": [$qj], "ids": [777000]}""")
    assert(code == 200)
    val m = obj(body)
    assert(m("status") == "success" &&
      m("total_vectors").asInstanceOf[Double] == 501.0)
    val (_, sb) = post("/search", s"""{"query_vector": $qj, "k": 2}""")
    val ids = obj(sb)("indices").asInstanceOf[Vector[Vector[Any]]]
      .head.map(_.asInstanceOf[Double].toLong).toSet
    assert(ids == Set(0L, 777000L), s"dup of vec 0 should tie at d=0: $ids")
  }

  test("POST /add_vectors without ids auto-assigns sequential ids") {
    val q = graft.queries.VectorQueries.qvec(spark, TestSpark.sf, 1)
    val qj = q.mkString("[", ",", "]")
    val (code, body) = post("/add_vectors", s"""{"vectors": [$qj, $qj]}""")
    assert(code == 200)
    assert(obj(body)("total_vectors").asInstanceOf[Double] == 503.0)
    val (c2, b2) = post("/add_vectors", """{}""")
    assert(c2 == 400 && obj(b2)("error") == "No vectors provided")
  }

  test("GET /stats returns the coordinator stats record per bucket") {
    val (code, body) = get("/stats")
    assert(code == 200)
    val m = obj(body)
    assert(m("sharding_strategy") == "lsh")
    assert(m("total_nodes").asInstanceOf[Double] == 3.0)
    val nodes = obj(m("nodes"))
    assert(nodes.nonEmpty && nodes.keys.forall(_.startsWith("bucket=")))
    val counts = nodes.values.map(n => obj(n)("vector_count")
      .asInstanceOf[Double]).sum
    assert(counts >= 500.0)
  }

  test("concurrency: 10-thread add+search load loses no update, keeps shapes") {
    // Own store + facade: the shared one is mutated by earlier tests.
    val dir = java.nio.file.Files.createTempDirectory("graft_http_conc").toString
    val store = graft.store.VectorStore.build(spark,
      Tables.embeddings(spark, TestSpark.sf)
        .select(col("vec_id").as("id"), col("embedding")),
      s"$dir/index", graft.lsh.LshConfig(dim = 64, seed = 7L))
    val f2 = new HttpFacade(spark, store, port = 0).start()
    def post2(path: String, body: String): (Int, Any) = {
      val r = client.send(
        HttpRequest.newBuilder(
          URI.create(s"http://127.0.0.1:${f2.boundPort}$path"))
          .POST(HttpRequest.BodyPublishers.ofString(body))
          .header("Content-Type", "application/json").build(),
        HttpResponse.BodyHandlers.ofString())
      (r.statusCode(), Json.parse(r.body()))
    }
    try {
      val q = graft.queries.VectorQueries.qvec(spark, TestSpark.sf, 0)
      val qj = q.mkString("[", ",", "]")
      val pool = java.util.concurrent.Executors.newFixedThreadPool(10)
      val futures = (0 until 10).map { t =>
        pool.submit(new java.util.concurrent.Callable[Seq[String]] {
          def call(): Seq[String] = (0 until 3).flatMap { i =>
            val errs = scala.collection.mutable.Buffer.empty[String]
            val id = 900000 + t * 10 + i
            val (ca, ba) = post2("/add_vectors",
              s"""{"vectors": [$qj], "ids": [$id]}""")
            if (ca != 200) errs += s"add($id) -> $ca: $ba"
            // k alternates over {-1, 0, 3}: clamp must hold under load
            val k = Seq(-1, 0, 3)(i)
            val (cs, bs) = post2("/search",
              s"""{"query_vector": $qj, "k": $k}""")
            if (cs != 200) errs += s"search(k=$k) -> $cs: $bs"
            else {
              val idx = obj(bs)("indices").asInstanceOf[Vector[Vector[Any]]]
              val want = math.max(1, k)
              if (idx.size != 1 || idx.head.size != want)
                errs += s"search(k=$k) returned shape ${idx.map(_.size)}"
            }
            // the reference's 400 shapes must survive concurrent load too
            val (ce, be) = post2("/search", """{"k": 1}""")
            if (ce != 400 || obj(be)("error") != "No query vector provided")
              errs += s"missing-vector 400 broke under load: $ce $be"
            errs.toSeq
          }
        })
      }
      val errors = futures.flatMap(_.get(120, java.util.concurrent.TimeUnit.SECONDS))
      pool.shutdown()
      assert(errors.isEmpty, errors.mkString("\n"))
      // no lost updates: 500 base + 10 threads x 3 adds
      assert(store.indexDf.count() == 530L)
      val added = store.indexDf.where(col("id") >= 900000).count()
      assert(added == 30L, s"expected 30 added ids, found $added")
    } finally f2.stop()
  }

  test("POST /load_npz ingests NPZ shards server-side") {
    val npzDir = java.nio.file.Files.createTempDirectory("graft_http_npz").toString
    Tables.embeddings(spark, TestSpark.sf).limit(5)
      .select((col("vec_id") + 9000).as("id"), col("embedding").as("vector"))
      .coalesce(1)
      .write.format("npz").mode("append").save(npzDir)
    val before = obj(get("/stats")._2)("nodes").asInstanceOf[Map[String, Any]]
      .values.map(n => obj(n)("vector_count").asInstanceOf[Double]).sum
    val (code, body) = post("/load_npz", s"""{"path": "$npzDir"}""")
    assert(code == 200, s"got $code: $body")
    assert(obj(body)("loaded").asInstanceOf[Double] == 5.0)
    assert(obj(body)("total_vectors").asInstanceOf[Double] == before + 5.0)
    val (c2, b2) = post("/load_npz", """{}""")
    assert(c2 == 400 && obj(b2)("error") == "No path provided")
  }
}
