package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.util.concurrent.atomic.AtomicBoolean

import graft.server.{HttpFacade, Json, StoreAdapter}
import graft.store.{QuantConfig, QuantIndex, MultiTableStore, VectorStore}
import graft.lsh.LshConfig

/** Facade LONGEVITY battery (r13 verdict task #7): a real deployment
  * holds the server open across index mutations, so the Round12
  * mutation battery is driven here THROUGH the HTTP layer, on all
  * three adapters — concurrent `/search` clients race delete/upsert
  * cycles underneath and every response must reflect a pre- or
  * post-mutation snapshot:
  *
  *  - HTTP 200 always (no vacuum runs in-battery — retired files
  *    outlive in-flight readers by the default grace);
  *  - the never-mutated anchor vector is its own nearest neighbor at
  *    distance 0 in EVERY response (true in every snapshot);
  *  - distances are sorted ascending with no duplicate ids (a torn
  *    read shows up as garbage ordering or a half-replaced bucket's
  *    duplicates).
  *
  * A separate case force-vacuums the snapshot a facade is serving
  * (retrain + zero-grace sweep) and requires the failure to surface
  * as a CLEAN JSON error — an `error` body on HTTP 500, with the
  * server still answering `/health` afterwards — never a hung or
  * half-written response.
  */
class FacadeLongevitySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val N = 200 // corpus ids 0..N-1; ids N-50..N-1 get mutated
  private val MutLo = N - 50

  private def corpus() =
    Tables.embeddings(spark, TestSpark.sf)
      .where(col("vec_id") < N)
      .select(col("vec_id").as("id"),
        col("embedding").cast("array<double>").as("embedding"))

  private def mutBatch(cycle: Int) = {
    val sess = spark
    import sess.implicits._
    (MutLo.toLong until N.toLong)
      .map(id => (id, Array.fill(64)((id * 31 + cycle).toDouble / N)))
      .toDF("id", "embedding")
  }

  private lazy val client = HttpClient.newHttpClient()

  private def post(port: Int, path: String, body: String): (Int, Any) = {
    val r = client.send(
      HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port$path"))
        .POST(HttpRequest.BodyPublishers.ofString(body))
        .header("Content-Type", "application/json").build(),
      HttpResponse.BodyHandlers.ofString())
    (r.statusCode(), Json.parse(r.body()))
  }

  private def get(port: Int, path: String): (Int, Any) = {
    val r = client.send(
      HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port$path"))
        .GET().build(),
      HttpResponse.BodyHandlers.ofString())
    (r.statusCode(), Json.parse(r.body()))
  }

  private def obj(v: Any) = v.asInstanceOf[Map[String, Any]]

  /** Drive `cycles` delete+re-upsert mutations while 2 client threads
    * hammer `/search` with the anchor query; returns the list of
    * violations (empty = battery passed).
    */
  private def battery(adapter: StoreAdapter,
      mutate: Int => Unit, cycles: Int,
      tierClient: Boolean = false): Seq[String] = {
    val facade = new HttpFacade(spark, adapter, port = 0).start()
    val port = facade.boundPort
    val anchor = graft.queries.VectorQueries.qvec(spark, TestSpark.sf, 0L)
    val qj = anchor.mkString("[", ",", "]")
    val bad = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val stop = new AtomicBoolean(false)
    val clients = (1 to 2).map { _ =>
      new Thread(() => {
        while (!stop.get()) {
          try {
            val (code, body) = post(port, "/search",
              s"""{"query_vector": $qj, "k": 5}""")
            if (code != 200)
              bad.add(s"HTTP $code: ${obj(body).get("error")}")
            else {
              val m = obj(body)
              val ids = m("indices").asInstanceOf[Vector[Vector[Any]]]
                .head.map(Json.asLong)
              val ds = m("distances").asInstanceOf[Vector[Vector[Any]]]
                .head.map(Json.asDouble)
              if (ids.isEmpty || ids.head != 0L || ds.head != 0.0)
                bad.add(s"anchor lost: ids=$ids ds=$ds")
              if (ds != ds.sorted)
                bad.add(s"unsorted distances: $ds")
              if (ids.distinct.size != ids.size)
                bad.add(s"duplicate ids (torn bucket): $ids")
            }
          } catch { case t: Throwable => bad.add(s"client threw: $t") }
        }
      })
    }
    // r21: one client drives the tier knob (curve-backed coarseN
    // search) through the same storm — mutations invalidate the curve
    // mid-flight, so responses flip between curve-driven budgets and
    // the exact fallback (coarse_n = −1); both must stay clean 200s
    // with sorted, duplicate-free results, never a torn-curve crash.
    val tierClients = if (!tierClient) Seq.empty else Seq(new Thread(() => {
      while (!stop.get()) {
        try {
          val (code, body) = post(port, "/search",
            s"""{"query_vector": $qj, "k": 5, "min_recall": 0.5,""" +
              """ "tier": "pq"}""")
          if (code != 200)
            bad.add(s"tier HTTP $code: ${obj(body).get("error")}")
          else {
            val m = obj(body)
            val n = Json.asLong(m("coarse_n")
              .asInstanceOf[Vector[Any]].head)
            if (n != -1L && n < 5L) bad.add(s"tier budget below k: $n")
            val ids = m("indices").asInstanceOf[Vector[Vector[Any]]]
              .head.map(Json.asLong)
            val ds = m("distances").asInstanceOf[Vector[Vector[Any]]]
              .head.map(Json.asDouble)
            if (ds != ds.sorted) bad.add(s"tier unsorted: $ds")
            if (ids.distinct.size != ids.size)
              bad.add(s"tier duplicate ids: $ids")
          }
        } catch { case t: Throwable => bad.add(s"tier client threw: $t") }
      }
    }))
    try {
      (clients ++ tierClients).foreach(_.start())
      (1 to cycles).foreach(mutate)
    } finally {
      stop.set(true)
      (clients ++ tierClients).foreach(_.join(30000))
      facade.stop()
    }
    import scala.jdk.CollectionConverters._
    bad.asScala.toSeq
  }

  test("LSH facade: concurrent /search across delete/upsert cycles " +
      "sees only pre-or-post snapshots") {
    val dir = graft.util.TempDirs.create("graft_longevity_lsh").toString
    val store = VectorStore.build(spark, corpus(), s"$dir/index",
      LshConfig(dim = 64, seed = 42L))
    val bad = battery(new StoreAdapter.Lsh(spark, store), { c =>
      store.delete((MutLo.toLong until N.toLong))
      store.upsert(mutBatch(c))
    }, cycles = 4)
    assert(bad.isEmpty, s"violations: ${bad.take(5)}")
    // post-state: the last cycle's vectors are in the index
    val last = store.indexDf.where(col("id") === MutLo)
      .select(element_at(col("embedding"), 1).cast("double")).head.getDouble(0)
    assert(math.abs(last - (MutLo * 31 + 4).toDouble / N) < 1e-9)
  }

  test("Quant facade: concurrent /search across upsert/delete/compact " +
      "cycles sees only pre-or-post snapshots") {
    val dir = graft.util.TempDirs.create("graft_longevity_q").toString
    val idx = QuantIndex.build(spark, corpus(), s"$dir/index", QuantConfig())
    // seed a measured curve so the tier client starts curve-driven;
    // the first mutation invalidates it (exact fallback thereafter)
    idx.auditAdcRecallCurve((0L until 3L)
      .map(graft.queries.VectorQueries.qvec(spark, TestSpark.sf, _)),
      k = 5, tier = graft.store.QuantTier.Pq, depths = Seq(10, 50))
    val bad = battery(new StoreAdapter.Quant(spark, idx), { c =>
      idx.delete((MutLo.toLong until N.toLong))
      idx.upsert(mutBatch(c))
      if (c % 2 == 0) idx.compact() // default grace: no reclamation
    }, cycles = 4, tierClient = true)
    assert(bad.isEmpty, s"violations: ${bad.take(5)}")
  }

  test("Multi-table facade: concurrent /search across delete/add " +
      "cycles sees only pre-or-post snapshots") {
    val dir = graft.util.TempDirs.create("graft_longevity_mt").toString
    val store = MultiTableStore.build(spark, corpus(), s"$dir/index",
      LshConfig(numHashFunctions = 4, numHashTables = 2, dim = 64,
        seed = 42L, multiTable = true))
    val bad = battery(new StoreAdapter.Multi(spark, store), { c =>
      store.delete((MutLo.toLong until N.toLong))
      store.add(mutBatch(c))
    }, cycles = 3)
    assert(bad.isEmpty, s"violations: ${bad.take(5)}")
  }

  test("a force-vacuumed snapshot surfaces as a clean JSON error and " +
      "the server survives") {
    val dir = graft.util.TempDirs.create("graft_longevity_vac").toString
    val idx = QuantIndex.build(spark, corpus(), s"$dir/index", QuantConfig())
    val facade = new HttpFacade(spark,
      new StoreAdapter.Quant(spark, idx), port = 0).start()
    try {
      val anchor = graft.queries.VectorQueries.qvec(spark, TestSpark.sf, 0L)
      val qj = anchor.mkString("[", ",", "]")
      val (c0, _) = post(facade.boundPort, "/search",
        s"""{"query_vector": $qj, "k": 3}""")
      assert(c0 == 200)
      // retrain with ZERO grace: the flat snapshot this facade's
      // adapter pinned at construction is reclaimed immediately
      idx.retrain(vacuumGraceMs = 0L)
      val (c1, b1) = post(facade.boundPort, "/search",
        s"""{"query_vector": $qj, "k": 3}""")
      assert(c1 == 500, s"expected a clean 500, got $c1: $b1")
      assert(obj(b1).contains("error")) // parseable JSON error body
      // the server is alive and a reopened adapter would serve the new
      // snapshot; /health proves the process survived the lost race
      val (ch, bh) = get(facade.boundPort, "/health")
      assert(ch == 200 && obj(bh)("status") == "healthy")
    } finally facade.stop()
  }
}
