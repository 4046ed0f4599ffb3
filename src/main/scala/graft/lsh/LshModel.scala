package graft.lsh

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.functions.{VectorFunctions => VF}

/** Sign-random-projection LSH, the reference's sharding function
  * re-expressed as a deterministic, seeded, persistable model.
  *
  * Reference semantics (`sharding/lsh_sharding.py`):
  *  - per table t: h_t = (R_t · v̂ > 0) ∈ {0,1}^numHashFunctions
  *    (`lsh_sharding.py:57-74`);
  *  - bucket = Σ_j bit_j · 2^j mod numHashTables over the table-major
  *    concatenation of all bits (`lsh_sharding.py:76-96`);
  *  - multi-probe candidates: primary bucket, then buckets reached by
  *    flipping the hash bits whose projections sit closest to the
  *    decision boundary, padded sequentially (`lsh_sharding.py:98-161`).
  *
  * Deliberate fixes over the reference (SURVEY §7.5):
  *  - the reference's projections are *unseeded* and re-fit per process
  *    (`lsh_sharding.py:20-28`) — here the matrix is derived from a fixed
  *    seed and persisted with the index, so bucket assignment is stable;
  *  - the reference L2-normalizes before hashing (`lsh_sharding.py:49-53`)
  *    — for sign-LSH that is a mathematical no-op (norm > 0 scaling never
  *    changes the sign; the zero vector maps to bit 0 either way), so we
  *    hash the raw vector and skip a per-row O(dim) divide;
  *  - the reference's boundary-bit flip indexes into the wrong table
  *    (`idx // num_hash_functions` of a per-table 4-vector is always 0,
  *    `lsh_sharding.py:127`), always perturbing table 0. We flip the bit
  *    in the table that owns the boundary projection, which is the
  *    intended multi-probe semantics.
  */
/** `multiTable = false` (default): the reference's layout — ONE bucket
  * per row, bucket = Σ all bits·2^j mod numHashTables, multi-probe =
  * informed bit flips of that single code. Honest but degenerate when
  * numHashTables is a power of two: 2^j mod 2^m vanishes for j ≥ m, so
  * only the first m bits ever influence the bucket (BASELINE.md r4
  * note) — measured recall@10 at 16 buckets is 0.195–0.385.
  *
  * `multiTable = true`: true OR-probing multi-table LSH (the
  * reference's 3-table INTENT, `sharding/lsh_sharding.py:57-74`, which
  * its mod-sum formula then collapses away): each of the
  * numHashTables tables keeps its own 2^numHashFunctions-bucket code
  * from its own projections; a row is stored once per table; a query
  * probes its primary bucket in every table and unions the
  * candidates. Storage is ×numHashTables (the classic multi-table
  * trade-off — at 100 TB you pay it for the recall, or drop table
  * count); probed fraction per (table,bucket) probe is
  * 2^-numHashFunctions, directly comparable to one bucket of a
  * 2^k-bucket single-table layout.
  *
  * Default guidance: measured at dim=64 on the bench corpora (post
  * bucket-fix), multi-table's per-probe recall edge is percent-level
  * while its storage is ×L — recall per stored byte favors
  * `multiTable = false` with a bigger probe budget at every measured
  * operating point (see [[graft.store.MultiTableStore]]'s scaladoc and
  * MultiTableLshSpec's economics pin). Audit the curve on your own
  * corpus before paying the ×L.
  */
final case class LshConfig(
    numHashFunctions: Int = 4,
    numHashTables: Int = 3,
    dim: Int = 64,
    seed: Long = 42L,
    multiTable: Boolean = false) {
  def totalBits: Int = numHashFunctions * numHashTables
}

final class LshModel(val cfg: LshConfig, val matrix: Array[Array[Double]]) {
  require(matrix.length == cfg.totalBits && matrix.forall(_.length == cfg.dim))

  /** Number of buckets ( = numHashTables, the reference's modulus). */
  def numBuckets: Int = cfg.numHashTables

  // -------------------------------------------------------------- spark

  /** Bucket id for an embedding column: a native Catalyst expression
    * fusing all projection dots into one pass per row (no UDF, no
    * shuffle, serialized matrix travels with the plan).
    */
  def bucketCol(emb: Column): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      graft.expressions.VecLshBucket(
        org.apache.spark.sql.graft.ColumnBridge.expression(emb),
        matrix, cfg.numHashTables))

  // ------------------------------------------------------------- duckdb

  /** DuckDB list literal. Scientific notation forces the lexer to type
    * each entry DOUBLE (a plain decimal literal would become DECIMAL and
    * take a lossy-in-corner-cases DECIMAL→DOUBLE cast); 17 significant
    * digits guarantee an exact double round-trip.
    */
  private def rowLit(row: Array[Double]): String =
    row.map(d => f"$d%.17e").mkString("[", ", ", "]")

  /** DuckDB expression computing the same bucket for a list column. */
  def bucketSql(emb: String): String = {
    val terms = matrix.zipWithIndex.map { case (row, j) =>
      val dotJ = s"list_sum(list_transform(range(1, ${cfg.dim + 1}), i -> " +
        s"CAST(($emb)[i] AS DOUBLE) * (${rowLit(row)})[i]))"
      s"(CASE WHEN $dotJ > 0 THEN ${1L << j} ELSE 0 END)"
    }
    // pmod, not %: DuckDB's % follows the dividend's sign like Java's,
    // and on 64-bit configs the j=63 term is the negative literal
    // -2^63 (Scala's 1L<<63 wraps), so the sum can be negative. The
    // ((x % m) + m) % m form mirrors Math.floorMod in VecEval.lshBucket.
    val m = cfg.numHashTables
    s"(CAST((((${terms.mkString(" + ")}) % $m + $m) % $m) AS INT))"
  }

  // -------------------------------------------------------------- scala

  /** Projections of a (driver-side) vector: one value per hash bit,
    * table-major order. Sign is scale-invariant, so no normalization.
    */
  def project(v: Array[Double]): Array[Double] = matrix.map(VF.dotS(_, v))

  def bits(v: Array[Double]): Array[Int] = project(v).map(p => if (p > 0) 1 else 0)

  def bucketOfBits(bits: Array[Int]): Int = {
    var sum = 0L
    var j = 0
    while (j < bits.length) { sum += bits(j).toLong << j; j += 1 }
    // floorMod mirrors VecEval.lshBucket: bit 63 wraps sum negative on
    // 64-bit configs and signed % would emit negative bucket ids.
    java.lang.Math.floorMod(sum, cfg.numHashTables.toLong).toInt
  }

  def bucket(v: Array[Double]): Int = bucketOfBits(bits(v))

  // -------------------------------------------------- multi-table mode

  /** Buckets per table in multi-table mode: the full 2^k code space of
    * one table's k projections — no mod collapse.
    */
  def bucketsPerTable: Int = 1 << cfg.numHashFunctions

  /** Table t's bucket code as a native column: Σ_{j<k} bit_{t,j}·2^j ∈
    * [0, 2^k). Reuses the fused [[graft.expressions.VecLshBucket]]
    * kernel over table t's submatrix (the mod at 2^k is the identity).
    */
  def tableBucketCol(emb: Column, t: Int): Column = {
    val k = cfg.numHashFunctions
    org.apache.spark.sql.graft.ColumnBridge.column(
      graft.expressions.VecLshBucket(
        org.apache.spark.sql.graft.ColumnBridge.expression(emb),
        matrix.slice(t * k, (t + 1) * k), bucketsPerTable))
  }

  /** All per-table bucket codes as one array<int> column. */
  def tableBucketsCol(emb: Column): Column =
    array((0 until cfg.numHashTables).map(tableBucketCol(emb, _)): _*)

  /** Driver-side table-t bucket of a query vector. */
  def tableBucket(v: Array[Double], t: Int): Int = {
    val k = cfg.numHashFunctions
    val proj = project(v)
    var sum = 0
    var j = 0
    while (j < k) {
      if (proj(t * k + j) > 0) sum |= 1 << j
      j += 1
    }
    sum
  }

  /** Multi-probe candidates in multi-table mode: ordered
    * (table, bucket) pairs. All primary buckets first (the L-way OR
    * union — one probe per table is the standard operating point),
    * then single boundary-bit flips across ALL tables in one global
    * increasing-|projection| order (the next-most-probable buckets
    * under the sign-LSH model), then boundary pairs likewise. `probes`
    * counts (table, bucket) pairs, each reading ~2^-k of the corpus —
    * the same unit as one probe of a single-table 2^k-bucket layout.
    */
  def tableCandidates(v: Array[Double], probes: Int): Seq[(Int, Int)] = {
    val k = cfg.numHashFunctions
    val L = cfg.numHashTables
    val p = math.max(1, probes)
    val proj = project(v)
    val out = scala.collection.mutable.LinkedHashSet.empty[(Int, Int)]
    (0 until L).foreach(t => out += (t -> tableBucket(v, t)))
    // single-bit flips, cheapest boundary first, across all tables
    val singles = for (t <- 0 until L; j <- 0 until k)
      yield (t, j, math.abs(proj(t * k + j)))
    singles.sortBy(_._3).foreach { case (t, j, _) =>
      if (out.size < p) out += (t -> (tableBucket(v, t) ^ (1 << j)))
    }
    // pair flips, cheapest boundary pair first, across all tables
    if (out.size < p) {
      val pairs = for (t <- 0 until L;
                       c <- (0 until k).combinations(2).toSeq)
        yield (t, c, math.abs(proj(t * k + c(0))) + math.abs(proj(t * k + c(1))))
      pairs.sortBy(_._3).foreach { case (t, c, _) =>
        if (out.size < p)
          out += (t -> (tableBucket(v, t) ^ (1 << c(0)) ^ (1 << c(1))))
      }
    }
    out.take(p).toSeq
  }

  /** DuckDB twin of [[tableBucketCol]] for table `t`. */
  def tableBucketSql(emb: String, t: Int): String = {
    val k = cfg.numHashFunctions
    val terms = (0 until k).map { j =>
      val row = matrix(t * k + j)
      val dotJ = s"list_sum(list_transform(range(1, ${cfg.dim + 1}), i -> " +
        s"CAST(($emb)[i] AS DOUBLE) * (${rowLit(row)})[i]))"
      s"(CASE WHEN $dotJ > 0 THEN ${1 << j} ELSE 0 END)"
    }
    s"(CAST((${terms.mkString(" + ")}) AS INT))"
  }

  /** Multi-probe candidate buckets for a query vector.
    *
    * Primary bucket first; then, per table, flip the ≤2 bits whose
    * |projection| is smallest (closest to the decision boundary) and
    * add the perturbed bucket; then (deliberate fix over the
    * reference, which pads with ARBITRARY sequential bucket ids,
    * `lsh_sharding.py:151-158`) flip boundary-bit PAIRS per table in
    * increasing |proj| order — the next-most-probable buckets under
    * the sign-LSH model (Lv et al. multi-probe ordering) — and only
    * pad sequentially when informed perturbations run out.
    * `probes >= numBuckets` degenerates to all buckets (exact search).
    */
  def candidates(v: Array[Double], probes: Int): Seq[Int] = {
    val p = math.max(1, probes)
    val proj = project(v)
    val b = proj.map(x => if (x > 0) 1 else 0)
    val out = scala.collection.mutable.LinkedHashSet[Int](bucketOfBits(b))
    def flip(bits: Array[Int], js: Seq[Int]): Int = {
      val f = bits.clone()
      js.foreach(j => f(j) = 1 - f(j))
      bucketOfBits(f)
    }
    // single boundary-bit flips, ≤2 per table
    var t = 0
    while (t < cfg.numHashTables && out.size < p) {
      val base = t * cfg.numHashFunctions
      val order = (0 until cfg.numHashFunctions)
        .sortBy(j => math.abs(proj(base + j))).take(2)
      var oi = 0
      while (oi < order.length && out.size < p) {
        out += flip(b, Seq(base + order(oi)))
        oi += 1
      }
      t += 1
    }
    // boundary-bit PAIR flips per table, cheapest pair first
    t = 0
    while (t < cfg.numHashTables && out.size < p) {
      val base = t * cfg.numHashFunctions
      val pairs = (0 until cfg.numHashFunctions)
        .combinations(2).toSeq
        .sortBy { case Seq(a, c) =>
          math.abs(proj(base + a)) + math.abs(proj(base + c)) }
      var pi = 0
      while (pi < pairs.length && out.size < p) {
        out += flip(b, pairs(pi).map(base + _))
        pi += 1
      }
      t += 1
    }
    var seq = 0
    while (out.size < p && seq < cfg.numHashTables) { out += seq; seq += 1 }
    out.take(p).toSeq
  }

  // -------------------------------------------------------- persistence

  /** Persist as a tiny JSON file next to the index (SURVEY §7.5: the
    * reference never persists its projections; we do).
    *
    * `version` is the bucket-assignment FORMAT version ([[LshModel
    * .FormatVersion]]): v2 = floorMod bucket arithmetic. Version 1
    * files (written before the signed-overflow fix) assign DIFFERENT
    * buckets for configs with ≥64 projection bits, so [[LshModel
    * .load]] refuses them rather than silently probing the wrong
    * partitions of a v1-written index.
    */
  def save(path: String): Unit = {
    val rows = matrix.map(_.mkString("[", ",", "]")).mkString("[", ",", "]")
    val json =
      s"""{"version":${LshModel.FormatVersion},"numHashFunctions":${cfg.numHashFunctions},"numHashTables":${cfg.numHashTables},"dim":${cfg.dim},"seed":${cfg.seed},"multiTable":${cfg.multiTable},"matrix":$rows}"""
    graft.util.FsIo.writeString(path, json)
  }
}

object LshModel {

  /** Bucket-arithmetic format version stamped into persisted model
    * JSON. History: 1 (implicit — no version field) = signed `%`
    * bucket fold, which emits NEGATIVE bucket ids when totalBits ≥ 64
    * (bit 63 wraps the Long sum); 2 = `floorMod` on both engines.
    * The assignments coincide exactly when totalBits < 64, so v1
    * models below that width load fine; at ≥64 bits a v1-written
    * index's PARTITION LAYOUT no longer matches the fixed arithmetic
    * and querying it would silently miss rows — load fails loudly
    * with a reindex instruction instead (r10 ADVICE fix).
    */
  val FormatVersion = 2
  /** Deterministic model: N(0,1) entries from `java.util.Random(seed)`
    * in row-major (table-major, then hash-function, then dim) order.
    */
  def apply(cfg: LshConfig): LshModel = {
    val rng = new java.util.Random(cfg.seed)
    val m = Array.fill(cfg.totalBits)(Array.fill(cfg.dim)(rng.nextGaussian()))
    new LshModel(cfg, m)
  }

  def load(path: String): LshModel = {
    val s = graft.util.FsIo.readString(path)
    def num(key: String): String = {
      val i = s.indexOf("\"" + key + "\":") + key.length + 3
      s.substring(i, s.indexWhere(c => c == ',' || c == '}', i))
    }
    val cfg = LshConfig(
      num("numHashFunctions").trim.toInt, num("numHashTables").trim.toInt,
      num("dim").trim.toInt, num("seed").trim.toLong,
      // absent in pre-multi-table model files → false
      multiTable = s.contains("\"multiTable\":") &&
        num("multiTable").trim.toBoolean)
    val version = // absent = 1, the pre-floorMod signed-% arithmetic
      if (s.contains("\"version\":")) num("version").trim.toInt else 1
    if (version < FormatVersion && cfg.totalBits >= 64)
      throw new IllegalStateException(
        s"$path: LSH model format v$version with ${cfg.totalBits} " +
          "projection bits — the index was partitioned with pre-floorMod " +
          "bucket arithmetic, which differs at >=64 bits; querying it with " +
          "this library would silently probe the wrong buckets. Rebuild " +
          "the index (VectorStore.build / reshard) to migrate.")
    val body = s.substring(s.indexOf("\"matrix\":") + 9).trim.stripSuffix("}")
    val rows = body.stripPrefix("[").stripSuffix("]")
      .split("\\],\\[").map(_.replaceAll("[\\[\\]]", ""))
      .map(_.split(",").map(_.trim.toDouble))
    new LshModel(cfg, rows)
  }
}
