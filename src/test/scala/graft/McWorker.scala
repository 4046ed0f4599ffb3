package graft

import graft.store.{ConcurrentCommitException, FileLog}

/** Forked-JVM worker for the cross-PROCESS commit battery (r12
  * verdict task #3): the CAS safety story rests on
  * [[graft.util.FsIo.writeStringExclusive]]'s no-overwrite rename
  * being atomic BETWEEN PROCESSES, which in-JVM thread batteries
  * (Round16/17Spec) cannot exercise. No SparkSession is created —
  * the commit layer's `spark` parameter is unused on the local-FS
  * path (hadoop conf falls back to `new Configuration()`), which is
  * itself part of the point: commits are plain atomic file ops any
  * writer process can perform.
  *
  * Modes:
  *  - `append <dir> <id> <n>`: n CAS appends of synthetic file
  *    entries `w<id>-<i>.parquet` through [[FileLog.transact]] —
  *    every lost race re-reads and re-merges, so all n must land.
  *  - `rewrite <dir> <id> <_>`: read the current snapshot, then try
  *    ONE [[FileLog.commitRewrite]] retiring the shared
  *    `seed.parquet` (read set = exactly that file). Racing another
  *    rewrite of the same file, exactly one process may win; the
  *    loser must surface [[ConcurrentCommitException]], never a
  *    silent double-retire. Prints REWRITE_OK or REWRITE_CCE.
  */
object McWorker {
  def main(args: Array[String]): Unit = {
    val Array(mode, dir, id, nStr) = args
    mode match {
      case "append" =>
        val n = nStr.toInt
        var i = 0
        while (i < n) {
          FileLog.transact(null, dir) { cur =>
            val c = cur.get
            Some(FileLog.Commit(c.files :+ s"w$id-$i.parquet",
              c.schemaDdl, -1L, c.zones, c.rows))
          }
          i += 1
        }
        println(s"APPENDED $n")
      case "rewrite" =>
        val base = FileLog.read(dir)
        // both workers read the snapshot BEFORE either commits: the
        // parent starts them together and this pause outlasts JVM
        // startup skew, so the race is rewrite-vs-rewrite, not
        // read-after-commit
        Thread.sleep(1500)
        try {
          FileLog.commitRewrite(null, dir, base,
            removed = Set("seed.parquet"),
            added = Seq(s"rw$id.parquet"),
            schemaDdl = base.schemaDdl,
            readSet = Some(Set("seed.parquet")))
          println("REWRITE_OK")
        } catch {
          case _: ConcurrentCommitException => println("REWRITE_CCE")
        }
      case other =>
        System.err.println(s"unknown mode $other"); sys.exit(2)
    }
  }
}
