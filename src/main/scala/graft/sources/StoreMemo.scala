package graft.sources

import org.apache.spark.sql.SparkSession

/** The ONE memo + cleanup discipline for once-per-(JVM × dataset)
  * store builds (review finding: five packs had re-implemented the
  * same ~20-line idiom — md5 dataset tag, store-root resolution,
  * tableExists memo, artifact set + release hook — and a future change
  * to the discipline would have had to find every copy).
  *
  * The memo key is CATALOG-TABLE existence, which
  * [[graft.Caches.releaseAll]] does not touch on its own — so every
  * build registers its tables and directory here, and the release hook
  * drops/deletes them: a dataset dir rewritten in-session rebuilds its
  * stores instead of probing stale ones (the C11/C12 lesson).
  */
object StoreMemo {

  private val artifacts = java.util.concurrent.ConcurrentHashMap
    .newKeySet[(String, String)]() // (catalog table | "", store dir | "")
  graft.Caches.onRelease(() => {
    SparkSession.getActiveSession
      .orElse(SparkSession.getDefaultSession)
      .foreach { s =>
        artifacts.forEach { case (t, _) =>
          if (t.nonEmpty) s.sql(s"DROP TABLE IF EXISTS $t") }
      }
    // never hand "" to deleteDir (Paths.get("") is the working dir)
    artifacts.forEach { case (_, dir) =>
      if (dir.nonEmpty) graft.Caches.deleteDir(dir) }
    artifacts.clear()
  })

  /** md5 tag of a dataset dir — the memo key component. */
  def tagOf(d: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(d.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(10)

  /** Store-root directory for memoized builds. */
  def root: String = sys.env.getOrElse("SPARK_GRAFT_STORE_DIR",
    sys.props("java.io.tmpdir"))

  /** Run `build` once per (JVM, dataset): skipped when `marker` (a
    * catalog table the build creates) already exists; `tables` and
    * `dir` are registered for release-time cleanup BEFORE the build
    * runs, and a build that throws drops whatever it created — so a
    * partial build can neither be probed by a later same-JVM call
    * (the marker is gone, the build retries) nor leak past the
    * release hook.
    */
  def once(s: SparkSession, marker: String, dir: String,
      tables: Seq[String])(build: => Unit): Unit =
    if (!s.catalog.tableExists(marker)) {
      tables.foreach(t => artifacts.add((t, "")))
      artifacts.add(("", dir))
      try build
      catch { case e: Throwable =>
        tables.foreach(t => s.sql(s"DROP TABLE IF EXISTS $t"))
        graft.Caches.deleteDir(dir)
        throw e
      }
    }
}
