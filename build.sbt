ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "awscloudfrontrealtimemonitoringspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
run / fork := true
// Pass the forked JVM's stdout through raw instead of routing it through
// sbt's logger: Bench's one-line JSON contract must not carry an
// "[info] " prefix (it broke the harness's parse of BENCH_r01).
run / outputStrategy := Some(StdoutOutput)
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
val jdk17AddOpens = Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io",
  "java.base/java.net", "java.base/java.nio",
  "java.base/java.util", "java.base/java.util.concurrent",
  "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  // local[32] holds every pack's shared MEMORY_AND_DISK working set in
  // one JVM; 8g forced old-gen churn as the registry grew past ~70
  // queries (broad ~10% steady-time inflation, worst on window-heavy
  // plans). The bench box has 128 GiB — size the heap like an executor,
  // not a REPL.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
)

// ---- parallel test groups (r17 — the r16 verdict's task 1) ----
// The serial forked suite ran ~80 min on this box (EmbedStoreSpec 716 s,
// AllQueriesSpec 725 s, PqStoreSpec 527 s, the streaming suites 823 s —
// all on one 4-thread session), which blew the round driver's verify
// budget and cost r16 its correctness certification. Suites are
// independent by construction (each either uses the shared per-JVM
// session on read-only testdata or its own temp stores), so they run in
// parallel FORKED JVMs, weight-balanced so each group carries one of
// the measured heavyweights. Per-group isolation: own java.io.tmpdir
// (StoreMemo.root and every createTempDirectory store lands there —
// two JVMs building the same memoized store path would trip the
// single-writer lease) and own spark.sql.warehouse.dir. Heap is capped
// at 12g per group (the 24g single-JVM default held EVERY pack's
// working set; a group holds a slice) so six groups fit the box.
val testGroupWeights: Map[String, Int] = Map(
  // measured serial durations (s), 2026-08-18 baseline run
  "graft.AllQueriesSpec" -> 725,
  "graft.EmbedStoreSpec" -> 716,
  "graft.PqStoreSpec" -> 527,
  "graft.StreamingIngestSpec" -> 430,
  "graft.StreamingDedupSpec" -> 393,
  "graft.AnnPackSpec" -> 300,
  "graft.LmStoreSpec" -> 227,
  "graft.CurationPackSpec" -> 161,
  "graft.DedupPackSpec" -> 94,
)
val nTestGroups = 6
Test / testGrouping := {
  val tests = (Test / definedTests).value
  val forkOpts = (Test / forkOptions).value
  val baseOpts = (Test / javaOptions).value.toVector
  // longest-processing-time greedy balance over the measured weights
  // (unmeasured suites count 20 s)
  val sorted = tests.sortBy(t => -testGroupWeights.getOrElse(t.name, 20))
  val loads = Array.fill(nTestGroups)(0L)
  val buckets = Array.fill(nTestGroups)(Vector.empty[sbt.TestDefinition])
  sorted.foreach { t =>
    val g = loads.zipWithIndex.minBy(_._1)._2
    loads(g) += testGroupWeights.getOrElse(t.name, 20).toLong
    buckets(g) = buckets(g) :+ t
  }
  buckets.zipWithIndex.filter(_._1.nonEmpty).map { case (ts, i) =>
    val tmp = file(s"/tmp/graft-tests-g$i")
    sbt.IO.createDirectory(tmp)
    Tests.Group(s"g$i", ts, Tests.SubProcess(
      forkOpts.withRunJVMOptions(baseOpts ++ Vector(
        s"-Djava.io.tmpdir=${tmp.getAbsolutePath}",
        s"-Dspark.sql.warehouse.dir=${tmp.getAbsolutePath}/warehouse",
        // 20g: AnnPackSpec OOM'd at 12g and 16g rendering a deep
        // executed plan into the SQLExecution event string (see
        // GraftSpec's maxPlanStringLength cap, the structural fix) —
        // untouched pages don't commit, so six 20g caps coexist fine
        // on the 128 GiB box
        "-Xmx20g"))))
  }.toSeq
}
// allow the groups to actually run concurrently (sbt's default tag
// limit serializes forked test groups)
Global / concurrentRestrictions := Seq(
  Tags.limit(Tags.ForkedTestGroup, nTestGroups),
  Tags.limitAll(math.max(nTestGroups, 4)),
)
