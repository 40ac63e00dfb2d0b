ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "demvspark"
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
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
)

// r12: run the suite as FOUR forked JVM groups so the slow replication
// suites (AdultBandsSpec trains 10-fold + 5-fold reductions, ~5 min)
// overlap with the long tail instead of serializing after it. Each group
// keeps its own SparkContext and runs its suites SEQUENTIALLY, so
// shared-session conf mutations (RecodeSpec, SkewInjectionSpec) stay
// group-local — the raciness that rules out in-JVM parallel suites.
// Groups are balanced from the measured -oD durations (r12:
// sequential 27:44 -> grouped ~7 min wall).
Test / testGrouping := {
  val forkOpts = ForkOptions().withRunJVMOptions((Test / javaOptions).value.toVector)
  val assigned: Map[String, Int] = Map(
    "graft.eval.AdultBandsSpec" -> 0,
    "graft.eval.BaselineBandsSpec" -> 1,
    "graft.PlanAuditSpec" -> 1,
    "graft.graph.LinkGraphSpec" -> 1,
    "graft.core.DistributedSmoteSpec" -> 1,
    "graft.streaming.StreamingIngestSpec" -> 2,
    "graft.eval.ConfusionMatricesSpec" -> 2,
    "graft.etl.SkewInjectionSpec" -> 2,
    "graft.eval.CrossValSpec" -> 2,
    "graft.data.DatasetsSpec" -> 2,
    "graft.text.SearchLmSpec" -> 2,
  )
  (Test / definedTests).value
    .groupBy(t => assigned.getOrElse(t.name, 3))
    .toSeq.sortBy(_._1)
    .map { case (i, ts) => Tests.Group(s"g$i", ts, Tests.SubProcess(forkOpts)) }
}
// allow the four groups to actually run concurrently (the sbt default
// caps ForkedTestGroup at 1)
Global / concurrentRestrictions := Seq(
  Tags.limitAll(8),
  Tags.limit(Tags.ForkedTestGroup, 4),
)
