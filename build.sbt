ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "advancedelblogsetlspark"
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
  // Pin the initial heap to the max (overridable via SPARK_DRIVER_XMS).
  // A lazily-sized large heap (-Xmx24g, no -Xms) spent ~6× the query's
  // runtime in KERNEL mode on G1 commit/uncommit churn in the round-14
  // sweep harness (q325 sf1: 96 s at 24g vs 15 s at 8g, %sys 32 with
  // GC totals under 2 s) — it also retro-explains part of the round-13
  // sf10 sweep inflation, which used the same unpinned 24g heap.
  s"-Xms${sys.env.getOrElse("SPARK_DRIVER_XMS",
    sys.env.getOrElse("SPARK_DRIVER_MEM", "8g"))}",
) ++ sys.env.get("SPARK_DRIVER_EXTRA_JAVA_OPTS")
  .map(_.split("\\s+").toSeq.filter(_.nonEmpty)).getOrElse(Seq.empty)
