ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "redditetlpipelinespark"
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
  // the bench generates thousands of whole-stage-codegen classes; the JVM
  // default 240m code cache fills mid-suite and the JIT falls back to
  // interpretation for late rows (observed: in-suite times 2x their
  // isolated min-of-3 on unchanged queries). 512m was sized for the
  // 290-query suite. r19 bumped it to 768m after the last bench, unverified;
  // the r20 controlled A/B (same HEAD, back-to-back quiet q_a..q_h prefix
  // runs: 512m 121.9 s vs 768m 132.5 s, H.264 family 40.6 vs 41.9 s —
  // OPTIMIZATION_r20.md) shows 768m buys nothing, so the default reverts
  // to the measured 512m. Env-overridable for future A/Bs.
  s"-XX:ReservedCodeCacheSize=${sys.env.getOrElse("SPARK_GRAFT_CODE_CACHE", "512m")}",
)
// extra JVM flags for one-variable A/B experiments (JIT/GC tuning);
// empty by default so the committed bench environment is unchanged
javaOptions ++= sys.env.get("SPARK_GRAFT_JVM_EXTRA").toSeq
  .flatMap(_.split("\\s+").filter(_.nonEmpty))
