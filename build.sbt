ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "proteusspark"
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
// Pass the forked run's stdout through untouched (no [info] prefix):
// the bench driver parses graft.Bench's JSON line from raw stdout, and
// sbt's logger decoration was what kept breaking that parse.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
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
  // ~100 bench queries x whole-stage codegen fills the JDK's default
  // 240MB reserved code cache mid-run; once full the JIT stops
  // compiling and the late (alphabetically last) queries run partly
  // interpreted — measured as 4-8x slowdowns on q_substring_*/text_*
  // with early queries unaffected. Headroom keeps the JIT on.
  // r13: the 1g headroom SATURATED AGAIN at 290 registry queries —
  // the same pathology one decade up: late-suite queries measured ~2x
  // their isolated times at 1g and return to baseline at 2g
  // (q_fk_discovery 13.2s -> 5.5s, text_winnow 1.6s -> 0.64s;
  // shared-250 suite total 208.8s -> 173.2s, matching the r12 record's
  // 168.3s). Default now 2g, env-tunable for the next decade.
  s"-XX:ReservedCodeCacheSize=${sys.env.getOrElse("SPARK_CODE_CACHE", "2g")}",
)
// Keep sbt's "[success] Total time ..." trailer off stdout: the bench
// driver reads the LAST stdout line, which must be graft.Bench's JSON
// (rounds 1-3 all ended with "parsed": null because the success line
// printed after it).
Global / showSuccess := false
