ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "promptlydatapipelinesspark"
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

// Lint gate (CI runs `sbt lint test`, mirroring the reference's
// lint→acceptance ladder). scalafmt cannot resolve in this zero-egress
// build, so this is a self-contained mechanical style check: no tabs, no
// trailing whitespace, no CRLF, lines <= 120 chars.
lazy val lint = taskKey[Unit]("style-check all Scala sources")
lint := {
  val srcs = ((Compile / scalaSource).value ** "*.scala").get ++
    ((Test / scalaSource).value ** "*.scala").get
  val problems = srcs.flatMap { f =>
    IO.readLines(f).zipWithIndex.flatMap { case (l, i) =>
      Seq(
        if (l.contains("\t")) Some("tab character") else None,
        if (l != l.replaceAll("\\s+$", "")) Some("trailing whitespace") else None,
        if (l.contains("\r")) Some("CRLF line ending") else None,
        if (l.length > 120) Some(s"line length ${l.length} > 120") else None,
      ).flatten.map(msg => s"$f:${i + 1}: $msg")
    }
  }
  if (problems.nonEmpty) sys.error(("lint failures:" +: problems).mkString("\n"))
  streams.value.log.info(s"lint: ${srcs.size} Scala sources clean")
}
