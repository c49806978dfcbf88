package graft.plugins

import java.nio.file.{Files, Path}

/** Plugin project scaffolding (reference services/scaffold/plugin.py +
  * templates/plugin_skeleton): `graft.Cli scaffold plugin <name> <outDir>`
  * writes a buildable sbt project with the ServiceLoader registration in
  * place — the JVM twin of the pyproject entry-points skeleton. Refuses to
  * overwrite an existing target, like the reference's FileExistsError.
  */
object Scaffold {

  /** kebab-or-snake plugin name → package + class names. */
  private[plugins] def names(raw: String): (String, String) = {
    if (!raw.matches("[a-z][a-z0-9_-]*"))
      throw new IllegalArgumentException(
        s"scaffold: plugin name must match [a-z][a-z0-9_-]*, got '$raw'")
    val pkg = raw.replace('-', '_')
    val cls = raw.split("[-_]").map(_.capitalize).mkString + "Plugin"
    (pkg, cls)
  }

  def plugin(rawName: String, outDir: Path): Path = {
    val (pkg, cls) = names(rawName)
    val root = outDir.resolve(rawName)
    if (Files.exists(root))
      throw new IllegalArgumentException(s"scaffold: $root already exists")

    def write(rel: String, body: String): Unit = {
      val p = root.resolve(rel)
      Files.createDirectories(p.getParent)
      Files.writeString(p, body)
    }

    write("build.sbt",
      s"""name := "$rawName"
         |scalaVersion := "2.13.17"
         |// spark + graft come from the host application's classpath
         |Compile / unmanagedJars ++= {
         |  val sparkHome = sys.env.getOrElse("SPARK_HOME", "/opt/spark")
         |  (file(sparkHome) / "jars" ** "*.jar").classpath
         |}
         |""".stripMargin)

    write(s"src/main/scala/$pkg/$cls.scala",
      s"""package $pkg
         |
         |import org.apache.spark.sql.{DataFrame, SparkSession}
         |
         |import graft.operators.StreamKey
         |import graft.plugins.{GraftPlugin, PluginOp}
         |
         |/** Skeleton graft plugin. Fill in any of the three hooks; delete
         |  * the ones you don't need.
         |  */
         |final class $cls extends GraftPlugin {
         |  override def name: String = "$rawName"
         |
         |  // a reader format usable as source.loader.reader.format
         |  override def loaders = Map(
         |    "$pkg-format" -> { (spark: SparkSession, path: String, options: Map[String, String]) =>
         |      spark.read.options(options).parquet(path) // replace with your format
         |    })
         |
         |  // an ordered transform usable as { operation: plugin, name: ... }
         |  override def transforms = Map(
         |    "$pkg-op" -> { (options: Map[String, Any]) =>
         |      new PluginOp {
         |        def apply(df: DataFrame, key: StreamKey): DataFrame = df
         |      }
         |    })
         |}
         |""".stripMargin)

    // the JVM entry point: ServiceLoader discovers this file on the classpath
    write("src/main/resources/META-INF/services/graft.plugins.GraftPlugin",
      s"$pkg.$cls\n")

    write(".gitignore", "target/\n")
    root
  }
}
