package graft.plugins

import java.nio.file.{Files, Path}

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.dataformat.yaml.YAMLFactory

/** Plugin project scaffolding (reference services/scaffold/plugin.py +
  * templates/plugin_skeleton): `graft.Cli scaffold plugin <name> <outDir>`
  * writes a buildable sbt project with the ServiceLoader registration in
  * place — the JVM twin of the pyproject entry-points skeleton. Refuses to
  * overwrite an existing target, like the reference's FileExistsError.
  */
object Scaffold {

  /** kebab-or-snake plugin name → package + class names. */
  private[graft] def names(raw: String): (String, String) = {
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

  /** Runnable demo workspace (reference services/scaffold/demo.py +
    * templates/demo_skeleton): a data-free project on the synthetic tick
    * source, runnable immediately —
    * `graft.Cli run <out>/demo/project.yaml demo <anyDir>`.
    */
  def demo(outDir: Path): Path = {
    val root = outDir.resolve("demo")
    if (Files.exists(root))
      throw new IllegalArgumentException(s"scaffold: $root already exists")
    Files.createDirectories(root)
    Files.writeString(root.resolve("project.yaml"),
      """# graft demo: a bounded synthetic tick grid with time-encoding and
        |# rolling transforms — no input data needed.
        |sources:
        |  - id: ticks
        |    loader:
        |      transport: synthetic
        |      args: { start: "2024-01-01", end: "2024-01-08", frequency: 30m }
        |streams:
        |  - id: grid
        |    from: { source: ticks }
        |    transforms:
        |      - { operation: encode_time, mode: hour_sin, to: h_sin }
        |      - { operation: encode_time, mode: weekday_sin, to: wd_sin }
        |      - { operation: rolling, field: h_sin, window: 8, statistic: mean, to: h_sin_smooth }
        |profiles:
        |  - { id: demo, cmd: stream, stream: grid, preview: 12 }
        |  - { id: materialize, cmd: materialize-streams, run_root: runs }
        |""".stripMargin)
    Files.writeString(root.resolve("README.md"),
      """# graft demo
        |
        |Preview twelve rows of the synthetic stream:
        |
        |    sbt "runMain graft.Cli run demo/project.yaml demo ."
        |
        |Materialize it into `runs/` (run-scoped dirs + atomic `latest`):
        |
        |    sbt "runMain graft.Cli run demo/project.yaml materialize ."
        |""".stripMargin)
    root
  }

  // ---- per-component scaffolds into an EXISTING plugin skeleton
  // (reference cli/commands/{mapper,parser,loader,domain,dto}.py over
  // services/scaffold/{mapper,parser,loader,domain,dto}.py): each generator
  // writes ONE compilable component file under the plugin's package, and
  // SPI-visible components (loader / parser / mapper) append their own
  // GraftPlugin registration to the ServiceLoader manifest — a rebuild is
  // all it takes for the new component to be discoverable. Like every
  // reference scaffold: refuse to overwrite, validate names first.

  val ComponentKinds: Seq[String] =
    Seq("mapper", "parser", "loader", "domain", "dto")

  /** The plugin skeleton's package + source dir, recovered from its
    * ServiceLoader manifest (the skeleton wrote it; reference pkg_root).
    */
  private def pluginPackage(pluginRoot: Path): (String, Path) = {
    val services = pluginRoot.resolve(
      "src/main/resources/META-INF/services/graft.plugins.GraftPlugin")
    if (!Files.exists(services))
      throw new IllegalArgumentException(
        s"scaffold: $pluginRoot is not a plugin skeleton (no ServiceLoader manifest)")
    val first = Files.readString(services).linesIterator
      .map(_.trim).find(_.nonEmpty).getOrElse(throw new IllegalArgumentException(
        s"scaffold: empty ServiceLoader manifest under $pluginRoot"))
    val pkg = first.substring(0, first.lastIndexOf('.'))
    (pkg, pluginRoot.resolve(s"src/main/scala/${pkg.replace('.', '/')}"))
  }

  private def camel(raw: String): String =
    raw.split("[-_]").map(_.capitalize).mkString

  private def writeComponent(pluginRoot: Path, rel: Path, body: String,
                             spiClass: Option[String]): Path = {
    if (Files.exists(rel))
      throw new IllegalArgumentException(s"scaffold: $rel already exists")
    Files.createDirectories(rel.getParent)
    Files.writeString(rel, body)
    spiClass.foreach { cls =>
      val services = pluginRoot.resolve(
        "src/main/resources/META-INF/services/graft.plugins.GraftPlugin")
      val current = Files.readString(services)
      val sep = if (current.endsWith("\n")) "" else "\n"
      Files.writeString(services, s"$current$sep$cls\n")
    }
    rel
  }

  /** Scaffold one component into an existing plugin skeleton. Returns the
    * created file. `kind` ∈ [[ComponentKinds]].
    */
  def component(kind: String, rawName: String, pluginRoot: Path): Path = {
    val (pkgName, _) = names(rawName) // validates the name shape
    val base = camel(rawName)
    val (pkg, srcDir) = pluginPackage(pluginRoot)
    def file(cls: String) = srcDir.resolve(s"$cls.scala")

    kind match {
      case "domain" =>
        // reference domain.py: a typed temporal record model
        writeComponent(pluginRoot, file(s"${base}Record"),
          s"""package $pkg
             |
             |/** Domain record for '$rawName' (scaffolded twin of the
             |  * reference TemporalRecord model): a timestamped, keyed,
             |  * typed payload — extend the fields as the domain requires.
             |  */
             |final case class ${base}Record(time: java.sql.Timestamp,
             |                               key: String, value: Double)
             |
             |object ${base}Record {
             |  import org.apache.spark.sql.{Encoder, Encoders}
             |  implicit val encoder: Encoder[${base}Record] =
             |    Encoders.product[${base}Record]
             |}
             |""".stripMargin, spiClass = None)

      case "dto" =>
        // reference dto.py: the raw wire shape + its parse into the domain
        // record — requires the domain to be scaffolded first
        if (!Files.exists(file(s"${base}Record")))
          throw new IllegalArgumentException(
            s"scaffold: dto '$rawName' needs its domain record first " +
              s"(run: scaffold domain $rawName <pluginDir>)")
        writeComponent(pluginRoot, file(s"${base}Dto"),
          s"""package $pkg
             |
             |/** Wire-shape DTO for '$rawName' (scaffolded): every field a
             |  * string, parsed into the typed domain record — keep parsing
             |  * here so malformed payloads fail in ONE place.
             |  */
             |final case class ${base}Dto(time: String, key: String,
             |                            value: String) {
             |  def toRecord: ${base}Record =
             |    ${base}Record(java.sql.Timestamp.valueOf(time), key,
             |      value.toDouble)
             |}
             |""".stripMargin, spiClass = None)

      case "loader" =>
        writeComponent(pluginRoot, file(s"${base}Loader"),
          s"""package $pkg
             |
             |import org.apache.spark.sql.SparkSession
             |
             |import graft.plugins.GraftPlugin
             |
             |/** Reader format '$rawName' (scaffolded): usable as
             |  * source.loader.reader.format once this plugin is on the
             |  * classpath. Replace the parquet read with your format.
             |  */
             |final class ${base}Loader extends GraftPlugin {
             |  override def name: String = "$rawName-loader"
             |  override def loaders = Map(
             |    "$rawName" -> { (spark: SparkSession, path: String,
             |                     options: Map[String, String]) =>
             |      spark.read.options(options).parquet(path)
             |    })
             |}
             |""".stripMargin, spiClass = Some(s"$pkg.${base}Loader"))

      case "parser" =>
        // the reference's iterator-parser stage collapses into a reader
        // format on the JVM (Plugins scaladoc): scaffold a line parser
        writeComponent(pluginRoot, file(s"${base}Parser"),
          s"""package $pkg
             |
             |import org.apache.spark.sql.SparkSession
             |import org.apache.spark.sql.functions._
             |
             |import graft.plugins.GraftPlugin
             |
             |/** Line parser '$rawName' (scaffolded): reads text files and
             |  * splits each line on a configurable delimiter — replace the
             |  * select with your wire format's parse.
             |  */
             |final class ${base}Parser extends GraftPlugin {
             |  override def name: String = "$rawName-parser"
             |  override def loaders = Map(
             |    "$rawName" -> { (spark: SparkSession, path: String,
             |                     options: Map[String, String]) =>
             |      val delim = options.getOrElse("delimiter", ",")
             |      spark.read.text(path).select(
             |        split(col("value"),
             |          java.util.regex.Pattern.quote(delim)).as("parts"))
             |    })
             |}
             |""".stripMargin, spiClass = Some(s"$pkg.${base}Parser"))

      case "mapper" =>
        writeComponent(pluginRoot, file(s"${base}Mapper"),
          s"""package $pkg
             |
             |import org.apache.spark.sql.DataFrame
             |
             |import graft.operators.StreamKey
             |import graft.plugins.{GraftPlugin, PluginOp}
             |
             |/** Ordered transform '$rawName' (scaffolded): usable as
             |  * { operation: plugin, name: $rawName } in a stream's
             |  * transform chain. The factory runs at config-parse time —
             |  * validate options there; keep the stage a pure frame map
             |  * (window on the stream's own key preserves the chain's
             |  * single-shuffle property).
             |  */
             |final class ${base}Mapper extends GraftPlugin {
             |  override def name: String = "$rawName-mapper"
             |  override def transforms = Map(
             |    "$rawName" -> { (options: Map[String, Any]) =>
             |      new PluginOp {
             |        def apply(df: DataFrame, key: StreamKey): DataFrame = df
             |      }
             |    })
             |}
             |""".stripMargin, spiClass = Some(s"$pkg.${base}Mapper"))

      case other =>
        throw new IllegalArgumentException(
          s"scaffold: unknown component kind '$other' " +
            s"(${ComponentKinds.mkString(" | ")})")
    }
  }

  // ---- per-entity YAML scaffolds (reference services/scaffold/
  // {source_yaml,stream_yaml}.py). The reference writes stanza files into
  // stream dirs; graft's project is ONE document, so the twin appends a
  // valid entry via the YAML mapper and re-validates the whole document —
  // scaffolding can never leave the project unparseable.

  private val mapper = new ObjectMapper(new YAMLFactory())

  // dot-separated segments, like the reference's validate_source_id
  // (source_yaml.py:70 allows `provider.dataset.variant`); single-segment
  // ids stay legal for streams
  private[plugins] def validId(id: String): String = {
    if (!id.matches("[a-z][a-z0-9_]*(\\.[a-z][a-z0-9_]*)*"))
      throw new IllegalArgumentException(
        s"scaffold: id must be dot-separated [a-z][a-z0-9_]* segments, got '$id'")
    id
  }

  private def editProject(projectYaml: Path)(
      mutate: java.util.Map[String, Object] => Unit): Unit = {
    val tree: java.util.Map[String, Object] =
      if (Files.exists(projectYaml))
        mapper.readValue(Files.readString(projectYaml),
          classOf[java.util.LinkedHashMap[String, Object]])
      else new java.util.LinkedHashMap[String, Object]()
    mutate(tree)
    val text = mapper.writeValueAsString(tree)
    graft.pipeline.Config.parseProject(text) // must stay a valid project
    Files.createDirectories(projectYaml.toAbsolutePath.getParent)
    Files.writeString(projectYaml, text)
  }

  private def section(tree: java.util.Map[String, Object],
                      key: String): java.util.List[Object] = {
    tree.computeIfAbsent(key, _ => new java.util.ArrayList[Object]())
      .asInstanceOf[java.util.List[Object]]
  }

  private def ids(entries: java.util.List[Object]): Set[String] =
    entries.asScala.collect {
      case m: java.util.Map[_, _] => m.asScala.collectFirst {
        case (k, v) if String.valueOf(k) == "id" => String.valueOf(v)
      }.getOrElse("")
    }.toSet

  /** Append a source entry (reference write_source_yaml): valid defaults,
    * duplicate ids refused like the reference's FileExistsError.
    */
  def source(projectYaml: Path, id: String, path: String,
             format: String = "parquet"): Unit = editProject(projectYaml) { tree =>
    validId(id)
    val sources = section(tree, "sources")
    if (ids(sources).contains(id))
      throw new IllegalArgumentException(s"scaffold: source id '$id' already exists")
    val reader = new java.util.LinkedHashMap[String, Object]()
    reader.put("format", format)
    val loader = new java.util.LinkedHashMap[String, Object]()
    loader.put("transport", "fs")
    loader.put("path", path)
    loader.put("reader", reader)
    val entry = new java.util.LinkedHashMap[String, Object]()
    entry.put("id", id)
    entry.put("loader", loader)
    sources.add(entry)
  }

  /** One-command project inflow (reference cli/commands/inflow.py — the
    * guided source → stream flow, composed non-interactively): append a
    * source AND its canonical stream in one step, then validate that the
    * resulting document still parses. The stream id derives from the source
    * id the reference way (layout.py source_id_parts: drop the provider
    * segment of `provider.dataset[.variant]`; undotted ids get `.stream`).
    * Any failure — duplicate id, unknown format, parse error — restores the
    * document byte-for-byte, so inflow is all-or-nothing.
    */
  def inflow(projectYaml: Path, sourceId: String, path: String,
             format: String, partitionKey: String,
             timeField: String = "time"): String = {
    val parts = sourceId.split("\\.").filter(_.nonEmpty)
    val streamId =
      if (parts.length >= 2) parts.drop(1).mkString(".")
      else s"$sourceId.stream"
    val before = if (Files.exists(projectYaml)) Some(Files.readString(projectYaml))
                 else None
    try {
      source(projectYaml, sourceId, path, format)
      stream(projectYaml, streamId, sourceId, partitionKey, timeField)
      graft.pipeline.Config.parseProject(Files.readString(projectYaml))
      streamId
    } catch {
      case e: Throwable =>
        before match {
          case Some(text) => Files.writeString(projectYaml, text)
          case None       => Files.deleteIfExists(projectYaml)
        }
        throw e
    }
  }

  /** Append a source-backed stream entry (reference write_source_stream):
    * the referenced source must exist; duplicate stream ids refused.
    */
  def stream(projectYaml: Path, id: String, sourceId: String,
             partitionKey: String, timeField: String = "time"): Unit =
    editProject(projectYaml) { tree =>
      validId(id)
      val streams = section(tree, "streams")
      if (ids(streams).contains(id))
        throw new IllegalArgumentException(s"scaffold: stream id '$id' already exists")
      if (!ids(section(tree, "sources")).contains(sourceId))
        throw new IllegalArgumentException(
          s"scaffold: stream '$id' references unknown source '$sourceId'")
      val from = new java.util.LinkedHashMap[String, Object]()
      from.put("source", sourceId)
      val map = new java.util.LinkedHashMap[String, Object]()
      map.put("time", timeField)
      val entry = new java.util.LinkedHashMap[String, Object]()
      entry.put("id", id)
      entry.put("from", from)
      entry.put("map", map)
      entry.put("partition_by", java.util.List.of[Object](partitionKey))
      streams.add(entry)
    }
}
