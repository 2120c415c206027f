package graft.spatial

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Table-scoped stored views: named SQL definitions persisted next to the
  * table (`_graft_views.json`) and resolved on demand — the path-based
  * analogue of the reference's view support (`ResolveViews` rule +
  * view metadata in /root/reference). Inside a view's SQL the token
  * `graft_table` refers to the owning table's current snapshot, so a view
  * always tracks the table head (and applies its MoR deletes).
  */
object Views {

  val ViewsName = "_graft_views.json"

  def list(path: String): Map[String, String] = {
    val p = Paths.get(path, ViewsName)
    if (!Files.exists(p)) Map.empty
    else {
      import org.json4s._
      import org.json4s.jackson.JsonMethods
      JsonMethods.parse(new String(Files.readAllBytes(p), StandardCharsets.UTF_8)) match {
        case JObject(kv) => kv.collect { case (k, JString(v)) => k -> v }.toMap
        case _ => Map.empty
      }
    }
  }

  private def write(path: String, views: Map[String, String]): Unit = {
    // control chars must escape too: view SQL is typically MULTI-LINE,
    // and a raw newline inside a JSON string makes Jackson reject the
    // whole sidecar on the next read (same bug class as TableSchema.esc)
    def esc(s: String) = s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }
    val body = views.toSeq.sorted
      .map { case (k, v) => "\"" + esc(k) + "\":\"" + esc(v) + "\"" }
      .mkString("{", ",", "}")
    Files.write(Paths.get(path, ViewsName), body.getBytes(StandardCharsets.UTF_8))
  }

  /** Create or replace a stored view. Fails fast if the SQL doesn't
    * analyze against the current table schema.
    */
  def createOrReplace(spark: SparkSession, path: String, name: String, sql: String): Unit = {
    require(name.matches("\\w+"), s"bad view name: $name")
    resolveSql(spark, path, sql).queryExecution.analyzed // validate
    write(path, list(path) + (name -> sql))
  }

  def drop(path: String, name: String): Unit = {
    val vs = list(path)
    require(vs.contains(name), s"no such view: $name")
    write(path, vs - name)
  }

  /** Resolve a stored view to a DataFrame against the table's CURRENT
    * snapshot.
    */
  def read(spark: SparkSession, path: String, name: String): DataFrame = {
    val sql = list(path).getOrElse(name,
      throw new IllegalArgumentException(s"no such view: $name"))
    resolveSql(spark, path, sql)
  }

  private def resolveSql(spark: SparkSession, path: String, sql: String): DataFrame = {
    Snapshots.read(spark, path).createOrReplaceTempView("graft_table")
    spark.sql(sql)
  }

  /** Register every stored view as a temp view (`ResolveViews` for a
    * session): afterwards plain `spark.sql("SELECT ... FROM <name>")`
    * works.
    */
  def installAll(spark: SparkSession, path: String): Seq[String] = {
    val names = list(path).keys.toSeq.sorted
    names.foreach(n => read(spark, path, n).createOrReplaceTempView(n))
    names
  }
}
