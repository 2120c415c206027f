package graft.spatial

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption}

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
    // whole sidecar on the next read — ONE escaper seat (GeoTable.escJson)
    val body = views.toSeq.sorted
      .map { case (k, v) =>
        "\"" + GeoTable.escJson(k) + "\":\"" + GeoTable.escJson(v) + "\""
      }
      .mkString("{", ",", "}")
    // tmp + ATOMIC_MOVE like every other sidecar writer: a reader (or a
    // crash) must never observe a truncated half-written JSON
    val target = Paths.get(path, ViewsName)
    val tmp = Paths.get(path, s".$ViewsName.${java.util.UUID.randomUUID().toString.take(8)}")
    Files.write(tmp, body.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, target, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  /** Create or replace a stored view. Fails fast if the SQL doesn't
    * analyze against the current table schema. The in-JVM lock makes the
    * read-modify-write safe against concurrent view DDL on one driver
    * (cross-process last-writer-wins, like the other sidecars).
    */
  def createOrReplace(spark: SparkSession, path: String, name: String, sql: String): Unit = {
    // Spark's parser rejects digit-leading identifiers — validating only
    // \w+ here would store a view that installAll can never register
    require(name.matches("[A-Za-z_][A-Za-z0-9_]*"), s"bad view name: $name")
    resolveSql(spark, path, sql).queryExecution.analyzed // validate
    Views.synchronized { write(path, list(path) + (name -> sql)) }
  }

  def drop(path: String, name: String): Unit = Views.synchronized {
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

  /** Bind the `graft_table` token to THIS call's snapshot under a unique
    * per-call temp-view name: a session-global "graft_table" registration
    * would race concurrent resolutions of DIFFERENT tables onto one name
    * (silently answering from the wrong table) and clobber any user temp
    * view of that name. The token is rewritten at word boundaries — a
    * string literal containing `graft_table` inside view SQL is not
    * supported (stated, not silent: the convention token is reserved).
    */
  private def resolveSql(spark: SparkSession, path: String, sql: String): DataFrame = {
    val unique = s"graft_table_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    Snapshots.read(spark, path).createOrReplaceTempView(unique)
    try spark.sql(sql.replaceAll("\\bgraft_table\\b", unique))
    finally spark.catalog.dropTempView(unique)
  }

  /** Register every stored view as a temp view (`ResolveViews` for a
    * session): afterwards plain `spark.sql("SELECT ... FROM <name>")`
    * works. One sidecar read and one snapshot resolution for ALL views,
    * not one per view.
    */
  def installAll(spark: SparkSession, path: String): Seq[String] = {
    val vs = list(path)
    val names = vs.keys.toSeq.sorted
    if (names.isEmpty) return names
    val unique = s"graft_table_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    Snapshots.read(spark, path).createOrReplaceTempView(unique)
    try names.foreach { n =>
      spark.sql(vs(n).replaceAll("\\bgraft_table\\b", unique))
        .createOrReplaceTempView(n)
    } finally spark.catalog.dropTempView(unique)
    names
  }
}
