package graft.sources

import java.util

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{NoSuchNamespaceException, NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog.{Identifier, NamespaceChange, SupportsNamespaces, Table, TableCatalog, TableChange}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.spatial.{GeoTable, Snapshots}

/** Path-backed `TableCatalog`: `SET spark.sql.catalog.graft = …GraftCatalog`
  * (+ `…graft.warehouse = /data`) makes every graft table addressable as
  * `graft.<db>.<table>` in plain SQL — the reference's `SparkCatalog`
  * surface (`spark/v3.5/spark/src/main/java/org/apache/iceberg/spark/SparkCatalog.java`)
  * over the filesystem layout `<warehouse>/<db>/<table>`.
  *
  * Loaded lazily by Spark's CatalogManager on first reference, so runtime
  * `spark.conf.set` is enough — no session rebuild. Time travel:
  * `SELECT … FROM graft.db.t VERSION AS OF 3` resolves through
  * `loadTable(ident, version)`.
  */
class GraftCatalog extends TableCatalog with SupportsNamespaces {

  private var catalogName: String = "graft"
  private var warehouse: String = _

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    warehouse = Option(options.get("warehouse")).getOrElse(
      throw new IllegalArgumentException(
        s"catalog $name requires spark.sql.catalog.$name.warehouse"))
    graft.spatial.Geo.install(SparkSession.active)
  }

  override def name(): String = catalogName

  private def tablePath(ident: Identifier): java.nio.file.Path =
    java.nio.file.Paths.get(warehouse, (ident.namespace() :+ ident.name()): _*)

  private def isTable(p: java.nio.file.Path): Boolean =
    java.nio.file.Files.exists(p.resolve(GeoTable.ManifestName))

  override def tableExists(ident: Identifier): Boolean = isTable(tablePath(ident))

  override def loadTable(ident: Identifier): Table = {
    val p = tablePath(ident)
    if (!isTable(p)) throw new NoSuchTableException(ident)
    new GraftTable(p.toString, None)
  }

  /** `VERSION AS OF` — versions are snapshot numbers. */
  override def loadTable(ident: Identifier, version: String): Table = {
    val p = tablePath(ident)
    if (!isTable(p)) throw new NoSuchTableException(ident)
    new GraftTable(p.toString, Some(version.toInt))
  }

  /** `TIMESTAMP AS OF` — micros since epoch per the DSv2 contract. */
  override def loadTable(ident: Identifier, timestampMicros: Long): Table = {
    val p = tablePath(ident)
    if (!isTable(p)) throw new NoSuchTableException(ident)
    new GraftTable(p.toString,
      Some(Snapshots.versionAsOfTimestamp(p.toString, timestampMicros / 1000L)))
  }

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val ns = java.nio.file.Paths.get(warehouse, namespace: _*)
    if (!java.nio.file.Files.isDirectory(ns)) throw new NoSuchNamespaceException(namespace)
    val it = java.nio.file.Files.list(ns).iterator()
    val out = Array.newBuilder[Identifier]
    while (it.hasNext) {
      val p = it.next()
      if (isTable(p)) out += Identifier.of(namespace, p.getFileName.toString)
    }
    out.result()
  }

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: util.Map[String, String]): Table = {
    if (tableExists(ident)) throw new TableAlreadyExistsException(ident)
    require(partitions.isEmpty,
      "partition transforms on CREATE TABLE are not supported yet — write with GeoTable.write")
    val p = tablePath(ident)
    java.nio.file.Files.createDirectories(p)
    // an empty v1 snapshot carrying the declared schema
    Snapshots.commitCreate(p.toString,
      _ => GeoTable.manifestJson(Nil, Nil, Nil, schema = Some(schema)))
    new GraftTable(p.toString, None)
  }

  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    throw new UnsupportedOperationException(
      "ALTER TABLE via catalog is not supported — use the graft DDL extensions")

  override def dropTable(ident: Identifier): Boolean = {
    val p = tablePath(ident)
    if (!isTable(p)) false
    else {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(p).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.deleteIfExists(_))
      true
    }
  }

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit = {
    if (!tableExists(oldIdent)) throw new NoSuchTableException(oldIdent)
    if (tableExists(newIdent)) throw new TableAlreadyExistsException(newIdent)
    java.nio.file.Files.createDirectories(tablePath(newIdent).getParent)
    java.nio.file.Files.move(tablePath(oldIdent), tablePath(newIdent))
  }

  // ---- namespaces = directories under the warehouse -----------------------

  override def listNamespaces(): Array[Array[String]] = {
    val root = java.nio.file.Paths.get(warehouse)
    if (!java.nio.file.Files.isDirectory(root)) return Array.empty
    val it = java.nio.file.Files.list(root).iterator()
    val out = Array.newBuilder[Array[String]]
    while (it.hasNext) {
      val p = it.next()
      if (java.nio.file.Files.isDirectory(p) && !isTable(p))
        out += Array(p.getFileName.toString)
    }
    out.result()
  }

  override def listNamespaces(namespace: Array[String]): Array[Array[String]] =
    if (namespace.isEmpty) listNamespaces() else Array.empty

  override def namespaceExists(namespace: Array[String]): Boolean =
    java.nio.file.Files.isDirectory(java.nio.file.Paths.get(warehouse, namespace: _*))

  override def loadNamespaceMetadata(namespace: Array[String]): util.Map[String, String] = {
    if (!namespaceExists(namespace)) throw new NoSuchNamespaceException(namespace)
    util.Collections.emptyMap()
  }

  override def createNamespace(namespace: Array[String],
      metadata: util.Map[String, String]): Unit = {
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(warehouse, namespace: _*))
    ()
  }

  override def alterNamespace(namespace: Array[String], changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException("namespace properties are not supported")

  override def dropNamespace(namespace: Array[String], cascade: Boolean): Boolean = {
    val p = java.nio.file.Paths.get(warehouse, namespace: _*)
    if (!java.nio.file.Files.isDirectory(p)) false
    else {
      import scala.jdk.CollectionConverters._
      val entries = java.nio.file.Files.list(p).iterator().asScala.toSeq
      if (entries.nonEmpty && !cascade)
        throw new IllegalStateException(s"namespace not empty: ${namespace.mkString(".")}")
      java.nio.file.Files.walk(p).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.deleteIfExists(_))
      true
    }
  }
}
