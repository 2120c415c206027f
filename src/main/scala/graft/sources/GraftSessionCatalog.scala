package graft.sources

import java.util

import org.apache.spark.sql.catalyst.analysis.{NoSuchFunctionException, NoSuchNamespaceException, NoSuchTableException}
import org.apache.spark.sql.connector.catalog.{CatalogExtension, CatalogPlugin, FunctionCatalog, Identifier, NamespaceChange, StagedTable, StagingTableCatalog, SupportsNamespaces, Table, TableCatalog, TableChange}
import org.apache.spark.sql.connector.catalog.functions.UnboundFunction
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Session-catalog delegation — the reference's `SparkSessionCatalog`
  * (`spark/v3.5/spark/src/main/java/org/apache/iceberg/spark/SparkSessionCatalog.java`,
  * provider routing at :363): registered as `spark_catalog`, it serves
  * graft tables natively and DELEGATES everything else to Spark's built-in
  * session catalog, so overriding the default catalog never orphans the
  * session's ordinary parquet tables and temp/global views.
  *
  * {{{
  *   SET spark.sql.catalog.spark_catalog = graft.sources.GraftSessionCatalog
  *   SET spark.sql.catalog.spark_catalog.warehouse = /data
  * }}}
  *
  * Routing:
  *  - loads try the graft warehouse first (incl. branch_/tag_/metadata
  *    suffix identifiers), then fall through to the session catalog;
  *  - CREATE TABLE / CTAS route on `USING <provider>`: `graft` targets the
  *    warehouse (atomic staging), anything else the delegate. A non-graft
  *    CTAS through the staging face degrades to the delegate's non-atomic
  *    create-then-insert, exactly like the reference's fallback;
  *  - namespaces and functions consult both sides (delegate first for
  *    namespace DDL — the session catalog is the source of truth there).
  */
class GraftSessionCatalog extends CatalogExtension with StagingTableCatalog {

  private var catalogName: String = "spark_catalog"
  private var graftOpt: Option[GraftCatalog] = None
  private var delegate: CatalogPlugin = _

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    // warehouse present -> graft side active; absent -> pure delegation.
    // A REST-backed catalog needs no local warehouse (it arrives via the
    // service's /v1/config), so `backend=rest` + `uri` activates too.
    val restActive = Option(options.get("backend")).contains("rest") &&
      options.get("uri") != null
    graftOpt = Option(options.get("warehouse")).orElse(
        if (restActive) Some("") else None).map { _ =>
      val g = new GraftCatalog
      g.initialize(name, options)
      g
    }
  }

  override def name(): String = catalogName

  override def setDelegateCatalog(sparkSessionCatalog: CatalogPlugin): Unit =
    delegate = sparkSessionCatalog

  private def graft: GraftCatalog = graftOpt.getOrElse(
    throw new IllegalStateException(
      s"catalog $catalogName has no graft warehouse configured " +
        s"(set spark.sql.catalog.$catalogName.warehouse)"))
  private def dTables: TableCatalog = delegate.asInstanceOf[TableCatalog]
  private def dNamespaces: SupportsNamespaces = delegate.asInstanceOf[SupportsNamespaces]

  private def isGraftProvider(properties: util.Map[String, String]): Boolean =
    "graft".equalsIgnoreCase(properties.get(TableCatalog.PROP_PROVIDER))

  // ---- tables --------------------------------------------------------------

  override def tableExists(ident: Identifier): Boolean =
    graftOpt.exists(_.tableExists(ident)) || dTables.tableExists(ident)

  override def loadTable(ident: Identifier): Table =
    graftOpt.map { g =>
      try g.loadTable(ident)
      catch { case _: NoSuchTableException => dTables.loadTable(ident) }
    }.getOrElse(dTables.loadTable(ident))

  override def loadTable(ident: Identifier, version: String): Table =
    graftOpt.map { g =>
      try g.loadTable(ident, version)
      catch { case _: NoSuchTableException => dTables.loadTable(ident, version) }
    }.getOrElse(dTables.loadTable(ident, version))

  override def loadTable(ident: Identifier, timestampMicros: Long): Table =
    graftOpt.map { g =>
      try g.loadTable(ident, timestampMicros)
      catch { case _: NoSuchTableException => dTables.loadTable(ident, timestampMicros) }
    }.getOrElse(dTables.loadTable(ident, timestampMicros))

  // REFRESH TABLE must evict BOTH sides: the graft ident→Table cache
  // (snapshot pinned at load) and the delegate's relation cache
  override def invalidateTable(ident: Identifier): Unit = {
    graftOpt.foreach(_.invalidateTable(ident))
    dTables.invalidateTable(ident)
  }

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    // union: graft tables live on the warehouse filesystem, not in the
    // session catalog's store — the delegate alone would hide them. A
    // namespace NEITHER side knows stays an error (SHOW TABLES in a
    // typo'd namespace must not read as empty).
    val fromDelegate =
      try Some(dTables.listTables(namespace))
      catch { case _: NoSuchNamespaceException => None }
    val fromGraft = graftOpt.flatMap { g =>
      try Some(g.listTables(namespace))
      catch { case _: NoSuchNamespaceException => None }
    }
    if (fromDelegate.isEmpty && fromGraft.isEmpty)
      throw new NoSuchNamespaceException(namespace)
    (fromDelegate.getOrElse(Array.empty[Identifier]) ++
      fromGraft.getOrElse(Array.empty[Identifier])).distinct
  }

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: util.Map[String, String]): Table =
    if (isGraftProvider(properties)) graft.createTable(ident, schema, partitions, properties)
    else dTables.createTable(ident, schema, partitions, properties)

  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    if (graftOpt.exists(_.tableExists(ident))) graft.alterTable(ident, changes: _*)
    else dTables.alterTable(ident, changes: _*)

  override def dropTable(ident: Identifier): Boolean =
    graftOpt.exists(_.dropTable(ident)) || dTables.dropTable(ident)

  override def purgeTable(ident: Identifier): Boolean =
    graftOpt.filter(_.tableExists(ident)).map(_.purgeTable(ident))
      .getOrElse(dTables.purgeTable(ident))

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit = {
    // gate on BOTH sides: each side checks only its own store, so a
    // rename could silently shadow a live table on the other side (the
    // shadowed table becomes unreachable, reads change data with no error)
    if (tableExists(newIdent))
      throw new org.apache.spark.sql.catalyst.analysis.TableAlreadyExistsException(
        (newIdent.namespace() :+ newIdent.name()).toSeq)
    if (graftOpt.exists(_.tableExists(oldIdent))) graft.renameTable(oldIdent, newIdent)
    else dTables.renameTable(oldIdent, newIdent)
  }

  // ---- atomic CTAS routing (ref SparkSessionCatalog.stageCreate:
  // graft provider -> real staging; anything else -> the delegate's
  // plain create wrapped so commit is a no-op and abort drops it — the
  // reference's same non-atomic degradation for session-catalog tables)

  override def stageCreate(ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: util.Map[String, String]): StagedTable =
    if (isGraftProvider(properties)) graft.stageCreate(ident, schema, partitions, properties)
    else nonAtomic(ident, dTables.createTable(ident, schema, partitions, properties))

  override def stageReplace(ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: util.Map[String, String]): StagedTable =
    if (isGraftProvider(properties)) graft.stageReplace(ident, schema, partitions, properties)
    else {
      dropBothSides(ident)
      nonAtomic(ident, dTables.createTable(ident, schema, partitions, properties))
    }

  override def stageCreateOrReplace(ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: util.Map[String, String]): StagedTable =
    if (isGraftProvider(properties))
      graft.stageCreateOrReplace(ident, schema, partitions, properties)
    else {
      dropBothSides(ident)
      nonAtomic(ident, dTables.createTable(ident, schema, partitions, properties))
    }

  /** REPLACE with a NON-graft provider over an existing GRAFT table must
    * drop the graft side too: loadTable tries graft first, so a surviving
    * graft table would shadow the just-created delegate table and every
    * later read would silently serve the OLD data.
    */
  private def dropBothSides(ident: Identifier): Unit = {
    graftOpt.filter(_.tableExists(ident)).foreach(_.dropTable(ident))
    dTables.dropTable(ident)
    ()
  }

  /** The delegate's table, already created, wearing the StagedTable
    * interface: commit is a no-op, abort drops the just-created table.
    */
  private def nonAtomic(ident: Identifier, created: Table): StagedTable =
    new StagedTable with org.apache.spark.sql.connector.catalog.SupportsWrite {
      override def name(): String = created.name()
      override def schema(): StructType = created.schema()
      override def capabilities(): util.Set[org.apache.spark.sql.connector.catalog.TableCapability] =
        created.capabilities()
      override def newWriteBuilder(info: org.apache.spark.sql.connector.write.LogicalWriteInfo)
          : org.apache.spark.sql.connector.write.WriteBuilder = created match {
        case w: org.apache.spark.sql.connector.catalog.SupportsWrite =>
          w.newWriteBuilder(info)
        case _ => throw new UnsupportedOperationException(
          s"table ${created.name()} does not support writes") // not a raw CCE
      }
      override def commitStagedChanges(): Unit = ()
      override def abortStagedChanges(): Unit = { dTables.dropTable(ident); () }
    }

  // ---- namespaces: the session catalog owns them; graft's warehouse
  // directories are created alongside so graft CTAS into a session
  // namespace has somewhere to land

  override def listNamespaces(): Array[Array[String]] = dNamespaces.listNamespaces()

  override def listNamespaces(namespace: Array[String]): Array[Array[String]] =
    dNamespaces.listNamespaces(namespace)

  override def namespaceExists(namespace: Array[String]): Boolean =
    dNamespaces.namespaceExists(namespace) ||
      graftOpt.exists(_.namespaceExists(namespace))

  override def loadNamespaceMetadata(namespace: Array[String]): util.Map[String, String] =
    try dNamespaces.loadNamespaceMetadata(namespace)
    catch {
      case e: NoSuchNamespaceException =>
        if (graftOpt.exists(_.namespaceExists(namespace))) util.Collections.emptyMap()
        else throw e
    }

  override def createNamespace(namespace: Array[String],
      metadata: util.Map[String, String]): Unit = {
    dNamespaces.createNamespace(namespace, metadata)
    graftOpt.foreach(_.createNamespace(namespace, metadata))
  }

  override def alterNamespace(namespace: Array[String], changes: NamespaceChange*): Unit =
    dNamespaces.alterNamespace(namespace, changes: _*)

  override def dropNamespace(namespace: Array[String], cascade: Boolean): Boolean = {
    val g = graftOpt.exists(g => g.namespaceExists(namespace) && g.dropNamespace(namespace, cascade))
    val d = dNamespaces.namespaceExists(namespace) && dNamespaces.dropNamespace(namespace, cascade)
    g || d
  }

  // ---- functions: graft's transform registry first (root/system ns),
  // then the session catalog's builtin/registered functions

  override def listFunctions(namespace: Array[String]): Array[Identifier] = {
    val fromGraft = graftOpt.map { g =>
      try g.listFunctions(namespace)
      catch { case _: NoSuchNamespaceException => Array.empty[Identifier] }
    }.getOrElse(Array.empty[Identifier])
    val fromDelegate =
      try delegate.asInstanceOf[FunctionCatalog].listFunctions(namespace)
      catch { case _: NoSuchNamespaceException => Array.empty[Identifier] }
    (fromGraft ++ fromDelegate).distinct
  }

  override def loadFunction(ident: Identifier): UnboundFunction =
    graftOpt.flatMap { g =>
      try Some(g.loadFunction(ident))
      catch { case _: NoSuchFunctionException => None }
    }.getOrElse(delegate.asInstanceOf[FunctionCatalog].loadFunction(ident))

  override def functionExists(ident: Identifier): Boolean =
    graftOpt.exists(_.functionExists(ident)) ||
      delegate.asInstanceOf[FunctionCatalog].functionExists(ident)
}
