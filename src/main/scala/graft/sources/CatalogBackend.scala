package graft.sources

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import org.apache.spark.sql.connector.catalog.Identifier

/** The catalog's identifier-resolution seam: everything `GraftCatalog`
  * needs to know about WHERE tables live and WHICH namespaces/tables
  * exist, extracted so the storage of that mapping is pluggable — the
  * reference's `SparkCatalog` accepts `catalog-impl` / Hive / REST
  * backends the same way (`SparkCatalog.java:101-104,148-154` in
  * /root/reference). Two backends ship:
  *
  *  - [[FilesystemBackend]] (default): layout IS the metadata —
  *    `<warehouse>/<ns…>/<table>`, namespaces are directories, listing
  *    walks the tree. Zero extra state; the mapping can never drift.
  *  - [[RegistryBackend]] (`backend=registry`): a properties-file
  *    "metastore" (`<warehouse>/_graft_registry.properties`) records
  *    `table.<ns.name>=<absolute location>` and `namespace.<ns>=` keys.
  *    Locations are decoupled from layout (a table can live anywhere),
  *    listing reads the registry instead of the filesystem, and RENAME
  *    is metadata-only — the data directory never moves, exactly the
  *    semantic a Hive/REST metastore provides. This is the in-sandbox
  *    stand-in for those services (no network services here); a Hive or
  *    REST implementation would plug into this same trait.
  *
  * Mutating registry ops serialize through an atomic temp-file +
  * ATOMIC_MOVE swap keyed by the registry path, the same
  * write-temp-then-move discipline the snapshot layer uses.
  */
trait CatalogBackend {
  /** Where `ident`'s table lives — the registered location, or the
    * default layout position for a table about to be created.
    */
  def tableLocation(ident: Identifier): Path

  /** A table was created at `location` (after its first commit). */
  def recordTable(ident: Identifier, location: Path): Unit

  /** A table was dropped. */
  def forgetTable(ident: Identifier): Unit

  /** RENAME: returns the NEW location (filesystem: moved dir; registry:
    * the unchanged old location under the new name).
    */
  def renameTable(oldIdent: Identifier, newIdent: Identifier): Path

  /** Identifiers of tables in `ns` (existence of ns already checked). */
  def listTables(ns: Array[String], isTable: Path => Boolean): Seq[Identifier]

  def listNamespaces(isTable: Path => Boolean): Seq[Array[String]]
  def namespaceExists(ns: Array[String]): Boolean
  def createNamespace(ns: Array[String]): Unit

  /** Drop `ns`; `false` when it doesn't exist. `contents` = the table
    * identifiers still in it (for the non-cascade error / cascade wipe).
    */
  def dropNamespace(ns: Array[String], cascade: Boolean,
      dropTable: Identifier => Unit): Boolean
}

/** Convention-over-layout backend: `<warehouse>/<ns…>/<table>`. */
class FilesystemBackend(warehouse: String) extends CatalogBackend {
  override def tableLocation(ident: Identifier): Path =
    Paths.get(warehouse, (ident.namespace() :+ ident.name()): _*)

  override def recordTable(ident: Identifier, location: Path): Unit = ()
  override def forgetTable(ident: Identifier): Unit = ()

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Path = {
    val to = tableLocation(newIdent)
    Files.createDirectories(to.getParent)
    Files.move(tableLocation(oldIdent), to)
    to
  }

  override def listTables(ns: Array[String], isTable: Path => Boolean): Seq[Identifier] = {
    val dir = Paths.get(warehouse, ns: _*)
    graft.spatial.Snapshots.listDir(dir)(_.toSeq)
      .filter(p => isTable(p) && !p.getFileName.toString.startsWith("."))
      .map(p => Identifier.of(ns, p.getFileName.toString))
  }

  override def listNamespaces(isTable: Path => Boolean): Seq[Array[String]] = {
    val root = Paths.get(warehouse)
    if (!Files.isDirectory(root)) return Nil
    graft.spatial.Snapshots.listDir(root)(_.toSeq)
      .filter(p => Files.isDirectory(p) && !isTable(p))
      .map(p => Array(p.getFileName.toString))
  }

  override def namespaceExists(ns: Array[String]): Boolean =
    Files.isDirectory(Paths.get(warehouse, ns: _*))

  override def createNamespace(ns: Array[String]): Unit = {
    Files.createDirectories(Paths.get(warehouse, ns: _*)); ()
  }

  override def dropNamespace(ns: Array[String], cascade: Boolean,
      dropTable: Identifier => Unit): Boolean = {
    val p = Paths.get(warehouse, ns: _*)
    if (!Files.isDirectory(p)) false
    else {
      val entries = graft.spatial.Snapshots.listDir(p)(_.toSeq)
      if (entries.nonEmpty && !cascade)
        throw new IllegalStateException(s"namespace not empty: ${ns.mkString(".")}")
      graft.spatial.Snapshots.walkDir(p)(_.toSeq).reverse.foreach(Files.deleteIfExists(_))
      true
    }
  }
}

/** Properties-file registry "metastore": identifiers resolve through
  * recorded keys, not directory layout.
  */
class RegistryBackend(warehouse: String) extends CatalogBackend {
  import RegistryBackend._

  private val registry: Path = Paths.get(warehouse, RegistryFileName)

  private def key(ident: Identifier): String =
    "table." + (ident.namespace() :+ ident.name()).mkString(".")
  private def nsKey(ns: Array[String]): String = "namespace." + ns.mkString(".")

  override def tableLocation(ident: Identifier): Path =
    read(registry).get(key(ident)).map(Paths.get(_)).getOrElse(
      // default layout for a to-be-created table; becomes authoritative
      // only once recordTable writes it
      Paths.get(warehouse, (ident.namespace() :+ ident.name()): _*))

  override def recordTable(ident: Identifier, location: Path): Unit =
    update(registry)(_ + (key(ident) -> location.toAbsolutePath.toString))

  override def forgetTable(ident: Identifier): Unit =
    update(registry)(_ - key(ident))

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Path = {
    // metadata-only: the data directory stays where it is
    val loc = tableLocation(oldIdent)
    update(registry)(m => m - key(oldIdent) + (key(newIdent) -> loc.toString))
    loc
  }

  override def listTables(ns: Array[String], isTable: Path => Boolean): Seq[Identifier] = {
    val prefix = "table." + ns.mkString(".") + "."
    read(registry).keys.toSeq.sorted.collect {
      case k if k.startsWith(prefix) && !k.stripPrefix(prefix).contains('.') =>
        Identifier.of(ns, k.stripPrefix(prefix))
    }
  }

  override def listNamespaces(isTable: Path => Boolean): Seq[Array[String]] = {
    val m = read(registry)
    val declared = m.keys.collect {
      case k if k.startsWith("namespace.") => k.stripPrefix("namespace.")
    }
    val implied = m.keys.collect {
      case k if k.startsWith("table.") && k.stripPrefix("table.").contains('.') =>
        k.stripPrefix("table.").split('.').dropRight(1).mkString(".")
    }
    (declared ++ implied).toSeq.distinct.sorted.map(_.split('.').toArray)
  }

  override def namespaceExists(ns: Array[String]): Boolean =
    listNamespaces(_ => false).exists(_.sameElements(ns))

  override def createNamespace(ns: Array[String]): Unit = {
    // record the namespace AND materialize its default-layout dir, so
    // staged CTAS (which stages next to the final path) has a parent
    Files.createDirectories(Paths.get(warehouse, ns: _*))
    update(registry)(_ + (nsKey(ns) -> ""))
  }

  override def dropNamespace(ns: Array[String], cascade: Boolean,
      dropTable: Identifier => Unit): Boolean = {
    if (!namespaceExists(ns)) return false
    val tables = listTables(ns, _ => true)
    if (tables.nonEmpty && !cascade)
      throw new IllegalStateException(s"namespace not empty: ${ns.mkString(".")}")
    tables.foreach(dropTable)
    update(registry)(_ - nsKey(ns))
    true
  }
}

object RegistryBackend {
  val RegistryFileName = "_graft_registry.properties"

  /** Registry lookup for out-of-catalog resolvers (the DML parser): the
    * recorded location of `<ns….table>` under a registry-backed catalog's
    * warehouse, if any.
    */
  def lookup(warehouse: String, identTail: String): Option[String] =
    read(Paths.get(warehouse, RegistryFileName)).get(s"table.$identTail")

  private def read(p: Path): Map[String, String] =
    if (!Files.exists(p)) Map.empty
    else {
      val props = new java.util.Properties()
      val in = Files.newInputStream(p)
      try props.load(in) finally in.close()
      import scala.jdk.CollectionConverters._
      props.asScala.toMap
    }

  private val lock = new Object

  private def update(p: Path)(f: Map[String, String] => Map[String, String]): Unit =
    lock.synchronized {
      val next = f(read(p))
      val props = new java.util.Properties()
      next.foreach { case (k, v) => props.setProperty(k, v) }
      Files.createDirectories(p.getParent)
      val tmp = p.getParent.resolve(s".${p.getFileName}.${java.util.UUID.randomUUID().toString.take(8)}")
      val out = Files.newOutputStream(tmp)
      try props.store(out, "graft catalog registry") finally out.close()
      Files.move(tmp, p, StandardCopyOption.ATOMIC_MOVE,
        StandardCopyOption.REPLACE_EXISTING)
    }
}
