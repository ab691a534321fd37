package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import graft.streaming.EventStreams

/** A PERSISTENT CATALOG for graft tables (round 17): until now
  * `CREATE TABLE ... USING graft` registered only in the session
  * catalog — gone when the session ends, invisible to `SHOW TABLES`
  * elsewhere, re-declared by every job. This `TableCatalog` plugs into
  * Spark's catalog manager:
  *
  * {{{
  *   spark.sql.catalog.graft           = graft.sources.GraftCatalog
  *   spark.sql.catalog.graft.warehouse = /shared/warehouse
  * }}}
  *
  * after which `CREATE TABLE graft.default.events USING graft
  * OPTIONS (path '...')`, `SELECT ... FROM graft.default.events`,
  * `SHOW TABLES IN graft.default`, `DELETE`/`MERGE`/`UPDATE`, and
  * `DROP TABLE` all resolve through it — from ANY session configured
  * with the same warehouse.
  *
  * DESIGN — the catalog stores POINTERS, never state: one tiny file
  * `<warehouse>/_catalog/<namespace>/<table>` whose content is the
  * table dir (the table's own manifest chain remains the single
  * source of truth for schema, layout and every contract). All tables
  * are EXTERNAL by construction: `createTable` requires an existing
  * committed graft dir (`path`/`location`), CTAS reaches the write
  * surface and refuses with the commit-protocol remediation (data
  * lands through the committed merge API, then registers), and
  * `dropTable` removes only the pointer — never committed data (that
  * is the retention/vacuum machinery's job). Registration is one
  * create-exclusive write (concurrent CREATEs race safely: one wins,
  * the loser gets the standard already-exists error).
  */
class GraftCatalog extends TableCatalog {

  private var catalogName: String = _
  private var warehouse: Path = _

  override def initialize(name: String,
                          options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    warehouse = new Path(Option(options.get("warehouse")).getOrElse(
      throw new IllegalArgumentException(
        s"the graft catalog '$name' needs a warehouse: set " +
          s"spark.sql.catalog.$name.warehouse to a shared dir")))
  }

  override def name(): String = catalogName

  private def spark: SparkSession = SparkSession.active

  private def fs = warehouse.getFileSystem(
    spark.sparkContext.hadoopConfiguration)

  private def registryDir(namespace: Array[String]): Path = {
    require(namespace.length == 1,
      s"the graft catalog holds one-level namespaces; got " +
        s"[${namespace.mkString(".")}]")
    new Path(new Path(warehouse, "_catalog"), namespace.head)
  }

  private def entryPath(ident: Identifier): Path =
    new Path(registryDir(ident.namespace()), ident.name())

  private def readEntry(ident: Identifier): Option[String] = {
    val p = entryPath(ident)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try Some(new String(in.readAllBytes(), "UTF-8").trim)
      finally in.close()
    }
  }

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val dir = registryDir(namespace)
    if (!fs.exists(dir)) Array.empty
    else fs.listStatus(dir).filter(_.isFile)
      .map(s => Identifier.of(namespace, s.getPath.getName)).sortBy(_.name)
  }

  override def tableExists(ident: Identifier): Boolean =
    readEntry(ident).isDefined

  override def loadTable(ident: Identifier): Table = {
    val dir = readEntry(ident).getOrElse(
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchTableException(
        ident.asMultipartIdentifier))
    new GraftTable(spark,
      new CaseInsensitiveStringMap(java.util.Map.of("path", dir)),
      Seq(dir), None)
  }

  override def createTable(ident: Identifier, schema: StructType,
                           partitions: Array[Transform],
                           properties: java.util.Map[String, String]): Table = {
    require(partitions.isEmpty,
      "graft tables carry their layout in the manifest (bucketed by " +
        "key hash); PARTITIONED BY does not apply")
    val dir = Option(properties.get("path"))
      .orElse(Option(properties.get(TableCatalog.PROP_LOCATION)))
      .getOrElse(throw new IllegalArgumentException(
        "a graft catalog table is a POINTER to a committed table dir: " +
          "pass OPTIONS (path '<dir>') or LOCATION — data lands through " +
          "the committed merge API (EventStreams.mergeBatchIntoTable), " +
          "then registers"))
    require(EventStreams.latestCommittedBatchId(spark, dir).isDefined,
      s"$dir holds no committed graft manifest; commit one " +
        "mergeBatchIntoTable there first (the catalog never creates " +
        "table state — the manifest chain is the source of truth)")
    fs.mkdirs(registryDir(ident.namespace()))
    val p = entryPath(ident)
    try {
      val out = fs.create(p, false) // create-exclusive: one winner
      try out.write(dir.getBytes("UTF-8")) finally out.close()
    } catch {
      case _: java.io.IOException if fs.exists(p) =>
        throw new org.apache.spark.sql.catalyst.analysis.TableAlreadyExistsException(
          ident.asMultipartIdentifier)
    }
    loadTable(ident)
  }

  override def alterTable(ident: Identifier,
                          changes: TableChange*): Table =
    throw new UnsupportedOperationException(
      "graft table evolution commits through the API " +
        "(EventStreams.renameColumn / dropColumn / compactUpsertTable) " +
        "— manifest commits, not catalog metadata")

  override def dropTable(ident: Identifier): Boolean = {
    // drops the POINTER only: committed data outlives its catalog
    // entry (retention/vacuum own data lifecycle)
    val existed = readEntry(ident).isDefined
    if (existed) fs.delete(entryPath(ident), false)
    existed
  }

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit = {
    val dir = readEntry(oldIdent).getOrElse(
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchTableException(
        oldIdent.asMultipartIdentifier))
    fs.mkdirs(registryDir(newIdent.namespace()))
    val dest = entryPath(newIdent)
    try {
      val out = fs.create(dest, false)
      try out.write(dir.getBytes("UTF-8")) finally out.close()
    } catch {
      case _: java.io.IOException if fs.exists(dest) =>
        throw new org.apache.spark.sql.catalyst.analysis.TableAlreadyExistsException(
          newIdent.asMultipartIdentifier)
    }
    fs.delete(entryPath(oldIdent), false)
    ()
  }

  private implicit class IdentOps(ident: Identifier) {
    def asMultipartIdentifier: Seq[String] =
      ident.namespace().toSeq :+ ident.name()
  }
}
