package graft.iceberg

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.{DataFrame, SparkSession}

import java.net.{HttpURLConnection, URI, URLEncoder}
import java.nio.charset.StandardCharsets.UTF_8
import scala.jdk.CollectionConverters._

/** Iceberg REST catalog CLIENT (the published REST OpenAPI the
  * ecosystem's catalogs speak — the same protocol the reference's test
  * infra provisions at `http://127.0.0.1:8181` and attaches Spark to,
  * `scripts/provision.py:40-47`). The catalog resolves a namespaced
  * table name to its `metadata-location`; everything after that is the
  * existing direct-`.json` scan path ([[IcebergScan]] / S11's direct
  * metadata support), so every scan feature (time travel, refs,
  * pruning, MoR, DVs) works identically on catalog-resolved tables.
  *
  * Scope notes for a 100 TB deployment:
  *  - list endpoints follow `next-page-token` to exhaustion, so a
  *    catalog with 100k tables streams in pages rather than one
  *    unbounded response;
  *  - only the driver talks to the catalog (one `loadTable` per query
  *    plan) — executors never see it; data I/O goes straight to the
  *    table's storage via Hadoop FS like every other scan;
  *  - OAuth2 client-credentials (`POST v1/oauth/tokens`) and static
  *    bearer tokens are both supported; the token rides only on
  *    catalog requests, never on data paths.
  */
object RestCatalog {

  /** A connected catalog: base uri, resolved path prefix, auth token,
    * and the merged config (defaults <- client overrides <- server
    * overrides, the REST spec's merge order). */
  final case class Client(
      uri: String,
      prefix: Option[String],
      initialToken: Option[String],
      config: Map[String, String],
      connectTimeoutMs: Int = 10000,
      readTimeoutMs: Int = 30000,
      // the client_id:client_secret pair, kept ONLY when connect()
      // exchanged it — enables re-auth + retry when the issued token
      // expires mid-session (catalog answers 401)
      credential: Option[String] = None) {
    private val tokenRef =
      new java.util.concurrent.atomic.AtomicReference[Option[String]](initialToken)
    def token: Option[String] = tokenRef.get
    private[iceberg] def setToken(t: String): Unit = tokenRef.set(Some(t))
    // NOTE: copy() builds a fresh instance, so its live token re-seeds
    // from initialToken — a mid-session re-auth (401 → oauth retry) on
    // the original does NOT carry over to copies. Treat a Client as a
    // session-long singleton; reconnect() rather than copy().
    /** Secrets never render: the bearer token and the
      * client_id:client_secret pair would otherwise leak through any
      * log line or exception message that interpolates the client. */
    override def toString: String =
      s"Client($uri, prefix=$prefix, config=${config.size} keys, " +
        s"token=${initialToken.map(_ => "***")}, " +
        s"credential=${credential.map(_ => "***")})"
  }

  final case class TableRef(namespace: Seq[String], name: String) {
    override def toString: String = (namespace :+ name).mkString(".")
  }

  final case class LoadedTable(
      metadataLocation: String,
      config: Map[String, String])

  private val mapper = new ObjectMapper()

  // ---- connection ------------------------------------------------------

  /** Fetch `GET v1/config` and build a client. `credential` is the
    * OAuth2 `client_id:client_secret` pair (exchanged for a bearer
    * token first); `token` is a pre-issued static bearer. */
  def connect(
      uri: String,
      warehouse: Option[String] = None,
      credential: Option[String] = None,
      token: Option[String] = None,
      props: Map[String, String] = Map.empty): Client = {
    val base = uri.stripSuffix("/")
    val bearer = credential match {
      case Some(cred) => Some(oauthToken(base, cred))
      case None       => token
    }
    val q = warehouse.map(w => "?warehouse=" + enc(w)).getOrElse("")
    val cfg = parse(http("GET", s"$base/v1/config$q", bearer, None))
    val defaults = strMap(cfg.get("defaults"))
    val overrides = strMap(cfg.get("overrides"))
    // spec merge order: defaults lose to client-supplied, which lose to
    // server overrides
    val merged = defaults ++ props ++ overrides
    Client(base, merged.get("prefix").filter(_.nonEmpty), bearer, merged,
      credential = credential)
  }

  /** A catalog request answered 401: the bearer token expired or was
    * revoked mid-session. */
  final class UnauthorizedException(msg: String)
    extends java.io.IOException(msg)

  /** Client-scoped request: on 401, re-run the OAuth client-credentials
    * exchange (when the client holds a credential) and retry ONCE with
    * the fresh token — long-lived sessions outlive catalog token TTLs. */
  private def httpC(c: Client, method: String, url: String,
      body: Option[String],
      contentType: String = "application/json",
      headers: Map[String, String] = Map.empty): String =
    try http(method, url, c.token, body, contentType, headers)
    catch {
      case _: UnauthorizedException if c.credential.isDefined =>
        c.setToken(oauthToken(c.uri, c.credential.get))
        http(method, url, c.token, body, contentType, headers)
    }

  /** OAuth2 client-credentials exchange against the catalog's token
    * endpoint (`POST v1/oauth/tokens`, form-encoded per RFC 6749). */
  private def oauthToken(base: String, credential: String): String = {
    val (id, secret) = credential.split(":", 2) match {
      case Array(i, s) => (i, s)
      case _ => throw new IllegalArgumentException(
        "credential must be 'client_id:client_secret'")
    }
    val form = s"grant_type=client_credentials&client_id=${enc(id)}" +
      s"&client_secret=${enc(secret)}&scope=catalog"
    val node = parse(http("POST", s"$base/v1/oauth/tokens", None, Some(form),
      contentType = "application/x-www-form-urlencoded"))
    Option(node.get("access_token")).map(_.asText).getOrElse(
      throw new java.io.IOException(
        s"oauth token response carries no access_token: $node"))
  }

  // ---- catalog operations ----------------------------------------------

  /** Namespaces one level below `parent` (empty = top level), following
    * pagination to exhaustion. The spec's `parent` query parameter is the
    * unit-separator-joined namespace (`a%1Fb`), same encoding as the path
    * segments; a missing parent surfaces the server's 404. */
  def listNamespaces(c: Client, parent: Seq[String] = Seq.empty): Seq[Seq[String]] = {
    val url =
      if (parent.isEmpty) s"${root(c)}/namespaces"
      else s"${root(c)}/namespaces?parent=${nsPath(parent)}"
    paged(c, url, "namespaces") { n =>
      n.elements.asScala.map(_.asText).toSeq
    }
  }

  /** `GET v1/namespaces/{ns}` — the namespace's recorded properties.
    * 404 → FileNotFoundException (existence probes catch narrowly). */
  def loadNamespace(c: Client, namespace: Seq[String]): Map[String, String] = {
    val body = parse(httpC(c, "GET",
      s"${root(c)}/namespaces/${nsPath(namespace)}", None))
    strMap(body.get("properties"))
  }

  /** Direct existence probe — one GET, 404 → false. Never scans a
    * listing: nested namespaces (a.b) don't appear in the top-level
    * page and a big catalog's listing is O(namespaces) transfers. */
  def namespaceExists(c: Client, namespace: Seq[String]): Boolean =
    try { loadNamespace(c, namespace); true }
    catch { case _: java.io.FileNotFoundException => false }

  /** `POST v1/namespaces/{ns}/properties` — set/remove namespace
    * properties in one catalog transaction (spec
    * UpdateNamespacePropertiesRequest). */
  def updateNamespaceProperties(
      c: Client, namespace: Seq[String],
      updates: Map[String, String], removals: Seq[String]): Unit = {
    val body = mapper.createObjectNode()
    if (removals.nonEmpty) {
      val arr = body.putArray("removals")
      removals.foreach(arr.add)
    }
    if (updates.nonEmpty) {
      val up = body.putObject("updates")
      updates.foreach { case (k, v) => up.put(k, v) }
    }
    httpC(c, "POST",
      s"${root(c)}/namespaces/${nsPath(namespace)}/properties",
      Some(body.toString)): Unit
  }

  /** Tables of `namespace`, following pagination to exhaustion. */
  def listTables(c: Client, namespace: Seq[String]): Seq[TableRef] =
    paged(c, s"${root(c)}/namespaces/${nsPath(namespace)}/tables",
      "identifiers") { n =>
      TableRef(
        Option(n.get("namespace")).map(_.elements.asScala.map(_.asText).toSeq)
          .getOrElse(namespace),
        n.get("name").asText)
    }

  def tableExists(c: Client, table: String): Boolean =
    try { loadTable(c, table); true }
    catch { case _: java.io.FileNotFoundException => false }

  /** `POST v1/namespaces` — create a namespace (with properties). */
  def createNamespace(c: Client, namespace: Seq[String],
                      properties: Map[String, String] = Map.empty): Unit = {
    val body = mapper.createObjectNode()
    val arr = body.putArray("namespace")
    namespace.foreach(arr.add)
    if (properties.nonEmpty) {
      val p = body.putObject("properties")
      properties.foreach { case (k, v) => p.put(k, v) }
    }
    httpC(c, "POST", s"${root(c)}/namespaces", Some(body.toString)): Unit
  }

  /** `DELETE v1/namespaces/{ns}` — drop an (empty) namespace. */
  def dropNamespace(c: Client, namespace: Seq[String]): Unit =
    httpC(c, "DELETE", s"${root(c)}/namespaces/${nsPath(namespace)}", None): Unit

  /** loadTable + vended-credential application — the entry point scan
    * integrations outside this object (the DSv2 catalog) use to resolve
    * a table AND make its storage reachable in one step. */
  def loadTableScoped(spark: SparkSession, c: Client, table: String): LoadedTable =
    applyVended(spark, loadTable(c, table))

  /** `GET .../tables/{table}` → the table's current metadata location.
    * `table` is `ns.sub_ns.name`; the namespace part joins with the
    * spec's 0x1F unit separator in the URL. */
  def loadTable(c: Client, table: String): LoadedTable = {
    val ref = parseRef(table)
    loaded(table, parse(httpC(c, "GET",
      s"${root(c)}/namespaces/${nsPath(ref.namespace)}/tables/${enc(ref.name)}",
      None,
      // REST spec access delegation: ask the catalog to vend short-lived
      // storage credentials in the LoadTableResult config
      headers = Map("X-Iceberg-Access-Delegation" -> "vended-credentials"))))
  }

  /** VENDED CREDENTIALS (REST spec access delegation): translate the
    * storage properties a catalog returns in `LoadTableResult.config`
    * into Hadoop filesystem settings — the standard Iceberg `s3.*` keys
    * map to their `fs.s3a.*` equivalents, and any `hadoop.`-prefixed key
    * passes through verbatim (catalog-driven FS configuration). Unknown
    * keys are ignored (they configure FileIO features this engine does
    * not use). */
  def vendedHadoopProps(config: Map[String, String]): Map[String, String] = {
    val s3Map = Map(
      "s3.access-key-id" -> "fs.s3a.access.key",
      "s3.secret-access-key" -> "fs.s3a.secret.key",
      "s3.session-token" -> "fs.s3a.session.token",
      "s3.endpoint" -> "fs.s3a.endpoint",
      "s3.path-style-access" -> "fs.s3a.path.style.access",
      "client.region" -> "fs.s3a.endpoint.region")
    config.flatMap { case (k, v) =>
      s3Map.get(k).map(_ -> v)
        .orElse(if (k.startsWith("hadoop.")) Some(k.stripPrefix("hadoop.") -> v)
                else None)
    }
  }

  /** Apply a loaded table's vended storage credentials to the SESSION so
    * the subsequent scan's Hadoop configuration (and every executor task
    * deriving from it) can reach the table's storage. Session-scoped by
    * design — the credentials a catalog vends are per-principal, exactly
    * the session's scope. */
  private def applyVended(spark: SparkSession, t: LoadedTable): LoadedTable = {
    // bare hadoop keys: sessionState.newHadoopConf() copies session SQL
    // conf entries into the Hadoop configuration VERBATIM (the
    // spark.hadoop.* prefix is only stripped from the STATIC SparkConf
    // at context startup), so runtime-vended settings must use the
    // final key names
    val raw = vendedHadoopProps(t.config)
    // Scope rotating fs.s3a.* settings to the table's bucket
    // (fs.s3a.bucket.<b>.<suffix>, S3A per-bucket configuration) when
    // the metadata location names one. Scans are LAZY — loading a second
    // vended table before collecting the first must not re-sign the
    // first table's reads with the second's credentials, and a
    // short-lived vended token must not become the session default for
    // unrelated s3a paths. Non-s3a schemes (hadoop.* passthrough config)
    // have no per-bucket mechanism and stay session-wide.
    val bucket: Option[String] =
      try {
        val u = new URI(t.metadataLocation)
        if (Set("s3a", "s3", "s3n").contains(u.getScheme) && u.getHost != null
            && u.getHost.nonEmpty) Some(u.getHost)
        else None
      } catch { case _: Exception => None }
    def scoped(k: String): String = bucket match {
      case Some(b) if k.startsWith("fs.s3a.") =>
        s"fs.s3a.bucket.$b.${k.stripPrefix("fs.s3a.")}"
      case _ => k
    }
    val props = raw.map { case (k, v) => scoped(k) -> v }
    // When THIS table vends s3 credentials, clear the credential keys it
    // does NOT carry (at the same scope): a stale session token from a
    // previously scanned table combined with a fresh static key pair
    // signs as the wrong principal. A table that vends no s3 credentials
    // leaves the session's (possibly user-set) credentials untouched;
    // hadoop.* passthroughs are additive config, not rotating credentials.
    val credKeys = S3CredentialKeys.map(scoped)
    if (credKeys.exists(props.contains))
      credKeys.filterNot(props.contains).foreach { k =>
        scala.util.Try(spark.conf.unset(k))
      }
    props.foreach { case (k, v) => spark.conf.set(k, v) }
    t
  }

  private val S3CredentialKeys = Seq(
    "fs.s3a.access.key", "fs.s3a.secret.key", "fs.s3a.session.token")

  /** The catalog rejected a commit's requirements (HTTP 409): the
    * expected branch head moved between load and commit. */
  final class CommitConflictException(msg: String)
    extends java.io.IOException(msg)

  // ---- write path ------------------------------------------------------

  /** `POST .../namespaces/{ns}/register` — registers an EXISTING table's
    * current metadata file under a catalog name (the REST spec's
    * `register` endpoint: how engine-written or migrated tables enter a
    * catalog). */
  def registerTable(c: Client, table: String,
      metadataLocation: String): LoadedTable = {
    val ref = parseRef(table)
    val body = mapper.createObjectNode()
    body.put("name", ref.name)
    body.put("metadata-location", metadataLocation)
    loaded(table, parse(httpC(c, "POST",
      s"${root(c)}/namespaces/${nsPath(ref.namespace)}/register",
      Some(body.toString))))
  }

  /** Create a table THROUGH the catalog: run `create` (any writer op
    * that materializes an Iceberg table at `location`), then register
    * the resulting metadata file under the catalog name. */
  def createTable[A](spark: SparkSession, c: Client, table: String,
      location: String)(create: String => A): A = {
    val result = create(location)
    val meta = IcebergIO.resolveMetadataPath(
      location, spark.sessionState.newHadoopConf(), "none",
      IcebergModel.UnknownTableVersion,
      IcebergModel.DefaultTableVersionFormat, false)
    registerTable(c, table, meta)
    result
  }

  /** `DELETE .../tables/{table}` — drop the table from the catalog.
    * `purge=true` asks the catalog to also delete data/metadata (the
    * spec's `purgeRequested` flag); default false leaves storage intact
    * (the register/drop pair then moves a table between catalogs without
    * touching 100 TB of data). */
  def dropTable(c: Client, table: String, purge: Boolean = false): Unit = {
    val ref = parseRef(table)
    val q = if (purge) "?purgeRequested=true" else ""
    httpC(c, "DELETE",
      s"${root(c)}/namespaces/${nsPath(ref.namespace)}/tables/${enc(ref.name)}$q",
      None): Unit
  }

  /** `POST .../tables/rename` — rename/move a table inside the catalog
    * (metadata-location unchanged; a pure catalog-entry move). */
  def renameTable(c: Client, from: String, to: String): Unit = {
    val f = parseRef(from)
    val t = parseRef(to)
    val body = mapper.createObjectNode()
    def id(key: String, r: TableRef): Unit = {
      val n = body.putObject(key)
      val ns = n.putArray("namespace")
      r.namespace.foreach(ns.add)
      n.put("name", r.name)
    }
    id("source", f)
    id("destination", t)
    httpC(c, "POST", s"${root(c)}/tables/rename", Some(body.toString)): Unit
  }

  /** `POST .../tables/{table}` — the spec's CommitTableRequest:
    * `requirements` guard the commit (assert-table-uuid,
    * assert-ref-snapshot-id), `updates` describe it (add-snapshot,
    * set-snapshot-ref). 409 maps to [[CommitConflictException]] so
    * callers can refresh and retry. */
  def commitTable(c: Client, table: String, requirements: Seq[JsonNode],
      updates: Seq[JsonNode]): LoadedTable = {
    val ref = parseRef(table)
    val body = mapper.createObjectNode()
    val id = body.putObject("identifier")
    val nsArr = id.putArray("namespace")
    ref.namespace.foreach(nsArr.add)
    id.put("name", ref.name)
    val reqArr = body.putArray("requirements")
    requirements.foreach(reqArr.add)
    val updArr = body.putArray("updates")
    updates.foreach(updArr.add)
    val url =
      s"${root(c)}/namespaces/${nsPath(ref.namespace)}/tables/${enc(ref.name)}"
    try loaded(table, parse(httpC(c, "POST", url, Some(body.toString))))
    catch {
      case e: java.io.IOException if e.getMessage.contains("HTTP 409") =>
        throw new CommitConflictException(e.getMessage)
    }
  }

  /** Run a writer op against a catalog table and publish the resulting
    * commit(s) THROUGH the catalog — the provisioned-catalog flow the
    * reference's test infra drives (`scripts/provision.py:40-133`:
    * Spark writes, the REST catalog records each commit). The op runs
    * against the table's storage path (data/manifest/metadata writes
    * are the engine's as usual — a REST catalog never touches data);
    * the resulting new snapshots and ref moves are then POSTed as a
    * CommitTableRequest guarded by assert-table-uuid +
    * assert-ref-snapshot-id on main's pre-op head. On 409 the catalog
    * state is refreshed: if the catalog already records our head the
    * commit is a replay (success); if the catalog head is an ancestor
    * of ours the POST retries against it; anything else is a genuine
    * divergence and throws. */
  def commitThrough[A](spark: SparkSession, c: Client, table: String)(
      op: String => A): A = {
    val conf = spark.sessionState.newHadoopConf()
    val before = loadTable(c, table)
    val tablePath = tableRootOf(before.metadataLocation)
    val beforeRoot = readMetadata(before.metadataLocation, conf)
    val beforeHead = mainHead(beforeRoot)
    val beforeIds = snapshotNodes(beforeRoot).map(_.get("snapshot-id").asLong).toSet

    val result = op(tablePath)

    val afterMeta = IcebergIO.resolveMetadataPath(
      tablePath, conf, "none", IcebergModel.UnknownTableVersion,
      IcebergModel.DefaultTableVersionFormat, false)
    val afterRoot = readMetadata(afterMeta, conf)
    val afterHead = mainHead(afterRoot)
    val added = snapshotNodes(afterRoot)
      .filterNot(n => beforeIds(n.get("snapshot-id").asLong))
      .sortBy(n => Option(n.get("sequence-number")).map(_.asLong).getOrElse(0L))

    // metadata surface diffs — schema evolution, partition-spec
    // evolution, sort orders, and table properties all travel through
    // the catalog too; dropping them would leave catalog readers on a
    // stale schema after a DDL op (the one `weak` hole round 8 left)
    val schemaChanged =
      intField(afterRoot, "current-schema-id") != intField(beforeRoot, "current-schema-id") ||
        newIdNodes(beforeRoot, afterRoot, "schemas", "schema-id").nonEmpty
    val specChanged =
      intField(afterRoot, "default-spec-id") != intField(beforeRoot, "default-spec-id") ||
        newIdNodes(beforeRoot, afterRoot, "partition-specs", "spec-id").nonEmpty
    val sortOrderChanged =
      intField(afterRoot, "default-sort-order-id") != intField(beforeRoot, "default-sort-order-id") ||
        newIdNodes(beforeRoot, afterRoot, "sort-orders", "order-id").nonEmpty
    val propsChanged = propsOf(afterRoot) != propsOf(beforeRoot)

    // removal + statistics diffs (round 11) — shared by updates() and
    // the replay check
    val afterIds = snapshotNodes(afterRoot).map(_.get("snapshot-id").asLong).toSet
    val removedSnapIds = (beforeIds -- afterIds).toSeq.sorted
    val removedRefNames =
      (refsOf(beforeRoot).keySet -- refsOf(afterRoot).keySet).toSeq.sorted
    def statsById(root: JsonNode, field: String): Map[Long, JsonNode] =
      Option(root.get(field)).map(_.elements.asScala
        .flatMap(n => Option(n.get("snapshot-id")).map(_.asLong -> n)).toMap)
        .getOrElse(Map.empty)
    val (beforeStats, afterStats) =
      (statsById(beforeRoot, "statistics"), statsById(afterRoot, "statistics"))
    val newStats = afterStats
      .filter { case (id, n) => !beforeStats.get(id).contains(n) }
      .toSeq.sortBy(_._1)
    val removedStatIds = (beforeStats.keySet -- afterStats.keySet).toSeq.sorted
    val (beforePS, afterPS) = (statsById(beforeRoot, "partition-statistics"),
      statsById(afterRoot, "partition-statistics"))
    val newPartStats = afterPS
      .filter { case (id, n) => !beforePS.get(id).contains(n) }
      .toSeq.sortBy(_._1)
    val removedPartStatIds = (beforePS.keySet -- afterPS.keySet).toSeq.sorted

    def updates(): Seq[JsonNode] = {
      val out = Seq.newBuilder[JsonNode]
      // spec updates FIRST: an added snapshot may reference a new
      // schema-id, and the REST spec applies updates in request order
      newIdNodes(beforeRoot, afterRoot, "schemas", "schema-id").foreach { s =>
        val u = mapper.createObjectNode()
        u.put("action", "add-schema")
        u.set[JsonNode]("schema", s)
        intField(afterRoot, "last-column-id").foreach(u.put("last-column-id", _))
        out += u
      }
      (intField(afterRoot, "current-schema-id"), intField(beforeRoot, "current-schema-id")) match {
        case (Some(a), b) if !b.contains(a) =>
          val u = mapper.createObjectNode()
          u.put("action", "set-current-schema")
          u.put("schema-id", a)
          out += u
        case _ => ()
      }
      newIdNodes(beforeRoot, afterRoot, "partition-specs", "spec-id").foreach { s =>
        val u = mapper.createObjectNode()
        u.put("action", "add-spec")
        u.set[JsonNode]("spec", s)
        out += u
      }
      (intField(afterRoot, "default-spec-id"), intField(beforeRoot, "default-spec-id")) match {
        case (Some(a), b) if !b.contains(a) =>
          val u = mapper.createObjectNode()
          u.put("action", "set-default-spec")
          u.put("spec-id", a)
          out += u
        case _ => ()
      }
      newIdNodes(beforeRoot, afterRoot, "sort-orders", "order-id").foreach { s =>
        val u = mapper.createObjectNode()
        u.put("action", "add-sort-order")
        u.set[JsonNode]("sort-order", s)
        out += u
      }
      (intField(afterRoot, "default-sort-order-id"), intField(beforeRoot, "default-sort-order-id")) match {
        case (Some(a), b) if !b.contains(a) =>
          val u = mapper.createObjectNode()
          u.put("action", "set-default-sort-order")
          u.put("sort-order-id", a)
          out += u
        case _ => ()
      }
      val (beforeProps, afterProps) = (propsOf(beforeRoot), propsOf(afterRoot))
      val setProps = afterProps.filter { case (k, v) => !beforeProps.get(k).contains(v) }
      if (setProps.nonEmpty) {
        val u = mapper.createObjectNode()
        u.put("action", "set-properties")
        val m = u.putObject("updates")
        setProps.foreach { case (k, v) => m.put(k, v) }
        out += u
      }
      val removedProps = beforeProps.keySet -- afterProps.keySet
      if (removedProps.nonEmpty) {
        val u = mapper.createObjectNode()
        u.put("action", "remove-properties")
        val arr = u.putArray("removals")
        removedProps.toSeq.sorted.foreach(arr.add)
        out += u
      }
      added.foreach { sn =>
        val u = mapper.createObjectNode()
        u.put("action", "add-snapshot")
        u.set[JsonNode]("snapshot", sn)
        out += u
      }
      refsOf(afterRoot).foreach { case (name, (id, tpe)) =>
        if (!refsOf(beforeRoot).get(name).exists(_._1 == id)) {
          val u = mapper.createObjectNode()
          u.put("action", "set-snapshot-ref")
          u.put("ref-name", name)
          u.put("type", tpe)
          u.put("snapshot-id", id)
          out += u
        }
      }
      // REMOVALS travel too (round 11): an expire/rollback prunes
      // snapshots and a drop_ref removes refs from LOCAL metadata — a
      // catalog that never hears about them keeps serving expired
      // snapshots (whose files maintenance then deletes → readers crash)
      // and resolvable dropped refs.
      if (removedSnapIds.nonEmpty) {
        val u = mapper.createObjectNode()
        u.put("action", "remove-snapshots")
        val arr = u.putArray("snapshot-ids")
        removedSnapIds.foreach(arr.add)
        out += u
      }
      removedRefNames.foreach { name =>
        val u = mapper.createObjectNode()
        u.put("action", "remove-snapshot-ref")
        u.put("ref-name", name)
        out += u
      }
      // table statistics (spec set-statistics / remove-statistics):
      // analyze's NDV sketches must reach catalog readers — the
      // broadcast-costing consumer resolves through the catalog metadata
      newStats.foreach { case (id, node) =>
        val u = mapper.createObjectNode()
        u.put("action", "set-statistics")
        u.put("snapshot-id", id)
        u.set[JsonNode]("statistics", node)
        out += u
      }
      removedStatIds.foreach { id =>
        val u = mapper.createObjectNode()
        u.put("action", "remove-statistics")
        u.put("snapshot-id", id)
        out += u
      }
      newPartStats.foreach { case (id, node) =>
        val u = mapper.createObjectNode()
        u.put("action", "set-partition-statistics")
        u.put("snapshot-id", id)
        u.set[JsonNode]("partition-statistics", node)
        out += u
      }
      removedPartStatIds.foreach { id =>
        val u = mapper.createObjectNode()
        u.put("action", "remove-partition-statistics")
        u.put("snapshot-id", id)
        out += u
      }
      out.result()
    }
    def requirements(expectedMain: Option[Long]): Seq[JsonNode] = {
      val out = Seq.newBuilder[JsonNode]
      Option(afterRoot.get("table-uuid")).map(_.asText).foreach { uuid =>
        val r = mapper.createObjectNode()
        r.put("type", "assert-table-uuid")
        r.put("uuid", uuid)
        out += r
      }
      val r = mapper.createObjectNode()
      r.put("type", "assert-ref-snapshot-id")
      r.put("ref", "main")
      expectedMain match {
        case Some(id) => r.put("snapshot-id", id)
        case None     => r.putNull("snapshot-id")
      }
      out += r
      // guard the metadata surfaces this commit rewrites: a concurrent
      // DDL between our load and commit must 409, not be clobbered
      if (schemaChanged) intField(beforeRoot, "current-schema-id").foreach { id =>
        val a = mapper.createObjectNode()
        a.put("type", "assert-current-schema-id")
        a.put("current-schema-id", id)
        out += a
      }
      if (specChanged) intField(beforeRoot, "default-spec-id").foreach { id =>
        val a = mapper.createObjectNode()
        a.put("type", "assert-default-spec-id")
        a.put("default-spec-id", id)
        out += a
      }
      if (sortOrderChanged)
        intField(beforeRoot, "default-sort-order-id").foreach { id =>
          val a = mapper.createObjectNode()
          a.put("type", "assert-default-sort-order-id")
          a.put("default-sort-order-id", id)
          out += a
        }
      out.result()
    }
    def lineageFrom(root: JsonNode, head: Option[Long]): Set[Long] = {
      val byId = snapshotNodes(root)
        .map(n => n.get("snapshot-id").asLong -> n).toMap
      Iterator.iterate(head)(cur => cur.flatMap(byId.get).flatMap(n =>
          Option(n.get("parent-snapshot-id")).filterNot(_.isNull).map(_.asLong)))
        .takeWhile(_.isDefined).flatten.toSet
    }
    // main's lineage AFTER the op, for ancestor checks on retry
    val afterLineage: Set[Long] = lineageFrom(afterRoot, afterHead)
    val addedIds = added.map(_.get("snapshot-id").asLong)
    def idsOf(root: JsonNode, array: String, idField: String): Set[Int] =
      Option(root.get(array)).map(_.elements.asScala
        .flatMap(n => Option(n.get(idField)).map(_.asInt)).toSet)
        .getOrElse(Set.empty)
    val newSchemaIds =
      newIdNodes(beforeRoot, afterRoot, "schemas", "schema-id")
        .map(_.get("schema-id").asInt)
    val newSpecIds =
      newIdNodes(beforeRoot, afterRoot, "partition-specs", "spec-id")
        .map(_.get("spec-id").asInt)
    val newOrderIds =
      newIdNodes(beforeRoot, afterRoot, "sort-orders", "order-id")
        .map(_.get("order-id").asInt)
    // Replay check (round-10 ADVICE): our commit is in the catalog when
    // everything it ADDED is present — our snapshots in the snapshot set
    // and main's move inside now's lineage, our new schemas/specs/orders
    // by id. Requiring full surface EQUALITY with afterRoot was wrong:
    // if our commit landed but the response surfaced as a conflict, a
    // concurrent actor may legitimately move a surface PAST ours before
    // the retry reads, and the retry then re-sent an add-snapshot for an
    // already-present id. Additions travel atomically with their pointer
    // moves, so presence of the additions witnesses the whole commit. A
    // commit carrying ONLY pointer/property changes has nothing whose
    // presence can witness it — that (rare) shape keeps the strict check.
    def caughtUp(now: JsonNode): Boolean = {
      val nowSnapIds = snapshotNodes(now).map(_.get("snapshot-id").asLong).toSet
      val additionsIn =
        addedIds.forall(nowSnapIds) &&
        (afterHead == beforeHead ||
          afterHead.forall(lineageFrom(now, mainHead(now)))) &&
        newSchemaIds.forall(idsOf(now, "schemas", "schema-id")) &&
        newSpecIds.forall(idsOf(now, "partition-specs", "spec-id")) &&
        newOrderIds.forall(idsOf(now, "sort-orders", "order-id")) &&
        // removals witness by ABSENCE (snapshot ids are never re-minted;
        // a dropped ref name could legitimately be re-created, but then
        // re-sending remove-snapshot-ref is what the retry would do
        // anyway). Statistics witness by ID PRESENCE, not node equality:
        // a concurrent analyze may legitimately replace our entry before
        // the retry reads — exact-node matching would re-POST the STALE
        // sketch over the newer one (the same moved-past-ours rule the
        // schema/spec witnesses follow).
        removedSnapIds.forall(id => !nowSnapIds(id)) &&
        removedRefNames.forall(n => !refsOf(now).contains(n)) &&
        newStats.forall { case (id, _) =>
          statsById(now, "statistics").contains(id) } &&
        newPartStats.forall { case (id, _) =>
          statsById(now, "partition-statistics").contains(id) } &&
        removedStatIds.forall(id => !statsById(now, "statistics").contains(id)) &&
        removedPartStatIds.forall(id =>
          !statsById(now, "partition-statistics").contains(id))
      // `afterHead != beforeHead` alone is NOT an addition: a ROLLBACK
      // moves the head to an ANCESTOR, which is in every descendant's
      // lineage whether or not our commit landed — a backward pointer
      // move has nothing whose presence can witness it, so it keeps the
      // strict check like other pointer-only commits.
      val carriesAdditions = addedIds.nonEmpty ||
        newSchemaIds.nonEmpty || newSpecIds.nonEmpty || newOrderIds.nonEmpty ||
        removedSnapIds.nonEmpty || removedRefNames.nonEmpty ||
        newStats.nonEmpty || newPartStats.nonEmpty ||
        removedStatIds.nonEmpty || removedPartStatIds.nonEmpty
      additionsIn && (carriesAdditions || (
        // head equality only matters when OUR commit moved it (rollback);
        // a head-unchanged props/DDL commit must not fail verification
        // because a concurrent append advanced main afterwards
        (afterHead == beforeHead || mainHead(now) == afterHead) &&
        intField(now, "current-schema-id") == intField(afterRoot, "current-schema-id") &&
        intField(now, "default-spec-id") == intField(afterRoot, "default-spec-id") &&
        intField(now, "default-sort-order-id") == intField(afterRoot, "default-sort-order-id") &&
        (!propsChanged || propsOf(now) == propsOf(afterRoot))))
    }
    var expected = beforeHead
    var attempts = 0
    var done = false
    while (!done) {
      attempts += 1
      try { commitTable(c, table, requirements(expected), updates()); done = true }
      catch {
        case e: CommitConflictException =>
          val now = readMetadata(loadTable(c, table).metadataLocation, conf)
          val h = mainHead(now)
          if (caughtUp(now)) done = true // replay: already committed
          else if (attempts < 3 && h.exists(afterLineage)) expected = h
          else throw new CommitConflictException(
            s"commitThrough: catalog head $h diverged from this commit's " +
              s"lineage (head $afterHead) for $table — ${e.getMessage}")
      }
    }
    result
  }

  private def loaded(table: String, body: JsonNode): LoadedTable = {
    val loc = Option(body.get("metadata-location")).map(_.asText)
      .orElse(Option(body.get("metadata"))
        .flatMap(m => Option(m.get("metadata-location")).map(_.asText)))
      .getOrElse(throw new java.io.IOException(
        s"catalog returned no metadata-location for table $table"))
    LoadedTable(loc, strMap(body.get("config")))
  }

  /** `<root>/metadata/vN.metadata.json` → `<root>`. */
  def tableRootOf(metadataLocation: String): String = {
    val p = new org.apache.hadoop.fs.Path(metadataLocation)
    val metaDir = p.getParent
    require(metaDir != null && metaDir.getParent != null,
      s"cannot derive a table root from metadata location $metadataLocation")
    metaDir.getParent.toString
  }

  private def readMetadata(
      location: String,
      conf: org.apache.hadoop.conf.Configuration): JsonNode =
    parse(IcebergIO.readString(location, conf, gzip = location.endsWith(".gz")))

  private def snapshotNodes(root: JsonNode): Seq[JsonNode] =
    Option(root.get("snapshots")).map(_.elements.asScala.toSeq).getOrElse(Seq.empty)

  private def refsOf(root: JsonNode): Map[String, (Long, String)] =
    Option(root.get("refs")).map(_.fields.asScala.map { e =>
      e.getKey -> (e.getValue.get("snapshot-id").asLong,
        Option(e.getValue.get("type")).map(_.asText).getOrElse("branch"))
    }.toMap).getOrElse(Map.empty)

  private def mainHead(root: JsonNode): Option[Long] =
    refsOf(root).get("main").map(_._1)
      .orElse(Option(root.get("current-snapshot-id"))
        .filterNot(_.isNull).map(_.asLong).filter(_ >= 0))

  private def intField(root: JsonNode, name: String): Option[Int] =
    Option(root.get(name)).filterNot(_.isNull).map(_.asInt)

  /** Table properties as a string map (absent node → empty). */
  private def propsOf(root: JsonNode): Map[String, String] =
    strMap(root.get("properties"))

  /** Nodes of `after`'s `arrayField` whose `idField` is absent from
    * `before`'s — the add-schema / add-spec / add-sort-order payloads. */
  private def newIdNodes(before: JsonNode, after: JsonNode,
      arrayField: String, idField: String): Seq[JsonNode] = {
    def nodes(root: JsonNode): Seq[JsonNode] =
      Option(root.get(arrayField)).map(_.elements.asScala.toSeq).getOrElse(Seq.empty)
    val beforeIds = nodes(before).flatMap(n =>
      Option(n.get(idField)).map(_.asInt)).toSet
    nodes(after).filter(n =>
      Option(n.get(idField)).exists(id => !beforeIds(id.asInt)))
  }

  // ---- scan integration ------------------------------------------------

  /** Scan a catalog table: one `loadTable` round-trip on the driver,
    * then the ordinary direct-metadata scan (all [[IcebergScan.Options]]
    * apply — snapshot ids, refs, timestamps, pruning filters, modes). */
  def scan(spark: SparkSession, c: Client, table: String,
      opts: IcebergScan.Options = IcebergScan.Options()): DataFrame =
    IcebergScan.scan(spark,
      applyVended(spark, loadTable(c, table)).metadataLocation, opts)

  /** `iceberg_snapshots` over a catalog table. */
  def snapshots(spark: SparkSession, c: Client, table: String): DataFrame =
    IcebergScan.snapshots(spark,
      applyVended(spark, loadTable(c, table)).metadataLocation)

  /** `iceberg_metadata` over a catalog table. */
  def metadata(spark: SparkSession, c: Client, table: String,
      opts: IcebergScan.Options = IcebergScan.Options()): DataFrame =
    IcebergScan.metadata(spark,
      applyVended(spark, loadTable(c, table)).metadataLocation, opts)

  // ---- plumbing --------------------------------------------------------

  private def root(c: Client): String =
    c.prefix match {
      case Some(p) => s"${c.uri}/v1/${p.split("/").map(enc).mkString("/")}"
      case None    => s"${c.uri}/v1"
    }

  private def parseRef(table: String): TableRef = {
    val parts = table.split("\\.").toSeq
    require(parts.nonEmpty && parts.forall(_.nonEmpty),
      s"table must be 'namespace.name' (multi-level dotted), got '$table'")
    if (parts.size == 1) TableRef(Seq.empty, parts.head)
    else TableRef(parts.init, parts.last)
  }

  /** Multi-level namespaces join with the unit separator (0x1F) in URL
    * paths, percent-encoded — the REST spec's convention. */
  private def nsPath(ns: Seq[String]): String =
    enc(ns.mkString("\u001f"))

  private def enc(s: String): String =
    URLEncoder.encode(s, "UTF-8").replace("+", "%20")

  private def strMap(node: JsonNode): Map[String, String] =
    if (node == null || !node.isObject) Map.empty
    else node.fieldNames.asScala.map(k => k -> node.get(k).asText).toMap

  private def parse(s: String): JsonNode = mapper.readTree(s)

  /** Follow `next-page-token` until the server stops returning one.
    * Guards against a server echoing the same token forever. */
  private def paged[A](c: Client, url: String, field: String)(
      decode: JsonNode => A): Seq[A] = {
    val out = Seq.newBuilder[A]
    var token: Option[String] = None
    var seen = Set.empty[String]
    var done = false
    while (!done) {
      // the base url may already carry a query (?parent=…) — append then
      val sep = if (url.contains('?')) "&" else "?"
      val u = token match {
        case Some(t) => s"$url${sep}pageToken=${enc(t)}"
        case None    => url
      }
      val body = parse(httpC(c, "GET", u, None))
      Option(body.get(field)).foreach(_.elements.asScala.foreach(out += decode(_)))
      val next = Option(body.get("next-page-token")).map(_.asText)
        .filter(_.nonEmpty)
      next match {
        case Some(t) if seen(t) => throw new java.io.IOException(
          s"catalog pagination loop: token '$t' repeated for $url")
        case Some(t) => seen += t; token = Some(t)
        case None    => done = true
      }
    }
    out.result()
  }

  /** One HTTP exchange. Non-2xx maps to typed errors: 404 →
    * FileNotFoundException (so existence probes can catch narrowly),
    * everything else → IOException carrying the server's error JSON
    * (`{"error":{"message",...}}`) when present. */
  private def http(method: String, url: String, bearer: Option[String],
      body: Option[String], contentType: String = "application/json",
      headers: Map[String, String] = Map.empty): String = {
    val conn = new URI(url).toURL.openConnection()
      .asInstanceOf[HttpURLConnection]
    try {
      conn.setRequestMethod(method)
      conn.setConnectTimeout(10000)
      conn.setReadTimeout(30000)
      conn.setRequestProperty("Accept", "application/json")
      headers.foreach { case (k, v) => conn.setRequestProperty(k, v) }
      bearer.foreach(t => conn.setRequestProperty("Authorization", s"Bearer $t"))
      body.foreach { b =>
        conn.setDoOutput(true)
        conn.setRequestProperty("Content-Type", contentType)
        val os = conn.getOutputStream
        try os.write(b.getBytes(UTF_8)) finally os.close()
      }
      val code = conn.getResponseCode
      val stream = if (code >= 200 && code < 300) conn.getInputStream
                   else conn.getErrorStream
      val text =
        if (stream == null) ""
        else try new String(stream.readAllBytes(), UTF_8) finally stream.close()
      if (code >= 200 && code < 300) text
      else {
        val serverMsg =
          try Option(mapper.readTree(text).get("error"))
            .flatMap(e => Option(e.get("message")).map(_.asText))
          catch { case _: Exception => None }
        val msg = s"$method $url failed: HTTP $code" +
          serverMsg.map(m => s" — $m").getOrElse(
            if (text.nonEmpty) s" — $text" else "")
        if (code == 404) throw new java.io.FileNotFoundException(msg)
        else if (code == 401) throw new UnauthorizedException(msg)
        else throw new java.io.IOException(msg)
      }
    } finally conn.disconnect()
  }
}
