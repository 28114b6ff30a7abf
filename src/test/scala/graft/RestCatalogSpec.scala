package graft

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.Files

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.iceberg.{IcebergScan, IcebergWriter, RestCatalog}
import graft.iceberg.IcebergScan.Options

/** REST catalog client against an in-process loopback server speaking
  * the Iceberg REST OpenAPI — the sandbox-feasible analogue of the
  * reference's provisioned catalog (`scripts/provision.py:40-47`
  * attaches Spark to `http://127.0.0.1:8181`). Tables are real
  * [[IcebergWriter]] tables on disk; the server only maps names to
  * their `metadata-location`, exactly a catalog's job. */
class RestCatalogSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val Sf = "/root/testdata/sf0.001"

  lazy val spark: SparkSession =
    GraftSessions.builder("local[4]", "4")
      .appName("graft-restcatalog")
      .getOrCreate()

  private var server: HttpServer = _
  private def uri: String =
    s"http://127.0.0.1:${server.getAddress.getPort}"

  // name -> metadata-location, mutated as tests create tables
  private val tables = scala.collection.concurrent.TrieMap.empty[String, String]
  // namespace tree with properties (round 12: nested levels + pagination)
  private val nsStore = scala.collection.concurrent.TrieMap[Seq[String], Map[String, String]](
    Seq("analytics") -> Map.empty, Seq("analytics", "raw") -> Map.empty)
  @volatile private var nsPages = 1 // split namespace listings into N pages
  @volatile private var lastAuthHeader: Option[String] = None
  @volatile private var tablePages = 1 // split listTables into N pages
  // token-expiry simulation: when enforceToken is on, only the CURRENT
  // token authorizes; rotating currentToken invalidates issued bearers
  @volatile private var enforceToken = false
  @volatile private var currentToken = "tok-123"
  // extra LoadTableResult.config entries (vended-credentials simulation)
  @volatile private var vendedConfig = Map.empty[String, String]
  @volatile private var lastAccessDelegation: Option[String] = None
  @volatile private var injectConflictOnce = false // fail the next commit POST
  // apply the next commit server-side but answer 409 (landed, response
  // lost) — the replay-detection scenario
  @volatile private var applyThenConflictOnce = false
  @volatile private var commitPosts = 0
  @volatile private var lastCommitActions = Seq.empty[String] // last POST's update actions

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  /** The server's storage-backed view of one table's CURRENT metadata
    * (it reads the file it last served — a catalog's source of truth). */
  private def serverMetadata(loc: String): com.fasterxml.jackson.databind.JsonNode =
    mapper.readTree(java.nio.file.Files.readString(
      java.nio.file.Paths.get(loc.stripPrefix("file:"))))

  private def serverMainHead(meta: com.fasterxml.jackson.databind.JsonNode): Option[Long] =
    Option(meta.get("refs")).flatMap(r => Option(r.get("main")))
      .map(_.get("snapshot-id").asLong)
      .orElse(Option(meta.get("current-snapshot-id"))
        .filterNot(_.isNull).map(_.asLong).filter(_ >= 0))

  /** Commit handler: validate requirements against the stored metadata,
    * then "apply updates" the way a storage-backed catalog does — resolve
    * the table's newest metadata file and verify it carries the committed
    * snapshots/refs. */
  private def handleCommit(x: HttpExchange, name: String): Unit = {
    val body = mapper.readTree(new String(x.getRequestBody.readAllBytes(), UTF_8))
    tables.get(name) match {
      case None => respond(x, 404,
        s"""{"error":{"message":"Table does not exist: analytics.$name","type":"NoSuchTableException","code":404}}""")
      case Some(loc) =>
        commitPosts += 1
        if (injectConflictOnce) {
          injectConflictOnce = false
          respond(x, 409,
            """{"error":{"message":"injected: concurrent update","type":"CommitFailedException","code":409}}""")
          return
        }
        if (applyThenConflictOnce) {
          applyThenConflictOnce = false
          // the storage backend already holds the new metadata (the op
          // wrote it) — the catalog APPLIES the commit, then the response
          // is lost and the client sees a conflict
          val root0 = new java.io.File(loc.stripPrefix("file:"))
            .getParentFile.getParentFile
          val hint0 = new java.io.File(root0, "metadata/version-hint.text")
          val v0 = java.nio.file.Files.readString(hint0.toPath).trim
          tables.put(name, s"${root0.getAbsolutePath}/metadata/v$v0.metadata.json")
          respond(x, 409,
            """{"error":{"message":"landed but response lost","type":"CommitFailedException","code":409}}""")
          return
        }
        val meta = serverMetadata(loc)
        val head = serverMainHead(meta)
        val reqs = Option(body.get("requirements")).toSeq
          .flatMap(_.elements().asScala.toSeq)
        val conflict = reqs.flatMap { r =>
          r.get("type").asText match {
            case "assert-ref-snapshot-id" if r.get("ref").asText == "main" =>
              val expected = Option(r.get("snapshot-id")).filterNot(_.isNull).map(_.asLong)
              if (expected != head)
                Some(s"requirement failed: main is at ${head.getOrElse("none")}, expected ${expected.getOrElse("none")}")
              else None
            case "assert-table-uuid" =>
              val got = Option(meta.get("table-uuid")).map(_.asText)
              if (!got.contains(r.get("uuid").asText))
                Some(s"requirement failed: table-uuid is ${got.getOrElse("none")}")
              else None
            case "assert-current-schema-id" =>
              val got = Option(meta.get("current-schema-id")).map(_.asInt)
              if (!got.contains(r.get("current-schema-id").asInt))
                Some(s"requirement failed: current-schema-id is ${got.getOrElse("none")}")
              else None
            case _ => None
          }
        }
        conflict.headOption match {
          case Some(msg) => respond(x, 409,
            s"""{"error":{"message":"$msg","type":"CommitFailedException","code":409}}""")
          case None =>
            // apply: the storage backend already holds the new metadata
            // file — resolve the newest version and serve it
            val root = new java.io.File(loc.stripPrefix("file:"))
              .getParentFile.getParentFile
            val hint = new java.io.File(root, "metadata/version-hint.text")
            val v = java.nio.file.Files.readString(hint.toPath).trim
            val newLoc = s"${root.getAbsolutePath}/metadata/v$v.metadata.json"
            val newMeta = serverMetadata(newLoc)
            val updates = Option(body.get("updates")).toSeq
              .flatMap(_.elements().asScala.toSeq)
            lastCommitActions = updates.map(_.get("action").asText)
            val committedIds = updates
              .filter(_.get("action").asText == "add-snapshot")
              .map(_.get("snapshot").get("snapshot-id").asLong)
            val storedIds = Option(newMeta.get("snapshots")).toSeq
              .flatMap(_.elements().asScala.toSeq)
              .map(_.get("snapshot-id").asLong).toSet
            // a catalog OWNS table metadata: every surface the new file
            // changes must be described by an update action, else the
            // catalog's own copy silently goes stale (the round-8 hole)
            def intF(n: com.fasterxml.jackson.databind.JsonNode, f: String) =
              Option(n.get(f)).filterNot(_.isNull).map(_.asInt)
            def props(n: com.fasterxml.jackson.databind.JsonNode) =
              Option(n.get("properties")).map(p =>
                p.fields().asScala.map(e => e.getKey -> e.getValue.asText).toMap)
                .getOrElse(Map.empty[String, String])
            val undescribed =
              (if (intF(newMeta, "current-schema-id") != intF(meta, "current-schema-id") &&
                   !lastCommitActions.contains("set-current-schema"))
                 Seq("schema change not published") else Seq.empty) ++
              (if (intF(newMeta, "default-spec-id") != intF(meta, "default-spec-id") &&
                   !lastCommitActions.contains("set-default-spec"))
                 Seq("spec change not published") else Seq.empty) ++
              (if (props(newMeta) != props(meta) &&
                   !lastCommitActions.exists(a =>
                     a == "set-properties" || a == "remove-properties"))
                 Seq("property change not published") else Seq.empty)
            if (!committedIds.forall(storedIds))
              respond(x, 400,
                """{"error":{"message":"add-snapshot refers to a snapshot the storage does not hold","code":400}}""")
            else if (undescribed.nonEmpty)
              respond(x, 400,
                s"""{"error":{"message":"${undescribed.mkString("; ")}","code":400}}""")
            else {
              tables.put(name, newLoc)
              respond(x, 200, s"""{"metadata-location":"$newLoc","metadata":{}}""")
            }
        }
    }
  }

  private def respond(x: HttpExchange, code: Int, body: String): Unit = {
    val b = body.getBytes(UTF_8)
    x.getResponseHeaders.set("Content-Type", "application/json")
    x.sendResponseHeaders(code, if (b.isEmpty) -1 else b.length)
    if (b.nonEmpty) { val os = x.getResponseBody; os.write(b); os.close() }
    x.close()
  }

  override def beforeAll(): Unit = {
    server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/v1/oauth/tokens", (x: HttpExchange) => {
      val form = new String(x.getRequestBody.readAllBytes(), UTF_8)
      if (form.contains("client_id=graft") && form.contains("client_secret=s3cret"))
        respond(x, 200,
          s"""{"access_token":"$currentToken","token_type":"bearer","expires_in":3600}""")
      else respond(x, 401,
        """{"error":{"message":"bad client credentials","type":"NotAuthorizedException","code":401}}""")
    })
    server.createContext("/v1/config", (x: HttpExchange) => {
      lastAuthHeader =
        Option(x.getRequestHeaders.getFirst("Authorization"))
      respond(x, 200,
        """{"defaults":{"warehouse":"file:///tmp","clients":"4"},"overrides":{"prefix":"ws/main"}}""")
    })
    // everything under the prefix: namespaces + tables
    server.createContext("/v1/ws/main/", (x: HttpExchange) => {
      lastAuthHeader = Option(x.getRequestHeaders.getFirst("Authorization"))
      if (enforceToken && !lastAuthHeader.contains(s"Bearer $currentToken")) {
        respond(x, 401,
          """{"error":{"message":"token expired","type":"NotAuthorizedException","code":401}}""")
      } else handleWsMain(x)
    })
    server.start()
  }

  private def handleWsMain(x: HttpExchange): Unit = {
      val path = x.getRequestURI.getPath.stripPrefix("/v1/ws/main/")
      val query = Option(x.getRequestURI.getQuery).getOrElse("")
      val isPost = x.getRequestMethod == "POST"
      path match {
        case "namespaces/analytics/register" if isPost =>
          val body = mapper.readTree(
            new String(x.getRequestBody.readAllBytes(), UTF_8))
          val name = body.get("name").asText
          val loc = body.get("metadata-location").asText
          if (tables.putIfAbsent(name, loc).isDefined)
            respond(x, 409,
              s"""{"error":{"message":"Table already exists: analytics.$name","type":"AlreadyExistsException","code":409}}""")
          else respond(x, 200, s"""{"metadata-location":"$loc","metadata":{}}""")
        case "tables/rename" if isPost =>
          val body = mapper.readTree(
            new String(x.getRequestBody.readAllBytes(), UTF_8))
          val src = body.get("source").get("name").asText
          val dst = body.get("destination").get("name").asText
          tables.remove(src) match {
            case Some(loc) if tables.putIfAbsent(dst, loc).isEmpty =>
              respond(x, 204, "")
            case Some(loc) => // destination taken: restore source
              tables.put(src, loc)
              respond(x, 409,
                s"""{"error":{"message":"Table already exists: analytics.$dst","code":409}}""")
            case None => respond(x, 404,
              s"""{"error":{"message":"Table does not exist: analytics.$src","code":404}}""")
          }
        case p if x.getRequestMethod == "DELETE" &&
            p.startsWith("namespaces/analytics/tables/") =>
          val name = p.stripPrefix("namespaces/analytics/tables/")
          if (tables.remove(name).isDefined) respond(x, 204, "")
          else respond(x, 404,
            s"""{"error":{"message":"Table does not exist: analytics.$name","code":404}}""")
        case p if isPost && p.startsWith("namespaces/analytics/tables/") =>
          handleCommit(x, p.stripPrefix("namespaces/analytics/tables/"))
        case "namespaces" if isPost =>
          val body = mapper.readTree(
            new String(x.getRequestBody.readAllBytes(), UTF_8))
          val ns = body.get("namespace").elements.asScala.map(_.asText).toSeq
          val props = Option(body.get("properties")).map(p =>
            p.fields().asScala.map(e => e.getKey -> e.getValue.asText).toMap)
            .getOrElse(Map.empty[String, String])
          if (nsStore.putIfAbsent(ns, props).isDefined)
            respond(x, 409,
              s"""{"error":{"message":"Namespace already exists: ${ns.mkString(".")}","code":409}}""")
          else respond(x, 200, s"""{"namespace":[${ns.map(n => s""""$n"""").mkString(",")}]}""")
        case "namespaces" =>
          // children ONE level below `parent` (spec semantics), paginated
          val parent = query.split("&").toSeq
            .find(_.startsWith("parent=")).map(_.stripPrefix("parent="))
            .map(p => java.net.URLDecoder.decode(p, "UTF-8")
              .split('\u001f').toSeq).getOrElse(Seq.empty)
          val all = nsStore.keys.toSeq
            .filter(ns => ns.size == parent.size + 1 && ns.startsWith(parent))
            .sortBy(_.mkString("."))
          val pages = all.grouped(math.max(1, math.ceil(
            all.size.toDouble / nsPages).toInt)).toSeq
          val pageIdx = query.split("&").toSeq
            .find(_.startsWith("pageToken=")).map(_.stripPrefix("pageToken=").toInt)
            .getOrElse(0)
          val page = pages.lift(pageIdx).getOrElse(Seq.empty)
            .map(ns => s"""[${ns.map(n => s""""$n"""").mkString(",")}]""")
          val next =
            if (pageIdx + 1 < pages.size) s""","next-page-token":"${pageIdx + 1}""""
            else ""
          if (parent.nonEmpty && !nsStore.contains(parent))
            respond(x, 404,
              s"""{"error":{"message":"Namespace does not exist: ${parent.mkString(".")}","code":404}}""")
          else respond(x, 200, s"""{"namespaces":[${page.mkString(",")}]$next}""")
        case p if isPost && p.startsWith("namespaces/") && p.endsWith("/properties") &&
            !p.contains("/tables") =>
          val ns = p.stripPrefix("namespaces/").stripSuffix("/properties")
            .split('\u001f').toSeq
          nsStore.get(ns) match {
            case None => respond(x, 404,
              s"""{"error":{"message":"Namespace does not exist: ${ns.mkString(".")}","code":404}}""")
            case Some(props) =>
              val body = mapper.readTree(
                new String(x.getRequestBody.readAllBytes(), UTF_8))
              val removals = Option(body.get("removals")).toSeq
                .flatMap(_.elements.asScala.map(_.asText).toSeq)
              val updates = Option(body.get("updates")).map(u =>
                u.fields().asScala.map(e => e.getKey -> e.getValue.asText).toMap)
                .getOrElse(Map.empty[String, String])
              nsStore.put(ns, props -- removals ++ updates)
              respond(x, 200,
                s"""{"updated":[${updates.keys.map(k => s""""$k"""").mkString(",")}],"removed":[${removals.map(k => s""""$k"""").mkString(",")}]}""")
          }
        case p if x.getRequestMethod == "DELETE" && p.startsWith("namespaces/") &&
            !p.contains("/tables") =>
          val ns = p.stripPrefix("namespaces/").split('\u001f').toSeq
          if (nsStore.remove(ns).isDefined) respond(x, 204, "")
          else respond(x, 404,
            s"""{"error":{"message":"Namespace does not exist: ${ns.mkString(".")}","code":404}}""")
        case p if !isPost && p.startsWith("namespaces/") && !p.contains("/tables") &&
            !p.endsWith("/register") =>
          val ns = p.stripPrefix("namespaces/").split('\u001f').toSeq
          nsStore.get(ns) match {
            case Some(props) =>
              val pj = props.map { case (k, v) => s""""$k":"$v"""" }.mkString(",")
              respond(x, 200,
                s"""{"namespace":[${ns.map(n => s""""$n"""").mkString(",")}],"properties":{$pj}}""")
            case None => respond(x, 404,
              s"""{"error":{"message":"Namespace does not exist: ${ns.mkString(".")}","code":404}}""")
          }
        case "namespaces/analytics/tables" =>
          val names = tables.keys.toSeq.sorted
          val pages = names.grouped(math.max(1, math.ceil(
            names.size.toDouble / tablePages).toInt)).toSeq
          val pageIdx = if (query.contains("pageToken=")) {
            query.split("pageToken=")(1).takeWhile(_ != '&').toInt
          } else 0
          val ids = pages.lift(pageIdx).getOrElse(Seq.empty)
            .map(n => s"""{"namespace":["analytics"],"name":"$n"}""")
          val next =
            if (pageIdx + 1 < pages.size) s""","next-page-token":"${pageIdx + 1}""""
            else ""
          respond(x, 200, s"""{"identifiers":[${ids.mkString(",")}]$next}""")
        case p if p.startsWith("namespaces/analytics/tables/") =>
          val name = p.stripPrefix("namespaces/analytics/tables/")
          lastAccessDelegation =
            Option(x.getRequestHeaders.getFirst("X-Iceberg-Access-Delegation"))
          tables.get(name) match {
            case Some(loc) =>
              val cfg = (Map("read.split.target-size" -> "134217728") ++
                vendedConfig).map { case (k, v) => s""""$k":"$v"""" }.mkString(",")
              respond(x, 200,
                s"""{"metadata-location":"$loc","config":{$cfg}}""")
            case None => respond(x, 404,
              s"""{"error":{"message":"Table does not exist: analytics.$name","type":"NoSuchTableException","code":404}}""")
          }
        case _ => respond(x, 404, """{"error":{"message":"no route","code":404}}""")
      }
  }

  override def afterAll(): Unit = {
    if (server != null) server.stop(0)
    spark.stop()
  }

  private def createTable(name: String): String = {
    val dir = Files.createTempDirectory(s"graft_rest_${name}_").toString
    val path = s"$dir/$name"
    IcebergWriter.write(Tables.load(spark, Sf, "orders"), path)
    // register under the CURRENT metadata json (what a catalog serves)
    val conf = spark.sessionState.newHadoopConf()
    val meta = graft.iceberg.IcebergIO.resolveMetadataPath(
      path, conf, "none",
      graft.iceberg.IcebergModel.UnknownTableVersion,
      graft.iceberg.IcebergModel.DefaultTableVersionFormat, false)
    tables.put(name, meta)
    path
  }

  test("connect merges config and picks up the server's prefix") {
    val c = RestCatalog.connect(uri, warehouse = Some("wh1"),
      props = Map("clients" -> "8"))
    assert(c.prefix === Some("ws/main"))
    assert(c.config("warehouse") === "file:///tmp") // default kept
    assert(c.config("clients") === "8")             // client beats default
  }

  test("listNamespaces and paginated listTables walk every page") {
    createTable("orders_a"); createTable("orders_b"); createTable("orders_c")
    val c = RestCatalog.connect(uri)
    // spec semantics: no parent → TOP-LEVEL namespaces only; children
    // come from the parent-scoped listing (round 12)
    assert(RestCatalog.listNamespaces(c).contains(Seq("analytics")))
    assert(!RestCatalog.listNamespaces(c).contains(Seq("analytics", "raw")))
    assert(RestCatalog.listNamespaces(c, Seq("analytics"))
      .contains(Seq("analytics", "raw")))
    tablePages = 2
    try {
      val listed = RestCatalog.listTables(c, Seq("analytics")).map(_.name)
      assert(listed.toSet === tables.keys.toSet)
      assert(listed.size === tables.size) // no page dropped or doubled
    } finally tablePages = 1
  }

  test("mid-session 401 re-runs the oauth exchange and retries once") {
    createTable("orders_reauth")
    val c = RestCatalog.connect(uri, credential = Some("graft:s3cret"))
    assert(c.token === Some("tok-123"))
    // the catalog rotates its accepted token: every request bearing the
    // issued tok-123 now answers 401 (token TTL elapsed, server-side)
    currentToken = "tok-rotated"
    enforceToken = true
    try {
      val listed = RestCatalog.listTables(c, Seq("analytics")).map(_.name)
      assert(listed.contains("orders_reauth"))
      // the client re-exchanged its stored credential and retried
      assert(c.token === Some("tok-rotated"))
      assert(lastAuthHeader === Some("Bearer tok-rotated"))
      // a static-token client (no credential) cannot re-auth: 401 surfaces
      val static = RestCatalog.connect(uri, token = Some("tok-rotated"))
      currentToken = "tok-rotated-2"
      intercept[graft.iceberg.RestCatalog.UnauthorizedException] {
        RestCatalog.listTables(static, Seq("analytics"))
      }
    } finally {
      enforceToken = false
      currentToken = "tok-123"
      RestCatalog.dropTable(c, "analytics.orders_reauth")
    }
  }

  test("vended credentials from loadTable reach the scan's filesystem") {
    val fsImpl = classOf[CredentialedMockS3FileSystem].getName
    val localDir = Files.createTempDirectory("graft_rest_vended_").toString
    val path = s"vended-s3://bucket$localDir/t"
    // create the table WITH credentials in the session, then remove them
    // (cache disabled so later accesses re-initialize from scratch)
    spark.conf.set("fs.vended-s3.impl", fsImpl)
    spark.conf.set("fs.vended-s3.impl.disable.cache", "true")
    spark.conf.set("fs.vended-s3.session.token", "vended-token")
    val expected = try {
      IcebergWriter.write(Tables.load(spark, Sf, "nation"), path)
      IcebergScan.scan(spark, path).count()
    } finally {
      spark.conf.unset("fs.vended-s3.impl")
      spark.conf.unset("fs.vended-s3.session.token")
    }
    assert(expected > 0)
    // without the catalog, the scheme is unreachable in this session
    intercept[Exception] { IcebergScan.scan(spark, path).count() }

    val conf = spark.sessionState.newHadoopConf()
    // register under the vended-s3 metadata location (resolve with a
    // conf that still knows the scheme)
    val metaConf = new org.apache.hadoop.conf.Configuration(conf)
    metaConf.set("fs.vended-s3.impl", fsImpl)
    metaConf.set("fs.vended-s3.session.token", "vended-token")
    val meta = graft.iceberg.IcebergIO.resolveMetadataPath(
      path, metaConf, "none",
      graft.iceberg.IcebergModel.UnknownTableVersion,
      graft.iceberg.IcebergModel.DefaultTableVersionFormat, false)
    tables.put("nation_vended", meta)
    vendedConfig = Map(
      "hadoop.fs.vended-s3.impl" -> fsImpl,
      "hadoop.fs.vended-s3.impl.disable.cache" -> "true",
      "hadoop.fs.vended-s3.session.token" -> "vended-token",
      "s3.access-key-id" -> "AKIAVENDED") // exercises the s3.* mapping too
    try {
      val c = RestCatalog.connect(uri)
      assert(RestCatalog.scan(spark, c, "analytics.nation_vended").count() === expected)
      // the client asked for delegation and applied the vended mapping
      assert(lastAccessDelegation === Some("vended-credentials"))
      assert(spark.conf.get("fs.s3a.access.key") === "AKIAVENDED")
    } finally {
      vendedConfig = Map.empty
      tables.remove("nation_vended")
      Seq("fs.vended-s3.impl",
        "fs.vended-s3.impl.disable.cache",
        "fs.vended-s3.session.token",
        "fs.s3a.access.key").foreach(k =>
        scala.util.Try(spark.conf.unset(k)))
    }
  }

  test("loadTable + scan equals the direct-path scan (incl. time travel)") {
    val path = createTable("orders_scan")
    val c = RestCatalog.connect(uri)
    val direct = IcebergScan.scan(spark, path)
    val viaCat = RestCatalog.scan(spark, c, "analytics.orders_scan")
    assert(viaCat.count() === direct.count())
    assert(viaCat.schema === direct.schema)

    // catalog-resolved tables keep the whole scan surface: MoR delete
    // then time-travel through the catalog handle
    val snap1 = IcebergScan.snapshots(spark, path)
      .orderBy("timestamp_ms").select("snapshot_id").head.getLong(0)
    IcebergWriter.delete(spark, path, col("o_orderstatus") === "F")
    tables.put("orders_scan", graft.iceberg.IcebergIO.resolveMetadataPath(
      path, spark.sessionState.newHadoopConf(), "none",
      graft.iceberg.IcebergModel.UnknownTableVersion,
      graft.iceberg.IcebergModel.DefaultTableVersionFormat, false))
    val after = RestCatalog.scan(spark, c, "analytics.orders_scan")
    assert(after.filter(col("o_orderstatus") === "F").count() === 0)
    assert(RestCatalog.scan(spark, c, "analytics.orders_scan",
      Options(snapshotId = Some(snap1))).count() === direct.count())
    // snapshots/metadata listings resolve through the catalog too
    assert(RestCatalog.snapshots(spark, c, "analytics.orders_scan").count() === 2)
    assert(RestCatalog.metadata(spark, c, "analytics.orders_scan").count() > 0)
  }

  test("oauth client-credentials: token is exchanged and rides requests") {
    val c = RestCatalog.connect(uri, credential = Some("graft:s3cret"))
    assert(c.token === Some("tok-123"))
    RestCatalog.listNamespaces(c)
    assert(lastAuthHeader === Some("Bearer tok-123"))
    // bad credentials surface the server's error message
    val e = intercept[java.io.IOException] {
      RestCatalog.connect(uri, credential = Some("graft:wrong"))
    }
    assert(e.getMessage.contains("bad client credentials"))
  }

  test("commits flow THROUGH the catalog: create → append → delete → scan") {
    val c = RestCatalog.connect(uri)
    val dir = Files.createTempDirectory("graft_rest_commit_").toString
    val orders = Tables.load(spark, Sf, "orders")
    val base = orders.filter(col("o_orderkey") % 2 === 0)
    val extra = orders.filter(col("o_orderkey") % 2 =!= 0)

    // create: write the table, then register its metadata file
    RestCatalog.createTable(spark, c, "analytics.orders_commit", s"$dir/t") {
      p => IcebergWriter.write(base, p)
    }
    assert(RestCatalog.scan(spark, c, "analytics.orders_commit").count()
      === base.count())

    // append THROUGH the catalog: its metadata-location must advance
    // with no manual re-registration
    RestCatalog.commitThrough(spark, c, "analytics.orders_commit") { p =>
      IcebergWriter.write(extra, p)
    }
    assert(RestCatalog.scan(spark, c, "analytics.orders_commit").count()
      === orders.count())

    // MoR row-level delete through the catalog
    RestCatalog.commitThrough(spark, c, "analytics.orders_commit") { p =>
      IcebergWriter.delete(spark, p, col("o_orderstatus") === "F")
    }
    val after = RestCatalog.scan(spark, c, "analytics.orders_commit")
    assert(after.filter(col("o_orderstatus") === "F").count() === 0)
    assert(after.count() ===
      orders.filter(col("o_orderstatus") =!= "F").count())
    // the catalog handle sees the full commit history
    assert(RestCatalog.snapshots(spark, c, "analytics.orders_commit")
      .count() === 3)
    // creating over an existing name is refused by the catalog
    val dup = intercept[java.io.IOException] {
      RestCatalog.registerTable(c, "analytics.orders_commit",
        tables("orders_commit"))
    }
    assert(dup.getMessage.contains("already exists"), dup.getMessage)
  }

  test("commit conflict: 409 retries against a refreshed head; true divergence throws") {
    val c = RestCatalog.connect(uri)
    val dir = Files.createTempDirectory("graft_rest_conflict_").toString
    import spark.implicits._
    RestCatalog.createTable(spark, c, "analytics.t_conflict", s"$dir/t") {
      p => IcebergWriter.write(Seq((1L, "a")).toDF("id", "v"), p)
    }

    // a transient 409 (simulated race): the client refreshes the head
    // and retries — the commit lands
    injectConflictOnce = true
    RestCatalog.commitThrough(spark, c, "analytics.t_conflict") { p =>
      IcebergWriter.write(Seq((2L, "b")).toDF("id", "v"), p)
    }
    assert(!injectConflictOnce) // the injected conflict was consumed
    assert(RestCatalog.scan(spark, c, "analytics.t_conflict").count() === 2)

    // true divergence: the catalog now tracks a FOREIGN table (different
    // uuid, unrelated lineage) — refresh cannot reconcile, so it throws
    // and the catalog entry is left untouched
    RestCatalog.createTable(spark, c, "analytics.t_other", s"$dir/other") {
      p => IcebergWriter.write(Seq((9L, "z")).toDF("id", "v"), p)
    }
    val e = intercept[RestCatalog.CommitConflictException] {
      RestCatalog.commitThrough(spark, c, "analytics.t_conflict") { p =>
        IcebergWriter.write(Seq((3L, "c")).toDF("id", "v"), p)
        tables.put("t_conflict", tables("t_other")) // foreign commit wins
      }
    }
    assert(e.getMessage.contains("diverged"), e.getMessage)
  }

  test("a commit that lands but surfaces as a conflict replays without re-sending") {
    val c = RestCatalog.connect(uri)
    val dir = Files.createTempDirectory("graft_rest_replay_").toString
    import spark.implicits._
    RestCatalog.createTable(spark, c, "analytics.t_replay", s"$dir/t") {
      p => IcebergWriter.write(Seq((1L, "a")).toDF("id", "v"), p)
    }
    commitPosts = 0
    applyThenConflictOnce = true
    // the catalog applied the commit but the response was a 409; the
    // retry must RECOGNIZE its additions in the refreshed metadata
    // (presence-based replay) instead of re-sending add-snapshot
    RestCatalog.commitThrough(spark, c, "analytics.t_replay") { p =>
      IcebergWriter.write(Seq((2L, "b")).toDF("id", "v"), p)
    }
    assert(commitPosts === 1,
      s"retry re-sent an already-landed commit ($commitPosts POSTs)")
    assert(RestCatalog.scan(spark, c, "analytics.t_replay").count() === 2)
  }

  test("schema evolution and properties publish THROUGH the catalog") {
    val c = RestCatalog.connect(uri)
    val dir = Files.createTempDirectory("graft_rest_ddl_").toString
    import spark.implicits._
    RestCatalog.createTable(spark, c, "analytics.t_ddl", s"$dir/t") {
      p => IcebergWriter.write(Seq((1L, "a"), (2L, "b")).toDF("id", "v"), p)
    }

    // ADD COLUMN through the catalog: the commit must carry
    // add-schema + set-current-schema (the mock 400s a silent drop)
    RestCatalog.commitThrough(spark, c, "analytics.t_ddl") { p =>
      IcebergWriter.addColumn(spark, p, "note",
        org.apache.spark.sql.types.StringType,
        initialDefault = Some("none"))
    }
    assert(lastCommitActions.contains("add-schema"), lastCommitActions)
    assert(lastCommitActions.contains("set-current-schema"), lastCommitActions)
    val evolved = RestCatalog.scan(spark, c, "analytics.t_ddl")
    assert(evolved.columns.contains("note"))
    assert(evolved.select("note").collect().forall(_.getString(0) == "none"))

    // SET TBLPROPERTIES through the catalog: set-properties must ride
    RestCatalog.commitThrough(spark, c, "analytics.t_ddl") { p =>
      IcebergWriter.setProperties(spark, p,
        set = Map("commit.retry.num-retries" -> "7"))
    }
    assert(lastCommitActions.contains("set-properties"), lastCommitActions)

    // UNSET through the catalog: remove-properties must ride
    RestCatalog.commitThrough(spark, c, "analytics.t_ddl") { p =>
      IcebergWriter.setProperties(spark, p,
        remove = Seq("commit.retry.num-retries"))
    }
    assert(lastCommitActions.contains("remove-properties"), lastCommitActions)

    // a schema-evolving APPEND (new column in the data) carries both the
    // new snapshot and its schema in ONE commit, in apply order
    RestCatalog.commitThrough(spark, c, "analytics.t_ddl") { p =>
      IcebergWriter.write(
        Seq((3L, "c", "x", 1.5)).toDF("id", "v", "note", "score"), p)
    }
    assert(lastCommitActions.contains("add-schema"), lastCommitActions)
    assert(lastCommitActions.contains("add-snapshot"), lastCommitActions)
    assert(lastCommitActions.indexOf("add-schema") <
      lastCommitActions.indexOf("add-snapshot"), lastCommitActions)
    val after = RestCatalog.scan(spark, c, "analytics.t_ddl")
    assert(after.count() === 3)
    assert(after.columns.contains("score"))
  }

  test("renameTable and dropTable manage catalog entries without touching storage") {
    val c = RestCatalog.connect(uri)
    val dir = Files.createTempDirectory("graft_rest_mv_").toString
    import spark.implicits._
    RestCatalog.createTable(spark, c, "analytics.t_move", s"$dir/t") {
      p => IcebergWriter.write(Seq((1L, "a"), (2L, "b")).toDF("id", "v"), p)
    }
    // rename: same metadata location under the new name
    RestCatalog.renameTable(c, "analytics.t_move", "analytics.t_moved")
    assert(!RestCatalog.tableExists(c, "analytics.t_move"))
    assert(RestCatalog.scan(spark, c, "analytics.t_moved").count() === 2)
    // rename onto an existing name is refused and the source survives
    RestCatalog.createTable(spark, c, "analytics.t_occupied", s"$dir/o") {
      p => IcebergWriter.write(Seq((9L, "z")).toDF("id", "v"), p)
    }
    val clash = intercept[java.io.IOException] {
      RestCatalog.renameTable(c, "analytics.t_moved", "analytics.t_occupied")
    }
    assert(clash.getMessage.contains("already exists"))
    assert(RestCatalog.scan(spark, c, "analytics.t_moved").count() === 2)
    // drop (no purge): entry gone, STORAGE intact — re-register restores
    val loc = RestCatalog.loadTable(c, "analytics.t_moved").metadataLocation
    RestCatalog.dropTable(c, "analytics.t_moved")
    assert(!RestCatalog.tableExists(c, "analytics.t_moved"))
    assert(graft.iceberg.IcebergScan.scan(spark, loc).count() === 2)
    RestCatalog.registerTable(c, "analytics.t_back", loc)
    assert(RestCatalog.scan(spark, c, "analytics.t_back").count() === 2)
  }

  test("missing table maps 404 to a catchable not-found") {
    val c = RestCatalog.connect(uri)
    assert(!RestCatalog.tableExists(c, "analytics.nope"))
    val e = intercept[java.io.FileNotFoundException] {
      RestCatalog.loadTable(c, "analytics.nope")
    }
    assert(e.getMessage.contains("Table does not exist"))
  }

  test("DSv2 catalog plugin (type=rest): SQL identifiers resolve through the catalog") {
    val path = createTable("plug_orders")
    // catalog plugins instantiate lazily on first identifier lookup, so a
    // runtime conf set (with the mock's dynamic port) is the deployment
    // shape: spark.sql.catalog.<name> = GraftCatalog, type=rest
    spark.conf.set("spark.sql.catalog.grest", "graft.sql.GraftCatalog")
    spark.conf.set("spark.sql.catalog.grest.type", "rest")
    spark.conf.set("spark.sql.catalog.grest.uri", uri)

    val direct = IcebergScan.scan(spark, path).count()
    assert(direct > 0)
    assert(spark.sql("SELECT count(*) FROM grest.analytics.plug_orders")
      .head.getLong(0) === direct)
    // the splice keeps the native plan (no V1 bridge) through REST too
    val physical = spark.sql(
      "SELECT o_orderkey FROM grest.analytics.plug_orders WHERE o_orderkey = 7")
      .queryExecution.executedPlan.toString
    assert(!physical.contains("RowDataSourceScan"), physical)

    // SHOW TABLES walks the catalog's paginated list endpoint
    val listed = spark.sql("SHOW TABLES IN grest.analytics")
      .select("tableName").collect().map(_.getString(0)).toSet
    assert(listed.contains("plug_orders"))

    // time travel by snapshot id through the identifier: commit again,
    // re-register the NEW metadata (a real catalog commit moves the
    // pointer), and read the first snapshot back
    val v1 = IcebergScan.snapshots(spark, path)
      .select("snapshot_id").collect().map(_.getLong(0)).head
    IcebergWriter.write(Tables.load(spark, Sf, "orders").limit(10)
      .select(IcebergScan.scan(spark, path).columns.map(col).toIndexedSeq: _*), path)
    val conf = spark.sessionState.newHadoopConf()
    tables.put("plug_orders", graft.iceberg.IcebergIO.resolveMetadataPath(
      path, conf, "none",
      graft.iceberg.IcebergModel.UnknownTableVersion,
      graft.iceberg.IcebergModel.DefaultTableVersionFormat, false))
    assert(spark.sql(
      "SELECT count(*) FROM grest.analytics.plug_orders").head.getLong(0) === direct + 10)
    assert(spark.sql(
      s"SELECT count(*) FROM grest.analytics.plug_orders VERSION AS OF $v1")
      .head.getLong(0) === direct)

    // writes THROUGH the plugin must commit back through the catalog:
    // the server's pointer advances (commit POST) and catalog readers
    // see the rows — a write that skipped the catalog would leave the
    // pointer stale (or root a bogus table under the metadata file path)
    val posts0 = commitPosts
    spark.sql(
      """INSERT INTO grest.analytics.plug_orders
        |SELECT * FROM grest.analytics.plug_orders LIMIT 5""".stripMargin)
    assert(commitPosts > posts0, "INSERT must POST a commit to the catalog")
    assert(spark.sql("SELECT count(*) FROM grest.analytics.plug_orders")
      .head.getLong(0) === direct + 15)
    spark.sql("DELETE FROM grest.analytics.plug_orders WHERE o_orderkey < 0")
    assert(commitPosts > posts0 + 1, "DELETE must POST a commit to the catalog")
  }

  test("DSv2 plugin (type=rest): CTAS commits through the catalog; expire propagates removals") {
    spark.conf.set("spark.sql.catalog.grest2", "graft.sql.GraftCatalog")
    spark.conf.set("spark.sql.catalog.grest2.type", "rest")
    spark.conf.set("spark.sql.catalog.grest2.uri", uri)
    spark.conf.set("spark.sql.catalog.grest2.warehouse",
      Files.createTempDirectory("graft_rest_wh_").toString)

    // CTAS: the created Table instance itself receives the write — it
    // must carry the rest context, else the data lands past the catalog
    // and catalog readers see the empty registration
    spark.sql(
      """CREATE TABLE grest2.analytics.ctas_rest AS
        |SELECT id FROM range(0, 25)""".stripMargin)
    assert(spark.sql("SELECT count(*) FROM grest2.analytics.ctas_rest")
      .head.getLong(0) === 25)

    // grow history, then expire THROUGH the catalog: the removal must
    // reach the catalog metadata (remove-snapshots action), not just
    // the local files
    spark.sql("INSERT INTO grest2.analytics.ctas_rest SELECT id FROM range(100, 110)")
    val metaBefore = serverMetadata(tables("ctas_rest"))
    assert(metaBefore.get("snapshots").size >= 2)
    spark.sql(
      "CALL grest2.system.expire_snapshots(`table` => 'analytics.ctas_rest', keep => 1)")
    val metaAfter = serverMetadata(tables("ctas_rest"))
    assert(metaAfter.get("snapshots").size === 1,
      s"catalog still serves ${metaAfter.get("snapshots").size} snapshots")
    assert(spark.sql("SELECT count(*) FROM grest2.analytics.ctas_rest")
      .head.getLong(0) === 35)

    // ALTER publishes through the catalog in ONE commit: properties land
    // in the catalog-served metadata
    spark.sql(
      """ALTER TABLE grest2.analytics.ctas_rest
        |SET TBLPROPERTIES ('team' = 'ml', 'tier' = 'gold')""".stripMargin)
    val props = serverMetadata(tables("ctas_rest")).get("properties")
    assert(props.get("team").asText === "ml" && props.get("tier").asText === "gold")

    // STREAMING by rest-catalog identifier must follow the table ROOT,
    // not the load-time metadata pin — commits made after the stream
    // starts have to keep arriving (the pin would stall silently)
    val stream = spark.readStream.format("graft-iceberg")
      .option("table", "grest2.analytics.ctas_rest").load()
      .select("id")
    val q = stream.writeStream.format("memory").queryName("rest_stream")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      // only RETAINED snapshots replay: the expire above kept one
      // snapshot (the 10-row insert); the expired 25-row history is gone
      assert(spark.table("rest_stream").count() === 10)
      spark.sql(
        "INSERT INTO grest2.analytics.ctas_rest SELECT id FROM range(500, 510)")
      q.processAllAvailable()
      assert(spark.table("rest_stream").count() === 20)
    } finally q.stop()
  }

  test("nested namespaces: pagination below level 1 + properties round-trip") {
    spark.conf.set("spark.sql.catalog.grestns", "graft.sql.GraftCatalog")
    spark.conf.set("spark.sql.catalog.grestns.type", "rest")
    spark.conf.set("spark.sql.catalog.grestns.uri", uri)

    // a 2-level tree, listed through a PAGINATING server (3 pages)
    spark.sql("CREATE NAMESPACE grestns.lake")
    (1 to 7).foreach(i =>
      spark.sql(s"CREATE NAMESPACE grestns.lake.zone$i"))
    nsPages = 3
    try {
      val level2 = spark.sql("SHOW NAMESPACES IN grestns.lake")
        .collect().map(_.getString(0)).toSet
      assert(level2 === (1 to 7).map(i => s"lake.zone$i").toSet,
        "level-2 listing must walk every page")
      // nested existence probes directly (no listing scan): a GET on the
      // namespace itself — DESCRIBE works on a nested namespace
      assert(spark.sql("SHOW NAMESPACES IN grestns.lake.zone3").collect().isEmpty)
    } finally nsPages = 1

    // properties round-trip: create-with-properties, ALTER SET/UNSET,
    // DESCRIBE reads them back from the catalog
    spark.sql(
      "CREATE NAMESPACE grestns.proped WITH PROPERTIES ('team' = 'ml', 'tier' = 'raw')")
    def props(): Map[String, String] =
      spark.sql("DESCRIBE NAMESPACE EXTENDED grestns.proped")
        .collect().map(r => r.getString(0) -> r.getString(1)).toMap
        .get("Properties").map(_.stripPrefix("(").stripSuffix(")")
          .split(", *").map(_.split("=") match {
            case Array(k, v) => k.trim -> v.trim
            case a => a.head.trim -> ""
          }).toMap).getOrElse(Map.empty)
    val c = RestCatalog.connect(uri, credential = Some("graft:s3cret"))
    // Spark stamps reserved 'owner' onto CREATE NAMESPACE metadata
    assert(RestCatalog.loadNamespace(c, Seq("proped")) - "owner" ===
      Map("team" -> "ml", "tier" -> "raw"))
    spark.sql("ALTER NAMESPACE grestns.proped SET PROPERTIES ('tier' = 'gold')")
    spark.sql("ALTER NAMESPACE grestns.proped UNSET PROPERTIES ('team')")
    assert(RestCatalog.loadNamespace(c, Seq("proped")) - "owner" ===
      Map("tier" -> "gold"))
    assert(props().get("tier").forall(_.contains("gold")))

    // a missing nested namespace maps to a catchable not-found
    val err = intercept[Exception] {
      spark.sql("SHOW NAMESPACES IN grestns.lake.missing.deeper").collect()
    }
    assert(err.getMessage.toLowerCase.contains("namespace") ||
      err.getMessage.toLowerCase.contains("not"), err.getMessage)
  }

  test("streaming WRITES to a rest identifier commit through the catalog") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    spark.conf.set("spark.sql.catalog.grest3", "graft.sql.GraftCatalog")
    spark.conf.set("spark.sql.catalog.grest3.type", "rest")
    spark.conf.set("spark.sql.catalog.grest3.uri", uri)
    spark.conf.set("spark.sql.catalog.grest3.warehouse",
      Files.createTempDirectory("graft_rest_wh_").toString)
    spark.sql("CREATE TABLE grest3.analytics.stream_rest (id BIGINT, v DOUBLE)")

    val in = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Double)]
    val ckpt = Files.createTempDirectory("graft_rest_ckpt_").toString
    val posts0 = commitPosts
    val q = in.toDF().toDF("id", "v")
      .writeStream
      .option("checkpointLocation", ckpt)
      .toTable("grest3.analytics.stream_rest")
    try {
      in.addData((1L, 1.5), (2L, 2.5))
      q.processAllAvailable()
      // each epoch's snapshot must POST through commitThrough — the
      // server pointer advances and catalog readers see the rows
      assert(commitPosts > posts0, "streaming epoch must POST a commit")
      assert(spark.sql("SELECT count(*) FROM grest3.analytics.stream_rest")
        .head.getLong(0) === 2L)
      val meta = serverMetadata(tables("stream_rest"))
      assert(meta.get("snapshots").size >= 2, "epoch snapshot in catalog metadata")
      in.addData((3L, 3.5))
      q.processAllAvailable()
      assert(spark.sql("SELECT sum(id) FROM grest3.analytics.stream_rest")
        .head.getLong(0) === 6L)
    } finally q.stop()
  }
}
